package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read part stores — the Spark-native analogues of
  * ClickHouse's Replacing- and SummingMergeTree (the reference's
  * ClickHouse destination creates plain `ENGINE = MergeTree` tables,
  * `/root/reference/pkg/destinations/clickhouse/destination.go:16`;
  * these two are the mutation- and rollup-shaped siblings every
  * ClickHouse deployment reaches for next).
  *
  * The shared shape: writes only ever APPEND immutable part files —
  * the mutation ("update this key", "add these counts") is encoded in
  * the data, and the MERGE happens at read time:
  *
  *  - latest-wins (Replacing): each part carries (key, version, row);
  *    `readLatest` keeps the highest-version row per key. An upsert is
  *    an append with a larger version; a delete is an append with a
  *    tombstone flag the caller filters after merge.
  *  - summing (Summing): each part carries partial sums per key;
  *    `readSummed` re-aggregates across parts. An ingest batch of any
  *    size reduces to O(|keys|) rows before it ever hits storage.
  *
  * Why this is the 100 TB mutation path: updating parquet in place
  * means rewriting files under readers; appending a delta part is one
  * small write with no coordination, and the merge cost is paid by
  * queries that read the key anyway — exactly one shuffle on the key,
  * the same exchange the query's own GROUP BY would need. `compact*`
  * folds accumulated parts back into one (the background merge): an
  * idempotent rewrite that changes NOTHING a reader can observe
  * (spec-pinned), so it can run per-partition, incrementally, on
  * whatever schedule amortizes read cost.
  *
  * Determinism: ClickHouse's ReplacingMergeTree keeps an ARBITRARY row
  * among equal versions; here equal versions tie-break by the row's
  * remaining columns (descending struct order), so the merged view is
  * a pure function of the part contents — replayable by any engine,
  * which is what makes the battery's DuckDB oracle possible.
  */
object MergeStore {

  /** Append one immutable part of (key, version, payload) rows. */
  def appendPart(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Latest-wins merge of `df`: the single row per key with the
    * highest `versionCol`, ties broken by the remaining columns
    * descending. One hash exchange on the key + an in-partition sort —
    * no self-join, no global sort. */
  def latestByKey(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val rest = df.columns.filterNot(c => keyCols.contains(c) || c == versionCol)
    val order = (col(s"`$versionCol`").desc +: rest.map(c => col(s"`$c`").desc)).toSeq
    val w = Window.partitionBy(keyCols.map(c => col(s"`$c`")): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merged latest-wins view over every part under `path`. */
  def readLatest(spark: SparkSession, path: String,
                 keyCols: Seq[String], versionCol: String): DataFrame =
    latestByKey(spark.read.parquet(path), keyCols, versionCol)

  /** Merged summing view over every part under `path`: `sumCols`
    * re-aggregate across parts per key. DECIMAL/integer sum columns
    * make the merge bit-equal to a from-scratch aggregate regardless
    * of how rows were split into parts (double sums would wobble with
    * the part boundaries); partial row counts are just another sum
    * column. */
  def readSummed(spark: SparkSession, path: String, keyCols: Seq[String],
                 sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "readSummed needs at least one sum column")
    spark.read.parquet(path)
      .groupBy(keyCols.map(c => col(s"`$c`")): _*)
      .agg(sum(col(s"`${sumCols.head}`")).as(sumCols.head),
           sumCols.tail.map(c => sum(col(s"`$c`")).as(c)): _*)
  }

  /** Fold all latest-wins parts into ONE part holding the merged view.
    * Observationally a no-op for readers (readLatest before == after;
    * spec-pinned); physically it collapses N parts' key-overlap so
    * future reads stop re-merging history. The swap is
    * write-tmp → delete-old → move: single-filesystem rename, the same
    * non-transactional window every parquet overwrite has — run it
    * from the single compactor role (the claim-queue machinery in this
    * store layer exists for exactly that). */
  def compactLatest(spark: SparkSession, path: String,
                    keyCols: Seq[String], versionCol: String): Unit =
    swapIn(spark, path)(readLatest(spark, path, keyCols, versionCol))

  /** Summing sibling of [[compactLatest]]: one part of merged sums.
    *
    * NOT for epoch-addressed streaming stores ([[writeQuantileEpoch]],
    * [[graft.streaming.StreamingIngest.maintainSummingParts]]): folding
    * an epoch's part into flat root files would (a) leave mixed
    * root-files + `epoch=` dirs that parquet partition discovery
    * rejects, and (b) let a crash-replay of a folded epoch re-create
    * `epoch=N` and double-count its rows. Those stores compact with
    * [[compactEpochs]], which preserves the epoch layout and advances
    * a replay watermark. */
  def compactSummed(spark: SparkSession, path: String, keyCols: Seq[String],
                    sumCols: Seq[String]): Unit =
    swapIn(spark, path)(readSummed(spark, path, keyCols, sumCols))

  /** Epoch-layout-preserving compaction for EPOCH-ADDRESSED summing
    * stores (the streaming writers' layout: one `epoch=<id>/` dir per
    * committed micro-batch). Folds every epoch part into the single
    * reserved dir `epoch=-1` — readers see the identical merged view
    * (readSummed groups the epoch column away), future reads stop
    * re-merging history, and the partition layout stays uniform (no
    * root files, so parquet partition discovery never sees conflicting
    * structures).
    *
    * Replay safety — the reason this is not [[compactSummed]]: a
    * micro-batch whose part write succeeded but whose checkpoint
    * commit didn't will be REPLAYED on restart. Before compaction the
    * epoch-addressed overwrite makes that idempotent; after compaction
    * the epoch's rows live in `epoch=-1`, so a replay re-creating
    * `epoch=N` would double-count. Compaction therefore records the
    * max folded epoch id in a `_compacted_watermark` marker (written
    * BEFORE any folded dir is deleted), and the epoch writers
    * ([[writeQuantileEpoch]], StreamingIngest.writeSummingPart) skip
    * any epoch at or below the watermark — the replayed data is
    * already inside the compacted part by construction.
    *
    * Crash windows: before the marker lands, state is untouched
    * (the merged part builds under a dot-hidden tmp dir); between
    * marker and the final rename, readers can briefly miss the folded
    * rows — the same non-transactional swap window as [[compactLatest]],
    * run it from the single compactor role. Re-running compaction at
    * any point converges. */
  def compactEpochs(spark: SparkSession, path: String, keyCols: Seq[String],
                    sumCols: Seq[String]): Unit =
    compactEpochsWith(spark, path) { committed =>
      committed.groupBy(keyCols.map(c => col(s"`$c`")): _*)
        .agg(sum(col(s"`${sumCols.head}`")).as(sumCols.head),
             sumCols.tail.map(c => sum(col(s"`$c`")).as(c)): _*)
    }

  /** KLL sibling of [[compactEpochs]] for epoch-addressed sketch
    * stores ([[writeKllEpoch]]): the merged part is the per-key sketch
    * UNION instead of a sum — same layout preservation, same
    * watermark-fenced replay contract. */
  def compactKllEpochs(spark: SparkSession, path: String, keyCols: Seq[String],
                       k: Int = 200): Unit =
    compactEpochsWith(spark, path) { committed =>
      committed.groupBy(keyCols.map(c => col(s"`$c`")): _*)
        .agg(graft.functions.AggFunctions.kll_merge(col("__kll"), k).as("__kll"))
    }

  /** Shared fold machinery: `mergedOf` receives the union of the
    * COMMITTED epoch parts and its result becomes the reserved
    * `epoch=-1` part. See [[compactEpochs]] for the crash-window and
    * watermark analysis.
    *
    * Live-writer safety: a micro-batch whose parquet write is still in
    * flight has an `epoch=<id>/` dir containing only `_temporary` — no
    * `_SUCCESS` marker yet. Folding it would capture none or part of
    * its rows while the watermark advance makes its eventual replay
    * refused: silent loss. So dirs WITHOUT a committed `_SUCCESS` are
    * excluded from the fold, from the watermark max, and from the
    * delete — the in-flight epoch commits normally after compaction and
    * sits above the watermark as an ordinary un-folded part. (The one
    * write that can touch a COMMITTED dir is a crash-replay overwrite
    * of that same epoch; it rewrites identical rows, and the single-
    * compactor role plus the watermark fence bound that window.) */
  private def compactEpochsWith(spark: SparkSession, path: String)
                               (mergedOf: DataFrame => DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      root.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val epochDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .map(_.getPath)
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
    if (epochDirs.length < 2) return // nothing committed to fold
    val foldedMax = epochDirs.map(_.getName.stripPrefix("epoch=").toLong).max
    val (oldWm, oldQid) = compactionMarker(spark, path)
    val newWatermark = math.max(foldedMax, oldWm)
    // stamp the marker with the maintaining query's identity (recorded
    // by the epoch writers) so the replay fence can tell a crash-replay
    // of THIS query from a fresh query whose epoch ids restarted at 0
    val qid = writerQueryId(fs, path).orElse(oldQid)
    val merged = mergedOf(
      spark.read.option("basePath", path).parquet(epochDirs.map(_.toString).toSeq: _*))
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.compact_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // marker FIRST: once it lands, replays of folded epochs are
    // refused even if the process dies mid-delete below
    val marker = new org.apache.hadoop.fs.Path(s"$path/_compacted_watermark")
    val mTmp = new org.apache.hadoop.fs.Path(s"$path/._compacted_watermark.tmp")
    val out = fs.create(mTmp, true)
    val content = newWatermark.toString + qid.map("\n" + _).getOrElse("")
    try out.write(content.getBytes("UTF-8")) finally out.close()
    fs.delete(marker, false)
    if (!fs.rename(mTmp, marker))
      throw new java.io.IOException(s"watermark rename failed: $mTmp -> $marker")
    epochDirs.foreach(d => fs.delete(d, true))
    val dst = new org.apache.hadoop.fs.Path(s"$path/epoch=-1")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"compaction rename failed: $tmp -> $dst")
  }

  /** Max real epoch id ever folded by [[compactEpochs]] at `path`
    * (-1 if never compacted). Epoch writers skip epochs at or below
    * this: such an epoch can only reach the writer as a crash-replay,
    * and its rows already live in the compacted `epoch=-1` part. */
  private[graft] def compactedWatermark(spark: SparkSession, path: String): Long =
    compactionMarker(spark, path)._1

  /** (watermark, maintaining query id) from the `_compacted_watermark`
    * marker: line 1 the max folded epoch, line 2 (optional — absent on
    * pre-identity markers and batch-only stores) the streaming query id
    * whose epochs were folded. */
  private[graft] def compactionMarker(spark: SparkSession,
                                      path: String): (Long, Option[String]) = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/_compacted_watermark")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      marker.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) (-1L, None)
    else {
      val in = fs.open(marker)
      val lines = try scala.io.Source.fromInputStream(in).getLines().toList
                  finally in.close()
      (lines.headOption.map(_.trim.toLong).getOrElse(-1L),
       lines.drop(1).headOption.map(_.trim).filter(_.nonEmpty))
    }
  }

  /** The replay fence for an epoch writer, keyed on (query identity,
    * epoch id) — the Delta-txn appId+version pattern. Returns true when
    * the epoch must be SKIPPED: it is at/below the compaction watermark
    * AND comes from the same maintaining query (or identity is
    * unknown), i.e. a crash-replay of rows already folded into
    * `epoch=-1`. A fenced epoch id arriving from a DIFFERENT streaming
    * query is ordinary data, not a replay — a fresh checkpoint restarts
    * epoch ids at 0 — so silently dropping it would lose it; that case
    * fails loudly instead. As a side effect, records the writer's query
    * id under `_writer_query_id` for the compactor to stamp into the
    * marker. */
  private[graft] def epochFenced(spark: SparkSession, path: String,
                                 epochId: Long): Boolean = {
    val writerQid = Option(
      spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
    val (wm, markerQid) = compactionMarker(spark, path)
    if (epochId > wm) {
      writerQid.foreach(recordWriterQueryId(spark, path, _))
      false
    } else (markerQid, writerQid) match {
      case (Some(m), Some(w)) if m != w =>
        throw new IllegalStateException(
          s"store $path was compacted up to epoch $wm under streaming query $m, " +
          s"but query $w (a different query — fresh checkpoint?) submitted epoch " +
          s"$epochId at/below that watermark. Its data is NOT a replay and would " +
          "be lost if skipped. Resume the original checkpoint, point the new " +
          "pipeline at a fresh store, or (after verifying no overlap) remove the " +
          "store's _compacted_watermark query-id line.")
      case _ => true // same query (or unknown identity): folded already, skip
    }
  }

  private def writerQueryId(fs: org.apache.hadoop.fs.FileSystem,
                            path: String): Option[String] = {
    val f = new org.apache.hadoop.fs.Path(s"$path/_writer_query_id")
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim).filter(_.nonEmpty)
      finally in.close()
    }
  }

  private def recordWriterQueryId(spark: SparkSession, path: String,
                                  qid: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val f = new org.apache.hadoop.fs.Path(s"$path/_writer_query_id")
    if (!writerQueryId(fs, path).contains(qid)) {
      val out = fs.create(f, true)
      try out.write(qid.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Mergeable QUANTILE store — percentile dashboards over append-only
    * parts. The sufficient statistic is exact and summable: per-key
    * counts of the value QUANTIZED to `1/scale` units
    * (`vb = round(v · scale)`) — an equi-width histogram with bin
    * width `1/scale`, which is just a summing store on (key, vb):
    * parts merge by addition — batch-appended stores compact with
    * [[compactSummed]], epoch-addressed streaming stores with
    * [[compactEpochs]] (epoch layout preserved, replays fenced by the
    * compaction watermark) — and replayed epochs are handled by
    * epoch-addressing plus that watermark. Where a GK/KLL sketch trades RANK accuracy for
    * bounded state, this trades VALUE resolution: quantiles are
    * rank-exact over the quantized data and within `1/(2·scale)` of
    * the raw-value quantile by construction — a documented, tunable
    * error bar, and state is O(keys × occupied bins) (bounded by the
    * value range · scale, independent of row count).
    *
    * A batch reduces to the bin table before it ever hits storage;
    * reads shuffle the bin table once on the key and answer every
    * requested quantile from one cumulative window. */
  private def quantileBins(batch: DataFrame, keyCols: Seq[String], valueCol: String,
                           scale: Int): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val groups = keyCols.map(c => col(s"`$c`")) :+
      round(col(s"`$valueCol`") * scale).cast("long").as("__vb")
    // standard percentile semantics (Spark percentile, DuckDB quantile)
    // ignore nulls; binning them would also shift every cumulative rank
    // (a NULL bin sorts first in Spark's window, last in DuckDB's)
    batch.filter(col(s"`$valueCol`").isNotNull)
      .groupBy(groups: _*).agg(count(lit(1)).as("__cnt"))
  }

  def writeQuantilePart(batch: DataFrame, keyCols: Seq[String], valueCol: String,
                        path: String, scale: Int = 100): Unit =
    quantileBins(batch, keyCols, valueCol, scale).write.mode("append").parquet(path)

  /** Epoch-addressed quantile part — the streaming writer's unit: the
    * part path is a pure function of the epoch id and the write is an
    * overwrite, so a replayed micro-batch (crash between write and
    * checkpoint commit) overwrites ITS OWN bins instead of adding to
    * them — bin counts have no idempotent algebra, so exactly-once
    * comes from addressing, exactly like
    * [[graft.streaming.StreamingIngest.maintainSummingParts]]. */
  private[graft] def writeQuantileEpoch(batch: DataFrame, keyCols: Seq[String],
                                        valueCol: String, path: String, scale: Int,
                                        epochId: Long): Unit =
    // epochs at/below the compaction watermark FROM THE SAME QUERY are
    // crash-replays of parts already folded into epoch=-1 — writing
    // them again would double-count (see compactEpochs / epochFenced)
    if (!epochFenced(batch.sparkSession, path, epochId) && !batch.isEmpty)
      quantileBins(batch, keyCols, valueCol, scale)
        .write.mode("overwrite").parquet(s"$path/epoch=$epochId")

  /** Lower (type-1) sample quantiles per key off the merged histogram:
    * for each q, the smallest bin whose cumulative count `c` satisfies
    * `c ≥ q · n`, reported as `bin / scale` (a value the data actually
    * quantized to). The rank test runs in EXACT integer arithmetic —
    * q is taken at 1e-6 granularity (`c · 10⁶ ≥ round(q·10⁶) · n`), so
    * no float product can overshoot a rank boundary (a naive
    * `ceil(q · n)` returns the 8th-smallest of 100 rows for q = 0.07:
    * 0.07·100 = 7.000000000000001 in IEEE). Output columns
    * `p50`-style per requested q. */
  def readQuantiles(spark: SparkSession, path: String, keyCols: Seq[String],
                    qs: Seq[Double], scale: Int = 100): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    def label(q: Double): String = {
      val c = q * 100
      if ((c - c.round).abs < 1e-9) s"p${c.round}" else s"p$c".replace('.', '_')
    }
    val merged = readSummed(spark, path, keyCols :+ "__vb", Seq("__cnt"))
    val kc = keyCols.map(c => col(s"`$c`"))
    val withCum = merged
      .withColumn("__cum", sum(col("__cnt")).over(
        Window.partitionBy(kc: _*).orderBy(col("__vb"))))
      .withColumn("__tot", sum(col("__cnt")).over(Window.partitionBy(kc: _*)))
    val qAggs = qs.map { q =>
      val qMicro = math.round(q * 1000000L)
      min(when(col("__cum") * 1000000L >= lit(qMicro) * col("__tot"), col("__vb")))
        .as(label(q))
    }
    withCum.groupBy(kc: _*)
      .agg(qAggs.head, qAggs.tail: _*)
      .select(kc ++ qs.map(q =>
        (col(s"`${label(q)}`").cast("double") / scale).as(label(q))): _*)
  }

  /** KLL-sketch sibling of the quantile store ([[writeQuantilePart]])
    * — same mergeable-summary contract, opposite error trade. The
    * equi-width histogram is rank-EXACT over quantized values with a
    * 1/(2·scale) value error, but its state is O(occupied bins):
    * unbounded when a key's value RANGE is wide (a long-tailed
    * latency/price column can occupy millions of bins). A KLL sketch
    * (Karnin–Lang–Liberty 2016; the DataSketches implementation Spark
    * already bundles) holds ~1.65% normalized RANK error (k = 200,
    * 99% confidence) in a few KB per key regardless of range or row
    * count — the store for wide-range keys where the histogram's state
    * bound breaks down. Parts merge by sketch union
    * ([[graft.functions.KllMergeAgg]]); `n` stays exact across any
    * part split (every update counts; only rank positions are
    * approximate).
    *
    * Determinism: KLL compaction is randomized, so this store is
    * deliberately NOT hash-replayable — the battery row is rows-only
    * and the spec pins rank-error bounds instead (q35/q111
    * discipline). Use the histogram store when bit-replayability
    * matters and the value range is bounded.
    *
    * Batch-append layout (flat parts). For streaming maintenance use
    * epoch addressing like the histogram store: a replayed epoch
    * merged TWICE double-weights its rows against other epochs.
    *
    * `k` is not pinned in store metadata (unlike the minhash store's
    * parameters): mixing k across parts is SAFE, not silent corruption
    * — DataSketches merge downgrades the union to the smallest k seen,
    * so the result is still correct, just at the coarsest accuracy any
    * part chose. Keep k consistent for predictable error bars. */
  def writeKllPart(batch: DataFrame, keyCols: Seq[String], valueCol: String,
                   path: String, k: Int = 200): Unit = {
    val kc = keyCols.map(c => col(s"`$c`"))
    batch.filter(col(s"`$valueCol`").isNotNull)
      .groupBy(kc: _*)
      .agg(graft.functions.AggFunctions.kll_sketch(
        col(s"`$valueCol`").cast("double"), k).as("__kll"))
      .write.mode("append").parquet(path)
  }

  /** Epoch-addressed KLL part — the streaming writer's unit, mirroring
    * [[writeQuantileEpoch]]: overwrite-by-epoch-path for exactly-once
    * (merging the same sketch twice double-WEIGHTS its rows against
    * other epochs — sketch union is not idempotent across a mixed
    * store), plus the compaction-watermark fence for replays of folded
    * epochs. */
  private[graft] def writeKllEpoch(batch: DataFrame, keyCols: Seq[String],
                                   valueCol: String, path: String, k: Int,
                                   epochId: Long): Unit =
    if (!epochFenced(batch.sparkSession, path, epochId) && !batch.isEmpty) {
      val kc = keyCols.map(c => col(s"`$c`"))
      batch.filter(col(s"`$valueCol`").isNotNull)
        .groupBy(kc: _*)
        .agg(graft.functions.AggFunctions.kll_sketch(
          col(s"`$valueCol`").cast("double"), k).as("__kll"))
        .write.mode("overwrite").parquet(s"$path/epoch=$epochId")
    }

  /** Per-key quantiles off the merged sketches: one exchange of
    * O(keys × parts) few-KB sketch rows, never the corpus. Output
    * mirrors [[readQuantiles]] (`p50`-style columns) plus exact
    * `n_rows`. Reads both flat-part and epoch-addressed layouts (the
    * epoch column surfaces and is not a group key). */
  def readKllQuantiles(spark: SparkSession, path: String, keyCols: Seq[String],
                       qs: Seq[Double], k: Int = 200): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    def label(q: Double): String = {
      val c = q * 100
      if ((c - c.round).abs < 1e-9) s"p${c.round}" else s"p$c".replace('.', '_')
    }
    val kc = keyCols.map(c => col(s"`$c`"))
    spark.read.parquet(path)
      .groupBy(kc: _*)
      .agg(graft.functions.AggFunctions.kll_merge(col("__kll"), k).as("__m"))
      .select(kc ++ (graft.functions.KllN.kll_n(col("__m")).as("n_rows") +:
        qs.map(q => graft.functions.KllQuantile.kll_quantile(col("__m"), q).as(label(q)))): _*)
  }

  /** Slowly-changing-dimension type 2: turn an append-only CHANGELOG
    * (key, change time, attributes) into validity intervals — each row
    * becomes `[valid_from, valid_to)` where `valid_to` is the key's
    * next change (null = still current, flagged `is_current`). The
    * dimension-modeling twin of [[latestByKey]]: latest-wins keeps only
    * the present, SCD2 keeps the whole history queryable by as-of time
    * (join facts with `fact.ts >= valid_from AND (valid_to IS NULL OR
    * fact.ts < valid_to)` — or [[graft.operators.AsofJoin]]).
    *
    * One exchange on the key + an in-partition sort + a `lead` window —
    * the same single-shuffle shape as every ordered-history operator
    * here. Equal `tsCol` ties order by `tieCol` (a changelog sequence
    * id), so earlier ties become zero-length intervals and the LAST
    * tie carries forward — deterministic, replayable. */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(c => col(s"`$c`")): _*)
      .orderBy(col(s"`$tsCol`"), col(s"`$tieCol`"))
    changes
      .withColumn("valid_from", col(s"`$tsCol`"))
      .withColumn("valid_to", lead(col(s"`$tsCol`"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  private def swapIn(spark: SparkSession, path: String)(merged: DataFrame): Unit = {
    val tmp = path + ".compact_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
      throw new java.io.IOException(s"compaction rename failed: $tmp -> $path")
  }
}
