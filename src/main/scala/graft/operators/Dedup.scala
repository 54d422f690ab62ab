package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is one hash-partitioned shuffle on the dedup key;
  *  - near-dup methods never self-join the full corpus: they block first
  *    (MinHash LSH bands / SimHash pigeonhole bands / shared shingles)
  *    and pair **within** blocks via groupBy + collect_list + pair
  *    explode — one shuffle, no self-join, and the block size is CAPPED
  *    (`maxBucketSize` / `maxDf`), so a pathological hot bucket (a
  *    boilerplate page shared by 1% of the corpus) is dropped instead of
  *    going quadratic. Dropping mega-blocks is the standard production
  *    trade: their members are boilerplate, and exact dedup already
  *    collapses identical texts.
  *  - candidate pairs carry ONLY ids through the shuffle; signatures are
  *    re-joined once from a persisted signature table for scoring (no
  *    sketch arrays amplified across bands).
  *  - all sketches are computed with native codegen'd expressions
  *    (MinHashSignature / SimHash64), one map pass, no UDF boxing.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeps the row with the lowest
    * tiebreak value per key (callers pass a UNIQUE tiebreak — `min_by`
    * ties would otherwise be arbitrary). Implemented as `min_by`
    * aggregation, NOT a window: aggregation gets map-side partial
    * combining (each task keeps one candidate row per key before the
    * shuffle), where a window must shuffle and sort EVERY duplicate —
    * the difference between O(distinct keys) and O(rows) shuffle volume
    * when dedup ratio is high, which is the whole point of dedup. */
  def exact(df: DataFrame, keys: Seq[String], tiebreak: String): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(min_by(struct(cols.map(c => col(s"`$c`")): _*), col(s"`$tiebreak`")).as("__keep"))
      .select(cols.map(c => col(s"__keep.`$c`").as(c)): _*)
  }

  /** Exact content dedup via md5 of the text (hash-groupBy; avoids
    * shuffling full text when only the verdict is needed). */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exact(df.withColumn("__h", md5(col(textCol))), Seq("__h"), idCol).drop("__h")

  /** Lowercased word shingles of size `w`, hashed to 64 bits (distinct,
    * first-occurrence order). Native codegen'd expression — one
    * tokenize+hash pass per row. */
  def shingleHashes(text: Column, w: Int): Column =
    TextFunctions.shingle_hashes(text, w)

  /** Ordered (id_a < id_b) unique id pairs from every block of
    * `keyCols`-equal rows, skipping blocks larger than `cap`.
    *
    * This is THE skew-safe near-dup pairing shape: one shuffle
    * (groupBy block key), block membership lists bounded by `cap`
    * (a block of B rows emits B(B-1)/2 pairs — capped, never the
    * corpus-quadratic blowup of an uncapped self-join). */
  private[operators] def blockPairs(df: DataFrame, idCol: String, keyCols: Seq[String],
                                    cap: Int, dedup: Boolean = true): DataFrame = {
    val grouped = df.groupBy(keyCols.map(col): _*)
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, cap))
      .withColumn("ids", array_sort(col("ids")))
    val ids = col("ids")
    // index-pair construction via element_at (optimization round 22,
    // guide §1.2 per-task work): the previous nested-transform form
    // sliced the array tail once per outer element — O(B²) element
    // COPIES per block before the structs were even built; 1-based
    // index pairs read each element in place. Same pairs, same order.
    val n = size(ids)
    val pairs = flatten(transform(sequence(lit(1), n - 1), i =>
      transform(sequence(i + 1, n), j =>
        struct(element_at(ids, i).as("id_a"), element_at(ids, j).as("id_b")))))
    val exploded = grouped.select(explode(pairs).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    if (dedup) exploded.distinct() else exploded
  }

  /** MinHash LSH candidate pairs: signature of `numHashes`, cut into
    * `bands`; docs sharing any band bucket become a candidate pair,
    * scored by signature agreement (unbiased Jaccard estimate).
    *
    * Plan shape: one scan computes signatures (persisted — reused by the
    * banding pass and both scoring re-joins); explode bands (ids only);
    * groupBy (band, bucket) with a `maxBucketSize` cap -> pair explode
    * -> distinct pairs -> two id-equi joins back to the signature table
    * for scoring. Buckets above the cap are dropped (boilerplate guard).
    */
  /** (id, sig) signature table for `df` — the shared first stage of
    * every minhash path (in-memory candidates and the persisted
    * store), so banding/scoring can never drift between them. */
  private def minhashSigs(df: DataFrame, idCol: String, textCol: String,
                          numHashes: Int, shingleWidth: Int): DataFrame =
    df.select(col(idCol).as("id"),
        TextFunctions.minhash_signature(shingleHashes(col(textCol), shingleWidth), numHashes).as("sig"))
      .filter(col("sig").isNotNull)

  /** (id, band, bucket) banding of a signature table: band value =
    * hash of its signature slice; ids only past this point. */
  private def bandedOf(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    // bands >= 1 FIRST: bands = 0 would raise ArithmeticException from
    // the modulo below — an engine fault (HTTP 500), not the clean
    // caller-shaped IllegalArgumentException (HTTP 400) it must be
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
        .as(Seq("band", "bucket")))
  }

  /** Unbiased Jaccard estimate: fraction of agreeing signature rows. */
  private def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, bands: Int = 8,
                        shingleWidth: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    val sigs = graft.core.CacheScope.track(
      minhashSigs(df, idCol, textCol, numHashes, shingleWidth)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = bandedOf(sigs, numHashes, bands)
    val pairs = blockPairs(banded, "id", Seq("band", "bucket"), maxBucketSize)
    val a = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b"), numHashes).as("est_jaccard"))
  }

  /** MinHash dedup: candidates above `threshold` collapse; every doc that
    * has a smaller-id near-duplicate is dropped (single pass, no
    * union-find — transitive chains keep their minimum representative
    * with one extra iteration at most; good enough for corpus dedup). */
  def minHashDedup(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
                   maxBucketSize: Int = 500): DataFrame = {
    val dupIds = minHashCandidates(df, idCol, textCol, numHashes, bands,
        maxBucketSize = maxBucketSize)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Connected components over a candidate-pair graph (`id_a < id_b`,
    * no self-loops): every document gets its component's MINIMUM id as
    * `cluster`. This is the cluster-assignment step transitive near-dup
    * chains need (A~B, B~C: all three must share one representative
    * even though A and C never pair directly).
    *
    * Algorithm: alternating star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14). Each
    * round applies large-star (every node hangs its strictly-larger
    * neighbors off its minimum neighborhood label) then small-star
    * (every node re-hangs its smaller neighbors, and itself, off the
    * minimum), shrinking the edge set toward one star per component
    * rooted at the component minimum. Rounds needed = O(log n) — a
    * diameter-1000 path converges in ~10 rounds where plain min-label
    * propagation (the previous implementation) needed 1000 — so
    * `maxIterations = 20` covers any graph that fits on a cluster; if
    * the bound is ever hit a warning is emitted and the partially
    * contracted labels are returned (still a valid partition refinement,
    * never a crash). The driver loop reads ONE tiny aggregate per round
    * (edge count + xxhash64 xor, the convergence test) — edge data
    * never leaves executors.
    *
    * Cache lifecycle (the 100 TB resource contract): exactly ONE edge
    * set is materialized at any time. Each round LAZILY
    * `localCheckpoint`s the new edge set — the convergence aggregate
    * is the action that materializes it, so the checkpoint costs no
    * extra job — then releases the previous round's blocks. Release
    * means the backing RDD, not `Dataset.unpersist()`: checkpoint
    * blocks are RDD-level persistence the CacheManager never sees, and
    * relying on GC + ContextCleaner instead holds O(rounds) edge-set
    * copies at the loop's high-water mark (caught by the
    * `ccPeakCaches` receipt, round 8).
    * Checkpointing EVERY round (not every Nth) is load-bearing here,
    * not an optimization: one star round references `edges` ~12 times
    * (sym × ls × ssMin × the union), so an untruncated k-round lineage
    * is a ~12^k-leaf plan tree — at k = 4 that is ~20k scan copies and
    * the analyzer/explain OOMs before the data is even touched (found
    * by the cache-footprint spec, which the every-5th variant of this
    * loop failed). The returned labels are checkpointed too, so the
    * final edge cache is dropped before returning — callers get a
    * materialized, lineage-free result and `getPersistentRDDs` goes
    * back to where it started. */
  /** Rounds the most recent [[connectedComponents]] call took to reach
    * its fixpoint — the observability receipt for the O(log n)
    * convergence claim (spec-pinned on a diameter-1000 path graph;
    * includes the final confirming round). */
  @volatile private[graft] var ccRounds: Int = 0

  /** High-water persistent-RDD count observed INSIDE the most recent
    * [[connectedComponents]] loop — the observability receipt for the
    * bounded-cache contract. Counting caches after return is
    * nondeterministic (lingering localCheckpoint RDDs are reclaimed
    * asynchronously by the ContextCleaner), but the peak during the
    * loop is exact: an O(rounds) cache leak shows up here as a count
    * that grows with the iteration number regardless of cleaner
    * timing. */
  @volatile private[graft] var ccPeakCaches: Int = 0

  def connectedComponents(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    // canonical hi -> lo directed edges; `edges` always holds the ONE
    // persisted frame (the round-5 leak lesson: unpersist the exact
    // persisted Dataset, never a derived projection)
    var edges = pairs.select(
        greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // order-free edge-set fingerprint: count + XOR of per-edge hashes
    // (xor, not sum — ANSI mode would overflow a 64-bit sum)
    def stats(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = stats(edges)
    var iter = 0
    var converged = prev._1 == 0L
    val sc = pairs.sparkSession.sparkContext
    var ccPeak = sc.getPersistentRDDs.size
    // Lineage truncation, executor-loss tolerance keyed on the
    // session's checkpoint dir. `localCheckpoint` blocks live ONLY on
    // executors and their lineage is CUT — on a real cluster, where
    // executor loss is routine (spot reclaim, OOM kill), losing one
    // mid-loop makes the next round fail UNRECOVERABLY (no blocks, no
    // lineage to recompute; found by the LocalClusterSpec chaos
    // receipt). So: with a checkpoint dir set (any production
    // deployment — HDFS/S3), rounds checkpoint RELIABLY to shared
    // storage and the loop survives any executor loss; without one
    // (single-node, tests, the battery), localCheckpoint keeps the
    // zero-file fast path. The edge set is ids-only and shrinking, so
    // the per-round file write is noise next to the round's shuffles —
    // and the backing RDD is persisted first so the post-action
    // checkpoint write reads cached blocks instead of re-running the
    // round (the doc-recommended persist-before-checkpoint pattern).
    val reliable = sc.getCheckpointDir.isDefined
    def truncate(df: DataFrame): DataFrame =
      if (!reliable) df.localCheckpoint(false)
      else {
        val ck = df.checkpoint(eager = false)
        org.apache.spark.sql.graftbridge.Bridge.checkpointedRdd(ck)
          .foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
        ck
      }
    // releasing a superseded round means its cached blocks AND (in
    // reliable mode) its checkpoint files — safe once the next round
    // is materialized, exactly the existing unpersist invariant
    def releaseCkpt(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
      rdd.unpersist(false)
      if (reliable) rdd.getCheckpointFile.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        try { path.getFileSystem(sc.hadoopConfiguration).delete(path, true); () }
        catch { case _: java.io.IOException => () } // best-effort cleanup
      }
    }
    // the RDD backing the current round's checkpoint (None for the
    // round-0 persisted frame) — see the release comment below
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    // both star steps are "per-node neighborhood min, broadcast back to
    // the node's edges" — a WINDOW over the edge list, not a
    // groupBy-then-self-join: the window is one exchange + sort where
    // the join form is two exchanges, and with orderBy(v) the running
    // min IS the partition min on every row (ascending prefix), so
    // min and row_number share a single window pass. At this loop's
    // scale the cost is driver stage-scheduling latency, so exchanges
    // per round is the number that matters: 3 (two windows + the
    // distinct) vs 5 for the join form.
    val wUv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("v"))
    val edgeArr = "array<struct<u:bigint,v:bigint>>"
    // Per-round exchange sizing from the MEASURED edge count (known for
    // free from the convergence aggregate) — optimization round 21,
    // guide §2.2/§1.2. The session default (one partition per core)
    // hands every round's three exchanges 32 reduce tasks even when the
    // edge set is a few hundred rows, so a converged-in-6-rounds CC run
    // pays ~18 stages × 32 near-empty tasks of pure scheduling latency
    // — the scaladoc's own "driver stage-scheduling latency" cost,
    // now removed instead of documented. Sizing: fill partitions at
    // ~25k edges each up to the session setting, then grow past it at
    // ~250k edges each (bounded memory per sort window), capped at
    // 4096 like sharedShinglePairs' derived sizing. The count is exact
    // per round, so a shrinking edge set gets shrinking rounds — the
    // explicit repartition (AQE-exempt) replaces the window's own
    // exchange, keeping exchanges-per-round at 3. Results are
    // partition-count independent (neighborhood minima are set
    // operations; the convergence hash is order-free).
    def roundParts(edgeCount: Long): Int = {
      val sessionParts =
        pairs.sparkSession.sessionState.conf.numShufflePartitions.toLong
      math.min(4096L,
        math.max(math.max(1L, edgeCount / 25000L).min(sessionParts),
          edgeCount / 250000L)).toInt
    }
    while (!converged && iter < maxIterations) {
      val nPart = roundParts(prev._1)
      // large-star: from each node's neighborhood (symmetrized view),
      // connect every strictly-larger neighbor to m = min(N(u) ∪ {u});
      // every edge survives via its smaller endpoint's group, so
      // connectivity is preserved while long tails hop toward the min
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
        .repartition(nPart, col("u"))
      val ls = sym
        .withColumn("m", least(min(col("v")).over(wUv), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u >= m: stays hi -> lo
        .repartition(nPart, col("u"))
      // small-star: per node, re-hang all (strictly smaller) neighbors
      // and the node itself off the minimum neighbor; the node's own
      // (u, m) edge rides the first row of its window partition instead
      // of a second union branch (which would re-run the window subtree)
      val next0 = ls
        .withColumn("m", min(col("v")).over(wUv))
        .withColumn("rn", row_number().over(wUv))
        .select(explode(concat(
          when(col("v") =!= col("m"),
            array(struct(col("v").as("u"), col("m").as("v"))))
            .otherwise(array().cast(edgeArr)),
          when(col("rn") === 1,
            array(struct(col("u").as("u"), col("m").as("v"))))
            .otherwise(array().cast(edgeArr)))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .repartition(nPart, col("u"), col("v")) // sized like the windows
        .distinct()
      // lazy truncation: the stats aggregate below is the action that
      // materializes it, cutting the ~12x-per-round lineage fan
      // (see the scaladoc — every-Nth checkpointing OOMs the analyzer)
      val next = truncate(next0)
      // the aggregate materializes `next`; only now is the prior cache
      // dead. Fixpoint (count + order-free hash sum unchanged) = the
      // edge set is the star set rooted at component minima.
      val cur = stats(next)
      // both the old and new edge sets are live right here — the loop's
      // cache high-water mark (see ccPeakCaches)
      ccPeak = math.max(ccPeak,
        pairs.sparkSession.sparkContext.getPersistentRDDs.size)
      // release the superseded edge set FOR REAL. Dataset.unpersist
      // covers the round-0 .persist() frame only: checkpoint blocks are
      // RDD-level persistence the CacheManager never sees, so every
      // later round must drop the tracked RDD directly — without this
      // the loop holds O(rounds) edge-set copies until a GC lets the
      // ContextCleaner catch up (found by the ccPeakCaches receipt).
      edges.unpersist()
      prevCkpt.foreach(releaseCkpt)
      prevCkpt = org.apache.spark.sql.graftbridge.Bridge.checkpointedRdd(next)
      edges = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    ccRounds = iter
    ccPeakCaches = ccPeak
    if (!converged)
      System.err.println(s"[graft] connectedComponents: star contraction did not " +
        s"converge in $maxIterations rounds (edges=${prev._1}); labels may be " +
        "a partial refinement")
    // at the fixpoint every node points directly at its component min;
    // the groupBy/anti-join below also keep labels unique per id in the
    // (log-n-improbable) non-converged case
    val memb = edges.groupBy(col("u").as("id")).agg(min(col("v")).as("cluster"))
    val roots = edges.select(col("v").as("id")).distinct()
      .join(memb.select(col("id")), Seq("id"), "left_anti")
      .withColumn("cluster", col("id"))
    // materialize result BEFORE the final edge set is released (its
    // lineage reads edges until then). Lazy truncate + explicit count:
    // in reliable mode this is the persist-then-write path (an eager
    // Dataset.checkpoint would compute the result twice). The RESULT's
    // own checkpoint files are the caller's: job-scoped checkpoint
    // dirs (deleted at job end) or
    // spark.cleaner.referenceTracking.cleanCheckpoints=true reclaim
    // them, same as localCheckpoint blocks ride the ContextCleaner.
    val result = truncate(memb.union(roots))
    result.count()
    edges.unpersist()
    prevCkpt.foreach(releaseCkpt)
    result
  }

  /** Near-dup cluster assignment: MinHash candidates above `threshold`
    * -> connected components. Returns (id, cluster) for every document
    * (singletons are their own cluster). */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
                      maxBucketSize: Int = 500): DataFrame = {
    val pairs = minHashCandidates(df, idCol, textCol, numHashes, bands,
        maxBucketSize = maxBucketSize)
      .filter(col("est_jaccard") >= threshold)
    val comp = connectedComponents(pairs)
    df.select(col(idCol).as("id")).join(comp, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** Near-duplicate REMOVAL — the cleaned corpus itself, closing the
    * candidates → clusters → output loop: keeps every row that either
    * has no near-dup edge or is the minimum-id member of its connected
    * component. Generic over the pair source (`ngramJaccardPairs` for
    * exact Jaccard, `minHashCandidates`/`simHashPairs`/
    * `embeddingDupPairs` for sketches), so the same removal step serves
    * every dedup family.
    *
    * Scale shape: components exist only for docs with at least one
    * edge, so `clusters` is usually tiny relative to the corpus — the
    * left join broadcasts under AQE, and the 100 TB scan never
    * shuffles; with pathological dup rates it degrades to a shuffled
    * equi-join on the id, still O(corpus). Star-contraction CC
    * converges in O(log n) rounds, so `maxIterations = 20` is not a
    * practical diameter bound; non-convergence is loudly reported by
    * connectedComponents rather than silently keeping extra
    * representatives. */
  def removeNearDups(df: DataFrame, idCol: String, pairs: DataFrame,
                     maxIterations: Int = 20): DataFrame = {
    val clusters = connectedComponents(pairs, maxIterations)
      .select(col("id").as("__cc_id"), col("cluster").as("__cc_cluster"))
    df.join(clusters, df(idCol) === clusters("__cc_id"), "left")
      .filter(col("__cc_cluster").isNull || col("__cc_cluster") === df(idCol))
      .drop("__cc_id", "__cc_cluster")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Blocking is pigeonhole-exact: the 64-bit simhash is cut into
    * (maxHamming+1) bands — any pair within distance k must agree on at
    * least one band, so the band-equality blocking loses no true pair
    * (up to the `maxBucketSize` skew cap). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming") // -1 would divide by zero below
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val sh = graft.core.CacheScope.track(df.select(col(idCol).as("id"),
      TextFunctions.simhash64(TextFunctions.token_hashes(col(textCol))).as("sh"))
      .filter(col("sh").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val mask = (1L << width) - 1
    val banded = sh.select(col("id"),
      posexplode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> shiftright(sh, b * $width) & $mask)"))
        .as(Seq("band", "bits")))
    val pairs = blockPairs(banded, "id", Seq("band", "bits"), maxBucketSize)
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing-overlap pairs: docs sharing >= `minShared` winnowing
    * fingerprints (rolling-hash k-grams, window minima — see
    * functions.Winnow). By the winnowing guarantee, any pair sharing a
    * run of `window + k - 1` characters shares a fingerprint, so this
    * finds COPIED PASSAGES (plagiarism/boilerplate-grade overlap), which
    * token-set methods like Jaccard dilute away on long documents.
    * Same skew-capped block shape as the other near-dup ops. */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 24, window: Int = 12, minShared: Int = 3,
                         maxDf: Int = 1000): DataFrame = {
    val fps = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.winnow(col(textCol), k, window)).as("fps"))
    val inv = fps.select(col("id"), explode(col("fps")).as("fp"))
    // keep per-fingerprint multiplicity: the count below IS the overlap
    blockPairs(inv, "id", Seq("fp"), maxDf, dedup = false)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Per-document duplicated-span statistics — the exact-substring-dedup
    * metric of Lee et al. 2021 ("Deduplicating Training Data Makes
    * Language Models Better"), in its shuffle-friendly n-gram-count
    * formulation: a k-token window occurrence is DUPLICATED when the
    * same window text occurs >= 2 times corpus-wide (in another doc or
    * repeated within this one). Returns one row per input doc:
    * `n_grams` (k-token window occurrences), `dup_grams` (occurrences
    * whose gram is duplicated), `dup_frac` (0.0 for docs shorter than
    * k tokens). Training pipelines drop or trim docs above a
    * `dup_frac` threshold before near-dup passes even run.
    *
    * Scale shape (the suffix-array original is single-machine; this is
    * the distributed equivalent over FIXED k): grams are positional
    * 64-bit hashes — full text never enters a shuffle. ONE scan feeds a
    * map-side-combined per-(doc, gram) count, then per-gram corpus
    * totals come from `sum over (partition by gram)` — a window, NOT a
    * totals-table self-join, because the join's two sides are distinct
    * subtrees Spark won't exchange-reuse, which re-ran the whole
    * scan+tokenize+hash stage (verified in `.explain`: two parquet
    * scans; the window form has one) — then a per-doc rollup. No caps
    * needed: nothing is quadratic — a boilerplate gram shared by a
    * million docs is one buffered (spillable) window partition, not a
    * million^2 pair block.
    *
    * Gram identity is a single 64-bit hash: past ~2^32 distinct grams
    * the birthday bound makes some collisions certain, each inflating
    * `dup_grams` by the colliding occurrences — at 10^12 grams the
    * expected overcount is ~n²/2⁶⁵ ≈ 0.003% of grams, inside this
    * METRIC's tolerance (cf. the documented HLL/MinHash error budgets).
    * The destructive removal ops below use a 128-bit double hash
    * instead, because there a collision deletes text. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame = {
    // small-input CPU spreading + AQE-exempt pins, exactly as in
    // TextAnalysis.bigramSurprisal (see cpuSpreadTarget's scaladoc):
    // the tokenize+gram-hash map stage otherwise runs on the scan's
    // byte-sized task count, and the gram aggregation/window behind it
    // coalesce to near-serial stages on small-bytes corpora
    val spreadN = TextAnalysis.cpuSpreadTarget(df)
    val src = spreadN.map(n => df.repartition(n, col(idCol))).getOrElse(df)
    def pin(frame: DataFrame, keys: Column*): DataFrame =
      spreadN.map(n => frame.repartition(n, keys: _*)).getOrElse(frame)
    // token array materialized in its own Project (same shape-lesson as
    // repetitionMetrics: higher-order fns re-evaluate non-trivial
    // inputs per element; an attribute reference is free)
    val toked = src.select(col(idCol).as("id"),
      filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("__t"))
    val grams = toked.select(col("id"),
      explode(when(size(col("__t")) >= k,
        transform(sequence(lit(1), size(col("__t")) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(col("__t"), i, lit(k))))))
        .otherwise(array().cast("array<bigint>"))).as("gram"))
    val perDocGram = pin(grams, col("id"), col("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("c"))
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val per = pin(perDocGram, col("gram"))
      .withColumn("total", sum(col("c")).over(byGram))
      .groupBy("id")
      .agg(sum(col("c")).as("n_grams"),
           sum(when(col("total") >= 2, col("c")).otherwise(0L)).as("dup_grams"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"))
      .withColumn("dup_frac", when(col("n_grams") === 0, lit(0.0))
        .otherwise(col("dup_grams").cast("double") / col("n_grams").cast("double")))
  }

  /** Duplicated-span REMOVAL — the excision step completing
    * [[duplicatedSpans]]'s metrics: every token covered by a k-token
    * window whose text occurs >= `minCount` times corpus-wide is
    * dropped, and the surviving tokens re-join into `clean_text`. This
    * is the boilerplate-excision flavor of exact-substring dedup
    * (repeated headers/footers/navigation chrome vanish EVERYWHERE,
    * including their first occurrence); the keep-one-copy variant of
    * Lee et al. 2021 needs a canonical-occurrence choice this operator
    * deliberately avoids (document-level near-dup ops keep
    * representatives; span removal targets text no copy of which
    * should train). Output per input row: `clean_text`, `n_tokens`
    * (before), `n_removed`.
    *
    * Scale shape — everything LINEAR, no quadratic step anywhere:
    * gram totals by window over the gram hash (one shuffle, as in
    * [[duplicatedSpans]]); duplicated starts explode to their k
    * covered positions (O(k * dup-starts) rows, ids+ints only); kept
    * tokens = one (id, position) anti join; reassembly = one groupBy
    * over struct-sorted collect_list (documents are row-sized by
    * contract, so the per-doc list is bounded). The corpus is
    * tokenized twice (gram pass + token pass) — two cheap codegen'd
    * map scans, deliberately NOT a corpus-sized cached token table.
    *
    * Excision is destructive, so gram identity is NOT a single 64-bit
    * hash: at 100 TB the distinct-gram count blows past the 2^32
    * birthday bound and a lone xxhash64 would silently delete
    * non-duplicated text on collision. Two independent 64-bit hashes of
    * the gram text (the second seeded by a constant prefix) form the
    * dup key — an effective 128-bit key whose collision odds at n
    * grams are ~n²/2¹²⁹ (≪ 10⁻¹² even at 10¹⁴ grams), while keeping the
    * shuffle rows ids+ints only (gram TEXT never enters an exchange). */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 8, minCount: Int = 2): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val toked = tokedFrame(df, idCol, textCol)
    def pin(frame: DataFrame, keys: Column*): DataFrame =
      TextAnalysis.cpuSpreadTarget(df)
        .map(n => frame.repartition(n, keys: _*)).getOrElse(frame)
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram", "gram2")
    val covered = pin(gramStarts(toked, k), col("gram"), col("gram2"))
      .withColumn("total", count(lit(1)).over(byGram))
      .filter(col("total") >= minCount)
      .select(col("id"), explode(sequence(col("i"), col("i") + (k - 1))).as("j"))
      .distinct()
    exciseCovered(df, idCol, textCol, toked, covered)
  }

  /** `(id, __t: array<string>)` tokenization shared by the excision
    * operators — small-input CPU spreading applied here so BOTH
    * variants' tokenize+gram-hash map stages parallelize (see
    * TextAnalysis.cpuSpreadTarget; no-op at real corpus scale). */
  private def tokedFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val src = TextAnalysis.cpuSpreadTarget(df)
      .map(n => df.repartition(n, col(idCol))).getOrElse(df)
    src.select(col(idCol).as("id"),
      filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("__t"))
  }

  /** Shared excision tail: drop the `covered` (id, 1-based position)
    * set from `toked`, reassemble survivors in position order, and
    * emit (idCol, clean_text, n_tokens, n_removed) for EVERY input row
    * (untouched docs included). Both span-removal variants are this
    * pipeline; they differ only in how `covered` is computed. */
  private def exciseCovered(df: DataFrame, idCol: String, textCol: String,
                            toked: DataFrame, covered: DataFrame): DataFrame = {
    val tokenRows = toked
      .select(col("id"), posexplode(col("__t")).as(Seq("__p", "tok")))
      .select(col("id"), (col("__p") + 1).as("j"), col("tok"))
    val kept = tokenRows.join(covered, Seq("id", "j"), "left_anti")
      .groupBy("id")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("j"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("id"),
        size(filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0))
          .cast("long").as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** 1-based k-gram start positions over a pre-tokenized frame
    * `(id, __t: array<string>)`, each gram identified by TWO
    * independent 64-bit hashes of its text (`gram`, `gram2` — the
    * second hash is the same function seeded by a constant first
    * argument). The gram string exists only inside this one codegen'd
    * map stage; what flows downstream (and into any exchange) is
    * (id, i, gram, gram2) — ids and ints. */
  private def gramStarts(toked: DataFrame, k: Int): DataFrame =
    toked.select(col("id"),
      posexplode(when(size(col("__t")) >= k,
        transform(sequence(lit(1), size(col("__t")) - (k - 1)),
          i => concat_ws(" ", slice(col("__t"), i, lit(k)))))
        .otherwise(array().cast("array<string>"))).as(Seq("__p", "__g")))
      .select(col("id"), (col("__p") + 1).as("i"),
        xxhash64(col("__g")).as("gram"),
        xxhash64(lit(0x9E3779B97F4A7C15L), col("__g")).as("gram2"))

  /** Keep-one-copy exact-substring dedup — the canonical Lee et al.
    * 2021 ("Deduplicating Training Data Makes Language Models Better",
    * `scripts/dedup` in its repo is the suffix-array original) variant
    * of [[removeDuplicatedSpans]]: a k-token span occurring >=
    * `minCount` times corpus-wide keeps exactly ONE occurrence — the
    * minimum (doc_id, position) one, a deterministic canonical rule so
    * the result is oracle-checkable — and every OTHER occurrence's
    * tokens are excised. This is the form most pipelines mean by
    * "exact-substring dedup": the first copy of a repeated passage
    * still trains; copies two..n vanish.
    *
    * A canonical occurrence's tokens may still be removed when some
    * OTHER duplicated gram covers them non-canonically (overlapping
    * spans — the spec pins this with a hand-computed corpus): removal
    * is per gram-occurrence, and a token survives only if NO
    * non-canonical duplicated occurrence covers it.
    *
    * Scale shape: identical to [[removeDuplicatedSpans]] (linear, one
    * gram-keyed window shuffle of ids+ints, anti join, bounded per-doc
    * reassembly) plus one `min(struct(id, i))` alongside the window
    * count — same exchange, one extra aggregate buffer. Same 128-bit
    * double-hash gram identity (destructive op ⇒ collision-guarded). */
  def removeDuplicatedSpansKeepFirst(df: DataFrame, idCol: String, textCol: String,
                                     k: Int = 8, minCount: Int = 2): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val toked = tokedFrame(df, idCol, textCol)
    def pin(frame: DataFrame, keys: Column*): DataFrame =
      TextAnalysis.cpuSpreadTarget(df)
        .map(n => frame.repartition(n, keys: _*)).getOrElse(frame)
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy("gram", "gram2")
    val covered = pin(gramStarts(toked, k), col("gram"), col("gram2"))
      .withColumn("total", count(lit(1)).over(byGram))
      .withColumn("canon", min(struct(col("id"), col("i"))).over(byGram))
      .filter(col("total") >= minCount &&
        struct(col("id"), col("i")) =!= col("canon"))
      .select(col("id"), explode(sequence(col("i"), col("i") + (k - 1))).as("j"))
      .distinct()
    exciseCovered(df, idCol, textCol, toked, covered)
  }

  /** Benchmark decontamination — the n-gram overlap check every LLM
    * training pipeline runs against held-out eval sets (the GPT-3 /
    * PaLM appendix procedure): a training doc is CONTAMINATED when it
    * shares >= `minShared` distinct `width`-token shingles with ANY
    * benchmark doc. Returns one row per training doc: `matched`
    * (distinct shingles also present in the benchmark set) and the
    * `contaminated` verdict.
    *
    * Scale shape: the benchmark side collapses to DISTINCT 64-bit
    * shingle hashes — megabytes for real eval suites even at 13-grams —
    * and is broadcast by default (`broadcastBench`), so the 100 TB
    * training scan never shuffles: explode shingles, hash-join against
    * the broadcast set map-side, partial-count per doc. With
    * `broadcastBench = false` it degrades to a shuffle join on the
    * gram hash for pathologically large benchmark sets. */
  def contaminationReport(train: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          width: Int = 13, minShared: Int = 1,
                          broadcastBench: Boolean = true): DataFrame = {
    val bg0 = bench.select(explode(shingleHashes(col(textCol), width)).as("gram")).distinct()
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    // shingleHashes is distinct-per-doc, so the post-join count IS the
    // distinct shared-shingle count — no second distinct needed
    val tg = train.select(col(idCol).as("id"),
      explode(shingleHashes(col(textCol), width)).as("gram"))
    val matched = tg.join(bg, "gram").groupBy("id").agg(count(lit(1)).as("matched"))
    train.select(col(idCol).as("id")).join(matched, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("matched"), lit(0L)).as("matched"),
        (coalesce(col("matched"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** [[contaminationReport]]'s 100 TB path: a broadcast Bloom filter of
    * the benchmark grams PRE-FILTERS the training-gram stream before
    * the exact confirm join. The broadcast variant ships the gram set
    * as a join table (8 bytes/gram + hash table, ~8 GB broadcast
    * ceiling); the Bloom filter is ~10 bits/gram at 1% fpp — ~50×
    * smaller — and membership is a codegen'd O(1) probe inside the
    * scan stage. Bloom filters have NO false negatives and the
    * surviving grams still confirm against the real gram set (a
    * shuffle join, but over ~(matches + fpp·stream) rows instead of
    * the whole stream), so the output is BIT-IDENTICAL to
    * [[contaminationReport]] at any fpp — spec-pinned at 1% and at a
    * deliberately terrible 40%. `expectedGrams < 0` sizes the filter
    * with one count job; pass an estimate to skip it. */
  def contaminationReportBloom(train: DataFrame, bench: DataFrame,
                               idCol: String, textCol: String,
                               width: Int = 13, minShared: Int = 1,
                               fpp: Double = 0.01,
                               expectedGrams: Long = -1L): DataFrame = {
    val bg = bench.select(explode(shingleHashes(col(textCol), width)).as("gram")).distinct()
    val n = if (expectedGrams > 0) expectedGrams else math.max(bg.count(), 1L)
    val bloom = bg.stat.bloomFilter("gram", n, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val tg = train.select(col(idCol).as("id"),
        explode(shingleHashes(col(textCol), width)).as("gram"))
      .filter(graft.functions.TextFunctions.bloom_might_contain_long(col("gram"), bytes))
    val matched = tg.join(bg, "gram").groupBy("id").agg(count(lit(1)).as("matched"))
    train.select(col(idCol).as("id")).join(matched, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("matched"), lit(0L)).as("matched"),
        (coalesce(col("matched"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs that share at
    * least one shingle-hash (inverted-index blocking: explode shingles,
    * group per shingle, pair within the group; |A∪B| = |A|+|B|-shared).
    *
    * Skew guards, both lossless-by-default at sane settings:
    *  - shingles appearing in exactly one doc pair with nothing, so the
    *    `>= 2` group filter is exactness-preserving and prunes the vast
    *    majority of the inverted index;
    *  - shingles appearing in more than `maxDf` docs (stop-phrases) are
    *    dropped — the 100 TB guard. Pairs whose every shared shingle is
    *    that common under-count `shared`; set `maxDf` above the corpus's
    *    true near-dup cluster size to keep the result exact.
    * `minShared` prunes single-collision pairs before the jaccard math. */
  /** Shared-shingle pair counting — the common core of the exact
    * overlap family: `(id_a, id_b, n_a, n_b, shared)` for every pair
    * co-occurring in ≥ `minShared` shingle postings (inverted index,
    * `maxDf`-capped). Jaccard and containment are just different
    * ratios over these five columns. */
  private def sharedShinglePairs(df: DataFrame, idCol: String, textCol: String,
                                 shingleWidth: Int, minShared: Int,
                                 maxDf: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingleHashes(col(textCol), shingleWidth).as("shingles"))
      .withColumn("n_sh", size(col("shingles")).cast("long"))
    val inv = sh.select(explode(col("shingles")).as("shingle"),
      struct(col("id"), col("n_sh")).as("doc"))
    // Partition sizing for the inverted-index exchange, derived from the
    // INPUT size instead of the session default. The group-by below is an
    // OBJECT aggregate (collect_list) whose per-partition state dominates
    // memory: at a measured 100× corpus the session default (one partition
    // per core) spilled ~42 GB there, while 4× more partitions cut cpu from
    // 2.4× to 1.68× of linear ideal (PLANS.md r16 addendum 3 — the knob
    // experiment this code internalizes). Postings explode to ~one row per
    // input token, measured ~48× the compressed input bytes, and ~16 MB of
    // postings per reduce partition keeps the object agg's list state
    // in-memory. Floored at the session setting (small inputs keep their
    // plan unchanged), capped at 4096 (a bad estimate must not schedule
    // millions of reduce tasks; at genuinely larger corpora raise the
    // session setting, which the floor honors). Result-identical: a
    // repartition below a groupBy on the same key only picks the exchange's
    // partition count — EnsureRequirements reuses it, so the plan still has
    // exactly one exchange before the aggregate.
    val postingBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes * 48
    val sessionParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val nPart = postingBytes./(16L << 20).min(4096).max(sessionParts).toInt
    val grouped = inv.repartition(nPart, col("shingle")).groupBy("shingle")
      .agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, maxDf))
      .withColumn("docs", array_sort(col("docs"))) // struct sort: by id, ids unique -> id_a < id_b
    val docs = col("docs")
    // element_at index pairs instead of per-element tail slices — the
    // same rewrite as blockPairs (this explode is the CPU sink of the
    // exact-overlap family: q49/q135/q209 burn ~20-25 s CPU each at
    // sf0.1, mostly copying (id, n_sh) structs out of sliced tails)
    val nd = size(docs)
    val pairs = flatten(transform(sequence(lit(1), nd - 1), i =>
      transform(sequence(i + 1, nd), j =>
        struct(element_at(docs, i).as("a"), element_at(docs, j).as("b")))))
    grouped.select(explode(pairs).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.a.n_sh").as("n_a"),
        col("p.b.id").as("id_b"), col("p.b.n_sh").as("n_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleWidth: Int = 3, threshold: Double = 0.5,
                        minShared: Int = 2, maxDf: Int = 1000): DataFrame =
    sharedShinglePairs(df, idCol, textCol, shingleWidth, minShared, maxDf)
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Containment pairs — ASYMMETRIC near-dup detection: a short doc
    * quoted wholesale inside a much larger one has a tiny Jaccard
    * (the union is dominated by the big doc) but containment
    * `|A∩B| / |A|` ≈ 1. This is the detector for quote/aggregation
    * dupes that every symmetric measure structurally misses — the
    * standard companion to Jaccard in exact-overlap dedup (Broder's
    * containment). Emits both directions plus their max; filter on
    * `containment` (the max) to catch either orientation. Same
    * DF-capped inverted-index machinery and cost as
    * [[ngramJaccardPairs]]. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleWidth: Int = 3, threshold: Double = 0.8,
                       minShared: Int = 2, maxDf: Int = 1000): DataFrame =
    sharedShinglePairs(df, idCol, textCol, shingleWidth, minShared, maxDf)
      .withColumn("containment_a", col("shared").cast("double") / col("n_a").cast("double"))
      .withColumn("containment_b", col("shared").cast("double") / col("n_b").cast("double"))
      .withColumn("containment", greatest(col("containment_a"), col("containment_b")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment_a", "containment_b", "containment")

  /** Persisted content-fingerprint store for INCREMENTAL dedup: dedup
    * each day's batch against the full corpus history without ever
    * re-scanning the history. The store holds only distinct md5 content
    * fingerprints (32-byte rows — ~3 orders of magnitude smaller than
    * the corpus), hash-bucketed into `nBuckets` hive partitions so a
    * probe can prune at the DIRECTORY level. `meta` pins nBuckets — the
    * probe side must bucket identically or dedup silently misses.
    *
    * Maintenance: after accepting a batch, append its surviving
    * fingerprints with `mode = "append"` (same path, same nBuckets).
    * Appends create small files; re-cluster occasionally by rewriting
    * with `mode = "overwrite"` — exactly a ClickHouse part merge. */
  /** Store `meta` existence via the Hadoop FileSystem of the path's
    * scheme — `java.io.File` would silently answer false on hdfs:// or
    * s3a:// stores, skipping the parameter-mismatch guard and letting a
    * differently-bucketed append land where probes never look. */
  private def metaExists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val meta = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      meta.toUri, spark.sparkContext.hadoopConfiguration)
    fs.exists(meta)
  }

  def writeFingerprintStore(df: DataFrame, textCol: String, path: String,
                            nBuckets: Int = 64, mode: String = "overwrite"): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    // an append with a DIFFERENT bucketing than the store's would put
    // new fingerprints where probes never look — silent missed dupes;
    // fail loudly instead of corrupting
    if (mode.equalsIgnoreCase("append") && metaExists(spark, path)) {
      val existing = spark.read.parquet(s"$path/meta").head().getInt(0)
      require(existing == nBuckets,
        s"fingerprint store at $path has nBuckets=$existing, append used $nBuckets")
    }
    df.select(md5(col(textCol)).as("fp")).distinct()
      .withColumn("bucket", pmod(xxhash64(col("fp")), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("bucket"))
      .write.mode(mode).partitionBy("bucket").parquet(s"$path/fps")
    import spark.implicits._
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Anti-join a new batch against a fingerprint store: keeps only rows
    * whose content hash has never been seen. Within-batch duplicates
    * are NOT collapsed here (compose with [[exactByHash]] for that) —
    * this operator answers "new vs history".
    *
    * Scale shape: the batch's distinct bucket ids (≤ nBuckets values,
    * driver-bounded) become a LITERAL partition filter on the store
    * scan — a small or skewed increment reads only its buckets'
    * directories (PartitionFilters, spec-pinned); the anti join then
    * shuffles fingerprints, never text. History cost is O(store
    * fingerprints in probed buckets), independent of history SIZE. */
  def dedupAgainstStore(df: DataFrame, textCol: String, path: String): DataFrame = {
    val spark = df.sparkSession
    val nBuckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    // persisted: the probe lineage (md5 + xxhash64 over the batch text)
    // feeds BOTH the driver-side distinct-bucket collect and the anti
    // join — without the persist the whole batch is scanned and hashed
    // twice
    val probe = graft.core.CacheScope.track(df.withColumn("__fp", md5(col(textCol)))
      .withColumn("__bucket", pmod(xxhash64(col("__fp")), lit(nBuckets.toLong)).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val buckets = probe.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted // driver-bounded: <= nBuckets values
    val store = spark.read.parquet(s"$path/fps")
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
    probe.join(store,
        probe("__fp") === store("fp") && probe("__bucket") === store("bucket"),
        "left_anti")
      .drop("__fp", "__bucket")
  }

  /** Persist the MinHash LSH index of a corpus: the NEAR-dup sibling of
    * [[writeFingerprintStore]]. Two tables under `path`: `bands/`
    * ((band, bucket, id), hive-partitioned by `part =
    * pmod(xxhash64(band, bucket), nParts)` — the probe's pruning key)
    * and `sigs/` ((id, sig), partitioned by `pmod(xxhash64(id),
    * nParts)` — scoring joins prune the same way). The store is ids +
    * signatures only: ≈ numHashes longs per doc, orders smaller than
    * the corpus text it indexes. `meta` pins every parameter that
    * shapes the index; `mode=append` is the post-batch maintenance
    * path and refuses a parameter mismatch (an append banded
    * differently would land where probes never look — silent missed
    * dupes). */
  /** Size-derived partition count for persisted index stores
    * (optimization round 21, guide §6 small-files): hive-partition
    * granularity should scale with the CORPUS, not sit at a constant.
    * A bench-scale corpus written into 64 hive dirs pays ~130 file
    * creates + commits for KBs of data (measured: the q131 store write
    * dropped 5.7 s → 1.4 s and its probe 6.8 s → 3.5 s going 64 → 8
    * parts at sf0.1), while a 100 TB corpus WANTS thousands of
    * prunable parts. ~8 MB of input bytes per part, clamped to
    * [1, 4096] like sharedShinglePairs' derived sizing; index rows are
    * ids+hashes (orders smaller than the input), so parts stay well
    * under a filesystem-friendly size. Store round trips are
    * parameter-pinned via `meta`, so probes derive nothing — they read
    * the built store's value; results are nParts-independent (the
    * goldens pin explicit nParts layouts separately). */
  /** `minParts` floors the derived count: a probe-facing store (the
    * BM25 lexical index) wants a handful of prunable directories even
    * for a tiny corpus — r21 derived 1 part at bench scale and the
    * single-task build write cost more than the small-files problem it
    * avoided (q146 1.7 → 2.2 s in the only clean r21 measurement).
    *
    * Size estimates are only trusted for narrow scan-rooted frames:
    * for exchange-bearing inputs (joins especially) Catalyst's
    * estimate can be a product of child sizes — wildly high — and the
    * 4096 clamp would recreate the thousands-of-tiny-files problem
    * this derivation exists to fix (r21 ADVICE). Those fall back to
    * the session parallelism, the pre-r21 behavior's scale. */
  def derivedStoreParts(df: DataFrame, minParts: Int = 1): Int = {
    require(minParts >= 1, s"minParts must be >= 1, got $minParts")
    if (!TextAnalysis.narrowOnly(df.queryExecution.optimizedPlan))
      return math.max(minParts, df.sparkSession.sessionState.conf.numShufflePartitions)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    bytes./(8L << 20).min(4096).max(minParts).toInt
  }

  def writeMinhashStore(df: DataFrame, idCol: String, textCol: String, path: String,
                        numHashes: Int = 32, bands: Int = 8, shingleWidth: Int = 3,
                        nParts: Int = 64, mode: String = "overwrite"): Unit = {
    require(nParts >= 1, s"nParts must be >= 1, got $nParts")
    require(bands >= 1, s"bands must be >= 1, got $bands") // before the modulo: no ArithmeticException
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = df.sparkSession
    if (mode.equalsIgnoreCase("append") && metaExists(spark, path)) {
      val m = spark.read.parquet(s"$path/meta").head()
      require(m.getInt(0) == numHashes && m.getInt(1) == bands &&
        m.getInt(2) == shingleWidth && m.getInt(3) == nParts,
        s"minhash store at $path was built with (numHashes, bands, shingleWidth, nParts) = " +
          s"(${m.getInt(0)}, ${m.getInt(1)}, ${m.getInt(2)}, ${m.getInt(3)}); " +
          s"append used ($numHashes, $bands, $shingleWidth, $nParts)")
    }
    val sigs = minhashSigs(df, idCol, textCol, numHashes, shingleWidth)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bandedOf(sigs, numHashes, bands)
      .withColumn("part", pmod(xxhash64(col("band"), col("bucket")), lit(nParts.toLong)).cast("int"))
      .repartition(col("part"))
      .write.mode(mode).partitionBy("part").parquet(s"$path/bands")
    sigs.withColumn("part", pmod(xxhash64(col("id")), lit(nParts.toLong)).cast("int"))
      .repartition(col("part"))
      .write.mode(mode).partitionBy("part").parquet(s"$path/sigs")
    sigs.unpersist()
    import spark.implicits._
    Seq((numHashes, bands, shingleWidth, nParts))
      .toDF("num_hashes", "bands", "shingle_width", "n_parts")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Near-dup candidates of a new batch AGAINST the store — incremental
    * MinHash dedup without re-scanning (or even re-signing) the corpus
    * history. Returns `(id_a, id_b, est_jaccard)` pairs, `id_a < id_b`,
    * for every (batch doc, stored doc) sharing a band bucket —
    * batch-INTERNAL pairs are not this operator's job (compose with
    * [[minHashCandidates]] over the batch for those).
    *
    * Scale shape mirrors [[dedupAgainstStore]]: the batch's distinct
    * band-bucket parts (≤ nParts, driver-bounded) become a LITERAL
    * partition filter on the `bands/` scan, and the candidate store
    * ids' parts prune `sigs/` the same way — history cost is O(index
    * rows in probed partitions), independent of corpus size. Bucket
    * capping matches the in-memory operator on the UNION of store and
    * batch members, so probing a store with its own corpus reproduces
    * [[minHashCandidates]] exactly (the battery's hash-equality
    * receipt). */
  def minhashCandidatesAgainstStore(batch: DataFrame, idCol: String, textCol: String,
                                    path: String, maxBucketSize: Int = 500): DataFrame = {
    val spark = batch.sparkSession
    val m = spark.read.parquet(s"$path/meta").head()
    val (numHashes, bands, shingleWidth, nParts) =
      (m.getInt(0), m.getInt(1), m.getInt(2), m.getInt(3))
    val sigs = graft.core.CacheScope.track(
      minhashSigs(batch, idCol, textCol, numHashes, shingleWidth)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = bandedOf(sigs, numHashes, bands)
      .withColumn("part", pmod(xxhash64(col("band"), col("bucket")), lit(nParts.toLong)).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val parts = banded.select("part").distinct()
      .collect().map(_.getInt(0)).sorted // driver-bounded: <= nParts values
    val storeBands = spark.read.parquet(s"$path/bands")
      .filter(col("part").isin(parts.map(Int.box): _*))
      .select(col("band"), col("bucket"), col("id"))
    // cap on the JOINT bucket membership (store ∪ batch, distinct ids):
    // identical to blockPairs' cap when the batch is already stored,
    // and the honest "what the bucket will hold" size when it is new
    val members = storeBands
      .unionByName(banded.select(col("band"), col("bucket"), col("id")))
      .distinct()
    val okBuckets = members.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz").between(2, maxBucketSize))
      .select("band", "bucket")
    val rawPairs = storeBands
      .join(okBuckets, Seq("band", "bucket"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("__bid")),
        Seq("band", "bucket"))
      .filter(col("id") =!= col("__bid"))
      .select(least(col("id"), col("__bid")).as("id_a"),
        greatest(col("id"), col("__bid")).as("id_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheScope.track(rawPairs)
    val sigParts = rawPairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .select(pmod(xxhash64(col("id")), lit(nParts.toLong)).cast("int").as("part"))
      .distinct().collect().map(_.getInt(0)).sorted
    // the collect above materialized rawPairs, and banded feeds nothing
    // else — release it here so repeated incremental probes in a
    // long-lived session don't accumulate cached band partitions. `sigs`
    // and rawPairs stay cached while the RETURNED plan scores pairs from
    // them; both are CacheScope-tracked, so the HTTP layer releases them
    // when the response finishes streaming (batch callers: they live
    // until session end, as before).
    banded.unpersist()
    val storeSigs = spark.read.parquet(s"$path/sigs")
      .filter(col("part").isin(sigParts.map(Int.box): _*))
      .select(col("id"), col("sig"))
    // either side of a pair may live in the store, the batch, or both
    // (re-probing stored docs); same id ⇒ same text ⇒ same signature,
    // so an arbitrary survivor per id is exact
    val allSigs = storeSigs.unionByName(sigs.select(col("id"), col("sig")))
      .dropDuplicates("id")
    rawPairs
      .join(allSigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(allSigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b"), numHashes).as("est_jaccard"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * NEVER straddle a split boundary — a test doc with a near-copy in
    * train is benchmark contamination by construction, and a plain
    * per-doc hash split scatters every duplicate family across all
    * three splits. Here the split key is the near-dup CLUSTER
    * representative (MinHash candidates ≥ `threshold`, closed
    * transitively), hashed with the same deterministic FNV machinery
    * as [[graft.operators.TextAnalysis.hashSampleCond]]: the whole
    * family lands in one split, singleton docs are their own cluster,
    * and membership is a pure function of (corpus, salt) — same rows
    * on any cluster, any partitioning, any day.
    *
    * `splits` are (label, fraction) in order, fractions summing to 1
    * (±1e-9); cut points are cumulative on the 10k-bucket hash ring,
    * the last split absorbing the rounding tail. Output = input
    * columns + `cluster` + `split`.
    *
    * Cost = the candidate pass (capped LSH buckets, ids-only shuffles)
    * + O(log n) star-contraction rounds + one hash — the same
    * machinery q47/q61 already run at corpus scale; nothing here is
    * quadratic. */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       splits: Seq[(String, Double)], salt: String = "",
                       threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
                       shingleWidth: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    require(splits.nonEmpty, "leakageSafeSplit needs at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size, "duplicate split labels")
    val pairs = minHashCandidates(df, idCol, textCol, numHashes, bands,
        shingleWidth, maxBucketSize)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b")
    val comps = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("cluster").as("__cc"))
    val bucket = pmod(
      TextFunctions.fingerprint64(concat(lit(salt), col("cluster").cast("string"))),
      lit(10000L))
    // cumulative cut points; the last is pinned to 10000 so rounding
    // can never orphan a bucket
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * 10000))
      .dropRight(1) :+ 10000L
    val label = splits.map(_._1).zip(cuts).reverse
      .foldLeft(lit(null: String)) { case (acc, (name, cut)) =>
        when(bucket < cut, name).otherwise(acc)
      }
    df.join(comps, df(s"`$idCol`") === comps("__cc_id"), "left")
      .withColumn("cluster", coalesce(col("__cc"), col(s"`$idCol`")))
      .drop("__cc_id", "__cc")
      .withColumn("split", label)
  }
}
