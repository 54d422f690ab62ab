package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>).
  *
  * Two tiers, as a 100 TB design requires:
  *  - bruteForceTopK: exact. One codegen'd scan computing cosine per row
  *    + TakeOrderedAndProject (top-k without a global sort). The right
  *    baseline, and the right answer whenever the corpus fits a scan.
  *  - LSH tier: random-hyperplane buckets as a pre-filter. Probing the
  *    query's bucket plus all 1-bit-flip neighbors bounds recall loss
  *    while scanning ~ (nPlanes+1)/2^nPlanes of the data. Buckets are a
  *    plain column — at scale, partition/Z-order the corpus by bucket so
  *    probes prune parquet row groups instead of scanning.
  *
  * Embedding dimensionality is DERIVED from the data (first non-empty
  * vector — one tiny LocalLimit job), and `lsh_bucket` throws on any
  * row whose dim disagrees, so a mixed-dim corpus fails loudly instead
  * of silently bucketing to null / returning empty joins.
  */
object SimilaritySearch {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  // Per-corpus metadata caches, keyed by (canonicalized analyzed plan,
  // data epoch). Plan canonicalization gives structural equality — the
  // same table/filter combination hits the same entry — and the epoch
  // (graft.core.DataEpoch, bumped by every catalog append/evolve/drop)
  // invalidates entries when the data underneath a re-read path
  // changes, since Spark's file-relation equality is by root path only.
  // LRU-bounded (access-order LinkedHashMap): stale-epoch entries age
  // out instead of a clear-all wipe, and retained LogicalPlans can't
  // pin unbounded file-index metadata. A resident server answering many
  // ANN queries over one corpus pays the row-count scan and the dim
  // probe ONCE per epoch, not per query — at 100 TB a count per lookup
  // is a full metadata pass per lookup.
  // Values are memoized LAZY cells: the LRU map's lock is held only for
  // the (cheap) cell insertion, never for the Spark job inside — two
  // callers of the SAME key share one compute (the cell's lazy val
  // blocks the second until the first finishes, which is the dedup we
  // want), while DIFFERENT keys — other corpora, other epochs — never
  // block each other or cache hits. A failed compute propagates and is
  // retried on next access (lazy init failure leaves the cell blank).
  private[graft] final class Memo[V](thunk: () => V) { lazy val value: V = thunk() }
  private[graft] def lruCache[K, V](cap: Int): java.util.Map[K, Memo[V]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, Memo[V]](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, Memo[V]]): Boolean = size() > cap
      })
  private[graft] def memoize[K, V](cache: java.util.Map[K, Memo[V]], key: K)(compute: => V): V =
    cache.computeIfAbsent(key, _ => new Memo(() => compute)).value
  private val countCache = lruCache[(LogicalPlan, Long), Long](256)
  private val dimCache = lruCache[(LogicalPlan, Long, String), Int](256)
  private def planKey(df: DataFrame): LogicalPlan = df.queryExecution.analyzed.canonicalized

  /** Corpus row count for auto-sizing: catalog/plan statistics when the
    * optimizer knows them, else one count job cached per (corpus plan,
    * data epoch). Callers that know the size pass it explicitly and
    * never get here. */
  def corpusRowCount(corpus: DataFrame): Long =
    corpus.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong).getOrElse {
      memoize(countCache, (planKey(corpus), graft.core.DataEpoch.current))(corpus.count())
    }

  /** Embedding dim of the first non-empty vector (one LocalLimit job,
    * cached per (corpus plan, data epoch)). */
  def dimOf(df: DataFrame, vecCol: String): Int =
    memoize(dimCache, (planKey(df), graft.core.DataEpoch.current, vecCol)) {
      val head = df.select(size(col(vecCol)).as("d")).filter(col("d") > 0).head(1)
      require(head.nonEmpty, s"cannot derive embedding dim: no non-empty vectors in $vecCol")
      head.head.getInt(0)
    }

  /** Exact top-k by cosine similarity against one query vector. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val q = typedlit(query.toSeq)
    corpus.select(col(idCol), cosine_sim(col(vecCol), q).as("cosine"))
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Plane count sized to the corpus: buckets shrink until the expected
    * HOME bucket holds ~8k vectors, so one table's probed pool (1+p
    * buckets) is ~8k(1+p) and the default 4-table union is ~4x that.
    * Too many planes on a small corpus scatters everything into empty
    * buckets (recall collapse); too few on a big one stops pruning.
    * Clamped to [1, 24].
    *
    * Sizing rationale (seeded sweeps, see OperatorsSpec recall tests):
    * per-table Hamming<=1 probing loses recall once a plane count's
    * per-bit flip probability x p exceeds ~1, so recall is bought with
    * TABLES, not wider probing — at the q51/q52 test shapes (200-500
    * row corpora, 16-64 dims, auto p in [2,3]) one table measures
    * r ~= 0.68-0.90 and the 4-table union >= 0.9; the same union holds
    * >= 0.9 on a clustered corpus at auto settings. At 100 TB the knobs
    * separate cleanly: nPlanes tracks corpus growth (log2(n/8k)),
    * nTables stays the recall dial (4 default; raise for tighter
    * floors, drop to 1-2 for cheap coarse retrieval). */
  def autoPlanes(corpusSize: Long, k: Int): Int = {
    val target = math.max(8.0 * k, 1.0)
    val p = math.floor(math.log(corpusSize.toDouble / target) / math.log(2.0)).toInt
    math.min(24, math.max(1, p))
  }

  /** Annotate a corpus with its LSH bucket (do this once, persist it). */
  def withBucket(corpus: DataFrame, vecCol: String, nPlanes: Int = 12,
                 seed: Long = 42L): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    corpus.withColumn("bucket", lsh_bucket(col(vecCol), makePlanes(nPlanes, dim, seed), nPlanes))
  }

  /** ANN top-k: scan only the query's bucket and its 1-bit-flip
    * neighbors (multi-probe) in each of `nTables` independent hash
    * tables, then exact cosine within the probed union.
    *
    * `nTables` is the RECALL knob (classic LSH: a neighbor missed by
    * one table's buckets is caught by another's — recall compounds as
    * 1-(1-r)^L while probed volume grows only linearly in L), measured
    * against the per-table pruning that `nPlanes` controls. All tables
    * are evaluated in ONE scan (the filter is an OR of per-table
    * bucket predicates), so extra tables cost dot products, not extra
    * passes. `nPlanes = 0` (default) sizes the plane count from the
    * corpus ([[autoPlanes]]) — a tiny corpus degrades gracefully toward
    * exact scan instead of scattering into thousands of empty buckets.
    * Pass `corpusSize` when you know it (or fix `nPlanes`) to avoid
    * even the one cached sizing count. */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, nPlanes: Int = 0, seed: Long = 42L,
              corpusSize: Long = -1L, nTables: Int = 4): DataFrame = {
    val p = if (nPlanes > 0) nPlanes
            else autoPlanes(if (corpusSize >= 0) corpusSize else corpusRowCount(corpus), k)
    val inProbedBuckets = (0 until math.max(1, nTables)).map { t =>
      val planes = makePlanes(p, query.length, seed + 7919L * t)
      val qBucket = bucketOf(query, planes, p)
      val probes = qBucket +: (0 until p).map(b => qBucket ^ (1 << b))
      lsh_bucket(col(vecCol), planes, p).isin(probes: _*)
    }.reduce(_ || _)
    bruteForceTopK(corpus.filter(inProbedBuckets), idCol, vecCol, query, k)
  }

  /** k-NN join: top-k corpus neighbors for EVERY query row. Exact
    * variant (crossJoin) for validation; the approximate path is the
    * scalable shape:
    *  - `nTables` INDEPENDENT HASH TABLES: the recall knob (see
    *    [[annTopK]]) — candidate volume grows linearly in L, recall
    *    loss decays geometrically;
    *  - MULTI-PROBE: each query probes its own LSH bucket plus every
    *    1-bit-flip neighbor per table, so true neighbors just
    *    across one hyperplane stay reachable;
    *  - SKEW CAP: corpus buckets holding more than `maxBucketSize`
    *    vectors are dropped (clustered/zero vectors would otherwise make
    *    the bucket join quadratic — the boilerplate guard, same trade as
    *    Dedup's block caps);
    *  - IDS-ONLY shuffle: the probe join carries (id, bucket) pairs
    *    only; both vector columns are re-joined once for scoring.
    * `nPlanes = 0` auto-sizes like [[annTopK]]; pass `corpusSize` to
    * skip the cached sizing count. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, exact: Boolean = false, nPlanes: Int = 0,
              corpusSize: Long = -1L, maxBucketSize: Int = 10000,
              nTables: Int = 4, seed: Long = 42L): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val paired =
      if (exact) q.crossJoin(c)
      else {
        val p = if (nPlanes > 0) nPlanes
                else autoPlanes(if (corpusSize >= 0) corpusSize else corpusRowCount(corpus), k)
        val nt = math.max(1, nTables)
        val dim = dimOf(corpus, vecCol)
        // `nTables` independent hash tables: a neighbor missed by one
        // table's probes is caught by another's (recall 1-(1-r)^L for
        // linear candidate cost — the standard LSH recall knob). Both
        // sides bucket once per table via ONE posexplode (no extra
        // scans); candidates join on (table, bucket).
        val tablePlanes = (0 until nt).map(t => makePlanes(p, dim, seed + 7919L * t))
        def buckets(vec: org.apache.spark.sql.Column) =
          posexplode(array(tablePlanes.map(pl => lsh_bucket(vec, pl, p)): _*))
        val cb = c.select(col("neighbor_id"), buckets(col("neighbor_vec")).as(Seq("tbl", "bucket")))
        // hot-bucket guard: the size table is at most nTables * 2^p rows
        val okBuckets = cb.groupBy("tbl", "bucket").agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize).select("tbl", "bucket")
        val probes = q.select(col("query_id"), buckets(col("query_vec")).as(Seq("tbl", "bucket")))
          .select(col("query_id"), col("tbl"), explode(array(
            col("bucket") +: (0 until p).map(b => col("bucket").bitwiseXOR(lit(1 << b))): _*)).as("bucket"))
        val candidates = probes
          .join(cb.join(okBuckets, Seq("tbl", "bucket")), Seq("tbl", "bucket"))
          .select("query_id", "neighbor_id").distinct()
        candidates.join(q, "query_id").join(c, "neighbor_id")
      }
    val scored = paired
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_sim(col("query_vec"), col("neighbor_vec")))
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold over LSH-banded
    * candidate blocks (embedding-cosine near-dup detection for dedup
    * pipelines).
    *
    * Blocking is pigeonhole-banded like [[Dedup.simHashPairs]]: the
    * nPlanes-bit hyperplane bucket is cut into `nBands` bands and rows
    * pair within any shared (band, bits) block — a pair whose buckets
    * differ in fewer than `nBands` bits is guaranteed blocked together
    * (strictly better recall than whole-bucket equality). Pairing runs
    * through [[Dedup.blockPairs]]: capped at `maxBucketSize` per block
    * (a clustered corpus — thousands of near-identical vectors — stays
    * bounded instead of going quadratic) and ids-only through the
    * shuffle; vectors are re-joined once for scoring.
    *
    * `exact = true` is the validation twin (cross join + threshold, no
    * blocking, no caps) — the oracle the approximate path's candidate
    * logic is checked against. */
  def embeddingDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, nPlanes: Int = 10,
                        nBands: Int = 2, maxBucketSize: Int = 500,
                        exact: Boolean = false): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val a = v.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val b = v.select(col("id").as("id_b"), col("vec").as("vec_b"))
    val paired =
      if (exact) a.crossJoin(b).filter(col("id_a") < col("id_b"))
      else {
        require(nBands >= 1, s"nBands must be >= 1, got $nBands") // before the modulo: no ArithmeticException
        require(nPlanes % nBands == 0, "nBands must divide nPlanes")
        val width = nPlanes / nBands
        val mask = (1 << width) - 1
        val planes = makePlanes(nPlanes, dimOf(corpus, vecCol), 42L)
        val banded = v
          .select(col("id"), lsh_bucket(col("vec"), planes, nPlanes).as("bucket"))
          .select(col("id"), posexplode(expr(
            s"transform(sequence(0, ${nBands - 1}), b -> shiftright(bucket, b * $width) & $mask)"))
            .as(Seq("band", "bits")))
        Dedup.blockPairs(banded, "id", Seq("band", "bits"), maxBucketSize)
          .join(a, "id_a").join(b, "id_b")
      }
    paired
      .withColumn("cosine", cosine_sim(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Per-vector affine int8 quantization: (q_min, q_scale, q_codes)
    * with `code = round((x - min) / scale) - 128` and `scale =
    * (max - min) / 255` — the 4× storage cut on the corpus's widest
    * column, the difference between a 100 TB and a 25 TB embedding
    * store. Constant vectors quantize to scale 1.0, all codes -128.
    * Dequantize: `x ≈ (code + 128) * scale + min`, max absolute error
    * scale/2. All math is double-precision built-ins in a fixed
    * operation order, so an SQL oracle replays the codes bit-for-bit;
    * pure map stage, no shuffle.
    *
    * Encoding is the codegen'd [[graft.functions.QuantizeCodes]]
    * expression (bit-identical to Spark's `round`): the previous
    * `transform(round(...))` lambda was CodegenFallback, and worse,
    * collapsed projections inlined the interpreted lambda into every
    * downstream consumer — q88's filter re-evaluated it three times
    * per row. q_min/q_scale stay projected in a FIRST select so the
    * array_min/array_max scans run once per row, not once per use. */
  def quantizeEmbeddings(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val vmin = array_min(v).cast("double")
    val vmax = array_max(v).cast("double")
    val scale = when(vmax > vmin, (vmax - vmin) / lit(255.0)).otherwise(lit(1.0))
    df.select(col(idCol), v.as("__v"), vmin.as("q_min"), scale.as("q_scale"))
      .select(col(idCol), col("q_min"), col("q_scale"),
        quantize_codes(col("__v"), col("q_min"), col("q_scale")).as("q_codes"))
  }

  /** Inverse of [[quantizeEmbeddings]]: reconstruct approximate float
    * vectors from (q_min, q_scale, q_codes). Uses the codegen'd
    * [[graft.functions.Dequantize]] expression — the previous
    * `transform` lambda was CodegenFallback (interpreted per-element
    * eval in the scan stage; q88 paid 11 s cold / 2 s warm for it). */
  def dequantizeEmbeddings(df: DataFrame): DataFrame =
    df.withColumn("q_restored",
      dequantize(col("q_codes"), col("q_scale"), col("q_min")))

  /** Driver-side bucket of one vector (same planes as the expression). */
  def bucketOf(v: Array[Float], planes: Array[Double], nPlanes: Int): Int = {
    val dim = planes.length / nPlanes
    var bucket = 0; var j = 0
    while (j < nPlanes) {
      var dot = 0.0; var i = 0
      while (i < dim) { dot += v(i).toDouble * planes(j * dim + i); i += 1 }
      if (dot > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** Materialize the corpus PARTITIONED BY LSH bucket: one directory per
    * bucket value. ANN probes over this layout become partition-pruned
    * scans — the scan reads (nProbes / 2^nPlanes) of the corpus from
    * DISK, not just post-filter in memory, which is the difference that
    * matters at 100 TB. One-time cost, amortized over every query. */
  def writeBucketed(corpus: DataFrame, vecCol: String, path: String,
                    nPlanes: Int = 12, seed: Long = 42L): Unit =
    withBucket(corpus, vecCol, nPlanes, seed)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** ANN top-k over a [[writeBucketed]] layout: the bucket predicate is a
    * PARTITION filter (directory pruning before any file is opened). */
  def annTopKBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                      idCol: String, vecCol: String, query: Array[Float], k: Int,
                      nPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    val planes = makePlanes(nPlanes, query.length, seed)
    val qBucket = bucketOf(query, planes, nPlanes)
    val probes = qBucket +: (0 until nPlanes).map(b => qBucket ^ (1 << b))
    val corpus = spark.read.parquet(path).filter(col("bucket").isin(probes: _*))
    bruteForceTopK(corpus, idCol, vecCol, query, k)
  }

  // ------------------------------------------------------------- IVF tier

  /** IVF-flat centroids: a deterministic corpus sample (hash-ordered, so
    * it is stable and spread across the id space), L2-normalized and
    * flattened row-major for the codegen'd assignment expression. k
    * centroids fit the driver trivially (k x dim doubles); at 100 TB
    * they are a broadcast constant inside whole-stage codegen, and cell
    * assignment is one map pass. (Sampled centroids are the standard
    * IVF baseline; Lloyd refinement would only reshuffle cell sizes.) */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int): Array[Double] =
    ivfCentroidRows(corpus, idCol, vecCol, nCells)._1

  /** [[ivfCentroids]] plus the number of seed rows actually sampled —
    * callers that need exactly `nCells` seeds (k-means) check the count
    * directly instead of inferring it from array-length divisibility
    * (which can mis-derive `dim` when n < nCells but n*dim happens to
    * divide nCells). */
  private def ivfCentroidRows(corpus: DataFrame, idCol: String, vecCol: String,
                              nCells: Int): (Array[Double], Int) = {
    val rows = corpus.select(col(vecCol))
      .filter(size(col(vecCol)) > 0)
      .orderBy(xxhash64(col(idCol)))
      .limit(nCells)
      .collect()
    require(rows.nonEmpty, "cannot build IVF centroids from an empty corpus")
    val dim = rows.head.getSeq[Float](0).length
    val out = new Array[Double](rows.length * dim)
    rows.zipWithIndex.foreach { case (r, j) =>
      val v = r.getSeq[Float](0)
      var norm = 0.0
      var i = 0
      while (i < dim) { val x = v(i).toDouble; norm += x * x; i += 1 }
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { out(j * dim + i) = v(i).toDouble * inv; i += 1 }
    }
    (out, rows.length)
  }

  /** Annotate each row with its IVF cell (argmax dot against normalized
    * centroids). Persist/partition by `cell` once per corpus — probes
    * then prune whole cells instead of scanning. */
  def withIvfCell(corpus: DataFrame, vecCol: String, centroids: Array[Double],
                  nCells: Int): DataFrame =
    corpus.withColumn("cell", nearest_centroid(col(vecCol), centroids, nCells))

  /** IVF ANN top-k: rank cells by centroid similarity to the query, scan
    * the best `nProbe` cells, exact cosine within them. `nProbe = nCells`
    * degenerates to exact brute force (recall 1) — the knob trades scan
    * fraction (~nProbe/nCells) for recall. */
  /** IVF ANN over an int8-quantized corpus — the IVF-SQ8 pattern: the
    * 100 TB embedding store stays quantized on disk (4× smaller scan,
    * [[quantizeEmbeddings]]'s (q_min, q_scale, q_codes) layout); search
    * dequantizes ON THE FLY — a codegen'd map in the same stage as the
    * scan, never materializing a float corpus — and runs the standard
    * IVF path over the restored vectors. Queries stay full-precision.
    * Ranking error is bounded by the quantization error (each restored
    * coordinate is within scale/2 of the original), the standard
    * storage/recall trade; with nProbe = nCells the result is EXACTLY
    * brute force over the dequantized corpus (spec-pinned). */
  def ivfTopKQuantized(quantized: DataFrame, idCol: String, query: Array[Float],
                       k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopK(dequantizeEmbeddings(quantized), idCol, "q_restored", query, k, nCells, nProbe)

  // -------------------------------------------------- PQ tier (IVF-PQ)

  /** Product-quantization codebook: `nCodes` full-dimension rows, a
    * deterministic hash-ordered corpus sample like [[ivfCentroids]] but
    * RAW (not L2-normalized) — PQ codewords approximate raw subvector
    * values, and subspace `s` of every sampled row is subspace `s`'s
    * codeword set. nCodes x dim doubles fit the driver trivially and
    * broadcast as a codegen reference constant. (Sampled codewords are
    * the bootstrap analogue of sampled IVF centroids; k-means refinement
    * would only tighten the same cells.) */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                 nCodes: Int): Array[Double] = {
    val rows = corpus.select(col(vecCol))
      .filter(size(col(vecCol)) > 0)
      .orderBy(xxhash64(col(idCol)))
      .limit(nCodes)
      .collect()
    require(rows.nonEmpty, "cannot build a PQ codebook from an empty corpus")
    val dim = rows.head.getSeq[Float](0).length
    val out = new Array[Double](rows.length * dim)
    rows.zipWithIndex.foreach { case (r, j) =>
      val v = r.getSeq[Float](0)
      var i = 0
      while (i < dim) { out(j * dim + i) = v(i).toDouble; i += 1 }
    }
    out
  }

  /** Encode a corpus against a PQ codebook: `(id, pq_codes)` with
    * `pq_codes` = m bytes/row (see [[graft.functions.PqEncode]]) — the
    * 100 TB scan-path layout: 4*dim bytes -> m bytes (32x at dim=64,
    * m=8), one codegen'd map stage, no shuffle. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebook: Array[Double], nCodes: Int, m: Int): DataFrame =
    df.select(col(idCol), pq_encode(col(vecCol), codebook, nCodes, m).as("pq_codes"))

  /** Driver-side ADC lookup tables for one query: per (subspace, code)
    * partial inner product and codeword norm, plus the flat query norm.
    * All sums are double, ascending coordinate order — the same order
    * the SQL oracle's nested list_sum replays. */
  private[graft] def adcLuts(codebook: Array[Double], nCodes: Int, m: Int,
                             query: Array[Float]): (Array[Double], Array[Double], Double) = {
    val dim = codebook.length / nCodes
    val dsub = dim / m
    val lutIp = new Array[Double](m * nCodes)
    val lutNorm = new Array[Double](m * nCodes)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var j = 0
      while (j < nCodes) {
        var ip = 0.0; var n2 = 0.0; var i = 0; val off = j * dim + base
        while (i < dsub) {
          val c = codebook(off + i)
          ip += query(base + i).toDouble * c; n2 += c * c; i += 1
        }
        lutIp(s * nCodes + j) = ip; lutNorm(s * nCodes + j) = n2
        j += 1
      }
      s += 1
    }
    var qn2 = 0.0; var i = 0
    while (i < query.length) { val q = query(i).toDouble; qn2 += q * q; i += 1 }
    (lutIp, lutNorm, math.sqrt(qn2))
  }

  /** PQ ANN top-k by asymmetric distance: encode (or reuse an encoded
    * store), score every row with m LUT lookups, exact ordering over the
    * approximate scores. The scan touches m bytes + 2m double adds per
    * row — memory-bandwidth-bound at 100 TB, no float corpus ever
    * materialized. `approx cosine = dot(q, x̂)/(|q||x̂|)` over the
    * reconstruction x̂, so quality degrades gracefully with codebook
    * coarseness (spec-pinned: m=1 + corpus-sized codebook == exact). */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String, query: Array[Float],
             k: Int, nCodes: Int = 256, m: Int = 8,
             codebook: Array[Double] = null): DataFrame = {
    val cb = Option(codebook).getOrElse(pqCodebook(corpus, idCol, vecCol, nCodes))
    val nc = cb.length / query.length
    val (lutIp, lutNorm, qNorm) = adcLuts(cb, nc, m, query)
    pqEncode(corpus, idCol, vecCol, cb, nc, m)
      .select(col(idCol), pq_adc_score(col("pq_codes"), lutIp, lutNorm, qNorm, nc, m)
        .as("adc_cosine"))
      .filter(col("adc_cosine").isNotNull)
      .orderBy(col("adc_cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ: the canonical 100 TB ANN layout — coarse IVF cells prune
    * the scan to ~nProbe/nCells of the corpus (directory-level when the
    * store is partitioned by cell), PQ codes make the surviving scan m
    * bytes/row. Codebook and centroids both derive from the FULL corpus
    * (deterministic regardless of which cells are probed), so
    * nProbe = nCells degenerates to exactly [[pqTopK]] (spec-pinned);
    * the IVF side is q57's oracle-pinned machinery unchanged. */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String, query: Array[Float],
                k: Int, nCells: Int = 16, nProbe: Int = 4,
                nCodes: Int = 256, m: Int = 8): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nCells)
    val cb = pqCodebook(corpus, idCol, vecCol, nCodes)
    val dim = query.length
    val kCells = cents.length / dim
    val scored = (0 until kCells).map { j =>
      var dot = 0.0; var i = 0
      while (i < dim) { dot += query(i).toDouble * cents(j * dim + i); i += 1 }
      (j, dot)
    }.sortBy { case (j, dot) => (-dot, j) }
    val probes = scored.take(math.min(nProbe, kCells)).map(_._1)
    pqTopK(withIvfCell(corpus, vecCol, cents, kCells)
      .filter(col("cell").isin(probes: _*)), idCol, vecCol, query, k,
      nCodes, m, codebook = cb)
  }

  /** Materialize the PQ-encoded corpus PARTITIONED BY IVF cell — the
    * full 100 TB ANN layout on disk: rows carry only (id, m-byte codes)
    * under one directory per coarse cell, so a probe reads
    * ~nProbe/nCells of an already-~64x-smaller store with
    * directory-level pruning (PartitionFilters, spec-asserted), and the
    * float corpus is never stored at all. One repartition on `cell`
    * gives one output file set per cell instead of tasks x cells
    * fragments. Centroids + codebook persist alongside in a one-row
    * `meta` table so searches rebuild nothing (and stay deterministic
    * even if the source corpus later changes). */
  def writeIvfPq(corpus: DataFrame, idCol: String, vecCol: String, path: String,
                 nCells: Int = 16, nCodes: Int = 256, m: Int = 8): Unit = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nCells)
    val cb = pqCodebook(corpus, idCol, vecCol, nCodes)
    val dim = cb.length / nCodes
    val kCells = cents.length / dim
    withIvfCell(corpus, vecCol, cents, kCells)
      .select(col(idCol), col("cell"),
        pq_encode(col(vecCol), cb, nCodes, m).as("pq_codes"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((cents.toSeq, cb.toSeq, kCells, nCodes, m))
      .toDF("centroids", "codebook", "n_cells", "n_codes", "m")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** ANN top-k over a [[writeIvfPq]] layout: rank cells on the driver
    * from the persisted centroids, read ONLY the probed cell
    * directories (partition pruning before any file opens), ADC-score
    * the m-byte codes. Identical results to [[ivfPqTopK]] over the
    * source corpus (spec-pinned) — but the scan never touches a float
    * vector. */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                       idCol: String, query: Array[Float], k: Int,
                       nProbe: Int = 4): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val cents = meta.getSeq[Double](0).toArray
    val cb = meta.getSeq[Double](1).toArray
    val kCells = meta.getInt(2); val nCodes = meta.getInt(3); val m = meta.getInt(4)
    val dim = query.length
    require(cents.length == kCells * dim, s"centroid/query dim mismatch")
    val scored = (0 until kCells).map { j =>
      var dot = 0.0; var i = 0
      while (i < dim) { dot += query(i).toDouble * cents(j * dim + i); i += 1 }
      (j, dot)
    }.sortBy { case (j, dot) => (-dot, j) }
    val probes = scored.take(math.min(nProbe, kCells)).map(_._1)
    val (lutIp, lutNorm, qNorm) = adcLuts(cb, nCodes, m, query)
    spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probes: _*))
      .select(col(idCol), pq_adc_score(col("pq_codes"), lutIp, lutNorm, qNorm, nCodes, m)
        .as("adc_cosine"))
      .filter(col("adc_cosine").isNotNull)
      .orderBy(col("adc_cosine").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------- dimensionality reduction (JL)

  /** Deterministic Johnson–Lindenstrauss random projection: compress a
    * `inDim`-float embedding column to `outDim` doubles through a
    * pseudo-random matrix derived ENTIRELY from `salt` —
    * `c(j,i) = ((fnv64("salt:j:i") mod 2001) + 2001 mod 2001 − 1000) / 1000`
    * — so any worker on any cluster materializes the identical matrix
    * with no side-channel (no broadcast of trained state, no file).
    * JL: pairwise distances survive within 1±ε for
    * `outDim = O(log n / ε²)`, which is what makes 4-16× cheaper
    * ANN/dedup pre-filters sound.
    *
    * Bit-exact replay: each output is a LEFT FOLD with 0.0 init over
    * `v_i · c(j,i)` in ascending i — one fixed bracketing, no
    * distributed sum (a row's fold is local), so an engine replaying
    * the same fold order reproduces it bit-for-bit; the oracle
    * re-derives the matrix from the HUGEINT FNV machinery rather than
    * trusting embedded literals.
    *
    * Shape: a pure map stage — zero shuffles, `outDim × inDim`
    * multiply-adds per row inside whole-stage codegen; at 100 TB this
    * is scan-bound. Rows whose vector length ≠ `inDim` project to
    * null (zip_with pads), surfacing bad data instead of mis-dotting. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       outDim: Int, inDim: Int, salt: String = ""): DataFrame = {
    require(outDim > 0 && inDim > 0, s"dims must be positive, got $outDim x $inDim")
    def coef(j: Int, i: Int): Double = {
      val h = graft.functions.Fingerprint64.hash(s"$salt:$j:$i".getBytes("UTF-8"))
      (((h % 2001L) + 2001L) % 2001L - 1000L).toDouble / 1000.0
    }
    val outs = (0 until outDim).map { j =>
      val cs = (0 until inDim).map(i => coef(j, i))
      aggregate(
        zip_with(col(vecCol), typedlit(cs), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x).as(s"r$j")
    }
    df.select(col(idCol) +: outs: _*)
  }

  /** Per-label embedding coherence report — the embedding-space sanity
    * check a labeled corpus needs before anyone trusts the labels or
    * the encoder: for each label, its centroid and the mean cosine of
    * members to that centroid. Collapsed embeddings read as ~1.0
    * everywhere; mislabeled or heterogeneous classes read low; one bad
    * label among good ones is visible at a glance.
    *
    * Exactness discipline (the q137 pattern, twice): centroids come
    * from per-component sums of values quantized to 1/scale units —
    * exact longs, order-free under partial aggregation — divided once;
    * each member's cosine to the centroid is row-LOCAL float math in
    * one fixed op order, quantized to 1/scale, and the per-label mean
    * is again an exact integer sum with one final division. So the
    * whole report replays bit-for-bit in SQL.
    *
    * Shape: one (label, component) exchange of O(labels × dim) partial
    * sums; centroids broadcast back (≤ labels rows); the cosine pass is
    * a pure map over the corpus. Zero-norm vectors and degenerate
    * centroids contribute cosine 0 (guarded identically in the
    * oracle). A member whose vector LENGTH differs from its centroid's
    * is nulled out rather than silently deflating the mean: the report
    * divides by the count of SCORED members and surfaces it as
    * `n_scored` (< `n_vectors` flags dimension rot in the class).
    * Rows with a NULL label are excluded entirely — null is "unlabeled",
    * not a class, and no coherence claim is made about it. */
  def labelCoherence(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
                     scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val comp = df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("j", "v")))
      .groupBy("label", "j")
      .agg(sum(round(col("v").cast("double") * scale).cast("long")).as("su"))
    val cnt = df.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n"))
    val cents = comp.join(cnt, "label")
      .groupBy("label", "n")
      .agg(array_sort(collect_list(struct(col("j"), col("su")))).as("__cs"))
      .select(col("label"), col("n"),
        transform(col("__cs"), x => x.getField("su").cast("double") /
          (col("n") * scale).cast("double")).as("centroid"))
    val joined = df.select(col(vecCol).as("v"), col(labelCol).as("label"))
      .join(broadcast(cents), "label")
    val dot = aggregate(zip_with(col("v"), col("centroid"),
      (x, c) => x.cast("double") * c), lit(0.0), (a, x) => a + x)
    val na = aggregate(transform(col("v"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)
    val nc = aggregate(transform(col("centroid"), x => x * x), lit(0.0), (a, x) => a + x)
    // a vector of the wrong length must NOT fold into the mean (zip_with
    // null-pads, so its "cosine" would be meaningless); null it and let
    // the n_scored divisor make the exclusion visible
    val cosQ = when(size(col("v")) =!= size(col("centroid")), lit(null).cast("long"))
      .otherwise(when(na === 0.0 || nc === 0.0, lit(0L))
        .otherwise(round(dot / (sqrt(na) * sqrt(nc)) * scale).cast("long")))
    joined.select(col("label"), col("n"), cosQ.as("__cq"))
      .groupBy("label", "n")
      .agg(sum(col("__cq")).as("__s"), count(col("__cq")).as("__k"))
      .select(col("label"), col("n").as("n_vectors"), col("__k").as("n_scored"),
        when(col("__k") === 0L, lit(null).cast("double"))
          .otherwise(col("__s").cast("double") / (col("__k") * scale).cast("double"))
          .as("mean_cosine"))
  }

  // --------------------------------------------- hybrid retrieval (RRF)

  /** Lexical top-k for a tokenized query: rank docs by (distinct query
    * tokens present DESC, total query-token occurrences DESC, id ASC) —
    * a deliberately transcendental-free lexical score (BM25's log-idf
    * differs in the last ULP across math libraries and breaks bit-exact
    * oracles; overlap+tf is the same coarse ordering for short queries).
    * Shape: one codegen'd map (the query tokens ride as an array
    * literal) + TakeOrderedAndProject — no shuffle, no inverted index
    * needed for a single query; `lex_rank` is assigned by a window over
    * the k survivors only (k rows, not the corpus). */
  def lexicalTopK(corpus: DataFrame, idCol: String, textCol: String,
                  queryTokens: Seq[String], k: Int): DataFrame = {
    require(queryTokens.nonEmpty, "lexicalTopK needs at least one query token")
    val qlit = typedlit(queryTokens.map(_.toLowerCase).distinct)
    val matched = filter(TextAnalysis.tokens(col(textCol)),
      t => array_contains(qlit, t))
    corpus.select(col(idCol), matched.as("__m"))
      .select(col(idCol),
        size(array_distinct(col("__m"))).cast("long").as("overlap"),
        size(col("__m")).cast("long").as("tf"))
      .filter(col("overlap") > 0)
      .orderBy(col("overlap").desc, col("tf").desc, col(idCol))
      .limit(k)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("overlap").desc, col("tf").desc, col(idCol))).cast("long"))
  }

  /** TRUE BM25 top-k (Robertson/Spärck Jones; the Lucene `+1` idf
    * variant, always positive), made bit-exact across engines by the
    * surprisal-quantization trick (TextAnalysis.unigramSurprisal):
    * [[lexicalTopK]]'s scaladoc rules BM25 out because log-idf differs
    * in the last ulp across math libraries — quantizing fixes that.
    * Every per-(doc, term) contribution is computed as correctly-
    * rounded IEEE ops in one FIXED order, then rounded to an integer
    * micro-unit; per-doc accumulation is an exact integer sum
    * (order-free under partial aggregation), and the final score is
    * one fixed division:
    *
    *   idf_u(t) = round(ln((N − df + 0.5)/(df + 0.5) + 1) · 1e6)
    *   contrib_u = round(idf_u · (tf·(k1+1)) / (tf + k1·(1 − b + b·dl/avgdl)))
    *   bm25 = Σ_t contrib_u / 1e6
    *
    * `k1`/`b` default to 1.25/0.75 — exactly representable binary
    * fractions, so `k1+1`, `1−b` and `b` are literal-identical in any
    * engine (1.2 would smuggle a decimal-rounding divergence into the
    * constant itself). The ln input is a float, but a 1-ulp library
    * disagreement only flips `round` within ~1e-12 of a half-integer,
    * across ≤|query| distinct df values — the q137 argument, pinned by
    * the battery's hash gate.
    *
    * Shape: TWO corpus scans total — one computes dl and the
    * query-token matches (the query rides as an array literal — no
    * inverted index for a single query), one reduces to the (N, Σdl)
    * broadcast row. Everything after the match filter is
    * O(docs-containing-a-query-token): df comes from a count window
    * over the tiny tf-pair set rather than a second aggregate of the
    * same subtree (which would re-scan the corpus — self-referential
    * aggregates defeat exchange reuse), so the three shuffles
    * ((id, token) pre-agg, token window, final per-doc sum) all move
    * pair-sized data. One TakeOrderedAndProject; the corpus never
    * shuffles. */
  /** Shared tokenize/match/df stage of every BM25 scan path: one
    * corpus pass to (id, dl, matched tokens), the (Σdl, N) totals row,
    * and the tf table with df attached by a count window — so the
    * single-query and batch paths cannot drift on tokenization or df
    * any more than they can on scoring ([[bm25ContribU]]). */
  private def bm25TfTable(corpus: DataFrame, idCol: String, textCol: String,
                          tokens0: Seq[String]): (DataFrame, DataFrame) = {
    val qlit = typedlit(tokens0)
    val toks = TextAnalysis.tokens(col(textCol))
    val base = corpus.select(col(idCol).as("id"),
      size(toks).cast("long").as("__dl"),
      filter(toks, t => array_contains(qlit, t)).as("__m"))
    val totals = base.agg(sum(col("__dl")).as("__sumdl"), count(lit(1)).as("__ndocs"))
    val tf = base.select(col("id"), col("__dl"), explode(col("__m")).as("token"))
      .groupBy("id", "__dl", "token").agg(count(lit(1)).as("__tf"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("token"))))
    (tf, totals)
  }

  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               queryTokens: Seq[String], k: Int,
               k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queryTokens.nonEmpty, "bm25TopK needs at least one query token")
    val (tf, totals) =
      bm25TfTable(corpus, idCol, textCol, queryTokens.map(_.toLowerCase).distinct)
    val contribU = bm25ContribU(col("__tf"), col("__dl"), col("__df"),
      col("__ndocs"), col("__sumdl"), k1, b)
    tf.crossJoin(broadcast(totals))
      .select(col("id"), contribU.as("__cu"))
      .groupBy("id").agg(sum(col("__cu")).as("__su"))
      .select(col("id").as(idCol),
        (col("__su").cast("double") / lit(1000000.0)).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** The quantized BM25 per-(doc, term) contribution in integer
    * micro-units — ONE definition shared by [[bm25TopK]] and
    * [[bm25TopKIndexed]], so the scan path and the index path cannot
    * drift by an op-ordering hair. */
  private def bm25ContribU(tf: Column, dl: Column, dfq: Column,
                           ndocs: Column, sumdl: Column,
                           k1: Double, b: Double): Column = {
    val idfU = round(log(
        (ndocs - dfq + lit(0.5)) / (dfq + lit(0.5)) + lit(1)) * lit(1000000)).cast("long")
    val avgdl = sumdl.cast("double") / ndocs.cast("double")
    round(idfU.cast("double") *
      ((tf.cast("double") * lit(k1 + 1)) /
        (tf.cast("double") + lit(k1) * (lit(1 - b) + lit(b) * (dl.cast("double") / avgdl))))
    ).cast("long")
  }

  /** Batch BM25 — top-k for MANY queries in one pass (the lexical
    * sibling of [[knnJoin]]): decontamination triage and targeted-pull
    * workloads score thousands of probe queries against the corpus,
    * and running [[bm25TopK]] per query would re-scan it per query.
    * Here the query set rides as one broadcast (qid, token) table;
    * the corpus is scanned ONCE, matched tokens explode to
    * (qid, doc, term) contributions, and a per-qid window takes each
    * query's top-k. Scoring is [[bm25ContribU]] — identical integer-
    * quantized math to the single-query paths, with df computed over
    * the corpus (a token's df does not depend on which query asked).
    *
    * Shape: one corpus scan + one O(matched-pairs) shuffle for df +
    * one (qid-keyed) rank window over ≤ queries × matched-docs rows.
    * Output: (qid, id, bm25, rank ≤ k). */
  def bm25MultiTopK(corpus: DataFrame, idCol: String, textCol: String,
                    queries: Seq[(Long, String)], k: Int,
                    k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25MultiTopK needs at least one query")
    val allTokens = queries.flatMap(_._2.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .distinct
    val (tf, totals) = bm25TfTable(corpus, idCol, textCol, allTokens)
    val qdf = corpus.sparkSession.createDataFrame(
      queries.flatMap { case (qid, text) =>
        text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.map(t => (qid, t))
      }).toDF("qid", "token")
    val contribU = bm25ContribU(col("__tf"), col("__dl"), col("__df"),
      col("__ndocs"), col("__sumdl"), k1, b)
    tf.join(broadcast(qdf), "token")
      .crossJoin(broadcast(totals))
      .select(col("qid"), col("id"), contribU.as("__cu"))
      .groupBy("qid", "id").agg(sum(col("__cu")).as("__su"))
      .select(col("qid"), col("id").as(idCol),
        (col("__su").cast("double") / lit(1000000.0)).as("bm25"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("bm25").desc, col(s"`$idCol`")))
        .cast("long"))
      .filter(col("rank") <= k)
  }

  /** Persist an INVERTED INDEX for BM25 retrieval: postings
    * `(token, id, tf, dl, df)` hive-partitioned by
    * `part = fnv64(token) mod nParts`, plus a one-row stats table
    * `(sumdl, ndocs, n_parts)`. Postings are denormalized (dl and df
    * ride every row) so a probe needs NO join against a doc table —
    * the static-index trade: df/stats are frozen at build time, like
    * [[writeIvfPq]]'s centroids (rebuild or re-shard to refresh).
    *
    * At 100 TB the index is the difference between "scan the corpus
    * per query" ([[bm25TopK]]) and "read the postings of the query's
    * tokens": partition pruning cuts the scan to ≤|query| of the
    * nParts directories before any row is read (PartitionFilters
    * spec-pinned), and postings volume is corpus-token-frequency
    * bound, not corpus-size bound. */
  def writeLexicalIndex(corpus: DataFrame, idCol: String, textCol: String,
                        path: String, nParts: Int = 64): Unit = {
    require(nParts > 0, s"nParts must be positive, got $nParts")
    val toks = TextAnalysis.tokens(col(textCol))
    val base = corpus.select(col(idCol).as("id"),
      size(toks).cast("long").as("dl"), toks.as("__t"))
    base.select(col("id"), col("dl"), explode(col("__t")).as("token"))
      .groupBy("id", "dl", "token").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .withColumn("part",
        pmod(graft.functions.TextFunctions.fingerprint64(col("token")), lit(nParts.toLong)))
      // align the shuffle with the directory layout: one task owns one
      // part → nParts files, not nParts × shuffle-partitions shards
      .repartition(nParts, col("part"))
      .write.partitionBy("part").mode("overwrite").parquet(s"$path/postings")
    base.agg(sum(col("dl")).as("sumdl"), count(lit(1)).as("ndocs"),
        lit(nParts.toLong).as("n_parts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against a [[writeLexicalIndex]] store: score ONLY the
    * postings of the query's tokens, reached through hive-partition
    * pruning on `part = fnv64(token) mod n_parts` — identical scoring
    * expression to [[bm25TopK]] ([[bm25ContribU]]), so
    * indexed == in-memory exactly (spec-pinned, the q99-vs-q90
    * pattern). Global stats come from the store's one-row table. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                      queryTokens: Seq[String], k: Int,
                      k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(queryTokens.nonEmpty, "bm25TopKIndexed needs at least one query token")
    // the one-row stats table is already on the driver — ride its
    // values as literals instead of a second scan + broadcast exchange
    val statsRow = spark.read.parquet(s"$path/stats").head()
    val nParts = statsRow.getAs[Long]("n_parts")
    val qts = queryTokens.map(_.toLowerCase).distinct
    val parts = qts.map(t => math.floorMod(
      graft.functions.Fingerprint64.hash(t.getBytes("UTF-8")), nParts)).distinct
    val contribU = bm25ContribU(col("tf"), col("dl"), col("df"),
      lit(statsRow.getAs[Long]("ndocs")), lit(statsRow.getAs[Long]("sumdl")), k1, b)
    spark.read.parquet(s"$path/postings")
      .filter(col("part").isin(parts: _*))
      .filter(col("token").isin(qts: _*))
      .select(col("id"), contribU.as("__cu"))
      .groupBy("id").agg(sum(col("__cu")).as("__su"))
      .select(col("id"),
        (col("__su").cast("double") / lit(1000000.0)).as("bm25"))
      .orderBy(col("bm25").desc, col("id"))
      .limit(k)
  }

  /** Hybrid retrieval by reciprocal-rank fusion: the standard way a
    * curation pipeline combines keyword and embedding evidence (triage
    * for decontamination, targeted dedup, topic pulls).
    * `score(d) = Σ_lists 1/(rrfK + rank_list(d))` over the lexical
    * top-nPerList and the vector top-nPerList; docs missing from a list
    * contribute 0 for it. RRF needs only integer ranks and fixed-order
    * double division, so unlike BM25+cosine score mixing it is
    * bit-deterministic and SQL-replayable. The two corpora stay
    * SEPARATE inputs (text store and embedding store never join); the
    * only join is the full-outer fuse of two ≤ nPerList-row lists —
    * at 100 TB both branches are the existing scalable top-k scans and
    * the fusion cost is O(nPerList). */
  def hybridTopK(textCorpus: DataFrame, textIdCol: String, textCol: String,
                 vecCorpus: DataFrame, vecIdCol: String, vecCol: String,
                 queryText: String, queryVec: Array[Float], k: Int,
                 nPerList: Int = 100, rrfK: Int = 60): DataFrame = {
    val qTokens = queryText.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val lex = lexicalTopK(textCorpus, textIdCol, textCol, qTokens, nPerList)
      .select(col(textIdCol).as("id"), col("lex_rank"))
    val vec = bruteForceTopK(vecCorpus, vecIdCol, vecCol, queryVec, nPerList)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col(vecIdCol))).cast("long"))
      .select(col(vecIdCol).as("id"), col("vec_rank"))
    rrfFuse(lex, vec, rrfK, k)
  }

  /** RRF fusion of two ranked id lists (`(id, lex_rank)` ⋈ `(id,
    * vec_rank)`): the shared tail of every hybrid variant. */
  private def rrfFuse(lex: DataFrame, vec: DataFrame, rrfK: Int, k: Int): DataFrame =
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0))).as("rrf_score"),
        col("lex_rank"), col("vec_rank"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)

  /** [[hybridTopK]] with the lexical arm upgraded from overlap+tf to
    * TRUE BM25 ([[bm25TopK]]) — possible since the quantization trick
    * made BM25 bit-deterministic; the RRF fusion is unchanged (and
    * still rank-based, so the two arms' score scales never mix). */
  def hybridBm25TopK(textCorpus: DataFrame, textIdCol: String, textCol: String,
                     vecCorpus: DataFrame, vecIdCol: String, vecCol: String,
                     queryText: String, queryVec: Array[Float], k: Int,
                     nPerList: Int = 100, rrfK: Int = 60,
                     k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val qTokens = queryText.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val lex = bm25TopK(textCorpus, textIdCol, textCol, qTokens, nPerList, k1, b)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col(textIdCol))).cast("long"))
      .select(col(textIdCol).as("id"), col("lex_rank"))
    val vec = bruteForceTopK(vecCorpus, vecIdCol, vecCol, queryVec, nPerList)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col(vecIdCol))).cast("long"))
      .select(col(vecIdCol).as("id"), col("vec_rank"))
    rrfFuse(lex, vec, rrfK, k)
  }

  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String, query: Array[Float],
              k: Int, nCells: Int = 16, nProbe: Int = 4,
              centroids: Array[Double] = null): DataFrame = {
    val cents = Option(centroids).getOrElse(ivfCentroids(corpus, idCol, vecCol, nCells))
    val kCells = cents.length / query.length
    // rank cells for the query on the driver (k x dim dot products)
    val dim = query.length
    val scored = (0 until kCells).map { j =>
      var dot = 0.0; var i = 0
      while (i < dim) { dot += query(i).toDouble * cents(j * dim + i); i += 1 }
      (j, dot)
    }.sortBy { case (j, dot) => (-dot, j) }
    val probes = scored.take(math.min(nProbe, kCells)).map(_._1)
    val cells = withIvfCell(corpus, vecCol, cents, kCells)
    bruteForceTopK(cells.filter(col("cell").isin(probes: _*)), idCol, vecCol, query, k)
  }

  // -------------------------------------------------- k-means tier

  /** Spherical Lloyd k-means centroids (MacQueen 1967 / Lloyd 1982,
    * cosine variant): init = the deterministic hash-ordered sample
    * ([[ivfCentroids]], L2-normalized), then `iters` rounds of
    * assign-to-max-dot / recompute-mean / renormalize. Requires corpus
    * size >= k (the init sample must fill all k cells).
    *
    * Per round the whole distributed work is ONE declarative job:
    * scan -> codegen'd `nearest_centroid` -> posexplode to (cell, pos,
    * x) -> partial-aggregated groupBy(cell, pos) -> k x dim tiny rows
    * to the driver. The exchange carries O(partitions x k x dim)
    * partial-sum rows (map-side combine), never the corpus; centroids
    * live on the driver (k x dim doubles) and ride into the next
    * round's scan as a codegen constant — the treeAggregate shape of
    * MLlib's KMeans, expressed declaratively. At 100 TB each round is
    * one corpus scan; `iters` stays small (SemDeDup uses a handful).
    *
    * DETERMINISM (the property the oracle checks): component sums are
    * accumulated as DECIMAL(38,12) — exact, ORDER-INDEPENDENT addition,
    * so the result is identical under any partitioning (a plain double
    * sum would drift by ULPs with partition order and could flip later
    * assignments). Mean = cast(sum as double)/n, normalization and dot
    * products are fixed-order double arithmetic — bit-equal replayable
    * in SQL. Empty cells keep their previous centroid. */
  def kMeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 2): Array[Double] = {
    import org.apache.spark.sql.types.DecimalType
    val (seed, nSeed) = ivfCentroidRows(corpus, idCol, vecCol, k)
    require(nSeed == k,
      s"corpus must have >= $k non-empty vectors to seed $k cells, got $nSeed")
    var cents = seed
    val dim = cents.length / k
    for (_ <- 1 to iters) {
      val stats = corpus
        .filter(size(col(vecCol)) > 0)
        .select(nearest_centroid(col(vecCol), cents, k).as("cell"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(col("x").cast("double").cast(DecimalType(38, 12))).as("s"),
          count(lit(1)).as("n"))
        .select(col("cell"), col("pos"),
          (col("s").cast("double") / col("n")).as("mu"))
        .collect()
      val next = cents.clone() // empty cells keep their previous centroid
      val means = Array.fill[Array[Double]](k)(null)
      stats.foreach { r =>
        val cell = r.getInt(0)
        if (means(cell) == null) means(cell) = new Array[Double](dim)
        means(cell)(r.getInt(1)) = r.getDouble(2)
      }
      var j = 0
      while (j < k) {
        val m = means(j)
        if (m != null) {
          var nrm = 0.0; var i = 0
          while (i < dim) { nrm += m(i) * m(i); i += 1 }
          val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
          i = 0
          while (i < dim) { next(j * dim + i) = m(i) * inv; i += 1 }
        }
        j += 1
      }
      cents = next
    }
    cents
  }

  /** Corpus annotated with its Lloyd-refined cluster (`cell` column):
    * [[kMeansCentroids]] then one codegen'd assignment pass. */
  def kMeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int = 2): DataFrame =
    withIvfCell(corpus.filter(size(col(vecCol)) > 0), vecCol,
      kMeansCentroids(corpus, idCol, vecCol, k, iters), k)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = k-means-cluster the embedding space, find
    * cosine-near-duplicate pairs WITHIN each cluster only, and keep one
    * representative per duplicate group. Returns the kept rows with
    * their `cell`.
    *
    * Spark shape: clusters from [[kMeansAssign]] (centroids are a
    * broadcast codegen constant); pairing is CELL-LOCAL — the slim
    * (id, vec, cell) projection shuffles ONCE on `cell` and pairs by a
    * self-equi-join on `cell` with `id_a < id_b`, which Catalyst plans
    * as one Exchange + ReusedExchange (both join inputs canonicalize to
    * the same slim scan), so the corpus's vector bytes cross the wire
    * exactly once (r8 paid two extra id-keyed vector joins here).
    * Oversized cells (> `maxCellSize`, the boilerplate blocking guard;
    * pick k so cells stay ~corpus/k) and singleton cells are excluded
    * by a broadcast O(k)-row cell-size filter before the join, so the
    * quadratic work per cell is hard-capped. Exact cosine on the
    * cell-local pairs only; duplicate groups closed by
    * [[Dedup.connectedComponents]] (O(log n) rounds, ids only);
    * representative = min id per group (deterministic, so the whole
    * pipeline is SQL-replayable). The final drop is a broadcast-sized
    * anti join, the q80 pattern. At 100 TB pick k so corpus/k fits
    * comfortably under maxCellSize: the published algorithm's cost IS
    * the within-cluster pairing. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int = 2, threshold: Double = 0.95,
                    maxCellSize: Int = 100000): DataFrame = {
    val cells = kMeansAssign(corpus, idCol, vecCol, k, iters)
    val slim = cells.select(col(idCol).as("id"), col(vecCol).as("vec"), col("cell"))
    val pairs = semanticPairs(slim, threshold, maxCellSize)
    val dropped = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    cells.join(dropped, Seq(idCol), "left_anti")
  }

  /** Cell-local near-duplicate pairing over a slim (id, vec, cell)
    * projection — the SemDeDup candidate stage, exposed for plan
    * receipts. One `cell`-keyed shuffle of the vector bytes (self-join
    * both sides canonicalize to the same scan → Exchange +
    * ReusedExchange); ids never key an exchange that carries vectors. */
  private[graft] def semanticPairs(slim: DataFrame, threshold: Double,
                                   maxCellSize: Int): DataFrame = {
    // O(k) rows — broadcast both ways; [2, cap] mirrors blockPairs' guard
    val okCells = slim.groupBy("cell").agg(count(lit(1)).as("__csz"))
      .filter(col("__csz").between(2, maxCellSize)).select("cell")
    val paired = slim.join(broadcast(okCells), "cell")
    paired.select(col("cell"), col("id").as("id_a"), col("vec").as("vec_a"))
      .join(paired.select(col("cell"), col("id").as("id_b"), col("vec").as("vec_b")), "cell")
      .filter(col("id_a") < col("id_b"))
      .filter(cosine_sim(col("vec_a"), col("vec_b")) >= threshold)
      .select("id_a", "id_b")
  }
}
