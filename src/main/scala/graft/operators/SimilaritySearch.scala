package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
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

  /** Embedding dim of the first non-empty vector (one LocalLimit job). */
  def dimOf(df: DataFrame, vecCol: String): Int = {
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
    * probed-candidate pool is ~8k vectors (probing 1+p buckets of
    * n/2^p). Too many planes on a small corpus scatters everything into
    * empty buckets (recall collapse); too few on a big one stops
    * pruning. Clamped to [1, 24]. */
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
    * neighbors (multi-probe), then exact cosine within the probed set.
    * `nPlanes = 0` (default) sizes the plane count from the corpus
    * ([[autoPlanes]]) — a tiny corpus degrades gracefully toward exact
    * scan instead of scattering into thousands of empty buckets. */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, nPlanes: Int = 0, seed: Long = 42L): DataFrame = {
    val p = if (nPlanes > 0) nPlanes else autoPlanes(corpus.count(), k)
    val planes = makePlanes(p, query.length, seed)
    val qBucket = bucketOf(query, planes, p)
    val probes = qBucket +: (0 until p).map(b => qBucket ^ (1 << b))
    val bucketed = corpus.withColumn("bucket",
      lsh_bucket(col(vecCol), planes, p))
    bruteForceTopK(bucketed.filter(col("bucket").isin(probes: _*)), idCol, vecCol, query, k)
  }

  /** k-NN join: top-k corpus neighbors for EVERY query row. Bucket-equi
    * join + per-query window rank — the scalable shape (bucket join
    * instead of cross join). Exact variant (crossJoin) for validation.
    * `nPlanes = 0` auto-sizes like [[annTopK]]. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, exact: Boolean = false, nPlanes: Int = 0): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val paired =
      if (exact) q.crossJoin(c)
      else {
        val p = if (nPlanes > 0) nPlanes else autoPlanes(corpus.count(), k)
        val planes = makePlanes(p, dimOf(corpus, vecCol), 42L)
        q.withColumn("bucket", lsh_bucket(col("query_vec"), planes, p))
          .join(c.withColumn("bucket", lsh_bucket(col("neighbor_vec"), planes, p)), "bucket")
          .drop("bucket")
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

  /** Embedding near-duplicate pairs: bucket join + cosine >= threshold.
    * (Embedding-cosine near-dup detection for dedup pipelines.) */
  def embeddingDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, nPlanes: Int = 10): DataFrame = {
    val planes = makePlanes(nPlanes, dimOf(corpus, vecCol), 42L)
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", lsh_bucket(col("vec"), planes, nPlanes))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine_sim(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }

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
                   nCells: Int): Array[Double] = {
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
    out
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
}
