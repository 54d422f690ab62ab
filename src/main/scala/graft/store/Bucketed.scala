package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (hash-clustered) tables — the CO-LOCATED join layout.
  *
  * A shuffle join moves BOTH sides over the network every time it
  * runs. For a join that recurs (fact x dim refresh, daily enrichment,
  * the reference's per-tenant query patterns), pre-hashing both tables
  * into the same number of buckets on the join key makes every future
  * join a zero-exchange merge: Spark maps bucket i of one table to
  * bucket i of the other and, with `sortBy` on the key, skips the sort
  * too. At 100 TB this converts the recurring join's network cost from
  * O(|fact| + |dim|) per run to ZERO (paid once at write).
  *
  * Spark's bucketing metadata lives in the session catalog, so tables
  * are written with `saveAsTable` against an EXPLICIT external path
  * (no hidden warehouse state; re-registering after a session restart
  * is one `createTable` against the same path). The writer
  * repartitions by the bucket key first so each bucket is one file —
  * otherwise every write task emits a file per bucket and small files
  * multiply. */
object Bucketed {

  /** Write `df` as a bucketed+sorted external table named `table` at
    * `path`. Both sides of a future join must use the SAME
    * `numBuckets` and key columns. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCols: Seq[String], numBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    df.repartition(numBuckets, bucketCols.map(c => col(s"`$c`")): _*)
      .write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back through the session catalog (the
    * catalog entry carries the bucketing spec — a plain
    * `spark.read.parquet(path)` would read the same rows but lose the
    * co-location guarantee). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
