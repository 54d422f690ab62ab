package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Data-layout maintenance: clustering a table on its query keys.
  *
  * The reference's ClickHouse backing tables are MergeTree parts
  * clustered on a primary key (reference
  * `pkg/destinations/clickhouse/destination.go:16` — `ENGINE =
  * MergeTree PRIMARY KEY(__row_id)`), so key-range predicates touch a
  * contiguous slice of each part. The Spark-native
  * equivalent is a sorted-file layout: parquet footers carry per-file
  * and per-row-group min/max for every column, and both Spark's file
  * pruning and the parquet reader's row-group filter use them — but
  * they only BITE when the data is clustered so ranges are narrow and
  * disjoint. A table appended out of order has every file spanning the
  * full key range and statistics prune nothing.
  */
object Layout {

  /** Rewrite `df` clustered on `sortCols`: global range partitioning
    * (so FILES have disjoint key ranges — file-level pruning) and an
    * intra-partition sort (so ROW GROUPS within a file have tight
    * ranges — row-group-level pruning), then a parquet write.
    *
    * One range-exchange of the data is the entire cost; at 100 TB run
    * it per-partition-of-the-table (e.g. per ingest day) rather than
    * globally, exactly like a ClickHouse merge. `numFiles` sizes the
    * output files: pick `tableBytes / ~512 MB`. Range boundaries come
    * from Spark's reservoir sample over the input (seeded by partition
    * index — deterministic for a given input layout); correctness
    * never depends on the boundaries, only pruning quality does.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                       numFiles: Int): Unit = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Read back a clustered table. Plain parquet scan — the point of the
    * layout is that NO special reader is needed: pushed filters on the
    * sort key prune files/row groups via the footer stats. */
  def readSorted(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
