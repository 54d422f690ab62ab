package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Multi-dimension clustering via a Z-order (Morton) curve — the
    * layout for tables queried by MORE than one key (tenant + time,
    * user + day). A 1-D sort makes the second key span the FULL range
    * in every file (its stats prune nothing); Z-ordering interleaves
    * the bits of per-dimension quantile ranks so every file covers a
    * small hyper-rectangle and footer stats prune on EVERY clustered
    * column. Same idea as Delta/Iceberg `OPTIMIZE ZORDER BY`.
    *
    * Mechanics: each column is rank-bucketed into `2^bitsPerDim`
    * quantile buckets (boundaries from `approxQuantile` — a driver-side
    * array of `2^bitsPerDim` doubles, sketch-based, one pass); the
    * bucket ids' bits are interleaved into the z-value; then the same
    * range-partition + intra-sort + write as [[writeRangeSorted]].
    * Quantile (not min/max-uniform) bucketing keeps cells equal-MASS,
    * so skewed columns still spread across files. Columns must be
    * numeric or timestamp (cast to double for ranking only — stored
    * values are untouched). Cost: one quantile-sketch pass + one
    * range exchange, identical asymptotics to the 1-D rewrite. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    numFiles: Int, bitsPerDim: Int = 8): Unit = {
    require(zCols.size >= 2, "use writeRangeSorted for a single column")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(bitsPerDim >= 1 && bitsPerDim * zCols.size <= 60,
      s"bitsPerDim * dims must fit a long, got $bitsPerDim * ${zCols.size}")
    val nBuckets = 1 << bitsPerDim
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val asDouble = zCols.map(c => col(c).cast("double").as(s"__zd_$c"))
    val forQuantiles = df.select(asDouble: _*)
    // ONE multi-column sketch pass for every dimension's boundaries —
    // the per-column overload would re-execute the input lineage per dim
    val allBnds = forQuantiles.stat.approxQuantile(
      zCols.map(c => s"__zd_$c").toArray, probes, 0.001)
    val ranks: Seq[org.apache.spark.sql.Column] = zCols.zip(allBnds).map { case (c, raw) =>
      val bnds = raw.distinct.sorted // ties in skewed data collapse to fewer cuts
      // native codegen'd binary search (QuantileRank) — the HOF forms
      // (filter/aggregate over a literal array) are CodegenFallback
      // with one interpreted dispatch per boundary per row, ~100x more
      // per-row work at 256 boundaries. Null values rank 0 (coalesce):
      // a null in one dimension must not null the whole z-value — the
      // row still clusters by its OTHER dimensions' bits instead of
      // collapsing every partially-null row into one range partition
      coalesce(graft.functions.QuantileRank.quantile_rank(col(c).cast("double"), bnds),
        lit(0L))
    }
    // ranks are MATERIALIZED as columns before interleaving: the Morton
    // fold references each rank once per bit, and an inlined rank
    // expression would re-run per reference
    val withRanks = ranks.zipWithIndex.foldLeft(df) { case (acc, (r, i)) =>
      acc.withColumn(s"__zrank_$i", r)
    }
    // Morton interleave: bit i of dim d lands at position i*D + d
    val d = zCols.size
    val z = (0 until bitsPerDim).foldLeft(lit(0L)) { (accBit, i) =>
      (0 until d).foldLeft(accBit) { (acc, dim) =>
        acc + shiftleft(shiftright(col(s"__zrank_$dim"), i).bitwiseAND(lit(1L)), i * d + dim)
          .cast("long")
      }
    }
    withRanks.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((zCols.indices.map(i => s"__zrank_$i") :+ "__z"): _*)
      .write.mode("overwrite").parquet(path)
  }
}
