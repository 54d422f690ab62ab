package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an equi key — "every event
  * inside every campaign window", "every reading during every outage".
  *
  * The reference passes range-predicate joins straight through to its
  * backing engine (`/root/reference/pkg/api/data.go:29-56` →
  * `duckdb/query.go`), whose optimizers have dedicated inequality-join
  * machinery (DuckDB's IEJoin). Spark has no range-join strategy: a
  * pure `ON p.t BETWEEN i.lo AND i.hi` plans as
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|points| ×
  * |intervals|) comparisons, a scale-killer the moment neither side is
  * tiny. This operator rewrites the range join as an EQUI join on a
  * time bin, the standard bucketing trick behind Databricks' range-join
  * hints and Flink's interval join:
  *
  *  - every point belongs to exactly ONE bin: `floor(t / W)`;
  *  - every interval is replicated to each bin it overlaps
  *    (`sequence(floor(lo/W), floor((hi-1)/W))` + explode —
  *    `len/W + 1` copies);
  *  - the equi-join on the bin runs as a shuffled sort-merge/hash join
  *    (hash-partitioned both sides — distributed, AQE-skew-splittable);
  *  - a residual `lo <= t < hi` filter keeps the exact pairs.
  *
  * Because the point's bin is UNIQUE, each qualifying (point, interval)
  * pair meets in exactly one bin — no duplicate pairs, no dedup pass.
  * Cost: shuffle of |points| + Σ(len_i/W + 1) rows, and per-bin
  * comparisons only. Pick `binWidthUs` ≈ the typical interval length:
  * wider bins shrink interval replication but grow per-bin probe work;
  * narrower bins do the reverse. At 100 TB the win is structural — work
  * is proportional to genuinely-overlapping (bin-local) row pairs
  * instead of the full cross product, and the bin key spreads uniformly
  * over time, so the shuffle partitions evenly.
  *
  * Inner-join semantics: rows with a null time / null bound never
  * match, exactly like the theta join they replace (null comparisons
  * are never true). Empty intervals (`hi <= lo`) produce no bins and
  * no pairs.
  */
object RangeJoin {

  /** Join `points` to `intervals` where
    * `intervals(startCol) <= points(pointTime) < intervals(endCol)`
    * (end-EXCLUSIVE, the half-open convention every windowing op in
    * this codebase uses). Timestamp columns on both sides; all other
    * column names must be disjoint across the two inputs.
    *
    * @param binWidthUs bin width in microseconds (e.g. 30 min =
    *                   `30L * 60 * 1000000`); must be positive.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTime: String, startCol: String, endCol: String,
                      binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0, s"binWidthUs must be positive, got $binWidthUs")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "column name __bin is reserved by pointInInterval")
    val w = lit(binWidthUs)
    val pt = col(s"`$pointTime`")
    val lo = col(s"`$startCol`")
    val hi = col(s"`$endCol`")
    // floor-division bins over epoch micros. The division runs in
    // DOUBLE, exact here: epoch micros through year 2255 stay below
    // 2^53, so the operands (and the floored quotient) are all exactly
    // representable. (hi - 1µs) keeps an interval that ENDS exactly on
    // a bin edge out of the next bin.
    def bin(c: org.apache.spark.sql.Column) = floor(c / w).cast("long")
    val p = points.withColumn("__bin", bin(unix_micros(pt)))
    val i = intervals
      .filter(hi > lo && lo.isNotNull && hi.isNotNull)
      .withColumn("__bin",
        explode(sequence(bin(unix_micros(lo)),
                         bin(unix_micros(hi) - lit(1L)))))
    p.join(i, Seq("__bin"))
      .filter(pt >= lo && pt < hi)
      .drop("__bin")
  }
}
