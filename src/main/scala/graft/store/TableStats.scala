package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style per-column table statistics — row count, null count,
  * distinct count, min/max — the inputs every cost-based decision at
  * 100 TB runs on (broadcast-vs-shuffle thresholds, salting bucket
  * counts, layout sort-key choice, mixture planning). The reference's
  * backends keep these in engine catalogs (ClickHouse part minmax
  * indexes, BigQuery table metadata); Spark-side they come from one
  * aggregation pass, persistable as a tiny stats table next to the
  * data.
  *
  * Shape: ONE wide aggregate over the table — Catalyst plans the
  * multiple `count(DISTINCT)`s via a single Expand + two-phase
  * aggregate, so the input is still scanned once; the exchange carries
  * O(expand-factor x distinct values) grouped rows, never raw rows
  * twice. `approxNdv = true` swaps exact distinct counts for
  * `approx_count_distinct` (HLL++) — the 100 TB default, one ordinary
  * partial-aggregated pass with sketch-sized exchange rows; exact is
  * the oracle-checkable battery mode.
  *
  * min/max are rendered as strings so every column fits one uniform
  * (col_name, n_rows, n_nulls, ndv, min_str, max_str) row — the output
  * is a CATALOG row, not a typed value (callers needing typed bounds
  * query the column directly). */
object TableStats {

  def analyze(df: DataFrame, cols: Seq[String], approxNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "analyze needs at least one column")
    // ONE shared row count — a per-column count(1) would carry
    // cols.size identical aggregate buffers through the exchange
    val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      val qc = col(s"`$c`")
      Seq(
        count(when(qc.isNull, 1)).as(s"__nulls_$c"),
        (if (approxNdv) approx_count_distinct(qc) else countDistinct(qc)).as(s"__ndv_$c"),
        min(qc).cast("string").as(s"__min_$c"),
        max(qc).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row into one catalog row per column
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n_rows").cast("long").as("n_rows"),
        col(s"`__nulls_$c`").cast("long").as("n_nulls"),
        col(s"`__ndv_$c`").cast("long").as("ndv"),
        col(s"`__min_$c`").as("min_str"),
        col(s"`__max_$c`").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("s")).select("s.*")
  }
}
