package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stats-driven join planning — the piece that makes `TableStats`
  * actionable. Spark's own broadcast decision runs on Catalyst's
  * `sizeInBytes` estimate, which degrades to file size at the leaves
  * and to conservative guesses above aggregates and filters; a 100-row
  * aggregate of a 1 TB table is "1 TB" to the planner and never
  * broadcasts. ANALYZE stats carry the POST-transform truth (row
  * count, key NDV), so joins over derived inputs can still pick the
  * cheap physical strategy. The reference leans on its backends'
  * cost models the same way (DuckDB/ClickHouse plan from their own
  * catalog stats; `/root/reference/pkg/destinations/duckdb/query.go`
  * passes SQL straight to them).
  *
  * Strategy ladder, decided from stats alone (deterministic,
  * plan-pinned in StatsJoinSpec):
  *
  *  1. one side's estimated bytes (`nRows × avgRowBytes`) fit under
  *     `maxBroadcastBytes` → broadcast THAT side: no shuffle at all on
  *     the big side;
  *  2. both too big, and the probe side averages more than
  *     `maxRowsPerKey` rows per key (`nRows / ndvKey` — low-NDV keys)
  *     → salted shuffle join: the hot keys are spread over
  *     `ceil(rowsPerKey / maxRowsPerKey)` buckets (capped at 64) so no
  *     single task serializes a key;
  *  3. otherwise → plain shuffled equi join (sort-merge; AQE still
  *     splits residual partition-level skew at runtime).
  *
  * The result set is IDENTICAL across all three branches — the ladder
  * only moves the physical shape — which is what lets one DuckDB
  * oracle hash-check whatever branch the stats select.
  */
object StatsJoin {

  /** Per-side stats a join decision needs; build from an ANALYZE
    * catalog via [[fromAnalyze]] or supply directly. */
  final case class SideStats(nRows: Long, ndvKey: Long, avgRowBytes: Long) {
    def bytes: Long = nRows * avgRowBytes
    def rowsPerKey: Double = if (ndvKey <= 0) nRows.toDouble else nRows.toDouble / ndvKey
  }

  /** Read (n_rows, ndv of `keyCol`) out of a `TableStats.analyze`
    * catalog frame. `avgRowBytes` stays caller-supplied: ANALYZE
    * catalogs carry value bounds, not physical widths — pass a
    * measured or schema-derived estimate. */
  def fromAnalyze(stats: DataFrame, keyCol: String, avgRowBytes: Long): SideStats = {
    val row = stats.filter(col("col_name") === keyCol)
      .select("n_rows", "ndv").head()
    SideStats(row.getLong(0), row.getLong(1), avgRowBytes)
  }

  /** The strategy the ladder picks — exposed so specs (and curious
    * callers) can pin the decision without parsing plans. */
  def chooseStrategy(left: SideStats, right: SideStats,
                     maxBroadcastBytes: Long, maxRowsPerKey: Long): String =
    if (right.bytes <= maxBroadcastBytes || left.bytes <= maxBroadcastBytes) {
      if (right.bytes <= left.bytes) "broadcast_right" else "broadcast_left"
    } else if (math.max(left.rowsPerKey, right.rowsPerKey) > maxRowsPerKey) "salted"
    else "shuffle"

  /** Inner equi join with the physical strategy chosen from stats.
    * `saltFrom` is the high-cardinality left column the salted branch
    * derives its deterministic salt from (see [[SkewJoin.saltedJoin]]);
    * required only when that branch can trigger. */
  def autoJoin(left: DataFrame, leftStats: SideStats,
               right: DataFrame, rightStats: SideStats,
               keys: Seq[String],
               maxBroadcastBytes: Long = 64L << 20,
               maxRowsPerKey: Long = 1L << 20,
               saltFrom: Option[String] = None): DataFrame =
    chooseStrategy(leftStats, rightStats, maxBroadcastBytes, maxRowsPerKey) match {
      case "broadcast_right" => left.join(broadcast(right), keys)
      case "broadcast_left"  => broadcast(left).join(right, keys)
      case "salted" =>
        val from = saltFrom.getOrElse(throw new IllegalArgumentException(
          "stats select the salted branch; autoJoin needs saltFrom"))
        val perKey = math.max(leftStats.rowsPerKey, rightStats.rowsPerKey)
        val buckets = math.min(64L, math.ceil(perKey / maxRowsPerKey).toLong).toInt
        // salt the LEFT, replicate the right `buckets`x — callers put
        // the probe/fact side on the left
        SkewJoin.saltedJoin(left, right, keys, from, math.max(buckets, 2))
      case _ => left.join(right, keys)
    }
}
