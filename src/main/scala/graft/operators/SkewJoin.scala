package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE's
  * skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in the server session) cannot help: AQE splits oversized
  * PARTITIONS, but a single hot KEY still lands every row in one task.
  *
  * Shape: the skewed (large, "fact") side gets a deterministic salt in
  * [0, buckets) derived from a uniformly-distributed payload column; the
  * small ("dim"-ish but too big to broadcast) side is replicated
  * `buckets` times. The join key becomes (key, salt) — a hot key now
  * spreads over `buckets` tasks. Replication cost is |right| x buckets,
  * so pick buckets ~ (hottest key rows / target rows per task).
  *
  * When the right side DOES fit in memory, prefer `broadcast(right)` —
  * salting is for the mid-size right side where broadcast would OOM and
  * one hot left key would otherwise serialize the whole stage.
  */
object SkewJoin {

  /** @param saltFrom left column with high cardinality (e.g. a row id);
    *                 the salt is `pmod(hash(saltFrom), buckets)`, so it
    *                 is deterministic (reproducible runs, no rand()). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFrom: String, buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // right/full would emit buckets-1 spurious unmatched copies of every
    // right row (it is replicated); only left-preserving joins are sound
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replaceAll("_", "")),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    val l = left.withColumn("__salt", pmod(hash(col(s"`$saltFrom`")), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Hot-key report — the sizing input for [[saltedJoin]]'s `buckets`
    * and the first diagnostic to run when one reducer runs forever:
    * the `k` heaviest keys with row count, share of total, and skew
    * ratio (count / mean-per-key; 1.0 = perfectly uniform).
    *
    * Scale shape: one partial-aggregated shuffle down to O(distinct
    * keys); totals come from re-aggregating the COUNTS (O(distinct)
    * rows, broadcast back as a single row), and the top-k is a
    * TakeOrderedAndProject — per-partition heaps, never a full sort.
    * Ties break by key for a deterministic report. */
  def hotKeys(df: DataFrame, keys: Seq[String], k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyCols = keys.map(c => col(s"`$c`"))
    val counts = df.groupBy(keyCols: _*).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__total"), count(lit(1)).as("__nk"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", col("n").cast("double") / col("__total").cast("double"))
      .withColumn("skew", // double-first: n * nk in long arithmetic
        // overflows exactly for the giant tables this diagnostic targets
        col("n").cast("double") * col("__nk").cast("double") /
          col("__total").cast("double"))
      .drop("__total", "__nk")
      .orderBy(col("n").desc +: keyCols: _*)
      .limit(k)
  }
}
