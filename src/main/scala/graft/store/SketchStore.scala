package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable-sketch store — the Spark-native analogue of
  * ClickHouse's AggregatingMergeTree with `uniqState`/`uniqMerge`
  * (the reference's ClickHouse destination can hold such aggregate
  * states; here the state is a DataSketches HLL, which Spark 4 reads,
  * merges and estimates natively via `hll_*` functions).
  *
  * The pattern it unlocks at 100 TB: distinct-count dashboards that
  * never re-scan history. Each ingest batch (a day, an hour) reduces
  * to one HLL sketch per group — a few KB regardless of row count —
  * appended to the store. Any later query unions the relevant
  * sketches: cost is O(groups x partitions-touched), not O(events).
  * HLL union is exact over sketch state (no further error stacking:
  * the union of per-part sketches equals the sketch of the union),
  * so incremental maintenance is lossless vs a from-scratch rebuild —
  * spec-pinned in LayoutSpec's sibling SketchStoreSpec.
  */
object SketchStore {

  /** Reduce `df` to one HLL sketch per (`partExpr`, `groupCols`) cell
    * counting distinct `valueCol`, appended to the store partitioned
    * by part. `partExpr` is the incremental unit — `lit("2024-01-07")`
    * when loading one batch, or a derived column like
    * `date_format(col("ts"), "yyyy-MM-dd")` when backfilling many at
    * once. Appends are IDEMPOTENT at read time: HLL union is a
    * register-wise max, so re-appending the same sketch cannot move
    * any estimate. `lgK` is the DataSketches log2(K) accuracy knob
    * (12 ≈ 1.6% rsd, a few KB per sketch). */
  def writeDistinctSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                            path: String, partExpr: org.apache.spark.sql.Column,
                            lgK: Int = 12): Unit = {
    df.withColumn("part", partExpr)
      .groupBy((col("part") +: groupCols.map(c => col(s"`$c`"))): _*)
      .agg(hll_sketch_agg(col(s"`$valueCol`"), lit(lgK)).as("sketch"))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** Merge the stored sketches back to one estimate per group,
    * optionally restricted to some `parts` (a literal partition filter
    * — directory pruning, untouched parts are never read). */
  def estimateDistinct(spark: SparkSession, path: String, groupCols: Seq[String],
                       parts: Seq[String] = Nil): DataFrame = {
    val all = spark.read.parquet(path)
    val scoped = if (parts.isEmpty) all
                 else all.filter(col("part").isin(parts.map(x => x: Any): _*))
    scoped.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_distinct"))
  }

  /** Theta sibling of [[writeDistinctSketches]] — same incremental
    * contract (per-part per-group sketches, append-only, union
    * idempotent: a theta sketch is a hash SAMPLE plus a theta, so
    * re-unioning the same sketch moves nothing), but the stored state
    * supports SET OPERATIONS at read: intersection and difference
    * between groups ([[estimateOverlap]]) — "users who did A and B
    * this week" off a few KB of state, which the HLL store cannot
    * answer. Exact below 2^lgK distinct per sketch (battery-pinned),
    * ~1/sqrt(2^lgK) relative error past it, intersections degrading
    * with overlap sparsity (documented at
    * [[graft.functions.ThetaSetEstimate]]). */
  def writeThetaSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                         path: String, partExpr: org.apache.spark.sql.Column,
                         lgK: Int = 12): Unit = {
    df.withColumn("part", partExpr)
      .groupBy((col("part") +: groupCols.map(c => col(s"`$c`"))): _*)
      .agg(graft.functions.AggFunctions.theta_sketch(col(s"`$valueCol`"), lgK)
        .as("sketch"))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** One merged theta sketch per group (optionally part-pruned) — the
    * read-side union feeding [[estimateOverlap]] or a caller's own
    * set arithmetic. */
  def readThetaSketches(spark: SparkSession, path: String, groupCols: Seq[String],
                        parts: Seq[String] = Nil, lgK: Int = 12): DataFrame = {
    val all = spark.read.parquet(path)
    val scoped = if (parts.isEmpty) all
                 else all.filter(col("part").isin(parts.map(x => x: Any): _*))
    scoped.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(graft.functions.AggFunctions.theta_union(col("sketch"), lgK).as("sketch"))
  }

  /** Audience-overlap report between two values of `groupCol` off the
    * store: EXACTLY one row of |A|, |B|, |A ∩ B|, |A \ B|, |A ∪ B|
    * estimates — a segment with no sketch rows in the probed parts
    * contributes an EMPTY sketch (estimates 0), so an empty audience is
    * distinguishable from "the report returned nothing" (a typo'd
    * segment or wrong part filter yields a zeros row, never zero rows,
    * matching the Analytics audience_overlap compute path). Cost: the
    * two groups' sketch rows in the probed parts — never the events
    * that built them. */
  def estimateOverlap(spark: SparkSession, path: String, groupCol: String,
                      a: String, b: String, parts: Seq[String] = Nil,
                      lgK: Int = 12): DataFrame = {
    import graft.functions.{AggFunctions, ThetaEstimate, ThetaSetEstimate}
    val merged = readThetaSketches(spark, path, Seq(groupCol), parts, lgK)
    val empty: Array[Byte] = org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion().getResult.toByteArray
    import spark.implicits._
    val emptyRow = Seq(empty).toDF("sketch")
    // each side: the group's (single) merged sketch unioned with a
    // literal empty sketch, re-aggregated to exactly one row
    def side(v: String, as: String) =
      merged.filter(col(s"`$groupCol`") === v).select(col("sketch"))
        .union(emptyRow)
        .agg(AggFunctions.theta_union(col("sketch"), lgK).as(as))
    val sa = side(a, "sa")
    val sb = side(b, "sb")
    sa.crossJoin(sb).select(
      ThetaEstimate.theta_estimate(col("sa")).as("n_a"),
      ThetaEstimate.theta_estimate(col("sb")).as("n_b"),
      ThetaSetEstimate.theta_intersect(col("sa"), col("sb")).as("n_both"),
      ThetaSetEstimate.theta_a_not_b(col("sa"), col("sb")).as("n_a_only"),
      ThetaSetEstimate.theta_union_est(col("sa"), col("sb")).as("n_union"))
  }
}
