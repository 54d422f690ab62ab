package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the reference's events surface
  * (ScratchDB's headline use case is exactly this kind of product
  * analytics over ingested JSON events — see
  * /root/reference/README.md:9-14): ordered-funnel conversion and
  * cohort retention. Both are single-shuffle shapes: one hash exchange
  * on the user key, one in-partition sort, chained window functions —
  * no self-joins, no per-step re-scans, so the event table is read
  * exactly once regardless of funnel depth. At 100 TB the exchange
  * carries only (user, ts, tie, type) — project before calling if the
  * event rows are wide.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, step k counts as reached when an
    * event of `steps(k)` occurs strictly after (in (ts, tie) sort
    * order) some event that completed step k-1. Computed with chained
    * running-min windows over ONE sort:
    *
    *   prev1(r) = min ts of step-0 events strictly before r
    *   qual_k(r) = ts  if r is a step-k event and prev_{k-1}(r) exists
    *   prev_k(r) = min qual_k strictly before r
    *
    * All windows share the same partitioning + ordering, so Catalyst
    * plans a single Exchange + Sort with stacked Window operators.
    * Returns (step_idx, step, users, rate) with rate = users /
    * step-0 users (double division of exact longs — deterministic).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    val wPrev = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)

    // qualCols(k): per-row ts iff this row completes step k.
    val qual0 = when(col(typeCol) === steps.head, col(tsCol))
    val (withQuals, qualCols) =
      steps.zipWithIndex.tail.foldLeft((events.withColumn("__q0", qual0), Seq("__q0"))) {
        case ((df, cols), (step, k)) =>
          val prev = min(col(cols.last)).over(wPrev)
          val q = when(col(typeCol) === step && prev.isNotNull, col(tsCol))
          (df.withColumn(s"__q$k", q), cols :+ s"__q$k")
      }

    val perUser = withQuals.groupBy(col(userCol))
      .agg(qualCols.zipWithIndex.map { case (c, k) =>
        max(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__r$k")
      }.head, qualCols.zipWithIndex.tail.map { case (c, k) =>
        max(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__r$k")
      }: _*)

    val totals = perUser.agg(
      sum(col("__r0")).as("__u0"),
      qualCols.indices.tail.map(k => sum(col(s"__r$k")).as(s"__u$k")): _*)

    // O(steps) rows: unpivot the single totals row via a stack expr.
    val stacked = steps.indices.map(k =>
      s"CAST($k AS BIGINT), '${steps(k)}', CAST(__u$k AS BIGINT)").mkString(", ")
    totals.selectExpr(
        s"stack(${steps.size}, $stacked) AS (step_idx, step, users)")
      .withColumn("rate",
        when(first(col("users")).over(Window.orderBy("step_idx")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)) === 0L, 0.0)
          .otherwise(col("users").cast("double") /
            first(col("users")).over(Window.orderBy("step_idx")
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).cast("double")))
  }

  /** Cohort retention: users cohorted by the Monday of their first
    * event; a (cohort_week, week_offset) cell counts users with any
    * activity in that offset week. One exchange on the user key: the
    * cohort min is a whole-partition window, the distinct + count
    * re-aggregates (user, cohort, offset) triples — O(users x active
    * weeks), not O(events), after the map-side distinct.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wUser = Window.partitionBy(col(userCol))
    events
      .withColumn("__cohort", date_trunc("week", min(col(tsCol)).over(wUser)).cast("date"))
      .withColumn("__week", date_trunc("week", col(tsCol)).cast("date"))
      .withColumn("week_offset",
        (datediff(col("__week"), col("__cohort")).cast("long") / 7L).cast("long"))
      .select(col(userCol), col("__cohort").as("cohort_week"), col("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }
}
