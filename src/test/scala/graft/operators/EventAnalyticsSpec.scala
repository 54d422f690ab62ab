package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.sql.Timestamp

class EventAnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  // (user, ts, event_id, type): event_id is the tie-breaker.
  private def events(rows: (Long, String, Long, String)*) = {
    import spark.implicits._
    rows.map { case (u, t, id, typ) => (u, ts(t), id, typ) }
      .toDF("user_id", "ts", "event_id", "event_type")
  }

  test("funnel counts ordered completions only, hand-computed") {
    // u1: view -> click -> purchase        (all 3 steps)
    // u2: click BEFORE view, then purchase (view only: click precedes it,
    //     purchase has no qualified click before it)
    // u3: view -> purchase -> click        (view + click; purchase too early)
    // u4: click + purchase, never views    (nothing)
    // u5: noise repeats                    (all 3 steps)
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:01:00", 2L, "click"),
      (1L, "2024-01-01 10:02:00", 3L, "purchase"),
      (2L, "2024-01-01 09:00:00", 4L, "click"),
      (2L, "2024-01-01 09:30:00", 5L, "view"),
      (2L, "2024-01-01 09:45:00", 6L, "purchase"),
      (3L, "2024-01-01 08:00:00", 7L, "view"),
      (3L, "2024-01-01 08:10:00", 8L, "purchase"),
      (3L, "2024-01-01 08:20:00", 9L, "click"),
      (4L, "2024-01-01 07:00:00", 10L, "click"),
      (4L, "2024-01-01 07:30:00", 11L, "purchase"),
      (5L, "2024-01-01 06:00:00", 12L, "view"),
      (5L, "2024-01-01 06:01:00", 13L, "view"),
      (5L, "2024-01-01 06:02:00", 14L, "click"),
      (5L, "2024-01-01 06:03:00", 15L, "click"),
      (5L, "2024-01-01 06:04:00", 16L, "purchase"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0L, "view", 4L), (1L, "click", 3L), (2L, "purchase", 2L)))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.75, 0.5))
  }

  test("funnel breaks equal timestamps by the tie column, strictly-after") {
    // Same timestamp: click(id=2) sorts after view(id=1) -> qualifies.
    // u2 reversed ids: click(id=3) sorts BEFORE view(id=4) -> does not.
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:00:00", 2L, "click"),
      (2L, "2024-01-01 10:00:00", 3L, "click"),
      (2L, "2024-01-01 10:00:00", 4L, "view"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click")).orderBy("step_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (1L, 1L)))
  }

  test("funnel result is invariant under repartitioning") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:01:00", 2L, "click"),
      (2L, "2024-01-01 11:00:00", 3L, "view"))
    val a = EventAnalytics.funnel(df, "user_id", "ts", "event_id", "event_type",
      Seq("view", "click")).orderBy("step_idx").collect().toSeq
    val b = EventAnalytics.funnel(df.repartition(7), "user_id", "ts", "event_id",
      "event_type", Seq("view", "click")).orderBy("step_idx").collect().toSeq
    assert(a == b)
  }

  test("retentionCohorts cohorts by first-event Monday, hand-computed") {
    // 2024-01-01 is a Monday. u1 cohort week 01-01: active offsets 0, 1.
    // u2 cohort week 01-08 (first event Tue 01-09): offset 0 only.
    // u3 cohort week 01-01: offsets 0 and 2.
    val df = events(
      (1L, "2024-01-02 10:00:00", 1L, "view"),
      (1L, "2024-01-10 10:00:00", 2L, "view"),
      (2L, "2024-01-09 10:00:00", 3L, "view"),
      (3L, "2024-01-07 10:00:00", 4L, "view"),   // Sunday of week 01-01
      (3L, "2024-01-15 10:00:00", 5L, "view"),   // Monday, offset 2
      (3L, "2024-01-15 11:00:00", 6L, "view"))   // same week: one cell
    val out = EventAnalytics.retentionCohorts(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L),   // u1 + u3
      ("2024-01-01", 1L, 1L),   // u1
      ("2024-01-01", 2L, 1L),   // u3
      ("2024-01-08", 0L, 1L)))  // u2
  }

  test("funnel plans a single exchange for the per-user phase") {
    val df = events((1L, "2024-01-01 10:00:00", 1L, "view"))
    val plan = EventAnalytics.funnel(df, "user_id", "ts", "event_id", "event_type",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    // All chained windows share one (partitioning, ordering): the event
    // table is exchanged exactly once before the final O(steps) rollup.
    val bigExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(bigExchanges == 1, s"expected 1 user_id exchange, plan:\n$plan")
  }
}
