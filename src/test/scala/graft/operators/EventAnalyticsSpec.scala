package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.sql.Timestamp

class EventAnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


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

  test("funnelWithin boundary: a chain completing at exactly T counts (inclusive)") {
    // T = 3600 s. u1 completes view->click->purchase at exactly +3600 s of
    // the view anchor. u2 purchases at +3601 s -> purchase step NOT reached.
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:30:00", 2L, "click"),
      (1L, "2024-01-01 11:00:00", 3L, "purchase"),
      (2L, "2024-01-01 10:00:00", 4L, "view"),
      (2L, "2024-01-01 10:30:00", 5L, "click"),
      (2L, "2024-01-01 11:00:01", 6L, "purchase"))
    val out = EventAnalytics.funnelWithin(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"), withinSeconds = 3600L)
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("funnelWithin propagates the max anchor (greedy witness)") {
    // u1 views at 09:00 and again at 10:50. The click at 10:55 is outside
    // T=600 s of the FIRST view but inside it of the second: only the
    // max-anchor recurrence reaches the click step. The purchase at 11:00
    // is within T of the surviving (10:50) anchor -> full funnel.
    val df = events(
      (1L, "2024-01-01 09:00:00", 1L, "view"),
      (1L, "2024-01-01 10:50:00", 2L, "view"),
      (1L, "2024-01-01 10:55:00", 3L, "click"),
      (1L, "2024-01-01 11:00:00", 4L, "purchase"))
    val out = EventAnalytics.funnelWithin(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"), withinSeconds = 600L)
      .orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L))
  }

  test("funnelWithin deadline binds the whole chain to the step-0 anchor") {
    // Each hop is only 10 min apart, but the chain spans 09:00 -> 09:20:
    // with T = 15 min the purchase step is out of deadline even though
    // every adjacent gap is under T.
    val df = events(
      (1L, "2024-01-01 09:00:00", 1L, "view"),
      (1L, "2024-01-01 09:10:00", 2L, "click"),
      (1L, "2024-01-01 09:20:00", 3L, "purchase"))
    val out = EventAnalytics.funnelWithin(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"), withinSeconds = 900L)
      .orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 0L))
  }

  test("funnel treats quotes in step names as data, not SQL syntax") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "o'view"),
      (1L, "2024-01-01 10:01:00", 2L, "o'click"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_id",
        "event_type", Seq("o'view", "o'click")).orderBy("step_idx").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("o'view", 1L), ("o'click", 1L)))
  }

  test("funnel rejects reserved __-prefixed input column names") {
    val df = events((1L, "2024-01-01 10:00:00", 1L, "view"))
      .withColumnRenamed("event_type", "__q0")
    val e = intercept[IllegalArgumentException] {
      EventAnalytics.funnel(df, "user_id", "ts", "event_id", "__q0",
        Seq("view", "click"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("funnel ignores unrelated caller columns that share temp names") {
    // A column named like an internal temporary is simply projected away.
    val df = events((1L, "2024-01-01 10:00:00", 1L, "view"),
        (1L, "2024-01-01 10:01:00", 2L, "click"))
      .withColumn("step", lit("junk")).withColumn("users", lit(-1L))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click")).orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("funnelWithin result is invariant under repartitioning") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:20:00", 2L, "click"),
      (2L, "2024-01-01 11:00:00", 3L, "view"),
      (2L, "2024-01-01 12:30:00", 4L, "click"))
    val a = EventAnalytics.funnelWithin(df, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click"), 3600L).orderBy("step_idx").collect().toSeq
    val b = EventAnalytics.funnelWithin(df.repartition(7), "user_id", "ts",
      "event_id", "event_type", Seq("view", "click"), 3600L)
      .orderBy("step_idx").collect().toSeq
    assert(a == b)
  }

  test("funnelWithin plans a single event-sized exchange") {
    val df = events((1L, "2024-01-01 10:00:00", 1L, "view"))
    val plan = EventAnalytics.funnelWithin(df, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"), 3600L)
      .queryExecution.executedPlan.toString
    val bigExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(bigExchanges == 1, s"expected 1 user_id exchange, plan:\n$plan")
  }

  test("funnel no longer plans any single-partition WindowExec") {
    val df = events((1L, "2024-01-01 10:00:00", 1L, "view"))
    // The O(steps) rate rollup is computed on the single totals row via
    // struct-explode, so the ONLY Window ops left are the user-partitioned
    // chained-recurrence ones: exactly steps-1 of them, each mentioning
    // the user key in its spec.
    val plan = EventAnalytics.funnel(df, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click")).queryExecution.executedPlan.toString
    val windowOps = "Window \\[".r.findAllIn(plan).length
    assert(windowOps == 1, s"expected 1 Window op (no rate window), plan:\n$plan")
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

  test("normalizeEventTs classifies long epochs by magnitude (ns/us/ms/s all land on the same instant)") {
    import spark.implicits._
    // band edges matter: 2001 (mid-band) AND 1975 (1.6e8 s — the early
    // epoch a naive 5e17 ns cut misclassified as micros) both round-trip
    for (seconds <- Seq(1_000_000_000L, 160_000_000L)) {
      val micros = seconds * 1_000_000L
      val shapes = Seq(
        "ns" -> micros * 1000L,
        "us" -> micros,
        "ms" -> micros / 1000L,
        "s"  -> seconds)
      for ((label, raw) <- shapes) {
        val df = Seq(raw).toDF("ts")
        val out = graft.Queries.normalizeEventTs(df)
        assert(out.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampType, s"$label shape not TIMESTAMP")
        val got = out.select(unix_micros(col("ts"))).head().getLong(0)
        assert(got == micros, s"$label/$seconds: got $got micros, want $micros")
      }
    }
    // empty table: no probe value — must not throw, any unit maps nothing
    val empty = Seq.empty[Long].toDF("ts")
    assert(graft.Queries.normalizeEventTs(empty).count() == 0L)
  }

  test("transitions: hand-computed matrix, ties broken by the tie column, firsts excluded") {
    // u1: a -> b -> a; u2: two SAME-timestamp events ordered by id (b
    // then a — the tie column decides), then c; u3: single event (no
    // transition at all)
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (1L, "2024-01-01 10:01:00", 2L, "b"),
      (1L, "2024-01-01 10:02:00", 3L, "a"),
      (2L, "2024-01-01 09:00:00", 5L, "b"),
      (2L, "2024-01-01 09:00:00", 4L, "a"), // same ts as id=5, lower id: FIRST
      (2L, "2024-01-01 09:10:00", 6L, "c"),
      (3L, "2024-01-01 08:00:00", 7L, "z"))
    val got = EventAnalytics.transitions(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 1L))
  }

  test("topPaths: pathLen truncation, deterministic tie order, repartition invariance") {
    // u1,u2: a>b (n=2); u3: a>c — truncated from a>c>d by pathLen=2;
    // u4: lone c. At equal count, a>c precedes c by the path tiebreak.
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (1L, "2024-01-01 10:01:00", 2L, "b"),
      (2L, "2024-01-01 11:00:00", 3L, "a"),
      (2L, "2024-01-01 11:01:00", 4L, "b"),
      (3L, "2024-01-01 12:00:00", 5L, "a"),
      (3L, "2024-01-01 12:01:00", 6L, "c"),
      (3L, "2024-01-01 12:02:00", 7L, "d"), // beyond pathLen=2: dropped
      (4L, "2024-01-01 13:00:00", 8L, "c"))
    def run(d: org.apache.spark.sql.DataFrame) =
      EventAnalytics.topPaths(d, "user_id", "ts", "event_id", "event_type",
        pathLen = 2, k = 10).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(df)
    // path_len flags complete-vs-truncated: u4's lone "c" ended there
    // (path_len 1 < pathLen), u3's "a>c" is a cut prefix (path_len 2)
    assert(got == Seq(("a>b", 2L, 2L), ("a>c", 2L, 1L), ("c", 1L, 1L)))
    // collect_list order is arrival order — the sort_array must make the
    // result partition-layout-independent
    assert(run(df.repartition(7)) == got)
    // k cuts after the (count desc, path) order
    val top1 = EventAnalytics.topPaths(df, "user_id", "ts", "event_id", "event_type",
      pathLen = 2, k = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(top1 == Seq(("a>b", 2L, 2L)))
  }

  test("downsampleOhlc: hand-computed buckets, equal-timestamp open/close break by the tie column") {
    import spark.implicits._
    // key columns reuse the events() fixture shape: (user→key, ts, id, type→value bucket key)
    val df = Seq(
      // hour 10, key "k": open=5.0 (earliest), close=1.0 (latest), low=1.0, high=9.0
      ("k", ts("2024-01-01 10:00:00"), 1L, 5.0),
      ("k", ts("2024-01-01 10:30:00"), 2L, 9.0),
      ("k", ts("2024-01-01 10:59:00"), 3L, 1.0),
      // hour 11, key "k": ALL at the same timestamp — id order decides:
      // open = id1's 7.0, close = id3's 2.0
      ("k", ts("2024-01-01 11:00:00"), 1L, 7.0),
      ("k", ts("2024-01-01 11:00:00"), 2L, 8.0),
      ("k", ts("2024-01-01 11:00:00"), 3L, 2.0),
      // hour 10, key "z": single event — open=close=low=high
      ("z", ts("2024-01-01 10:15:00"), 9L, 4.0))
      .toDF("key", "ts", "event_id", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      EventAnalytics.downsampleOhlc(d, "ts", "event_id", "key", "value", "hour")
        .orderBy("bucket", "key").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    val got = run(df)
    assert(got == Seq(
      ("2024-01-01 10:00:00.0", "k", 5.0, 1.0, 1.0, 9.0, 3L),
      ("2024-01-01 10:00:00.0", "z", 4.0, 4.0, 4.0, 4.0, 1L),
      ("2024-01-01 11:00:00.0", "k", 7.0, 2.0, 2.0, 8.0, 3L)))
    assert(run(df.repartition(5)) == got, "open/close depend on partition layout")
  }

  test("anomalies: spike flagged against trailing baseline; flat, short and mild series withheld") {
    // hourly counts per key — k: 2,4,10 (spike); f: 3,3,3 (flat: zero
    // variance, no verdict); m: 2,4,5 (z=sqrt(2) < 2, not flagged)
    def burst(key: String, hour: Int, n: Int, idBase: Long) =
      (1 to n).map(i => (1L, f"2024-01-01 $hour%02d:10:00", idBase + i, key))
    val df = events(
      (burst("k", 10, 2, 100) ++ burst("k", 11, 4, 200) ++ burst("k", 12, 10, 300) ++
       burst("f", 10, 3, 400) ++ burst("f", 11, 3, 500) ++ burst("f", 12, 3, 600) ++
       burst("m", 10, 2, 700) ++ burst("m", 11, 4, 800) ++ burst("m", 12, 5, 900)): _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      EventAnalytics.anomalies(d, "ts", "event_type", "hour",
          trailing = 2, zThreshold = 2.0)
        .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getLong(2), r.getDouble(3))).toSeq
    val got = run(df)
    assert(got.map(t => (t._1, t._2, t._3)) == Seq(("k", "2024-01-01 12:00:00.0", 10L)))
    // z = (10 - 3) / sqrt(((4+16) - 36/2) / 1) = 7/sqrt(2)
    assert(math.abs(got.head._4 - 7.0 / math.sqrt(2.0)) < 1e-12)
    assert(run(df.repartition(6)) == got)
  }

  test("growthAccounting: hand-traced lifecycle; churn only across adjacent weeks") {
    import spark.implicits._
    // weeks W1..W4 (Mondays); u1 active W1,W2,W4 (new, retained, resurrected)
    // u2 active W1 only (new, churned at W2); u3 active W2,W3 (new, retained)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-22 10:00:00")),
      (2L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-09 10:00:00")), (3L, ts("2024-01-16 10:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.growthAccounting(events, "user_id", "ts")
      .orderBy("week").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 2L, 0L, 0L, None),          // W1: u1,u2 new
      ("2024-01-08", 2L, 1L, 1L, 0L, Some(1L)),      // W2: u3 new, u1 retained, u2 churned
      ("2024-01-15", 1L, 0L, 1L, 0L, Some(1L)),      // W3: u3 retained, u1 churned
      ("2024-01-22", 1L, 0L, 0L, 1L, Some(1L))),     // W4: u1 resurrected, u3 churned
      s"got ${got.toSeq}")
    // identity: active = new + retained + resurrected, every week
    assert(got.forall { case (_, a, n, r, res, _) => a == n + r + res })
  }

  test("fillGapsConstant: holes become the fill value, flagged; observed rows untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val series = Seq(
      ("k", ts("2024-01-01 10:00:00"), 5L),
      ("k", ts("2024-01-01 13:00:00"), 9L))
      .toDF("key", "bucket", "n")
    val got = EventAnalytics.fillGapsConstant(series, "key", "bucket", "n",
        stepUs = 3600L * 1000000, fillValue = lit(0L))
      .orderBy("key", "bucket")
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getBoolean(3))).toSeq
    // zero-filled holes at 11:00/12:00 — the outage rows forward fill hides
    assert(got == Seq(
      ("2024-01-01 10:00:00.0", 5L, false),
      ("2024-01-01 11:00:00.0", 0L, true),
      ("2024-01-01 12:00:00.0", 0L, true),
      ("2024-01-01 13:00:00.0", 9L, false)))
  }

  test("fillGaps: holes appear on the step grid, forward-filled and flagged; dense keys untouched") {
    import spark.implicits._
    // key "k": observations at 10:00 (5) and 13:00 (9) — two holes;
    // key "d": dense 10:00, 11:00 — nothing to fill
    val series = Seq(
      ("k", ts("2024-01-01 10:00:00"), 5L),
      ("k", ts("2024-01-01 13:00:00"), 9L),
      ("d", ts("2024-01-01 10:00:00"), 1L),
      ("d", ts("2024-01-01 11:00:00"), 2L))
      .toDF("key", "bucket", "n")
    def run(d: org.apache.spark.sql.DataFrame) =
      EventAnalytics.fillGaps(d, "key", "bucket", "n", stepUs = 3600L * 1000000)
        .orderBy("key", "bucket")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getLong(2), r.getBoolean(3))).toSeq
    val got = run(series)
    assert(got == Seq(
      ("d", "2024-01-01 10:00:00.0", 1L, false),
      ("d", "2024-01-01 11:00:00.0", 2L, false),
      ("k", "2024-01-01 10:00:00.0", 5L, false),
      ("k", "2024-01-01 11:00:00.0", 5L, true),
      ("k", "2024-01-01 12:00:00.0", 5L, true),
      ("k", "2024-01-01 13:00:00.0", 9L, false)))
    assert(run(series.repartition(3)) == got)
  }
}
