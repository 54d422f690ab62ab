package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.sql.Timestamp

class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  private def ts(s: String) = Timestamp.valueOf(s)

  private def points(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, ts(t)) }.toDF("p_id", "t")
  }

  private def intervals(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, a, b) => (id, ts(a), ts(b)) }.toDF("iv_id", "t0", "t1")
  }

  /** The naive theta join the operator replaces — the correctness oracle. */
  private def naive(p: DataFrame, i: DataFrame): Set[(Long, Long)] =
    p.join(i, p("t") >= i("t0") && p("t") < i("t1"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def binned(p: DataFrame, i: DataFrame, widthUs: Long): Seq[(Long, Long)] =
    RangeJoin.pointInInterval(p, i, "t", "t0", "t1", widthUs)
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("hand-computed boundaries: start-inclusive, end-exclusive, edge-aligned intervals") {
    val p = points(
      1L -> "2024-01-01 10:00:00", // == t0 of iv 1: IN
      2L -> "2024-01-01 10:30:00", // == t1 of iv 1: OUT (half-open)
      3L -> "2024-01-01 10:29:59", // just inside iv 1
      4L -> "2024-01-01 11:00:00", // inside iv 2 only
      5L -> "2024-01-01 09:59:59") // before everything
    val i = intervals(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
      // ends EXACTLY on a 30-min bin edge — must not leak into the next bin
      (2L, "2024-01-01 10:30:00", "2024-01-01 11:30:00"),
      // empty interval (t1 == t0): no pairs ever
      (3L, "2024-01-01 10:15:00", "2024-01-01 10:15:00"))
    val got = binned(p, i, 30L * 60 * 1000000)
    assert(got.toSet == Set((1L, 1L), (3L, 1L), (2L, 2L), (4L, 2L)))
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == naive(p, i))
  }

  test("property: equals the naive theta join at bin widths narrower and wider than the intervals") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val p = (1L to 400L).map(id => (id, new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L)))
      .toDF("p_id", "t")
    val i = (1L to 60L).map { id =>
      val lo = base + rnd.nextInt(6 * 3600) * 1000L
      (id, new Timestamp(lo), new Timestamp(lo + (rnd.nextInt(40) + 1) * 60000L))
    }.toDF("iv_id", "t0", "t1")
    val expect = naive(p, i)
    assert(expect.nonEmpty)
    // 5 min (narrower than most intervals), 20 min, 2 h (wider than all)
    for (w <- Seq(5L, 20L, 120L).map(_ * 60 * 1000000)) {
      val got = binned(p, i, w)
      assert(got.size == got.toSet.size, s"width=$w emitted duplicate pairs")
      assert(got.toSet == expect, s"width=$w diverged from the theta join")
    }
  }

  test("nulls never match (theta-join parity) and hi<=lo intervals are dropped") {
    import spark.implicits._
    val p = Seq((1L, Some(ts("2024-01-01 10:10:00"))), (2L, None))
      .toDF("p_id", "t")
    val i = Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:30:00"))),
      (2L, None, Some(ts("2024-01-01 11:00:00"))),
      (3L, Some(ts("2024-01-01 10:00:00")), None),
      // inverted: hi < lo
      (4L, Some(ts("2024-01-01 12:00:00")), Some(ts("2024-01-01 11:00:00"))))
      .toDF("iv_id", "t0", "t1")
    val got = binned(p, i, 30L * 60 * 1000000)
    assert(got == Seq((1L, 1L)))
  }

  test("plan: equi join on the bin — no nested-loop, no cartesian product") {
    val prior = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = points((1L to 50L).map(id =>
        (id, s"2024-01-01 10:${(id % 60).formatted("%02d")}:00")): _*)
      val i = intervals((1L to 5L).map(id =>
        (id, "2024-01-01 10:00:00", "2024-01-01 10:40:00")): _*)
      val df = RangeJoin.pointInInterval(p, i, "t", "t0", "t1", 10L * 60 * 1000000)
      df.collect() // materialize AQE stages
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join fell back to a cross-product plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi join on the bin key:\n$plan")
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
