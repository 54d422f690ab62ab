package graft.store

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** TableStats contracts: exact values on a known table (nulls counted,
  * ndv exact, min/max rendered), the approx mode stays inside the
  * HLL++ error budget, and the whole multi-column analyze is ONE scan
  * (Catalyst Expand, not one pass per distinct). */
class TableStatsSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  test("exact stats on a known table; approx ndv within budget; single scan") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")), (4L, Some("c"))
    ).toDF("id", "tag")
    val got = TableStats.analyze(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((5L, 0L, 4L, "1", "4")))
    assert(got("tag") == ((5L, 1L, 3L, "a", "c"))) // null not a distinct value

    // one scan for the whole multi-distinct analyze (Expand, not N
    // passes) — counted on the OPTIMIZED LOGICAL plan: the physical
    // plan is one opaque AdaptiveSparkPlanExec leaf under AQE, so a
    // physical collectLeaves() of 1 would be vacuously true
    val leaves = TableStats.analyze(df, Seq("id", "tag"))
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"analyze should scan once, saw ${leaves.size} leaves")

    // approx mode: same shape, ndv within the HLL++ default budget
    val approx = TableStats.analyze(df, Seq("id"), approxNdv = true).head()
    assert(math.abs(approx.getLong(3) - 4L) <= 1)
  }
}
