package graft.operators

import graft.operators.StatsJoin.SideStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class StatsJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  private val big = SideStats(nRows = 1000000L, ndvKey = 100000L, avgRowBytes = 100)
  private val small = SideStats(nRows = 100L, ndvKey = 100L, avgRowBytes = 100)
  private val hot = SideStats(nRows = 10000000L, ndvKey = 3L, avgRowBytes = 100)

  test("chooseStrategy ladder: broadcast the smaller fitting side, salt low-NDV keys, else shuffle") {
    val mb64 = 64L << 20
    assert(StatsJoin.chooseStrategy(big, small, mb64, 1 << 20) == "broadcast_right")
    assert(StatsJoin.chooseStrategy(small, big, mb64, 1 << 20) == "broadcast_left")
    // both fit: still the smaller one (less data over the wire)
    assert(StatsJoin.chooseStrategy(small, SideStats(50, 50, 100), mb64, 1 << 20)
      == "broadcast_right")
    // neither fits, hot key (10M rows / 3 keys >> bound): salted
    assert(StatsJoin.chooseStrategy(hot, big, 1024, 1 << 20) == "salted")
    // neither fits, well-spread keys: plain shuffle join
    assert(StatsJoin.chooseStrategy(big, big, 1024, 1 << 20) == "shuffle")
  }

  private def fixtures(): (DataFrame, DataFrame) = {
    import spark.implicits._
    val fact = (1L to 2000L).map(i => (i % 50, i)).toDF("k", "fact_id")
    val dim = (0L until 50L).map(i => (i, s"dim_$i")).toDF("k", "label")
    (fact, dim)
  }

  private def rows(df: DataFrame): Set[(Long, Long, String)] =
    df.select("k", "fact_id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("all three branches produce the identical result set; plans match the chosen strategy") {
    val prior = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    // disable Catalyst's own size-based broadcast so the plan shape is
    // OUR decision, not its estimate's
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (fact, dim) = fixtures()
      val factStats = SideStats(2000, 50, 16)
      val dimStats = SideStats(50, 50, 24)
      def planOf(df: DataFrame) = { df.collect(); df.queryExecution.executedPlan.toString }

      // 1. stats say the dim fits: broadcast even though Catalyst won't
      val bcast = StatsJoin.autoJoin(fact, factStats, dim, dimStats, Seq("k"))
      val bplan = planOf(bcast)
      assert(bplan.contains("BroadcastHashJoin"), s"stats-fit side not broadcast:\n$bplan")
      val expect = rows(bcast)
      assert(expect.size == 2000)

      // 2. force the shuffle branch: neither side "fits", keys well spread
      val bigF = factStats.copy(avgRowBytes = 1 << 20)
      val bigD = dimStats.copy(avgRowBytes = 1 << 20)
      val smj = StatsJoin.autoJoin(fact, bigF, dim, bigD, Seq("k"),
        maxBroadcastBytes = 1024, maxRowsPerKey = 1000)
      val splan = planOf(smj)
      assert(splan.contains("SortMergeJoin") || splan.contains("ShuffledHashJoin"),
        s"expected a shuffled join:\n$splan")
      assert(!splan.contains("BroadcastHashJoin"))
      assert(rows(smj) == expect)

      // 3. force the salted branch: 2000/50 = 40 rows/key > 10
      val salted = StatsJoin.autoJoin(fact, bigF, dim, bigD, Seq("k"),
        maxBroadcastBytes = 1024, maxRowsPerKey = 10, saltFrom = Some("fact_id"))
      val saltPlan = planOf(salted)
      assert(saltPlan.contains("__salt"), s"salted branch missing the salt key:\n$saltPlan")
      assert(rows(salted) == expect)

      // salted branch without a salt source is a loud error, not a fallback
      val e = intercept[IllegalArgumentException] {
        StatsJoin.autoJoin(fact, bigF, dim, bigD, Seq("k"),
          maxBroadcastBytes = 1024, maxRowsPerKey = 10)
      }
      assert(e.getMessage.contains("saltFrom"))
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("fromAnalyze wires an ANALYZE catalog row into SideStats") {
    val (fact, _) = fixtures()
    val stats = graft.store.TableStats.analyze(fact, Seq("k", "fact_id"))
    val s = StatsJoin.fromAnalyze(stats, "k", avgRowBytes = 16)
    assert(s.nRows == 2000 && s.ndvKey == 50 && s.bytes == 32000)
    assert(math.abs(s.rowsPerKey - 40.0) < 1e-9)
  }
}
