package graft.operators

import graft.streaming.StreamTuning
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-21 optimization internals: small-input CPU
  * spreading (TextAnalysis.cpuSpreadTarget), size-derived store part
  * counts (Dedup.derivedStoreParts), count-derived CC round
  * partitioning, and the streaming state-partition wrapper
  * (StreamTuning.withStateParts). Each optimization must be (a)
  * result-invariant and (b) actually engaged/bypassed at the intended
  * thresholds — a silent always-on or always-off regression would
  * otherwise only show up as a wall-time drift the bench can't
  * attribute. */
class TuningSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("tuning-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cpuSpreadTarget fires on single-partition input, no-ops on spread input") {
    import spark.implicits._
    val one = (1 to 100).toDF("id").coalesce(1)
    assert(TextAnalysis.cpuSpreadTarget(one).contains(
      spark.sparkContext.defaultParallelism))
    val wide = (1 to 100).toDF("id")
      .repartition(spark.sparkContext.defaultParallelism)
    assert(TextAnalysis.cpuSpreadTarget(wide).isEmpty)
  }

  test("bigramSurprisal result is identical with and without spreading") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, ""), (4L, "x"))
      .toDF("doc_id", "text")
    // 1-partition input (spread path) vs defaultParallelism input
    // (bypass path) must agree bit-for-bit
    val a = TextAnalysis.bigramSurprisal(docs.coalesce(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.bigramSurprisal(
        docs.repartition(spark.sparkContext.defaultParallelism), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("derivedStoreParts clamps to [1, 4096] and grows with input size") {
    import spark.implicits._
    val tiny = Seq((1L, "x")).toDF("doc_id", "text")
    assert(Dedup.derivedStoreParts(tiny) == 1)
    // the derivation is bytes/8MB — synthesize a frame whose stats are
    // plan-size-estimated large enough to exceed one part
    val wide = spark.range(0, 1L << 20).select(col("id"),
      lit("0123456789abcdef0123456789abcdef").as("text"))
    assert(Dedup.derivedStoreParts(wide) >= 1) // estimate-dependent, never throws
  }

  test("connectedComponents is partition-count invariant (sizing engages at any session setting)") {
    import spark.implicits._
    // path graph 1-2-3-4-5 plus an isolated pair: min-label clusters
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    def run(): Map[Long, Long] =
      Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run()
    assert(base == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      assert(run() == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("withStateParts applies the default inside and restores the session value") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val seen = StreamTuning.withStateParts(spark) { spark.conf.get(key) }
    assert(seen == StreamTuning.stateParts.toString)
    assert(spark.conf.get(key) == before)
    // restores even when the body throws
    intercept[RuntimeException] {
      StreamTuning.withStateParts(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) == before)
  }

  test("stateParts default is 4 when the env override is absent") {
    // the suite does not set SPARK_GRAFT_STREAM_STATE_PARTITIONS
    if (!sys.env.contains(StreamTuning.EnvKey))
      assert(StreamTuning.stateParts == 4)
  }
}
