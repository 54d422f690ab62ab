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

  private lazy val spark = graft.TestSpark.session()

  test("cpuSpreadTarget fires on single-partition input, no-ops on spread input") {
    import spark.implicits._
    val one = (1 to 100).toDF("id").coalesce(1)
    assert(TextAnalysis.cpuSpreadTarget(one).contains(
      spark.sparkContext.defaultParallelism))
    val wide = (1 to 100).toDF("id")
      .repartition(spark.sparkContext.defaultParallelism)
    assert(TextAnalysis.cpuSpreadTarget(wide).isEmpty)
  }

  test("cpuSpreadTarget is None for exchange-bearing inputs, decided from the plan alone") {
    import spark.implicits._
    // r21 ADVICE: df.rdd on a join/aggregate output resolves the AQE
    // final plan, EXECUTING the upstream stages at operator-construction
    // time (and recomputing them at run time). The gate must therefore
    // refuse exchange-bearing plans structurally — narrowOnly(plan) is
    // checked BEFORE df.rdd is ever touched — and exchange outputs are
    // already produced at the session shuffle-partition count anyway.
    val agg = (1 to 100).toDF("id").groupBy("id").count()
    assert(!TextAnalysis.narrowOnly(agg.queryExecution.optimizedPlan))
    assert(TextAnalysis.cpuSpreadTarget(agg).isEmpty)
    val joined = (1 to 10).toDF("id").join((1 to 10).toDF("id"), "id")
    assert(TextAnalysis.cpuSpreadTarget(joined).isEmpty)
    // narrow wrappers stay spreadable: filter/project over a leaf
    val narrow = (1 to 100).toDF("id").coalesce(1)
      .filter(col("id") > 0).select(col("id"))
    assert(TextAnalysis.narrowOnly(narrow.queryExecution.optimizedPlan))
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

  test("derivedStoreParts clamps to [1, 4096], honors minParts, and grows with input size") {
    import spark.implicits._
    val tiny = Seq((1L, "x")).toDF("doc_id", "text")
    assert(Dedup.derivedStoreParts(tiny) == 1)
    // probe-facing floor (the q146 fix): a tiny corpus still gets a
    // handful of prunable directories
    assert(Dedup.derivedStoreParts(tiny, minParts = 4) == 4)
    // growth: Range stats are exact (numElements × row width), so a
    // 256M-row long frame is ≥ 2 GB under any row-size accounting —
    // the derivation at 8 MB/part must yield well over 16 parts, and
    // double the rows must derive strictly more parts
    val big = spark.range(0, 1L << 28).toDF("id")
    val bigger = spark.range(0, 1L << 29).toDF("id")
    val p1 = Dedup.derivedStoreParts(big)
    val p2 = Dedup.derivedStoreParts(bigger)
    assert(p1 >= 16, s"expected >= 16 parts for a 2 GB frame, got $p1")
    assert(p2 > p1, s"parts did not grow with input size: $p1 -> $p2")
    assert(p2 <= 4096)
  }

  test("derivedStoreParts distrusts exchange-bearing stats (falls back to session parallelism)") {
    import spark.implicits._
    // r21 ADVICE: a join's size estimate can be a PRODUCT of child
    // sizes; trusting it would clamp at 4096 and write thousands of
    // tiny hive partitions for small data. Exchange-bearing inputs
    // fall back to max(minParts, session shuffle partitions).
    val joined = spark.range(0, 1L << 20).toDF("id")
      .join(spark.range(0, 1L << 20).toDF("id"), "id")
    val parts = Dedup.derivedStoreParts(joined)
    val session = spark.sessionState.conf.numShufflePartitions
    assert(parts == math.max(1, session), s"expected session fallback $session, got $parts")
    assert(Dedup.derivedStoreParts(joined, minParts = 8) == math.max(8, session))
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

  test("statePartsFor scales with staged input volume: floor 4, ~8 MB/part, cap 4096") {
    if (!sys.env.contains(StreamTuning.EnvKey)) {
      // bench-scale streams (KB–MB staged input) stay at the measured
      // commit-cost floor; partitions grow with DATA past ~32 MB and
      // clamp at 4096 — never a function of the host's core count
      assert(StreamTuning.statePartsFor(0L) == 4)
      assert(StreamTuning.statePartsFor(10L << 20) == 4)
      assert(StreamTuning.statePartsFor(100L << 20) == 13)   // ceil(100/8)
      assert(StreamTuning.statePartsFor(1L << 40) == 4096)   // 1 TB caps
    }
  }

  test("dirBytes sums a staged directory recursively and is 0 for missing paths") {
    val base = java.nio.file.Files.createTempDirectory("graft-tuning-dirbytes").toFile
    try {
      val sub = new java.io.File(base, "in"); sub.mkdirs()
      java.nio.file.Files.write(new java.io.File(sub, "a.bin").toPath, new Array[Byte](1234))
      java.nio.file.Files.write(new java.io.File(base, "b.bin").toPath, new Array[Byte](766))
      assert(StreamTuning.dirBytes(base) == 2000L)
      assert(StreamTuning.dirBytes(new java.io.File(base, "nope")) == 0L)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(base)
    }
  }
}
