package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Standing smoke for the fuzzed-parameter restart chaos
  * ([[StreamChaos]]): two seed points per run — a worker JVM maintaining
  * the seed's streaming query is kill -9'd the moment its first durable
  * output lands, a second JVM resumes the same checkpoint, and the
  * converged result must equal a CLEAN single-JVM run of the same seed
  * bit-for-bit (canonical row strings). The bulk receipt (≥10 points ×
  * DuckDB replay) runs via [[StreamChaosSweep]]; this pins the
  * machinery in `sbt test` so a regression in checkpoint resume, the
  * file-sink metadata log, or the epoch-addressed MV overwrite fails
  * the suite, not just the round ledger.
  *
  * Real subprocesses for the same reason as StreamRestartSpec: a
  * checkpoint resume after SIGKILL is only meaningful when the first
  * query's JVM actually died mid-flight. */
class StreamFuzzChaosSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.session()

  private val dir = "/root/testdata/sf0.001"


  private def canon(df: DataFrame): Vector[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
      .mkString("|")).toVector.sorted

  // two fixed seeds covering a parquet-sink family and an
  // epoch-addressed MV family (families re-scanned via StreamFuzzScan
  // when the grammar changes); the kill itself is racy by design, so
  // the assertion is: every point converges to the clean result, and
  // at least one kill landed while the worker was genuinely mid-flight
  private val seeds = Seq(6L, 37L)

  private def runConvergedPoint(seed: Long): StreamChaos.PointResult = {
    val base = FuzzScratch.fresh(s"streamchaos_spec_$seed")
    val (plan, res) = StreamChaos.runPoint(spark, dir, seed, base)
    assert(res.resumedClean,
      s"seed=$seed (${res.family} ${res.params}): resume did not complete " +
        s"cleanly; worker2 log tail: ${res.log2}")
    val chaotic = canon(plan.read(spark, base))
    val clean = canon(StreamFuzz.generate(seed).query(spark, dir))
    assert(chaotic == clean,
      s"seed=$seed (${res.family} ${res.params}): kill-restart result " +
        s"diverged from the clean run (${chaotic.size} vs ${clean.size} rows)")
    res
  }

  test("kill -9 at a fuzzed point converges to the clean run") {
    val results = seeds.map(runConvergedPoint)
    // the mid-flight-kill signal is inherently racy: if both workers
    // drain their AvailableNow run before the 5 ms poll sees the first
    // output file, no kill lands — a scheduling artifact, not a product
    // regression. Retry with a third seed before failing (ADVICE r19);
    // convergence is still asserted on every point, retried or not.
    val retried =
      if (results.exists(_.killedMidFlight)) results
      else results :+ runConvergedPoint(23L)
    assert(retried.exists(_.killedMidFlight),
      "no worker was killed mid-flight across three points — the chaos " +
        "window never opened (families: " +
        s"${retried.map(r => s"${r.family}:${r.killedMidFlight}").mkString(", ")})")
  }
}
