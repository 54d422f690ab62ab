package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Standing smoke for the multi-tenant soak harness ([[graft.SoakBench]]):
  * 25 s of the full mixed load (two query tenants, one ingesting, one
  * building/probing/dropping stores) with every steady-state check
  * asserted — no 5xx, jobs drained, persistent RDDs back to baseline
  * (the CacheScope release path), no leaked build lock, ingest
  * exactly-once, bounded RSS. The 10-minute receipt run uses the same
  * `run()`; this pins the harness and the release path per round.
  *
  * Found by this harness's first run: operator `Dataset.persist`
  * intermediates (minhash signatures, probe fingerprints) accumulated
  * one CacheManager entry per distinct analytics plan, forever —
  * CacheManager holds plans strongly, ContextCleaner never reaps them.
  * Fixed by CacheScope (request-scoped unpersist in the HTTP layer);
  * the `rdds_stable` check here is the regression pin. */
class SoakSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()

  test("25s mixed-load soak: no 5xx, no leaked state, ingest exactly-once") {
    val res = graft.SoakBench.run(spark, seconds = 25, sfDir = "/root/testdata/sf0.001")
    assert(res.ok, res.detail)
  }

  test("90s chaos soak: kills injected mid-run, exactness checks still pass") {
    // the chaos COMPOSITION pin (the 1 h receipt runs the same code at
    // scale): two mid-flight stream stop/restarts + a kill -9'd seam
    // consumer JVM land inside the run, and stream_exact / seam_exact /
    // chaos_injected must all still hold. 90 s is the floor where the
    // seam consumers (own Spark JVMs, ~10 s boot) reliably claim before
    // the ~40% kill point; the kill loop itself waits for a provable
    // mid-batch window (CLAIMED without INGESTED) before firing.
    val res = graft.SoakBench.run(spark, seconds = 90,
      sfDir = "/root/testdata/sf0.001", chaos = true)
    assert(res.ok, res.detail)
    assert(res.detail.contains("stream_stop_restart") &&
      res.detail.contains("seam_worker_kill9"),
      s"chaos events missing from the artifact: ${res.detail.take(400)}")
  }
}
