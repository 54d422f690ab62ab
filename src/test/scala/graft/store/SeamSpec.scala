package graft.store

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.Files

/** The two-process ingest seam, as a standing test (PLANS.md round-14
  * addendum 3 receipt, reproduced on every suite run): a producer JVM
  * uploads spool batches to a shared blob store, a consumer JVM is
  * kill -9'd BETWEEN claiming a batch and ingesting it, and a second
  * consumer steals the expired lease and drains everything — the
  * catalog table must end at exactly-once EFFECT (per-batch count ==
  * distinct count, no loss, no duplication).
  *
  * Real `java` subprocesses, not threads: lease expiry after a
  * heartbeat stops is only meaningful when the heartbeat's OWNER
  * process is actually dead (reference deployment shape,
  * workers.go:27-116). */
class SeamSpec extends AnyFunSuite {

  private val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def worker(log: File, env: Map[String, String], args: String*): Process = {
    val cmd = (Seq(
      new File(System.getProperty("java.home"), "bin/java").getAbsolutePath) ++
      opens ++ Seq("-Xmx2g", "-cp", System.getProperty("java.class.path"),
        "graft.SeamWorker") ++ args)
    val pb = new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(false)
    pb.redirectError(new File(log.getParentFile, log.getName + ".err"))
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.start()
  }

  private def waitFor(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(100)
    cond
  }

  private def text(f: File): String =
    if (f.exists()) new String(Files.readAllBytes(f.toPath), "UTF-8") else ""

  /** The full produce → doom → kill -9 → steal → drain receipt, over
    * whatever blob store / claim queue `extraEnv` selects (SeamWorker
    * defaults to local blobs + file leases when it selects nothing). */
  private def killStealReceipt(shared: String, extraEnv: Map[String, String]): Unit = {
    val logs = new File(shared, "logs"); logs.mkdirs()

    // 1. produce 4 batches x 50 rows (no Spark in that JVM)
    val prodLog = new File(logs, "produce.log")
    val prod = worker(prodLog, extraEnv, "produce", shared, "4", "50")
    assert(prod.waitFor() == 0, s"producer failed: ${text(prodLog)}")
    assert(text(prodLog).contains("PRODUCED batches=4 rows=200"), text(prodLog))

    // 2. doomed consumer: 60 s sleep inside its first batch — killed
    //    far inside the CLAIMED..INGESTED window
    val doomedLog = new File(logs, "doomed.log")
    val doomed = worker(doomedLog, extraEnv + ("SEAM_SLEEP_MS" -> "60000"),
      "consume", shared, "doomed")
    assert(waitFor(120000)(text(doomedLog).contains("CLAIMED")),
      s"doomed consumer never claimed a batch: ${text(doomedLog)}")
    val claimedFile = "CLAIMED (\\S+)".r.findFirstMatchIn(text(doomedLog)).get.group(1)
    doomed.destroyForcibly() // SIGKILL: heartbeats stop, lease orphaned
    assert(waitFor(30000)(!doomed.isAlive), "kill -9 did not take")
    assert(!text(doomedLog).contains("INGESTED"),
      s"doomed must die mid-batch, before any INGESTED line: ${text(doomedLog)}")

    // 3. survivor drains everything, including the orphaned batch
    //    (3 s lease TTL expires, tryClaim steals)
    val survLog = new File(logs, "survivor.log")
    val surv = worker(survLog, extraEnv, "consume", shared, "survivor")
    assert(waitFor(180000)(
      "INGESTED".r.findAllIn(text(survLog)).size >= 4),
      s"survivor did not drain 4 batches: ${text(survLog)}\n${text(new File(logs, "survivor.log.err")).takeRight(500)}")
    Files.writeString(new File(shared, "stop").toPath, "")
    assert(surv.waitFor() == 0, text(new File(logs, "survivor.log.err")).takeRight(800))
    val out = text(survLog)
    assert(out.contains(s"INGESTED $claimedFile"),
      s"the orphaned batch $claimedFile must be stolen and ingested: $out")
    assert(out.contains("DONE survivor rows=200"),
      s"exactly-once effect: 4x50 rows, no loss, no duplication: $out")
  }

  test("kill -9 mid-batch: lease expires, second process steals, effect is exactly-once") {
    killStealReceipt(Files.createTempDirectory("graft-seam").toString, Map.empty)
  }

  test("same receipt on the object-store deployment: hadoop blob URI + S3 conditional-write claims") {
    // The reference's cloud shape (S3 blobstore + SQS claim queue,
    // pkg/storage/blobstore/s3 + pkg/storage/queue/sqs): blobs behind a
    // Hadoop FileSystem URI, claims behind S3 conditional writes. The
    // fake S3 lives in THIS spec JVM and verifies every worker
    // request's SigV4 signature over real TCP — so the claim state
    // (like real S3) survives the doomed worker's kill -9, and the
    // survivor's steal is a genuine cross-process conditional-write
    // race, not shared-memory bookkeeping.
    val fake = new FakeS3("AKSEAM", "seamsecret", "eu-central-1")
    try {
      val shared = Files.createTempDirectory("graft-seam-s3").toString
      killStealReceipt(shared, Map(
        "GRAFT_BLOB_TYPE" -> "hadoop",
        "GRAFT_BLOB_URI" -> s"file://$shared/blobs",
        "GRAFT_CLAIM_QUEUE" -> "cas-s3:graft-seam/claims",
        "GRAFT_BLOB_ENDPOINT" -> fake.endpoint,
        "GRAFT_BLOB_REGION" -> "eu-central-1",
        "GRAFT_BLOB_ACCESS_KEY_ID" -> "AKSEAM",
        "GRAFT_BLOB_SECRET_ACCESS_KEY" -> "seamsecret",
        "GRAFT_LEASE_TTL_MS" -> "3000"))
      assert(fake.keys.isEmpty,
        s"every claim must be released after its batch lands: ${fake.keys}")
    } finally fake.stop()
  }
}
