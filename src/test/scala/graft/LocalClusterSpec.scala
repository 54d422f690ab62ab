package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.Files

/** Multi-JVM EXECUTION receipt, as a standing test (PLANS.md round-15
  * addendum): a representative heavy battery subset runs under
  * `local-cluster[2,4,2048]` — two REAL executor JVMs launched from
  * SPARK_HOME, so every task closure crosses a serialization boundary,
  * every shuffle block is fetched over the network stack, and any
  * driver-state-assumed-local bug local[n] structurally cannot surface
  * (shared JVM = no closure capture ever actually serializes) fails
  * here.
  *
  * The subset is chosen for closure diversity: q70 (star-contraction
  * connected components — iterative, driver-coordinated rounds over
  * executor-resident edges), q131 (minhash store write + indexed probe
  * — custom Expressions and a parquet store round-trip), q145 (bigram
  * surprisal — the heaviest shuffle in the battery, custom TypedColumn
  * aggregators). The FULL battery has a 189/189 hash-PASS local-cluster
  * run receipted in PLANS.md; this spec keeps the mode from rotting.
  *
  * Subprocess, not in-suite: the suite JVM already holds the shared
  * local[4] SparkContext, and one JVM allows one context — the
  * local-cluster session must own a fresh JVM (the SeamSpec pattern).
  */
class LocalClusterSpec extends AnyFunSuite {

  private val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("q70/q131/q145/q235/q236/q241/q243 run green under local-cluster (real executor JVMs)") {
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new File(sparkHome, "jars").isDirectory,
      s"SPARK_HOME=$sparkHome has no jars/ — local-cluster cannot launch workers")
    val out = Files.createTempDirectory("graft_lc_spec").toFile
    val log = new File(out, "verify.log")
    val cmd = Seq(
      new File(System.getProperty("java.home"), "bin/java").getAbsolutePath) ++
      opens ++ Seq("-Xmx3g", "-cp", System.getProperty("java.class.path"),
        "graft.Verify", "/root/testdata/sf0.001", out.getAbsolutePath)
    val pb = new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(true)
    val env = pb.environment()
    env.put("SPARK_HOME", sparkHome)
    // the worker launcher resolves the executor classpath via the Scala
    // version; a distribution layout needs it pinned explicitly
    env.put("SPARK_SCALA_VERSION", "2.13")
    // q235 joins the pinned set in r18: a StoreFuzz row whose store
    // BUILD (upsert parts + tombstone + compactLatest) runs from real
    // executor JVMs — the multi-JVM path for the merge-store surface.
    // q241 joins in r19: firstOccurrenceDedup's mapGroupsWithState
    // custom state lives in executor-side state stores here, with
    // checkpoint/state files crossing the worker-JVM boundary — the
    // one stateful-streaming API local[n] exercises only in-process.
    // q236/q243 join in r20 (the state-store-heaviest remaining
    // streaming families): session_window merge state across
    // micro-batches, and the quantile-MV foreachBatch path whose
    // epoch parts are written from executor JVMs.
    env.put("SPARK_GRAFT_MASTER", "local-cluster[2,4,2048]")
    env.put("SPARK_GRAFT_ONLY",
      "q70_cc_exact,q131_minhash_store,q145_bigram_surprisal," +
        "q235_storefuzz_tombstone,q241_streamfuzz_sdedup," +
        "q236_streamfuzz_ssession,q243_streamfuzz_squant")
    val p = pb.start()
    val finished = p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly()
    def tail = {
      val t = if (log.exists()) new String(Files.readAllBytes(log.toPath), "UTF-8") else ""
      t.takeRight(2000)
    }
    assert(finished, s"local-cluster Verify timed out; log tail:\n$tail")
    assert(p.exitValue() == 0, s"local-cluster Verify exited ${p.exitValue()}; log tail:\n$tail")
    val failures = new String(
      Files.readAllBytes(new File(out, "failures.json").toPath), "UTF-8").trim
    assert(failures == "{}", s"queries failed under local-cluster: $failures")
    for (q <- Seq("q70_cc_exact", "q131_minhash_store", "q145_bigram_surprisal",
        "q235_storefuzz_tombstone", "q241_streamfuzz_sdedup",
        "q236_streamfuzz_ssession", "q243_streamfuzz_squant")) {
      val dir = new File(out, q)
      assert(dir.isDirectory && dir.listFiles().exists(_.getName.endsWith(".parquet")),
        s"$q wrote no parquet under local-cluster")
    }
  }

  test("executor kill -9 mid-query: app survives, tasks retry, results identical to local[4]") {
    // The fault-tolerance receipt behind the 100 TB posture: at 1000
    // executors, executor loss is ROUTINE (spot reclaim, OOM kill, node
    // failure), and correctness rests on Spark's lineage recompute —
    // task retry on ExecutorLostFailure, stage resubmission on
    // FetchFailed for the dead executor's shuffle blocks, standalone
    // Master relaunching a replacement. local[n] structurally cannot
    // exercise any of that (the "executor" IS the driver). Here: kill
    // -9 a real executor JVM mid-q145 (the battery's heaviest shuffle,
    // at sf0.1 for a wide kill window), and require the battery to
    // finish green with output EQUAL to a local[4] run of the same
    // queries — loss, retry, and recompute must be invisible in the
    // results.
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new File(sparkHome, "jars").isDirectory,
      s"SPARK_HOME=$sparkHome has no jars/ — local-cluster cannot launch workers")
    val out = Files.createTempDirectory("graft_chaos").toFile
    val log = new File(out, "verify.log")
    val cmd = Seq(
      new File(System.getProperty("java.home"), "bin/java").getAbsolutePath) ++
      opens ++ Seq("-Xmx3g", "-cp", System.getProperty("java.class.path"),
        "graft.Verify", "/root/testdata/sf0.1", out.getAbsolutePath)
    val pb = new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(true)
    val env = pb.environment()
    env.put("SPARK_HOME", sparkHome)
    env.put("SPARK_SCALA_VERSION", "2.13")
    env.put("SPARK_GRAFT_MASTER", "local-cluster[2,4,2048]")
    env.put("SPARK_GRAFT_ONLY", "q70_cc_exact,q145_bigram_surprisal")
    val p = pb.start()
    def tail = {
      val t = if (log.exists()) new String(Files.readAllBytes(log.toPath), "UTF-8") else ""
      t.takeRight(3000)
    }
    def logText =
      if (log.exists()) new String(Files.readAllBytes(log.toPath), "UTF-8") else ""
    try {
      // arm on q145's progress marker: the kill lands ~0.5 s into its
      // first stages (tokenize + pair shuffle write), while the doomed
      // executor holds live tasks and freshly written shuffle blocks
      val deadline = System.currentTimeMillis() + 300000
      while (!logText.contains("running q145_bigram_surprisal") &&
             System.currentTimeMillis() < deadline && p.isAlive)
        Thread.sleep(100)
      assert(logText.contains("running q145_bigram_surprisal"),
        s"q145 never started; log tail:\n$tail")
      Thread.sleep(500)
      val executors = new File("/proc").listFiles()
        .filter(f => f.getName.forall(_.isDigit))
        .filter { d =>
          try new String(Files.readAllBytes(
            new File(d, "cmdline").toPath), "UTF-8")
            .contains("CoarseGrainedExecutorBackend")
          catch { case _: Exception => false }
        }
      assert(executors.nonEmpty, s"no executor JVMs found to kill; log tail:\n$tail")
      new ProcessBuilder("kill", "-9", executors.head.getName).start().waitFor()
    } catch { case e: Throwable => p.destroyForcibly(); throw e }
    val finished = p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly()
    assert(finished, s"chaos Verify timed out; log tail:\n$tail")
    assert(p.exitValue() == 0, s"chaos Verify exited ${p.exitValue()}; log tail:\n$tail")
    val full = logText
    assert(Seq("Lost executor", "ExecutorLostFailure", "FetchFailed",
               "Executor app-").exists(full.contains),
      s"the kill left no executor-loss trace — it missed the app; log tail:\n$tail")
    val failures = new String(
      Files.readAllBytes(new File(out, "failures.json").toPath), "UTF-8").trim
    assert(failures == "{}", s"queries failed after executor kill: $failures")
    // ground truth: the same queries on an in-JVM local[4] session —
    // recompute-after-loss must produce the SAME rows, not merely rows
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    for (q <- Seq("q70_cc_exact", "q145_bigram_surprisal")) {
      val got = spark.read.parquet(new File(out, q).getAbsolutePath)
        .collect().map(_.toString).sorted
      val want = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .collect().map(_.toString).sorted
      assert(got.length == want.length,
        s"$q: ${got.length} rows after kill vs ${want.length} expected")
      assert(got.sameElements(want), s"$q rows differ after executor kill")
    }
  }

  test("executor kill -9 mid-CC-loop: reliable checkpoints make the iterative loop loss-tolerant") {
    // The sharpest chaos case: an ITERATIVE operator whose lineage is
    // deliberately truncated every round. With localCheckpoint (the
    // single-node fast path) an executor death mid-loop is
    // UNRECOVERABLE — blocks gone, lineage cut. With a checkpoint dir
    // set (the production posture this receipt exercises), rounds
    // checkpoint reliably to shared storage, so the kill costs a task
    // retry + re-read, never the job. Trigger: poll the checkpoint dir
    // and kill as soon as the first round's rdd-* files land — the
    // loop is provably mid-flight, with ~15 rounds still to run on the
    // surviving + replacement executors.
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new File(sparkHome, "jars").isDirectory,
      s"SPARK_HOME=$sparkHome has no jars/ — local-cluster cannot launch workers")
    val base = Files.createTempDirectory("graft_chaos_cc").toFile
    val ckpt = new File(base, "ckpt"); ckpt.mkdirs()
    val log = new File(base, "worker.log")
    val cmd = Seq(
      new File(System.getProperty("java.home"), "bin/java").getAbsolutePath) ++
      opens ++ Seq("-Xmx3g", "-cp", System.getProperty("java.class.path"),
        "graft.ChaosCcWorker", ckpt.getAbsolutePath, "50000")
    val pb = new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(true)
    pb.environment().put("SPARK_HOME", sparkHome)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val p = pb.start()
    def logText =
      if (log.exists()) new String(Files.readAllBytes(log.toPath), "UTF-8") else ""
    def tail = logText.takeRight(3000)
    try {
      def hasRddDir: Boolean = {
        val it = Files.walk(ckpt.toPath).iterator()
        var found = false
        while (!found && it.hasNext)
          found = it.next().getFileName.toString.startsWith("rdd-")
        found
      }
      val deadline = System.currentTimeMillis() + 300000
      while (!hasRddDir && System.currentTimeMillis() < deadline && p.isAlive)
        Thread.sleep(100)
      assert(hasRddDir, s"no checkpoint files ever appeared; log tail:\n$tail")
      val executors = new File("/proc").listFiles()
        .filter(f => f.getName.forall(_.isDigit))
        .filter { d =>
          try new String(Files.readAllBytes(
            new File(d, "cmdline").toPath), "UTF-8")
            .contains("CoarseGrainedExecutorBackend")
          catch { case _: Exception => false }
        }
      assert(executors.nonEmpty, s"no executor JVMs found to kill; log tail:\n$tail")
      new ProcessBuilder("kill", "-9", executors.head.getName).start().waitFor()
    } catch { case e: Throwable => p.destroyForcibly(); throw e }
    val finished = p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly()
    assert(finished, s"chaos CC worker timed out; log tail:\n$tail")
    assert(p.exitValue() == 0, s"chaos CC worker exited ${p.exitValue()}; log tail:\n$tail")
    val full = logText
    assert(full.contains("Lost executor"),
      s"the kill left no executor-loss trace — it missed the app; log tail:\n$tail")
    val done = "CC_DONE rounds=(\\d+) total=(\\d+) bad=(\\d+)".r
      .findFirstMatchIn(full)
    assert(done.isDefined, s"no CC_DONE receipt; log tail:\n$tail")
    assert(done.get.group(2) == "50001" && done.get.group(3) == "0",
      s"CC mislabeled after executor kill: ${done.get.matched}")
  }
}
