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

  test("q70/q131/q145 run green under local-cluster (real executor JVMs)") {
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
    env.put("SPARK_GRAFT_MASTER", "local-cluster[2,4,2048]")
    env.put("SPARK_GRAFT_ONLY",
      "q70_cc_exact,q131_minhash_store,q145_bigram_surprisal")
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
    for (q <- Seq("q70_cc_exact", "q131_minhash_store", "q145_bigram_surprisal")) {
      val dir = new File(out, q)
      assert(dir.isDirectory && dir.listFiles().exists(_.getName.endsWith(".parquet")),
        s"$q wrote no parquet under local-cluster")
    }
  }
}
