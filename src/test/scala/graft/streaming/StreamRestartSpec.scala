package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.Files

/** Cross-process streaming restart receipt (the durability half of the
  * exactly-once claim): the in-suite tests pin the ALGEBRA (replaying a
  * committed epoch changes nothing, the fence fails fresh-checkpoint
  * replays loudly) — this spec pins the DEPLOYMENT reality they model:
  * a worker JVM maintaining an epoch-fenced MV is kill -9'd the moment
  * its first epoch part lands (racing the checkpoint commit — the
  * classic crash window between a part write and the offset-log
  * commit), and a second JVM resuming the SAME checkpoint must drain
  * the backlog and land EXACTLY the staged ground truth: the
  * interrupted epoch either replays onto its own path (overwrite, not
  * double-count) or was committed and is skipped — both end at the
  * same bytes.
  *
  * All THREE epoch-fenced MV paths get the kill: summing, quantile
  * (histogram bins), and KLL (sketch parts). They share the fence
  * machinery but have distinct part formats and merge algebras — and
  * KLL union is NOT idempotent (a double-merged epoch double-weights
  * its rows), so its only protection is the epoch addressing this spec
  * crashes into.
  *
  * Real subprocesses for the same reason as SeamSpec: a checkpoint
  * resume after SIGKILL is only meaningful when the first query's JVM
  * actually died mid-flight. */
class StreamRestartSpec extends AnyFunSuite {

  private val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def worker(shared: String, mode: String, log: File): Process = {
    val cmd = (Seq(
      new File(System.getProperty("java.home"), "bin/java").getAbsolutePath) ++
      opens ++ Seq("-Xmx2g", "-cp", System.getProperty("java.class.path"),
        "graft.ChaosStreamWorker", shared, mode))
    new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(true).start()
  }

  private def text(f: File): String =
    if (f.exists()) new String(Files.readAllBytes(f.toPath), "UTF-8") else ""

  /** Stage 6 single-row-group parquet files (file i: 100 rows of
    * (k = i % 3, v = i + 1)), kill incarnation 1 the moment its first
    * epoch part lands, resume incarnation 2 on the same checkpoint,
    * assert the merged view equals `expected` exactly. Ground truth is
    * closed-form, independent of which epoch boundary the kill lands
    * on: per key the value multiset is {100 × (k+1), 100 × (k+4)}. */
  private def runKillRestart(mode: String, expected: String): Unit = {
    val shared = Files.createTempDirectory(s"graft-stream-restart-$mode").toString
    val inDir = new File(shared, "in"); inDir.mkdirs()
    val store = new File(shared, "store")

    // Written via a scratch SparkSession in THIS JVM (suites run
    // sequentially; the session is shared-or-created and left for the
    // next suite, the repo's standard fixture pattern).
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import org.apache.spark.sql.functions.lit
    for (i <- 0 until 6) {
      val tmp = new File(shared, s"stage_$i")
      spark.range(100).select(lit((i % 3).toLong).as("k"), lit((i + 1).toLong).as("v"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new File(inDir, f"f$i%02d.parquet").toPath)
    }

    // incarnation 1: kill -9 the instant the first epoch part lands —
    // at that moment the offset-log commit for the epoch is in flight
    // or not yet written, the exact window the epoch-addressed
    // overwrite exists for
    val log1 = new File(shared, "w1.log")
    val w1 = worker(shared, mode, log1)
    val deadline = System.currentTimeMillis() + 180000
    def hasEpochPart: Boolean =
      store.isDirectory && store.listFiles().exists(_.getName.startsWith("epoch="))
    while (!hasEpochPart && System.currentTimeMillis() < deadline && w1.isAlive)
      Thread.sleep(25)
    assert(hasEpochPart, s"no epoch part ever appeared: ${text(log1).takeRight(2000)}")
    w1.destroyForcibly()
    assert({ w1.waitFor(30, java.util.concurrent.TimeUnit.SECONDS); !w1.isAlive },
      "kill -9 did not take")
    assert(!text(log1).contains("STREAM_DONE"),
      s"worker 1 must die mid-stream, not finish: ${text(log1).takeRight(500)}")

    // incarnation 2: same checkpoint, same store — resume, drain, report
    val log2 = new File(shared, "w2.log")
    val w2 = worker(shared, mode, log2)
    assert(w2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      s"restarted worker timed out: ${text(log2).takeRight(2000)}")
    assert(w2.exitValue() == 0,
      s"restarted worker exited ${w2.exitValue()}: ${text(log2).takeRight(2000)}")
    val done = "STREAM_DONE totals=(\\S+)".r.findFirstMatchIn(text(log2))
    assert(done.isDefined, s"no STREAM_DONE receipt: ${text(log2).takeRight(1000)}")
    assert(done.get.group(1) == expected,
      s"$mode totals after kill+restart must be exact: ${done.get.matched}")
  }

  test("summing MV: kill -9 between epoch part and commit, restart lands exact totals") {
    // k=0: files 0,3 -> 100*(1+4) = 500; k=1 -> 700; k=2 -> 900
    runKillRestart("summing", "0:500,1:700,2:900")
  }

  test("quantile MV: kill -9 between epoch part and commit, restart lands exact percentiles") {
    // per key values {100 x (k+1), 100 x (k+4)}: p25 = k+1, p75 = k+4
    runKillRestart("quantile", "0:1.0:4.0,1:2.0:5.0,2:3.0:6.0")
  }

  test("KLL MV: kill -9 between epoch part and commit, restart lands exact percentiles") {
    // 200 values/key fit inside a k=200 KLL exactly; n_rows = 200 is
    // the double-merge detector (a replayed epoch merged twice would
    // show 300/400 before it moved any percentile)
    runKillRestart("kll", "0:200:1.0:4.0,1:200:2.0:5.0,2:200:3.0:6.0")
  }
}
