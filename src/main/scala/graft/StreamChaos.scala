package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Restart-chaos machinery over the [[StreamFuzz.Plan]] decomposition:
  * stage a seed's inputs once, run the streaming query in a WORKER JVM
  * that gets kill -9'd the moment its first durable output lands
  * (racing the checkpoint commit — the classic crash window between a
  * sink/part write and the offset-log commit), then run a second
  * worker on the SAME base dir: the file source resumes from the
  * offset log and the delivery contracts under test (file-sink
  * metadata log for the parquet-sink families, epoch-addressed
  * overwrite for the MV and sdedup families, state-store versioning
  * for sessions/windows/join/dedup state) must converge to exactly the
  * clean-run result — verified by [[StreamChaosSweep]] against the
  * DuckDB oracle and by StreamFuzzChaosSpec against an in-process
  * clean run.
  *
  * This is the r18 fixed-point chaos ([[ChaosStreamWorker]] /
  * StreamRestartSpec — 6 hand-staged files, fixed summing/quantile/KLL
  * shapes) generalized to SEED-DRAWN parameter points across the whole
  * streaming fuzz grammar: gap/window/join bounds, key shapes, epoch
  * splits and late-data staging all vary per seed.
  */
object StreamChaos {

  private[graft] val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def forkWorker(seed: Long, base: File, log: File): Process = {
    val cmd = (Seq(
      new File(System.getProperty("java.home"), "bin/java").getAbsolutePath) ++
      opens ++ Seq("-Xmx2g", "-cp", System.getProperty("java.class.path"),
        "graft.StreamChaosWorker", seed.toString, base.getAbsolutePath))
    new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(true).start()
  }

  /** First DURABLE output file of the run: a parquet part under
    * `base/out` or `base/store` (never `in/` — staged inputs — or the
    * checkpoint). Its appearance means the worker is mid-write or
    * between a part write and the corresponding commit record. */
  private def firstOutput(base: File): Option[File] = {
    def walk(f: File): Iterator[File] =
      if (f.isDirectory) Option(f.listFiles()).iterator.flatten.flatMap(walk)
      else Iterator.single(f)
    Seq(new File(base, "out"), new File(base, "store")).iterator
      .filter(_.exists())
      .flatMap(walk)
      .find(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
  }

  final case class PointResult(seed: Long, family: String, params: String,
                               killedMidFlight: Boolean, timedOut: Boolean,
                               resumedClean: Boolean,
                               log1: String, log2: String)

  /** One chaos point: stage (driver session) → worker 1, kill -9 at
    * first output → worker 2 resumes the same checkpoint to completion.
    * The caller reads `plan.read(spark, base)` afterwards and compares
    * it to the oracle / a clean run. */
  def runPoint(spark: SparkSession, sfDir: String, seed: Long,
               base: File): (StreamFuzz.Plan, PointResult) = {
    val (plan, _) = StreamFuzz.plans(seed)
    base.mkdirs()
    plan.stage(spark, sfDir, base)
    val log1 = new File(base, "worker1.log")
    val log2 = new File(base, "worker2.log")
    val w1 = forkWorker(seed, base, log1)
    val deadline = System.currentTimeMillis() + 180000
    while (w1.isAlive && firstOutput(base).isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(5)
    // three exits: worker drained (no kill), first output observed
    // (kill lands genuinely mid-flight, in the write/commit window), or
    // deadline with the worker alive but NO durable output yet — that
    // last one is a kill-before-any-output, not a mid-flight kill, and
    // is reported as timedOut so the receipt never over-claims
    // (ADVICE r19).
    val sawOutput = firstOutput(base).isDefined
    val killedMidFlight = w1.isAlive && sawOutput
    val timedOut = w1.isAlive && !sawOutput
    if (w1.isAlive) { w1.destroyForcibly(); w1.waitFor() }
    val w2 = forkWorker(seed, base, log2)
    val finished = w2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) w2.destroyForcibly()
    val resumedClean = finished && w2.exitValue() == 0 &&
      text(log2).contains("CHAOS_DONE")
    (plan, PointResult(seed, plan.family, plan.params, killedMidFlight,
      timedOut, resumedClean, text(log1).takeRight(400), text(log2).takeRight(400)))
  }

  private def text(f: File): String =
    if (f.exists()) new String(Files.readAllBytes(f.toPath), "UTF-8") else ""
}
