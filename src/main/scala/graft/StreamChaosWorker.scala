package graft

import org.apache.spark.sql.SparkSession

/** One incarnation of a fuzzed streaming run, for the restart-chaos
  * harness ([[StreamChaosSweep]] / StreamFuzzChaosSpec): builds a
  * session, re-derives the seed's [[StreamFuzz.Plan]], and runs its
  * `start` phase against an already-staged base dir whose checkpoint
  * may belong to a PREVIOUS incarnation that was kill -9'd mid-stream —
  * the file source resumes from the offset log and the sinks' delivery
  * contracts (file-sink metadata log, epoch-addressed MV overwrites,
  * state-store versions) must absorb the replayed micro-batch. Prints
  * `CHAOS_DONE` only when the drained stream terminates cleanly.
  *
  * args: <seed> <baseDir>
  */
object StreamChaosWorker {
  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val base = new java.io.File(args(1))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (plan, _) = StreamFuzz.plans(seed)
    val q = plan.start(spark, base)
    q.awaitTermination()
    println("CHAOS_DONE")
    Console.flush()
    spark.stop()
  }
}
