package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Streaming-restart chaos worker (forked by StreamRestartSpec): run the
  * summing-MV maintenance stream (`StreamingIngest.maintainSummingParts`)
  * over a staged file source with `Trigger.AvailableNow`, then print the
  * store's merged totals. The spec runs this TWICE against one shared
  * checkpoint + store: the first incarnation is kill -9'd the moment its
  * first epoch part lands (racing the checkpoint commit write — the
  * classic crash window), the second resumes from the offset log,
  * replays any uncommitted epoch (exactly-once via the store's
  * epoch-addressed overwrite), drains the remaining files, and prints
  *
  *   STREAM_DONE totals=k0:v0,k1:v1,...
  *
  * which the spec checks against the staged ground truth EXACTLY — a
  * real process death between a part write and its commit must cost
  * nothing and double nothing.
  */
object ChaosStreamWorker {
  def main(args: Array[String]): Unit = {
    val shared = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.readStream
      .schema("k LONG, v LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$shared/in")
    val q = graft.streaming.StreamingIngest.maintainSummingParts(
      events, Seq("k"), Seq("v"),
      s"$shared/store", s"$shared/ckpt", Trigger.AvailableNow())
    q.awaitTermination()
    val totals = graft.store.MergeStore
      .readSummed(spark, s"$shared/store", Seq("k"), Seq("v"))
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").sorted.mkString(",")
    println(s"STREAM_DONE totals=$totals")
    Console.flush()
    spark.stop()
  }
}
