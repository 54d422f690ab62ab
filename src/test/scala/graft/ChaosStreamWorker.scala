package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Streaming-restart chaos worker (forked by StreamRestartSpec): run one
  * of the epoch-fenced MV maintenance streams over a staged file source
  * with `Trigger.AvailableNow`, then print the store's merged view. The
  * spec runs this TWICE against one shared checkpoint + store: the
  * first incarnation is kill -9'd the moment its first epoch part lands
  * (racing the checkpoint commit write — the classic crash window), the
  * second resumes from the offset log, replays any uncommitted epoch
  * (exactly-once via the store's epoch-addressed overwrite), drains the
  * remaining files, and prints
  *
  *   STREAM_DONE totals=...
  *
  * which the spec checks against the staged ground truth EXACTLY — a
  * real process death between a part write and its commit must cost
  * nothing and double nothing.
  *
  * Modes (args(1), default "summing") cover the three epoch-fenced MV
  * paths, which share the fence machinery but distinct part formats and
  * merge algebras:
  *   summing  — maintainSummingParts  → readSummed  (k:sum per key)
  *   quantile — maintainQuantileParts → readQuantiles (k:p25:p75)
  *   kll      — maintainKllParts      → readKllQuantiles (k:p25:p75)
  */
object ChaosStreamWorker {
  def main(args: Array[String]): Unit = {
    val shared = args(0)
    val mode = if (args.length > 1) args(1) else "summing"
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
    val store = s"$shared/store"
    val ckpt = s"$shared/ckpt"
    val q = mode match {
      case "summing" =>
        graft.streaming.StreamingIngest.maintainSummingParts(
          events, Seq("k"), Seq("v"), store, ckpt, Trigger.AvailableNow())
      case "quantile" =>
        graft.streaming.StreamingIngest.maintainQuantileParts(
          events, Seq("k"), "v", store, ckpt, scale = 100, Trigger.AvailableNow())
      case "kll" =>
        graft.streaming.StreamingIngest.maintainKllParts(
          events, Seq("k"), "v", store, ckpt, k = 200, Trigger.AvailableNow())
      case other => sys.error(s"unknown mode: $other")
    }
    q.awaitTermination()
    val totals = mode match {
      case "summing" =>
        graft.store.MergeStore
          .readSummed(spark, store, Seq("k"), Seq("v"))
          .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").sorted.mkString(",")
      case "quantile" =>
        graft.store.MergeStore
          .readQuantiles(spark, store, Seq("k"), Seq(0.25, 0.75), scale = 100)
          .collect().map(r => s"${r.get(0)}:${r.get(1)}:${r.get(2)}")
          .sorted.mkString(",")
      case "kll" =>
        // output schema: (k, n_rows, p25, p75) — n_rows doubles as the
        // double-merge detector (a replayed epoch merged twice shows up
        // as n_rows = 400 before it moves any percentile)
        graft.store.MergeStore
          .readKllQuantiles(spark, store, Seq("k"), Seq(0.25, 0.75), k = 200)
          .collect().map(r => s"${r.get(0)}:${r.get(1)}:${r.get(2)}:${r.get(3)}")
          .sorted.mkString(",")
    }
    println(s"STREAM_DONE totals=$totals")
    Console.flush()
    spark.stop()
  }
}
