package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-batch cost probe (optimization-round harness, not part
  * of the library surface): runs a q118-shaped stream-stream interval
  * join (and a q236-shaped session window) over the sf events table and
  * prints each micro-batch's durationMs breakdown + state-store op
  * times from the StreamingQueryProgress — the receipt that says where
  * streaming wall actually goes (task compute vs state commit vs WAL).
  *
  * PROBE_PARTS sets spark.sql.shuffle.partitions (state partitions).
  * PROBE_KIND=join|session picks the family. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("PROBE_PARTS", cpus)
    val kind = sys.env.getOrElse("PROBE_KIND", "join")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = new java.io.File(s"/tmp/graft_probe_${ProcessHandle.current().pid()}")
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); () }
    rm(base)
    val inDir = new java.io.File(base, "in"); inDir.mkdirs()
    val ev = Queries.normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = new java.io.File(base, s"stage_$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.listFiles().find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(inDir, name)
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime); ()
    }
    val now = System.currentTimeMillis()
    stage(ev, "000_events.parquet", now - 120000)
    val st = new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000)
    stage(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(st, -1L, -1L, "view"),
        org.apache.spark.sql.Row(st, -2L, -1L, "click")), ev.schema),
      "001_sentinel.parquet", now - 60000)
    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
    val out =
      if (kind == "session")
        graft.streaming.StreamingIngest.sessionCounts(
          stream.select(col("ts"), col("user_id")), "ts", "user_id", "30 minutes", "1 minute")
      else {
        def side(tpe: String, idAs: String, tsAs: String) =
          stream.filter(col("event_type") === tpe)
            .select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
        graft.streaming.StreamingIngest.intervalJoin(
          side("view", "left_id", "left_ts"), side("click", "right_id", "right_ts"),
          "user_id", "left_ts", "right_ts",
          watermark = "1 hour", before = "0 minutes", after = "60 minutes")
          .select(col("left_id"), col("user_id"), col("right_id"))
      }
    val sq = out.writeStream.format("parquet")
      .option("path", new java.io.File(base, "out").toString)
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    sq.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"stream wall (start->termination): $wall%.2f s  parts=$parts kind=$kind")
    sq.recentProgress.foreach { p =>
      println(s"batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}")
      p.stateOperators.foreach { so =>
        println(s"  state: commitTimeMs=${so.commitTimeMs} rowsTotal=${so.numRowsTotal} " +
          s"mem=${so.memoryUsedBytes} custom=${so.customMetrics}")
      }
    }
    rm(base)
    spark.stop()
  }
}
