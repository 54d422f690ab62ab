package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-profiler for the bounded-stream query rows (VERDICT
  * r21 item 7: q149/q237/q242/q243 flagged): decomposes one row's wall
  * into stage-input / stream-run / post-read, and prints every
  * micro-batch's durationMs map from StreamingQueryProgress. Not part
  * of the library surface; results recorded in OPTIMIZATION_r22.md. */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt

    (1 to reps).foreach { rep =>
      val base = new java.io.File(
        s"/tmp/graft_profstream_${ProcessHandle.current().pid()}_$rep")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
      }
      rm(base)
      val inDir = new java.io.File(base, "in"); inDir.mkdirs()
      val t0 = System.nanoTime()
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"))
      val now = System.currentTimeMillis()
      def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new java.io.File(base, s"stage_$name")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = tmp.listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dest = new java.io.File(inDir, name)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(mtime); ()
      }
      stage(ev.filter(col("event_id") % 2 === 0), "000_even.parquet", now - 120000)
      stage(ev.filter(col("event_id") % 2 === 1), "001_odd.parquet", now - 60000)
      val t1 = System.nanoTime()
      val store = new java.io.File(base, "store").toString
      var progress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = Array()
      graft.streaming.StreamTuning.withStateParts(spark, inDir) {
        val stream = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
          .drop("event_id")
        val q = graft.streaming.StreamingIngest.maintainQuantileParts(
          stream, Seq("event_type"), "value", store,
          new java.io.File(base, "ckpt").toString, scale = 100,
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
        progress = q.recentProgress
      }
      val t2 = System.nanoTime()
      val out = graft.store.MergeStore.readQuantiles(spark, store, Seq("event_type"),
          Seq(0.5, 0.95), scale = 100)
        .orderBy("event_type")
      out.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[prof] rep$rep stage ${(t1 - t0) / 1e9}%6.2f s  stream ${(t2 - t1) / 1e9}%6.2f s  read ${(t3 - t2) / 1e9}%6.2f s  total ${(t3 - t0) / 1e9}%6.2f s")
      progress.foreach { p =>
        println(s"[prof]   batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
      rm(base)
    }
    spark.stop()
  }
}
