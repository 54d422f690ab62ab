package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.atomic.AtomicLong

/** Scale-slope harness for the STREAMING operator family — the last
  * heavy family without a two-decade receipt (VERDICT r16 item 2). Runs
  * the five streaming battery rows (windowed MV, interval join,
  * session windows, summing MV, quantile MV — all AvailableNow
  * micro-batch pipelines staged from parquet) against
  * `SPARK_GRAFT_SF_DIR`, and reports per row: wall, executor cpu,
  * shuffle bytes, spill, and the STATE STORE'S high-water marks
  * (rows/bytes from StreamingQueryProgress.stateOperators) — watermark
  * state growth and session-merge cost are exactly the scale-killers a
  * small fixture hides, and state size is the number that decides
  * whether a 100× stream still fits executor memory.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.StreamScaleBench"
  *   SPARK_GRAFT_SF_DIR=/tmp/scale100      sbt "runMain graft.StreamScaleBench"
  */
object StreamScaleBench {
  private val rows = Vector(
    "q69_streaming_mv",
    "q118_interval_join_stream",
    "q139_streaming_sessions",
    "q142_streaming_summing_mv",
    "q149_streaming_quantile_mv")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.SessionDefaults.ExtensionsKey,
        graft.core.SessionDefaults.ExtensionsClass)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new BenchListener
    spark.sparkContext.addSparkListener(listener)

    // state high-water marks, reset per battery row (rows run
    // sequentially, so the marks attribute cleanly)
    val stateRowsMax = new AtomicLong(0)
    val stateBytesMax = new AtomicLong(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) {
          val r = ops.map(_.numRowsTotal).sum
          val b = ops.map(_.memoryUsedBytes).sum
          stateRowsMax.accumulateAndGet(r, Math.max(_, _))
          stateBytesMax.accumulateAndGet(b, Math.max(_, _))
        }
      }
    })

    // warm-up, untimed (JIT + parquet reader init)
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val out = rows.map { name =>
      stateRowsMax.set(0); stateBytesMax.set(0)
      val before = listener.quiesce()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val after = listener.quiesce()
      def d(i: Int) = after.productElement(i).asInstanceOf[Long] -
        before.productElement(i).asInstanceOf[Long]
      f""""$name":{"wall_s":$wall%.1f,"cpu_s":${d(2) / 1000.0}%.1f,""" +
        s""""shuffle_mb":${d(4) / 1000000},"spill_mem_mb":${d(5) / 1000000},""" +
        s""""spill_disk_mb":${d(6) / 1000000},"state_rows_max":${stateRowsMax.get},""" +
        s""""state_mb_max":${stateBytesMax.get / 1000000},"out_rows":$n}"""
    }
    println(out.mkString(s"""{"sf":"$sfDir","rows":{""", ",", "}}"))
    spark.stop()
  }
}
