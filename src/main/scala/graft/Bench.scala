package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Per-query task-level counters, filled by [[BenchListener]]. Separates
  * real plan regressions from driver-container contention: a query whose
  * wall time doubles while executorRunTime and task count are flat was
  * starved by the host, not re-planned. */
final class BenchListener extends SparkListener {
  val executorRunTimeMs = new AtomicLong(0)
  val jvmGcTimeMs = new AtomicLong(0)
  val executorCpuTimeMs = new AtomicLong(0)
  val tasks = new AtomicLong(0)
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      executorRunTimeMs.addAndGet(m.executorRunTime)
      jvmGcTimeMs.addAndGet(m.jvmGCTime)
      executorCpuTimeMs.addAndGet(m.executorCpuTime / 1000000L)
      tasks.incrementAndGet()
    }
  }
  def snapshot: (Long, Long, Long, Long) =
    (executorRunTimeMs.get, jvmGcTimeMs.get, executorCpuTimeMs.get, tasks.get)
  /** Listener events are posted asynchronously; poll until the counters
    * go quiet so each query's delta is attributed to that query. */
  def quiesce(): (Long, Long, Long, Long) = {
    var prev = snapshot
    var stable = 0
    while (stable < 2) {
      Thread.sleep(50)
      val cur = snapshot
      if (cur == prev) stable += 1 else { stable = 0; prev = cur }
    }
    prev
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new BenchListener
    spark.sparkContext.addSparkListener(listener)
    // untimed engine warm-up (JIT, codegen compiler, Hadoop FS + parquet
    // reader init) — measured queries then reflect steady-state
    // throughput, which is what a resident server delivers
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // SPARK_GRAFT_ONLY=q49_...,q26_... runs a subset, first-in-process —
    // the isolation harness for drift investigations (PLANS.md receipts)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      val before = listener.quiesce()
      val t0 = System.nanoTime()
      // toRdd.count() materializes EVERY output column of every result
      // row (a plain df.count() would let Spark prune the projection)
      try { fn(spark, sfDir).queryExecution.toRdd.count() } catch { case _: Throwable => -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      val after = listener.quiesce()
      name -> (wall,
        after._1 - before._1, after._2 - before._2,
        after._3 - before._3, after._4 - before._4)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val ms = results.map { case (k, (_, run, gc, cpu, n)) =>
      s"\"$k\":{\"executorRunTimeMs\":$run,\"jvmGcTimeMs\":$gc,\"executorCpuTimeMs\":$cpu,\"tasks\":$n}"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"taskMetrics":$ms,"sf":"$sfDir"}""")
    spark.stop()
  }
}
