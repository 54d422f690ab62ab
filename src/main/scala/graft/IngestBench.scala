package graft

import graft.store.{IngestService, TableCatalog}
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Ingest-throughput micro-bench: flatten -> infer -> evolve -> aligned
  * parquet append, end to end, printing one JSON line (rows/sec). The
  * batch is parsed exactly ONCE per append (round 1 re-executed it for a
  * discarded count — this bench is the regression guard). */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("GRAFT_INGEST_ROWS", "200000").toInt
    val batches = sys.env.getOrElse("GRAFT_INGEST_BATCHES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("graft-ingest-bench").toString
    val catalog = new TableCatalog(base)
    val ingest = new IngestService(spark, catalog)
    val perBatch = rows / batches
    // representative mixed-type rows (nested object flattened upstream)
    def line(i: Int) =
      s"""{"user":"u${i % 997}","event":"e${i % 13}","value":${i % 1000}.25,"ok":${i % 2 == 0},"__row_id":$i}"""
    // warm-up batch (session + codegen)
    ingest.ingestLines("1", "warm", (1 to 1000).map(line))
    val t0 = System.nanoTime()
    val batchSec = (0 until batches).map { b =>
      val lines = (0 until perBatch).map(i => line(b * perBatch + i))
      val s0 = System.nanoTime()
      ingest.ingestLines("1", "bench", lines)
      (System.nanoTime() - s0) / 1e9
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val n = catalog.read(spark, "1", "bench").count()
    require(n == (perBatch.toLong * batches), s"row loss: $n")
    // type-1 percentiles over the per-batch walls — the regression
    // signal the total hides (one straggler batch vs uniform slowdown)
    val sorted = batchSec.sorted
    def p(q: Double) = sorted((q * batches).ceil.toInt.min(batches) - 1)
    val json =
      f"""{"metric":"ingest_rows_per_sec","value":${n / sec}%.0f,"rows":$n,"sec":$sec%.2f,"batches":$batches,"batch_p50_sec":${p(0.5)}%.3f,"batch_p95_sec":${p(0.95)}%.3f}"""
    println(json)
    sys.env.get("GRAFT_INGEST_OUT").foreach { f =>
      Files.write(java.nio.file.Paths.get(f), json.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
