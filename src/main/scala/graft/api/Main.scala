package graft.api

import graft.engine.QueryExecutor
import graft.store.{IngestService, Spool, SpoolConfig, TableCatalog}
import org.apache.spark.sql.SparkSession

/** Boot the full engine: SparkSession + catalog + spool + HTTP API.
  * Reproduces the reference quickstart (readme.md:33-49): insert JSON,
  * query it back as a JSON array.
  *
  *   sbt "runMain graft.api.Main"   # PORT, GRAFT_DATA, GRAFT_API_KEY env
  */
object Main {
  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("PORT", "8080").toInt
    val dataDir = sys.env.getOrElse("GRAFT_DATA", "/tmp/graft-data")
    val apiKey = sys.env.getOrElse("GRAFT_API_KEY", "local")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scratchdbspark")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val catalog = new TableCatalog(s"$dataDir/tables")
    val ingest = new IngestService(spark, catalog)
    // rotation: 1s age for snappy local queryability (reference default
    // thresholds are deploy-config, filesystem.go:30-33)
    val spool = new Spool(s"$dataDir/spool",
      SpoolConfig(maxAgeSeconds = 1, rotatePeriodMillis = 500),
      f => {
        val table = f.getParentFile.getName
        val db = f.getParentFile.getParentFile.getName
        try ingest.ingestFile(db, table, f)
        catch { case e: Exception => System.err.println(s"[ingest] ${f.getName}: ${e.getMessage}") }
      })
    val executor = new QueryExecutor(spark, catalog)
    val server = new Server(ServerConfig(port, Map(apiKey -> "1"), sys.env.get("GRAFT_ADMIN_KEY")),
      catalog, ingest, spool, executor)
    val boundPort = server.start()
    println(s"scratchdbspark listening on :$boundPort (data: $dataDir)")
    Thread.currentThread().join()
  }
}
