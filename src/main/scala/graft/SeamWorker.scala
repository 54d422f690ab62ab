package graft

import java.io.File
import org.apache.spark.sql.SparkSession
import graft.store._

/** Two-process ingest-seam harness (PLANS.md receipt; deployment shape
  * of reference workers.go:27-116 — API nodes upload closed spool files
  * to a shared blob store, a separate pool of insert workers claims and
  * ingests them).
  *
  *   produce <shared> <nBatches> <rowsPerBatch>
  *     spools nBatches×rowsPerBatch NDJSON rows for table `seam` and
  *     moves every CLOSED file into the shared LocalBlobStore — no
  *     ingest in this JVM (the producer owns no SparkSession at all).
  *
  *   consume <shared> <tag>
  *     boots Spark, sweeps the blob store under a shared
  *     [[FileLeaseQueue]] (3 s TTL, heartbeat-renewed at TTL/3 by the
  *     Uploader), claim→fetch→ingest→delete per batch, one receipt
  *     line per event: `CLAIMED/INGESTED <file> by <tag>`. Exits when
  *     `<shared>/stop` exists and the store is drained, printing
  *     `DONE <tag> rows=<table count>`.
  *
  * The kill+steal receipt: run TWO consumers, one with SEAM_SLEEP_MS
  * set so its first batch is slow; `kill -9` it between its CLAIMED
  * and INGESTED lines. Its lease stops renewing, expires after the
  * TTL, and the survivor re-claims and re-ingests the SAME batch —
  * at-least-once delivery with exactly-once EFFECT, because the spool
  * filename is the catalog batch-dir idempotency key (a re-ingest
  * overwrites the dead worker's partial batch dir, never duplicates
  * it). Final receipt: `rows` equals nBatches×rowsPerBatch exactly.
  *
  * Blob store + claim queue come from the SAME env contract the
  * production boot uses ([[graft.api.Main.storesFromEnv]]) — so the
  * object-store deployment (GRAFT_BLOB_TYPE=hadoop over any FileSystem
  * URI, GRAFT_CLAIM_QUEUE=cas-s3: conditional-write claims; reference
  * class: S3 blobstore + SQS queue, pkg/storage/blobstore/s3 +
  * pkg/storage/queue/sqs) runs the identical kill+steal receipt with
  * zero harness code changes. Defaults reproduce the shared-POSIX
  * deployment: local blobs under `<shared>/blobs`, file leases under
  * `<shared>/leases`, 3 s TTL.
  */
object SeamWorker {
  /** Env-selected stores, defaulted to the shared-directory layout the
    * local receipt uses; real env vars override (cas-s3 claims, hadoop
    * blob URIs — see Main.storesFromEnv's key list). */
  private def stores(shared: String,
                     hadoopConf: => org.apache.hadoop.conf.Configuration)
      : (BlobStore, ClaimQueue) =
    graft.api.Main.storesFromEnv(
      Map("GRAFT_BLOB_ROOT" -> s"$shared/blobs",
          "GRAFT_CLAIM_QUEUE" -> s"file-lease:$shared/leases",
          "GRAFT_LEASE_TTL_MS" -> "3000") ++ sys.env,
      shared, hadoopConf)

  def main(args: Array[String]): Unit = {
    val role = args(0)
    val shared = args(1)
    role match {
      case "produce" =>
        val nBatches = args(2).toInt
        val rowsPerBatch = args(3).toInt
        // the producer owns no SparkSession: a plain Hadoop conf serves
        // the hadoop/s3 blob scheme (by-name — local never builds it)
        val (store, _) = stores(shared,
          new org.apache.hadoop.conf.Configuration())
        val spool = new Spool(
          s"$shared/spool-${ProcessHandle.current().pid()}",
          SpoolConfig(maxRows = rowsPerBatch, maxAgeSeconds = 3600,
            maxSizeBytes = Long.MaxValue, rotatePeriodMillis = 100),
          f => {
            val db = f.getParentFile.getParentFile.getName
            val table = f.getParentFile.getName
            store.put(s"$db/$table/${f.getName}", f)
            println(s"UPLOADED ${f.getName}")
          })
        var id = 0L
        (1 to nBatches).foreach { b =>
          (1 to rowsPerBatch).foreach { _ =>
            id += 1
            spool.writeData("1", "seam", s"""{"id": $id, "batch": $b}""")
          }
        }
        spool.shutdown() // flush closes the open file -> final upload
        println(s"PRODUCED batches=$nBatches rows=$id")

      case "consume" =>
        val tag = args(2)
        val sleepMs = sys.env.getOrElse("SEAM_SLEEP_MS", "0").toLong
        val spark = SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val catalog = new TableCatalog(s"$shared/tables")
        val ingest = new IngestService(spark, catalog)
        val (store, claims) = stores(shared, spark.sparkContext.hadoopConfiguration)
        val up = new Uploader(store, (db, table, f) => {
          println(s"CLAIMED ${f.getName} by $tag"); Console.flush()
          if (sleepMs > 0) Thread.sleep(sleepMs)
          val n = ingest.ingestFile(db, table, f)
          println(s"INGESTED ${f.getName} rows=$n by $tag"); Console.flush()
        }, claims = claims)
        while (!new File(s"$shared/stop").exists() || store.list("").nonEmpty) {
          up.retryPending()
          Thread.sleep(200)
        }
        up.shutdown()
        val rows =
          if (catalog.exists("1", "seam")) catalog.read(spark, "1", "seam").count()
          else 0L
        println(s"DONE $tag rows=$rows")
        spark.stop()

      case other => sys.error(s"unknown role: $other (produce | consume)")
    }
  }
}
