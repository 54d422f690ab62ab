package graft.store

import java.io.File
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The scale-out seam between spool rotation and the insert workers —
  * the reference's blob-storage interface (S3/local,
  * /root/reference/pkg/storage/blobstore/, wired through
  * filesystem.go:95-171 upload + queue notify).
  *
  * Single-process deployments use [[LocalBlobStore]]; a multi-node
  * deployment drops in an S3-backed impl with the same four methods and
  * the ingest loop runs anywhere. Keys are `db/table/filename` — the
  * uploader derives them from the spool's closed-file layout.
  */
trait BlobStore {
  /** Upload `src` under `key` (consumes the local file on success). */
  def put(key: String, src: File): Unit

  /** Fetch `key` to a local file for processing. */
  def fetch(key: String, dest: File): Unit

  /** List keys under a prefix, lexicographic. */
  def list(prefix: String): Seq[String]

  def delete(key: String): Unit
}

/** Filesystem-backed blob store: `put` is an atomic move into
  * `<root>/<key>` — free on one node, and the contract (write fully,
  * then appear) matches what an S3 multipart upload gives a remote
  * impl. */
final class LocalBlobStore(rootDir: String) extends BlobStore {
  private val root: Path = new File(rootDir).toPath

  private def resolve(key: String): Path = {
    val p = root.resolve(key).normalize()
    require(p.startsWith(root), s"blob key escapes the store root: $key")
    p
  }

  override def put(key: String, src: File): Unit = {
    val dest = resolve(key)
    Files.createDirectories(dest.getParent)
    Files.move(src.toPath, dest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def fetch(key: String, dest: File): Unit = {
    Files.createDirectories(dest.toPath.getParent)
    Files.copy(resolve(key), dest.toPath, StandardCopyOption.REPLACE_EXISTING)
  }

  override def list(prefix: String): Seq[String] = {
    if (!Files.exists(root)) return Seq.empty
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => root.relativize(p).toString)
      .filter(_.startsWith(prefix))
      .toSeq.sorted
  }

  override def delete(key: String): Unit = Files.deleteIfExists(resolve(key))
}

/** Hadoop-FileSystem-backed blob store — the multi-node impl of the
  * seam, covering every scheme the cluster's Hadoop config resolves:
  * `s3a://bucket/prefix` (the reference's S3 backend,
  * /root/reference/pkg/storage/blobstore/s3/s3.go:28-60 Upload/
  * Download/Delete), `gs://`, `hdfs://`, or `file:///` for tests.
  * Credentials/endpoint ride the Hadoop Configuration (`fs.s3a.*`),
  * exactly where a Spark cluster already carries them — the engine
  * passes `spark.sparkContext.hadoopConfiguration` and inherits the
  * cluster's auth. Objects appear only on completed upload (S3 PUT is
  * atomic per object; the local scheme is for tests), matching
  * [[LocalBlobStore]]'s write-fully-then-appear contract. */
final class HadoopBlobStore(baseUri: String,
                            conf: org.apache.hadoop.conf.Configuration =
                              new org.apache.hadoop.conf.Configuration()) extends BlobStore {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}
  private val base = new HPath(baseUri)
  private val fs: FileSystem = base.getFileSystem(conf)
  private val basePathStr = {
    val q = fs.makeQualified(base).toString
    if (q.endsWith("/")) q else q + "/"
  }

  private def resolve(key: String): HPath = {
    require(!key.split("/").contains("..") && !key.startsWith("/"),
      s"blob key escapes the store root: $key")
    val p = new HPath(base, key)
    // a scheme/authority-qualified key ("s3a://other-bucket/x") resolves
    // OUTSIDE base via new Path(base, key) — qualify and contain, the
    // same normalize-then-startsWith check LocalBlobStore does
    require(fs.makeQualified(p).toString.startsWith(basePathStr),
      s"blob key escapes the store root: $key")
    p
  }

  override def put(key: String, src: File): Unit =
    // delSrc = true: consumes the local spool file on success (trait
    // contract); overwrite = true: a retried upload replaces the object
    fs.copyFromLocalFile(true, true, new HPath(src.getAbsolutePath), resolve(key))

  override def fetch(key: String, dest: File): Unit = {
    Files.createDirectories(dest.toPath.getParent)
    // useRawLocalFileSystem: no .crc droppings next to the temp file
    fs.copyToLocalFile(false, resolve(key), new HPath(dest.getAbsolutePath), true)
  }

  override def list(prefix: String): Seq[String] = {
    if (!fs.exists(base)) return Seq.empty
    val it = fs.listFiles(base, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val key = it.next().getPath.toString.stripPrefix(basePathStr)
      if (key.startsWith(prefix)) out += key
    }
    out.result().sorted
  }

  override def delete(key: String): Unit = fs.delete(resolve(key), false)
}

/** Config-keyed constructor, the reference's `NewBlobStore` switch
  * (/root/reference/pkg/storage/blobstore/blobstore.go:16-25: "memory" |
  * "s3" on conf.Settings). Settings names follow the reference's
  * mapstructure keys (s3.go:17-22). */
object BlobStore {
  def forConfig(storeType: String, settings: Map[String, String],
                hadoopConf: org.apache.hadoop.conf.Configuration =
                  new org.apache.hadoop.conf.Configuration()): BlobStore =
    storeType match {
      case "local" => new LocalBlobStore(settings("root"))
      case "s3" =>
        settings.get("access_key_id").foreach(hadoopConf.set("fs.s3a.access.key", _))
        settings.get("secret_access_key").foreach(hadoopConf.set("fs.s3a.secret.key", _))
        settings.get("endpoint").foreach(hadoopConf.set("fs.s3a.endpoint", _))
        settings.get("region").foreach(hadoopConf.set("fs.s3a.endpoint.region", _))
        val prefix = settings.getOrElse("prefix", "")
        new HadoopBlobStore(s"s3a://${settings("bucket")}/$prefix", hadoopConf)
      case "hadoop" => // any FileSystem URI the cluster resolves (gs://, hdfs://, file://)
        new HadoopBlobStore(settings("uri"), hadoopConf)
      case other => throw new IllegalArgumentException(s"unknown blob store type: $other")
    }
}

/** Bridges spool rotation to durable storage and ingestion: closed spool
  * file -> blob store (`db/table/name`) -> `process` -> delete blob.
  * A failed `process` leaves the blob in place; [[retryPending]] rescans
  * and re-processes everything still there (startup recovery + periodic
  * retry), which is what makes ingest at-least-once like the reference's
  * persistent queue (workers.go:34-52).
  *
  * With `workers > 0`, `accept` only uploads (a fast atomic move) and
  * hands processing to a bounded pool — the spool's rotate ticker is
  * never blocked behind a Spark batch job, and `workers` batches ingest
  * concurrently (the reference's worker pool, workers.go:138-165).
  *
  * `claims` guards each blob with an exclusive claim before processing
  * (reference queue claim model, gorm/queue.go:29-63): the default
  * [[LocalClaimQueue]] stops the sweep and the accept path of ONE
  * process from double-processing a blob (batch-dir overwrite makes a
  * replay SAFE, but two simultaneous writers of one dir are not); a
  * shared [[FileLeaseQueue]] extends the same guarantee across
  * PROCESSES, so two engine nodes over one blob store split the ingest
  * load, each batch processed once (dead claimants' leases expire and
  * their batches are re-claimed — at-least-once, idempotent
  * downstream). */
final class Uploader(store: BlobStore, process: (String, String, File) => Unit,
                     workers: Int = 0, claims: ClaimQueue = new LocalClaimQueue) {

  private val owner = java.util.UUID.randomUUID().toString
  private val pool: Option[java.util.concurrent.ExecutorService] =
    if (workers > 0) Some(java.util.concurrent.Executors.newFixedThreadPool(workers, r => {
      val t = new Thread(r, "graft-ingest-worker"); t.setDaemon(true); t
    })) else None

  // one shared daemon thread heartbeats every in-flight lease at the
  // queue's renewal interval (TTL/3), so a batch slower than the lease
  // TTL — a fat Spark append, a GC pause — is never stolen from a
  // live worker and processed concurrently by the thief
  @volatile private var renewerStarted = false
  private lazy val renewer = {
    renewerStarted = true
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-lease-renewer"); t.setDaemon(true); t
    })
  }

  private def startHeartbeat(key: String): Option[java.util.concurrent.ScheduledFuture[_]] =
    claims.renewIntervalMillis.map { period =>
      renewer.scheduleAtFixedRate(
        () => try claims.renew(key, owner)
              catch { case e: Exception => System.err.println(s"[lease-renew] $key: ${e.getMessage}") },
        period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    }

  def keyOf(db: String, table: String, name: String) = s"$db/$table/$name"

  /** Spool `onClosed` hook: upload, then ingest (async when pooled). */
  def accept(db: String, table: String, closedFile: File): Unit = {
    val key = keyOf(db, table, closedFile.getName)
    store.put(key, closedFile)
    pool match {
      case Some(p) => p.submit(new Runnable {
        def run(): Unit =
          try processKey(key)
          catch { case e: Exception => System.err.println(s"[ingest] $key: ${e.getMessage}") }
      })
      case None => processKey(key)
    }
  }

  /** Re-process every pending blob (crash recovery / failed-batch retry).
    * Returns the number successfully processed. */
  def retryPending(): Int = {
    var ok = 0
    store.list("").foreach { key =>
      try { if (processKey(key)) ok += 1 }
      catch { case e: Exception => System.err.println(s"[ingest-retry] $key: ${e.getMessage}") }
    }
    ok
  }

  def shutdown(): Unit = {
    pool.foreach(_.shutdown())
    if (renewerStarted) renewer.shutdownNow()
  }

  /** Returns false when the key was skipped (claimed by another worker,
    * or already gone). */
  private def processKey(key: String): Boolean = {
    key.split("/", 3) match {
      case Array(db, table, name) =>
        if (!claims.tryClaim(key, owner)) return false
        val heartbeat = startHeartbeat(key)
        try {
          // keep the ORIGINAL spool filename: it is the ingest
          // idempotency key (TableCatalog batch directory), so a retry
          // of the same blob overwrites its batch, not duplicates it
          val tmpDir = Files.createTempDirectory("graft-ingest")
          val tmp = new File(tmpDir.toFile, name)
          try {
            val fetched =
              try { store.fetch(key, tmp); true }
              catch {
                // ONLY the fetch gets this treatment: claimed after the
                // blob was already ingested+deleted by a racing worker's
                // sweep — done, not an error. A missing file INSIDE
                // process() is a real failure and must propagate to the
                // error-logging callers, not be silently swallowed.
                case _: java.io.FileNotFoundException => false
                case _: java.nio.file.NoSuchFileException => false
              }
            if (!fetched) false
            else {
              process(db, table, tmp)
              store.delete(key)
              true
            }
          } finally {
            Files.deleteIfExists(tmp.toPath)
            Files.deleteIfExists(tmpDir)
          }
        } finally {
          heartbeat.foreach(_.cancel(false))
          claims.release(key, owner)
        }
      case _ => false // not an ingest key; ignore
    }
  }
}
