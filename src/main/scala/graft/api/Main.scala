package graft.api

import graft.engine.QueryExecutor
import graft.store._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit}

/** Boot the full engine: SparkSession + catalog + metadata store + spool
  * -> blob store -> ingest pipeline + HTTP API. Reproduces the reference
  * quickstart (readme.md:33-49): insert JSON, query it back as a JSON
  * array.
  *
  * Ingest is at-least-once: rotation uploads the closed NDJSON file into
  * the [[BlobStore]] and ingests it; on failure the blob stays put and a
  * periodic sweep (plus startup recovery of spool orphans and
  * half-finished migrations) re-processes it — the single-process
  * analogue of the reference's persistent queue + workers
  * (/root/reference/pkg/workers/workers.go:34-52).
  *
  *   sbt "runMain graft.api.Main"   # PORT, GRAFT_DATA, GRAFT_API_KEY env
  */
object Main {

  /** Env-selected blob store + claim queue — the reference's config-keyed
    * `NewBlobStore` switch (/root/reference/pkg/storage/blobstore/
    * blobstore.go:16-25) surfaced as environment variables, so a
    * two-node deployment is a config change, not a Scala edit:
    *
    *   GRAFT_BLOB_TYPE    local (default) | s3 | hadoop
    *   GRAFT_BLOB_ROOT               local: store root (default <data>/blobs)
    *   GRAFT_BLOB_URI                hadoop: any FileSystem URI (gs://, hdfs://, file://)
    *   GRAFT_BLOB_BUCKET/PREFIX/ACCESS_KEY_ID/SECRET_ACCESS_KEY/
    *   GRAFT_BLOB_ENDPOINT/REGION    s3: reference's mapstructure keys (s3.go:17-22)
    *   GRAFT_CLAIM_QUEUE  local (default) | file-lease:<shared-dir> | cas:<shared-dir>
    *                      | cas-s3:<bucket[/prefix]>  (conditional-PUT claims on S3 —
    *                        credentials/endpoint/region from the GRAFT_BLOB_* s3 keys,
    *                        which a blob-on-S3 deployment has set anyway)
    *   GRAFT_LEASE_TTL_MS lease TTL for file-lease / cas claims (default 5 min)
    *
    * `hadoopConf` is by-name: the local/local path never touches it, so
    * tests and single-node boots need no Hadoop configuration at all. */
  def storesFromEnv(env: Map[String, String], dataDir: String,
                    hadoopConf: => org.apache.hadoop.conf.Configuration): (BlobStore, ClaimQueue) = {
    val settingKeys = Seq(
      "root" -> "GRAFT_BLOB_ROOT", "uri" -> "GRAFT_BLOB_URI",
      "bucket" -> "GRAFT_BLOB_BUCKET", "prefix" -> "GRAFT_BLOB_PREFIX",
      "access_key_id" -> "GRAFT_BLOB_ACCESS_KEY_ID",
      "secret_access_key" -> "GRAFT_BLOB_SECRET_ACCESS_KEY",
      "endpoint" -> "GRAFT_BLOB_ENDPOINT", "region" -> "GRAFT_BLOB_REGION")
    val settings0 = settingKeys.flatMap { case (k, e) => env.get(e).map(k -> _) }.toMap
    val blobType = env.getOrElse("GRAFT_BLOB_TYPE", "local")
    val store = blobType match {
      case "local" =>
        new LocalBlobStore(settings0.getOrElse("root", s"$dataDir/blobs"))
      case t => BlobStore.forConfig(t, settings0, hadoopConf)
    }
    val ttl = env.getOrElse("GRAFT_LEASE_TTL_MS", (5 * 60 * 1000).toString).toLong
    val claims = env.getOrElse("GRAFT_CLAIM_QUEUE", "local") match {
      case "local" => new LocalClaimQueue
      case s if s.startsWith("file-lease:") =>
        new FileLeaseQueue(s.stripPrefix("file-lease:"), ttl)
      // conditional-write claims over a FileCasStore directory — the
      // same CasClaimQueue an object-store CasStore impl would drive
      case s if s.startsWith("cas:") =>
        new CasClaimQueue(new FileCasStore(s.stripPrefix("cas:")), ttl)
      // pure object-store deployment: claims by S3 conditional writes,
      // sharing the blob store's credential env keys
      case s if s.startsWith("cas-s3:") =>
        val (bucket, casPrefix) = s.stripPrefix("cas-s3:").split("/", 2) match {
          case Array(b)    => (b, "claims")
          case Array(b, p) => (b, p)
        }
        new CasClaimQueue(new S3CasStore(
          settings0.getOrElse("endpoint", "https://s3.amazonaws.com"),
          bucket, casPrefix,
          settings0.getOrElse("region", "us-east-1"),
          settings0.getOrElse("access_key_id", ""),
          settings0.getOrElse("secret_access_key", "")), ttl)
      case other => throw new IllegalArgumentException(
        s"unknown claim queue: $other (want local | file-lease:<dir> | cas:<dir> | cas-s3:<bucket[/prefix]>)")
    }
    (store, claims)
  }

  /** The production [[ServerConfig]] from the environment. Beyond key
    * + admin key, the per-request blast-radius knobs are deploy
    * config, not code:
    *
    *   GRAFT_QUERY_TIMEOUT_S   per-request wall bound; past it the
    *                           request's job group is cancelled
    *                           (default 300; 0 = unbounded)
    *   GRAFT_MAX_RESULT_BYTES  per-response byte cap; past it the
    *                           stream is cut and the feeding jobs
    *                           cancelled (default 0 = unbounded)
    *   GRAFT_MAX_STORE_BYTES   per-tenant persisted-store disk quota;
    *                           at/over it index_build answers 413
    *                           before any Spark job (default 0 =
    *                           unbounded)
    */
  def serverConfigFromEnv(env: Map[String, String], port: Int,
                          apiKey: String): ServerConfig =
    ServerConfig(port, Map(apiKey -> "1"), env.get("GRAFT_ADMIN_KEY"),
      queryTimeoutSeconds = envLong(env, "GRAFT_QUERY_TIMEOUT_S", 300L),
      maxResultBytes = envLong(env, "GRAFT_MAX_RESULT_BYTES", 0L),
      maxStoreBytes = envLong(env, "GRAFT_MAX_STORE_BYTES", 0L))

  /** A non-negative long env knob. Malformed or negative values fail
    * startup with an error NAMING the variable — a bare .toLong would
    * crash with an anonymous NumberFormatException, and a negative
    * timeout would silently disable the reaper (only > 0 arms it),
    * turning a typo into an unbounded-query deploy. */
  private def envLong(env: Map[String, String], name: String, default: Long): Long =
    env.get(name) match {
      case None => default
      case Some(raw) =>
        val v = try raw.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$name must be a non-negative integer, got '$raw'")
        }
        if (v < 0) throw new IllegalArgumentException(
          s"$name must be >= 0 (0 = unbounded), got $v")
        v
    }

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
      // per-tenant scheduler pools (QueryExecutor sets
      // spark.scheduler.pool per request thread) only share fairly
      // under FAIR mode; pools are created on demand with equal weight
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.SessionDefaults.ExtensionsKey,
        graft.core.SessionDefaults.ExtensionsClass)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val catalog = new TableCatalog(s"$dataDir/tables")
    // the static env key maps to tenant "1"; reserve it so dynamically
    // created destinations never alias it
    val meta = new MetaStore(dataDir, reservedIds = Set(1L))
    val ingest = new IngestService(spark, catalog)
    // blob store + claim queue from env: local single-node by default, a
    // shared object store + cross-process leases when configured
    val (blobs, claims) = storesFromEnv(sys.env, dataDir, spark.sparkContext.hadoopConfiguration)
    val ingestWorkers = sys.env.getOrElse("GRAFT_INGEST_WORKERS", "2").toInt
    val uploader = new Uploader(blobs, (db, table, f) => ingest.ingestFile(db, table, f),
      workers = ingestWorkers, claims = claims)

    // finish any half-done schema migration and reclaim index_build
    // debris before serving reads (static tenant "1" plus every
    // dynamically created destination)
    ("1" +: meta.listDestinations.map(_.id.toString)).distinct.foreach { db =>
      catalog.listTables(db).foreach(t => catalog.recoverMigration(db, t))
      catalog.cleanOrphanStoreBuilds(db).foreach(p =>
        println(s"[recovery] reclaimed orphaned store-build dir: $p"))
    }

    // rotation: 1s age for snappy local queryability (reference default
    // thresholds are deploy-config, filesystem.go:30-33)
    val spool = new Spool(s"$dataDir/spool",
      SpoolConfig(maxAgeSeconds = 1, rotatePeriodMillis = 500),
      f => {
        val table = f.getParentFile.getName
        val db = f.getParentFile.getParentFile.getName
        try uploader.accept(db, table, f)
        catch { case e: Exception => System.err.println(s"[ingest] ${f.getName}: ${e.getMessage}") }
      })
    spool.recoverOrphans() // a previous process may have died mid-spool
    uploader.retryPending() // ...or mid-ingest

    val executor = new QueryExecutor(spark, catalog)
    // dashboard (JWT sessions over OAuth) boots when the provider
    // credentials are configured — GRAFT_OAUTH_CLIENT_ID/CLIENT_SECRET/
    // REDIRECT + GRAFT_JWT_SECRET, with optional *_URL endpoint
    // overrides for non-Google IdPs (reference: config-gated dashboard)
    val dashboardCfg = for {
      id <- sys.env.get("GRAFT_OAUTH_CLIENT_ID")
      secret <- sys.env.get("GRAFT_OAUTH_CLIENT_SECRET")
      redirect <- sys.env.get("GRAFT_OAUTH_REDIRECT")
      jwtSecret <- sys.env.get("GRAFT_JWT_SECRET")
    } yield {
      var oc = OAuthConfig(id, secret, redirect)
      sys.env.get("GRAFT_OAUTH_AUTH_URL").foreach(u => oc = oc.copy(authUrl = u))
      sys.env.get("GRAFT_OAUTH_TOKEN_URL").foreach(u => oc = oc.copy(tokenUrl = u))
      sys.env.get("GRAFT_OAUTH_USERINFO_URL").foreach(u => oc = oc.copy(userinfoUrl = u))
      DashboardConfig(new OAuthClient(oc), jwtSecret.getBytes("UTF-8"))
    }
    val server = new Server(serverConfigFromEnv(sys.env, port, apiKey),
      catalog, ingest, spool, executor, meta, dashboardConfig = dashboardCfg)

    val sweeper = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-sweeper"); t.setDaemon(true); t
    }
    val compactThreshold = sys.env.getOrElse("GRAFT_COMPACT_FILES", "64").toInt
    sweeper.scheduleWithFixedDelay(() => {
      try {
        uploader.retryPending()
        meta.purgeExpiredShares()
        // bounded small-file debt: rewrite fragmented tables in place
        ("1" +: meta.listDestinations.map(_.id.toString)).distinct.foreach { db =>
          catalog.listTables(db).foreach { t =>
            if (catalog.fileCount(db, t) > compactThreshold) {
              val (before, after) = catalog.compact(spark, db, t)
              println(s"[compact] $db.$t: $before -> $after files")
            }
            // surface permanent fragment loss that the read path's
            // ignoreMissingFiles would otherwise mask as quiet row loss
            catalog.missingFragments(db, t).foreach(f =>
              System.err.println(s"[integrity] $db.$t: fragment VANISHED outside any catalog operation: $f"))
          }
        }
      } catch { case e: Exception => System.err.println(s"[sweep] ${e.getMessage}") }
    }, 30, 30, TimeUnit.SECONDS)

    val boundPort = server.start()
    println(s"scratchdbspark listening on :$boundPort (data: $dataDir)")
    // SIGTERM/SIGINT shutdown: drain in-flight exchanges (bounded by
    // GRAFT_DRAIN_S — the reference drains 30 min, api.go:96, so that's
    // the default), then flush the spool so every accepted row is in
    // the blob store before the process dies; the claim queue and
    // startup recovery make anything interrupted here at-least-once on
    // the next boot.
    val drainS = envLong(sys.env, "GRAFT_DRAIN_S", 30L * 60).toInt
    sys.addShutdownHook {
      println(s"[shutdown] draining (bound ${drainS}s)")
      try server.stop(drainS) catch { case e: Exception =>
        System.err.println(s"[shutdown] server stop: ${e.getMessage}") }
      try spool.shutdown() catch { case e: Exception =>
        System.err.println(s"[shutdown] spool flush: ${e.getMessage}") }
      try uploader.shutdown() catch { case e: Exception =>
        System.err.println(s"[shutdown] uploader: ${e.getMessage}") }
    }
    Thread.currentThread().join()
  }
}
