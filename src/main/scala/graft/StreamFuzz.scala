package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType
import graft.streaming.StreamingIngest
import scala.collection.immutable.ListMap
import scala.util.Random

/** Structured-Streaming parameter fuzzer — the third sibling
  * ([[OpFuzz]], [[StoreFuzz]]) aimed at the STREAMING surface: each seed
  * draws a family and a point in its parameter space, runs the REAL
  * streaming machinery (file-source staging with back-dated mtimes,
  * watermarks, AvailableNow triggers, append-mode finalized-window
  * emission, stream-stream join state), and replays the equivalent
  * BATCH query in DuckDB — which is exactly the guarantee a streaming
  * MV sells: the maintained view equals the from-scratch aggregate.
  *
  * Families and spaces:
  *  - `ssession`: gap-window sessions (session_window) at gap ∈
  *    {10 min, 30 min, 2 h}, fed as TWO micro-batches split at the
  *    median event time so cross-batch session-state merge is on the
  *    path, plus a far-future sentinel row forcing the watermark past
  *    every real session (append mode emits only finalized windows).
  *  - `swindow`: tumbling event-time windows (windowedCounts) at width
  *    ∈ {1 h, 6 h, 1 d} — the non-calendar 6 h width pins Spark's
  *    epoch-aligned window() against an epoch-floor replay (date_trunc
  *    could not express it).
  *  - `sjoin`: stream-stream interval join at (type pair) × before ∈
  *    {0, 30 min} × after ∈ {30 min, 1 h, 4 h} × {inner, left_outer}
  *    (outer rows need the watermark to pass the interval edge — a
  *    two-sided far-future sentinel forces every real row out).
  *  - `slate`: LATE-DATA semantics — batch 1 carries the even-id half
  *    of the stream (watermark then sits at max(even) − delay), batch
  *    2 the odd half, almost all of it behind the watermark; the
  *    oracle predicts exactly which late rows Spark drops (closed
  *    window) vs absorbs (still-open window). Monotone-staged tests
  *    structurally cannot observe this semantic.
  *
  *  - `slatesession`: late data over GAP SESSIONS — the corner where
  *    streaming and batch genuinely diverge (a late row after an
  *    evicted session starts a NEW session that can OVERLAP the
  *    emitted one); the oracle replays the exact streaming semantics.
  *
  * Verification mirrors the siblings: StreamFuzzSpec (determinism,
  * battery pins, invariants, mutation sensitivity), battery rows
  * q236–q240, [[StreamFuzzSweep]] for seed ranges through the DuckDB
  * gate. Battery seeds are scanned to be non-empty AND
  * mutation-sensitive at sf0.001.
  */
object StreamFuzz {
  type Q = (SparkSession, String) => DataFrame

  final case class Generated(family: String, params: String, query: Q, sql: String,
                             mutated: Q)

  private def pick[A](r: Random, xs: Vector[A]): A = xs(r.nextInt(xs.size))

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  private def freshBase(family: String, d: String): java.io.File = {
    val b = new java.io.File(s"/tmp/graft_streamfuzz_${family}_" +
      s"${new java.io.File(d).getName}_${ProcessHandle.current().pid()}")
    rmrf(b); b
  }

  /** Stage `df` as a single parquet FILE with a back-dated mtime — the
    * file source orders micro-batches by mtime, so staged files replay
    * as a deterministic batch sequence (the q69/q139 pattern). */
  private def stage(base: java.io.File, inDir: java.io.File,
                    df: DataFrame, name: String, mtime: Long): Unit = {
    val tmp = new java.io.File(base, s"stage_$name")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = tmp.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dest = new java.io.File(inDir, name)
    java.nio.file.Files.move(part.toPath, dest.toPath)
    dest.setLastModified(mtime); ()
  }

  private def events(s: SparkSession, dir: String): DataFrame =
    Queries.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))

  private def ssessionGen(r: Random): Generated = {
    val gap = pick(r, Vector(10L, 30L, 120L))
    def run(g: Long): Q = (s, d) => {
      val base = freshBase("ssession", d)
      val inDir = new java.io.File(base, "in"); inDir.mkdirs()
      val ev = events(s, d).select(col("ts"), col("user_id"))
      val bounds = ev.agg(max(col("ts")).as("mx"),
        expr("percentile_approx(unix_micros(ts), 0.5, 100000)").as("med")).head()
      val maxTs = bounds.getTimestamp(0); val medUs = bounds.getLong(1)
      val now = System.currentTimeMillis()
      stage(base, inDir, ev.filter(unix_micros(col("ts")) <= medUs),
        "000_early.parquet", now - 120000)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000)
      stage(base, inDir, ev.filter(unix_micros(col("ts")) > medUs).unionByName(
          s.createDataFrame(java.util.List.of(Row(sentinelTs, -1L)), ev.schema)),
        "001_late.parquet", now - 60000)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      val sessions = StreamingIngest.sessionCounts(
        stream, "ts", "user_id", s"$g minutes", "1 minute")
      val outDir = new java.io.File(base, "out").toString
      val q = sessions.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }
    Generated("ssession", s"gapMinutes=$gap",
      run(gap),
      OracleSql.sessionCountsSql(gap),
      run(Map(10L -> 30L, 30L -> 120L, 120L -> 10L)(gap)))
  }

  private val windows = Vector(("1 hour", 3600000000L),
    ("6 hours", 21600000000L), ("1 day", 86400000000L))

  private def swindowGen(r: Random): Generated = {
    val (win, widthUs) = pick(r, windows)
    def run(w: String): Q = (s, d) => {
      val base = freshBase("swindow", d)
      val inDir = new java.io.File(base, "in"); inDir.mkdirs()
      val ev = events(s, d).select(col("ts"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("value"))
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val now = System.currentTimeMillis()
      stage(base, inDir, ev, "000_events.parquet", now - 120000)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000)
      stage(base, inDir, s.createDataFrame(
          java.util.List.of(Row(sentinelTs, "zz_sentinel",
            new java.math.BigDecimal("0.00"))), ev.schema),
        "001_sentinel.parquet", now - 60000)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      val counts = StreamingIngest.windowedCounts(stream, "ts", "event_type",
        w, "1 minute")
      val outDir = new java.io.File(base, "out").toString
      val q = counts.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .filter(col("event_type") =!= "zz_sentinel")
        .select(col("window_start"), col("event_type"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy("window_start", "event_type")
    }
    val mutWin = windows((windows.indexWhere(_._1 == win) + 1) % windows.size)._1
    Generated("swindow", s"window=${win.replace(' ', '_')}",
      run(win),
      OracleSql.windowedCountsSql(widthUs),
      run(mutWin))
  }

  private val typePairs = Vector(("view", "click"), ("view", "error"),
    ("click", "purchase"))

  private def sjoinGen(r: Random): Generated = {
    val (lt, rt) = pick(r, typePairs)
    val before = pick(r, Vector(0L, 30L))
    val after = pick(r, Vector(30L, 60L, 240L))
    val joinType = pick(r, Vector("inner", "left_outer"))
    def run(a: Long): Q = (s, d) => {
      val base = freshBase("sjoin", d)
      val inDir = new java.io.File(base, "in"); inDir.mkdirs()
      val ev = events(s, d).select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"))
      val now = System.currentTimeMillis()
      stage(base, inDir, ev, "000_events.parquet", now - 120000)
      // outer rows only emit once BOTH sides' watermarks pass the
      // row's interval edge; a far-future sentinel on each side (user
      // -1, never matching) forces that for every real row
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000)
      stage(base, inDir, s.createDataFrame(
          java.util.List.of(
            Row(sentinelTs, -1L, -1L, lt), Row(sentinelTs, -2L, -1L, rt)),
          ev.schema),
        "001_sentinel.parquet", now - 60000)
      def side(tpe: String, idAs: String, tsAs: String) =
        s.readStream.schema(ev.schema).parquet(inDir.toString)
          .filter(col("event_type") === tpe)
          .select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
      val j = StreamingIngest.intervalJoin(
        side(lt, "left_id", "left_ts"), side(rt, "right_id", "right_ts"),
        "user_id", "left_ts", "right_ts",
        watermark = "1 hour", before = s"$before minutes", after = s"$a minutes",
        joinType = joinType)
      val sink = "g_streamfuzz_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = j.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink)
        .filter(col("user_id") =!= -1L)
        .groupBy("left_id")
        .agg(count(col("right_id")).as("n_matches"),
          sum(col("right_id")).cast("long").as("right_id_sum"))
        .orderBy("left_id")
    }
    Generated("sjoin",
      s"leftType=$lt rightType=$rt beforeMin=$before afterMin=$after joinType=$joinType",
      run(after),
      OracleSql.intervalJoinSql(lt, rt, before, after, joinType),
      run(Map(30L -> 60L, 60L -> 240L, 240L -> 30L)(after)))
  }

  /** LATE-DATA semantics family: batch 0 carries the EVEN-id half of
    * the stream (spanning the whole time range, so the watermark
    * advances to max(even) − delay), and the ODD half arrives TWO
    * batches later — behind the watermark. Spark's late-events filter
    * lags ONE batch (`eventTimeWatermarkForLateEvents` is the
    * PREVIOUS batch's watermark — probed empirically: odd rows staged
    * directly after the even batch are all absorbed), so a
    * do-nothing filler batch sits between: the odd batch is then
    * filtered against max(even) − delay, dropping exactly the rows
    * whose window already closed and absorbing the rest into
    * still-open windows. The oracle predicts that row set
    * ([[OracleSql.lateWindowSql]]). Every other streaming test here
    * stages monotone batches, which structurally cannot observe the
    * late-drop semantic. */
  private def slateGen(r: Random): Generated = {
    val (win, widthUs) = pick(r, windows)
    val delay = pick(r, Vector(1L, 60L))
    def run(dm: Long): Q = (s, d) => {
      val base = freshBase("slate", d)
      val inDir = new java.io.File(base, "in"); inDir.mkdirs()
      val evAll = events(s, d).select(col("ts"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("value"), col("event_id"))
      val schema = org.apache.spark.sql.types.StructType(evAll.schema.dropRight(1))
      val now = System.currentTimeMillis()
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 0).drop("event_id"),
        "000_even.parquet", now - 120000)
      val maxTs = evAll.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000)
      def sentinelRow(ts: java.sql.Timestamp) =
        s.createDataFrame(java.util.List.of(Row(ts, "zz_sentinel",
          new java.math.BigDecimal("0.00"))), schema)
      // filler at max(even) — advances NOTHING, but shifts the lagging
      // late-events filter to the even batch's watermark
      stage(base, inDir, sentinelRow(maxTs), "001_filler.parquet", now - 90000)
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 1).drop("event_id"),
        "002_odd.parquet", now - 60000)
      stage(base, inDir, sentinelRow(sentinelTs), "003_sentinel.parquet", now - 30000)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      val counts = StreamingIngest.windowedCounts(stream, "ts", "event_type",
        win, s"$dm minutes")
      val outDir = new java.io.File(base, "out").toString
      val q = counts.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .filter(col("event_type") =!= "zz_sentinel")
        .select(col("window_start"), col("event_type"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy("window_start", "event_type")
    }
    Generated("slate", s"window=${win.replace(' ', '_')} delayMin=$delay",
      run(delay),
      OracleSql.lateWindowSql(widthUs, delay),
      run(if (delay == 1L) 60L else 1L))
  }

  /** LATE-DATA semantics over GAP SESSIONS — where streaming and batch
    * GENUINELY diverge: once the watermark passes a session's end the
    * session is evicted and emitted; a late row landing just after its
    * last event then starts a NEW session, which can OVERLAP the
    * emitted one — a shape batch sessionization cannot produce. Same
    * filler-batch staging as [[slateGen]] (the late-events filter lags
    * one batch); the oracle replays the exact streaming semantics:
    * evicted even-only sessions ∪ re-sessionized (surviving even ∪
    * kept late) rows ([[OracleSql.lateSessionSql]]). */
  private def slateSessionGen(r: Random): Generated = {
    val gap = pick(r, Vector(10L, 30L, 120L))
    val delay = pick(r, Vector(1L, 60L))
    def run(dm: Long): Q = (s, d) => {
      val base = freshBase("slatesession", d)
      val inDir = new java.io.File(base, "in"); inDir.mkdirs()
      val evAll = events(s, d).select(col("ts"), col("user_id"), col("event_id"))
      val schema = org.apache.spark.sql.types.StructType(evAll.schema.dropRight(1))
      val now = System.currentTimeMillis()
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 0).drop("event_id"),
        "000_even.parquet", now - 120000)
      val maxTs = evAll.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000)
      def oneRow(ts: java.sql.Timestamp) =
        s.createDataFrame(java.util.List.of(Row(ts, -1L)), schema)
      stage(base, inDir, oneRow(maxTs), "001_filler.parquet", now - 90000)
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 1).drop("event_id"),
        "002_odd.parquet", now - 60000)
      stage(base, inDir, oneRow(sentinelTs), "003_sentinel.parquet", now - 30000)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      val sessions = StreamingIngest.sessionCounts(
        stream, "ts", "user_id", s"$gap minutes", s"$dm minutes")
      val outDir = new java.io.File(base, "out").toString
      val q = sessions.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start", "session_end")
    }
    Generated("slatesession", s"gapMinutes=$gap delayMin=$delay",
      run(delay),
      OracleSql.lateSessionSql(gap, delay),
      run(if (delay == 1L) 60L else 1L))
  }

  private val families: Vector[Random => Generated] = Vector(
    ssessionGen, swindowGen, sjoinGen, slateGen, slateSessionGen)

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic: same seed, same (streaming run, SQL) pair. */
  def generate(seed: Long): Generated = {
    val r = new Random(mix64(seed))
    families(r.nextInt(families.size))(r)
  }

  /** Battery seeds — one per family, scanned for non-emptiness +
    * mutation sensitivity at sf0.001. */
  private[graft] val batterySeeds: Vector[(String, Long)] = Vector(
    ("q236_streamfuzz_ssession", 4L),
    ("q237_streamfuzz_swindow", 2L),
    ("q238_streamfuzz_sjoin", 8L),
    ("q239_streamfuzz_slate", 21L),
    ("q240_streamfuzz_slatesession", 3L))

  private[graft] def expectedFamily(name: String): String =
    name.substring("q2NN_streamfuzz_".length)

  val queries: Map[String, Q] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).query
  }: _*)

  val oracles: Map[String, String] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).sql
  }: _*)
}
