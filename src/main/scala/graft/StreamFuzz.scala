package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType
import graft.store.MergeStore
import graft.streaming.StreamingIngest
import scala.collection.immutable.ListMap
import scala.util.Random

/** Structured-Streaming parameter fuzzer — the third sibling
  * ([[OpFuzz]], [[StoreFuzz]]) aimed at the STREAMING surface: each seed
  * draws a family and a point in its parameter space, runs the REAL
  * streaming machinery (file-source staging with back-dated mtimes,
  * watermarks, AvailableNow triggers, append-mode finalized-window
  * emission, stream-stream join state, mapGroupsWithState custom
  * state, epoch-addressed MV parts), and replays the equivalent BATCH
  * query in DuckDB — which is exactly the guarantee a streaming MV
  * sells: the maintained view equals the from-scratch aggregate.
  *
  * Every family decomposes into a resumable [[Plan]]
  * (stage → start → read): the normal fuzz path runs all three in one
  * JVM, and the restart-chaos harness ([[StreamChaosSweep]]) runs
  * `start` in a worker JVM it kill -9's mid-stream, then again in a
  * second JVM resuming the same checkpoint — the DuckDB replay must
  * still match, at the SEED-DRAWN parameter point.
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
  *    two-sided far-future sentinel forces every real row out). The
  *    joined rows land in a parquet sink (exactly-once via the file
  *    sink's metadata log) and the read phase aggregates them — no
  *    memory sink pinning results in the driver for the JVM's life.
  *  - `slate`: LATE-DATA semantics — batch 1 carries the even-id half
  *    of the stream (watermark then sits at max(even) − delay), batch
  *    2 the odd half, almost all of it behind the watermark; the
  *    oracle predicts exactly which late rows Spark drops (closed
  *    window) vs absorbs (still-open window). Monotone-staged tests
  *    structurally cannot observe this semantic.
  *  - `slatesession`: late data over GAP SESSIONS — the corner where
  *    streaming and batch genuinely diverge (a late row after an
  *    evicted session starts a NEW session that can OVERLAP the
  *    emitted one); the oracle replays the exact streaming semantics.
  *  - `sdedup`: first-occurrence dedup through the
  *    `mapGroupsWithState` custom-state path
  *    ([[StreamingIngest.firstOccurrenceDedup]]) at (key expression ×
  *    batch-split arity × within-batch duplication factor). Batches
  *    are pre-reduced to ONE winning row per (key, batch) — min
  *    (ts, event_id) — then duplicated `dupFactor`× with IDENTICAL
  *    copies, so the within-batch drain path runs without making
  *    "first" depend on Spark's unordered group iterator; cross-batch
  *    drops come from the state store. Update-mode output can't use
  *    the parquet sink, so each micro-batch lands as an
  *    epoch-addressed overwrite part (the summing-MV exactly-once
  *    contract). Oracle: batch first-occurrence via row_number over
  *    (batch index, ts, event_id).
  *  - `ssum`: streaming summing-MV maintenance
  *    ([[StreamingIngest.maintainSummingParts]]) at (key shape ∈
  *    {event_type, date_trunc bucket, both} × grain ∈ {hour, day} ×
  *    epoch split ∈ {2, 3, 5}) — the store merges its epoch parts back
  *    to the from-scratch GROUP BY at ANY split (the oracle is
  *    split-independent, deliberately).
  *  - `squant`: streaming quantile-MV maintenance
  *    ([[StreamingIngest.maintainQuantileParts]]) at (quantile set ×
  *    bin scale ∈ {10, 100} × epoch split ∈ {2, 3, 5}), read back
  *    through the merged cumulative-rank path
  *    ([[MergeStore.readQuantiles]]).
  *
  * Verification mirrors the siblings: StreamFuzzSpec (determinism,
  * battery pins, invariants, mutation sensitivity), battery rows
  * q236–q243, [[StreamFuzzSweep]] for seed ranges through the DuckDB
  * gate, [[StreamChaosSweep]] for kill -9 restarts at fuzzed points.
  * Battery seeds are scanned ([[StreamFuzzScan]]) to be non-empty AND
  * mutation-sensitive at sf0.001.
  */
object StreamFuzz {
  type Q = (SparkSession, String) => DataFrame

  final case class Generated(family: String, params: String, query: Q, sql: String,
                             mutated: Q)

  /** One fuzzed streaming run, decomposed so a restart can re-enter it:
    * `stage` writes the input files (deterministic given the sf dir)
    * under `base/in`, `start` launches the streaming query with its
    * checkpoint under `base/ckpt` and durable output under `base/out`
    * or `base/store`, `read` assembles the final DataFrame from the
    * durable output. Running start → kill -9 → start again on the SAME
    * base must converge to the same `read` result — that is the
    * exactly-once contract [[StreamChaosSweep]] crashes into. */
  final case class Plan(family: String, params: String,
                        stage: (SparkSession, String, java.io.File) => Unit,
                        start: (SparkSession, java.io.File) => StreamingQuery,
                        read: (SparkSession, java.io.File) => DataFrame,
                        sql: String)

  private def toGenerated(p: Plan, mut: Plan): Generated = {
    def q(pl: Plan): Q = (s, d) => {
      val base = FuzzScratch.fresh(s"streamfuzz_${pl.family}")
      pl.stage(s, d, base)
      // state partitions sized to the bounded run's state, not the host
      // core count — see StreamTuning (commit count is the wall sink)
      graft.streaming.StreamTuning.withStateParts(s, base) {
        val sq = pl.start(s, base)
        sq.awaitTermination()
      }
      pl.read(s, base)
    }
    Generated(p.family, p.params, q(p), p.sql, q(mut))
  }

  private def pick[A](r: Random, xs: Vector[A]): A = xs(r.nextInt(xs.size))

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

  private def inDirOf(base: java.io.File): java.io.File = {
    val d = new java.io.File(base, "in"); d.mkdirs(); d
  }
  private def outPath(base: java.io.File): String =
    new java.io.File(base, "out").toString
  private def ckptPath(base: java.io.File): String =
    new java.io.File(base, "ckpt").toString
  private def storePath(base: java.io.File): String =
    new java.io.File(base, "store").toString

  /** Streaming read over the staged files; schema comes from the staged
    * parquet footers, so a resumed JVM reconstructs it identically. */
  private def fileStream(s: SparkSession, base: java.io.File,
                         maxFilesPerTrigger: Option[Int] = Some(1)): DataFrame = {
    val in = new java.io.File(base, "in").toString
    val reader = s.readStream.schema(s.read.parquet(in).schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(in)
  }

  private def parquetSink(df: DataFrame, base: java.io.File): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", outPath(base))
      .option("checkpointLocation", ckptPath(base))
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()

  private def sentinelAfter(maxTs: java.sql.Timestamp): java.sql.Timestamp =
    new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000)

  // ---------------------------------------------------------------- ssession

  private def ssessionPlan(gap: Long): Plan = Plan(
    "ssession", s"gapMinutes=$gap",
    stage = (s, d, base) => {
      val inDir = inDirOf(base)
      val ev = events(s, d).select(col("ts"), col("user_id"))
      val bounds = ev.agg(max(col("ts")).as("mx"),
        expr("percentile_approx(unix_micros(ts), 0.5, 100000)").as("med")).head()
      val maxTs = bounds.getTimestamp(0); val medUs = bounds.getLong(1)
      val now = System.currentTimeMillis()
      stage(base, inDir, ev.filter(unix_micros(col("ts")) <= medUs),
        "000_early.parquet", now - 120000)
      stage(base, inDir, ev.filter(unix_micros(col("ts")) > medUs).unionByName(
          s.createDataFrame(java.util.List.of(Row(sentinelAfter(maxTs), -1L)),
            ev.schema)),
        "001_late.parquet", now - 60000)
    },
    start = (s, base) => parquetSink(StreamingIngest.sessionCounts(
      fileStream(s, base), "ts", "user_id", s"$gap minutes", "1 minute"), base),
    read = (s, base) => s.read.parquet(outPath(base))
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start"),
    sql = OracleSql.sessionCountsSql(gap))

  private def ssessionGen(r: Random): (Plan, Plan) = {
    val gap = pick(r, Vector(10L, 30L, 120L))
    (ssessionPlan(gap), ssessionPlan(Map(10L -> 30L, 30L -> 120L, 120L -> 10L)(gap)))
  }

  // ----------------------------------------------------------------- swindow

  private val windows = Vector(("1 hour", 3600000000L),
    ("6 hours", 21600000000L), ("1 day", 86400000000L))

  private def swindowPlan(win: String, widthUs: Long): Plan = Plan(
    "swindow", s"window=${win.replace(' ', '_')}",
    stage = (s, d, base) => {
      val inDir = inDirOf(base)
      val ev = events(s, d).select(col("ts"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("value"))
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val now = System.currentTimeMillis()
      stage(base, inDir, ev, "000_events.parquet", now - 120000)
      stage(base, inDir, s.createDataFrame(
          java.util.List.of(Row(sentinelAfter(maxTs), "zz_sentinel",
            new java.math.BigDecimal("0.00"))), ev.schema),
        "001_sentinel.parquet", now - 60000)
    },
    start = (s, base) => parquetSink(StreamingIngest.windowedCounts(
      fileStream(s, base), "ts", "event_type", win, "1 minute"), base),
    read = (s, base) => s.read.parquet(outPath(base))
      .filter(col("event_type") =!= "zz_sentinel")
      .select(col("window_start"), col("event_type"), col("n"),
        col("total").cast("double").as("total"))
      .orderBy("window_start", "event_type"),
    sql = OracleSql.windowedCountsSql(widthUs))

  private def swindowGen(r: Random): (Plan, Plan) = {
    val (win, widthUs) = pick(r, windows)
    val (mw, mu) = windows((windows.indexWhere(_._1 == win) + 1) % windows.size)
    (swindowPlan(win, widthUs), swindowPlan(mw, mu))
  }

  // ------------------------------------------------------------------- sjoin

  private val typePairs = Vector(("view", "click"), ("view", "error"),
    ("click", "purchase"))

  private def sjoinPlan(lt: String, rt: String, before: Long, after: Long,
                        joinType: String): Plan = Plan(
    "sjoin",
    s"leftType=$lt rightType=$rt beforeMin=$before afterMin=$after joinType=$joinType",
    stage = (s, d, base) => {
      val inDir = inDirOf(base)
      val ev = events(s, d).select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"))
      val now = System.currentTimeMillis()
      stage(base, inDir, ev, "000_events.parquet", now - 120000)
      // outer rows only emit once BOTH sides' watermarks pass the
      // row's interval edge; a far-future sentinel on each side (user
      // -1, never matching) forces that for every real row
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val st = sentinelAfter(maxTs)
      stage(base, inDir, s.createDataFrame(
          java.util.List.of(Row(st, -1L, -1L, lt), Row(st, -2L, -1L, rt)),
          ev.schema),
        "001_sentinel.parquet", now - 60000)
    },
    start = (s, base) => {
      def side(tpe: String, idAs: String, tsAs: String) =
        fileStream(s, base, maxFilesPerTrigger = None)
          .filter(col("event_type") === tpe)
          .select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
      val j = StreamingIngest.intervalJoin(
        side(lt, "left_id", "left_ts"), side(rt, "right_id", "right_ts"),
        "user_id", "left_ts", "right_ts",
        watermark = "1 hour", before = s"$before minutes", after = s"$after minutes",
        joinType = joinType)
      parquetSink(j.select(col("left_id"), col("user_id"), col("right_id")), base)
    },
    read = (s, base) => s.read.parquet(outPath(base))
      .filter(col("user_id") =!= -1L)
      .groupBy("left_id")
      .agg(count(col("right_id")).as("n_matches"),
        sum(col("right_id")).cast("long").as("right_id_sum"))
      .orderBy("left_id"),
    sql = OracleSql.intervalJoinSql(lt, rt, before, after, joinType))

  private def sjoinGen(r: Random): (Plan, Plan) = {
    val (lt, rt) = pick(r, typePairs)
    val before = pick(r, Vector(0L, 30L))
    val after = pick(r, Vector(30L, 60L, 240L))
    val joinType = pick(r, Vector("inner", "left_outer"))
    (sjoinPlan(lt, rt, before, after, joinType),
      sjoinPlan(lt, rt, before, Map(30L -> 60L, 60L -> 240L, 240L -> 30L)(after),
        joinType))
  }

  // ------------------------------------------------------------------- slate

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
  private def slatePlan(win: String, widthUs: Long, delay: Long): Plan = Plan(
    "slate", s"window=${win.replace(' ', '_')} delayMin=$delay",
    stage = (s, d, base) => {
      val inDir = inDirOf(base)
      val evAll = events(s, d).select(col("ts"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("value"), col("event_id"))
      val schema = org.apache.spark.sql.types.StructType(evAll.schema.dropRight(1))
      val now = System.currentTimeMillis()
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 0).drop("event_id"),
        "000_even.parquet", now - 120000)
      val maxTs = evAll.agg(max(col("ts"))).head().getTimestamp(0)
      def sentinelRow(ts: java.sql.Timestamp) =
        s.createDataFrame(java.util.List.of(Row(ts, "zz_sentinel",
          new java.math.BigDecimal("0.00"))), schema)
      // filler at max(even) — advances NOTHING, but shifts the lagging
      // late-events filter to the even batch's watermark
      stage(base, inDir, sentinelRow(maxTs), "001_filler.parquet", now - 90000)
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 1).drop("event_id"),
        "002_odd.parquet", now - 60000)
      stage(base, inDir, sentinelRow(sentinelAfter(maxTs)),
        "003_sentinel.parquet", now - 30000)
    },
    start = (s, base) => parquetSink(StreamingIngest.windowedCounts(
      fileStream(s, base), "ts", "event_type", win, s"$delay minutes"), base),
    read = (s, base) => s.read.parquet(outPath(base))
      .filter(col("event_type") =!= "zz_sentinel")
      .select(col("window_start"), col("event_type"), col("n"),
        col("total").cast("double").as("total"))
      .orderBy("window_start", "event_type"),
    sql = OracleSql.lateWindowSql(widthUs, delay))

  private def slateGen(r: Random): (Plan, Plan) = {
    val (win, widthUs) = pick(r, windows)
    val delay = pick(r, Vector(1L, 60L))
    (slatePlan(win, widthUs, delay),
      slatePlan(win, widthUs, if (delay == 1L) 60L else 1L))
  }

  // ------------------------------------------------------------ slatesession

  /** LATE-DATA semantics over GAP SESSIONS — where streaming and batch
    * GENUINELY diverge: once the watermark passes a session's end the
    * session is evicted and emitted; a late row landing just after its
    * last event then starts a NEW session, which can OVERLAP the
    * emitted one — a shape batch sessionization cannot produce. Same
    * filler-batch staging as [[slatePlan]] (the late-events filter lags
    * one batch); the oracle replays the exact streaming semantics:
    * evicted even-only sessions ∪ re-sessionized (surviving even ∪
    * kept late) rows ([[OracleSql.lateSessionSql]]). */
  private def slateSessionPlan(gap: Long, delay: Long): Plan = Plan(
    "slatesession", s"gapMinutes=$gap delayMin=$delay",
    stage = (s, d, base) => {
      val inDir = inDirOf(base)
      val evAll = events(s, d).select(col("ts"), col("user_id"), col("event_id"))
      val schema = org.apache.spark.sql.types.StructType(evAll.schema.dropRight(1))
      val now = System.currentTimeMillis()
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 0).drop("event_id"),
        "000_even.parquet", now - 120000)
      val maxTs = evAll.agg(max(col("ts"))).head().getTimestamp(0)
      def oneRow(ts: java.sql.Timestamp) =
        s.createDataFrame(java.util.List.of(Row(ts, -1L)), schema)
      stage(base, inDir, oneRow(maxTs), "001_filler.parquet", now - 90000)
      stage(base, inDir, evAll.filter(col("event_id") % 2 === 1).drop("event_id"),
        "002_odd.parquet", now - 60000)
      stage(base, inDir, oneRow(sentinelAfter(maxTs)),
        "003_sentinel.parquet", now - 30000)
    },
    start = (s, base) => parquetSink(StreamingIngest.sessionCounts(
      fileStream(s, base), "ts", "user_id", s"$gap minutes", s"$delay minutes"),
      base),
    read = (s, base) => s.read.parquet(outPath(base))
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start", "session_end"),
    sql = OracleSql.lateSessionSql(gap, delay))

  private def slateSessionGen(r: Random): (Plan, Plan) = {
    val gap = pick(r, Vector(10L, 30L, 120L))
    val delay = pick(r, Vector(1L, 60L))
    (slateSessionPlan(gap, delay),
      slateSessionPlan(gap, if (delay == 1L) 60L else 1L))
  }

  // ------------------------------------------------------------------ sdedup

  private val sdedupKeyModes = Vector("type", "user", "usermod7", "usermod10")

  private def sdedupKeyExprs(keyMode: String): (org.apache.spark.sql.Column, String) =
    keyMode match {
      case "type"      => (col("event_type"), "event_type")
      case "user"      => (col("user_id").cast("string"), "CAST(user_id AS VARCHAR)")
      case "usermod7"  => ((col("user_id") % 7).cast("string"),
        "CAST(user_id % 7 AS VARCHAR)")
      case "usermod10" => ((col("user_id") % 10).cast("string"),
        "CAST(user_id % 10 AS VARCHAR)")
    }

  private def sdedupPlan(keyMode: String, nB: Int, dupFactor: Int): Plan = Plan(
    "sdedup", s"keyMode=$keyMode nBatches=$nB dupFactor=$dupFactor",
    stage = (s, d, base) => {
      val inDir = inDirOf(base)
      val (keyExpr, _) = sdedupKeyExprs(keyMode)
      val ev = events(s, d).select(
        keyExpr.as("k"),
        concat(col("event_type"), lit("#"), col("event_id").cast("string"))
          .as("payload"),
        // (event time, id) as a STRUCT — Spark orders structs
        // field-by-field, so this is the unique, deterministic "first"
        // the oracle's row_number (ORDER BY ts, event_id) replays. A
        // padded-decimal string would mis-order negative values ('-'
        // sorts before digits), silently picking a different winner for
        // pre-1970 timestamps or negative ids (ADVICE r19).
        struct(col("ts"), col("event_id")).as("ord"),
        (col("event_id") % nB).as("b"))
      val now = System.currentTimeMillis()
      (0 until nB).foreach { b =>
        val reduced = ev.filter(col("b") === b)
          .groupBy("k").agg(min_by(col("payload"), col("ord")).as("payload"))
          // duplicate the winner dupFactor× with IDENTICAL copies: the
          // within-batch drain runs for real, but "first" stays
          // order-independent (the group iterator is unordered)
          .withColumn("dup", explode(sequence(lit(1), lit(dupFactor))))
          .select("k", "payload")
        stage(base, inDir, reduced, f"$b%03d_batch.parquet",
          now - 200000 + b * 20000)
      }
    },
    start = (s, base) => {
      import s.implicits._
      val stream = fileStream(s, base)
        .select(col("k").as("_1"), col("payload").as("_2")).as[(String, String)]
      val out = outPath(base)
      StreamingIngest.firstOccurrenceDedup(stream)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckptPath(base))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[(String, String)], epochId: Long) =>
          // update-mode rows can't use the parquet sink; the
          // epoch-addressed overwrite gives the same
          // exactly-once-on-replay contract as the summing-MV parts
          batch.toDF("k", "payload").write.mode("overwrite")
            .parquet(s"$out/epoch=$epochId")
          ()
        }
        .start()
    },
    read = (s, base) => s.read.parquet(outPath(base))
      .select(col("k"), col("payload")).orderBy("k"),
    sql = OracleSql.firstOccurrenceSql(sdedupKeyExprs(keyMode)._2, nB))

  private def sdedupGen(r: Random): (Plan, Plan) = {
    val keyMode = pick(r, sdedupKeyModes)
    val nB = pick(r, Vector(2, 3, 4))
    val dupFactor = pick(r, Vector(1, 3))
    // dupFactor is deliberately invisible (identical copies), so the
    // mutation nudges the batch split: a key's earliest batch and the
    // winning row within it both move
    (sdedupPlan(keyMode, nB, dupFactor),
      sdedupPlan(keyMode, Map(2 -> 3, 3 -> 4, 4 -> 2)(nB), dupFactor))
  }

  // -------------------------------------------------------------------- ssum

  private def ssumKeys(keyMode: String): Seq[String] = keyMode match {
    case "type"       => Seq("event_type")
    case "grain"      => Seq("bucket")
    case "type_grain" => Seq("event_type", "bucket")
  }

  private def ssumPlan(keyMode: String, grain: String, nB: Int): Plan = {
    val keys = ssumKeys(keyMode)
    Plan(
      "ssum", s"keyMode=$keyMode grain=$grain nBatches=$nB",
      stage = (s, d, base) => {
        val inDir = inDirOf(base)
        val ev = events(s, d).select(
          col("event_type"),
          date_trunc(grain, col("ts")).as("bucket"),
          col("value").cast(DecimalType(18, 2)).as("value"),
          lit(1L).as("n"),
          col("event_id"))
        val now = System.currentTimeMillis()
        (0 until nB).foreach { b =>
          stage(base, inDir,
            ev.filter(col("event_id") % nB === b)
              .select((keys.map(col) :+ col("value") :+ col("n")): _*),
            f"$b%03d_batch.parquet", now - 200000 + b * 20000)
        }
      },
      start = (s, base) => StreamingIngest.maintainSummingParts(
        fileStream(s, base), keys, Seq("value", "n"), storePath(base),
        ckptPath(base), Trigger.AvailableNow()),
      read = (s, base) => MergeStore.readSummed(s, storePath(base), keys,
          Seq("value", "n"))
        .select((keys.map(col) :+ col("value").cast("double").as("total")
          :+ col("n").cast("long").as("n")): _*)
        .orderBy(keys.head, keys.tail: _*),
      sql = OracleSql.streamSummingSql(keyMode, grain))
  }

  private def ssumGen(r: Random): (Plan, Plan) = {
    val keyMode = pick(r, Vector("type", "grain", "type_grain"))
    val grain = pick(r, Vector("hour", "day"))
    val nB = pick(r, Vector(2, 3, 5))
    // the epoch split is deliberately invisible (that IS the proof);
    // the mutation nudges the observable key shape
    val mut =
      if (keyMode == "type") ssumPlan("type_grain", grain, nB)
      else ssumPlan(keyMode, if (grain == "hour") "day" else "hour", nB)
    (ssumPlan(keyMode, grain, nB), mut)
  }

  // ------------------------------------------------------------------ squant

  private val squantQSpace = Vector(
    Seq(0.5), Seq(0.25, 0.75), Seq(0.5, 0.95, 0.99))

  private def squantPlan(qs: Seq[Double], scale: Int, nB: Int): Plan = Plan(
    "squant", s"qs=${qs.mkString(",")} scale=$scale nBatches=$nB",
    stage = (s, d, base) => {
      val inDir = inDirOf(base)
      val ev = events(s, d).select(col("event_type"), col("value"), col("event_id"))
      val now = System.currentTimeMillis()
      (0 until nB).foreach { b =>
        stage(base, inDir,
          ev.filter(col("event_id") % nB === b).drop("event_id"),
          f"$b%03d_batch.parquet", now - 200000 + b * 20000)
      }
    },
    start = (s, base) => StreamingIngest.maintainQuantileParts(
      fileStream(s, base), Seq("event_type"), "value", storePath(base),
      ckptPath(base), scale, Trigger.AvailableNow()),
    read = (s, base) => MergeStore.readQuantiles(s, storePath(base),
      Seq("event_type"), qs, scale).orderBy("event_type"),
    sql = OracleSql.quantileStoreSql(qs, scale))

  private def squantGen(r: Random): (Plan, Plan) = {
    val qs = pick(r, squantQSpace)
    val scale = pick(r, Vector(10, 100))
    val nB = pick(r, Vector(2, 3, 5))
    // mutation changes the bin width — every percentile shifts grid
    (squantPlan(qs, scale, nB),
      squantPlan(qs, if (scale == 10) 100 else 10, nB))
  }

  // --------------------------------------------------------------- dispatch

  private val families: Vector[Random => (Plan, Plan)] = Vector(
    ssessionGen, swindowGen, sjoinGen, slateGen, slateSessionGen,
    sdedupGen, ssumGen, squantGen)

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic: same seed, same (plan, mutated plan) pair. */
  def plans(seed: Long): (Plan, Plan) = {
    val r = new Random(mix64(seed))
    families(r.nextInt(families.size))(r)
  }

  /** Deterministic: same seed, same (streaming run, SQL) pair. */
  def generate(seed: Long): Generated = {
    val (p, m) = plans(seed)
    toGenerated(p, m)
  }

  /** Battery seeds — one per family, scanned ([[StreamFuzzScan]]) for
    * non-emptiness + mutation sensitivity at sf0.001. */
  private[graft] val batterySeeds: Vector[(String, Long)] = Vector(
    ("q236_streamfuzz_ssession", 10L),
    ("q237_streamfuzz_swindow", 32L),
    ("q238_streamfuzz_sjoin", 2L),
    ("q239_streamfuzz_slate", 6L),
    ("q240_streamfuzz_slatesession", 9L),
    ("q241_streamfuzz_sdedup", 19L),
    ("q242_streamfuzz_ssum", 37L),
    ("q243_streamfuzz_squant", 25L))

  private[graft] def expectedFamily(name: String): String =
    name.substring("q2NN_streamfuzz_".length)

  val queries: Map[String, Q] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).query
  }: _*)

  val oracles: Map[String, String] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).sql
  }: _*)
}
