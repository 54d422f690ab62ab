package graft.streaming

import graft.store.TableCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  test("ingestStream: closed NDJSON files land in the catalog, each file once") {
    val base = Files.createTempDirectory("graft-stream").toString
    val closed = s"$base/closed/1/ev"
    new java.io.File(closed).mkdirs()
    Files.writeString(java.nio.file.Path.of(closed, "a.ndjson"),
      "{\"u\": \"alice\", \"__row_id\": 1}\n{\"u\": \"bob\", \"__row_id\": 2}\n")
    val catalog = new TableCatalog(s"$base/tables")

    val q1 = StreamingIngest.ingestStream(spark, catalog, "1", "ev", closed, s"$base/ckpt")
    q1.awaitTermination()
    assert(catalog.read(spark, "1", "ev").count() == 2)

    // second file arrives WITH A NEW COLUMN; the checkpoint means the
    // first file is not re-read, and the new key is ingested via the
    // evolve path rather than silently dropped
    Files.writeString(java.nio.file.Path.of(closed, "b.ndjson"),
      "{\"u\": \"carol\", \"lang\": \"en\", \"__row_id\": 3}\n")
    val q2 = StreamingIngest.ingestStream(spark, catalog, "1", "ev", closed, s"$base/ckpt")
    q2.awaitTermination()
    val rows = catalog.read(spark, "1", "ev").orderBy("__row_id")
      .select("u", "lang").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("alice", null), ("bob", null), ("carol", "en")))
  }

  test("ingestStream: schema evolves MID-STREAM — new and widened columns never dropped") {
    val base = Files.createTempDirectory("graft-stream-evo").toString
    val closed = s"$base/closed/1/evo"
    new java.io.File(closed).mkdirs()
    val catalog = new TableCatalog(s"$base/tables")
    // long-running stream (processing-time trigger), files appear over time
    val q = StreamingIngest.ingestStream(spark, catalog, "1", "evo", closed,
      s"$base/ckpt", trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      Files.writeString(java.nio.file.Path.of(closed, "a.ndjson"),
        "{\"v\": 1, \"__row_id\": 1}\n")
      q.processAllAvailable()
      assert(catalog.schema("1", "evo").get("v").dataType == LongType)
      // mid-stream: a NEW column appears and v WIDENS long -> double
      Files.writeString(java.nio.file.Path.of(closed, "b.ndjson"),
        "{\"v\": 2.5, \"lang\": \"fr\", \"__row_id\": 2}\n")
      q.processAllAvailable()
    } finally q.stop()
    val sch = catalog.schema("1", "evo").get
    assert(sch("v").dataType == DoubleType, "v must widen long -> double mid-stream")
    assert(sch.fieldNames.contains("lang"), "new mid-stream column must be ingested")
    val rows = catalog.read(spark, "1", "evo").orderBy("__row_id")
      .select("v", "lang").collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(rows == Seq((1.0, null), (2.5, "fr")))
  }

  test("windowedCounts: tumbling windows with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "k", "value")
    val counts = StreamingIngest.windowedCounts(events, "ts", "k", "10 minutes", "5 minutes")
    val q = counts.writeStream.outputMode("append").format("memory").queryName("wc").start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 00:04:00"), "a", 2.0),
      (Timestamp.valueOf("2024-01-01 00:11:00"), "b", 5.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the first windows
    mem.addData((Timestamp.valueOf("2024-01-01 01:00:00"), "a", 0.0))
    q.processAllAvailable()
    val rows = spark.sql("select k, n, total from wc order by k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    q.stop()
    assert(rows.contains(("a", 2L, 3.0))) // 00:00-00:10 window for key a
    assert(rows.contains(("b", 1L, 5.0)))
  }

  test("materializeWindowedCounts: finalized windows land in a queryable catalog table, once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft-mv").toString
    val catalog = new TableCatalog(s"$base/tables")
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "k", "value")
    val q = StreamingIngest.materializeWindowedCounts(catalog, "1", "mv", events,
      "ts", "k", "10 minutes", "5 minutes", s"$base/ckpt")
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:01:00"), "a", 1.0),
        (Timestamp.valueOf("2024-01-01 00:04:00"), "a", 2.0),
        (Timestamp.valueOf("2024-01-01 00:11:00"), "b", 5.0))
      q.processAllAvailable()
      // nothing finalized yet: watermark hasn't passed the first window,
      // so not even the table exists
      assert(!catalog.listTables("1").contains("mv"))
      // advance the watermark far enough to close both windows
      mem.addData((Timestamp.valueOf("2024-01-01 01:00:00"), "c", 0.0))
      q.processAllAvailable()
      // a late event beyond the watermark must NOT reopen a closed window
      mem.addData((Timestamp.valueOf("2024-01-01 00:02:00"), "a", 99.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = catalog.read(spark, "1", "mv")
      .select("k", "n", "total").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("a", 2L, 3.0), ("b", 1L, 5.0)),
      s"materialized view rows were $rows")
    // the table is a plain catalog table: SQL-queryable, compactable
    assert(catalog.listTables("1").contains("mv"))
  }

  test("intervalJoin: stream-stream join pairs within the time bounds, batch-equivalent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lMem = MemoryStream[(Timestamp, String, Long)]
    val rMem = MemoryStream[(Timestamp, String, Double)]
    val joined = StreamingIngest.intervalJoin(
      lMem.toDF().toDF("lts", "k", "click_id"),
      rMem.toDF().toDF("rts", "k", "err_val"),
      key = "k", leftTime = "lts", rightTime = "rts",
      watermark = "10 minutes", before = "5 minutes", after = "5 minutes")
    val q = joined.select("click_id", "err_val").writeStream
      .format("memory").queryName("ij_out").outputMode("append").start()
    try {
      def t(m: String) = Timestamp.valueOf(s"2024-01-01 00:$m:00")
      lMem.addData((t("10"), "a", 1L), (t("30"), "a", 2L), (t("10"), "b", 3L))
      rMem.addData(
        (t("12"), "a", 0.5),  // within 5m of click 1
        (t("20"), "a", 0.7),  // matches neither (10m from both)
        (t("28"), "a", 0.9),  // within 5m of click 2
        (t("13"), "c", 1.1))  // key with no clicks
      q.processAllAvailable()
      val got = spark.table("ij_out").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 0.5), (2L, 0.9)), got)
    } finally q.stop()
  }

  test("intervalJoin left_outer: unmatched clicks surface with nulls once the watermark proves it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lMem = MemoryStream[(Timestamp, String, Long)]
    val rMem = MemoryStream[(Timestamp, String, Double)]
    val joined = StreamingIngest.intervalJoin(
      lMem.toDF().toDF("lts", "k", "click_id"),
      rMem.toDF().toDF("rts", "k", "err_val"),
      key = "k", leftTime = "lts", rightTime = "rts",
      watermark = "1 minute", before = "5 minutes", after = "5 minutes",
      joinType = "left_outer")
    val q = joined.select("click_id", "err_val").writeStream
      .format("memory").queryName("ij_outer").outputMode("append").start()
    try {
      def t(m: String) = Timestamp.valueOf(s"2024-01-01 00:$m:00")
      lMem.addData((t("10"), "a", 1L), (t("11"), "b", 2L)) // b never matches
      rMem.addData((t("12"), "a", 0.5))
      q.processAllAvailable()
      // push both watermarks far past every interval edge so the
      // unmatched left row can be PROVEN matchless and emitted
      lMem.addData((t("59"), "zz", 99L))
      rMem.addData((t("59"), "zz", 9.9))
      q.processAllAvailable()
      lMem.addData((Timestamp.valueOf("2024-01-01 02:00:00"), "zz", 100L))
      rMem.addData((Timestamp.valueOf("2024-01-01 02:00:00"), "zz", 10.0))
      q.processAllAvailable()
      val got = spark.table("ij_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
      assert(got.contains((1L, Some(0.5))), s"matched pair missing: $got")
      assert(got.contains((2L, None)), s"unmatched left row never emitted: $got")
    } finally q.stop()
  }

  test("maintainDistinctSketches: stream feeds the sketch store; replay moves no estimate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft-sksink").toString
    val store = s"$base/store"
    val mem = MemoryStream[(String, String, Long)]
    val events = mem.toDF().toDF("day", "g", "user")
    val data = (0 until 3000).map(i => (s"day${i % 3}", s"g${i % 2}", (i * 13L) % 500L))

    val q = StreamingIngest.maintainDistinctSketches(events, Seq("g"), "user",
      store, org.apache.spark.sql.functions.col("day"), s"$base/ckpt")
    try { mem.addData(data); q.processAllAvailable() } finally q.stop()

    def estimates(): Map[String, Long] =
      graft.store.SketchStore.estimateDistinct(spark, store, Seq("g"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val first = estimates()
    // estimates equal a from-scratch sketch over the same rows
    val direct = data.toDF("day", "g", "user").groupBy("g")
      .agg(org.apache.spark.sql.functions.hll_sketch_estimate(
        org.apache.spark.sql.functions.hll_sketch_agg(
          org.apache.spark.sql.functions.col("user"),
          org.apache.spark.sql.functions.lit(12))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == direct, s"stream-built store diverged: $first vs $direct")

    // at-least-once replay: a fresh stream over the SAME data appends
    // duplicate sketches — union is a register-wise max, estimates stay
    val mem2 = MemoryStream[(String, String, Long)]
    val q2 = StreamingIngest.maintainDistinctSketches(mem2.toDF().toDF("day", "g", "user"),
      Seq("g"), "user", store, org.apache.spark.sql.functions.col("day"), s"$base/ckpt2")
    try { mem2.addData(data); q2.processAllAvailable() } finally q2.stop()
    assert(estimates() == first, "replayed appends moved an estimate")
  }

  test("maintainSummingParts: live rollup MV; re-applying a committed epoch is exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft-sumsink").toString
    val store = s"$base/store"
    val mem = MemoryStream[(String, Long)]
    val batch1 = (0 until 500).map(i => (s"g${i % 3}", i.toLong))
    val batch2 = (500 until 900).map(i => (s"g${i % 3}", i.toLong))

    val q = StreamingIngest.maintainSummingParts(mem.toDF().toDF("g", "amount"),
      Seq("g"), Seq("amount"), store, s"$base/ckpt")
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable() // second epoch: a second part
    } finally q.stop()

    def totals(): Map[String, Long] =
      graft.store.MergeStore.readSummed(spark, store, Seq("g"), Seq("amount"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = (batch1 ++ batch2).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val first = totals()
    assert(first == direct, s"stream-built rollup diverged: $first vs $direct")
    // more than one epoch part must actually exist for the merge claim
    assert(new java.io.File(store).listFiles.count(_.getName.startsWith("epoch=")) >= 2)

    // crash-replay: an epoch re-executes with the SAME id and data —
    // overwrite addressing makes the re-apply invisible (summing has no
    // idempotent algebra; a plain append here would double-count)
    StreamingIngest.writeSummingPart(batch1.toDF("g", "amount"),
      Seq("g"), Seq("amount"), store, epochId = 0L)
    assert(totals() == first, "re-applied epoch double-counted")
  }

  test("maintainQuantileParts: live percentile MV; re-applying a committed epoch is exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft-qsink").toString
    val store = s"$base/store"
    val mem = MemoryStream[(String, Double)]
    val batch1 = (1 to 6).map(i => ("g", i / 10.0))
    val batch2 = (7 to 10).map(i => ("g", i / 10.0))

    val q = StreamingIngest.maintainQuantileParts(mem.toDF().toDF("g", "v"),
      Seq("g"), "v", store, s"$base/ckpt")
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    def p(): (Double, Double) =
      graft.store.MergeStore.readQuantiles(spark, store, Seq("g"), Seq(0.5, 0.95))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).head
    // values 0.1..1.0: p50 = 0.5 (5th of 10), p95 = 1.0 (10th)
    val first = p()
    assert(first == ((0.5, 1.0)), s"streamed percentiles wrong: $first")
    assert(new java.io.File(store).listFiles.count(_.getName.startsWith("epoch=")) >= 2)
    // crash-replay with the same epoch id: overwrite addressing keeps it
    // exactly-once (a plain append would shift every rank)
    graft.store.MergeStore.writeQuantileEpoch(batch1.toDF("g", "v"),
      Seq("g"), "v", store, scale = 100, epochId = 0L)
    assert(p() == first, "re-applied epoch moved a percentile")
  }

  test("maintainKllParts: live sketch MV; n exact, replayed epoch exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft-kllsink").toString
    val store = s"$base/store"
    val mem = MemoryStream[(String, Double)]
    val batch1 = (1 to 500).map(i => ("g", i.toDouble))
    val batch2 = (501 to 1000).map(i => ("g", i.toDouble))

    val q = StreamingIngest.maintainKllParts(mem.toDF().toDF("g", "v"),
      Seq("g"), "v", store, s"$base/ckpt")
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    def read(): (Long, Double) =
      graft.store.MergeStore.readKllQuantiles(spark, store, Seq("g"), Seq(0.5))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    val first = read()
    assert(first._1 == 1000L, s"n must be exact through streamed sketch parts: $first")
    assert(math.abs(first._2 - 500.0) <= 30.0, s"streamed p50 off the corridor: $first")
    assert(new java.io.File(store).listFiles.count(_.getName.startsWith("epoch=")) >= 2)
    // crash-replay: same epoch id + data — overwrite addressing keeps n
    // exact (an append would double-weight the epoch's rows)
    graft.store.MergeStore.writeKllEpoch(batch1.toDF("g", "v"),
      Seq("g"), "v", store, k = 200, epochId = 0L)
    assert(read()._1 == 1000L, "re-applied epoch double-weighted the sketch")
  }

  test("firstOccurrenceDedup: custom mapGroupsWithState drops repeat keys across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = StreamingIngest.firstOccurrenceDedup(mem.toDS())
    val q = out.writeStream.outputMode("update").format("memory").queryName("fo").start()
    mem.addData(("k1", "first"), ("k1", "dupe-same-batch"), ("k2", "second"))
    q.processAllAvailable()
    mem.addData(("k1", "dupe-later-batch"), ("k3", "third"))
    q.processAllAvailable()
    val rows = spark.sql("select * from fo").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(rows == Set(("k1", "first"), ("k2", "second"), ("k3", "third")))
  }

  test("firstOccurrenceDedup TTL: expired keys pass again, live keys still dedup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // tiny TTL: the seen-set entry expires between batches, so the SAME
    // key passes again — the state-bound contract a 100 TB/day stream
    // relies on (duplicates only dedup within the TTL horizon).
    // NOTE: with a pending ProcessingTimeTimeout the engine re-triggers
    // batches continuously to check deadlines, so processAllAvailable
    // never quiesces (probed empirically — it spins hundreds of
    // no-data batches); the test polls the sink instead.
    def waitFor(table: String, want: Set[(String, String)]): Set[(String, String)] = {
      val deadline = System.currentTimeMillis() + 60000
      var got = Set.empty[(String, String)]
      while (!want.subsetOf(got) && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        got = spark.sql(s"select * from $table").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      }
      got
    }
    val mem = MemoryStream[(String, String)]
    val out = StreamingIngest.firstOccurrenceDedup(mem.toDS(),
      stateTtl = Some("50 milliseconds"))
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("fo_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()
    try {
      mem.addData(("k1", "first"))
      assert(waitFor("fo_ttl", Set(("k1", "first"))).contains(("k1", "first")))
      Thread.sleep(500) // let k1's processing-time timeout expire
      mem.addData(("nudge", "x")) // this batch also fires k1's timeout
      assert(waitFor("fo_ttl", Set(("nudge", "x"))).contains(("nudge", "x")))
      mem.addData(("k1", "after-ttl"))
      val rows = waitFor("fo_ttl",
        Set(("k1", "first"), ("nudge", "x"), ("k1", "after-ttl")))
      // k1 re-passed after its seen-state expired — the TTL contract
      assert(rows == Set(("k1", "first"), ("nudge", "x"), ("k1", "after-ttl")),
        s"got $rows")
    } finally q.stop()

    // opposite pole: a generous TTL still dedups (the timeout never
    // fires, state survives across batches)
    val mem2 = MemoryStream[(String, String)]
    val out2 = StreamingIngest.firstOccurrenceDedup(mem2.toDS(),
      stateTtl = Some("1 hour"))
    val q2 = out2.writeStream.outputMode("update").format("memory")
      .queryName("fo_ttl_long")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()
    try {
      mem2.addData(("k1", "first"))
      assert(waitFor("fo_ttl_long", Set(("k1", "first"))).contains(("k1", "first")))
      mem2.addData(("k1", "dupe"), ("k2", "second"))
      val rows2 = waitFor("fo_ttl_long", Set(("k1", "first"), ("k2", "second")))
      assert(rows2 == Set(("k1", "first"), ("k2", "second")), s"got $rows2")
    } finally q2.stop()
  }

  test("sessionCounts: gap sessions merge nearby events per key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "k", "value")
    val sessions = StreamingIngest.sessionCounts(events, "ts", "k", "5 minutes", "1 minute")
    val q = sessions.writeStream.outputMode("append").format("memory").queryName("sc").start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 00:00:00"), "a", 0.0),
      (Timestamp.valueOf("2024-01-01 00:03:00"), "a", 0.0), // same session
      (Timestamp.valueOf("2024-01-01 00:20:00"), "a", 0.0)) // new session
    q.processAllAvailable()
    mem.addData((Timestamp.valueOf("2024-01-01 02:00:00"), "a", 0.0)) // close state
    q.processAllAvailable()
    val rows = spark.sql("select k, n_events from sc order by session_start").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    q.stop()
    assert(rows.take(2) == Seq(("a", 2L), ("a", 1L)))
  }
}
