package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MergeStoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  private def freshDir(): String = {
    val f = java.nio.file.Files.createTempDirectory("graft_mergestore").toFile
    f.delete() // store writes want a non-existent path for the first part
    f.toString
  }

  test("latestByKey: upserts win, tombstones surface, equal versions break by payload desc") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "a", false), // overwritten by v3
      (1L, 3L, "c", false),
      (2L, 1L, "x", false), // deleted at v2: tombstone row must win
      (2L, 2L, "x", true),
      (3L, 5L, "p", false), // equal version: "q" > "p" wins deterministically
      (3L, 5L, "q", false))
      .toDF("k", "version", "payload", "deleted")
    def run(d: org.apache.spark.sql.DataFrame) =
      MergeStore.latestByKey(d, Seq("k"), "version")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
    val got = run(df)
    assert(got == Seq((1L, 3L, "c", false), (2L, 2L, "x", true), (3L, 5L, "q", false)))
    // the delete pattern: callers filter tombstones AFTER the merge
    assert(run(df).filter(!_._4).map(_._1) == Seq(1L, 3L))
    // pure function of content, not of partition layout
    assert(run(df.repartition(7)) == got)
  }

  test("append/readLatest roundtrip; compactLatest changes nothing a reader can see") {
    import spark.implicits._
    val path = freshDir()
    MergeStore.appendPart(
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0)).toDF("k", "version", "v"), path)
    MergeStore.appendPart(
      Seq((2L, 2L, 25.0), (4L, 1L, 40.0)).toDF("k", "version", "v"), path)
    def view() = MergeStore.readLatest(spark, path, Seq("k"), "version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val before = view()
    assert(before == Seq((1L, 1L, 10.0), (2L, 2L, 25.0), (3L, 1L, 30.0), (4L, 1L, 40.0)))
    MergeStore.compactLatest(spark, path, Seq("k"), "version")
    assert(view() == before, "compaction must be observationally a no-op")
    // idempotent: compacting a compacted store still changes nothing
    MergeStore.compactLatest(spark, path, Seq("k"), "version")
    assert(view() == before)
    // and a post-compaction upsert still wins
    MergeStore.appendPart(Seq((1L, 9L, 11.0)).toDF("k", "version", "v"), path)
    assert(view().head == ((1L, 9L, 11.0)))
  }

  test("readSummed: any disjoint split of the rows merges to the same totals; compact invariant") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (s"g${i % 7}", i, java.math.BigDecimal.valueOf(i, 1)))
    def stage(split: ((String, Long, java.math.BigDecimal)) => Int): String = {
      val path = freshDir()
      rows.groupBy(split).foreach { case (_, part) =>
        val partial = part.toDF("g", "n", "x")
          .withColumn("x", col("x").cast("decimal(18,2)"))
          .groupBy("g").agg(count(lit(1)).as("n"), sum(col("x")).as("x"))
        MergeStore.appendPart(partial, path)
      }
      path
    }
    def totals(path: String) =
      MergeStore.readSummed(spark, path, Seq("g"), Seq("n", "x"))
        .select(col("g"), col("n").cast("long"), col("x").cast("string"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
    val byParity = totals(stage(t => (t._2 % 2).toInt))
    val byRange = totals(stage(t => if (t._2 <= 33) 0 else if (t._2 <= 80) 1 else 2))
    assert(byParity == byRange, "part boundaries leaked into the merged sums")
    val path = stage(t => (t._2 % 5).toInt)
    val before = totals(path)
    assert(before == byParity)
    MergeStore.compactSummed(spark, path, Seq("g"), Seq("n", "x"))
    assert(totals(path) == before, "summing compaction must be observationally a no-op")
  }

  test("tombstone delete + compact: readers never see deleted keys; compaction physically purges them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = freshDir()
    MergeStore.appendPart(Seq((1L, "a", false, 1L), (2L, "b", false, 1L), (3L, "c", false, 1L))
      .toDF("k", "payload", "deleted", "version"), path)
    // GDPR-style erasure of k=2: a tombstone append, no rewrite
    MergeStore.appendPart(Seq((2L, null.asInstanceOf[String], true, 2L))
      .toDF("k", "payload", "deleted", "version"), path)
    def visible() = MergeStore.readLatest(spark, path, Seq("k"), "version")
      .filter(!col("deleted")).select("k", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(visible() == Set((1L, "a"), (3L, "c")))
    // before compaction the superseded payload still exists on disk...
    val rawBefore = spark.read.parquet(path).filter(col("k") === 2L).collect()
    assert(rawBefore.length == 2, "expected payload + tombstone before compaction")
    // ...compaction purges it: only the tombstone survives physically
    MergeStore.compactLatest(spark, path, Seq("k"), "version")
    val rawAfter = spark.read.parquet(path).filter(col("k") === 2L)
      .collect().map(r => (r.getAs[String]("payload"), r.getAs[Boolean]("deleted")))
    assert(rawAfter.toSeq == Seq((null, true)),
      s"superseded payload must be physically gone after compaction, got ${rawAfter.toSeq}")
    assert(visible() == Set((1L, "a"), (3L, "c")), "compaction changed the reader's view")
  }

  test("quantile store: hand-computed type-1 quantiles; part splits and compaction are invisible") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key A: values 0.10 .. 1.00 in steps of 0.10 (10 rows) -> p50 = 0.50
    // (5th of 10 at cum>=5), p95 = 1.00 (ceil(9.5)=10th); key B: constant
    val rows = (1 to 10).map(i => ("A", i / 10.0)) ++ Seq(("B", 0.42), ("B", 0.42))
    def quantiles(path: String) =
      MergeStore.readQuantiles(spark, path, Seq("k"), Seq(0.5, 0.95), scale = 100)
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // one part holding everything
    val p1 = freshDir()
    MergeStore.writeQuantilePart(rows.toDF("k", "v"), Seq("k"), "v", p1)
    val whole = quantiles(p1)
    assert(whole("A") == ((0.5, 1.0)), s"got ${whole("A")}")
    assert(whole("B") == ((0.42, 0.42)))
    // any split into parts merges to the same answer
    val p2 = freshDir()
    val (left, right) = rows.zipWithIndex.partition(_._2 % 2 == 0)
    MergeStore.writeQuantilePart(left.map(_._1).toDF("k", "v"), Seq("k"), "v", p2)
    MergeStore.writeQuantilePart(right.map(_._1).toDF("k", "v"), Seq("k"), "v", p2)
    assert(quantiles(p2) == whole, "two-part store must answer like the one-part store")
    // compaction is observationally invisible
    MergeStore.compactSummed(spark, p2, Seq("k", "__vb"), Seq("__cnt"))
    assert(quantiles(p2) == whole, "compaction moved a quantile")
    // the documented error bar: quantization lands within 1/(2*scale)
    val p3 = freshDir()
    MergeStore.writeQuantilePart(Seq(("C", 0.123), ("C", 0.127)).toDF("k", "v"),
      Seq("k"), "v", p3)
    val c = quantiles(p3)("C")
    assert(math.abs(c._1 - 0.123) <= 0.005 && math.abs(c._2 - 0.127) <= 0.005)
  }

  test("quantile store property: random part splits always answer like the whole") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val rows = (1 to 60).map(i => (s"k${i % 3}", rnd.nextInt(200) / 100.0))
    def quantiles(path: String) =
      MergeStore.readQuantiles(spark, path, Seq("k"), Seq(0.25, 0.5, 0.9))
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val whole = {
      val p = freshDir()
      MergeStore.writeQuantilePart(rows.toDF("k", "v"), Seq("k"), "v", p)
      quantiles(p)
    }
    (1 to 4).foreach { trial =>
      val p = freshDir()
      rows.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(4))).values
        .foreach(part => MergeStore.writeQuantilePart(part.toDF("k", "v"), Seq("k"), "v", p))
      assert(quantiles(p) == whole, s"random split trial $trial diverged from the whole")
    }
  }

  test("quantile rank test is exact where float ceil overshoots; nulls are ignored") {
    import spark.implicits._
    // q=0.07 over 100 rows: 0.07*100 = 7.000000000000001 in IEEE, so a
    // float ceil would demand rank 8; the type-1 quantile is the 7th
    // smallest (ceil over the reals). Values 0.01..1.00 -> p7 = 0.07.
    val p = freshDir()
    MergeStore.writeQuantilePart((1 to 100).map(i => ("k", i / 100.0)).toDF("k", "v"),
      Seq("k"), "v", p)
    val got = MergeStore.readQuantiles(spark, p, Seq("k"), Seq(0.07))
      .collect().map(_.getDouble(1)).head
    assert(got == 0.07, s"float-ceil overshoot: expected the 7th value 0.07, got $got")
    // nulls never bin: they neither shift ranks nor surface as results
    val pn = freshDir()
    MergeStore.writeQuantilePart(
      Seq(("k", Some(1.0)), ("k", None), ("k", None)).toDF("k", "v"),
      Seq("k"), "v", pn)
    val gn = MergeStore.readQuantiles(spark, pn, Seq("k"), Seq(0.5))
      .collect().map(_.getDouble(1)).head
    assert(gn == 1.0, s"null values must be ignored, got $gn")
  }

  test("scd2: changelog becomes half-open validity intervals; ties collapse to zero length") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 12:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "c"), // same ts: seq decides
      (1L, ts("2024-01-01 15:00:00"), 4L, "d"),
      (2L, ts("2024-01-01 09:00:00"), 5L, "x")) // single change: current
      .toDF("k", "ts", "seq", "attr")
    def run(d: org.apache.spark.sql.DataFrame) =
      MergeStore.scd2(d, Seq("k"), "ts", "seq")
        .orderBy("k", "valid_from", "seq")
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("attr"),
          r.getAs[java.sql.Timestamp]("valid_from").toString,
          Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.toString),
          r.getAs[Boolean]("is_current"))).toSeq
    val got = run(changes)
    assert(got == Seq(
      (1L, "a", "2024-01-01 10:00:00.0", Some("2024-01-01 12:00:00.0"), false),
      // the earlier tie is a zero-length interval; the later one carries
      (1L, "b", "2024-01-01 12:00:00.0", Some("2024-01-01 12:00:00.0"), false),
      (1L, "c", "2024-01-01 12:00:00.0", Some("2024-01-01 15:00:00.0"), false),
      (1L, "d", "2024-01-01 15:00:00.0", None, true),
      (2L, "x", "2024-01-01 09:00:00.0", None, true)))
    assert(run(changes.repartition(5)) == got)
    // as-of probe: the interval containing 13:00 is "c"
    val asOf = MergeStore.scd2(changes, Seq("k"), "ts", "seq")
      .filter(col("k") === 1L && col("valid_from") <= ts("2024-01-01 13:00:00") &&
        (col("valid_to").isNull || col("valid_to") > ts("2024-01-01 13:00:00")))
      .select("attr").collect().map(_.getString(0)).toSeq
    assert(asOf == Seq("c"))
  }

  private def epochDirs(path: String): Set[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
      .map(_.getName).toSet

  test("compactEpochs: preserves the epoch layout, fences crash-replays of folded epochs") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val path = freshDir()
    def part(epoch: Long, rows: (String, Long)*): Unit =
      StreamingIngest.writeSummingPart(rows.toDF("g", "n"), Seq("g"), Seq("n"), path, epoch)
    part(0L, ("a", 1L), ("b", 2L))
    part(1L, ("a", 10L))
    part(2L, ("b", 20L), ("c", 30L))
    def totals() = MergeStore.readSummed(spark, path, Seq("g"), Seq("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val before = totals()
    assert(before == Seq(("a", 11L), ("b", 22L), ("c", 30L)))
    MergeStore.compactEpochs(spark, path, Seq("g"), Seq("n"))
    assert(totals() == before, "epoch compaction must be observationally a no-op")
    assert(epochDirs(path) == Set("epoch=-1"),
      s"folded parts must live under the reserved epoch, got ${epochDirs(path)}")
    // the replayed-micro-batch crash scenario: epoch 1's write succeeded
    // long ago, its checkpoint commit didn't, the store was compacted in
    // between, and the restarted stream re-presents epoch 1 — the
    // watermark must refuse the write or 'a' double-counts to 21
    part(1L, ("a", 10L))
    assert(totals() == before, "replay of a folded epoch double-counted")
    assert(epochDirs(path) == Set("epoch=-1"), "replay must not resurrect its epoch dir")
    // normal life continues: a NEW epoch past the watermark lands
    part(3L, ("c", 5L))
    assert(totals() == Seq(("a", 11L), ("b", 22L), ("c", 35L)))
    // and a second compaction folds reserved + new epochs alike
    MergeStore.compactEpochs(spark, path, Seq("g"), Seq("n"))
    assert(totals() == Seq(("a", 11L), ("b", 22L), ("c", 35L)))
    assert(epochDirs(path) == Set("epoch=-1"))
    // replaying the post-compaction epoch is fenced by the advanced watermark
    part(3L, ("c", 5L))
    assert(totals() == Seq(("a", 11L), ("b", 22L), ("c", 35L)))
    // single-part store: compaction is a cheap no-op, not a rewrite
    MergeStore.compactEpochs(spark, path, Seq("g"), Seq("n"))
    assert(totals() == Seq(("a", 11L), ("b", 22L), ("c", 35L)))
  }

  test("compactEpochs: an in-flight (uncommitted) epoch dir is excluded from fold, watermark and delete") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val path = freshDir()
    def part(epoch: Long, rows: (String, Long)*): Unit =
      StreamingIngest.writeSummingPart(rows.toDF("g", "n"), Seq("g"), Seq("n"), path, epoch)
    part(0L, ("a", 1L))
    part(1L, ("b", 2L))
    // a live writer mid-flight: epoch=2 exists but holds only the
    // committer's _temporary dir — no _SUCCESS yet. Folding it would
    // capture none of its rows while the watermark advance refuses its
    // eventual commit-replay: silent loss (ADVICE r11 #1).
    val inflight = new java.io.File(s"$path/epoch=2/_temporary")
    assert(inflight.mkdirs())
    MergeStore.compactEpochs(spark, path, Seq("g"), Seq("n"))
    assert(epochDirs(path) == Set("epoch=-1", "epoch=2"),
      s"in-flight epoch must survive compaction untouched, got ${epochDirs(path)}")
    assert(MergeStore.compactedWatermark(spark, path) == 1L,
      "watermark must not advance past an uncommitted epoch")
    // the in-flight write now commits (the writer's overwrite replaces
    // the _temporary shell) and its rows are visible, not fenced
    part(2L, ("a", 5L))
    val totals = MergeStore.readSummed(spark, path, Seq("g"), Seq("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(totals == Seq(("a", 6L), ("b", 2L)),
      s"committed-after-compaction epoch lost: $totals")
  }

  test("replay fence is keyed on query identity: same query skips, fresh query fails loudly") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    val path = freshDir()
    val sc = spark.sparkContext
    def part(epoch: Long, rows: (String, Long)*): Unit =
      StreamingIngest.writeSummingPart(rows.toDF("g", "n"), Seq("g"), Seq("n"), path, epoch)
    def totals() = MergeStore.readSummed(spark, path, Seq("g"), Seq("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    try {
      // query A maintains the store; its identity rides the thread-local
      // property Structured Streaming sets for foreachBatch bodies
      sc.setLocalProperty("sql.streaming.queryId", "query-A")
      part(0L, ("a", 1L)); part(1L, ("b", 2L))
      MergeStore.compactEpochs(spark, path, Seq("g"), Seq("n"))
      val before = totals()
      // crash-replay from the SAME query: silently skipped (folded already)
      part(1L, ("b", 2L))
      assert(totals() == before, "same-query replay of a folded epoch double-counted")
      // a DIFFERENT query (fresh checkpoint → epoch ids restart at 0)
      // presenting a fenced epoch id carries NEW data — dropping it
      // would silently lose a batch, so the fence must fail loudly
      sc.setLocalProperty("sql.streaming.queryId", "query-B")
      val e = intercept[IllegalStateException] { part(0L, ("c", 7L)) }
      assert(e.getMessage.contains("query-A") && e.getMessage.contains("query-B"),
        s"error must name both query identities: ${e.getMessage}")
      assert(totals() == before, "the refused batch must not have been written")
      // the new query's epochs ABOVE the watermark are ordinary data
      part(5L, ("c", 7L))
      assert(totals() == before :+ (("c", 7L)), "above-watermark epoch from new query lost")
    } finally sc.setLocalProperty("sql.streaming.queryId", null)
  }

  test("KLL store: rank-error bound holds, n exact across part splits, empty-sketch null") {
    import spark.implicits._
    // uniform 1..10000 for one key: every quantile's TRUE value is
    // q*10000; KLL k=200 holds ~1.65% normalized rank error (99%
    // conf), and for uniform data value error == rank error, so a ±3%
    // corridor is a generous-but-meaningful pin
    val n = 10000
    val rows = (1 to n).map(i => ("A", i.toDouble))
    def check(path: String): Unit = {
      val got = MergeStore.readKllQuantiles(spark, path, Seq("k"), Seq(0.25, 0.5, 0.95))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4))).head
      assert(got._1 == "A")
      assert(got._2 == n.toLong, s"n must be EXACT across any part split, got ${got._2}")
      for ((est, truth) <- Seq(got._3 -> 2500.0, got._4 -> 5000.0, got._5 -> 9500.0))
        assert(math.abs(est - truth) <= 0.03 * n,
          s"estimate $est strayed beyond the 3%% rank corridor around $truth")
    }
    val whole = freshDir()
    MergeStore.writeKllPart(rows.toDF("k", "v"), Seq("k"), "v", whole)
    check(whole)
    // three unequal parts merge to the same contract (sketch union)
    val split = freshDir()
    rows.grouped(1700).foreach { part =>
      MergeStore.writeKllPart(part.toDF("k", "v"), Seq("k"), "v", split)
    }
    check(split)
    // nulls are filtered at write (standard percentile semantics): an
    // all-null key writes no sketch row at all
    val nulls = freshDir()
    MergeStore.writeKllPart(
      Seq(("B", Some(1.0)), ("C", None), ("C", None)).toDF("k", "v"),
      Seq("k"), "v", nulls)
    val keys = MergeStore.readKllQuantiles(spark, nulls, Seq("k"), Seq(0.5))
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("B"), s"all-null key must not surface, got $keys")
    // defensive reader contract: an empty sketch has no quantile
    val empty = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    assert(graft.functions.KllQuantile.quantile(empty.toByteArray, 0.5) == null)
    assert(graft.functions.KllN.n(empty.toByteArray) == 0L)
  }

  test("KLL epoch store: compactKllEpochs preserves n exactly, fences replays, admits fresh epochs") {
    import spark.implicits._
    val path = freshDir()
    def part(epoch: Long, rows: (String, Double)*): Unit =
      MergeStore.writeKllEpoch(rows.toDF("k", "v"), Seq("k"), "v", path,
        k = 200, epochId = epoch)
    part(0L, (1 to 500).map(i => ("A", i.toDouble)): _*)
    part(1L, (501 to 1000).map(i => ("A", i.toDouble)): _*)
    def read() = MergeStore.readKllQuantiles(spark, path, Seq("k"), Seq(0.5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).head
    val before = read()
    assert(before._2 == 1000L)
    assert(math.abs(before._3 - 500.0) <= 30.0, s"p50 off: $before")
    MergeStore.compactKllEpochs(spark, path, Seq("k"))
    assert(epochDirs(path) == Set("epoch=-1"))
    val after = read()
    // n is EXACT through union; the p50 estimate may move within the
    // rank corridor (compaction re-unions, and KLL compaction is
    // randomized) — the contract is the bound, not the bytes
    assert(after._2 == 1000L, "compaction must not change n")
    assert(math.abs(after._3 - 500.0) <= 30.0, s"post-compaction p50 off: $after")
    // replay of a folded epoch must not double-weight its rows
    part(1L, (501 to 1000).map(i => ("A", i.toDouble)): _*)
    assert(read()._2 == 1000L, "replayed folded epoch double-counted into the sketch")
    assert(epochDirs(path) == Set("epoch=-1"))
    // a fresh epoch past the watermark lands (n grows by its rows)
    part(2L, (1 to 100).map(i => ("A", 0.5)): _*)
    assert(read()._2 == 1100L, "post-compaction epoch ignored")
  }

  test("compactEpochs on the quantile store: quantiles invariant, replay fenced") {
    import spark.implicits._
    val path = freshDir()
    def part(epoch: Long, rows: (String, Double)*): Unit =
      MergeStore.writeQuantileEpoch(rows.toDF("k", "v"), Seq("k"), "v", path,
        scale = 100, epochId = epoch)
    part(0L, (1 to 5).map(i => ("A", i / 10.0)): _*)
    part(1L, (6 to 10).map(i => ("A", i / 10.0)): _*)
    def q() = MergeStore.readQuantiles(spark, path, Seq("k"), Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val before = q()
    assert(before("A") == ((0.5, 1.0)))
    MergeStore.compactEpochs(spark, path, Seq("k", "__vb"), Seq("__cnt"))
    assert(q() == before, "quantile epoch compaction moved a quantile")
    assert(epochDirs(path) == Set("epoch=-1"))
    // replayed folded epoch: bin counts must not double
    part(1L, (6 to 10).map(i => ("A", i / 10.0)): _*)
    assert(q() == before, "replayed folded epoch doubled its bins")
    // fresh epoch still lands and shifts the distribution: 13 values
    // (0.1 x4, 0.2..1.0), p50 = 7th smallest = 0.4
    part(2L, ("A", 0.1), ("A", 0.1), ("A", 0.1))
    assert(q()("A")._1 == 0.4, s"post-compaction epoch ignored: ${q()}")
  }
}
