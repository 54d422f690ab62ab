package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class OperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("minHashCandidates finds near-identical docs, not unrelated ones") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val df = docs(
      1L -> base,
      2L -> (base + " tonight"),                       // near-dup of 1
      3L -> "completely different text about spark catalyst optimizer rules and physical plans",
      4L -> "unrelated musings on distributed shuffle hash joins at terabyte scale today")
    val pairs = Dedup.minHashCandidates(df, "doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccardPairs computes exact jaccard over distinct shingles") {
    // doc1: shingles {a b c, b c d}; doc2 identical -> jaccard 1.0
    val df = docs(1L -> "a b c d", 2L -> "a b c d", 3L -> "x y z w")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", shingleWidth = 3,
      threshold = 0.5, minShared = 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("sharedShinglePairs sizes its inverted-index exchange from input stats, one exchange only") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // small input: derived count floors at the session setting (4 here)
    val small = docs(1L -> "a b c d", 2L -> "a b c e")
    // large ESTIMATE: a range-backed frame whose optimizer stats exceed
    // 16 MB / 48, so the derived count must rise above the session floor
    val big = spark.range(3000000L)
      .select(col("id").as("doc_id"), concat(lit("w x y z token "), col("id").cast("string")).as("text"))
    def shingleExchangeParts(dfOut: org.apache.spark.sql.DataFrame): Seq[Int] = {
      val executed = dfOut.queryExecution.executedPlan
      val plan = executed match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.toString.contains("shingle") =>
          e.outputPartitioning.numPartitions
      }
    }
    val smallParts = shingleExchangeParts(Dedup.containmentPairs(small, "doc_id", "text", minShared = 1))
    assert(smallParts == Seq(4), s"small input must keep the session plan, got $smallParts")
    val bigParts = shingleExchangeParts(Dedup.containmentPairs(big, "doc_id", "text", minShared = 1))
    // exactly ONE shingle exchange (the repartition is absorbed by the
    // group-by, not stacked under a second one), sized above the floor
    assert(bigParts.length == 1, s"expected one shingle exchange, got $bigParts")
    assert(bigParts.head > 4 && bigParts.head <= 4096,
      s"derived partition count must exceed the session floor, got ${bigParts.head}")
  }

  test("simHashPairs finds hamming-close docs") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val df = docs(1L -> base, 2L -> (base + " thirteen"),
      3L -> "entirely disjoint vocabulary words alpha beta gamma delta epsilon zeta eta")
    val pairs = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("hot-bucket corpus: caps bound the pair explosion and complete") {
    // 400 identical docs -> every band bucket has 400 members. With
    // cap=50 the bucket is dropped entirely; uncapped this would be
    // 79,800 pairs per band. The op must finish and respect the cap.
    val hot = docs((1L to 400L).map(i => i -> "same boilerplate text repeated forever and ever on every page"): _*)
    val capped = Dedup.minHashCandidates(hot, "doc_id", "text", maxBucketSize = 50).count()
    assert(capped == 0) // hot bucket dropped, not exploded
    val cappedNg = Dedup.ngramJaccardPairs(hot, "doc_id", "text", maxDf = 50).count()
    assert(cappedNg == 0)
    // sanity: with a cap above the cluster size the pairs ARE found
    val small = docs((1L to 10L).map(i => i -> "same boilerplate text repeated forever and ever on every page"): _*)
    assert(Dedup.minHashCandidates(small, "doc_id", "text").count() == 45)
  }

  test("knnJoin and embeddingDupPairs derive dim from data (32-dim corpus)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    def perturb(eps: Float) = base.zipWithIndex.map { case (v, i) => v + eps * (if (i % 2 == 0) 1 else -1) }
    val vecs = Seq(
      (0L, base.toSeq), (1L, perturb(0.01f).toSeq), (2L, perturb(0.02f).toSeq),
      (3L, Array.fill(32)(rnd.nextFloat() * 2 - 1).toSeq),
      (4L, Array.fill(32)(rnd.nextFloat() * 2 - 1).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val knn = SimilaritySearch.knnJoin(df, df, "vec_id", "embedding", k = 1)
    val top = knn.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top(0L) == 1L) // nearest neighbor of base is its tiny perturbation
    val dupes = SimilaritySearch.embeddingDupPairs(df, "vec_id", "embedding", threshold = 0.99)
    val pairs = dupes.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("asof join matches a naive reference on random data (300 rows, duplicate times, sparse keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val leftRows = (1 to 150).map(i => (s"k${rnd.nextInt(12)}", rnd.nextInt(40).toLong, i.toLong))
    val rightRows = (1 to 150).map(i => (s"k${rnd.nextInt(15)}", rnd.nextInt(40).toLong, i * 100L))
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "payload")
    val got = graft.operators.AsofJoin.asof(left, right, Seq("k"), "t", "t", prefix = "r_")
      .select("k", "t", "lid", "r_payload")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // naive reference: max right time <= left time; among equal times the
    // greatest payload (the operator's documented deterministic tie rule)
    val expected = leftRows.map { case (k, t, lid) =>
      val candidates = rightRows.filter(r => r._1 == k && r._2 <= t)
      val best =
        if (candidates.isEmpty) -1L
        else { val mt = candidates.map(_._2).max; candidates.filter(_._2 == mt).map(_._3).max }
      (k, t, lid, best)
    }.toSet
    assert(got == expected)
  }

  test("asof join: latest right row at-or-before left time, per key; left join semantics") {
    import spark.implicits._
    val quotes = Seq( // key, time, px
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 20.0)).toDF("sym", "qt", "px")
    val trades = Seq( // key, time
      ("A", 0L), // before any quote -> null
      ("A", 5L), // exactly at a quote -> 11.0 (<= matches)
      ("A", 7L), // between -> 11.0
      ("A", 99L), // after all -> 12.0
      ("B", 3L), // before B's quote -> null
      ("C", 9L) // key with no quotes -> null
    ).toDF("sym", "tt")
    val out = graft.operators.AsofJoin.asof(trades, quotes, Seq("sym"), "tt", "qt", prefix = "q_")
      .orderBy("sym", "tt")
      .select("sym", "tt", "q_qt", "q_px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", 0L, -1L, -1.0), ("A", 5L, 5L, 11.0), ("A", 7L, 5L, 11.0),
      ("A", 99L, 9L, 12.0), ("B", 3L, -1L, -1.0), ("C", 9L, -1L, -1.0)))
  }

  test("asof direction forward/nearest and tolerance: boundaries inclusive, ties to backward") {
    import spark.implicits._
    val quotes = Seq(("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0)).toDF("sym", "qt", "px")
    val trades = Seq(("A", 0L), ("A", 5L), ("A", 7L), ("A", 99L)).toDF("sym", "tt")
    def run(dir: String, tol: Option[Long] = None) =
      graft.operators.AsofJoin.asof(trades, quotes, Seq("sym"), "tt", "qt",
          prefix = "q_", direction = dir, toleranceMicros = tol)
        .orderBy("tt").select("tt", "q_qt")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq

    // forward: earliest quote at-or-after; t=5 matches itself; 99 -> none
    assert(run("forward") == Seq((0L, 1L), (5L, 5L), (7L, 9L), (99L, -1L)))
    // nearest: 0 -> 1 (only forward); 7 -> between 5 and 9, deltas 2 = 2,
    // tie goes BACKWARD -> 5; 99 -> 9 (only backward)
    assert(run("nearest") == Seq((0L, 1L), (5L, 5L), (7L, 5L), (99L, 9L)))
    // tolerance (numeric time units): backward within 2 — the t=99 match
    // at delta 90 nulls out; delta == tolerance stays (inclusive)
    assert(run("backward", tol = Some(2L)) ==
      Seq((0L, -1L), (5L, 5L), (7L, 5L), (99L, -1L)))
    assert(run("nearest", tol = Some(1L)) ==
      Seq((0L, 1L), (5L, 5L), (7L, -1L), (99L, -1L)))

    // plain backward/forward never do time arithmetic, so ANY orderable
    // time type works — ISO string dates included (regression: the
    // micros twin must stay lazy)
    val sq = Seq(("A", "2024-01-01", 1.0), ("A", "2024-01-05", 2.0)).toDF("sym", "qt", "px")
    val st = Seq(("A", "2024-01-03")).toDF("sym", "tt")
    val sOut = graft.operators.AsofJoin.asof(st, sq, Seq("sym"), "tt", "qt", "q_")
      .select("q_px").head()
    assert(sOut.getDouble(0) == 1.0)

    // fractional numeric times keep their fraction (no long truncation):
    // 5.9 vs backward 5.5 has delta 0.4, which must FAIL tolerance 0 —
    // and nearest must prefer 6.1 (delta 0.2) over 5.5 (delta 0.4)
    val fq = Seq(("A", 5.5, 1L), ("A", 6.1, 2L)).toDF("sym", "qt", "pay")
    val ft = Seq(("A", 5.9)).toDF("sym", "tt")
    def fRun(dir: String, tol: Option[Long]) =
      graft.operators.AsofJoin.asof(ft, fq, Seq("sym"), "tt", "qt", "q_", dir, tol)
        .select("q_pay").head()
    assert(fRun("backward", Some(0L)).isNullAt(0), "0.4 delta must fail tolerance 0")
    assert(fRun("nearest", None).getLong(0) == 2L, "nearest must pick the 0.2-delta side")
  }

  test("bucketed ANN layout: probe filter becomes a partition filter and finds the planted neighbor") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq
    val base = vec()
    val corpus = ((0L, base) +: (1L, base.map(_ + 0.005f)) +:
      (2L to 80L).map(i => i -> vec())).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-bucketed").toString + "/corpus"
    SimilaritySearch.writeBucketed(corpus, "embedding", path, nPlanes = 6)
    val query = base.map(_.toFloat).toArray
    val top = SimilaritySearch.annTopKBucketed(spark, path, "vec_id", "embedding",
      query, k = 2, nPlanes = 6)
    // partition pruning is visible in the physical plan
    val plan = top.queryExecution.executedPlan.treeString
    assert(plan.contains("PartitionFilters: [bucket"), plan.take(800))
    val ids = top.collect().map(_.getLong(0)).toSeq
    assert(ids.take(2) == Seq(0L, 1L))
  }

  test("ivfTopK with nProbe = nCells equals brute force exactly; fewer probes still find the planted neighbor") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq
    val base = vec()
    val near = base.map(_ + 0.01f)
    val corpus = ((0L, base) +: (1L, near) +: (2L to 60L).map(i => i -> vec())).toDF("vec_id", "embedding")
    val query = base.map(_.toFloat).toArray
    val brute = SimilaritySearch.bruteForceTopK(corpus, "vec_id", "embedding", query, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cents = SimilaritySearch.ivfCentroids(corpus, "vec_id", "embedding", 8)
    val allProbes = SimilaritySearch.ivfTopK(corpus, "vec_id", "embedding", query,
      k = 5, nCells = 8, nProbe = 8, centroids = cents)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(allProbes == brute) // full probe == exact
    val few = SimilaritySearch.ivfTopK(corpus, "vec_id", "embedding", query,
      k = 5, nCells = 8, nProbe = 2, centroids = cents)
      .collect().map(_.getLong(0)).toSeq
    assert(few.take(2) == Seq(0L, 1L)) // planted near-dup found in the probed cells
  }

  test("connectedComponents: transitive chains collapse to the minimum id") {
    import spark.implicits._
    // two chains and one isolated pair: 1-2-3-4 (chain), 10-11, 20-21-22 (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L))
  }

  test("connectedComponents: cache footprint stays bounded across many propagation rounds") {
    import spark.implicits._
    // a 12-node chain: min label spreads one hop per round, forcing ~11
    // iterations — the shape that leaked one cached DataFrame per round
    // (round-5 verdict). Bound = a few lingering localCheckpoint RDDs
    // (released by the ContextCleaner on GC), never O(iterations) caches.
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val comp = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 12L).forall(comp(_) == 1L)) // correctness unchanged
    // after return only cleaner-lagged localCheckpoint RDDs may linger;
    // they are reclaimed on GC, so settle before asserting (counting at
    // an arbitrary instant is nondeterministic — seen flaking at 6).
    // The per-round-growth bound lives in the diameter-1000 test, where
    // ~11 rounds make a leak unambiguous over baseline noise.
    var after = spark.sparkContext.getPersistentRDDs.size
    var tries = 0
    while (after - before > 4 && tries < 25) {
      System.gc(); Thread.sleep(200)
      after = spark.sparkContext.getPersistentRDDs.size
      tries += 1
    }
    assert(after - before <= 4,
      s"connectedComponents leaked caches: $before -> $after persistent RDDs (post-GC)")
  }

  test("connectedComponents: a diameter-1000 path converges in O(log n) rounds, not diameter") {
    import spark.implicits._
    // the shape that kills per-hop min-label propagation (1000 rounds
    // needed, maxIterations = 20 -> silent partial labels): star
    // contraction must finish well inside the default bound
    val path = (0L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val comp = Dedup.connectedComponents(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 1000L).forall(comp(_) == 0L), "path must collapse to node 0")
    assert(Dedup.ccRounds <= 12,
      s"star contraction took ${Dedup.ccRounds} rounds on a 1000-path (want ~log2 n)")
    // per-round cache growth check, placed HERE because ~11 rounds make
    // the signal unambiguous: a leak of one cache per round pushes the
    // in-loop high-water mark past `rounds`, while the healthy loop
    // holds two edge sets regardless of round count (bound 8 leaves
    // room for a few cleaner-lagged checkpoint RDDs / baseline noise)
    assert(Dedup.ccRounds >= 5, "path too easy to exercise the growth check")
    assert(Dedup.ccPeakCaches - before <= 8,
      s"CC cache high-water grew with rounds: $before -> ${Dedup.ccPeakCaches} over ${Dedup.ccRounds} rounds")
  }

  test("connectedComponents: reliable-checkpoint mode (checkpoint dir set) — same labels, superseded round files deleted") {
    import spark.implicits._
    // with a checkpoint dir set (any production cluster), rounds
    // checkpoint RELIABLY instead of localCheckpoint — the
    // executor-loss-tolerant path (LocalClusterSpec kills a real
    // executor mid-loop to prove the tolerance; this test pins the
    // mode's correctness + per-round file cleanup)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    try {
      val path = (0L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val comp = Dedup.connectedComponents(path).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L to 1000L).forall(comp(_) == 0L), "path must collapse to node 0")
      assert(Dedup.ccRounds >= 5 && Dedup.ccRounds <= 12,
        s"reliable mode changed convergence: ${Dedup.ccRounds} rounds")
      // every superseded round's rdd-* dir must be deleted; only the
      // returned result's checkpoint remains
      val rddDirs = java.nio.file.Files.walk(ckpt).iterator()
      var remaining = 0
      while (rddDirs.hasNext) {
        if (rddDirs.next().getFileName.toString.startsWith("rdd-")) remaining += 1
      }
      assert(remaining == 1,
        s"expected only the result's checkpoint to remain, found $remaining rdd-* dirs " +
          s"after ${Dedup.ccRounds} rounds — superseded rounds are leaking files")
    } finally
      org.apache.spark.sql.graftbridge.Bridge.clearCheckpointDir(spark.sparkContext)
  }

  test("nearDupClusters: near-identical docs share a cluster, distinct docs are singletons") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val df = docs(
      1L -> base, 2L -> (base + " tonight"), 3L -> base,
      4L -> "completely unrelated content about catalyst optimizer rules and physical plans")
    val clusters = Dedup.nearDupClusters(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(4L) == 4L)
  }

  test("exact dedup (min_by aggregate) keeps exactly the lowest-tiebreak row per key") {
    import spark.implicits._
    val df = Seq(
      ("k1", 5L, "later"), ("k1", 2L, "keep1"), ("k1", 9L, "latest"),
      ("k2", 7L, "keep2"), ("k3", 1L, "keep3"), ("k3", 3L, "later"))
      .toDF("k", "id", "tag")
    val out = Dedup.exact(df, Seq("k"), "id").orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(("k1", 2L, "keep1"), ("k2", 7L, "keep2"), ("k3", 1L, "keep3")))
  }

  test("minhash/simhash candidate pairing matches brute-force block enumeration on random corpora") {
    // the blockPairs kernel (groupBy + capped pair explode) must emit
    // exactly the set of unordered same-block pairs — checked against a
    // driver-side brute force over random banded assignments
    val rnd = new scala.util.Random(3)
    (1 to 3).foreach { trial =>
      val boiler = "exact duplicate boilerplate body shared by every seventh document"
      val texts = (1L to 40L).map { i =>
        val base = s"doc $i word${rnd.nextInt(5)} shared common tokens appear here"
        i -> (if (i % 7 == 0) boiler else base)
      }
      val df = docs(texts: _*)
      val pairs = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 10)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every emitted pair is ordered and unique
      pairs.foreach { case (a, b) => assert(a < b) }
      // the identical-text docs (7,14,21,28,35) must all pair up
      val dupes = (1L to 40L).filter(_ % 7 == 0)
      for (a <- dupes; b <- dupes if a < b) assert(pairs.contains((a, b)), s"missing ($a,$b) trial $trial")
    }
  }

  test("winnowing: shared long passage guarantees shared fingerprints; disjoint texts pair with nothing") {
    val passage = "the quick brown fox jumps over the lazy dog while the band plays on"
    val df = docs(
      1L -> s"intro text alpha beta. $passage and then some trailing words",
      2L -> s"completely different opening here. $passage closing remarks differ",
      3L -> "no shared passage at all: spark catalyst tungsten codegen shuffle partitions")
    val pairs = Dedup.winnowOverlapPairs(df, "doc_id", "text", k = 8, window = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // guarantee: >= window+k-1 shared chars -> shared fps
    // identical docs share (essentially) all fingerprints
    val same = docs(1L -> passage, 2L -> passage)
    val p2 = Dedup.winnowOverlapPairs(same, "doc_id", "text", k = 8, window = 4, minShared = 2)
      .collect()
    assert(p2.length == 1 && p2.head.getLong(2) >= 2)
  }

  test("saltedJoin equals the plain join on a hot-key dataset (inner + left)") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1L to 200L).map(i => (if (i <= 180) "hot" else s"k$i", i)).toDF("k", "lv")
    val right = Seq(("hot", 1), ("k181", 2), ("k185", 3), ("absent", 4)).toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lv", "rv").collect()
        .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
        .toSeq.sorted
    assert(canon(SkewJoin.saltedJoin(left, right, Seq("k"), "lv", 8)) ==
      canon(left.join(right, Seq("k"), "inner")))
    assert(canon(SkewJoin.saltedJoin(left, right, Seq("k"), "lv", 8, "left")) ==
      canon(left.join(right, Seq("k"), "left")))
  }

  test("saltedJoin plan (broadcast off) shuffles on (key, __salt) — the hot key spreads") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1L to 500L).map(i => ("hot", i)).toDF("k", "lv")
      val right = Seq(("hot", 1), ("cold", 2)).toDF("k", "rv")
      val joined = SkewJoin.saltedJoin(left, right, Seq("k"), "lv", 8)
      assert(joined.count() == 500L)
      val plan = joined.queryExecution.executedPlan.toString
      val saltedExchange = plan.linesIterator.exists(l =>
        !l.contains("ReusedExchange") && l.contains("Exchange hashpartitioning") &&
          l.contains("__salt"))
      assert(saltedExchange, s"no (key, __salt)-keyed exchange in:\n${plan.take(1500)}")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("gopherRules: each rule gates independently; boundaries are inclusive") {
    import org.apache.spark.sql.functions.col
    val good = (("the be to of and that have with good words " * 5).trim + " tail") // 51 words, stopword-rich
    val df = docs(
      1L -> good,                                   // passes everything
      2L -> "short doc the be",                     // n_words < 10
      3L -> (Seq.fill(60)("ab").mkString(" ") + " the be"), // mean_word_len < 3
      4L -> (Seq.fill(60)("192.168.000.001").mkString(" ") + " the be"), // mean len > 10
      5L -> ((good + " ") + Seq.fill(30)("###").mkString(" "))) // symbol ratio > 0.1
    val out = TextAnalysis.gopherRules(df, "text", minWords = 10)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false), out)

    // boundary: exactly minWords words and mean length exactly 3.0 both KEEP
    val b = docs(6L -> Seq.fill(10)("the").mkString(" "))
    val row = TextAnalysis.gopherRules(b, "text", minWords = 10).head()
    assert(row.getAs[Long]("n_words") == 10L)
    assert(row.getAs[Double]("mean_word_len") == 3.0)
    assert(row.getAs[Boolean]("keep"))
  }

  test("rareBigramFraction: corpus-global frequencies, zero-bigram docs, partition invariance") {
    // "a b" occurs 3x across the corpus (common at rareMax=2);
    // every other bigram exactly once (rare)
    val df = docs(
      1L -> "a b c",        // bigrams: "a b"(3), "b c"(1)  -> 1/2 rare
      2L -> "a b",          // "a b"                         -> 0/1 rare
      3L -> "x a b y",      // "x a"(1), "a b"(3), "b y"(1)  -> 2/3 rare
      4L -> "solo",         // no bigrams
      5L -> "")             // no tokens
    val got = TextAnalysis.rareBigramFraction(df, "doc_id", "text", rareMax = 2L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((1L, 0L, 0.0)))
    assert(got(3L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
    assert(got(5L) == ((0L, 0L, 0.0)))
    val re = TextAnalysis.rareBigramFraction(df.repartition(7), "doc_id", "text", rareMax = 2L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(re == got)
  }

  test("fingerprint store: incremental probe drops history content, append maintains, buckets prune") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft-fpstore").toString + "/store"
    val history = docs(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta")
    Dedup.writeFingerprintStore(history, "text", path, nBuckets = 8)

    val batch = docs(
      10L -> "alpha beta gamma",     // history dupe -> dropped
      11L -> "totally new content",  // new -> kept
      12L -> "delta epsilon zeta")   // history dupe -> dropped
    val out1 = Dedup.dedupAgainstStore(batch, "text", path)
    assert(out1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(11L))

    // the store scan is pruned to the PROBE's buckets, by literal
    // partition filter — history cost is per-bucket, not per-store
    val scans = out1.queryExecution.executedPlan.collectLeaves().map(_.treeString)
    val storeScan = scans.find(_.contains("fps"))
    assert(storeScan.exists(s => s.contains("PartitionFilters") && s.contains("bucket")),
      s"store scan not bucket-pruned:\n${scans.mkString("\n").take(1200)}")

    // an append with mismatched bucketing would scatter fingerprints
    // where probes never look — must fail loudly, not corrupt
    intercept[IllegalArgumentException] {
      Dedup.writeFingerprintStore(out1, "text", path, nBuckets = 16, mode = "append")
    }

    // append maintenance: accepted batch's fingerprints join the store,
    // so a replay of the same content is now a dupe
    Dedup.writeFingerprintStore(out1, "text", path, nBuckets = 8, mode = "append")
    val replay = docs(20L -> "totally new content", 21L -> "still newer text")
    val out2 = Dedup.dedupAgainstStore(replay, "text", path)
    assert(out2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(21L))
  }

  test("mixturePlanTemperature: alpha=1 keeps natural mixture, alpha=0 equalizes to the tail") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // three strata with token masses 40 / 10 / 50 (one token per word)
    val df = (Seq.fill(4)("a") ++ Seq.fill(1)("b") ++ Seq.fill(5)("c")).zipWithIndex
      .map { case (g, i) => (i.toLong, g, Seq.fill(10)("w").mkString(" ")) }
      .toDF("doc_id", "lang", "text")
    def plan(alpha: Double): Map[String, (Long, Double, Double)] =
      graft.operators.TextAnalysis.mixturePlanTemperature(df, col("lang"), col("text"), alpha)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

    // binding-stratum keeps are algebraically 1.0 but float division
    // can land an ulp either side of the least(1.0, _) cap — compare
    // within tolerance, not bit-exactly
    def near1(x: Double): Boolean = math.abs(x - 1.0) < 1e-12

    val natural = plan(1.0) // every stratum binding -> keep everything
    assert(natural.values.forall(v => near1(v._3)), natural)
    assert(math.abs(natural.values.map(_._2).sum - 1.0) < 1e-12)

    val uniform = plan(0.0) // equalize: keep T_min / T_s of each stratum
    assert(near1(uniform("b")._3)) // the tail stratum binds, kept whole
    assert(math.abs(uniform("a")._3 - 10.0 / 40.0) < 1e-12)
    assert(math.abs(uniform("c")._3 - 10.0 / 50.0) < 1e-12)

    val mid = plan(0.5) // monotone: tail upsampled relative to natural
    assert(near1(mid("b")._3) && mid("a")._3 < 0.9 && mid("c")._3 < 0.9)
    assert(mid("a")._3 > uniform("a")._3 && mid("c")._3 > uniform("c")._3)

    // a ZERO-token stratum must get target 0 / keep 0 at every alpha —
    // pow(0,0)=1 would hand it a real target and zero everyone's K at
    // alpha=0, and the f=0 branch divides 0/0 -> NaN which least()
    // would resolve to keep-everything
    val withEmpty = df.union(Seq((99L, "z", "")).toDF("doc_id", "lang", "text"))
    for (alpha <- Seq(0.0, 0.5, 1.0)) {
      val p = graft.operators.TextAnalysis
        .mixturePlanTemperature(withEmpty, col("lang"), col("text"), alpha)
        .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
      assert(p("z") == ((0.0, 0.0)), s"alpha=$alpha empty stratum: ${p("z")}")
      assert(p.filter(_._1 != "z").values.forall(_._2 > 0.0),
        s"alpha=$alpha zeroed live strata: $p")
    }
  }

  test("hotKeys: counts/share/skew exact, deterministic ties, top-k never a full sort") {
    import spark.implicits._
    // key a: 6 rows, b: 3, c: 3, d: 1 -> mean 13/4
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .zipWithIndex.toDF("k", "i")
    val top = SkewJoin.hotKeys(df, Seq("k"), k = 3)
    val rows = top.select("k", "n", "share", "skew").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("a", 6L, 6.0 / 13.0, 24.0 / 13.0),
      ("b", 3L, 3.0 / 13.0, 12.0 / 13.0),   // tie with c -> key order
      ("c", 3L, 3.0 / 13.0, 12.0 / 13.0)))
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-k should plan as TakeOrderedAndProject, not a global sort")
  }

  test("embeddingDupPairs: clustered corpus stays bounded; approx candidates validate against the exact twin") {
    import spark.implicits._
    val base = Array.fill(16)(0.3f)
    // 300 near-identical vectors: every band block is hot. With cap=50
    // the blocks are dropped instead of going quadratic (44,850 pairs).
    val hot = (0L until 300L).map(i => i -> base.map(v => v + (i % 7) * 1e-4f).toSeq)
      .toDF("vec_id", "embedding")
    assert(SimilaritySearch.embeddingDupPairs(hot, "vec_id", "embedding",
      threshold = 0.9, maxBucketSize = 50).count() == 0)
    // mixed corpus with the cap above the cluster size: the approximate
    // path emits a SUBSET of the exact twin and finds the whole planted
    // cluster
    val rnd = new scala.util.Random(31)
    val vecs = ((0L to 5L).map(i => i -> base.map(v => v + i * 1e-4f).toSeq) ++
      (6L to 40L).map(i => i -> Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq))
      .toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = pairSet(SimilaritySearch.embeddingDupPairs(vecs, "vec_id", "embedding", threshold = 0.95))
    val exact = pairSet(SimilaritySearch.embeddingDupPairs(vecs, "vec_id", "embedding", threshold = 0.95, exact = true))
    assert(approx.subsetOf(exact), s"approx invented pairs: ${approx.diff(exact)}")
    val planted = (for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)).toSet
    assert(planted.subsetOf(approx), s"missed planted pairs: ${planted.diff(approx)}")
  }

  test("knnJoin approx: multi-probe recall vs exact; hot corpus buckets are capped") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 200L).map(i => i -> Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    def nnSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = nnSet(SimilaritySearch.knnJoin(queries, corpus, "vec_id", "embedding", k = 3, exact = true))
    val approx = nnSet(SimilaritySearch.knnJoin(queries, corpus, "vec_id", "embedding", k = 3))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    RecallReceipts.record("knnJoin multi-probe vs exact, random corpus (q52 shape)", recall)
    // floor pinned by the seeded sweep next to autoPlanes: default
    // 4-table union measures 1.0 here, >= 0.9 guaranteed
    assert(recall >= 0.9, s"multi-probe recall vs exact was $recall")
    // a single table is the cheap tier: strictly weaker, still useful
    val oneTable = nnSet(SimilaritySearch.knnJoin(queries, corpus, "vec_id", "embedding", k = 3, nTables = 1))
    assert(oneTable.intersect(exact).size.toDouble / exact.size >= 0.5)
    // 300 identical vectors land in one bucket; cap=50 drops it and the
    // join completes with zero candidates instead of 300^2 pairs
    val hot = (0L until 300L).map(i => i -> Seq.fill(16)(0.3f)).toDF("vec_id", "embedding")
    val hotQ = hot.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    assert(SimilaritySearch.knnJoin(hotQ, hot, "vec_id", "embedding", k = 3,
      maxBucketSize = 50).count() == 0)
    assert(SimilaritySearch.knnJoin(hotQ, hot, "vec_id", "embedding", k = 3).count() == 15)
  }

  test("repetitionColumns: duplicate word/bigram fractions with edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),          // 5 words {a,b}: dupW=3/5; bigrams: ab,ba,ab,ba -> dup=2/4
      (2L, "x y z"),              // all distinct: 0, 0
      (3L, "w w w w"),            // dupW=3/4; bigrams all "w w": dup=2/3
      (4L, "solo"),               // single word: no bigrams, frac 0 (guarded)
      (5L, "  "))                 // whitespace only: 0 words
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(df, "text")
      .select("doc_id", "n_words", "dup_word_frac", "dup_bigram_frac")
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getDouble(2), out(i).getDouble(3))
    assert(row(0) == ((5L, 0.6, 0.5)))
    assert(row(1) == ((3L, 0.0, 0.0)))
    assert(row(2) == ((4L, 0.75, 2.0 / 3.0)))
    assert(row(3) == ((1L, 0.0, 0.0)))
    assert(row(4) == ((0L, 0.0, 0.0)))
  }

  test("duplicatedSpans: cross-doc and within-doc duplicated k-grams, short-doc guard") {
    val df = docs(
      1L -> "a b c d e",  // grams: "a b c","b c d","c d e"; "a b c" also in doc 2
      2L -> "a b c x y",  // grams: "a b c","b c x","c x y"
      3L -> "p q r s",    // grams: "p q r","q r s" — all unique corpus-wide
      4L -> "m m m m",    // gram "m m m" twice WITHIN the doc -> duplicated
      5L -> "t u")        // < k tokens: zero grams, frac 0.0
    val out = Dedup.duplicatedSpans(df, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getLong(2), out(i).getDouble(3))
    assert(row(0) == ((3L, 1L, 1.0 / 3.0)))
    assert(row(1) == ((3L, 1L, 1.0 / 3.0)))
    assert(row(2) == ((2L, 0L, 0.0)))
    assert(row(3) == ((2L, 2L, 1.0)))
    assert(row(4) == ((0L, 0L, 0.0)))
  }

  test("removeDuplicatedSpans: cross-doc and within-doc spans excised, short/unique/empty docs intact") {
    // k=4: only the constructed runs repeat; every covered token goes,
    // including the FIRST occurrence (boilerplate-excision semantics)
    val df = docs(
      1L -> "a1 a2 c1 c2 c3 c4 a3 a4",       // shared run mid-doc
      2L -> "b1 c1 c2 c3 c4 b2 b3 b4",       // same run, different offset
      3L -> "r1 r2 r3 r4 z1 r1 r2 r3 r4",    // internal repeat
      4L -> "u1 u2 u3 u4 u5",                // unique -> untouched
      5L -> "s1 s2",                          // shorter than k -> untouched
      6L -> "")                               // empty
    val out = Dedup.removeDuplicatedSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a1 a2 a3 a4", 8L, 4L)))
    assert(out(2L) == (("b1 b2 b3 b4", 8L, 4L)))
    assert(out(3L) == (("z1", 9L, 8L)))       // both occurrences excised
    assert(out(4L) == (("u1 u2 u3 u4 u5", 5L, 0L)))
    assert(out(5L) == (("s1 s2", 2L, 0L)))
    assert(out(6L) == (("", 0L, 0L)))
  }

  test("removeDuplicatedSpansKeepFirst: min (doc_id, pos) occurrence survives, others excised, overlap ties pinned") {
    val df = docs(
      0L -> "p1 p2 p3 p4",                     // canonical holder of P
      1L -> "a1 a2 c1 c2 c3 c4 a3 a4",         // canonical holder of C (vs doc 2)
      2L -> "b1 c1 c2 c3 c4 b2 b3 b4",         // C non-canonical -> excised
      3L -> "r1 r2 r3 r4 z1 r1 r2 r3 r4",      // within-doc repeat: FIRST kept
      4L -> "u1 u2 u3 u4 u5",                  // unique -> untouched
      5L -> "s1 s2",                           // shorter than k -> untouched
      6L -> "",                                // empty
      7L -> "x1 x2 x3 x4 x5",                  // canonical holder of BOTH overlapping grams
      8L -> "w0 x1 x2 x3 x4 x5",               // two overlapping non-canonical spans union-covered
      9L -> "q1 q2 q3 q4 p1 p2 p3 p4")         // canonical for Q, loses P to doc 0
    val out = Dedup.removeDuplicatedSpansKeepFirst(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == (("p1 p2 p3 p4", 4L, 0L)))
    // vs removeDuplicatedSpans, which excises doc 1 down to "a1 a2 a3 a4"
    assert(out(1L) == (("a1 a2 c1 c2 c3 c4 a3 a4", 8L, 0L)))
    assert(out(2L) == (("b1 b2 b3 b4", 8L, 4L)))
    assert(out(3L) == (("r1 r2 r3 r4 z1", 9L, 4L)))
    assert(out(4L) == (("u1 u2 u3 u4 u5", 5L, 0L)))
    assert(out(5L) == (("s1 s2", 2L, 0L)))
    assert(out(6L) == (("", 0L, 0L)))
    assert(out(7L) == (("x1 x2 x3 x4 x5", 5L, 0L)))
    assert(out(8L) == (("w0", 6L, 5L)))
    assert(out(9L) == (("q1 q2 q3 q4", 8L, 4L)))
  }

  test("approx_count_distinct (q35's sketch) stays inside 3x its documented rsd vs exact") {
    // the q35 battery row hash-gates a within-corridor boolean (the
    // raw HLL estimate differs across engines BY DESIGN); this pins
    // the Spark sketch's accuracy against the exact count directly.
    // approx_count_distinct is deterministic for fixed input, so the
    // bound is a hard assertion, not a flaky statistical one.
    import spark.implicits._
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col, lit}
    val df = (0L until 60000L).map(i => (i % 7, i % 9901)).toDF("grp", "uid")
    val rsd = 0.05 // Spark's default relativeSD
    val rows = df.groupBy("grp")
      .agg(approx_count_distinct(col("uid"), rsd).as("approx"),
           countDistinct(col("uid")).as("exact"))
      .collect()
    assert(rows.length == 7)
    for (r <- rows) {
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 3 * rsd, s"grp ${r.get(0)}: approx $approx vs exact $exact (relErr $relErr)")
    }
  }

  test("span excision invariants: keep-first keeps a superset of remove-all; counts reconcile; canonical set intact") {
    // seeded random corpora with planted repeats: the two excision
    // variants must agree on WHAT is duplicated and differ only in
    // whether the canonical occurrence survives
    val rnd = new scala.util.Random(20260813L)
    val vocab = (0 until 40).map(i => s"w$i")
    def randDoc(): String =
      Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val boiler = "b1 b2 b3 b4 b5" // planted 5-token boilerplate run
    val corpus = (0L until 30L).map { i =>
      val t = randDoc()
      i -> (if (i % 3 == 0) s"$t $boiler" else t) // every 3rd doc carries the run
    }
    val df = docs(corpus: _*)
    val all = Dedup.removeDuplicatedSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val first = Dedup.removeDuplicatedSpansKeepFirst(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(all.keySet == first.keySet && all.size == 30)
    var strictlyMore = 0
    for ((id, (cleanAll, nTokAll, nRemAll)) <- all) {
      val (cleanFirst, nTokFirst, nRemFirst) = first(id)
      assert(nTokAll == nTokFirst, s"doc $id token counts disagree")
      // keep-first never removes MORE than remove-all
      assert(nRemFirst <= nRemAll, s"doc $id: keep-first removed more than remove-all")
      // counts reconcile with the emitted text on both sides
      def count(s: String) = if (s.isEmpty) 0 else s.split(" ").length
      assert(count(cleanAll) == nTokAll - nRemAll)
      assert(count(cleanFirst) == nTokFirst - nRemFirst)
      // kept tokens of remove-all are a SUBSEQUENCE of keep-first's
      // (keep-first only adds back canonical occurrences)
      val a = cleanAll.split(" ").filter(_.nonEmpty)
      var j = 0
      for (t <- cleanFirst.split(" ").filter(_.nonEmpty) if j < a.length && t == a(j)) j += 1
      assert(j == a.length, s"doc $id: remove-all kept set not a subsequence of keep-first's")
      if (nRemFirst < nRemAll) strictlyMore += 1
    }
    // the planted boilerplate guarantees the variants actually diverge:
    // its canonical holder (doc 0) keeps the run only under keep-first
    assert(strictlyMore >= 1, "variants never diverged — planted repeat missing?")
    assert(first(0L)._1.endsWith(boiler) && !all(0L)._1.endsWith(boiler))
  }

  test("contaminationReport: shared shingles flag docs, short-doc fallback matches, broadcast == shuffle") {
    val train = docs(
      1L -> "a b c d e",  // shares shingle "a b c" with bench doc 10
      2L -> "p q r s",    // clean
      3L -> "x y")        // < width tokens: whole-text fallback shingle
    val bench = docs(10L -> "z z a b c", 11L -> "x y")
    val out = Dedup.contaminationReport(train, bench, "doc_id", "text",
        width = 3, minShared = 1)
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(0), out(i).getLong(1), out(i).getBoolean(2))
    assert(row(0) == ((1L, 1L, true)))
    assert(row(1) == ((2L, 0L, false)))
    assert(row(2) == ((3L, 1L, true)))
    val shuffled = Dedup.contaminationReport(train, bench, "doc_id", "text",
        width = 3, minShared = 1, broadcastBench = false)
      .orderBy("doc_id").collect().toSeq
    assert(shuffled == out.toSeq)
  }

  test("scrubPii: emails, IPv4s and long digit runs redacted; clean text untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "mail alice.smith+spam@sub.example.co.uk and bob@x.io thanks"),
      (2L, "server at 192.168.001.254 and 8.8.8.8 responded"),
      (3L, "card 4111111111111111 ref 123456789 short 12345678"),
      (4L, "perfectly clean text stays exactly as written"))
      .toDF("id", "t")
    val out = df.select(col("id"), TextAnalysis.scrubPii(col("t")).as("s"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out(0) == "mail <EMAIL> and <EMAIL> thanks")
    assert(out(1) == "server at <IP> and <IP> responded")
    assert(out(2) == "card <NUM> ref <NUM> short 12345678") // 8 digits: below threshold
    assert(out(3) == "perfectly clean text stays exactly as written")
  }

  test("hash sampling: partition-independent membership, salt independence, fraction accuracy") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0L until 2000L).map(i => i -> s"g${i % 3}").toDF("id", "grp")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.filter(TextAnalysis.hashSampleCond(col("id"), 0.2)).select("id")
        .collect().map(_.getLong(0)).toSet
    val a = ids(df)
    // membership must not depend on partitioning — df.sample's does
    assert(ids(df.repartition(13)) == a, "sample changed under repartitioning")
    assert(ids(df.orderBy(col("id").desc)) == a, "sample changed under reordering")
    // fraction lands near 20% (hash-uniformity, fixed fingerprint)
    assert(math.abs(a.size / 2000.0 - 0.2) < 0.03, s"fraction was ${a.size / 2000.0}")
    // a different salt draws an independent sample
    val b = df.filter(TextAnalysis.hashSampleCond(col("id"), 0.2, salt = "other"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(b != a && math.abs(a.intersect(b).size / 2000.0 - 0.04) < 0.04,
      s"salted samples should be roughly independent (|A∩B| = ${a.intersect(b).size / 2000.0}, ideal 0.04)")
    // stratified: per-group fractions honored, absent strata dropped
    val strat = df.filter(TextAnalysis.stratifiedSampleCond(col("id"), col("grp"),
        Map("g0" -> 1.0, "g1" -> 0.5))).groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strat("g0") == 667 && !strat.contains("g2"))
    assert(math.abs(strat("g1") / 667.0 - 0.5) < 0.06, s"g1 kept ${strat("g1")}")
  }

  test("chunkDocuments: overlapped windows, suffix-only chunk suppressed, short/empty docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a b c d e f g h i j"), // n=10, size 4, overlap 1 -> starts 0,3,6 (9 is a pure suffix: dropped)
      (2L, "x y"),                 // n <= chunkSize: one whole-doc chunk
      (3L, " "))                   // empty doc: one empty chunk (row preserved)
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "text", "doc_id", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, "a b c d", 4L),
      (1L, 1L, "d e f g", 4L),
      (1L, 2L, "g h i j", 4L),
      (2L, 0L, "x y", 2L),
      (3L, 0L, "", 0L)))
    // overlap: each non-initial chunk starts with the previous chunk's last token
    assert(out(1)._3.startsWith(out(0)._3.split(" ").last))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "text", "doc_id", chunkSize = 4, overlap = 4)
    }
  }

  test("vocabStats: occurrences + doc frequency, case-folded, minCount floor") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "b c"), (3L, "A")).toDF("doc_id", "text")
    val all = TextAnalysis.vocabStats(df, "text", "doc_id")
      .orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(all.toSeq == Seq(("a", 3L, 2L), ("b", 2L, 2L), ("c", 1L, 1L)))
    val floored = TextAnalysis.vocabStats(df, "text", "doc_id", minCount = 2L)
      .orderBy("token").collect().map(_.getString(0))
    assert(floored.toSeq == Seq("a", "b"))
  }

  test("removeNearDups: keeps untouched docs and component minima, generic over the pair source") {
    import spark.implicits._
    val corpus = (1L to 7L).map(i => i -> s"doc $i").toDF("doc_id", "text")
    // components {1,2,3} (chained, transitive) and {5,6}; 4 and 7 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.removeNearDups(corpus, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 7L))
    // empty pair set: the corpus passes through whole
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.removeNearDups(corpus, "doc_id", none).count() == 7L)
  }

  test("deterministicShuffle: stable permutation, partition-invariant, salts independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0L until 500L).map(i => i -> s"doc$i").toDF("id", "payload")
    def order(d: org.apache.spark.sql.DataFrame, salt: String) =
      TextAnalysis.deterministicShuffle(d, "id", salt, numBuckets = 8)
        .orderBy("shuffle_bucket", "shuffle_pos")
        .select("id").collect().map(_.getLong(0)).toSeq
    val a = order(df, "s1")
    // a total permutation of the corpus, not an id-order passthrough
    assert(a.toSet == (0L until 500L).toSet && a != (0L until 500L).toSeq)
    // identical on a different partitioning
    assert(order(df.repartition(17), "s1") == a, "order changed under repartitioning")
    // a different salt draws a different permutation
    assert(order(df, "s2") != a)
    // positions are dense 0..n-1 within every bucket
    val pos = TextAnalysis.deterministicShuffle(df, "id", "s1", numBuckets = 8)
      .groupBy("shuffle_bucket")
      .agg(org.apache.spark.sql.functions.count(col("id")).as("n"),
           org.apache.spark.sql.functions.max(col("shuffle_pos")).as("mx"),
           org.apache.spark.sql.functions.min(col("shuffle_pos")).as("mn"))
      .collect()
    assert(pos.nonEmpty && pos.forall(r => r.getLong(3) == 0L && r.getLong(2) == r.getLong(1) - 1))
  }

  test("shardByTokenBudget: contiguous budget-bounded shards over the shuffle order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0L until 200L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim).toDF("id", "text")
    val out = TextAnalysis.shardByTokenBudget(df, "id", "text",
        tokensPerShard = 20L, salt = "s", numBuckets = 4)
      .select("id", "shard_bucket", "shard_idx", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // row-granular budget bounds: a non-final shard misses the budget by
    // less than one document (docs here are <= 7 tokens) and overflows
    // it by less than one document
    val byShard = out.groupBy(t => (t._2, t._3)).view.mapValues(_.map(_._4).sum).toMap
    val lastPerBucket = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    byShard.foreach { case ((b, s), total) =>
      if (s != lastPerBucket(b)) assert(total > 20L - 7L, s"shard ($b,$s) held only $total tokens")
      assert(total < 20L + 7L, s"shard ($b,$s) overflowed to $total")
    }
    // shard indexes are contiguous from 0 within each bucket
    out.groupBy(_._2).foreach { case (b, rows) =>
      val idxs = rows.map(_._3).distinct.sorted.toSeq
      assert(idxs == (0L until idxs.length).toSeq, s"bucket $b shard gaps: $idxs")
    }
    // shard assignment is partition-invariant (same permutation machinery)
    val re = TextAnalysis.shardByTokenBudget(df.repartition(13), "id", "text",
        tokensPerShard = 20L, salt = "s", numBuckets = 4)
      .select("id", "shard_bucket", "shard_idx", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == out.toSet)
  }

  test("writeShards: per-shard directories, content round-trips, partition pruning reaches the scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0L until 100L).map(i => i -> ("w " * (i % 5 + 1).toInt).trim).toDF("id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val written = TextAnalysis.writeShards(df, "id", "text", path,
      tokensPerShard = 25L, salt = "s", numBuckets = 4)
    val back = spark.read.parquet(path)
    // layout: one dir per (bucket, shard); all rows round-trip with
    // their assignment intact
    assert(back.count() == 100L)
    val expect = written.select("id", "shard_bucket", "shard_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // partition-dir values read back type-inferred (int) — normalize
    val got = back.select(col("id"), col("shard_bucket").cast("long"),
        col("shard_idx").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("shard_bucket=")) == 4)
    // a shard-addressed read prunes at directory level, not per-file
    val pruned = back.filter(col("shard_bucket") === 0 && col("shard_idx") === 0)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.treeString
    assert(scan.contains("PartitionFilters") && scan.contains("shard_bucket"),
      s"shard read must prune partitions:\n$scan")
    // idempotent re-run: same salt, identical layout and content
    TextAnalysis.writeShards(df, "id", "text", path, tokensPerShard = 25L,
      salt = "s", numBuckets = 4)
    assert(spark.read.parquet(path).select(col("id"), col("shard_bucket").cast("long"),
        col("shard_idx").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == expect)
  }

  test("qualityPercentileFilter: per-stratum cut, deterministic ties, singleton stratum kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // en: scores 10..1 over ids 1..10; de: one doc; fr: all-tied scores
    val df = ((1L to 10L).map(i => (i, "en", 11.0 - i)) ++
      Seq((20L, "de", 5.0)) ++ (30L to 33L).map(i => (i, "fr", 7.0))).toDF("id", "lang", "score")
    val kept = TextAnalysis.qualityPercentileFilter(df, col("score"), col("lang"), col("id"), 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    // en: percent_rank = (rank-1)/9 <= 0.3 -> ranks 1..3 -> ids 1,2,3 (highest scores)
    // de: singleton stratum has percent_rank 0 -> kept
    // fr: ties broken by id -> ranks by id -> (rank-1)/3 <= 0.3 -> id 30 only (1/3 > 0.3)
    assert(kept == Set(1L, 2L, 3L, 20L, 30L))
    // keepFraction = 1.0 keeps everything; original columns only
    val all = TextAnalysis.qualityPercentileFilter(df, col("score"), col("lang"), col("id"), 1.0)
    assert(all.count() == 15L && all.columns.toSeq == Seq("id", "lang", "score"))
  }

  test("qualityPercentileFilterApprox agrees with the exact filter within sketch rank tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // seeded corpus: two strata with distinct continuous scores (no ties),
    // large enough that the rank band around the cutoff is a small
    // fraction — the agreement the scaladoc promises
    val rnd = new scala.util.Random(42)
    val df = (1L to 2000L).map { i =>
      (i, if (i % 2 == 0) "en" else "de", rnd.nextDouble()) }.toDF("id", "lang", "score")
    val exact = TextAnalysis.qualityPercentileFilter(df, col("score"), col("lang"), col("id"), 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    val approx = TextAnalysis.qualityPercentileFilterApprox(df, col("score"), col("lang"), 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    // kept-set sizes within 1% of each stratum's rows of each other, and
    // symmetric difference confined to the same band around the cutoff
    assert(math.abs(approx.size - exact.size) <= 20,
      s"approx kept ${approx.size}, exact kept ${exact.size}")
    assert(((approx diff exact) union (exact diff approx)).size <= 40,
      "approx/exact disagreement beyond the sketch's rank tolerance")
    // original columns only, like the exact variant
    assert(TextAnalysis.qualityPercentileFilterApprox(df, col("score"), col("lang"), 0.3)
      .columns.toSeq == Seq("id", "lang", "score"))
  }

  test("packSequences: budget bound, decreasing-order packing, deterministic under repartition") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // chunk-shaped items: token counts 1..16, all <= the 32-token budget
    val rnd = new scala.util.Random(7)
    val df = (1L to 300L).map(i => (i, rnd.nextInt(16) + 1L)).toDF("id", "n_tokens")
    val out = TextAnalysis.packSequences(df, "id", "n_tokens",
        tokensPerSequence = 32L, salt = "p", numBuckets = 4)
      .select("id", "n_tokens", "pack_bucket", "seq_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 300)
    // hard invariant: no sequence exceeds the budget (all items fit alone)
    val bySeq = out.groupBy(t => (t._3, t._4)).view.mapValues(_.map(_._2).sum).toMap
    bySeq.foreach { case ((b, s), total) =>
      assert(total <= 32L, s"sequence ($b,$s) overflowed to $total tokens") }
    // sequences are reasonably full: next-fit-decreasing on this
    // distribution cannot leave a non-final sequence under half-full
    // (a closed sequence rejected an item of <= the remaining mean size)
    val lastSeq = out.groupBy(_._3).view.mapValues(_.map(_._4).max).toMap
    bySeq.foreach { case ((b, s), total) =>
      if (s != lastSeq(b)) assert(total > 16L, s"non-final sequence ($b,$s) only $total full") }
    // seq indices contiguous from 0 per bucket
    out.groupBy(_._3).foreach { case (b, rows) =>
      val idxs = rows.map(_._4).distinct.sorted.toSeq
      assert(idxs == (0L until idxs.length).toSeq, s"bucket $b seq gaps: $idxs") }
    // deterministic under input repartitioning
    val re = TextAnalysis.packSequences(df.repartition(13), "id", "n_tokens",
        tokensPerSequence = 32L, salt = "p", numBuckets = 4)
      .select("id", "n_tokens", "pack_bucket", "seq_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == out.toSet, "packing changed under repartition")
    // an item longer than the budget becomes a singleton sequence and
    // never drags siblings over the budget
    val big = Seq((1L, 10L), (2L, 50L), (3L, 12L), (4L, 11L)).toDF("id", "n_tokens")
    val bigOut = TextAnalysis.packSequences(big, "id", "n_tokens",
        tokensPerSequence = 32L, salt = "", numBuckets = 1)
      .select("id", "seq_idx").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oversizedSeq = bigOut(2L)
    assert(bigOut.count(_._2 == oversizedSeq) == 1, "oversized item must pack alone")
  }

  test("high-bucket regime (numBuckets = 4096): pack/shard assignment deterministic, invariants intact") {
    import spark.implicits._
    // production numBuckets dwarfs test data: most buckets are empty,
    // many hold a single row — the degenerate horizons the 4-bucket
    // specs never reach. Determinism and budget invariants must hold
    // unchanged.
    val rnd = new scala.util.Random(11)
    val items = (1L to 500L).map(i => (i, rnd.nextInt(16) + 1L)).toDF("id", "n_tokens")
    def packed(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.packSequences(df, "id", "n_tokens",
          tokensPerSequence = 32L, salt = "p", numBuckets = 4096)
        .select("id", "pack_bucket", "seq_idx", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val p1 = packed(items)
    assert(p1.length == 500)
    assert(packed(items.repartition(29)).toSet == p1.toSet,
      "4096-bucket packing changed under repartition")
    p1.groupBy(t => (t._2, t._3)).foreach { case ((b, s), rows) =>
      assert(rows.map(_._4).sum <= 32L, s"sequence ($b,$s) overflowed") }
    val docs = (0L until 400L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim).toDF("id", "text")
    def sharded(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.shardByTokenBudget(df, "id", "text",
          tokensPerShard = 20L, salt = "s", numBuckets = 4096)
        .select("id", "shard_bucket", "shard_idx", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val s1 = sharded(docs)
    assert(s1.length == 400)
    assert(sharded(docs.repartition(17)).toSet == s1.toSet,
      "4096-bucket sharding changed under repartition")
    // per-bucket invariants survive the near-empty regime: indices
    // contiguous from 0, non-final shards within one document of budget
    s1.groupBy(_._2).foreach { case (b, rows) =>
      val idxs = rows.map(_._3).distinct.sorted.toSeq
      assert(idxs == (0L until idxs.length).toSeq, s"bucket $b shard gaps: $idxs")
      val last = rows.map(_._3).max
      rows.groupBy(_._3).foreach { case (s, rs) =>
        val total = rs.map(_._4).sum
        if (s != last) assert(total > 20L - 7L, s"shard ($b,$s) held only $total")
        assert(total < 20L + 7L, s"shard ($b,$s) overflowed to $total")
      }
    }
  }

  test("sampleExactPerStratum: exact counts, partition/salt contracts, short strata kept whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = ((1L to 100L).map(i => (i, "en")) ++ (101L to 140L).map(i => (i, "de")) ++
      (141L to 143L).map(i => (i, "fr"))).toDF("id", "lang")
    def sample(d: org.apache.spark.sql.DataFrame, salt: String) =
      TextAnalysis.sampleExactPerStratum(d, col("id"), col("lang"), k = 10, salt = salt)
        .select("id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s1 = sample(df, "a")
    // exact k per stratum; a stratum under k is kept whole
    val byLang = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang == Map("en" -> 10, "de" -> 10, "fr" -> 3), s"got $byLang")
    // membership is a pure function of (salt, corpus)
    assert(sample(df.repartition(13), "a") == s1, "sample changed under repartition")
    // a different salt draws a different (independent) sample
    assert(sample(df, "b") != s1, "distinct salts must not draw the same sample")
    // original columns only
    assert(TextAnalysis.sampleExactPerStratum(df, col("id"), col("lang"), 10, "a")
      .columns.toSeq == Seq("id", "lang"))
  }

  test("winnowing guarantee on an adversarial corpus: exactly window+k-1 shared chars force a shared fingerprint") {
    import spark.implicits._
    // constructed worst case: the shared run is the MINIMUM length the
    // guarantee covers (window + k - 1 chars), embedded at different
    // offsets in per-doc unique high-entropy filler drawn from disjoint
    // alphabets (no accidental sharing, no natural-text regularity)
    val k = 8; val window = 4
    val rnd = new scala.util.Random(1234)
    def filler(alphabet: String, n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val trials = (0 until 20).flatMap { t =>
      val core = filler("qrstuvwx", window + k - 1) // exactly the guarantee bound
      Seq((2L * t, filler("abcdefgh", 30 + rnd.nextInt(40)) + core + filler("abcdefgh", 30)),
          (2L * t + 1, filler("ijklmnop", 25 + rnd.nextInt(40)) + core + filler("ijklmnop", 35)))
    }
    val df = trials.toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(df, "doc_id", "text", k = k, window = window,
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 20).foreach { t =>
      assert(pairs.contains((2L * t, 2L * t + 1)),
        s"trial $t: ${window + k - 1}-char shared run produced no shared fingerprint") }
    // negative control: disjoint-alphabet docs (no shared k-gram at all)
    // never pair, even at minShared = 1
    val disjoint = docs(100L -> filler("abcdefgh", 80), 101L -> filler("ijklmnop", 80))
    assert(Dedup.winnowOverlapPairs(disjoint, "doc_id", "text", k = k, window = window,
      minShared = 1).count() == 0L)
  }

  test("tokenFrequencyScore: mean corpus frequency per doc, rare-vocab docs score low, empty doc 0") {
    val df = docs(1L -> "a a b", 2L -> "a c", 3L -> "")
    // counts: a=3 b=1 c=1, N=5
    val scored = TextAnalysis.tokenFrequencyScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(scored(1L) == ((3L, (7.0 / 3.0) / 5.0)))
    assert(scored(2L) == ((2L, (4.0 / 2.0) / 5.0)))
    assert(scored(3L) == ((0L, 0.0)))
  }

  test("mixturePlan: binding stratum keeps all, others downsample to the target mixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // token totals: en 60, de 10, fr 30, es 20 (untargeted)
    val df = (Seq.fill(6)("en") :+ "de").zipWithIndex.map { case (l, i) => (i.toLong, l, "w " * 10) }
      .map { case (i, l, t) => (i, l, t.trim) }
      .++(Seq((10L, "fr", ("w " * 30).trim), (11L, "es", ("w " * 20).trim)))
      .toDF("doc_id", "lang", "text")
    val plan = TextAnalysis.mixturePlan(df, col("lang"), col("text"),
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // T/f: en 120, de 40, fr 120 -> K = 40
    assert(plan("de") == ((10L, 0.25, 1.0)))          // binding stratum keeps 100%
    assert(math.abs(plan("en")._3 - 0.5 * 40 / 60) < 1e-12)
    assert(math.abs(plan("fr")._3 - 0.25 * 40 / 30) < 1e-12)
    assert(plan("es") == ((20L, 0.0, 0.0)))           // untargeted -> dropped
    // resulting mixture: kept tokens proportional to targets
    val kept = Seq("en", "de", "fr").map(l => plan(l)._1 * plan(l)._3)
    assert(kept.map(_ / kept.sum).zip(Seq(0.5, 0.25, 0.25)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("ivfTopKQuantized at nProbe = nCells equals brute force over the dequantized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)).toDF("vec_id", "embedding")
    val query = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val quant = SimilaritySearch.quantizeEmbeddings(corpus, "vec_id", "embedding")
    val deq = SimilaritySearch.dequantizeEmbeddings(quant)
    val exact = SimilaritySearch.bruteForceTopK(deq, "vec_id", "q_restored", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = SimilaritySearch.ivfTopKQuantized(quant, "vec_id", query,
        k = 10, nCells = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == exact, "all-probe quantized IVF must equal dequantized brute force")
    // quantization distorts ranking only within the error bound: the
    // quantized top-10 stays inside the float top-15
    val floatTop = SimilaritySearch.bruteForceTopK(corpus, "vec_id", "embedding", query, 15)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.map(_._1).count(floatTop) >= 8,
      s"quantized top-10 drifted beyond the error bound: ${ivf.map(_._1)}")
  }

  test("QuantizeCodes/Dequantize codegen expressions are bit-identical to the lambda forms") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, transform, round, array_min, array_max, when, lit}
    // the r8 formulation: interpreted transform lambdas — kept here as
    // the executable spec the native expressions must replay bit-for-bit
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 300L).map(i => i -> Seq.fill(24)(rnd.nextFloat() * 6f - 3f)) :+
      (999L -> Seq.fill(24)(-0.25f)) // constant vector -> scale 1.0 branch
    val df = vecs.toDF("vec_id", "embedding")
    val v = col("embedding")
    val vmin = array_min(v).cast("double")
    val vmax = array_max(v).cast("double")
    val scale = when(vmax > vmin, (vmax - vmin) / lit(255.0)).otherwise(lit(1.0))
    val staged = df.select(col("vec_id"), v.as("__v"), vmin.as("q_min"), scale.as("q_scale"))
    val lambdaQ = staged.select(col("vec_id"), col("q_min"), col("q_scale"),
      transform(col("__v"),
        x => (round((x.cast("double") - col("q_min")) / col("q_scale")) - 128).cast("byte"))
        .as("q_codes"))
    val nativeQ = SimilaritySearch.quantizeEmbeddings(df, "vec_id", "embedding")
    val lq = lambdaQ.orderBy("vec_id").collect()
    val nq = nativeQ.orderBy("vec_id").collect()
    assert(lq.length == nq.length)
    lq.zip(nq).foreach { case (a, b) =>
      assert(a.getSeq[Byte](3) == b.getSeq[Byte](3), s"codes diverge at vec ${a.getLong(0)}")
      assert(a.getDouble(1) == b.getDouble(1) && a.getDouble(2) == b.getDouble(2))
    }
    val lambdaD = lambdaQ.withColumn("q_restored",
      transform(col("q_codes"),
        c => ((c.cast("double") + 128) * col("q_scale") + col("q_min")).cast("float")))
      .orderBy("vec_id").collect()
    val nativeD = SimilaritySearch.dequantizeEmbeddings(nativeQ)
      .orderBy("vec_id").collect()
    lambdaD.zip(nativeD).foreach { case (a, b) =>
      assert(a.getSeq[Float](4) == b.getSeq[Float](4),
        s"restored floats diverge at vec ${a.getLong(0)}")
    }
  }

  test("quantizeEmbeddings: int8 roundtrip within scale/2, constant-vector guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i => i -> Seq.fill(16)(rnd.nextFloat() * 4f - 2f)) :+
      (99L -> Seq.fill(16)(0.5f)) // constant vector
    val df = vecs.toDF("vec_id", "embedding")
    val q = SimilaritySearch.quantizeEmbeddings(df, "vec_id", "embedding")
    // codes are full int8 range users expect: min vector value -> -128, max -> 127
    val row0 = q.filter(col("vec_id") === 0L).head()
    val codes0 = row0.getSeq[Byte](3)
    assert(codes0.min == -128 && codes0.max == 127)
    // constant vector: scale 1.0, all codes -128
    val const = q.filter(col("vec_id") === 99L).head()
    assert(const.getDouble(2) == 1.0 && const.getSeq[Byte](3).forall(_ == -128))
    // roundtrip error bounded by scale/2 everywhere
    val joined = SimilaritySearch.dequantizeEmbeddings(q)
      .join(df, "vec_id")
      .select(col("vec_id"), col("q_scale"), col("q_restored"), col("embedding"))
      .collect()
    joined.foreach { r =>
      val scale = r.getDouble(1)
      val restored = r.getSeq[Float](2); val orig = r.getSeq[Float](3)
      restored.zip(orig).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-6, s"vec ${r.getLong(0)}: $a vs $b")
      }
    }
  }

  test("pqTopK degenerate exactness: m=1 + corpus-sized codebook equals brute force bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 50L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)).toDF("vec_id", "embedding")
    val query = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    // every corpus row is a codeword and m=1, so each vector's nearest
    // codeword is itself (distance exactly 0) — reconstruction is the
    // identity and ADC cosine must equal cosine_sim bit-for-bit
    val adc = SimilaritySearch.pqTopK(corpus, "vec_id", "embedding", query,
        k = 10, nCodes = 50, m = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = SimilaritySearch.bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(adc == exact, "identity-codebook ADC must reproduce exact cosine top-k")
  }

  test("ivfPqTopK: all-probe degenerates to pqTopK; codes are m bytes and repartition-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(29)
    val corpus = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)).toDF("vec_id", "embedding")
    val query = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val full = SimilaritySearch.pqTopK(corpus, "vec_id", "embedding", query,
        k = 10, nCodes = 16, m = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = SimilaritySearch.ivfPqTopK(corpus, "vec_id", "embedding", query,
        k = 10, nCells = 8, nProbe = 8, nCodes = 16, m = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == full, "nProbe = nCells IVF-PQ must equal whole-corpus PQ ADC")
    // storage contract: m TINYINT codes per row, dim*4 -> m bytes
    val cb = SimilaritySearch.pqCodebook(corpus, "vec_id", "embedding", 16)
    val enc = SimilaritySearch.pqEncode(corpus, "vec_id", "embedding", cb, 16, 4)
    assert(enc.schema("pq_codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, false))
    assert(enc.select(org.apache.spark.sql.functions.size(col("pq_codes"))).distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(4))
    // encoding is a pure map of (vector, codebook): any partitioning
    // yields identical codes
    val a = enc.collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val b = SimilaritySearch.pqEncode(corpus.repartition(13), "vec_id", "embedding", cb, 16, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(a == b)
  }

  test("pqTopK recall on a clustered corpus: ADC top-10 overlaps exact top-10") {
    import spark.implicits._
    // same production shape as the knnJoin recall spec: cluster centers
    // + per-point noise, where PQ's sampled codewords land near centers
    // and reconstruction error is the noise scale
    val rnd = new scala.util.Random(31)
    val dim = 32
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val corpus = (0L until 400L).map { i =>
      val c = centers(rnd.nextInt(20))
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq)
    }.toDF("vec_id", "embedding")
    val query = centers(3).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
    val adcIds = SimilaritySearch.pqTopK(corpus, "vec_id", "embedding", query,
      k = 10, nCodes = 64, m = 4).collect().map(_.getLong(0)).toSet
    val exactIds = SimilaritySearch.bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    assert(adcIds.intersect(exactIds).size >= 7,
      s"ADC top-10 drifted too far from exact: ${adcIds.intersect(exactIds).size}/10")
  }

  test("approxTopTokens exact regime: capacity >= distinct equals word count, err 0, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val df = (0L until 200L).map(i =>
      (i, Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val exact = df.select(org.apache.spark.sql.functions.explode(
        TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val got = TextAnalysis.approxTopTokens(df.repartition(parts), "text",
          k = 10, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.forall(_._3 == 0L), "unsaturated sketch must report err 0")
      assert(got.map(e => e._1 -> e._2).toMap == exact,
        s"parts=$parts: unsaturated sketch must equal the exact word count")
      // output order is (cnt DESC, token)
      assert(got.sortBy(e => (-e._2, e._1)).toSeq == got.toSeq)
    }
  }

  test("approxTopTokens saturated: count bounds hold and guaranteed heavy hitters survive") {
    import spark.implicits._
    // 3 heavy tokens (120/90/60 of N=400) + a 130-token distinct tail,
    // capacity 8: heavy freqs are far above N/capacity = 50... except
    // h3 at 60 > 50 — all three are space-saving-guaranteed on a
    // single stream
    val words = Seq.fill(120)("h1") ++ Seq.fill(90)("h2") ++ Seq.fill(60)("h3") ++
      (0 until 130).map(i => s"tail$i")
    val shuffled = new scala.util.Random(43).shuffle(words)
    val df = shuffled.grouped(10).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // single partition pins the classic one-pass guarantee
    val got = TextAnalysis.approxTopTokens(df.repartition(1), "text",
        k = 8, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byTok = got.map(e => e._1 -> e).toMap
    assert(Seq("h1", "h2", "h3").forall(byTok.contains),
      s"guaranteed heavy hitters missing: ${got.map(_._1).toSeq}")
    got.foreach { case (t, cnt, err) =>
      val real = truth(t)
      assert(cnt >= real && cnt - err <= real,
        s"$t: cnt=$cnt err=$err true=$real violates space-saving bounds")
    }
    // multi-partition merge: trimming can drop occurrences a token had
    // in another sketch, so the one-sided overestimate no longer holds;
    // what survives merging (Agarwal et al. 2013) is the two-sided
    // error bound |cnt - true| <= N/capacity — and the heavy hitters
    // still dominate the summary
    val n = words.size
    val merged = TextAnalysis.approxTopTokens(df.repartition(5), "text", k = 8, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    merged.foreach { case (t, cnt, _) =>
      val real = truth(t)
      assert(math.abs(cnt - real) <= n / 8,
        s"merged $t: cnt=$cnt true=$real violates the eps*N mergeable bound")
    }
    assert(Seq("h1", "h2", "h3").forall(merged.map(_._1).toSet),
      s"merged summary lost a guaranteed heavy hitter: ${merged.map(_._1).toSeq}")
  }

  test("stripHtml: tags separate words, escaped markup survives as text, entities single-decode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "<p>a</p><p>b</p>", "a b"),          // block tags must not glue words
      (2L, "x &lt;b&gt; y", "x <b> y"),          // escaped markup is TEXT, not a tag
      (3L, "a &amp;lt; b", "a &lt; b"),          // &amp; decodes LAST: single-decode
      (4L, "<a href=\"u\">link</a>&nbsp;&#39;q&#39;", "link 'q'"),
      (5L, "  <br/>   spaced   out  ", "spaced out"),
      (6L, "no markup at all", "no markup at all"))
    val got = TextAnalysis.stripHtml(col("raw"))
    val out = cases.toDF("id", "raw", "want")
      .select(col("id"), got.as("clean"), col("want"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    out.foreach { case (id, clean, want) =>
      assert(clean == want, s"case $id: got '$clean', want '$want'")
    }
  }

  test("readability + stripHtml plan shape: pure map, zero exchanges, codegen'd") {
    import org.apache.spark.sql.functions.col
    // non-literal source: a literal Seq would constant-fold the whole
    // chain away and leave nothing to assert codegen on
    val df = spark.range(4).selectExpr("id AS doc_id",
      "concat('<p>some text ', id, '.</p>') AS text")
    val plan = TextAnalysis.readability(
        df.withColumn("text", TextAnalysis.stripHtml(col("text"))), "text")
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty, s"clean+score must be a pure map stage:\n$plan")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "the map stage must run inside whole-stage codegen")
  }

  test("readability: hand-computed counts and scores; empty doc nulls; codegen == eval") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // "the quick fox jumped. it ran!" -> 6 words, 2 sentences;
      // syllables: the 1, quick 1, fox 1, jumped. (u, e -> 2 groups,
      // no final-e: ends '.') 2, it 1, ran! 1 => 7
      (1L, "The quick fox jumped. It ran!"),
      // silent final e: "time" -> groups i,e = 2, ends 'e' -> 1;
      // "idea" -> i, ea = 2; no [.!?] -> sentence floor 1
      (2L, "time idea"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "text")
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "fk_grade")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got(1L)._1 == 6L && got(1L)._2 == 2L && got(1L)._3 == 7L, s"${got(1L)}")
    val fk1 = 0.39 * (6.0 / 2.0) + 11.8 * (7.0 / 6.0) - 15.59
    assert(got(1L)._4.contains(fk1))
    assert(got(2L) == ((2L, 1L, 3L, Some(0.39 * 2.0 + 11.8 * 1.5 - 15.59))), s"${got(2L)}")
    assert(got(3L)._1 == 0L && got(3L)._4.isEmpty, "empty doc must report null scores")
    // interpreted eval agrees with the codegen'd path
    val interp = df.filter(col("doc_id") === 1L).select(
      graft.functions.ReadabilityCounts.readability_counts(col("text"))).collect().head
    val row = interp.getStruct(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((6L, 2L, 7L)))
  }

  test("theta sketches exact regime: estimates and set ops equal the true counts, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, round}
    import graft.functions.{AggFunctions, ThetaEstimate, ThetaSetEstimate}
    // A = multiples of 2 in 1..1000 (500), B = multiples of 3 (333);
    // |A ∩ B| = multiples of 6 = 166; |A \ B| = 334; |A ∪ B| = 667 —
    // all below 2^12 nominal entries, so every estimate must be EXACT
    val ids = (1L to 1000L).toDF("id")
    for (parts <- Seq(1, 7)) {
      val a = ids.repartition(parts).filter(col("id") % 2 === 0)
        .agg(AggFunctions.theta_sketch(col("id")).as("sa"))
      val b = ids.repartition(parts).filter(col("id") % 3 === 0)
        .agg(AggFunctions.theta_sketch(col("id")).as("sb"))
      val got = a.crossJoin(b).select(
        round(ThetaEstimate.theta_estimate(col("sa"))).cast("long"),
        round(ThetaEstimate.theta_estimate(col("sb"))).cast("long"),
        round(ThetaSetEstimate.theta_intersect(col("sa"), col("sb"))).cast("long"),
        round(ThetaSetEstimate.theta_a_not_b(col("sa"), col("sb"))).cast("long"),
        round(ThetaSetEstimate.theta_union_est(col("sa"), col("sb"))).cast("long"))
        .collect().map(r => (0 until 5).map(r.getLong)).head
      assert(got == Seq(500L, 333L, 166L, 334L, 667L),
        s"parts=$parts: exact-regime theta must be exact, got $got")
    }
    // string keys share the code path
    val sGot = Seq("x", "y", "x", "z").toDF("s")
      .agg(AggFunctions.theta_sketch(col("s")).as("sk"))
      .select(round(ThetaEstimate.theta_estimate(col("sk"))).cast("long"))
      .collect().head.getLong(0)
    assert(sGot == 3L)
  }

  test("theta sketches estimation mode: relative error inside the 1/sqrt(k) family; union agg re-merges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, round}
    import graft.functions.{AggFunctions, ThetaEstimate}
    // 100k distinct >> 2^12 nominal entries: estimation mode. RSE for
    // theta at k=4096 is ~1/sqrt(k) ≈ 1.6%; assert a generous 5 sigma
    val n = 100000L
    val est = (1L to n).toDF("id")
      .agg(AggFunctions.theta_sketch(col("id")).as("sk"))
      .select(ThetaEstimate.theta_estimate(col("sk")))
      .collect().head.getDouble(0)
    assert(math.abs(est - n) / n <= 0.08, s"estimate $est strayed >8% from $n")
    // the union AGG over stored sketch halves estimates the same total
    val parts = Seq((1L to 50000L), (50001L to 100000L)).map { r =>
      r.toDF("id").agg(AggFunctions.theta_sketch(col("id")).as("sk"))
    }.reduce(_ unionByName _)
    val merged = parts.agg(AggFunctions.theta_union(col("sk")).as("u"))
      .select(ThetaEstimate.theta_estimate(col("u")))
      .collect().head.getDouble(0)
    assert(math.abs(merged - n) / n <= 0.08, s"union-merged estimate $merged strayed >8%")
  }

  test("contaminationReportBloom equals the exact report at fpp 1% and at a terrible 40%") {
    val train = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "the quick brown fox jumps again and again today",
      4L -> "completely unrelated words nowhere near benchmarks at all")
    val bench = docs(10L -> "the quick brown fox jumps over a fence",
                     11L -> "short")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val exact = rows(Dedup.contaminationReport(train, bench, "doc_id", "text",
      width = 5, minShared = 1))
    // no false negatives + exact confirm join => identical at ANY fpp;
    // 0.4 floods the pre-filter with false positives on purpose
    for (fpp <- Seq(0.01, 0.4)) {
      val bloomed = rows(Dedup.contaminationReportBloom(train, bench, "doc_id", "text",
        width = 5, minShared = 1, fpp = fpp))
      assert(bloomed == exact, s"fpp=$fpp diverged from the exact report")
    }
    // sanity: the corpus actually exercises both outcomes
    assert(exact.exists(_._3) && exact.exists(!_._3))
  }

  test("writeIvfPq layout: indexed search equals in-memory ivfPqTopK and prunes cell dirs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(37)
    val corpus = (0L until 300L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)).toDF("vec_id", "embedding")
    val query = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    SimilaritySearch.writeIvfPq(corpus, "vec_id", "embedding", path,
      nCells = 8, nCodes = 16, m = 4)
    val idx = SimilaritySearch.ivfPqTopKIndexed(spark, path, "vec_id", query,
      k = 10, nProbe = 3)
    // probe predicate must prune at the directory level, before any
    // file opens — the property that matters at 100 TB
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(800))
    val mem = SimilaritySearch.ivfPqTopK(corpus, "vec_id", "embedding", query,
        k = 10, nCells = 8, nProbe = 3, nCodes = 16, m = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(idx.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == mem,
      "indexed IVF-PQ must equal the in-memory composition")
    // the stored rows carry only (id, codes, cell) — no float vectors
    assert(spark.read.parquet(s"$path/codes").schema.fieldNames.toSet ==
      Set("vec_id", "pq_codes", "cell"))
  }

  test("lexicalTopK: overlap-then-tf-then-id ordering, zero-overlap docs dropped") {
    val df = docs(
      1L -> "alpha beta beta gamma",   // overlap 2 (alpha, beta), tf 3
      2L -> "alpha alpha alpha",       // overlap 1, tf 3
      3L -> "beta",                    // overlap 1, tf 1
      4L -> "delta epsilon",           // overlap 0 -> dropped
      5L -> "beta alpha")              // overlap 2, tf 2
    val out = SimilaritySearch.lexicalTopK(df, "doc_id", "text",
        Seq("alpha", "beta"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // (id, overlap, tf, rank): 1 beats 5 on tf; 2 beats 3 on tf
    assert(out.toSeq == Seq((1L, 2L, 3L, 1L), (5L, 2L, 2L, 2L),
      (2L, 1L, 3L, 3L), (3L, 1L, 1L, 4L)))
  }

  test("hybridTopK: RRF sums 1/(k0+rank) across lists, single-list docs keep one term") {
    import spark.implicits._
    val texts = docs(1L -> "alpha beta", 2L -> "alpha", 3L -> "gamma delta")
    // embeddings: id 2 closest to the query, then 3; id 1 has no vector
    val vecs = Seq(
      (2L, Seq(1f, 0f)), (3L, Seq(0.8f, 0.6f)), (9L, Seq(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.hybridTopK(
        texts, "doc_id", "text", vecs, "vec_id", "embedding",
        queryText = "alpha beta", queryVec = Array(1f, 0f),
        k = 10, nPerList = 10, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // lexical ranks: 1 -> 1, 2 -> 2; vector ranks: 2 -> 1, 3 -> 2, 9 -> 3
    assert(out(1L) == 1.0 / 61)               // lexical only
    assert(out(2L) == 1.0 / 62 + 1.0 / 61)    // both lists
    assert(out(3L) == 1.0 / 62)               // vector only
    assert(out(9L) == 1.0 / 63)               // anti-correlated but ranked
    // fusion puts the both-lists doc first
    val first = SimilaritySearch.hybridTopK(
      texts, "doc_id", "text", vecs, "vec_id", "embedding",
      "alpha beta", Array(1f, 0f), k = 1, nPerList = 10).head().getLong(0)
    assert(first == 2L)
  }

  test("knnJoin recall >= 0.9 at auto settings on a clustered corpus (the production shape)") {
    import spark.implicits._
    // 20 cluster centers + per-point noise in 32 dims: the shape real
    // embedding corpora have (q51/q52's sf tables are built this way)
    val rnd = new scala.util.Random(41)
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextFloat() * 2 - 1))
    val corpus = (0L until 600L).map { i =>
      val c = centers((i % 20).toInt)
      i -> c.map(v => v + (rnd.nextFloat() * 2 - 1) * 0.15f).toSeq
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(org.apache.spark.sql.functions.col("vec_id") < 30)
    def nnSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = nnSet(SimilaritySearch.knnJoin(queries, corpus, "vec_id", "embedding", k = 5, exact = true))
    val approx = nnSet(SimilaritySearch.knnJoin(queries, corpus, "vec_id", "embedding", k = 5))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    RecallReceipts.record("knnJoin auto settings, clustered corpus (production shape)", recall)
    assert(recall >= 0.9, s"auto-settings recall on clustered corpus was $recall")
    // single-query tier: same floor at auto settings
    val qv = corpus.filter(org.apache.spark.sql.functions.col("vec_id") === 3L)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val rest = corpus.filter(org.apache.spark.sql.functions.col("vec_id") =!= 3L)
    val exT = SimilaritySearch.bruteForceTopK(rest, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0)).toSet
    val apT = SimilaritySearch.annTopK(rest, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0)).toSet
    RecallReceipts.record("annTopK single query, clustered corpus (q51 shape)",
      apT.intersect(exT).size / 10.0)
    assert(apT.intersect(exT).size >= 9, s"annTopK recall ${apT.intersect(exT).size}/10")
  }

  test("ANN auto-sizing runs no per-query corpus scan once stats are cached") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val path = java.nio.file.Files.createTempDirectory("graft-annstats").toString + "/corpus"
    (0L until 200L).map(i => i -> Array.fill(16)(rnd.nextFloat() * 2 - 1).toSeq)
      .toDF("vec_id", "embedding").write.parquet(path)
    val c = spark.read.parquet(path)
    val query = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(500) } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    // first auto-sized call pays the one sizing count (cached after)
    SimilaritySearch.annTopK(c, "vec_id", "embedding", query, k = 5).collect()
    val cached = countJobs(SimilaritySearch.annTopK(c, "vec_id", "embedding", query, k = 5).collect())
    val explicit = countJobs(SimilaritySearch.annTopK(c, "vec_id", "embedding", query, k = 5,
      nPlanes = SimilaritySearch.autoPlanes(200, 5), corpusSize = 200).collect())
    assert(cached == explicit, s"auto-sized query ran $cached jobs vs $explicit fully-specified")
  }

  test("corpusRowCount cache invalidates on a data-epoch bump (appends re-count, not stale)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val path = java.nio.file.Files.createTempDirectory("graft-annepoch").toString + "/corpus"
    def write(n: Int): Unit = (0 until n).map(i => i.toLong -> Seq.fill(8)(rnd.nextFloat()))
      .toDF("vec_id", "embedding").write.mode("append").parquet(path)
    write(100)
    assert(SimilaritySearch.corpusRowCount(spark.read.parquet(path)) == 100L)
    write(50) // catalog append would bump the epoch; simulate the bump
    graft.core.DataEpoch.bump()
    assert(SimilaritySearch.corpusRowCount(spark.read.parquet(path)) == 150L,
      "stale cached count survived an epoch bump")
  }

  test("metadata cache: a slow compute on one key never blocks other keys; same key shares one compute") {
    val cache = SimilaritySearch.lruCache[String, Int](16)
    val aStarted = new java.util.concurrent.CountDownLatch(1)
    val aRelease = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    // key "a": compute blocks until released (a long corpus.count stand-in)
    val fa = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = SimilaritySearch.memoize(cache, "a") {
        aStarted.countDown(); aRelease.await(); 1
      }
    })
    assert(aStarted.await(5, java.util.concurrent.TimeUnit.SECONDS))
    // while "a" is mid-compute, "b" must compute and return immediately —
    // the old synchronizedMap.computeIfAbsent held the cache mutex for
    // the whole compute and would deadlock-wait here
    val fb = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = SimilaritySearch.memoize(cache, "b")(2)
    })
    assert(fb.get(5, java.util.concurrent.TimeUnit.SECONDS) == 2,
      "an unrelated key was blocked behind another key's compute")
    assert(!fa.isDone, "slow compute should still be running")
    aRelease.countDown()
    assert(fa.get(5, java.util.concurrent.TimeUnit.SECONDS) == 1)
    // same-key concurrency: N callers, exactly one compute
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = (1 to 4).map(_ => pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = SimilaritySearch.memoize(cache, "c") { runs.incrementAndGet(); 3 }
    })).map(_.get(5, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(results.forall(_ == 3) && runs.get() == 1,
      s"same-key compute ran ${runs.get()} times, want exactly 1")
  }

  test("lsh_bucket throws on mixed-dim corpus instead of silently returning empty") {
    import spark.implicits._
    val df = Seq((0L, Seq.fill(32)(0.5f)), (1L, Seq.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      SimilaritySearch.embeddingDupPairs(df, "vec_id", "embedding").count()
    }
    assert(ex.getMessage != null)
  }

  test("kMeansAssign separates two planted clusters and is repartition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // two tight caps on opposite axes + small noise
    def around(base: Array[Float]) =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq
    val ax = Array(1f, 0f, 0f, 0f); val ay = Array(0f, 1f, 0f, 0f)
    val corpus = ((0L until 20L).map(i => i -> around(ax)) ++
      (20L until 40L).map(i => i -> around(ay))).toDF("vec_id", "embedding")
    val out = SimilaritySearch.kMeansAssign(corpus, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cellsA = (0L until 20L).map(out).toSet
    val cellsB = (20L until 40L).map(out).toSet
    assert(cellsA.size == 1 && cellsB.size == 1 && cellsA != cellsB,
      s"clusters not separated: $cellsA vs $cellsB")
    // decimal-exact sums: identical assignment under any partitioning
    val again = SimilaritySearch.kMeansAssign(corpus.repartition(7), "vec_id",
        "embedding", k = 2, iters = 3)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == out)
  }

  test("kMeansCentroids: empty cell keeps its previous centroid, output stays finite") {
    import spark.implicits._
    // all vectors identical -> both init centroids equal -> every row
    // assigns first-max-wins to cell 0, cell 1 never updates
    val v = Seq(0.6f, 0.8f, 0f, 0f)
    val corpus = (0L until 6L).map(i => i -> v).toDF("vec_id", "embedding")
    val cents = SimilaritySearch.kMeansCentroids(corpus, "vec_id", "embedding", k = 2, iters = 2)
    assert(cents.forall(java.lang.Double.isFinite))
    val cells = SimilaritySearch.kMeansAssign(corpus, "vec_id", "embedding", k = 2, iters = 2)
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(cells == Set(0))
  }

  test("semanticDedup keeps one representative per transitive cosine group") {
    import spark.implicits._
    // chain: a~b (cos 15deg ~ .966), b~c (cos 15deg), a-c only cos 30deg
    // (~.866 < .95) -> one CC group {a,b,c}; d is orthogonal noise
    def rot(theta: Double) = Seq(math.cos(theta).toFloat, math.sin(theta).toFloat, 0f, 0f)
    val t = math.Pi / 12
    val corpus = Seq(10L -> rot(0), 11L -> rot(t), 12L -> rot(2 * t),
      13L -> Seq(0f, 0f, 1f, 0f)).toDF("vec_id", "embedding")
    val kept = SimilaritySearch.semanticDedup(corpus, "vec_id", "embedding",
        k = 1, iters = 1, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 13L), s"kept $kept")
  }

  test("semanticPairs shuffles vector bytes once, keyed by cell, never by id") {
    import spark.implicits._
    def rot(theta: Double) = Seq(math.cos(theta).toFloat, math.sin(theta).toFloat)
    val slim = (0L until 12L).map(i => (i, rot(i * 0.1), i % 3))
      .toDF("id", "vec", "cell")
    // Force the at-scale sort-merge path (a 12-row side would broadcast,
    // which shuffles nothing and proves nothing).
    val priorThreshold = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = SimilaritySearch.semanticPairs(slim, 0.9, 100)
      pairs.collect() // finalize the adaptive plan so exchange reuse shows
      val plan = pairs.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head // assert on the FINAL plan only
      // The r8 shape joined candidate ids back to the corpus twice on `id`;
      // cell-local pairing must never key a vector-carrying exchange by id.
      assert(!plan.contains("hashpartitioning(id"),
        s"vector exchange keyed by id:\n$plan")
      // Self-join inputs canonicalize to one scan: the vector bytes are
      // shuffled once and the second side reads the SAME shuffle via
      // reuse. Materialized exchanges on cell: 1 vector-carrying + 1 for
      // the O(k)-row cell-size count = 2.
      // ReusedExchange nodes re-print the text of the exchange they
      // reference, so count only lines that MATERIALIZE an exchange.
      val cellEx = plan.linesIterator
        .filterNot(_.contains("ReusedExchange"))
        .count(_.matches(".*Exchange hashpartitioning\\(cell.*"))
      val reused = plan.contains("ReusedExchange") ||
        plan.contains("ReusedQueryStage")
      assert(cellEx <= 2 && reused,
        s"expected <=2 cell exchanges + reuse (got $cellEx, reused=$reused):\n$plan")
    } finally priorThreshold match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("semanticDedup maxCellSize guard skips oversized cells") {
    import spark.implicits._
    def rot(theta: Double) = Seq(math.cos(theta).toFloat, math.sin(theta).toFloat, 0f, 0f)
    val t = math.Pi / 12
    val corpus = Seq(10L -> rot(0), 11L -> rot(t), 12L -> rot(2 * t))
      .toDF("vec_id", "embedding")
    val kept = SimilaritySearch.semanticDedup(corpus, "vec_id", "embedding",
        k = 1, iters = 1, threshold = 0.95, maxCellSize = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 11L, 12L)) // 3-row cell exceeds the cap: untouched
  }

  test("minhash store: self-probe equals the in-memory operator; cross-probe finds history dupes; parts prune") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft-mhstore").toString + "/store"
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "pack my box with five dozen liquor jugs right now",
      4L -> "completely unrelated words about nothing in particular here")
    Dedup.writeMinhashStore(corpus, "doc_id", "text", path, nParts = 8)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "est_jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // probing the store with its own corpus must reproduce the
    // in-memory candidate set bit-for-bit (same caps, same scoring)
    val direct = rows(Dedup.minHashCandidates(corpus, "doc_id", "text"))
    assert(direct.nonEmpty)
    assert(rows(Dedup.minhashCandidatesAgainstStore(corpus, "doc_id", "text", path)) == direct)

    // incremental probe: a new batch pairs with stored history only
    val batch = docs(10L -> "the quick brown fox jumps over the lazy dog soon",
                     11L -> "fresh text sharing no shingles with anything stored")
    val cross = Dedup.minhashCandidatesAgainstStore(batch, "doc_id", "text", path)
    val got = rows(cross)
    assert(got.forall { case (a, b, _) => a <= 4L && b >= 10L },
      s"expected only (history, batch) pairs, got $got")
    assert(got.exists { case (a, b, e) => Set(1L, 2L).contains(a) && b == 10L && e > 0.3 },
      s"near-dup of stored docs not found: $got")
    assert(!got.exists(_._2 == 11L), s"unrelated batch doc paired: $got")

    // the bands scan is pruned to the probe's parts by literal filter
    val scans = cross.queryExecution.executedPlan.collectLeaves().map(_.treeString)
    val bandScan = scans.find(_.contains("bands"))
    assert(bandScan.exists(s => s.contains("PartitionFilters") && s.contains("part")),
      s"bands scan not part-pruned:\n${scans.mkString("\n").take(1200)}")

    // parameter-mismatched append must fail loudly, not corrupt
    intercept[IllegalArgumentException] {
      Dedup.writeMinhashStore(batch, "doc_id", "text", path, bands = 4, mode = "append")
    }
    // a legit append (same parameters as the store) then surfaces the
    // new doc to future probes
    Dedup.writeMinhashStore(batch, "doc_id", "text", path, nParts = 8, mode = "append")
    val after = rows(Dedup.minhashCandidatesAgainstStore(
      docs(20L -> "the quick brown fox jumps over the lazy dog soon"),
      "doc_id", "text", path))
    assert(after.exists { case (a, b, _) => a == 10L && b == 20L }, s"appended doc invisible: $after")
  }

  test("removeBoilerplateLines: global header dropped, order kept, exact-byte identity, empty docs survive") {
    import org.apache.spark.sql.functions.col
    val hdr = "SITE NAV | HOME"
    val corpus = docs(
      1L -> s"$hdr\nfirst real line\nsecond real line",
      2L -> s"$hdr\nother content here",
      3L -> s"$hdr\nSITE NAV | home\nmore text", // case differs: the lowercase twin is NOT boilerplate
      4L -> hdr)                                  // nothing but boilerplate
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.removeBoilerplateLines(d, "doc_id", "text", maxDf = 2)
        .select("doc_id", "text_clean", "n_lines_kept")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = run(corpus)
    assert(got == Seq(
      (1L, "first real line\nsecond real line", 2L),
      (2L, "other content here", 1L),
      (3L, "SITE NAV | home\nmore text", 2L),
      (4L, "", 0L)))
    assert(run(corpus.repartition(5)) == got, "reassembly depends on partition layout")
  }

  test("containmentPairs: quote-style dupes invisible to Jaccard, both directions reported") {
    import org.apache.spark.sql.functions.col
    val quote = "the five boxing wizards jump quickly tonight"
    val big = ("filler opening words here to start with " * 8) + quote +
      (" and then much more unrelated trailing content follows " * 8)
    val corpus = docs(
      1L -> quote,                                     // fully contained in 2
      2L -> big,
      3L -> "completely different text about other things entirely")
    val pairs = Dedup.containmentPairs(corpus, "doc_id", "text",
        shingleWidth = 3, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(pairs.contains((1L, 2L)), s"contained quote not detected: $pairs")
    val (ca, cb, cMax) = pairs((1L, 2L))
    assert(ca == 1.0, s"doc 1 is fully inside doc 2: containment_a=$ca")
    assert(cb < 0.5 && cMax == 1.0)
    // and Jaccard at the same threshold misses it — the reason the
    // operator exists
    val jac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        shingleWidth = 3, threshold = 0.8)
      .collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "fixture flaw: Jaccard also fires, containment adds nothing")
  }

  test("leakageSafeSplit: near-dup families never straddle a split, at any salt; fractions sane") {
    import org.apache.spark.sql.functions.col
    // two near-dup families + unrelated singletons
    val corpus = docs(
      (Seq(
        1L -> "the quick brown fox jumps over the lazy dog tonight",
        2L -> "the quick brown fox jumps over the lazy dog today",
        3L -> "pack my box with five dozen liquor jugs right now",
        4L -> "pack my box with five dozen liquor jugs right here") ++
        (100L until 300L).map(i => i -> s"unique document number $i with its own words w$i x${i * 7} y${i * 13}")): _*)
    for (salt <- Seq("a", "b", "c")) {
      val out = Dedup.leakageSafeSplit(corpus, "doc_id", "text",
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = salt, threshold = 0.5)
      val bySplit = out.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(bySplit.size == corpus.count())
      // family members share a split — the whole point
      assert(bySplit(1L) == bySplit(2L), s"salt=$salt split family {1,2}")
      assert(bySplit(3L) == bySplit(4L), s"salt=$salt split family {3,4}")
      // cut points honored loosely on ~200 singletons (hash ring is
      // uniform-ish, not exact)
      val n = bySplit.size.toDouble
      val trainFrac = bySplit.values.count(_ == "train") / n
      assert(trainFrac > 0.6 && trainFrac < 0.95, s"salt=$salt trainFrac=$trainFrac")
      assert(bySplit.values.toSet.size >= 2, s"salt=$salt produced a single split")
    }
    // every row labeled; fractions must sum to 1
    intercept[IllegalArgumentException] {
      Dedup.leakageSafeSplit(corpus, "doc_id", "text",
        splits = Seq("train" -> 0.8, "val" -> 0.1), salt = "x")
    }
  }

  test("distinctiveTokens: hand-computed smoothed ratios; exclusive tokens finite; ties by token") {
    import spark.implicits._
    val df = Seq(("A", "aa aa cc"), ("B", "bb cc cc")).toDF("lang", "text")
    val got = TextAnalysis.distinctiveTokens(df, "lang", "text", minCount = 1, k = 10)
      .orderBy("stratum", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSeq
    // grand=6, totals A=3 B=3, tok_totals aa=2 bb=1 cc=3
    // A/aa: (2/3)/((0+1)/(3+1)) = 8/3 — stratum-exclusive, finite via smoothing
    // A/cc: (1/3)/((2+1)/4)     = 4/9
    // B/bb: (1/3)/((0+1)/4)     = 4/3;  B/cc: (2/3)/((1+1)/4) = 4/3 — tie,
    // token order ranks bb first
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(got.map(t => (t._1, t._2, t._3, t._5)) == Seq(
      ("A", "aa", 2L, 1L), ("A", "cc", 1L, 2L),
      ("B", "bb", 1L, 1L), ("B", "cc", 2L, 2L)))
    assert(close(got(0)._4, 8.0 / 3) && close(got(1)._4, 4.0 / 9) &&
      close(got(2)._4, 4.0 / 3) && close(got(3)._4, 4.0 / 3))
    // minCount prunes the noise floor before ranking
    val pruned = TextAnalysis.distinctiveTokens(df, "lang", "text", minCount = 2, k = 10)
      .select("stratum", "token").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("A", "aa"), ("B", "cc")))
  }

  test("unigramSurprisal: hand-computed quantized cross-entropy; repartition-invariant") {
    val df = docs(1L -> "a a b", 2L -> "a c", 3L -> "")
    // counts: a=3 b=1 c=1; N=5, V=3; quantized lns (scale 1e4):
    // u(a)=round(ln 4 *1e4)=13863, u(b)=u(c)=round(ln 2 *1e4)=6931,
    // lnNV=round(ln 8 *1e4)=20794
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.unigramSurprisal(d, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = run(df)
    assert(got(1L) == ((3L, (3L * 20794 - (2L * 13863 + 6931)).toDouble / 30000.0)))
    assert(got(2L) == ((2L, (2L * 20794 - (13863 + 6931)).toDouble / 20000.0)))
    assert(got(3L) == ((0L, 0.0)))
    // the all-same-token doc is the LEAST surprising, gibberish the most
    val ranked = run(docs(1L -> "a a a a", 2L -> "a a zq zz", 3L -> "zq zz yx wv"))
    assert(ranked(1L)._2 < ranked(2L)._2 && ranked(2L)._2 < ranked(3L)._2)
    // integer-quantized sums are order-free: exact equality under repartition
    assert(run(df.repartition(7)) == got)
  }

  test("bm25MultiTopK: each query's slice is bit-identical to the single-query path") {
    val words = Seq("alpha", "beta", "gamma", "delta", "omega", "rare")
    val rnd = new scala.util.Random(99)
    val df = docs((1L to 40L).map { i =>
      val body = (0 until 10 + rnd.nextInt(20)).map(_ => words(rnd.nextInt(5))).mkString(" ")
      i -> (if (i % 11 == 0) s"rare $body" else body)
    }: _*)
    val queries = Seq(7L -> "alpha rare", 8L -> "beta gamma", 9L -> "omega")
    val batch = SimilaritySearch.bm25MultiTopK(df, "doc_id", "text", queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    queries.foreach { case (qid, text) =>
      val single = SimilaritySearch.bm25TopK(df, "doc_id", "text",
          text.split(" ").toSeq, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val slice = batch(qid).sortBy(_._4).map(t => (t._2, t._3)).toSeq
      assert(slice == single, s"qid=$qid: batch $slice != single $single")
    }
  }

  test("labelCoherence: identical=1, antipodal=0, orthogonal pair hand-computed; repartition-invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, 0.0f, 0.0f, 0.0f), 0),   // A: two identical members
      (2L, Array(0.5f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),   // B: antipodal -> zero centroid
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1),
      (5L, Array(1.0f, 0.0f, 0.0f, 0.0f), 2),   // C: orthogonal pair
      (6L, Array(0.0f, 1.0f, 0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.labelCoherence(d, "vec_id", "embedding", "label")
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val got = run(df)
    assert(got(0) == ((2L, 2L, 1.0)), s"identical members must cohere at 1.0, got ${got(0)}")
    assert(got(1) == ((2L, 2L, 0.0)), "a degenerate (zero) centroid must report 0, not NaN")
    // cos(e1, (0.5, 0.5)) = 1/sqrt(2), quantized to 1e-6
    val expected = math.round(1.0 / math.sqrt(2.0) * 1000000L).toDouble / 1000000.0
    assert(got(2) == ((2L, 2L, expected)), s"got ${got(2)}, want $expected")
    assert(run(df.repartition(5)) == got)
  }

  test("labelCoherence: wrong-length member is excluded via n_scored, not silently deflated") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f), 0), // dimension rot: 3-dim in a 2-dim class
      (4L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = SimilaritySearch.labelCoherence(df, "vec_id", "embedding", "label")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // class 0: the centroid spans the UNION of component indices
    // (length 3 here), so the two 2-dim members are nulled out and only
    // the length-matching member scores — cosine exactly 1 against the
    // (1, 0, 0) direction, NOT a mean silently deflated by null-skipped
    // sums over a divisor of 3
    val (n0, k0, m0) = got(0)
    assert(n0 == 3L && k0 == 1L, s"expect n_vectors=3, n_scored=1, got ($n0, $k0)")
    assert(m0 == 1.0, s"mean over SCORED members must be 1.0, got $m0")
    assert(got(1) == ((1L, 1L, 1.0)))
    // null labels are excluded entirely (documented: null = unlabeled)
    val withNull = df.unionByName(Seq((5L, Array(1.0f, 0.0f), null.asInstanceOf[Integer]))
      .toDF("vec_id", "embedding", "label"))
    val labels = SimilaritySearch.labelCoherence(withNull, "vec_id", "embedding", "label")
      .collect().map(r => Option(r.get(0))).toSet
    assert(!labels.contains(None), "null label must not appear as a class")
  }

  test("nfc_normalize: composes decomposed sequences, idempotent, null-safe, codegen == eval") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions.nfc_normalize
    val df = Seq(
      (1L, "café"),          // e + combining acute -> é
      (2L, "café"),           // already composed
      (3L, "naïve plain"),   // i + combining diaeresis mid-word
      (4L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val got = df.select(col("id"), nfc_normalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "café" && got(1L) == got(2L),
      "decomposed and composed inputs must normalize to the same bytes")
    assert(got(3L) == "naïve plain")
    assert(got(4L) == null)
    // idempotence: normalizing the normalized output changes nothing
    val twice = df.filter(col("s").isNotNull)
      .select(col("id"), nfc_normalize(nfc_normalize(col("s"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got.filter(_._2 != null))
    // the dedup motivation: fingerprints agree only after normalization
    val fp = df.filter(col("id") <= 2)
      .select(graft.functions.TextFunctions.fingerprint64(col("s")).as("raw"),
        graft.functions.TextFunctions.fingerprint64(nfc_normalize(col("s"))).as("norm"))
      .collect()
    assert(fp.map(_.getLong(0)).distinct.length == 2, "raw fingerprints should differ")
    assert(fp.map(_.getLong(1)).distinct.length == 1, "normalized fingerprints must agree")
  }

  test("bm25TopKIndexed == bm25TopK exactly; probe prunes to the query tokens' partitions") {
    val words = Seq("alpha", "beta", "gamma", "delta", "omega", "rare")
    val rnd = new scala.util.Random(77)
    val df = docs((1L to 40L).map { i =>
      val body = (0 until 10 + rnd.nextInt(20)).map(_ => words(rnd.nextInt(5))).mkString(" ")
      i -> (if (i % 13 == 0) s"rare $body" else body)
    }: _*)
    val dir = java.nio.file.Files.createTempDirectory("graft_lexidx").toString
    SimilaritySearch.writeLexicalIndex(df, "doc_id", "text", dir, nParts = 16)
    val q = Seq("alpha", "rare")
    val mem = SimilaritySearch.bm25TopK(df, "doc_id", "text", q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = SimilaritySearch.bm25TopKIndexed(spark, dir, q, k = 10)
    val got = idx.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // bit-exact equality: same contributions, same order, same scores
    assert(got == mem, s"indexed=$got scan=$mem")
    assert(got.head._1 % 13 == 0, "the rare-term doc must outrank the commons")
    // the postings scan is partition-pruned before any row is read
    val scan = idx.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("postings")).mkString("\n")
    assert(scan.contains("PartitionFilters: [part#") || scan.contains("PartitionFilters: [isnotnull(part"),
      s"postings scan not partition-pruned:\n$scan")
  }

  test("bigramSurprisal: hand-computed quantized transition entropy; order sensitivity") {
    val df = docs(1L -> "a b a b", 2L -> "b a", 3L -> "a")
    // transitions: d1 {(a,b)x2,(b,a)x1}, d2 {(b,a)x1}; big: (a,b)=2,(b,a)=2
    // ctx: a=2,b=2; V=2; uCtx=round(ln4*1e4)=13863, uBig=round(ln3*1e4)=10986
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bigramSurprisal(d, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = run(df)
    assert(got(1L) == ((3L, (3L * (13863 - 10986)).toDouble / 30000.0)))
    assert(got(2L) == ((1L, (13863 - 10986).toDouble / 10000.0)))
    assert(got(3L) == ((0L, 0.0)))
    assert(run(df.repartition(7)) == got)
    // same bag of words, different order -> different transition score
    // (unigramSurprisal is blind to this by construction)
    val bag = run(docs(1L -> "a b a b a b", 2L -> "a a a b b b", 3L -> "a b b a a b"))
    assert(bag(1L)._2 != bag(2L)._2, "scrambled order must move the bigram score")
    val uni = TextAnalysis.unigramSurprisal(
        docs(1L -> "a b a b a b", 2L -> "a a a b b b", 3L -> "a b b a a b"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) == uni(2L), "unigram score must be order-blind (same bag)")
  }

  test("randomProjection: salt-determined matrix, exact linearity, repartition-invariant") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f, -1.0f)),
      (2L, Array(2.0f, 0.0f, 4.0f, -2.0f)),   // = 2 * v1 (powers of two: exact)
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.randomProjection(d, "vec_id", "embedding",
          outDim = 3, inDim = 4, salt = "t")
        .collect().map(r => r.getLong(0) -> (1 to 3).map(r.getDouble).toSeq).toMap
    val got = run(vecs)
    // hand-derived first coefficient: FNV-1a("t:0:0") -> bucket -> [-1, 1]
    val h = graft.functions.Fingerprint64.hash("t:0:0".getBytes("UTF-8"))
    val c00 = (((h % 2001L) + 2001L) % 2001L - 1000L).toDouble / 1000.0
    val single = run(Seq((9L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    assert(single(9L).head == c00, "unit vector must read off the raw coefficient")
    // doubling the input exactly doubles every output (×2 is exact in IEEE)
    assert(got(2L) == got(1L).map(_ * 2.0))
    assert(got(3L) == Seq(0.0, 0.0, 0.0))
    // a pure map stage: same bits on any partitioning
    assert(run(vecs.repartition(3)) == got)
  }

  test("surprisalBuckets: ntile balance within stratum, head = least surprising, repartition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // stratum A: 6 docs from "all common" to "all gibberish"; B: 2 docs
    val df = Seq(
      (1L, "A", "a a a a"), (2L, "A", "a a a b"), (3L, "A", "a a b b"),
      (4L, "A", "a b zq zz"), (5L, "A", "zq zz yx a"), (6L, "A", "zq zz yx wv"),
      (10L, "B", "a a a"), (11L, "B", "zq zz yx"))
      .toDF("doc_id", "lang", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.surprisalBuckets(d, "doc_id", "text", col("lang"), nBuckets = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getLong(4)))
    val got = run(df)
    val byDoc = got.map(t => t._1 -> t._4).toMap
    // stratum A: 6 docs over 3 buckets -> exactly 2 each, rank-ordered
    assert(got.filter(_._2 == "A").groupBy(_._4).view.mapValues(_.size).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2))
    assert(byDoc(1L) == 1L && byDoc(6L) == 3L, s"head/tail misassigned: $byDoc")
    // xent must be monotone w.r.t. bucket within each stratum
    val aSorted = got.filter(_._2 == "A").sortBy(_._3)
    assert(aSorted.map(_._4).toSeq == aSorted.map(_._4).toSeq.sorted)
    // stratum B splits 2 docs into buckets 1 and 2 (ntile leaves 3 empty)
    assert(got.filter(_._2 == "B").map(_._4).toSet == Set(1L, 2L))
    assert(run(df.repartition(5)).toSet == got.toSet)
  }

  test("bm25TopK: idf weights rare terms up, tf saturates, repartition-invariant") {
    val df = docs(
      1L -> "rare common common filler filler",   // the one rare-term doc
      2L -> "common common common filler filler", // common x3, same dl
      3L -> "common filler filler filler filler", // common x1
      4L -> "filler filler filler filler filler") // no query tokens
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.bm25TopK(d, "doc_id", "text", Seq("rare", "common"), k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = run(df)
    // non-matching docs never appear; the rare-term doc wins despite
    // fewer query-token occurrences than doc2 (idf at work)
    assert(got.map(_._1) == Seq(1L, 2L, 3L), s"got $got")
    // tf monotonicity at equal dl; scores strictly ordered
    assert(got(0)._2 > got(1)._2 && got(1)._2 > got(2)._2)
    // integer-quantized accumulation: exact equality under repartition
    assert(run(df.repartition(5)) == got)
  }

  test("capPerGroup: big groups downsample to ~cap, small kept whole, pure-function membership") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = ((1L to 1000L).map(i => (i, "big")) ++ (2001L to 2050L).map(i => (i, "small")))
      .toDF("id", "grp")
    def kept(d: org.apache.spark.sql.DataFrame, salt: String) =
      TextAnalysis.capPerGroup(d, col("id"), col("grp"), cap = 100L, salt = salt)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val k1 = kept(df, "s1")
    val byGrp = k1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byGrp("small") == 50, s"under-cap group must be kept whole, got $byGrp")
    // binomial(1000, 0.1): 3-sigma band around 100
    assert(byGrp("big") > 70 && byGrp("big") < 130, s"big kept ${byGrp("big")}")
    assert(k1.subsetOf(df.collect().map(r => (r.getLong(0), r.getString(1))).toSet))
    // membership is a pure function of (salt, id, counts)
    assert(kept(df.repartition(13), "s1") == k1, "membership changed under repartition")
    assert(kept(df, "s2") != k1, "distinct salts must draw distinct samples")
    // cap >= group size keeps everything; original columns preserved
    val all = TextAnalysis.capPerGroup(df, col("id"), col("grp"), cap = 1000L, salt = "s1")
    assert(all.count() == 1050L && all.columns.toSeq == Seq("id", "grp"))
    // a null group is a group: counted and capped like any other
    val withNull = df.union(Seq((3001L, null.asInstanceOf[String])).toDF("id", "grp"))
    val kn = kept(withNull, "s1")
    assert(kn.contains((3001L, null)), "singleton null group must survive the cap")
  }
}
