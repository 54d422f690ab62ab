package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventAnalytics, SimilaritySearch, TextAnalysis}
import scala.collection.immutable.ListMap
import scala.util.Random

/** Operator-PARAMETER fuzzer: the relational fuzzer's seed-386 catch
  * proved a wide seeded sweep samples holes a fixed battery can't — this
  * aims the same weapon at the custom operator surface, where the
  * engine's own code (and therefore its bug mass) actually lives. Each
  * seed draws a family — the report-shaped ops (exact-overlap dedup,
  * MinHash LSH, winnowing, SimHash, BM25, chunking, IVF ANN, k-means),
  * the DESTRUCTIVE/composite ops that excise or reassign user data
  * (span removal both variants, near-dup removal, leakage-safe split,
  * sequence packing, token-budget sharding, as-of direction x
  * tolerance), and — round 3 — the EVENT-ANALYTICS ops (funnels open
  * and time-boxed, top paths, transition matrices, OHLC resampling,
  * volume-anomaly scoring, gap filling) — and a random point in that
  * operator's REAL parameter space (shingle width, thresholds,
  * minShared, DF caps, hash counts, band counts, bucket caps, chunk
  * size/overlap, query-token sets, k, span k/minCount, split
  * fractions/salts, token budgets, as-of direction/tolerance, funnel
  * step sequences/deadlines, path lengths, type alphabets, bucket
  * units, trailing windows, z thresholds, grid sparsity), then emits
  * the paired artifacts: the operator call and the DuckDB SQL that
  * replays it at those exact parameters (the parameterized generators
  * in [[OracleSql]]).
  *
  * Verification levels, mirroring [[FuzzQueries]]:
  *  1. [[OpFuzzSpec]]: in-process invariants + parameter-mutation
  *     sensitivity (a changed parameter must change the output for a
  *     floor of seeds — the differential is not vacuous) + determinism.
  *  2. Twenty-two FIXED seeds join the battery as q208–q229 (one per
  *     family), hash-checked by the driver's DuckDB gate every round.
  *  3. [[OpFuzzSweep]] replays arbitrary seed ranges through
  *     `scripts/check_oracle.py` — the full cross-engine differential
  *     at parameters no hand-written battery row exercises.
  *
  * Determinism ground rules, inherited from the battery rows these
  * families generalize (q46/q48/q49/q59/q77/q135/q140 scaladocs): every
  * family's output is exact (integer counts, exact-ratio doubles,
  * micro-unit-quantized BM25) and totally ordered; hash collisions
  * between the engine's 64-bit shingle hashes and the oracle's string
  * shingles are negligible at test scale. Parameter ranges stay inside
  * each operator's documented contract (e.g. bands divides numHashes,
  * overlap < chunkSize).
  */
object OpFuzz {
  type Q = (SparkSession, String) => DataFrame

  /** `mutated` is the same family with ONE parameter nudged — the
    * sensitivity control: outputs must differ from `query` for a floor
    * of seeds or the parameter differential is vacuous (OpFuzzSpec). */
  final case class Generated(family: String, params: String, query: Q, sql: String,
                             mutated: Q)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def pick[A](r: Random, xs: Vector[A]): A = xs(r.nextInt(xs.size))

  /** Tokens verified present in the synthetic documents table at every
    * SF (mix of common and rare, so idf actually orders results). */
  private val vocab = Vector("join", "hash", "row", "batch", "scan", "filter",
    "merge", "vector", "stream", "window", "spark", "sort", "query", "dup")

  private def jaccardGen(r: Random): Generated = {
    val w = pick(r, Vector(2, 3, 4, 5))
    val th = pick(r, Vector(0.1, 0.2, 0.3, 0.4, 0.5))
    val ms = pick(r, Vector(1, 2, 3))
    val maxDf = pick(r, Vector(20, 100, 1000))
    Generated("jaccard", s"w=$w th=$th minShared=$ms maxDf=$maxDf",
      (s, d) => Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text",
        shingleWidth = w, threshold = th, minShared = ms, maxDf = maxDf)
        .orderBy("id_a", "id_b"),
      OracleSql.jaccardPairsSql(w, th, ms, maxDf),
      (s, d) => Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text",
        shingleWidth = w + 1, threshold = th, minShared = ms, maxDf = maxDf)
        .orderBy("id_a", "id_b"))
  }

  private def containmentGen(r: Random): Generated = {
    val w = pick(r, Vector(2, 3, 4, 5))
    val th = pick(r, Vector(0.5, 0.6, 0.7, 0.8, 0.9))
    val ms = pick(r, Vector(1, 2, 3))
    val maxDf = pick(r, Vector(20, 100, 1000))
    Generated("containment", s"w=$w th=$th minShared=$ms maxDf=$maxDf",
      (s, d) => Dedup.containmentPairs(docs(s, d), "doc_id", "text",
        shingleWidth = w, threshold = th, minShared = ms, maxDf = maxDf)
        .orderBy("id_a", "id_b"),
      OracleSql.containmentPairsSql(w, th, ms, maxDf),
      (s, d) => Dedup.containmentPairs(docs(s, d), "doc_id", "text",
        shingleWidth = w + 1, threshold = th, minShared = ms, maxDf = maxDf)
        .orderBy("id_a", "id_b"))
  }

  private def minhashGen(r: Random): Generated = {
    val (nh, bands) = pick(r, Vector((16, 4), (16, 8), (32, 4), (32, 8),
      (32, 16), (64, 8), (64, 16)))
    val w = pick(r, Vector(2, 3, 4))
    val cap = pick(r, Vector(50, 500))
    val th = pick(r, Vector(0.3, 0.5, 0.7))
    Generated("minhash", s"numHashes=$nh bands=$bands w=$w cap=$cap th=$th",
      (s, d) => Dedup.minHashCandidates(docs(s, d), "doc_id", "text",
        numHashes = nh, bands = bands, shingleWidth = w, maxBucketSize = cap)
        .filter(col("est_jaccard") >= th).orderBy("id_a", "id_b"),
      OracleSql.minhashCandidatesSql(nh, bands, w, cap, th),
      (s, d) => Dedup.minHashCandidates(docs(s, d), "doc_id", "text",
        numHashes = nh, bands = bands, shingleWidth = w + 1, maxBucketSize = cap)
        .filter(col("est_jaccard") >= th).orderBy("id_a", "id_b"))
  }

  private def winnowGen(r: Random): Generated = {
    val k = pick(r, Vector(12, 24, 32))
    val win = pick(r, Vector(6, 12, 20))
    val ms = pick(r, Vector(1, 3, 5))
    val maxDf = pick(r, Vector(50, 1000))
    Generated("winnow", s"k=$k window=$win minShared=$ms maxDf=$maxDf",
      (s, d) => Dedup.winnowOverlapPairs(docs(s, d), "doc_id", "text",
        k = k, window = win, minShared = ms, maxDf = maxDf)
        .orderBy("id_a", "id_b"),
      OracleSql.winnowPairsSql(k, win, ms, maxDf),
      (s, d) => Dedup.winnowOverlapPairs(docs(s, d), "doc_id", "text",
        k = k + 4, window = win, minShared = ms, maxDf = maxDf)
        .orderBy("id_a", "id_b"))
  }

  private def simhashGen(r: Random): Generated = {
    val mh = pick(r, Vector(1, 2, 3, 7))
    val cap = pick(r, Vector(50, 500))
    Generated("simhash", s"maxHamming=$mh cap=$cap",
      (s, d) => Dedup.simHashPairs(docs(s, d), "doc_id", "text",
        maxHamming = mh, maxBucketSize = cap).orderBy("id_a", "id_b"),
      OracleSql.simhashPairsSql(mh, cap),
      (s, d) => Dedup.simHashPairs(docs(s, d), "doc_id", "text",
        maxHamming = mh + 4, maxBucketSize = cap).orderBy("id_a", "id_b"))
  }

  private def bm25Gen(r: Random): Generated = {
    val toks = r.shuffle(vocab).take(1 + r.nextInt(4))
    val k = pick(r, Vector(5, 10, 20, 50))
    Generated("bm25", s"tokens=${toks.mkString("+")} k=$k",
      (s, d) => SimilaritySearch.bm25TopK(docs(s, d), "doc_id", "text",
        toks, k = k).orderBy(col("bm25").desc, col("doc_id")),
      OracleSql.bm25TopKSql(toks, k),
      (s, d) => SimilaritySearch.bm25TopK(docs(s, d), "doc_id", "text",
        toks :+ "customer", k = k).orderBy(col("bm25").desc, col("doc_id")))
  }

  private def chunkGen(r: Random): Generated = {
    val cs = pick(r, Vector(8, 16, 32, 64))
    val ov = pick(r, Vector(0, cs / 4, cs / 2, cs - 1))
    Generated("chunk", s"chunkSize=$cs overlap=$ov",
      (s, d) => TextAnalysis.chunkDocuments(docs(s, d), "text", "doc_id",
        chunkSize = cs, overlap = ov).orderBy("doc_id", "chunk_idx"),
      OracleSql.chunkDocumentsSql(cs, ov),
      (s, d) => TextAnalysis.chunkDocuments(docs(s, d), "text", "doc_id",
        chunkSize = cs * 2, overlap = ov).orderBy("doc_id", "chunk_idx"))
  }

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def queryVec(s: SparkSession, dir: String): Array[Float] =
    embs(s, dir).filter(col("vec_id") === 0L)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray

  private def ivfGen(r: Random): Generated = {
    val k = pick(r, Vector(5, 10, 20))
    val nCells = pick(r, Vector(8, 16, 32))
    val nProbe = pick(r, Vector(1, 2, 4, 8, nCells).filter(_ <= nCells))
    Generated("ivf", s"k=$k nCells=$nCells nProbe=$nProbe",
      (s, d) => SimilaritySearch.ivfTopK(embs(s, d), "vec_id", "embedding",
        queryVec(s, d), k = k, nCells = nCells, nProbe = nProbe),
      OracleSql.ivfTopKSql(k, nCells, nProbe),
      (s, d) => SimilaritySearch.ivfTopK(embs(s, d), "vec_id", "embedding",
        queryVec(s, d), k = math.max(1, k - 3), nCells = nCells, nProbe = nProbe))
  }

  // ----------------------------------------------- r18: the DESTRUCTIVE
  // and composite families — operators that EXCISE or reassign user
  // data, where a parameter-dependent bug silently loses corpus. Each
  // replays through the parameterized oracles generalizing the fixed
  // q86/q89/q80/q132/q85/q81/q112–q114 battery rows.

  private def spanrmGen(r: Random): Generated = {
    val k = pick(r, Vector(4, 6, 8, 12))
    val mc = pick(r, Vector(2, 3))
    // mutation halves k rather than k+1: the fixture's duplicated spans
    // are LONG runs, so adjacent k values cover the same token set —
    // k/2 crosses into a different gram population (measured: removal
    // totals 2697 vs 25965 at k 6 vs 3 on sf0.001)
    Generated("spanrm", s"k=$k minCount=$mc",
      (s, d) => Dedup.removeDuplicatedSpans(docs(s, d), "doc_id", "text",
        k = k, minCount = mc).orderBy("doc_id"),
      OracleSql.removeDuplicatedSpansSql(k, mc, keepFirst = false),
      (s, d) => Dedup.removeDuplicatedSpans(docs(s, d), "doc_id", "text",
        k = math.max(2, k / 2), minCount = mc).orderBy("doc_id"))
  }

  private def spankeepGen(r: Random): Generated = {
    val k = pick(r, Vector(4, 6, 8, 12))
    val mc = pick(r, Vector(2, 3))
    Generated("spankeep", s"k=$k minCount=$mc",
      (s, d) => Dedup.removeDuplicatedSpansKeepFirst(docs(s, d), "doc_id", "text",
        k = k, minCount = mc).orderBy("doc_id"),
      OracleSql.removeDuplicatedSpansSql(k, mc, keepFirst = true),
      (s, d) => Dedup.removeDuplicatedSpansKeepFirst(docs(s, d), "doc_id", "text",
        k = math.max(2, k / 2), minCount = mc).orderBy("doc_id"))
  }

  private def neardupGen(r: Random): Generated = {
    val (nh, bands) = pick(r, Vector((16, 4), (16, 8), (32, 8), (32, 16)))
    val w = pick(r, Vector(2, 3, 4))
    val cap = pick(r, Vector(50, 500))
    val th = pick(r, Vector(0.3, 0.5, 0.7))
    def run(thr: Double): Q = (s, d) =>
      Dedup.removeNearDups(docs(s, d), "doc_id",
          Dedup.minHashCandidates(docs(s, d), "doc_id", "text", numHashes = nh,
              bands = bands, shingleWidth = w, maxBucketSize = cap)
            .filter(col("est_jaccard") >= thr).select("id_a", "id_b"))
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    // mutation DISABLES removal (threshold above est_jaccard's range):
    // the planted near-dups sit at est ~1.0 at any shingle width, so a
    // +-0.2 threshold nudge lands in the same bimodal gap — the strong
    // differential is "removal on vs off", which fires whenever the
    // base parameters removed anything at all
    Generated("neardup", s"numHashes=$nh bands=$bands w=$w cap=$cap th=$th",
      run(th),
      OracleSql.minhashRemoveNearDupsSql(nh, bands, w, cap, th),
      run(2.0))
  }

  private val splitSpaces: Vector[Seq[(String, Double)]] = Vector(
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
    Seq("train" -> 0.7, "test" -> 0.3),
    Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25),
    Seq("train" -> 0.9, "holdout" -> 0.1))

  private def splitGen(r: Random): Generated = {
    val splits = pick(r, splitSpaces)
    val th = pick(r, Vector(0.5, 0.7, 0.8))
    val (nh, bands) = pick(r, Vector((16, 4), (32, 8)))
    val salt = "s" + r.nextInt(1000)
    def run(slt: String): Q = (s, d) =>
      Dedup.leakageSafeSplit(docs(s, d), "doc_id", "text", splits = splits,
          salt = slt, threshold = th, numHashes = nh, bands = bands)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster")).as("n_clusters"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy("split")
    Generated("split",
      s"splits=${splits.map { case (n, f) => s"$n:$f" }.mkString(",")} th=$th numHashes=$nh bands=$bands salt=$salt",
      run(salt),
      OracleSql.leakageSafeSplitSql(nh, bands, w = 3, maxBucketSize = 500,
        threshold = th, salt = salt, splits = splits),
      run(salt + "x"))
  }

  private def packGen(r: Random): Generated = {
    val budget = pick(r, Vector(64L, 128L, 256L, 512L))
    val nb = pick(r, Vector(4, 8))
    val salt = "p" + r.nextInt(100)
    def run(b: Long): Q = (s, d) => {
      val base = docs(s, d).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      TextAnalysis.packSequences(base, "doc_id", "n_tokens",
          tokensPerSequence = b, salt = salt, numBuckets = nb)
        .select("doc_id", "n_tokens", "pack_bucket", "seq_idx")
        .orderBy("doc_id")
    }
    Generated("pack", s"budget=$budget numBuckets=$nb salt=$salt",
      run(budget),
      OracleSql.packSequencesSql(budget, salt, nb),
      run(math.max(budget / 2, 32L)))
  }

  private def shardGen(r: Random): Generated = {
    val budget = pick(r, Vector(64L, 128L, 256L, 512L))
    val nb = pick(r, Vector(4, 8))
    val salt = "h" + r.nextInt(100)
    def run(b: Long): Q = (s, d) =>
      TextAnalysis.shardByTokenBudget(docs(s, d), "doc_id", "text",
          tokensPerShard = b, salt = salt, numBuckets = nb)
        .select("doc_id", "shard_bucket", "shard_idx", "n_tokens")
        .orderBy("doc_id")
    Generated("shard", s"budget=$budget numBuckets=$nb salt=$salt",
      run(budget),
      OracleSql.shardByTokenBudgetSql(budget, salt, nb),
      run(math.max(budget / 2, 32L)))
  }

  private def events(s: SparkSession, dir: String): DataFrame =
    Queries.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))

  private def asofGen(r: Random): Generated = {
    val dir = pick(r, Vector("backward", "forward", "nearest"))
    val tol = pick(r, Vector(None, Some(60000000L), Some(3600000000L),
      Some(86400000000L)))
    def run(dirn: String, tolm: Option[Long]): Q = (s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsofJoin.asof(clicks, errors, Seq("user_id"), "ts", "ts",
          prefix = "err_", direction = dirn, toleranceMicros = tolm)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          col("err_value"))
        .orderBy("event_id")
    }
    // mutation drops the tolerance when one is set (every
    // tolerance-nulled match comes back — fires unless the tolerance
    // never bound), else flips the direction
    val mutated = tol match {
      case Some(_) => run(dir, None)
      case None => run(Map("backward" -> "forward", "forward" -> "nearest",
        "nearest" -> "backward")(dir), None)
    }
    Generated("asof", s"direction=$dir tolMicros=${tol.getOrElse(-1L)}",
      run(dir, tol),
      OracleSql.asofClicksErrorsSql(dir, tol),
      mutated)
  }

  private def kmeansGen(r: Random): Generated = {
    val k = pick(r, Vector(4, 8))
    val iters = pick(r, Vector(1, 2))
    Generated("kmeans", s"k=$k iters=$iters",
      (s, d) => SimilaritySearch.kMeansAssign(embs(s, d), "vec_id", "embedding",
        k = k, iters = iters)
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy("vec_id"),
      OracleSql.kMeansAssignSql(k, iters),
      (s, d) => SimilaritySearch.kMeansAssign(embs(s, d), "vec_id", "embedding",
        k = k + 1, iters = iters)
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy("vec_id"))
  }

  // ----------------------------------------------- r18 round 3: the
  // EVENT-ANALYTICS families — funnels, journeys, resampling, anomaly
  // scoring, gap filling — swept over their real parameter spaces
  // against the parameterized replays generalizing the fixed
  // q94/q98/q120/q121/q125/q127/q128 oracles.

  /** Every event_type value present in the synthetic events table at
    * every SF (verified: click/error/purchase/signup/view, each with
    * hundreds of rows at sf0.001). */
  private val eventTypes = Vector("click", "error", "purchase", "signup", "view")

  private def funnelGen(r: Random): Generated = {
    val n = 2 + r.nextInt(3)
    val steps = r.shuffle(eventTypes).take(n)
    val within = pick(r, Vector(Option.empty[Long], Some(3600L), Some(14400L),
      Some(86400L)))
    def run(w: Option[Long]): Q = (s, d) => (w match {
      case Some(secs) => EventAnalytics.funnelWithin(events(s, d), "user_id",
        "ts", "event_id", "event_type", steps, withinSeconds = secs)
      case None => EventAnalytics.funnel(events(s, d), "user_id", "ts",
        "event_id", "event_type", steps)
    }).orderBy("step_idx")
    // mutation TOGGLES the deadline (drop it when set; clamp to 60 s
    // when open) — the strong differential: any chain the tolerance
    // bound (or would bind) moves a later step's user count
    Generated("funnel", s"steps=${steps.mkString(">")} within=${within.getOrElse(-1L)}",
      run(within),
      OracleSql.funnelSql(steps, within),
      run(within match { case Some(_) => None; case None => Some(60L) }))
  }

  private def pathsGen(r: Random): Generated = {
    val pathLen = pick(r, Vector(2, 3, 4, 6, 8))
    val k = pick(r, Vector(5, 10, 20))
    def run(pl: Int): Q = (s, d) =>
      EventAnalytics.topPaths(events(s, d), "user_id", "ts", "event_id",
        "event_type", pathLen = pl, k = k)
    Generated("paths", s"pathLen=$pathLen k=$k",
      run(pathLen),
      OracleSql.topPathsSql(pathLen, k),
      run(pathLen + 1))
  }

  private def transitionsGen(r: Random): Generated = {
    val n = 2 + r.nextInt(3)
    val types = r.shuffle(eventTypes).take(n).sorted
    def run(ts: Seq[String]): Q = (s, d) =>
      EventAnalytics.transitions(
          events(s, d).filter(col("event_type").isin(ts: _*)),
          "user_id", "ts", "event_id", "event_type")
        .orderBy("from_type", "to_type")
    // mutation reshapes the alphabet: dropping (or adding) a type
    // changes which events are ADJACENT, not just which rows appear
    val mutTypes = if (types.size > 2) types.init
      else types :+ eventTypes.find(!types.contains(_)).get
    Generated("transitions", s"types=${types.mkString("+")}",
      run(types),
      OracleSql.transitionsSql(types),
      run(mutTypes))
  }

  private def ohlcGen(r: Random): Generated = {
    val bucket = pick(r, Vector("minute", "hour", "day", "week"))
    val mod = pick(r, Vector(1, 2, 3))
    val rem = if (mod == 1) 0 else r.nextInt(mod)
    def run(b: String): Q = (s, d) =>
      EventAnalytics.downsampleOhlc(
          events(s, d).filter(col("user_id") % mod === rem),
          "ts", "event_id", "event_type", "value", bucket = b)
        .orderBy("bucket", "event_type")
    val coarser = Map("minute" -> "hour", "hour" -> "day",
      "day" -> "week", "week" -> "day")
    Generated("ohlc", s"bucket=$bucket mod=$mod rem=$rem",
      run(bucket),
      OracleSql.ohlcSql(bucket, mod, rem),
      run(coarser(bucket)))
  }

  private def anomaliesGen(r: Random): Generated = {
    val bucket = pick(r, Vector("hour", "day"))
    // a day-bucketed series only has a few dozen buckets per type at
    // test scale — a 24-bucket baseline would withhold everything
    val trailing = if (bucket == "day") pick(r, Vector(3, 6))
      else pick(r, Vector(6, 12, 24))
    val z = pick(r, Vector(1.5, 2.0, 2.5, 3.0))
    def run(zt: Double): Q = (s, d) =>
      EventAnalytics.anomalies(events(s, d), "ts", "event_type",
          bucket = bucket, trailing = trailing, zThreshold = zt)
        .orderBy("event_type", "bucket")
    Generated("anomalies", s"bucket=$bucket trailing=$trailing z=$z",
      run(z),
      OracleSql.anomaliesSql(bucket, trailing, z),
      run(0.5))
  }

  private def gapfillGen(r: Random): Generated = {
    val mod = pick(r, Vector(17, 37, 53))
    val unit = pick(r, Vector("hour", "day"))
    val stepUs = (if (unit == "hour") 3600L else 86400L) * 1000000L
    def run(m: Int): Q = (s, d) => {
      val sparse = events(s, d).filter(col("event_id") % m === 0)
        .groupBy(col("event_type"), date_trunc(unit, col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      EventAnalytics.fillGaps(sparse, "event_type", "bucket", "n",
          stepUs = stepUs)
        .orderBy("event_type", "bucket")
    }
    // mutation re-samples the sparse series (different modulus →
    // different holes → different fills), grid unit unchanged
    val mutMod = Map(17 -> 37, 37 -> 53, 53 -> 17)
    Generated("gapfill", s"mod=$mod unit=$unit",
      run(mod),
      OracleSql.gapFillSql(mod, unit),
      run(mutMod(mod)))
  }

  private val families: Vector[Random => Generated] = Vector(
    jaccardGen, containmentGen, minhashGen, winnowGen,
    simhashGen, bm25Gen, chunkGen, ivfGen, kmeansGen,
    spanrmGen, spankeepGen, neardupGen, splitGen, packGen, shardGen, asofGen,
    funnelGen, pathsGen, transitionsGen, ohlcGen, anomaliesGen, gapfillGen)

  /** splitmix64 finalizer — java.util.Random's 48-bit LCG seeds so
    * weakly that SEQUENTIAL seeds give near-identical first draws
    * through the power-of-two nextInt path (top bits of one LCG step);
    * a power-of-two family grammar drawn that way would map seeds
    * 1–200 onto a couple of families (observed at 16). Scrambling the
    * seed through a full-avalanche mixer first restores per-seed
    * diversity (measured on the 22-family grammar: 3–17 per family
    * over seeds 1–200, every family hit). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic: same seed, same (operator call, SQL) pair. */
  def generate(seed: Long): Generated = {
    val r = new Random(mix64(seed))
    families(r.nextInt(families.size))(r)
  }

  /** Battery seeds — twenty-two rows, one per family (asserted by
    * OpFuzzSpec), each both NON-EMPTY and MUTATION-SENSITIVE at
    * sf0.001 (scanned for, not hoped for — so the sensitivity gate's
    * floor has no structural escapes). Re-picked when the family
    * vector grew to 22 (the family draw is mod families.size over the
    * mixed seed, so growing the vector remaps every seed —
    * content-neutral: the gate re-derives operator call and oracle
    * together per seed). */
  private[graft] val batterySeeds: Vector[(String, Long)] = Vector(
    ("q208_opfuzz_jaccard", 26L),
    ("q209_opfuzz_containment", 7L),
    ("q210_opfuzz_minhash", 36L),
    ("q211_opfuzz_winnow", 19L),
    ("q212_opfuzz_simhash", 10L),
    ("q213_opfuzz_bm25", 59L),
    ("q214_opfuzz_chunk", 14L),
    ("q215_opfuzz_ivf", 3L),
    ("q216_opfuzz_kmeans", 58L),
    ("q217_opfuzz_spanrm", 23L),
    ("q218_opfuzz_spankeep", 49L),
    ("q219_opfuzz_neardup", 13L),
    ("q220_opfuzz_split", 2L),
    ("q221_opfuzz_pack", 35L),
    ("q222_opfuzz_shard", 9L),
    ("q223_opfuzz_asof", 6L),
    ("q224_opfuzz_funnel", 1L),
    ("q225_opfuzz_paths", 18L),
    ("q226_opfuzz_transitions", 22L),
    ("q227_opfuzz_ohlc", 11L),
    ("q228_opfuzz_anomalies", 17L),
    ("q229_opfuzz_gapfill", 54L))

  private[graft] def expectedFamily(name: String): String =
    name.substring("q2NN_opfuzz_".length)

  val queries: Map[String, Q] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).query
  }: _*)

  val oracles: Map[String, String] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).sql
  }: _*)
}
