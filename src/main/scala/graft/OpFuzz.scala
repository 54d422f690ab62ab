package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimilaritySearch, TextAnalysis}
import scala.collection.immutable.ListMap
import scala.util.Random

/** Operator-PARAMETER fuzzer: the relational fuzzer's seed-386 catch
  * proved a wide seeded sweep samples holes a fixed battery can't — this
  * aims the same weapon at the custom operator surface, where the
  * engine's own code (and therefore its bug mass) actually lives. Each
  * seed draws a family (exact-overlap dedup, MinHash LSH, winnowing,
  * SimHash, BM25, chunking, IVF ANN, k-means) and a random point in that operator's REAL
  * parameter space (shingle width, thresholds, minShared, DF caps, hash
  * counts, band counts, bucket caps, chunk size/overlap, query-token
  * sets, k), then emits the paired artifacts: the operator call and the
  * DuckDB SQL that replays it at those exact parameters (the
  * parameterized generators in [[OracleSql]]).
  *
  * Verification levels, mirroring [[FuzzQueries]]:
  *  1. [[OpFuzzSpec]]: in-process invariants + parameter-mutation
  *     sensitivity (a changed parameter must change the output for a
  *     floor of seeds — the differential is not vacuous) + determinism.
  *  2. Nine FIXED seeds join the battery as q208–q216 (one per
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

  private val families: Vector[Random => Generated] = Vector(
    jaccardGen, containmentGen, minhashGen, winnowGen,
    simhashGen, bm25Gen, chunkGen, ivfGen, kmeansGen)

  /** Deterministic: same seed, same (operator call, SQL) pair. */
  def generate(seed: Long): Generated = {
    val r = new Random(seed)
    families(r.nextInt(families.size))(r)
  }

  /** Battery seeds — nine rows, one per family (asserted by
    * OpFuzzSpec), each non-empty at sf0.001. Re-picked when the
    * family vector grew to 9 (the family draw is mod families.size,
    * so growing the vector remaps every seed — content-neutral: the
    * gate re-derives operator call and oracle together per seed). */
  private[graft] val batterySeeds: Vector[(String, Long)] = Vector(
    ("q208_opfuzz_jaccard", 10L),
    ("q209_opfuzz_containment", 8L),
    ("q210_opfuzz_minhash", 14L),
    ("q211_opfuzz_winnow", 12L),
    ("q212_opfuzz_simhash", 2L),
    ("q213_opfuzz_bm25", 3L),
    ("q214_opfuzz_chunk", 1L),
    ("q215_opfuzz_ivf", 6L),
    ("q216_opfuzz_kmeans", 4L))

  private[graft] def expectedFamily(name: String): String =
    name.substring("q2NN_opfuzz_".length)

  val queries: Map[String, Q] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).query
  }: _*)

  val oracles: Map[String, String] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).sql
  }: _*)
}
