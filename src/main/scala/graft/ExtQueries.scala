package graft

import graft.operators.{Dedup, SimilaritySearch, TextAnalysis}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Training-data-pipeline extension queries: deduplication (exact,
  * MinHash LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
  * search (brute-force + LSH ANN), text analysis (tokens, quality,
  * language-ID, fingerprints), and multimodal-column plumbing.
  *
  * DuckDB oracles are declared where the op is plain SQL (exact dedup,
  * token/quality metrics); sketch/LSH ops are engine-defined and get the
  * driver's rows-only check.
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = s.read.parquet(s"$d/documents.parquet")
  private def embs(s: SparkSession, d: String) = s.read.parquet(s"$d/embeddings.parquet")

  /** First embedding vector of the corpus — deterministic ANN query. */
  private def queryVec(s: SparkSession, d: String): Array[Float] =
    embs(s, d).filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

  val defs: ListMap[String, (Q, Option[String])] = ListMap(

    // Exact dedup verdict: corpus size vs distinct content hashes.
    "q40_dedup_exact_stats" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes")),
      Some("""SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
             |       count(*) - count(DISTINCT md5(text)) AS n_dupes
             |FROM documents""".stripMargin))),

    // Exact dedup rows: keep the smallest doc_id per content hash.
    "q41_dedup_exact_rows" -> ((
      (s: SparkSession, d: String) =>
        Dedup.exactByHash(docs(s, d), "text", "doc_id")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars FROM (
             |  SELECT doc_id, lang, n_chars,
             |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents) t
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin))),

    // Token counting (whitespace segmentation), grouped by lang.
    "q42_token_count" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d)
          .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
          .groupBy(col("lang"))
          .agg(sum(col("n_tokens")).cast("long").as("total_tokens"),
               count(lit(1)).as("n_docs"),
               max(col("n_tokens")).as("max_tokens"))
          .orderBy("lang"),
      Some("""SELECT lang,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  count(*) AS n_docs, max(n_tokens) AS max_tokens
             |FROM (SELECT lang,
             |        CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |                             x -> len(x) > 0)) AS BIGINT) AS n_tokens
             |      FROM documents) t
             |GROUP BY lang ORDER BY lang""".stripMargin))),

    // Quality scoring: cheap corpus filters (length / punctuation /
    // digit ratios), exact-SQL-checkable.
    "q43_quality_score" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          (regexp_count(col("text"), lit("[0-9]"))
            .cast("double") / length(col("text")).cast("double")).as("digit_ratio"),
          (regexp_count(col("text"), lit("[aeiou]"))
            .cast("double") / length(col("text")).cast("double")).as("vowel_ratio"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
             |  CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             |                       x -> len(x) > 0)) AS BIGINT) AS n_tokens,
             |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
             |    / length(text) AS digit_ratio,
             |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
             |    / length(text) AS vowel_ratio
             |FROM documents ORDER BY doc_id""".stripMargin))),

    // Language-ID heuristic vs the labeled lang column (accuracy table).
    "q44_langid" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d)
          .withColumn("lang_pred", TextAnalysis.langId(col("text")))
          .groupBy(col("lang"), col("lang_pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "lang_pred"),
      None)),

    // Document fingerprints (FNV-1a rolling hash, custom codegen'd
    // Expression) — distribution check.
    "q45_fingerprint" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d)
          .select(TextAnalysis.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("n"), countDistinct(col("fp")).as("n_distinct"),
               min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp")),
      None)),

    // MinHash LSH near-dup candidates (32 hashes, 8 bands).
    "q46_minhash_candidates" -> ((
      (s: SparkSession, d: String) =>
        Dedup.minHashCandidates(docs(s, d), "doc_id", "text")
          .filter(col("est_jaccard") >= 0.5)
          .orderBy("id_a", "id_b"),
      None)),

    // MinHash dedup verdict: rows surviving at jaccard>=0.8.
    "q47_minhash_dedup" -> ((
      (s: SparkSession, d: String) =>
        Dedup.minHashDedup(docs(s, d), "doc_id", "text", threshold = 0.8)
          .agg(count(lit(1)).as("n_kept")),
      None)),

    // SimHash near-dup pairs (hamming <= 3 over 64-bit sketches).
    "q48_simhash_pairs" -> ((
      (s: SparkSession, d: String) =>
        Dedup.simHashPairs(docs(s, d), "doc_id", "text", maxHamming = 3)
          .orderBy("id_a", "id_b"),
      None)),

    // Exact n-gram Jaccard pairs via inverted-index blocking.
    "q49_ngram_jaccard" -> ((
      (s: SparkSession, d: String) =>
        Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text",
          shingleWidth = 3, threshold = 0.3)
          .orderBy("id_a", "id_b"),
      None)),

    // Brute-force cosine top-k (exact ANN baseline; codegen'd cosine +
    // TakeOrderedAndProject).
    "q50_ann_bruteforce" -> ((
      (s: SparkSession, d: String) =>
        SimilaritySearch.bruteForceTopK(embs(s, d), "vec_id", "embedding",
          queryVec(s, d), k = 10),
      None)),

    // LSH ANN (hyperplane buckets, multi-probe).
    "q51_ann_lsh" -> ((
      (s: SparkSession, d: String) =>
        SimilaritySearch.annTopK(embs(s, d), "vec_id", "embedding",
          queryVec(s, d), k = 10),
      None)),

    // k-NN join (bucketed): 3 neighbors for each of the first 20 vectors.
    "q52_knn_join" -> ((
      (s: SparkSession, d: String) =>
        SimilaritySearch.knnJoin(
          embs(s, d).filter(col("vec_id") < 20), embs(s, d),
          "vec_id", "embedding", k = 3)
          .orderBy("query_id", "rank"),
      None)),

    // Embedding-cosine near-duplicate pairs.
    "q53_embedding_dupes" -> ((
      (s: SparkSession, d: String) =>
        SimilaritySearch.embeddingDupPairs(embs(s, d), "vec_id", "embedding",
          threshold = 0.9)
          .agg(count(lit(1)).as("n_pairs")),
      None)),

    // Multimodal pipeline: binary assets -> decode/featurize (stubbed
    // codec, real plan) -> per-kind stats.
    "q54_multimodal_decode" -> ((
      (s: SparkSession, d: String) =>
        Multimodal.decodeAndFeaturize(Multimodal.assetsFromDocuments(docs(s, d)))
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n"),
               max(col("width")).cast("long").as("max_w"),
               max(col("n_frames")).cast("long").as("max_frames"))
          .orderBy("kind"),
      None)),

    // Multimodal frame sampling: plan-side binary chunk explode.
    "q55_multimodal_frames" -> ((
      (s: SparkSession, d: String) =>
        Multimodal.sampleFrames(Multimodal.assetsFromDocuments(docs(s, d)))
          .groupBy(col("asset_id"))
          .agg(count(lit(1)).as("n_frames"),
               sum(length(col("frame_bytes"))).cast("long").as("bytes_sampled"))
          .orderBy("asset_id"),
      None))
  )

  def queries: Map[String, Q] = defs.map { case (k, (q, _)) => k -> q }
  def oracles: Map[String, String] = defs.collect { case (k, (_, Some(o))) => k -> o }
}
