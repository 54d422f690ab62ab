package graft.api

import com.fasterxml.jackson.databind.JsonNode
import graft.core.Json
import graft.engine.QueryRejectedException
import graft.operators.{Dedup, EventAnalytics, Expectations, SimilaritySearch, SkewJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import scala.jdk.CollectionConverters._

/** The operator library behind the tenant HTTP surface.
  *
  * The reference exposes its destination's ENTIRE capability through
  * the raw query endpoint (/root/reference/pkg/api/data.go:29-56 —
  * verbatim passthrough to the per-tenant database); this engine's
  * scalar functions already ride the SQL endpoint the same way
  * (GraftFunctions), but the table-shaped operator compositions
  * (funnel, retention, dedup, BM25 retrieval, expectations, hot-key
  * reports) have no SQL spelling. `POST /api/data/analytics/{op}`
  * closes that gap: a JSON parameter object names the tenant's table
  * and columns, the server plans the SAME operator the Scala API runs
  * (one code path — these are thin parameter decoders, not parallel
  * implementations), and the result streams back through the standard
  * JSON/CSV encoders.
  *
  * Isolation: tables resolve through QueryExecutor.tenantTable — the
  * tenant's own catalog views only, same rule as the SQL endpoint, and
  * the request thread carries the tenant's FAIR pool tag. Bad
  * parameters surface as [[QueryRejectedException]] → 400, never a
  * Spark stack trace.
  */
object Analytics {

  /** (param summary, required keys) per op — served by GET
    * /api/analytics so the surface is discoverable, mirroring
    * /api/functions for scalars. */
  val descriptions: Seq[(String, String)] = Seq(
    "funnel" -> ("table, user_col, ts_col, tie_col, type_col, steps[]" +
      ", within_seconds? — ordered (optionally time-boxed) conversion funnel"),
    "retention" -> "table, user_col, ts_col — weekly cohort retention matrix",
    "dedup_exact" -> ("table, id_col, text_col — exact content dedup; keeps " +
      "the lowest-id row per identical text"),
    "dedup_near" -> ("table, id_col, text_col, num_hashes?, bands?, " +
      "shingle_width?, max_bucket_size?, min_jaccard? — MinHash LSH near-duplicate " +
      "candidate pairs with estimated Jaccard"),
    "bm25" -> ("table, id_col, text_col, query | query_tokens[], k, k1?, b? — " +
      "BM25 top-k lexical retrieval"),
    "expectations" -> ("table, rules[] of {type: not_null|in_range|matches|" +
      "unique|foreign_key, ...} — data-quality checks, one row per rule"),
    "hot_keys" -> ("table, keys[], k? — top-k hottest key values with share " +
      "and skew ratio (pre-join skew diagnosis)"),
    "ann" -> ("table, id_col, vec_col | vec_cols[], query_vector[], k, mode? " +
      "(exact|lsh) — top-k nearest vectors by cosine (exact scan, or LSH-pruned); " +
      "vec_cols assembles a vector from flattened scalar columns (JSON-array " +
      "inserts land as col_0, col_1, ... via the horizontal flattener)"),
    "top_paths" -> ("table, user_col, ts_col, tie_col, type_col, path_len, k — " +
      "most common first-N event journeys (path_len column flags truncation)"),
    "transitions" -> ("table, user_col, ts_col, tie_col, type_col — first-order " +
      "event transition matrix (from_type, to_type, n_transitions)"),
    "ohlc" -> ("table, ts_col, tie_col, key_col, value_col, bucket — open/high/" +
      "low/close downsampling per time bucket and key"),
    "anomalies" -> ("table, ts_col, key_col, bucket, trailing?, z_threshold? — " +
      "per-key volume anomalies vs a trailing-window baseline (z-score)"),
    "growth_accounting" -> ("table, user_col, ts_col — weekly new/retained/" +
      "resurrected/churned user ledger"),
    "audience_overlap" -> ("table, user_col, segment_col, a, b, lg_k? — " +
      "|A|, |B|, |A∩B|, |A\\B|, |A∪B| of two segments' distinct users via theta " +
      "sketches (exact below 2^lg_k distinct per segment)"),
    "text_quality" -> ("table, text_col, strip_html?, readability? — per-doc " +
      "quality annotation: token/char stats, punct/digit/stopword ratios, " +
      "language id, fingerprint; optional HTML stripping first and Flesch " +
      "readability columns"),
    "sample" -> ("table, id_col, fraction, salt? — deterministic " +
      "partition-invariant hash sample: same rows on every run/cluster for a " +
      "given (salt, id); different salts are independent"),
    "chunk" -> ("table, id_col, text_col, chunk_size, overlap? — overlapped " +
      "token-window chunks, one row per chunk (the doc-to-training-sequence step)"))

  def plan(tableOf: String => DataFrame, op: String, body: JsonNode): DataFrame = {
    val p = new Params(op, body)
    val df = tableOf(p.str("table"))
    // tenant tables are JSON-ingested, and JSON has no timestamp type —
    // time-based operators get the ts column cast up front (a no-op on
    // real timestamps; malformed strings fail loudly under ANSI)
    def withTs(base: DataFrame): DataFrame = {
      val ts = p.str("ts_col")
      base.withColumn(ts, col(s"`$ts`").cast("timestamp"))
    }
    op match {
      case "funnel" =>
        val steps = p.strList("steps")
        if (steps.size < 2) p.bad("steps needs at least 2 entries")
        p.optLong("within_seconds") match {
          case Some(w) =>
            if (w <= 0) p.bad("within_seconds must be positive")
            EventAnalytics.funnelWithin(withTs(df), p.str("user_col"), p.str("ts_col"),
              p.str("tie_col"), p.str("type_col"), steps, w)
          case None =>
            EventAnalytics.funnel(withTs(df), p.str("user_col"), p.str("ts_col"),
              p.str("tie_col"), p.str("type_col"), steps)
        }
      case "retention" =>
        EventAnalytics.retentionCohorts(withTs(df), p.str("user_col"), p.str("ts_col"))
      case "dedup_exact" =>
        Dedup.exactByHash(df, p.str("text_col"), p.str("id_col"))
      case "dedup_near" =>
        val pairs = Dedup.minHashCandidates(df, p.str("id_col"), p.str("text_col"),
          numHashes = p.optInt("num_hashes").getOrElse(32),
          bands = p.optInt("bands").getOrElse(8),
          shingleWidth = p.optInt("shingle_width").getOrElse(3),
          maxBucketSize = p.optInt("max_bucket_size").getOrElse(500))
        p.optDouble("min_jaccard") match {
          case Some(j) => pairs.filter(col("est_jaccard") >= j)
          case None    => pairs
        }
      case "bm25" =>
        val tokens = p.optStrList("query_tokens").getOrElse(
          p.str("query").split("\\s+").filter(_.nonEmpty).toSeq)
        if (tokens.isEmpty) p.bad("query must contain at least one token")
        SimilaritySearch.bm25TopK(df, p.str("id_col"), p.str("text_col"),
          tokens, k = p.int("k"),
          k1 = p.optDouble("k1").getOrElse(1.25),
          b = p.optDouble("b").getOrElse(0.75))
      case "expectations" =>
        val rulesNode = p.node("rules")
        if (!rulesNode.isArray || rulesNode.isEmpty) p.bad("rules must be a non-empty array")
        val rules = rulesNode.elements().asScala.toSeq.map(rule(p, _, tableOf))
        Expectations.check(df, rules)
      case "hot_keys" =>
        SkewJoin.hotKeys(df, p.strList("keys"), p.optInt("k").getOrElse(20))
      case "ann" =>
        val vec = p.doubleList("query_vector").map(_.toFloat).toArray
        if (vec.isEmpty) p.bad("query_vector must be non-empty")
        // the insert path's horizontal flattener spreads a JSON array
        // into col_0..col_n scalar columns, so tenants name them via
        // vec_cols; bulk-loaded array columns use vec_col directly (the
        // vector expressions are array<float> — a no-op cast on floats)
        val (vecCol, cast) = p.optStrList("vec_cols") match {
          case Some(cols) =>
            if (cols.isEmpty) p.bad("vec_cols must be non-empty")
            ("__vec", df.withColumn("__vec",
              org.apache.spark.sql.functions.array(
                cols.map(c => col(s"`$c`")): _*).cast("array<float>")))
          case None =>
            val vc = p.str("vec_col")
            (vc, df.withColumn(vc, col(s"`$vc`").cast("array<float>")))
        }
        p.optStr("mode").getOrElse("exact") match {
          case "exact" =>
            SimilaritySearch.bruteForceTopK(cast, p.str("id_col"), vecCol, vec, p.int("k"))
          case "lsh" =>
            SimilaritySearch.annTopK(cast, p.str("id_col"), vecCol, vec, p.int("k"))
          case other => p.bad(s"unknown mode: $other (exact | lsh)")
        }
      case "sample" =>
        import graft.operators.TextAnalysis
        val f = p.optDouble("fraction").getOrElse(p.bad("missing required parameter 'fraction'"))
        if (f < 0 || f > 1) p.bad("fraction must be in [0, 1]")
        df.filter(TextAnalysis.hashSampleCond(
          col(s"`${p.str("id_col")}`"), f, p.optStr("salt").getOrElse("")))
      case "chunk" =>
        import graft.operators.TextAnalysis
        TextAnalysis.chunkDocuments(df, p.str("text_col"), p.str("id_col"),
          p.int("chunk_size"), p.optInt("overlap").getOrElse(0))
      case "text_quality" =>
        import graft.operators.TextAnalysis
        val tc = p.str("text_col")
        val base =
          if (p.optBool("strip_html").getOrElse(false))
            df.withColumn(tc, TextAnalysis.stripHtml(col(s"`$tc`")))
          else df
        val annotated = TextAnalysis.annotate(base, tc)
        if (p.optBool("readability").getOrElse(true))
          TextAnalysis.readability(annotated, tc)
        else annotated
      case "top_paths" =>
        EventAnalytics.topPaths(withTs(df), p.str("user_col"), p.str("ts_col"),
          p.str("tie_col"), p.str("type_col"), p.int("path_len"), p.int("k"))
      case "transitions" =>
        EventAnalytics.transitions(withTs(df), p.str("user_col"), p.str("ts_col"),
          p.str("tie_col"), p.str("type_col"))
      case "ohlc" =>
        EventAnalytics.downsampleOhlc(withTs(df), p.str("ts_col"), p.str("tie_col"),
          p.str("key_col"), p.str("value_col"), p.str("bucket"))
      case "anomalies" =>
        EventAnalytics.anomalies(withTs(df), p.str("ts_col"), p.str("key_col"),
          p.str("bucket"), p.optInt("trailing").getOrElse(24),
          p.optDouble("z_threshold").getOrElse(3.0))
      case "growth_accounting" =>
        EventAnalytics.growthAccounting(withTs(df), p.str("user_col"), p.str("ts_col"))
      case "audience_overlap" =>
        import graft.functions.{AggFunctions, ThetaEstimate, ThetaSetEstimate}
        val (user, seg) = (p.str("user_col"), p.str("segment_col"))
        val lgK = p.optInt("lg_k").getOrElse(12)
        def sketchOf(v: String, as: String) =
          df.filter(col(s"`$seg`") === v)
            .agg(AggFunctions.theta_sketch(col(s"`$user`"), lgK).as(as))
        sketchOf(p.str("a"), "sa").crossJoin(sketchOf(p.str("b"), "sb")).select(
          ThetaEstimate.theta_estimate(col("sa")).as("n_a"),
          ThetaEstimate.theta_estimate(col("sb")).as("n_b"),
          ThetaSetEstimate.theta_intersect(col("sa"), col("sb")).as("n_both"),
          ThetaSetEstimate.theta_a_not_b(col("sa"), col("sb")).as("n_a_only"),
          ThetaSetEstimate.theta_union_est(col("sa"), col("sb")).as("n_union"))
      case other =>
        throw new QueryRejectedException(
          s"unknown analytics op: $other (available: ${descriptions.map(_._1).mkString(", ")})")
    }
  }

  /** One expectations rule from its JSON spec. `Satisfies` (a free
    * expression) is deliberately NOT exposed: an expression string can
    * smuggle a scalar subquery past the table-visibility rule, so the
    * HTTP surface sticks to the closed rule forms. */
  private def rule(p: Params, n: JsonNode,
                   tableOf: String => DataFrame): Expectations.Rule = {
    def field(k: String): String = {
      val v = n.get(k)
      if (v == null || !v.isTextual || v.asText.isEmpty)
        p.bad(s"rule ${n.toString.take(80)}: missing string field '$k'")
      v.asText
    }
    field("type") match {
      case "not_null" => Expectations.NotNull(field("col"))
      case "in_range" =>
        val (lo, hi) = (n.get("lo"), n.get("hi"))
        if (lo == null || hi == null || !lo.isNumber || !hi.isNumber)
          p.bad("in_range needs numeric lo and hi")
        Expectations.InRange(field("col"), lo.asDouble, hi.asDouble)
      case "matches" => Expectations.Matches(field("col"), field("regex"))
      case "unique" =>
        val cols = Option(n.get("cols")).filter(_.isArray)
          .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty)
        if (cols.isEmpty) p.bad("unique needs a non-empty cols array")
        Expectations.Unique(cols)
      case "foreign_key" =>
        Expectations.ForeignKey(field("col"), tableOf(field("dim_table")), field("dim_col"))
      case other => p.bad(s"unknown rule type: $other")
    }
  }

  /** Parameter decoding with 400-shaped errors naming the op + key. */
  private final class Params(op: String, body: JsonNode) {
    def bad(msg: String): Nothing =
      throw new QueryRejectedException(s"analytics/$op: $msg")
    def node(k: String): JsonNode = {
      val v = body.get(k)
      if (v == null || v.isNull) bad(s"missing required parameter '$k'")
      v
    }
    def str(k: String): String = {
      val v = node(k)
      if (!v.isTextual || v.asText.isEmpty) bad(s"'$k' must be a non-empty string")
      v.asText
    }
    def int(k: String): Int = {
      val v = node(k)
      if (!v.canConvertToInt) bad(s"'$k' must be an integer")
      v.asInt
    }
    def strList(k: String): Seq[String] = {
      val v = node(k)
      if (!v.isArray) bad(s"'$k' must be an array of strings")
      val out = v.elements().asScala.toSeq
      if (out.exists(e => !e.isTextual)) bad(s"'$k' must be an array of strings")
      out.map(_.asText)
    }
    def optStrList(k: String): Option[Seq[String]] =
      Option(body.get(k)).filterNot(_.isNull).map(_ => strList(k))
    def optStr(k: String): Option[String] =
      Option(body.get(k)).filterNot(_.isNull).map(_ => str(k))
    def optBool(k: String): Option[Boolean] =
      Option(body.get(k)).filterNot(_.isNull).map { v =>
        if (!v.isBoolean) bad(s"'$k' must be a boolean"); v.asBoolean
      }
    def doubleList(k: String): Seq[Double] = {
      val v = node(k)
      if (!v.isArray) bad(s"'$k' must be an array of numbers")
      val out = v.elements().asScala.toSeq
      if (out.exists(e => !e.isNumber)) bad(s"'$k' must be an array of numbers")
      out.map(_.asDouble)
    }
    def optInt(k: String): Option[Int] =
      Option(body.get(k)).filterNot(_.isNull).map(_ => int(k))
    def optLong(k: String): Option[Long] =
      Option(body.get(k)).filterNot(_.isNull).map { v =>
        if (!v.canConvertToLong) bad(s"'$k' must be an integer"); v.asLong
      }
    def optDouble(k: String): Option[Double] =
      Option(body.get(k)).filterNot(_.isNull).map { v =>
        if (!v.isNumber) bad(s"'$k' must be a number"); v.asDouble
      }
  }

  /** GET /api/analytics body. */
  def listJson: String =
    descriptions.map { case (nm, usage) =>
      s"""{"name":"${Json.escape(nm)}","usage":"${Json.escape(usage)}"}"""
    }.mkString("[", ",", "]")
}
