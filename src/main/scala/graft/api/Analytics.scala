package graft.api

import com.fasterxml.jackson.databind.JsonNode
import graft.core.Json
import graft.engine.QueryRejectedException
import graft.operators.{Dedup, EventAnalytics, Expectations, SimilaritySearch, SkewJoin}
import graft.store.{MergeStore, SketchStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

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
      "token-window chunks, one row per chunk (the doc-to-training-sequence step)"),
    "index_build" -> ("kind (minhash|fingerprint|bm25|ivfpq|theta|kll), name, " +
      "table, +kind params — build/refresh a persisted per-tenant index/store " +
      "so repeated probes stop re-scanning the corpus (POST " +
      "/api/data/analytics/index_build; probe with the *_indexed/dedup_new ops)"),
    "dedup_near_indexed" -> ("store, table, id_col, text_col, " +
      "max_bucket_size?, min_jaccard? — near-dup candidates of the table " +
      "AGAINST a persisted minhash store (corpus history is never re-signed)"),
    "dedup_new" -> ("store, table, text_col — rows whose content hash has " +
      "never been seen by the fingerprint store (incremental exact dedup)"),
    "bm25_indexed" -> ("store, query | query_tokens[], k, k1?, b? — BM25 " +
      "top-k against a persisted inverted index (reads only the query " +
      "tokens' postings partitions)"),
    "ann_indexed" -> ("store, id_col, query_vector[], k, n_probe? — ANN " +
      "top-k against a persisted IVF-PQ store (reads only the probed cell " +
      "directories; scores m-byte codes, never float vectors)"),
    "audience_overlap_indexed" -> ("store, segment_col, a, b, parts[]?, " +
      "lg_k? — overlap report off a persisted theta-sketch store (reads a " +
      "few KB of probed sketches, never the events)"),
    "quantiles_indexed" -> ("store, key_cols[], qs[]?, k? — per-key " +
      "quantiles off a persisted KLL sketch store"),
    "dedup_apply" -> ("table, id_col, text_col, threshold?, num_hashes?, " +
      "bands?, shingle_width?, max_bucket_size? — the CLEANED corpus: " +
      "near-dup clusters keep only the lowest-id representative"),
    "split" -> ("table, id_col, text_col, splits[] of {label, fraction}, " +
      "salt?, threshold? — leakage-safe train/val/test assignment: near-dup " +
      "families never straddle a split boundary"),
    "decontaminate" -> ("table, bench_table, id_col, text_col, " +
      "bench_text_col?, width?, min_shared?, bloom? — per-doc benchmark " +
      "contamination verdict (shared distinct n-gram count vs a " +
      "tenant-named benchmark table)"))

  /** Plan one analytics op. `tableOf` resolves a tenant table name to
    * its DataFrame (tenant-scoped), `storeDirOf` resolves a
    * safe-name-validated store name to the tenant's persisted-store
    * namespace ([[graft.store.TableCatalog.storeDir]]), and `spark` is
    * the tenant's child session (needed by the indexed probes, which
    * read a store without touching any table). */
  def plan(spark: SparkSession, tableOf: String => DataFrame,
           storeDirOf: String => String, op: String, body: JsonNode): DataFrame = {
    val p = new Params(op, body)
    // lazy: the indexed probes name a STORE, not a table — demanding
    // `table` up front would reject them before dispatch
    lazy val df = tableOf(p.str("table"))
    /** Resolve + kind-check a persisted store: probing a store that was
      * never built (or was built as a different kind) is a caller
      * error, answered as a 400 naming the fix — never a Spark
      * path-not-found or a scan of mis-shaped parquet. */
    def storePath(expectedKind: String): String = {
      val name = p.str("store")
      val path = storeDirOf(name)
      storeKind(path) match {
        case None => p.bad(s"unknown store: $name (build it with analytics/index_build)")
        case Some(k) if k != expectedKind =>
          p.bad(s"store $name is a $k store; this op needs $expectedKind")
        case _ => path
      }
    }
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
        val vec = queryVector(p)
        val (vecCol, cast) = vectorized(p, df)
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

      // ---- persisted per-tenant index/store probes: build once (over
      // [[planBuild]] / POST analytics/index_build), probe repeatedly
      // without re-scanning (or even re-signing) the corpus — the HTTP
      // spelling of the Scala store operators. The reference gets
      // materialization for free from its raw passthrough (a tenant can
      // CREATE TABLE-materialize anything, data.go:29-56); here the
      // SELECT-only gate means it must be a named surface.
      case "index_build" =>
        // routed by the server through planBuild (builds execute
        // EAGERLY, so they need the job-group guardrails wrapped around
        // execution, not around planning — Server.runBuild)
        throw new IllegalStateException("index_build must go through planBuild")

      case "dedup_near_indexed" =>
        val pairs = Dedup.minhashCandidatesAgainstStore(df, p.str("id_col"),
          p.str("text_col"), storePath("minhash"),
          maxBucketSize = p.optInt("max_bucket_size").getOrElse(500))
        p.optDouble("min_jaccard") match {
          case Some(j) => pairs.filter(col("est_jaccard") >= j)
          case None    => pairs
        }
      case "dedup_new" =>
        Dedup.dedupAgainstStore(df, p.str("text_col"), storePath("fingerprint"))
      case "bm25_indexed" =>
        val tokens = p.optStrList("query_tokens").getOrElse(
          p.str("query").split("\\s+").filter(_.nonEmpty).toSeq)
        if (tokens.isEmpty) p.bad("query must contain at least one token")
        SimilaritySearch.bm25TopKIndexed(spark, storePath("bm25"), tokens,
          k = p.int("k"),
          k1 = p.optDouble("k1").getOrElse(1.25),
          b = p.optDouble("b").getOrElse(0.75))
      case "ann_indexed" =>
        SimilaritySearch.ivfPqTopKIndexed(spark, storePath("ivfpq"),
          p.str("id_col"), queryVector(p), p.int("k"),
          nProbe = p.optInt("n_probe").getOrElse(4))
      case "audience_overlap_indexed" =>
        SketchStore.estimateOverlap(spark, storePath("theta"), p.str("segment_col"),
          p.str("a"), p.str("b"),
          parts = p.optStrList("parts").getOrElse(Nil),
          lgK = p.optInt("lg_k").getOrElse(12))
      case "quantiles_indexed" =>
        val qs = p.optDoubleList("qs").getOrElse(Seq(0.5, 0.9, 0.99))
        MergeStore.readKllQuantiles(spark, storePath("kll"), p.strList("key_cols"),
          qs, k = p.optInt("k").getOrElse(200))

      // ---- curation composites: the pipeline END-PRODUCTS (cleaned
      // corpus, split assignment, contamination verdicts), not just the
      // candidate pairs the building-block ops return.
      case "dedup_apply" =>
        val idCol = p.str("id_col")
        val pairs = Dedup.minHashCandidates(df, idCol, p.str("text_col"),
            numHashes = p.optInt("num_hashes").getOrElse(32),
            bands = p.optInt("bands").getOrElse(8),
            shingleWidth = p.optInt("shingle_width").getOrElse(3),
            maxBucketSize = p.optInt("max_bucket_size").getOrElse(500))
          .filter(col("est_jaccard") >= p.optDouble("threshold").getOrElse(0.8))
          .select("id_a", "id_b")
        Dedup.removeNearDups(df, idCol, pairs)
      case "split" =>
        val splitsNode = p.node("splits")
        if (!splitsNode.isArray || splitsNode.isEmpty)
          p.bad("splits must be a non-empty array of {label, fraction}")
        val splits = splitsNode.elements().asScala.toSeq.map { n =>
          val l = n.get("label"); val f = n.get("fraction")
          if (l == null || !l.isTextual || l.asText.isEmpty || f == null || !f.isNumber)
            p.bad("each split needs a string label and a numeric fraction")
          (l.asText, f.asDouble)
        }
        Dedup.leakageSafeSplit(df, p.str("id_col"), p.str("text_col"), splits,
          salt = p.optStr("salt").getOrElse(""),
          threshold = p.optDouble("threshold").getOrElse(0.8),
          numHashes = p.optInt("num_hashes").getOrElse(32),
          bands = p.optInt("bands").getOrElse(8),
          shingleWidth = p.optInt("shingle_width").getOrElse(3),
          maxBucketSize = p.optInt("max_bucket_size").getOrElse(500))
      case "decontaminate" =>
        val idCol = p.str("id_col"); val tc = p.str("text_col")
        // the gram extractor reads ONE column name off both sides, so a
        // differently-named benchmark text column is aliased into place
        val bench = tableOf(p.str("bench_table"))
          .select(col(s"`${p.optStr("bench_text_col").getOrElse(tc)}`").as(tc))
        val width = p.optInt("width").getOrElse(13)
        val minShared = p.optInt("min_shared").getOrElse(1)
        if (p.optBool("bloom").getOrElse(false))
          Dedup.contaminationReportBloom(df, bench, idCol, tc, width, minShared)
        else
          Dedup.contaminationReport(df, bench, idCol, tc, width, minShared)

      case other =>
        throw new QueryRejectedException(
          s"unknown analytics op: $other (available: ${descriptions.map(_._1).mkString(", ")})")
    }
  }

  /** Thrown when a build for the same store is already in flight —
    * the server answers 409, never interleaved writes. */
  final class ConflictException(msg: String) extends RuntimeException(msg)

  /** Stores with a build currently executing (keyed by resolved store
    * path). Serializes index_build per (tenant, store): two concurrent
    * builds would interleave writes into the same directories and
    * stamp the result as valid. In-process is sufficient — one server
    * JVM owns a data dir (the reference's per-tenant DuckDB file makes
    * the same single-writer assumption). */
  private val building =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  /** Whether a build for the store at `path` is in flight (DELETE
    * /api/stores/{name} refuses to rip a directory out from under a
    * running build). */
  private[graft] def isBuilding(path: String): Boolean = building.contains(path)

  /** Atomically claim the per-store lock for a NON-build purpose —
    * DELETE /api/stores holds it across the drop so a build cannot
    * start mid-delete (and vice versa: a drop racing a planBuild loses
    * to whichever adds first; the loser answers 409). A bare
    * isBuilding() check-then-drop would be a TOCTOU window in which an
    * append-mode build starts writing into the directory the drop is
    * recursively deleting. Returns false if already held. */
  private[api] def tryStoreLock(path: String): Boolean = building.add(path)
  private[api] def releaseStoreLock(path: String): Unit = { building.remove(path); () }

  /** Probe-vs-drop coordination (two-phase, race-free): probes hold a
    * READ COUNT on every store path their plan resolves — from planning
    * through the end of the streamed body, because the parquet scan
    * happens lazily during encoding — and DELETE refuses (409) while
    * readers are present. The interleavings close because each side
    * declares first and checks second: a probe increments its count,
    * THEN checks `dropping`; a drop adds itself to `dropping`, THEN
    * checks the count. Whichever declared second sees the other and
    * backs off, so a drop can never delete parquet files out from
    * under a streaming scan (the pre-r15 behavior was a cut stream).
    * Probes deliberately do NOT respect the build lock: overwrite
    * rebuilds swap atomically and append-mode stores are readable
    * mid-append, so probe-during-build is safe and wanted. */
  private val dropping =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val readCounts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  private[api] def acquireStoreRead(path: String): Unit = {
    readCounts.computeIfAbsent(path,
      _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
    if (dropping.contains(path)) {
      releaseStoreRead(path)
      throw new ConflictException(
        s"store is being dropped; retry after the DELETE completes")
    }
  }
  private[api] def releaseStoreRead(path: String): Unit = {
    val c = readCounts.get(path)
    if (c != null) { c.decrementAndGet(); () }
  }
  private[api] def beginDrop(path: String): Boolean = {
    dropping.add(path)
    val busy = Option(readCounts.get(path)).exists(_.get > 0)
    if (busy) { dropping.remove(path); false } else true
  }
  private[api] def endDrop(path: String): Unit = { dropping.remove(path); () }

  /** A validated, lock-holding index build: `run` executes the store
    * write (eager Spark jobs — the server wraps it in the per-request
    * job group); `release` frees the per-store build lock and MUST be
    * called exactly once, in a finally, whether or not `run` ran. */
  final class Build(val run: () => DataFrame, releaseOnce: () => Unit) {
    private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    def release(): Unit = if (released.compareAndSet(false, true)) releaseOnce()
  }

  /** Plan an index_build: decode + validate NOW (caller-shaped errors
    * — unknown kind, bad mode, kind-pin mismatch, missing table or
    * columns — surface before any Spark job runs, as 400s; a
    * concurrent build of the same store as [[ConflictException]] →
    * 409), return a [[Build]] whose `run` EXECUTES the store write.
    * Unlike every other analytics op, a build is eager Spark work, so
    * the server must run it inside the per-request job group (timeout
    * + disconnect cancellation) rather than in the plan scope — see
    * Server.runBuild.
    *
    * Overwrite builds go into a temp sibling directory and swap in
    * atomically on success (marker written last): a rebuild that fails
    * mid-way — bad params surfacing at runtime, a crash — leaves the
    * previous store intact and probable; a probe can never see a
    * half-written store (no `_kind` marker until complete). */
  def planBuild(spark: SparkSession, tableOf: String => DataFrame,
                storeDirOf: String => String, body: JsonNode): Build = {
    val p = new Params("index_build", body)
    val name = p.str("store")
    val kind = p.str("kind")
    val path = storeDirOf(name)
    // the lock is taken during PLANNING so a concurrent build answers
    // a clean 409 before any header is written; every later validation
    // failure must release it (the catch below)
    if (!building.add(path))
      throw new ConflictException(s"a build for store $name is already in progress")
    try {
    val mode = p.optStr("mode").getOrElse("overwrite").toLowerCase
    if (mode != "overwrite" && mode != "append")
      p.bad(s"mode must be overwrite or append, got $mode")
    // kind is pinned at first build: appending bm25 postings into a
    // minhash store would corrupt both silently (checked under the
    // build lock, so concurrent first-builds cannot race the pin)
    storeKind(path).foreach { k =>
      if (k != kind) p.bad(s"store $name already exists with kind $k " +
        s"(drop it by rebuilding with mode=overwrite and kind=$k, or pick a new name)")
    }
    def appendUnsupported(): Nothing =
      p.bad(s"$kind builds are full refreshes (global stats/centroids " +
        "depend on the whole corpus); use mode=overwrite")
    val df = tableOf(p.str("table"))
    // resolve the named columns NOW: a typo'd column is a caller error
    // (400), not a mid-build runtime fault
    def resolve(cols: String*): Unit =
      df.select(cols.map(c => col(s"`$c`")): _*).schema
    // appendMeta: the store's persisted `meta` row, read during
    // PLANNING for mode=append against an existing store. A parameter
    // mismatch is a caller-shaped error — it must answer a clean 400
    // BEFORE the 200/chunked headers go out, not explode mid-body
    // inside build.run() (the write-side `require`s in Dedup stay as a
    // last-line defence, but the HTTP contract is decided here).
    // Existence is keyed on the `_kind` marker (written last, so a
    // marker implies a complete store with a meta table).
    def appendMeta(): Option[org.apache.spark.sql.Row] =
      if (mode == "append" && storeKind(path).isDefined)
        Some(spark.read.parquet(s"$path/meta").head())
      else None
    // build(target): run the kind's store write into `target`
    val build: String => Unit = kind match {
      case "minhash" =>
        resolve(p.str("id_col"), p.str("text_col"))
        val (nh, bd, sw, np) = (p.optInt("num_hashes").getOrElse(32),
          p.optInt("bands").getOrElse(8), p.optInt("shingle_width").getOrElse(3),
          p.optInt("n_parts").getOrElse(64))
        // caller-shaped bounds, 400 before headers (the write-side
        // requires in Dedup/TextExpressions stay as the last line)
        if (nh < 1 || nh > 512) p.bad(s"num_hashes must be in [1, 512], got $nh")
        if (bd < 1 || nh % bd != 0) p.bad(s"bands must divide num_hashes, got $bd for $nh")
        if (np < 1) p.bad(s"n_parts must be >= 1, got $np")
        appendMeta().foreach { m =>
          if (m.getInt(0) != nh || m.getInt(1) != bd || m.getInt(2) != sw || m.getInt(3) != np)
            p.bad(s"minhash store $name was built with (num_hashes, bands, " +
              s"shingle_width, n_parts) = (${m.getInt(0)}, ${m.getInt(1)}, " +
              s"${m.getInt(2)}, ${m.getInt(3)}); append used ($nh, $bd, $sw, $np)")
        }
        t => Dedup.writeMinhashStore(df, p.str("id_col"), p.str("text_col"), t,
          numHashes = nh, bands = bd, shingleWidth = sw, nParts = np,
          mode = if (mode == "append") "append" else "overwrite")
      case "fingerprint" =>
        resolve(p.str("text_col"))
        val nb = p.optInt("n_buckets").getOrElse(64)
        appendMeta().foreach { m =>
          if (m.getInt(0) != nb)
            p.bad(s"fingerprint store $name has n_buckets=${m.getInt(0)}, append used $nb")
        }
        t => Dedup.writeFingerprintStore(df, p.str("text_col"), t,
          nBuckets = nb,
          mode = if (mode == "append") "append" else "overwrite")
      case "bm25" =>
        if (mode == "append") appendUnsupported()
        resolve(p.str("id_col"), p.str("text_col"))
        t => SimilaritySearch.writeLexicalIndex(df, p.str("id_col"), p.str("text_col"),
          t, nParts = p.optInt("n_parts").getOrElse(64))
      case "ivfpq" =>
        if (mode == "append") appendUnsupported()
        val (vecCol, cast) = vectorized(p, df)
        cast.select(col(s"`${p.str("id_col")}`"), col(s"`$vecCol`")).schema
        t => SimilaritySearch.writeIvfPq(cast, p.str("id_col"), vecCol, t,
          nCells = p.optInt("n_cells").getOrElse(16),
          nCodes = p.optInt("n_codes").getOrElse(256),
          m = p.optInt("m").getOrElse(8))
      case "theta" =>
        // append-friendly by algebra: theta union is idempotent over
        // sketch state, so re-appending a batch can't move estimates
        resolve(p.str("segment_col"), p.str("value_col"))
        t => SketchStore.writeThetaSketches(df, Seq(p.str("segment_col")),
          p.str("value_col"), t,
          partExpr = lit(p.optStr("part").getOrElse("all")),
          lgK = p.optInt("lg_k").getOrElse(12))
      case "kll" =>
        resolve(p.strList("key_cols") :+ p.str("value_col"): _*)
        t => MergeStore.writeKllPart(df, p.strList("key_cols"), p.str("value_col"),
          t, k = p.optInt("k").getOrElse(200))
      case other =>
        p.bad(s"unknown index kind: $other " +
          "(minhash | fingerprint | bm25 | ivfpq | theta | kll)")
    }
    val run: () => DataFrame = () => {
      if (mode == "append") {
        build(path)
        writeStoreKind(path, kind)
      } else {
        val dst = new java.io.File(path)
        dst.getParentFile.mkdirs()
        val tag = java.util.UUID.randomUUID.toString.take(8)
        val tmp = new java.io.File(dst.getParentFile, s".${dst.getName}.build-$tag")
        try {
          build(tmp.getAbsolutePath)
          writeStoreKind(tmp.getAbsolutePath, kind)
          // swap: old aside first, so no failure below this line can
          // leave the tenant with NO store
          val old = new java.io.File(dst.getParentFile, s".${dst.getName}.old-$tag")
          if (dst.exists() && !dst.renameTo(old))
            throw new java.io.IOException(s"could not set aside previous store $name")
          if (!tmp.renameTo(dst)) {
            if (old.exists()) old.renameTo(dst) // restore the previous store
            throw new java.io.IOException(s"could not swap in rebuilt store $name")
          }
          deleteRecursive(old)
        } catch {
          case e: Throwable => deleteRecursive(tmp); throw e
        }
      }
      import spark.implicits._
      Seq((name, kind, mode, "built")).toDF("store", "kind", "mode", "status")
    }
    new Build(run, () => building.remove(path))
    } catch {
      // the ConflictException above is thrown BEFORE this try, so this
      // can only be OUR lock being released on a validation failure
      case e: Throwable => building.remove(path); throw e
    }
  }

  /** Resolve a query vector parameter (non-empty floats). */
  private def queryVector(p: Params): Array[Float] = {
    val vec = p.doubleList("query_vector").map(_.toFloat).toArray
    if (vec.isEmpty) p.bad("query_vector must be non-empty")
    vec
  }

  /** Assemble the vector column an ANN op scores: the insert path's
    * horizontal flattener spreads a JSON array into col_0..col_n scalar
    * columns, so tenants name them via `vec_cols`; bulk-loaded array
    * columns use `vec_col` directly (the vector expressions are
    * array<float> — a no-op cast on floats). */
  private def vectorized(p: Params, df: DataFrame): (String, DataFrame) =
    p.optStrList("vec_cols") match {
      case Some(cols) =>
        if (cols.isEmpty) p.bad("vec_cols must be non-empty")
        ("__vec", df.withColumn("__vec",
          org.apache.spark.sql.functions.array(
            cols.map(c => col(s"`$c`")): _*).cast("array<float>")))
      case None =>
        val vc = p.str("vec_col")
        (vc, df.withColumn(vc, col(s"`$vc`").cast("array<float>")))
    }

  /** The store's pinned kind, from the `_kind` marker [[writeStoreKind]]
    * leaves at the store root (underscore-prefixed, so parquet listings
    * ignore it like a _SUCCESS). None = no store there. Stores live
    * under the catalog root, which is plain-file territory
    * ([[graft.store.TableCatalog]] is File-based throughout). */
  private def storeKind(path: String): Option[String] = {
    val f = new java.io.File(path, "_kind")
    if (f.isFile) Some(java.nio.file.Files.readString(f.toPath).trim) else None
  }

  private def writeStoreKind(path: String, kind: String): Unit = {
    val d = new java.io.File(path)
    d.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(d, "_kind").toPath, kind)
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursive)
    f.delete(); ()
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
    def optDoubleList(k: String): Option[Seq[Double]] =
      Option(body.get(k)).filterNot(_.isNull).map(_ => doubleList(k))
  }

  /** GET /api/analytics body. */
  def listJson: String =
    descriptions.map { case (nm, usage) =>
      s"""{"name":"${Json.escape(nm)}","usage":"${Json.escape(usage)}"}"""
    }.mkString("[", ",", "]")
}
