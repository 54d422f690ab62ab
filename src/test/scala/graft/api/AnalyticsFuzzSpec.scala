package graft.api

import graft.core.Json
import graft.engine.{QueryExecutor, ResultEncoders}
import graft.store.{IngestService, MetaStore, Spool, SpoolConfig, TableCatalog}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.io.ByteArrayOutputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Seeded payload fuzzer for the HTTP analytics decoders
  * (`POST /api/data/analytics/{op}` → [[Analytics.plan]]): ~700 lines
  * of hand-rolled decode/validate deserve the same sweep treatment the
  * operators get from OpFuzz. Each op carries a declarative parameter
  * schema (valid generator + type-confusion generator per key, plus
  * hand-picked boundary payloads), and every seed draws an op and one
  * of four modes:
  *
  *  - VALID: all required keys (optionals coin-flipped) with
  *    in-contract values → must be 200, the body must parse as a JSON
  *    array, and — the cross-path differential — the rows must equal a
  *    DIRECT [[Analytics.plan]] call on the same session rendered
  *    through the same encoder;
  *  - MISSING: one required key dropped → must be a clean 400;
  *  - CONFUSED: one present key's value replaced by a strictly
  *    wrong-typed JSON value → must be a clean 400;
  *  - BOUNDARY: an op-specific out-of-contract value (k = 0, fraction
  *    > 1, bands that don't divide num_hashes, split fractions that
  *    don't sum to 1, kind-mismatched stores...) → 400 or a clean 200,
  *    NEVER a 5xx.
  *
  * The standing contract asserted on every response: status ∈ {200,
  * 400}, no stack trace in the body, 200 bodies parse as JSON arrays —
  * i.e. the 400-before-headers promise in [[Analytics]]' scaladoc,
  * held across the decoder surface rather than at a handful of
  * hand-written shapes. (index_build's decode path has its own
  * lifecycle semantics — 409 conflicts, 413 quotas, eager execution —
  * and is pinned by ServerSpec's store-lifecycle test instead; its
  * probe ops ARE fuzzed here, against stores built once in setup.)
  *
  * First sweep's catch: `bands = 0` reached `numHashes % bands` before
  * this suite existed — ArithmeticException → 500 instead of a clean
  * 400 (fixed in Dedup.bandedOf/minhashStoreBuild, pinned by the
  * dedup_near boundary payloads below).
  */
class AnalyticsFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()

  private val sf = "/root/testdata/sf0.001"
  private var base: String = _
  private var server: Server = _
  private var port: Int = 0
  private var executor: QueryExecutor = _
  private var catalog: TableCatalog = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    base = Files.createTempDirectory("graft-anfuzz").toString
    catalog = new TableCatalog(s"$base/tables")
    // tenant corpus: the three synthetic tables every schema below names
    catalog.append(spark, "1", "docs", spark.read.parquet(s"$sf/documents.parquet"))
    catalog.append(spark, "1", "events", spark.read.parquet(s"$sf/events.parquet"))
    catalog.append(spark, "1", "embeds", spark.read.parquet(s"$sf/embeddings.parquet"))
    executor = new QueryExecutor(spark, catalog)
    server = new Server(
      ServerConfig(0, Map("k" -> "1"), None, s"$base/unhealthy"),
      catalog, new IngestService(spark, catalog),
      new Spool(s"$base/spool", SpoolConfig(), _ => ()), executor,
      new MetaStore(base, Set(1L)))
    port = server.start()
    // persisted stores for the indexed probe ops (one per fuzzed kind)
    def build(body: String): Unit = {
      val r = post("index_build", body)
      assert(r.statusCode() == 200, s"setup build failed: ${r.body().take(300)}")
    }
    build("""{"kind": "minhash", "store": "mh", "table": "docs",
            | "id_col": "doc_id", "text_col": "text", "n_parts": 4}""".stripMargin)
    build("""{"kind": "fingerprint", "store": "fp", "table": "docs",
            | "text_col": "text", "n_buckets": 4}""".stripMargin)
    build("""{"kind": "bm25", "store": "bi", "table": "docs",
            | "id_col": "doc_id", "text_col": "text", "n_parts": 4}""".stripMargin)
  }

  override def afterAll(): Unit = server.stop()

  private def post(op: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(
      s"http://localhost:$port/api/data/analytics/$op?api_key=k"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  // ------------------------------------------------------------------
  // declarative per-op parameter schemas

  /** One parameter: a valid-value generator and a strictly wrong-typed
    * confusion generator (both emit JSON literals). */
  private final case class PP(key: String, required: Boolean,
                              valid: Random => String, confuse: Random => String)
  private final case class OpSchema(op: String, params: Vector[PP],
                                    boundaries: Vector[String])

  private def pick[A](r: Random, xs: Vector[A]): A = xs(r.nextInt(xs.size))
  private def js(s: String): String = "\"" + Json.escape(s) + "\""

  // wrong-typed pools per expected shape: every member must be REJECTED
  // by the Params decoder for that shape (no Jackson coercion path back
  // to validity — integral doubles coerce to ints, so they stay out)
  private def confStr(r: Random) = pick(r, Vector("123", "[\"x\"]", "{\"a\":1}", "\"\""))
  private def confInt(r: Random) = pick(r, Vector("\"abc\"", "true", "[1]", "{}"))
  private def confNum(r: Random) = pick(r, Vector("\"abc\"", "[1]", "{}", "false"))
  private def confStrList(r: Random) = pick(r, Vector("\"x\"", "7", "[1,2]", "{\"a\":1}"))
  private def confNumList(r: Random) = pick(r, Vector("\"x\"", "3", "[\"a\"]", "{}"))
  private def confBool(r: Random) = pick(r, Vector("\"yes\"", "1", "[]", "{}"))

  private def str(key: String, required: Boolean, vals: Vector[String]) =
    PP(key, required, r => js(pick(r, vals)), confStr)
  private def num(key: String, required: Boolean, vals: Vector[String]) =
    PP(key, required, r => pick(r, vals), confNum)
  private def intP(key: String, required: Boolean, vals: Vector[Int]) =
    PP(key, required, r => pick(r, vals).toString, confInt)
  private def boolP(key: String) =
    PP(key, required = false, r => pick(r, Vector("true", "false")), confBool)

  private val eventTypes = Vector("view", "click", "purchase", "error", "signup")
  private def stepsJson(r: Random): String = {
    val n = 2 + r.nextInt(3)
    r.shuffle(eventTypes).take(n).map(js).mkString("[", ",", "]")
  }
  private def vec64(r: Random): String =
    Vector.fill(64)("%.4f".format(r.nextDouble() * 2 - 1)).mkString("[", ",", "]")
  private val vocab = Vector("join", "hash", "row", "batch", "scan", "vector")
  private def queryJson(r: Random): String =
    js(r.shuffle(vocab).take(1 + r.nextInt(3)).mkString(" "))
  private def rulesJson(r: Random): String = {
    val pool = Vector(
      """{"type": "not_null", "col": "doc_id"}""",
      """{"type": "in_range", "col": "n_chars", "lo": 0, "hi": 1000000}""",
      """{"type": "matches", "col": "lang", "regex": "^[a-z]+$"}""",
      """{"type": "unique", "cols": ["doc_id"]}""",
      """{"type": "foreign_key", "col": "doc_id", "dim_table": "docs", "dim_col": "doc_id"}""")
    r.shuffle(pool).take(1 + r.nextInt(3)).mkString("[", ",", "]")
  }
  private def splitsJson(r: Random): String = pick(r, Vector(
    """[{"label": "train", "fraction": 0.8}, {"label": "test", "fraction": 0.2}]""",
    """[{"label": "a", "fraction": 0.5}, {"label": "b", "fraction": 0.25}, {"label": "c", "fraction": 0.25}]""",
    """[{"label": "train", "fraction": 0.9}, {"label": "holdout", "fraction": 0.1}]"""))

  private val docsCols = (str("table", required = true, Vector("docs")),
    str("id_col", required = true, Vector("doc_id")),
    str("text_col", required = true, Vector("text")))
  private def eventCols = Vector(
    str("table", required = true, Vector("events")),
    str("user_col", required = true, Vector("user_id")),
    str("ts_col", required = true, Vector("ts")))
  private def eventTieType = Vector(
    str("tie_col", required = true, Vector("event_id")),
    str("type_col", required = true, Vector("event_type")))

  private val schemas: Vector[OpSchema] = {
    val (dTab, dId, dText) = docsCols
    Vector(
      OpSchema("funnel",
        eventCols ++ eventTieType ++ Vector(
          PP("steps", required = true, stepsJson, confStrList),
          intP("within_seconds", required = false, Vector(60, 3600, 86400))),
        Vector(
          """{"table": "events", "user_col": "user_id", "ts_col": "ts", "tie_col": "event_id", "type_col": "event_type", "steps": ["view"]}""",
          """{"table": "events", "user_col": "user_id", "ts_col": "ts", "tie_col": "event_id", "type_col": "event_type", "steps": ["view", "click"], "within_seconds": 0}""",
          """{"table": "events", "user_col": "user_id", "ts_col": "ts", "tie_col": "event_id", "type_col": "event_type", "steps": ["view", "click"], "within_seconds": -5}""",
          """{"table": "nosuch", "user_col": "user_id", "ts_col": "ts", "tie_col": "event_id", "type_col": "event_type", "steps": ["view", "click"]}""")),
      OpSchema("retention", eventCols, Vector.empty),
      OpSchema("dedup_exact", Vector(dTab, dId, dText), Vector.empty),
      OpSchema("dedup_near",
        Vector(dTab, dId, dText,
          intP("num_hashes", required = false, Vector(16, 32)),
          intP("bands", required = false, Vector(4, 8)),
          intP("shingle_width", required = false, Vector(2, 3)),
          intP("max_bucket_size", required = false, Vector(50, 500)),
          num("min_jaccard", required = false, Vector("0.3", "0.5"))),
        Vector(
          // bands = 0 once raised ArithmeticException -> 500 (the
          // suite's first catch); must stay a clean 400
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "bands": 0}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "num_hashes": 32, "bands": 5}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "bands": -4}""")),
      OpSchema("bm25",
        Vector(dTab, dId, dText,
          PP("query", required = true, queryJson, confStr),
          intP("k", required = true, Vector(1, 5, 20)),
          num("k1", required = false, Vector("1.25", "2.0")),
          num("b", required = false, Vector("0.75", "0.5"))),
        Vector(
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "query": "   ", "k": 5}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "query_tokens": [], "k": 5}""")),
      OpSchema("expectations",
        Vector(dTab, PP("rules", required = true, rulesJson, confStrList)),
        Vector(
          """{"table": "docs", "rules": []}""",
          """{"table": "docs", "rules": [{"type": "frobnicate", "col": "doc_id"}]}""",
          """{"table": "docs", "rules": [{"type": "in_range", "col": "n_chars", "lo": "x", "hi": 9}]}""",
          """{"table": "docs", "rules": [{"type": "unique", "cols": []}]}""")),
      OpSchema("hot_keys",
        Vector(str("table", required = true, Vector("events")),
          PP("keys", required = true,
            r => pick(r, Vector("""["event_type"]""", """["event_type","user_id"]""")),
            confStrList),
          intP("k", required = false, Vector(5, 20))),
        Vector("""{"table": "events", "keys": ["event_type"], "k": 0}""")),
      OpSchema("ann",
        Vector(str("table", required = true, Vector("embeds")),
          str("id_col", required = true, Vector("vec_id")),
          str("vec_col", required = true, Vector("embedding")),
          PP("query_vector", required = true, vec64, confNumList),
          intP("k", required = true, Vector(1, 5, 10)),
          str("mode", required = false, Vector("exact", "lsh"))),
        Vector(
          """{"table": "embeds", "id_col": "vec_id", "vec_col": "embedding", "query_vector": [], "k": 5}""",
          """{"table": "embeds", "id_col": "vec_id", "vec_col": "embedding", "query_vector": [0.1, 0.2], "k": 5, "mode": "zzz"}""")),
      OpSchema("sample",
        Vector(dTab, dId,
          num("fraction", required = true, Vector("0.1", "0.5", "1.0", "0.0")),
          str("salt", required = false, Vector("s1", "s2"))),
        Vector(
          """{"table": "docs", "id_col": "doc_id", "fraction": 1.5}""",
          """{"table": "docs", "id_col": "doc_id", "fraction": -0.1}""")),
      OpSchema("chunk",
        Vector(dTab, dId, dText,
          intP("chunk_size", required = true, Vector(8, 16, 32)),
          intP("overlap", required = false, Vector(0, 2, 4))),
        Vector(
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "chunk_size": 0}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "chunk_size": 8, "overlap": 8}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "chunk_size": 8, "overlap": -1}""")),
      OpSchema("text_quality",
        Vector(dTab, dText, boolP("strip_html"), boolP("readability")),
        Vector.empty),
      OpSchema("top_paths",
        eventCols ++ eventTieType ++ Vector(
          intP("path_len", required = true, Vector(2, 3)),
          intP("k", required = true, Vector(5, 10))),
        Vector(
          """{"table": "events", "user_col": "user_id", "ts_col": "ts", "tie_col": "event_id", "type_col": "event_type", "path_len": 0, "k": 5}""",
          """{"table": "events", "user_col": "user_id", "ts_col": "ts", "tie_col": "event_id", "type_col": "event_type", "path_len": 3, "k": 0}""")),
      OpSchema("transitions", eventCols ++ eventTieType, Vector.empty),
      OpSchema("ohlc",
        Vector(str("table", required = true, Vector("events")),
          str("ts_col", required = true, Vector("ts")),
          str("tie_col", required = true, Vector("event_id")),
          str("key_col", required = true, Vector("event_type")),
          str("value_col", required = true, Vector("value")),
          str("bucket", required = true, Vector("hour", "day", "week"))),
        Vector.empty),
      OpSchema("anomalies",
        Vector(str("table", required = true, Vector("events")),
          str("ts_col", required = true, Vector("ts")),
          str("key_col", required = true, Vector("event_type")),
          str("bucket", required = true, Vector("hour", "day")),
          intP("trailing", required = false, Vector(3, 24)),
          num("z_threshold", required = false, Vector("2.0", "3.0"))),
        Vector(
          """{"table": "events", "ts_col": "ts", "key_col": "event_type", "bucket": "hour", "trailing": 1}""")),
      OpSchema("growth_accounting", eventCols, Vector.empty),
      OpSchema("audience_overlap",
        Vector(str("table", required = true, Vector("events")),
          str("user_col", required = true, Vector("user_id")),
          str("segment_col", required = true, Vector("event_type")),
          str("a", required = true, Vector("view", "purchase")),
          str("b", required = true, Vector("click", "error")),
          intP("lg_k", required = false, Vector(10, 12))),
        Vector.empty),
      OpSchema("dedup_apply",
        Vector(dTab, dId, dText,
          num("threshold", required = false, Vector("0.5", "0.8")),
          intP("num_hashes", required = false, Vector(16, 32)),
          intP("bands", required = false, Vector(4, 8))),
        Vector(
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "bands": 0}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "num_hashes": 32, "bands": 3}""")),
      OpSchema("split",
        Vector(dTab, dId, dText,
          PP("splits", required = true, splitsJson, confStrList),
          str("salt", required = false, Vector("s1", "s2")),
          num("threshold", required = false, Vector("0.5", "0.8"))),
        Vector(
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "splits": []}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "splits": [{"label": "a", "fraction": 0.5}, {"label": "b", "fraction": 0.6}]}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "splits": [{"label": "a", "fraction": 0.5}, {"label": "a", "fraction": 0.5}]}""",
          """{"table": "docs", "id_col": "doc_id", "text_col": "text", "splits": [{"fraction": 1.0}]}""")),
      OpSchema("decontaminate",
        Vector(dTab, dId, dText,
          str("bench_table", required = true, Vector("docs")),
          intP("width", required = false, Vector(5, 13)),
          intP("min_shared", required = false, Vector(1, 2)),
          boolP("bloom")),
        Vector(
          """{"table": "docs", "bench_table": "nosuch", "id_col": "doc_id", "text_col": "text"}""")),
      OpSchema("dedup_near_indexed",
        Vector(str("store", required = true, Vector("mh")), dTab, dId, dText,
          intP("max_bucket_size", required = false, Vector(50, 500)),
          num("min_jaccard", required = false, Vector("0.3", "0.5"))),
        Vector(
          """{"store": "nosuch", "table": "docs", "id_col": "doc_id", "text_col": "text"}""",
          """{"store": "fp", "table": "docs", "id_col": "doc_id", "text_col": "text"}""",
          """{"store": "a/b", "table": "docs", "id_col": "doc_id", "text_col": "text"}""")),
      OpSchema("dedup_new",
        Vector(str("store", required = true, Vector("fp")), dTab, dText),
        Vector(
          """{"store": "mh", "table": "docs", "text_col": "text"}""")),
      OpSchema("bm25_indexed",
        Vector(str("store", required = true, Vector("bi")),
          PP("query", required = true, queryJson, confStr),
          intP("k", required = true, Vector(1, 5, 20))),
        Vector(
          """{"store": "nosuch", "query": "join hash", "k": 5}""",
          """{"store": "bi", "query": "  ", "k": 5}""")))
  }

  // ------------------------------------------------------------------
  // payload builders + the response contract

  private def bodyOf(r: Random, sc: OpSchema, drop: Option[String],
                     confuse: Option[String]): String = {
    val fields = sc.params.flatMap { p =>
      val include = p.required || r.nextBoolean() || confuse.contains(p.key)
      if (!include || drop.contains(p.key)) None
      else Some(js(p.key) + ": " +
        (if (confuse.contains(p.key)) p.confuse(r) else p.valid(r)))
    }
    fields.mkString("{", ", ", "}")
  }

  /** The standing decoder contract, asserted on EVERY fuzzed response. */
  private def contract(op: String, mode: String, body: String,
                       resp: HttpResponse[String]): Unit = {
    val code = resp.statusCode()
    assert(code == 200 || code == 400,
      s"analytics/$op [$mode] answered $code (must be 200/400)\n" +
        s"payload: ${body.take(300)}\nresponse: ${resp.body().take(300)}")
    assert(!resp.body().contains("\n\tat "),
      s"analytics/$op [$mode] leaked a stack trace: ${resp.body().take(300)}")
    if (code == 200)
      assert(Json.parse(resp.body()).exists(_.isArray),
        s"analytics/$op [$mode] 200 body is not a JSON array (truncated " +
          s"stream?): ${resp.body().take(300)}")
    else
      assert(resp.body().nonEmpty, s"analytics/$op [$mode] empty 400 body")
  }

  /** Direct [[Analytics.plan]] call on the same tenant session, rendered
    * through the same JSON encoder — the HTTP path must agree. */
  private def directRows(op: String, body: String): Vector[String] = {
    val node = Json.parse(body).getOrElse(fail(s"unparseable fuzz body: $body"))
    val df = Analytics.plan(executor.tenantSession("1"),
      t => executor.tenantTable("1", t), name => catalog.storeDir("1", name),
      op, node)
    val bos = new ByteArrayOutputStream()
    ResultEncoders.writeJson(df, bos)
    rowsOf(bos.toString("UTF-8"))
  }

  private def rowsOf(json: String): Vector[String] =
    Json.parse(json).getOrElse(fail(s"unparseable JSON result: ${json.take(200)}"))
      .elements().asScala.map(_.toString).toVector.sorted

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("seeded sweep over every op's parameter schema (valid / missing / confused / boundary)") {
    var (nValid, nMissing, nConfused, nBoundary) = (0, 0, 0, 0)
    (1L to 160L).foreach { seed =>
      val r = new Random(mix64(seed))
      val sc = schemas(r.nextInt(schemas.size))
      r.nextInt(4) match {
        case 0 =>
          val body = bodyOf(r, sc, None, None)
          val resp = post(sc.op, body)
          contract(sc.op, s"valid seed=$seed", body, resp)
          assert(resp.statusCode() == 200,
            s"analytics/${sc.op} rejected a valid payload (seed=$seed): " +
              s"${resp.body().take(300)}\npayload: $body")
          assert(rowsOf(resp.body()) == directRows(sc.op, body),
            s"analytics/${sc.op} HTTP rows differ from the direct operator " +
              s"call (seed=$seed)\npayload: $body")
          nValid += 1
        case 1 =>
          val req = sc.params.filter(_.required)
          val dropped = pick(r, req.map(_.key))
          val body = bodyOf(r, sc, Some(dropped), None)
          val resp = post(sc.op, body)
          contract(sc.op, s"missing '$dropped' seed=$seed", body, resp)
          assert(resp.statusCode() == 400,
            s"analytics/${sc.op} accepted a payload missing required " +
              s"'$dropped' (seed=$seed): ${resp.body().take(200)}")
          nMissing += 1
        case 2 =>
          val confused = pick(r, sc.params.map(_.key))
          val body = bodyOf(r, sc, None, Some(confused))
          val resp = post(sc.op, body)
          contract(sc.op, s"confused '$confused' seed=$seed", body, resp)
          assert(resp.statusCode() == 400,
            s"analytics/${sc.op} accepted a wrong-typed '$confused' " +
              s"(seed=$seed): ${resp.body().take(200)}\npayload: $body")
          nConfused += 1
        case _ =>
          if (sc.boundaries.nonEmpty) {
            val body = pick(r, sc.boundaries)
            contract(sc.op, s"boundary seed=$seed", body, post(sc.op, body))
            nBoundary += 1
          }
      }
    }
    // the sweep must actually exercise all four modes substantially
    assert(nValid >= 25 && nMissing >= 25 && nConfused >= 25 && nBoundary >= 15,
      s"lopsided sweep: valid=$nValid missing=$nMissing confused=$nConfused boundary=$nBoundary")
  }

  test("every boundary payload answers a clean 400 or a clean 200 — never a 5xx") {
    schemas.foreach { sc =>
      sc.boundaries.foreach { body =>
        contract(sc.op, "boundary-exhaustive", body, post(sc.op, body))
      }
    }
  }

  test("malformed request bodies are uniform 400s for every op") {
    val garbage = Vector("", "{", "[1,2]", "\"str\"", "null", "42",
      """{"table": }""", "{}" /* object with nothing: decode must 400, not NPE */)
    schemas.foreach { sc =>
      garbage.foreach { body =>
        val resp = post(sc.op, body)
        assert(resp.statusCode() == 400,
          s"analytics/${sc.op} answered ${resp.statusCode()} to malformed " +
            s"body ${body.take(40)}: ${resp.body().take(200)}")
        assert(!resp.body().contains("\n\tat "),
          s"analytics/${sc.op} leaked a stack trace on malformed body")
      }
    }
  }

  test("unknown op is a 400 naming the available surface") {
    val resp = post("frobnicate", """{"table": "docs"}""")
    assert(resp.statusCode() == 400 && resp.body().contains("unknown analytics op"),
      s"${resp.statusCode()}: ${resp.body().take(200)}")
  }
}
