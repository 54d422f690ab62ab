package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.Json
import graft.engine.{QueryExecutor, ResultEncoders}
import graft.store.{IngestService, Spool, TableCatalog}
import java.io.OutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID
import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

/** Static auth config: plaintext API keys map to a database id; an
  * optional admin key selects the tenant via `destination_id`
  * (reference semantics: /root/reference/pkg/api/auth.go:23-53 — keys
  * are stored and compared as SHA-256 hashes). */
final case class ServerConfig(
    port: Int = 8080,
    apiKeys: Map[String, String] = Map("local" -> "1"),
    adminKey: Option[String] = None)

/** HTTP surface of the engine — the reference's chi router rebuilt on the
  * JDK's HttpServer (routes: /root/reference/pkg/api/router.go:52-66).
  *
  *   GET  /healthcheck
  *   POST /api/data/insert/{table}?flatten=vertical     (auth)
  *   GET|POST /api/data/query[?format=csv]              (auth)
  *   GET  /api/tables                                   (auth)
  *   GET  /api/tables/{table}/columns                   (auth)
  *   POST /api/data/query/share {query, duration}       (auth)
  *   GET  /share/{uuid}/data.{format}                   (public)
  */
final class Server(config: ServerConfig, catalog: TableCatalog,
                   ingest: IngestService, spool: Spool, executor: QueryExecutor) {

  private val hashedKeys: Map[String, String] = config.apiKeys.map { case (k, v) => sha256(k) -> v }
  private val hashedAdmin: Option[String] = config.adminKey.map(sha256)
  // uuid -> (databaseId, query, expiresAtMillis); reference stores these in
  // its metadata DB with an expiry (gorm.go:93-129)
  private val shares = TrieMap.empty[String, (String, String, Long)]

  private val server = HttpServer.create(new InetSocketAddress(config.port), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  def start(): Int = {
    server.createContext("/", (ex: HttpExchange) => route(ex))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def params(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8"))
        case Array(k)    => Some(URLDecoder.decode(k, "UTF-8") -> "")
        case _           => None
      }
    }.toMap
  }

  /** Resolve the tenant database id, or None -> 401 (auth.go:23-53). */
  private def authDb(p: Map[String, String], ex: HttpExchange): Option[String] = {
    val key = p.getOrElse("api_key",
      Option(ex.getRequestHeaders.getFirst("X-API-KEY")).getOrElse(""))
    val hashed = sha256(key)
    if (hashedAdmin.contains(hashed)) Some(p.getOrElse("destination_id", "-1"))
    else hashedKeys.get(hashed)
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "text/plain"): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def route(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      val segs = path.split("/").filter(_.nonEmpty).toList
      val p = params(ex)
      (ex.getRequestMethod, segs) match {
        case ("GET", List("healthcheck")) => respond(ex, 200, "ok")
        case (_, "api" :: rest)           => withAuth(ex, p)(db => apiRoute(ex, p, db, rest))
        case ("GET", List("share", uuid, data)) if data.startsWith("data.") =>
          shareData(ex, uuid, data.stripPrefix("data."))
        case _ => respond(ex, 404, "not found")
      }
    } catch {
      case NonFatal(e) => try respond(ex, 500, Option(e.getMessage).getOrElse("error")) catch { case NonFatal(_) => () }
    }

  private def withAuth(ex: HttpExchange, p: Map[String, String])(f: String => Unit): Unit =
    authDb(p, ex) match {
      case Some(db) => f(db)
      case None     => respond(ex, 401, "Unauthorized")
    }

  private def apiRoute(ex: HttpExchange, p: Map[String, String], db: String,
                       rest: List[String]): Unit =
    (ex.getRequestMethod, rest) match {
      case ("POST", List("data", "insert", table)) =>
        val res = ingest.acceptBody(spool, db, table, readBody(ex), p.getOrElse("flatten", ""))
        respond(ex, res.status, res.message)

      case (m, List("data", "query")) if m == "GET" || m == "POST" =>
        val q = if (m == "POST") readBody(ex) else p.getOrElse("query", "")
        if (q.trim.isEmpty) respond(ex, 400, "Query cannot be blank")
        else runQuery(ex, db, q, p.getOrElse("format", ""))

      case ("POST", List("data", "query", "share")) =>
        Json.parse(readBody(ex)) match {
          case Some(n) if n.hasNonNull("query") && n.get("query").asText.nonEmpty =>
            val duration = if (n.has("duration")) n.get("duration").asLong else 60L
            val id = UUID.randomUUID().toString
            shares.put(id, (db, n.get("query").asText, System.currentTimeMillis() + duration * 1000))
            respond(ex, 200, s"""{"id":"$id"}""", "application/json")
          case Some(_) => respond(ex, 400, "Query cannot be empty")
          case None    => respond(ex, 400, "Invalid request body")
        }

      case ("GET", List("tables")) =>
        val names = catalog.listTables(db).map(t => "\"" + Json.escape(t) + "\"")
        respond(ex, 200, names.mkString("[", ",", "]"), "application/json")

      case ("GET", List("tables", table, "columns")) =>
        val cols = catalog.listColumns(db, table).map { case (n, t) =>
          s"""{"name":"${Json.escape(n)}","type":"${Json.escape(t)}"}"""
        }
        respond(ex, 200, cols.mkString("[", ",", "]"), "application/json")

      case ("GET", List("destinations")) =>
        val ids = config.apiKeys.values.toSeq.distinct.sorted.map(d => s""""$d"""")
        respond(ex, 200, ids.mkString("[", ",", "]"), "application/json")

      case _ => respond(ex, 404, "not found")
    }

  /** Stream a query result; 500 with the error only when nothing has been
    * written yet (reference data.go:53-55 — errors after streaming began
    * are lost). */
  private def runQuery(ex: HttpExchange, db: String, query: String, format: String): Unit =
    try {
      val df = executor.execute(db, query)
      val isCsv = format.equalsIgnoreCase("csv")
      ex.getResponseHeaders.set("Content-Type", if (isCsv) "text/csv" else "application/json")
      ex.sendResponseHeaders(200, 0) // chunked
      val out: OutputStream = ex.getResponseBody
      if (isCsv) ResultEncoders.writeCsv(df, out) else ResultEncoders.writeJson(df, out)
      out.close()
      ex.close()
    } catch {
      case NonFatal(e) =>
        try respond(ex, 500, Option(e.getMessage).getOrElse("query failed"))
        catch { case NonFatal(_) => ex.close() }
    }

  private def shareData(ex: HttpExchange, uuid: String, format: String): Unit =
    shares.get(uuid) match {
      case Some((db, q, exp)) if exp > System.currentTimeMillis() =>
        runQuery(ex, db, q, format)
      case _ => respond(ex, 404, "Query not found")
    }
}
