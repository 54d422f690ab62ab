package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.engine.QueryExecutor
import graft.store.{IngestService, MetaStore, Spool, SpoolConfig, TableCatalog}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Full login flow over HTTP against an in-process fake OAuth provider
  * (the FakeS3 pattern): /login redirect -> provider -> /oauth/callback
  * code exchange + userinfo -> JWT cookie -> gated dashboard pages. */
class DashboardSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()

  private var base: String = _
  private var server: Server = _
  private var port: Int = 0
  private var meta: MetaStore = _
  private var provider: HttpServer = _
  private var providerPort: Int = 0
  @volatile private var tokenRequests = Vector.empty[String]
  private val client = HttpClient.newHttpClient() // never follows redirects

  private def startProvider(): Unit = {
    provider = HttpServer.create(new InetSocketAddress(0), 0)
    provider.createContext("/token", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      tokenRequests :+= form
      val ok = form.contains("grant_type=authorization_code") &&
        form.contains("code=good-code") && form.contains("client_id=cid") &&
        form.contains("client_secret=csec")
      val body = if (ok) """{"access_token":"tok-123","token_type":"Bearer"}"""
                 else """{"error":"invalid_grant"}"""
      val b = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(if (ok) 200 else 400, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    provider.createContext("/userinfo", (ex: HttpExchange) => {
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val ok = auth == "Bearer tok-123"
      val body = if (ok) """{"sub":"g-1","email":"alice@example.com"}""" else "{}"
      val b = body.getBytes(UTF_8)
      ex.sendResponseHeaders(if (ok) 200 else 401, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    provider.start()
    providerPort = provider.getAddress.getPort
  }

  override def beforeAll(): Unit = {
    base = Files.createTempDirectory("graft-dash").toString
    startProvider()
    val catalog = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, catalog)
    val spool = new Spool(s"$base/spool", SpoolConfig(maxRows = 1, rotatePeriodMillis = 100),
      f => ingest.ingestFile(f.getParentFile.getParentFile.getName, f.getParentFile.getName, f))
    val executor = new QueryExecutor(spark, catalog)
    meta = new MetaStore(base, Set(1L))
    val oauth = new OAuthClient(OAuthConfig(
      clientId = "cid", clientSecret = "csec",
      redirectUri = "http://localhost/oauth/callback",
      authUrl = s"http://localhost:$providerPort/auth",
      tokenUrl = s"http://localhost:$providerPort/token",
      userinfoUrl = s"http://localhost:$providerPort/userinfo"))
    server = new Server(ServerConfig(0, Map("key1" -> "1"), None, s"$base/unhealthy"),
      catalog, ingest, spool, executor, meta,
      dashboardConfig = Some(DashboardConfig(oauth, "jwt-test-secret".getBytes(UTF_8))))
    port = server.start()
  }

  override def afterAll(): Unit = {
    server.stop(); provider.stop(0)
  }

  private def get(path: String, headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def stateFrom(location: String): String =
    location.split("[?&]").collectFirst { case s if s.startsWith("state=") => s.stripPrefix("state=") }.get

  private def login(): (String, String) = { // (state, Location)
    val r = get("/login")
    assert(r.statusCode() == 307)
    val loc = r.headers().firstValue("Location").get
    assert(loc.startsWith(s"http://localhost:$providerPort/auth?"))
    assert(loc.contains("client_id=cid") && loc.contains("response_type=code"))
    (stateFrom(loc), loc)
  }

  test("full code flow: login redirect -> callback -> JWT cookie -> gated pages render") {
    val (state, _) = login()
    val cb = get(s"/oauth/callback?code=good-code&state=$state")
    assert(cb.statusCode() == 303)
    assert(cb.headers().firstValue("Location").get == "/dashboard")
    val cookie = cb.headers().firstValue("Set-Cookie").get
    assert(cookie.startsWith("jwt=") && cookie.contains("HttpOnly"))
    val jwt = cookie.split(";")(0)

    for (p <- Seq("/dashboard", "/dashboard/connections", "/dashboard/connections/new", "/dashboard/keys")) {
      val page = get(p, "Cookie" -> jwt)
      assert(page.statusCode() == 200, s"$p -> ${page.statusCode()}")
      assert(page.body().contains("alice@example.com"), s"$p missing user email")
    }
    // the user was first-or-created in the metastore
    val u = meta.getUser(1L).get
    assert(u.email == "alice@example.com" && u.authType == "google")
    // token exchange really hit the provider with the full form
    assert(tokenRequests.exists(f => f.contains("code=good-code") &&
      f.contains("redirect_uri=http%3A%2F%2Flocalhost%2Foauth%2Fcallback")))
  }

  test("returning user keeps their id (FirstOrCreate semantics)") {
    val before = meta.getUser(1L).get
    val (state, _) = login()
    val cb = get(s"/oauth/callback?code=good-code&state=$state")
    assert(cb.statusCode() == 303)
    assert(meta.getUser(1L).get.id == before.id)
    assert(meta.getUser(2L).isEmpty, "duplicate user row created for a returning email")
  }

  test("unauthenticated, tampered, and expired sessions all redirect to /login") {
    for (req <- Seq(get("/dashboard"),
                    get("/dashboard", "Cookie" -> "jwt=aaa.bbb.ccc"),
                    get("/dashboard/keys", "Cookie" -> "jwt="))) {
      assert(req.statusCode() == 307)
      assert(req.headers().firstValue("Location").get == "/login")
    }
    // valid-shape but expired token
    val dead = Jwt.encodeSession(1L, "jwt-test-secret".getBytes(UTF_8), ttlSeconds = -1)
    val r = get("/dashboard", "Cookie" -> s"jwt=$dead")
    assert(r.statusCode() == 307 && r.headers().firstValue("Location").get == "/login")
    // token signed with the WRONG secret but a real user id
    val forged = Jwt.encodeSession(1L, "attacker".getBytes(UTF_8), ttlSeconds = 3600)
    val f = get("/dashboard", "Cookie" -> s"jwt=$forged")
    assert(f.statusCode() == 307 && f.headers().firstValue("Location").get == "/login")
  }

  test("state is verified and one-time-use; bad code fails closed (stricter than reference)") {
    // unknown state: callback never calls the provider
    val n0 = tokenRequests.size
    val r1 = get("/oauth/callback?code=good-code&state=not-a-state")
    assert(r1.statusCode() == 307 && r1.headers().firstValue("Location").get == "/login")
    assert(tokenRequests.size == n0, "provider was called with an unverified state")
    // replayed state: the first use consumed it
    val (state, _) = login()
    assert(get(s"/oauth/callback?code=good-code&state=$state").statusCode() == 303)
    val replay = get(s"/oauth/callback?code=good-code&state=$state")
    assert(replay.statusCode() == 307 && replay.headers().firstValue("Location").get == "/login")
    // bad code: provider 400s, we land on /login with no cookie
    val (state2, _) = login()
    val bad = get(s"/oauth/callback?code=evil&state=$state2")
    assert(bad.statusCode() == 307 && bad.headers().firstValue("Location").get == "/login")
    assert(bad.headers().firstValue("Set-Cookie").isEmpty)
  }

  test("logout clears the cookie") {
    val r = get("/logout")
    assert(r.statusCode() == 303 && r.headers().firstValue("Location").get == "/login")
    val c = r.headers().firstValue("Set-Cookie").get
    assert(c.startsWith("jwt=;") && c.contains("Max-Age=0"))
  }

  test("session cookie is HttpOnly + SameSite=Lax + Max-Age; Secure tracks the redirect scheme") {
    val (state, _) = login()
    val cb = get(s"/oauth/callback?code=good-code&state=$state")
    val c = cb.headers().firstValue("Set-Cookie").get
    assert(c.contains("HttpOnly") && c.contains("SameSite=Lax") && c.contains("Path=/"))
    assert(c.contains(s"Max-Age=${7 * 24 * 3600}"))
    // this spec's redirect URI is http:// — plain-HTTP dev must still
    // be able to set the cookie, so Secure is absent here
    assert(!c.contains("Secure"))
    val httpsClient = new OAuthClient(OAuthConfig("cid", "csec", "https://host/oauth/callback"))
    assert(httpsClient.redirectsToHttps)
  }

  test("users survive a metastore reload (persistence round trip)") {
    val reloaded = new MetaStore(base, Set(1L))
    val u = reloaded.getUser(1L).get
    assert(u.email == "alice@example.com" && u.authType == "google")
    assert(u.authDetails.contains("\"sub\":\"g-1\""))
  }

  private def post(path: String, body: String, headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/x-www-form-urlencoded")
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("dashboard POST forms carry a CSRF token; forged POSTs are rejected before any state change") {
    val (state, _) = login()
    val cb = get(s"/oauth/callback?code=good-code&state=$state")
    val jwtCookie = cb.headers().firstValue("Set-Cookie").get.split(";")(0)
    // the rendered form embeds the session's token
    val page = get("/dashboard/connections/new", "Cookie" -> jwtCookie)
    val csrf = """name="csrf" value="([^"]+)"""".r
      .findFirstMatchIn(page.body()).map(_.group(1))
      .getOrElse(fail("new-connection form has no csrf field"))
    val nBefore = meta.listDestinations.size
    // forged: cookie rides along (the CSRF scenario) but the attacker
    // cannot read the token — wrong/missing token must 403 untouched
    for (bad <- Seq("type=spark&name=evil",
                    "type=spark&name=evil&csrf=wrong",
                    s"type=spark&name=evil&csrf=${csrf.dropRight(2)}xx")) {
      val r = post("/dashboard/connections", bad, "Cookie" -> jwtCookie)
      assert(r.statusCode() == 403, s"forged POST got ${r.statusCode()}")
    }
    assert(meta.listDestinations.size == nBefore, "forged POST mutated state")
    // no session at all -> login redirect, still no mutation
    val anon = post("/dashboard/connections", s"type=spark&name=evil&csrf=$csrf")
    assert(anon.statusCode() == 307 &&
      anon.headers().firstValue("Location").get == "/login")
    assert(meta.listDestinations.size == nBefore)
    // the legitimate form submission works
    val ok = post("/dashboard/connections", s"type=spark&name=from-form&csrf=$csrf",
      "Cookie" -> jwtCookie)
    assert(ok.statusCode() == 303 &&
      ok.headers().firstValue("Location").get == "/dashboard/connections")
    val dest = meta.listDestinations.find(_.name == "from-form")
      .getOrElse(fail("form POST did not create the destination"))
    // key minting: same token gate, key shown once in the response
    val mint = post("/dashboard/keys", s"destination_id=${dest.id}&csrf=$csrf",
      "Cookie" -> jwtCookie)
    assert(mint.statusCode() == 200 && mint.body().contains("shown once"))
    assert(post("/dashboard/keys", s"destination_id=${dest.id}&csrf=nope",
      "Cookie" -> jwtCookie).statusCode() == 403)
    // the form enforces the API route's gate: well-formed id (a tenant
    // DIR name downstream — traversal strings rejected), and only
    // created destinations (static env tenants never mint via browser)
    assert(post("/dashboard/keys", s"destination_id=..%2Fetc&csrf=$csrf",
      "Cookie" -> jwtCookie).statusCode() == 400)
    assert(post("/dashboard/keys", s"destination_id=999&csrf=$csrf",
      "Cookie" -> jwtCookie).statusCode() == 404)
    // malformed %-escapes are client error (dropped pair -> csrf 403),
    // never a 500
    assert(post("/dashboard/connections", "type=spark&name=%zz&csrf=bad%",
      "Cookie" -> jwtCookie).statusCode() == 403)
    // a DIFFERENT session's token does not validate against this cookie
    val otherCsrf = Jwt.csrfToken("some-other-session-jwt", "jwt-test-secret".getBytes(UTF_8))
    assert(post("/dashboard/connections", s"type=spark&name=x&csrf=$otherCsrf",
      "Cookie" -> jwtCookie).statusCode() == 403)
  }
}
