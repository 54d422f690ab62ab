package graft.api

import com.sun.net.httpserver.HttpExchange
import graft.store.{MetaStore, TtlCache, User}
import java.util.UUID

/** Dashboard session settings: the OAuth provider client plus the JWT
  * cookie parameters (reference: 7-day expiry, HttpOnly `jwt` cookie —
  * `/root/reference/pkg/api/auth.go:155-165`). */
final case class DashboardConfig(
    oauth: OAuthClient,
    jwtSecret: Array[Byte],
    sessionTtlSeconds: Long = 7 * 24 * 3600)

/** The reference's login + dashboard surface
  * (`/root/reference/pkg/api/auth.go:60-166`, `pkg/view/router.go`):
  *
  *   GET /login                      -> 307 to the provider's consent URL
  *   GET /oauth/callback?code&state  -> code->token->userinfo, first-or-
  *                                      create the user, set the JWT
  *                                      cookie, 303 /dashboard
  *   GET /logout                     -> clear cookie, 303 /login
  *   GET /dashboard                  \
  *   GET /dashboard/connections      |  HTML pages, JWT-cookie-gated;
  *   GET /dashboard/connections/new  |  any auth defect 307s to /login
  *   GET /dashboard/keys             /
  *
  * Two deliberate deviations, both STRICTER than the reference: the
  * OAuth `state` is actually verified (one-time-use, 5-minute TTL —
  * the reference mints a state but never checks it, leaving the
  * callback CSRF-able), and JWT verification rejects non-HS256
  * headers outright (see [[Jwt]]). Pages are server-rendered strings
  * over live MetaStore data — goview templates replaced by the
  * engine-side equivalent, not a translation. */
final class Dashboard(cfg: DashboardConfig, meta: MetaStore,
                      respond: (HttpExchange, Int, String, String) => Unit) {

  // Pending one-time OAuth states. An unauthenticated client can mint
  // states by hitting /login, and LRU eviction here denies service to
  // honest in-flight logins — so the bound is sized for flood headroom,
  // not typical load: 2^17 36-char keys ≈ 10 MB worst case, forcing an
  // attacker to sustain ~440 req/s for the whole 5-minute TTL window to
  // evict anyone. Residual flood risk belongs to a rate limiter in
  // front (the reference has this exposure too — it never verifies
  // state at all, so state verification here is strictly additive).
  private val states = new TtlCache(5 * 60 * 1000L, 1 << 17, 16 << 20)

  private def redirect(ex: HttpExchange, code: Int, location: String): Unit = {
    ex.getResponseHeaders.set("Location", location)
    respond(ex, code, "", "text/plain")
  }

  def login(ex: HttpExchange): Unit = {
    val state = UUID.randomUUID().toString
    states.set(state, Array[Byte](1))
    redirect(ex, 307, cfg.oauth.authCodeUrl(state))
  }

  def logout(ex: HttpExchange): Unit = {
    ex.getResponseHeaders.add("Set-Cookie", "jwt=; HttpOnly; Path=/; Max-Age=0")
    redirect(ex, 303, "/login")
  }

  /** The callback leg: state must be a live one we minted (consumed on
    * first use), then code -> token -> userinfo -> first-or-create ->
    * session cookie. Every failure lands back on /login. */
  def callback(ex: HttpExchange, p: Map[String, String]): Unit = {
    val ok = for {
      state <- p.get("state")
      _ <- states.remove(state) // atomic one-time consume
      code <- p.get("code")
      token <- cfg.oauth.exchange(code)
      info <- cfg.oauth.fetchUserinfo(token)
      node <- graft.core.Json.parse(info)
      email = node.path("email").asText("")
      if email.nonEmpty
    } yield meta.createUser(email, "google", info)
    ok match {
      case Some(user) =>
        val jwt = Jwt.encodeSession(user.id, cfg.jwtSecret, cfg.sessionTtlSeconds)
        // SameSite=Lax (stricter than the reference's bare cookie):
        // top-level navigations still carry it, cross-site subresource
        // requests don't. Max-Age matches the JWT's exp so the browser
        // keeps the cookie the full session length (a bare cookie dies
        // on browser close, cutting the documented 7 days short).
        // Secure when the deployment is HTTPS — the redirect URI is the
        // one config value that reliably knows (plain-HTTP local dev
        // must still be able to set the cookie).
        val secure = if (cfg.oauth.redirectsToHttps) "; Secure" else ""
        ex.getResponseHeaders.add("Set-Cookie",
          s"jwt=$jwt; HttpOnly; Path=/; SameSite=Lax; Max-Age=${cfg.sessionTtlSeconds}$secure")
        redirect(ex, 303, "/dashboard")
      case None => redirect(ex, 307, "/login")
    }
  }

  /** JWT cookie -> (live user, raw token), or None (expired, tampered,
    * unknown id). The raw token is kept because the CSRF token is
    * derived from it ([[Jwt.csrfToken]]). */
  private def authenticate(ex: HttpExchange): Option[(User, String)] =
    for {
      header <- Option(ex.getRequestHeaders.getFirst("Cookie"))
      jwt <- header.split(";").map(_.trim).collectFirst {
        case c if c.startsWith("jwt=") => c.stripPrefix("jwt=")
      }
      claims <- Jwt.verify(jwt, cfg.jwtSecret)
      id <- Option.when(claims.path("user_id").canConvertToLong)(claims.get("user_id").asLong)
      user <- meta.getUser(id)
    } yield (user, jwt)

  def page(ex: HttpExchange, rest: List[String]): Unit =
    authenticate(ex) match {
      case None => redirect(ex, 307, "/login")
      case Some((user, jwt)) =>
        val csrf = Jwt.csrfToken(jwt, cfg.jwtSecret)
        rest match {
          case Nil                        => render(ex, user, "Overview", overview())
          case List("connections")        => render(ex, user, "Connections", connections())
          case List("connections", "new") => render(ex, user, "New Connection", newConnection(csrf))
          case List("keys")               => render(ex, user, "API Keys", keys(csrf))
          case _                          => respond(ex, 404, "not found", "text/plain")
        }
    }

  /** Dashboard form POSTs. Every mutating form carries the session's
    * CSRF token as a hidden field; a POST whose token fails the
    * constant-time check is rejected with 403 BEFORE any state changes
    * — the SameSite=Lax cookie already stops most cross-site sends,
    * the token stops the rest (e.g. top-level form navigations, which
    * Lax lets through only as GET, but defense in depth is free). */
  def post(ex: HttpExchange, rest: List[String]): Unit =
    authenticate(ex) match {
      case None => redirect(ex, 307, "/login")
      case Some((user, jwt)) =>
        val form = parseForm(new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        if (!form.get("csrf").exists(Jwt.csrfValid(_, jwt, cfg.jwtSecret)))
          respond(ex, 403, "invalid CSRF token", "text/plain")
        else rest match {
          case List("connections") =>
            val dtype = form.getOrElse("type", "spark")
            val name = form.getOrElse("name", "destination")
            meta.createDestination(dtype, name)
            redirect(ex, 303, "/dashboard/connections")
          case List("keys") =>
            form.get("destination_id").filter(_.nonEmpty) match {
              case None => respond(ex, 400, "destination_id required", "text/plain")
              // same gate as the API route (Server POST /destinations/{id}/
              // keys): the id must be well-formed (it becomes a tenant DIR
              // name downstream — an unchecked "../x" is a traversal) and
              // must name a created destination (static env tenants mint
              // via the admin API only, never the browser form)
              case Some(destId) if !Server.SafeName.matches(destId) =>
                respond(ex, 400, "invalid destination id", "text/plain")
              case Some(destId) if !meta.destinationExists(destId) =>
                respond(ex, 404, "no such destination", "text/plain")
              case Some(destId) =>
                val key = meta.addKey(destId)
                // shown once, like the API path: only the hash persists
                render(ex, user, "API Keys",
                  s"""<p>New key for destination <b>${esc(destId)}</b> (copy now — shown once):</p>
                     |<pre>${esc(key)}</pre>
                     |<p><a href="/dashboard/keys">Back</a></p>""".stripMargin)
            }
          case _ => respond(ex, 404, "not found", "text/plain")
        }
    }

  private def parseForm(body: String): Map[String, String] =
    body.split("&").iterator.filter(_.nonEmpty).flatMap { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      // a malformed %-escape is client error: drop the pair (the CSRF
      // check then 403s) rather than letting URLDecoder's
      // IllegalArgumentException surface as a 500
      try Some(java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8"))
      catch { case _: IllegalArgumentException => None }
    }.toMap

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case '\'' => "&#39;"; case c => c.toString
    }

  private def overview(): String = {
    val nDest = meta.listDestinations.size
    s"""<p>Destinations: <b>$nDest</b></p>
       |<p>Insert data with <code>POST /api/data/insert/{table}</code>, query with
       |<code>/api/data/query</code>.</p>""".stripMargin
  }

  private def connections(): String = {
    val rows = meta.listDestinations.map(d =>
      s"<tr><td>${d.id}</td><td>${esc(d.dtype)}</td><td>${esc(d.name)}</td></tr>")
      .mkString("\n")
    s"""<table><tr><th>ID</th><th>Type</th><th>Name</th></tr>
       |$rows</table>
       |<p><a href="/dashboard/connections/new">New connection</a></p>""".stripMargin
  }

  private def newConnection(csrf: String): String =
    s"""<form method="post" action="/dashboard/connections">
       |<input type="hidden" name="csrf" value="${esc(csrf)}">
       |<label>Type <input name="type" value="spark"></label>
       |<label>Name <input name="name"></label>
       |<button type="submit">Create</button>
       |</form>
       |<p>Or via the API:</p>
       |<pre>curl -X POST /api/destinations?api_key=... -d '{"type":"spark","name":"..."}'</pre>""".stripMargin

  private def keys(csrf: String): String =
    s"""<p>Mint a destination-scoped API key (shown once; stored hashed):</p>
       |<form method="post" action="/dashboard/keys">
       |<input type="hidden" name="csrf" value="${esc(csrf)}">
       |<label>Destination ID <input name="destination_id"></label>
       |<button type="submit">Mint key</button>
       |</form>
       |<p>Or via the API:</p>
       |<pre>curl -X POST /api/destinations/{id}/keys?api_key=...</pre>""".stripMargin

  private def render(ex: HttpExchange, user: User, title: String, body: String): Unit = {
    val html =
      s"""<!doctype html><html><head><title>${esc(title)} — graft</title></head>
         |<body>
         |<nav><a href="/dashboard">Overview</a> | <a href="/dashboard/connections">Connections</a>
         | | <a href="/dashboard/keys">Keys</a> | ${esc(user.email)} (<a href="/logout">log out</a>)</nav>
         |<h1>${esc(title)}</h1>
         |$body
         |</body></html>""".stripMargin
    respond(ex, 200, html, "text/html; charset=utf-8")
  }
}
