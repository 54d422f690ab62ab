package graft.api

import graft.core.Json
import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** OAuth 2.0 authorization-code provider endpoints. Defaults are
  * Google's published endpoints (the reference's only provider —
  * `golang.org/x/oauth2/google` + the userinfo fetch in
  * `/root/reference/pkg/api/auth.go:121-146`); injectable so tests run
  * the full flow against an in-process fake provider, and so any
  * spec-compliant IdP slots in. */
final case class OAuthConfig(
    clientId: String,
    clientSecret: String,
    redirectUri: String,
    scope: String = "openid email",
    authUrl: String = "https://accounts.google.com/o/oauth2/auth",
    tokenUrl: String = "https://oauth2.googleapis.com/token",
    userinfoUrl: String = "https://openidconnect.googleapis.com/v1/userinfo")

/** The three legs of the code flow (RFC 6749 §4.1):
  * [[authCodeUrl]] builds the user redirect, [[exchange]] trades the
  * callback code for an access token (§4.1.3 form POST), and
  * [[fetchUserinfo]] reads the OpenID userinfo document with the
  * bearer token. Failures are None — the server turns them into a
  * login redirect, exactly like the reference's error paths. */
final class OAuthClient(cfg: OAuthConfig,
                        http: HttpClient = HttpClient.newBuilder()
                          .connectTimeout(Duration.ofSeconds(10)).build()) {

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** Whether the configured callback is HTTPS — the session cookie's
    * Secure flag follows this. */
  def redirectsToHttps: Boolean = cfg.redirectUri.startsWith("https://")

  def authCodeUrl(state: String): String =
    s"${cfg.authUrl}?response_type=code&client_id=${enc(cfg.clientId)}" +
      s"&redirect_uri=${enc(cfg.redirectUri)}&scope=${enc(cfg.scope)}&state=${enc(state)}"

  /** Authorization code -> access token, or None on any HTTP/shape
    * failure. */
  def exchange(code: String): Option[String] = {
    val form = Seq(
      "grant_type" -> "authorization_code", "code" -> code,
      "client_id" -> cfg.clientId, "client_secret" -> cfg.clientSecret,
      "redirect_uri" -> cfg.redirectUri)
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    val req = HttpRequest.newBuilder(URI.create(cfg.tokenUrl))
      .timeout(Duration.ofSeconds(15)) // a stalled IdP must not pin a handler thread
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)).build()
    for {
      resp <- send(req)
      if resp.statusCode() == 200
      node <- Json.parse(resp.body())
      tok = node.path("access_token").asText("")
      if tok.nonEmpty
    } yield tok
  }

  /** Userinfo JSON for a bearer token, or None. */
  def fetchUserinfo(accessToken: String): Option[String] = {
    val req = HttpRequest.newBuilder(URI.create(cfg.userinfoUrl))
      .timeout(Duration.ofSeconds(15))
      .header("Authorization", s"Bearer $accessToken").GET().build()
    send(req).filter(_.statusCode() == 200).map(_.body())
  }

  private def send(req: HttpRequest): Option[HttpResponse[String]] =
    try Some(http.send(req, HttpResponse.BodyHandlers.ofString()))
    catch {
      case scala.util.control.NonFatal(_) => None
      case _: InterruptedException => Thread.currentThread().interrupt(); None
    }
}
