package graft.api

import com.fasterxml.jackson.databind.JsonNode
import graft.core.Json
import java.nio.charset.StandardCharsets.UTF_8
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Minimal JWS/JWT (RFC 7515 / RFC 7519), HS256 only — the signed
  * dashboard session cookie the reference mints through
  * `go-chi/jwtauth` (`/root/reference/pkg/api/auth.go:147-166`: claims
  * `{user_id, exp}`, 7-day expiry, HttpOnly cookie). HS256 is the only
  * algorithm this engine issues, so it is the only one verified —
  * the header's `alg` field is checked EQUAL to HS256, never used to
  * dispatch, which structurally rules out the classic `alg: none` /
  * key-confusion downgrade attacks.
  *
  * Everything here is the published spec: base64url without padding
  * (RFC 4648 §5), HMAC-SHA256 over `<b64(header)>.<b64(payload)>`,
  * constant-time signature compare, numeric-date `exp` validation
  * (RFC 7519 §4.1.4). */
object Jwt {
  private val Header = """{"alg":"HS256","typ":"JWT"}"""

  private def b64(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  private def unb64(s: String): Option[Array[Byte]] =
    try Some(java.util.Base64.getUrlDecoder.decode(s)) catch { case _: IllegalArgumentException => None }

  private def hmac(secret: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** Sign `claims` (a JSON object, e.g. {"user_id":1,"exp":123}). */
  def encode(claims: JsonNode, secret: Array[Byte]): String = {
    val signingInput = b64(Header.getBytes(UTF_8)) + "." + b64(Json.write(claims).getBytes(UTF_8))
    signingInput + "." + b64(hmac(secret, signingInput))
  }

  /** Convenience: claims {user_id, exp = nowMillis/1000 + ttlSeconds}. */
  def encodeSession(userId: Long, secret: Array[Byte], ttlSeconds: Long,
                    nowMillis: Long = System.currentTimeMillis()): String = {
    val n = Json.mapper.createObjectNode()
    n.put("user_id", userId)
    n.put("exp", nowMillis / 1000 + ttlSeconds)
    encode(n, secret)
  }

  /** Verified, unexpired claims — or None for ANY defect: wrong shape,
    * bad base64, non-HS256 header, signature mismatch (constant-time
    * compare), malformed payload, missing/expired `exp`. A token
    * without `exp` is rejected: every token this engine issues has one,
    * so its absence is evidence of forgery, not a legacy token. */
  def verify(token: String, secret: Array[Byte],
             nowMillis: Long = System.currentTimeMillis()): Option[JsonNode] =
    token.split("\\.", -1) match {
      case Array(h, p, s) =>
        for {
          sig <- unb64(s)
          _ <- Option.when(java.security.MessageDigest.isEqual(sig, hmac(secret, h + "." + p)))(())
          hdrBytes <- unb64(h)
          hdr <- Json.parse(new String(hdrBytes, UTF_8))
          _ <- Option.when(hdr.path("alg").asText("") == "HS256")(())
          plBytes <- unb64(p)
          claims <- Json.parse(new String(plBytes, UTF_8))
          _ <- Option.when(claims.hasNonNull("exp") && claims.get("exp").canConvertToLong
                 && claims.get("exp").asLong * 1000 > nowMillis)(())
        } yield claims
      case _ => None
    }

  /** Session-bound CSRF token: HMAC of the session JWT itself. A
    * cross-site attacker can make the browser SEND the cookie but can
    * never READ it, so it cannot derive this value; stateless (nothing
    * stored server-side) and scoped exactly to one session — rotating
    * the cookie rotates the token. */
  def csrfToken(sessionToken: String, secret: Array[Byte]): String =
    b64(hmac(secret, "csrf:" + sessionToken))

  /** Constant-time check of a submitted CSRF token for this session. */
  def csrfValid(submitted: String, sessionToken: String, secret: Array[Byte]): Boolean =
    java.security.MessageDigest.isEqual(
      submitted.getBytes(UTF_8), csrfToken(sessionToken, secret).getBytes(UTF_8))
}
