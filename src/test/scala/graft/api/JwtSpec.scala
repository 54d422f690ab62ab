package graft.api

import graft.core.Json
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class JwtSpec extends AnyFunSuite {
  private val secret = "test-secret-please-rotate".getBytes(UTF_8)
  private val now = 1700000000000L

  test("round trip: session claims verify and carry user_id + exp") {
    val tok = Jwt.encodeSession(42L, secret, ttlSeconds = 3600, nowMillis = now)
    val claims = Jwt.verify(tok, secret, nowMillis = now).get
    assert(claims.get("user_id").asLong == 42L)
    assert(claims.get("exp").asLong == now / 1000 + 3600)
    // three base64url segments, no padding
    assert(tok.split("\\.").length == 3 && !tok.contains("="))
  }

  test("expiry: token dies exactly when exp passes; missing exp rejected") {
    val tok = Jwt.encodeSession(1L, secret, ttlSeconds = 60, nowMillis = now)
    assert(Jwt.verify(tok, secret, nowMillis = now + 59999).isDefined)
    assert(Jwt.verify(tok, secret, nowMillis = now + 60000).isEmpty)
    val noExp = Json.mapper.createObjectNode(); noExp.put("user_id", 1L)
    assert(Jwt.verify(Jwt.encode(noExp, secret), secret, nowMillis = now).isEmpty)
  }

  test("tamper: any altered segment or wrong secret fails verification") {
    val tok = Jwt.encodeSession(7L, secret, ttlSeconds = 3600, nowMillis = now)
    val Array(h, p, s) = tok.split("\\.")
    // forge the payload (user_id 7 -> 8), keep the old signature
    val forged = Json.mapper.createObjectNode()
    forged.put("user_id", 8L); forged.put("exp", now / 1000 + 3600)
    val fp = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(Json.write(forged).getBytes(UTF_8))
    assert(Jwt.verify(s"$h.$fp.$s", secret, nowMillis = now).isEmpty)
    // flipped signature byte
    val s2 = if (s.head == 'A') 'B' +: s.tail else 'A' +: s.tail
    assert(Jwt.verify(s"$h.$p.$s2", secret, nowMillis = now).isEmpty)
    // wrong secret
    assert(Jwt.verify(tok, "other".getBytes(UTF_8), nowMillis = now).isEmpty)
    // wrong shape
    assert(Jwt.verify(s"$h.$p", secret, nowMillis = now).isEmpty)
    assert(Jwt.verify("", secret, nowMillis = now).isEmpty)
  }

  test("alg confusion: 'none' and any non-HS256 header are rejected even with a matching MAC") {
    val b64 = java.util.Base64.getUrlEncoder.withoutPadding
    def seg(s: String) = b64.encodeToString(s.getBytes(UTF_8))
    val payload = s"""{"user_id":1,"exp":${now / 1000 + 3600}}"""
    // alg:none with empty signature — the classic downgrade
    assert(Jwt.verify(seg("""{"alg":"none","typ":"JWT"}""") + "." + seg(payload) + ".",
      secret, nowMillis = now).isEmpty)
    // a correctly-MAC'd token whose header claims another alg must
    // still die: alg is pinned, not dispatched
    val h = seg("""{"alg":"HS512","typ":"JWT"}""")
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, "HmacSHA256"))
    val sig = b64.encodeToString(mac.doFinal((h + "." + seg(payload)).getBytes(UTF_8)))
    assert(Jwt.verify(s"$h.${seg(payload)}.$sig", secret, nowMillis = now).isEmpty)
  }
}
