package graft.store

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** [[CasStore]] over the S3 conditional-write REST API — the
  * object-store-only deployment's claim coordination (no shared POSIX
  * directory, no database), the deployment class the reference serves
  * with SQS (/root/reference/pkg/storage/queue/sqs/sqs.go) next to its
  * S3 blobstore (/root/reference/pkg/storage/blobstore/s3/s3.go).
  *
  * The CAS primitives map 1:1 onto S3's standard conditional writes:
  *
  *  - `putIfAbsent`  = `PUT` with `If-None-Match: *` — succeeds only if
  *    no object exists; a concurrent winner turns the losers' PUTs into
  *    `412 Precondition Failed` (or `409` mid-upload), atomically.
  *  - `replaceIf`    = `GET` (value + ETag), compare the value, then
  *    `PUT` with `If-Match: <etag>` — S3 rejects the PUT with 412 if
  *    the object changed after the read, so of N racing CAS writers
  *    exactly one succeeds.
  *  - `deleteIf`     = same read-compare, then `DELETE` with
  *    `If-Match: <etag>`.
  *
  * Claim values embed owner + expiry (see [[CasClaimQueue]]) so value
  * equality is the fencing test; the ETag precondition closes the
  * read-to-write race window. Identical-value collisions (same ETag for
  * same bytes) are harmless: replacing an `expect`-valued object that
  * another writer just rewrote to the SAME value is still a correct CAS.
  *
  * Requests are signed with AWS Signature V4 (the published AWS
  * specification: canonical request -> string-to-sign -> HMAC-SHA256
  * chain), implemented inline so the store works against AWS, MinIO, or
  * any S3-compatible endpoint with zero SDK dependencies. Path-style
  * addressing, so a custom `endpoint` (test fake, MinIO, GCS interop)
  * needs no virtual-host DNS.
  *
  * Retries: none built in — [[CasClaimQueue]] claim misses are already
  * retried by the Uploader's sweep, and a transient network failure on
  * claim just means the batch is picked up next sweep (at-least-once,
  * idempotent downstream). A 5xx is thrown so callers see real outages.
  */
final class S3CasStore(endpoint: String, bucket: String, prefix: String,
                       region: String, accessKey: String, secretKey: String) extends CasStore {

  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private val base = endpoint.stripSuffix("/")
  private val host = URI.create(base).getAuthority

  private def keyPath(key: String): String = {
    val full = (prefix.stripPrefix("/").stripSuffix("/") match {
      case "" => key
      case p  => s"$p/$key"
    })
    // SigV4 canonical-URI encoding: every segment RFC 3986-encoded,
    // '/' separators preserved
    "/" + bucket + "/" + full.split("/", -1).map(uriEncode).mkString("/")
  }

  private def uriEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '.' || c == '~') sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  private def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes).map(b => f"${b & 0xff}%02x").mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private val amzFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  /** One signed request. `extraHeaders` (the If-* preconditions) are
    * included in the SigV4 signed-header set — AWS requires If-None-Match
    * on conditional writes to be signed when present. */
  private def send(method: String, key: String, body: Array[Byte],
                   extraHeaders: Seq[(String, String)]): HttpResponse[Array[Byte]] = {
    val path = keyPath(key)
    val now = Instant.now()
    val amzDate = amzFmt.format(now)
    val date = amzDate.take(8)
    val payloadHash = sha256Hex(body)
    val headers = (Seq(
      "host" -> host,
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> amzDate) ++ extraHeaders.map { case (k, v) => (k.toLowerCase, v) })
      .sortBy(_._1)
    val signedHeaders = headers.map(_._1).mkString(";")
    val canonical = method + "\n" + path + "\n" + "" + "\n" +
      headers.map { case (k, v) => s"$k:${v.trim}\n" }.mkString + "\n" +
      signedHeaders + "\n" + payloadHash
    val scope = s"$date/$region/s3/aws4_request"
    val toSign = "AWS4-HMAC-SHA256\n" + amzDate + "\n" + scope + "\n" +
      sha256Hex(canonical.getBytes(UTF_8))
    val kSigning = hmac(hmac(hmac(hmac(("AWS4" + secretKey).getBytes(UTF_8), date),
      region), "s3"), "aws4_request")
    val signature = hmac(kSigning, toSign).map(b => f"${b & 0xff}%02x").mkString
    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"

    val builder = HttpRequest.newBuilder(URI.create(base + path))
      .method(method, if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
                      else HttpRequest.BodyPublishers.ofByteArray(body))
      .header("Authorization", auth)
      .header("x-amz-content-sha256", payloadHash)
      .header("x-amz-date", amzDate)
    extraHeaders.foreach { case (k, v) => builder.header(k, v) }
    val resp = http.send(builder.build(), HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 500)
      throw new java.io.IOException(s"S3 $method $path: HTTP ${resp.statusCode()}")
    resp
  }

  override def putIfAbsent(key: String, value: String): Boolean =
    send("PUT", key, value.getBytes(UTF_8), Seq("If-None-Match" -> "*"))
      .statusCode() match {
      case 200 => true
      case 412 | 409 => false // exists, or lost a concurrent-create race
      case other => throw new java.io.IOException(s"putIfAbsent($key): HTTP $other")
    }

  override def get(key: String): Option[String] =
    getWithETag(key).map(_._1)

  private def getWithETag(key: String): Option[(String, String)] = {
    val resp = send("GET", key, Array.emptyByteArray, Nil)
    resp.statusCode() match {
      case 200 =>
        // a missing ETag must be an ERROR, not "": If-Match: "" never
        // matches, so replaceIf/deleteIf would fail forever against an
        // endpoint that omits the header — a silent claim wedge (expired
        // leases unstealable) instead of a diagnosable fault
        val etag = resp.headers().firstValue("ETag").orElseThrow(() =>
          new java.io.IOException(s"get($key): 200 response without ETag header — " +
            "endpoint does not support the conditional-write protocol"))
        Some((new String(resp.body(), UTF_8), etag))
      case 404 => None
      case other => throw new java.io.IOException(s"get($key): HTTP $other")
    }
  }

  override def replaceIf(key: String, expect: String, value: String): Boolean =
    getWithETag(key) match {
      case Some((cur, etag)) if cur == expect =>
        send("PUT", key, value.getBytes(UTF_8), Seq("If-Match" -> etag))
          .statusCode() match {
          case 200 => true
          case 412 | 409 | 404 => false // changed or deleted since the read
          case other => throw new java.io.IOException(s"replaceIf($key): HTTP $other")
        }
      case _ => false
    }

  override def deleteIf(key: String, expect: String): Boolean =
    getWithETag(key) match {
      case Some((cur, etag)) if cur == expect =>
        send("DELETE", key, Array.emptyByteArray, Seq("If-Match" -> etag))
          .statusCode() match {
          case 204 | 200 => true
          case 412 | 409 | 404 => false
          case other => throw new java.io.IOException(s"deleteIf($key): HTTP $other")
        }
      case _ => false
    }
}
