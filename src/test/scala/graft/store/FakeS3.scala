package graft.store

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** In-process fake of the S3 object API subset [[S3CasStore]] speaks:
  * GET / PUT / DELETE on one object, with ETags and the standard
  * conditional-write semantics (`If-None-Match: *` create-if-absent,
  * `If-Match: <etag>` compare-and-swap on PUT and DELETE) — the local
  * stand-in for AWS/MinIO the StoreSpec suite runs the full
  * steal/fence/renew claim contract against.
  *
  * Conditional evaluation and mutation happen under one lock, matching
  * S3's atomicity guarantee for conditional writes (a racing writer sees
  * 412, never a torn state).
  *
  * Every request's AWS SigV4 signature is VERIFIED against the shared
  * secret by independently recomputing the canonical request from the
  * published spec — a client-side signing bug (unsigned precondition
  * header, wrong canonical URI encoding, bad HMAC chain) fails the suite
  * with 403 instead of silently passing. */
final class FakeS3(accessKey: String, secretKey: String, region: String) {
  private case class Obj(bytes: Array[Byte], etag: String)
  private val objects = scala.collection.mutable.HashMap[String, Obj]()
  private val lock = new Object

  val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()
  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
  def keys: Set[String] = lock.synchronized(objects.keySet.toSet)

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map(x => f"${x & 0xff}%02x").mkString
  private def sha256Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b).map(x => f"${x & 0xff}%02x").mkString
  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** 403 unless the Authorization header carries a valid SigV4 signature
    * for this request, recomputed from headers the client declared. */
  private def verifySignature(ex: HttpExchange, body: Array[Byte]): Boolean = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(return false)
    val m = """AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/s3/aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]+)""".r
    auth match {
      case m(ak, date, reg, signedHeaders, signature) =>
        if (ak != accessKey || reg != region) return false
        val headerNames = signedHeaders.split(";").toSeq
        val canonicalHeaders = headerNames.map { h =>
          val v = if (h == "host") ex.getRequestHeaders.getFirst("Host")
                  else ex.getRequestHeaders.getFirst(h)
          s"$h:${Option(v).getOrElse("").trim}\n"
        }.mkString
        val payloadHash = Option(ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
          .getOrElse(sha256Hex(body))
        // the raw (encoded) request path is the canonical URI
        val canonical = ex.getRequestMethod + "\n" + ex.getRequestURI.getRawPath + "\n\n" +
          canonicalHeaders + "\n" + signedHeaders + "\n" + payloadHash
        val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
        val toSign = "AWS4-HMAC-SHA256\n" + amzDate + "\n" +
          s"$date/$region/s3/aws4_request" + "\n" + sha256Hex(canonical.getBytes(UTF_8))
        val kSigning = hmac(hmac(hmac(hmac(("AWS4" + secretKey).getBytes(UTF_8), date),
          region), "s3"), "aws4_request")
        hmac(kSigning, toSign).map(x => f"${x & 0xff}%02x").mkString == signature
      case _ => false
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte] = Array.emptyByteArray,
                      etag: Option[String] = None): Unit = {
    etag.foreach(e => ex.getResponseHeaders.set("ETag", "\"" + e + "\""))
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit = {
    val body = ex.getRequestBody.readAllBytes()
    if (!verifySignature(ex, body)) { respond(ex, 403); return }
    val key = ex.getRequestURI.getRawPath // includes /bucket; opaque to the map
    val ifMatch = Option(ex.getRequestHeaders.getFirst("If-Match"))
      .map(_.stripPrefix("\"").stripSuffix("\""))
    val ifNoneMatch = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
    lock.synchronized {
      (ex.getRequestMethod, objects.get(key)) match {
        case ("GET", Some(o))    => respond(ex, 200, o.bytes, Some(o.etag))
        case ("GET", None)       => respond(ex, 404)
        case ("PUT", cur) =>
          if (ifNoneMatch.contains("*") && cur.isDefined) respond(ex, 412)
          else if (ifMatch.isDefined && cur.isEmpty) respond(ex, 404)
          else if (ifMatch.exists(e => !cur.map(_.etag).contains(e))) respond(ex, 412)
          else {
            val o = Obj(body, md5Hex(body))
            objects(key) = o
            respond(ex, 200, etag = Some(o.etag))
          }
        case ("DELETE", cur) =>
          if (ifMatch.isDefined && cur.isEmpty) respond(ex, 404)
          else if (ifMatch.exists(e => !cur.map(_.etag).contains(e))) respond(ex, 412)
          else { objects.remove(key); respond(ex, 204) }
        case _ => respond(ex, 405)
      }
    }
  }
}
