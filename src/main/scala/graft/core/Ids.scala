package graft.core

import java.security.{MessageDigest, SecureRandom}

/** Snowflake row-id generator.
  *
  * Matches the reference's bwmarrin/snowflake layout used for `__row_id`
  * (/root/reference/pkg/util/util.go:9-29): 41 bits of millis since the
  * Twitter epoch << 22 | 10-bit node id << 12 | 12-bit per-ms sequence.
  * The node id is the low 10 bits of the last byte of sha256(hostname).
  * Ids are time-sortable, unique per (node, ms, seq).
  */
final class Snowflake(nodeId: Long) {
  import Snowflake._
  private[this] var lastMs = -1L
  private[this] var seq = 0L

  def next(): Long = synchronized {
    var now = System.currentTimeMillis()
    if (now == lastMs) {
      seq = (seq + 1) & SeqMask
      if (seq == 0) { // sequence exhausted for this ms: spin to next ms
        while (now <= lastMs) now = System.currentTimeMillis()
      }
    } else seq = 0
    lastMs = now
    ((now - Epoch) << TimeShift) | ((nodeId & NodeMask) << NodeShift) | seq
  }
}

object Snowflake {
  val Epoch = 1288834974657L // twitter epoch, bwmarrin/snowflake default
  val TimeShift = 22
  val NodeShift = 12
  val NodeMask = 0x3FFL
  val SeqMask = 0xFFFL

  def hostNodeId(): Long = {
    val hostname =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "localhost" }
    val hash = MessageDigest.getInstance("SHA-256").digest(hostname.getBytes("UTF-8"))
    (hash(hash.length - 1) & 0xFF).toLong & NodeMask
  }

  lazy val default = new Snowflake(hostNodeId())

  def millisOf(id: Long): Long = (id >>> TimeShift) + Epoch
}

/** ULID generator (Crockford base32, 48-bit ms timestamp + 80-bit random),
  * used for the vertical flattener's `___document_id`
  * (/root/reference/pkg/api/flattener.go:119, oklog/ulid). */
object Ulid {
  private val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  private val rng = new SecureRandom()

  def next(): String = at(System.currentTimeMillis())

  def at(ms: Long): String = {
    val sb = new StringBuilder(26)
    // 10 chars of timestamp (48 bits, 5 bits per char => 50; top padded)
    var t = ms
    val ts = new Array[Char](10)
    var i = 9
    while (i >= 0) { ts(i) = Alphabet(((t & 0x1F)).toInt); t >>>= 5; i -= 1 }
    sb.appendAll(ts)
    // 16 chars of randomness (80 bits)
    val rand = new Array[Byte](10)
    rng.nextBytes(rand)
    var acc = 0L; var bits = 0
    rand.foreach { b =>
      acc = (acc << 8) | (b & 0xFF); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(Alphabet(((acc >>> bits) & 0x1F).toInt)) }
    }
    sb.result()
  }
}
