package graft.store

/** TTL key-value cache — the reference's Cache storage service
  * (`Get(key) -> (value, ok)` / `Set(key, value, expires)`:
  * /root/reference/pkg/storage/cache/cache.go:11-14) with its memory
  * backend's defaults (cache/memory/memory.go: 5-minute default
  * expiration). Engine-side it backs public share-link replays
  * (`api/Server.shareData`): share dashboards hammer a fixed query, so
  * the serialized response is cached keyed on (uuid, format,
  * DataEpoch) — the epoch key makes hits correctness-safe, since ANY
  * visible catalog change bumps the epoch and orphans the entry.
  *
  * Beyond the reference surface: an LRU bound (`maxEntries`) so a hot
  * public endpoint cannot grow the heap without limit (dead epochs'
  * entries age out through it), per-entry expiry enforced on read, and
  * an injectable clock for tests. All ops run under the map's monitor —
  * entries are small serialized responses, critical sections are
  * microseconds; readers that miss pay the backing query, not a lock
  * convoy. */
final class TtlCache(defaultTtlMillis: Long = 5 * 60 * 1000L,
                     maxEntries: Int = 1024,
                     clock: () => Long = System.currentTimeMillis) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  private final case class Entry(value: Array[Byte], expiresAt: Long)

  // access-order LinkedHashMap = LRU; eldest evicted past the cap
  private val m = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
      size() > maxEntries
  }

  /** Value if present and unexpired (expired entries are dropped). */
  def get(key: String): Option[Array[Byte]] = m.synchronized {
    m.get(key) match {
      case null => None
      case e if e.expiresAt > clock() => Some(e.value)
      case _ => m.remove(key); None
    }
  }

  /** Store with per-entry TTL (None = the default TTL — the reference's
    * nil-expires Set uses its backend default the same way). */
  def set(key: String, value: Array[Byte], ttlMillis: Option[Long] = None): Unit =
    m.synchronized {
      m.put(key, Entry(value, clock() + ttlMillis.getOrElse(defaultTtlMillis)))
    }

  def size: Int = m.synchronized(m.size())
}
