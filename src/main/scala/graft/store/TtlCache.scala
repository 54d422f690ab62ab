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
  * Beyond the reference surface: LRU bounds on BOTH entry count
  * (`maxEntries`) and total payload bytes (`maxBytes`) so a hot public
  * endpoint cannot grow the heap without limit — the count bound alone
  * let 1024 × 1 MiB-capped responses pin ~1 GiB; the byte bound makes
  * the worst case a fixed small fraction of heap regardless of entry
  * sizes (dead epochs' entries age out through both). Per-entry expiry
  * is enforced on read, and the clock is injectable for tests. All ops
  * run under the map's monitor — entries are small serialized
  * responses, critical sections are microseconds; readers that miss pay
  * the backing query, not a lock convoy. */
final class TtlCache(defaultTtlMillis: Long = 5 * 60 * 1000L,
                     maxEntries: Int = 1024,
                     maxBytes: Long = 64L << 20,
                     clock: () => Long = System.currentTimeMillis) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")
  require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")

  private final case class Entry(value: Array[Byte], expiresAt: Long)

  private var totalBytes = 0L // guarded by m's monitor

  // access-order LinkedHashMap = LRU; eldest evicted past the count cap
  // (byte-cap eviction runs in set(), same monitor)
  private val m = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
      if (size() > maxEntries) { totalBytes -= e.getValue.value.length; true }
      else false
  }

  /** Value if present and unexpired (expired entries are dropped). */
  def get(key: String): Option[Array[Byte]] = m.synchronized {
    m.get(key) match {
      case null => None
      case e if e.expiresAt > clock() => Some(e.value)
      case e => m.remove(key); totalBytes -= e.value.length; None
    }
  }

  /** Store with per-entry TTL (None = the default TTL — the reference's
    * nil-expires Set uses its backend default the same way). Evicts
    * least-recently-used entries until the byte budget holds; a value
    * larger than the whole budget is not retained at all. */
  def set(key: String, value: Array[Byte], ttlMillis: Option[Long] = None): Unit =
    m.synchronized {
      val old = m.put(key, Entry(value, clock() + ttlMillis.getOrElse(defaultTtlMillis)))
      if (old != null) totalBytes -= old.value.length
      totalBytes += value.length
      val it = m.entrySet().iterator()
      while (totalBytes > maxBytes && it.hasNext) {
        val e = it.next(); totalBytes -= e.getValue.value.length; it.remove()
      }
    }

  /** Atomically take an unexpired entry — present-and-removed or None.
    * The one-shot consume (OAuth states): two racing callers get
    * exactly one Some between them. */
  def remove(key: String): Option[Array[Byte]] = m.synchronized {
    m.remove(key) match {
      case null => None
      case e =>
        totalBytes -= e.value.length
        if (e.expiresAt > clock()) Some(e.value) else None
    }
  }

  def size: Int = m.synchronized(m.size())

  /** Total cached payload bytes (the bound [[maxBytes]] enforces). */
  def bytes: Long = m.synchronized(totalBytes)
}
