package graft.core

import org.apache.spark.sql.Dataset

/** Request-scoped release of persisted operator intermediates.
  *
  * Several dedup operators persist an intermediate Dataset (minhash
  * signatures, simhash values, probe fingerprints) that the RETURNED
  * lazy plan consumes more than once. `Dataset.persist` registers the
  * plan in the session's CacheManager, which holds it STRONGLY until an
  * explicit unpersist — correct for a batch job (the JVM exits), but on
  * a resident multi-tenant server every distinct analytics plan would
  * leak one cached-plan entry forever (found by SoakBench: persistent
  * RDDs grew monotonically under a dedup_near loop and survived GC —
  * Spark's ContextCleaner only reaps RDD-level caching, not
  * CacheManager entries).
  *
  * Operators register each lazily-consumed persist with [[track]];
  * the HTTP layer wraps each request's plan-and-stream lifetime in
  * [[scoped]], which unpersists everything tracked once the response
  * is fully encoded. Outside a scope, [[track]] is a no-op and batch
  * callers keep today's semantics (persist until session/JVM end).
  *
  * Concurrency note: CacheManager dedups by plan equality, so two
  * concurrent requests with the same parameters share one cache entry;
  * the first scope to exit unpersists it and the other side recomputes
  * from the parquet scan — a latency cost, never a correctness one.
  * Scopes are thread-local: begin/end must run on the request thread
  * (they do — the HTTP handler plans AND encodes on one thread).
  */
object CacheScope {
  private val tl = new ThreadLocal[java.util.ArrayList[Dataset[_]]]()

  /** Register a persisted intermediate with the active scope (no-op
    * when none). Returns the dataset for call-site chaining. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    val buf = tl.get()
    if (buf != null) buf.add(ds)
    ds
  }

  /** Run `f` in a fresh scope; on exit (normal or thrown), unpersist
    * everything tracked in it. Non-blocking eviction — the block caps
    * are released asynchronously. Nests: the inner scope's tracks are
    * released at the inner exit only. */
  def scoped[A](f: => A): A = {
    val prev = tl.get()
    val buf = new java.util.ArrayList[Dataset[_]]()
    tl.set(buf)
    try f
    finally {
      tl.set(prev)
      buf.forEach { ds =>
        try { ds.unpersist(blocking = false); () }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }
}
