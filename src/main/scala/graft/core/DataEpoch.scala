package graft.core

/** Global data-change epoch: bumped whenever any catalog-managed table's
  * visible state changes (append, evolve, compact, drop). Derived-
  * metadata caches (ANN corpus row counts / embedding dims,
  * SimilaritySearch) key their entries by the epoch at compute time, so
  * an append anywhere invalidates them — coarse, but metadata recompute
  * is one small job per corpus and correctness beats cache hit rate.
  * External (non-catalog) DataFrames never bump it, so batch jobs like
  * Verify/Bench keep full cache locality. */
object DataEpoch {
  private val e = new java.util.concurrent.atomic.AtomicLong(0L)
  def current: Long = e.get()
  def bump(): Unit = e.incrementAndGet()
}
