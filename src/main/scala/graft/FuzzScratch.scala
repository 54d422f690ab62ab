package graft

/** Per-invocation scratch directories for the fuzzers ([[StreamFuzz]],
  * [[StoreFuzz]]). The previous scheme keyed /tmp paths on
  * (family, sf-dir, pid) and rmrf'd at the start of each run — correct
  * for the sequential sweeps but unguarded against two same-family
  * queries in one JVM deleting each other's staged files mid-stream.
  * Here every invocation gets a UNIQUE directory (atomic counter), so
  * concurrent runs can never collide; a shutdown hook removes
  * everything this JVM created (dirs from kill -9'd JVMs are the chaos
  * harness's job to own — they live under ITS work dir, not /tmp).
  */
private[graft] object FuzzScratch {
  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val created =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.io.File]())

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val fs = f.listFiles()
      if (fs != null) fs.foreach(rmrf)
    }
    f.delete(); ()
  }

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(f => rmrf(f))
    }, "graft-fuzz-scratch-cleanup"))
  }

  /** A fresh, empty, JVM-unique scratch dir
    * `/tmp/graft_<prefix>_<pid>_<n>`, deleted at JVM exit. */
  def fresh(prefix: String): java.io.File = {
    val f = new java.io.File(s"/tmp/graft_${prefix}_" +
      s"${ProcessHandle.current().pid()}_${counter.incrementAndGet()}")
    rmrf(f)
    f.mkdirs()
    created.add(f)
    f
  }

  /** Eagerly free one scratch dir (and drop it from the exit-hook
    * list). Shutdown-hook-only reclamation made a 200+-seed streaming
    * sweep accumulate every seed's staged inputs + checkpoint + sink
    * output in /tmp for the whole run (ADVICE r19) — long sweeps call
    * this per seed once the seed's result is durably materialized. */
  def release(dir: java.io.File): Unit = {
    rmrf(dir)
    created.remove(dir)
    ()
  }

  /** Free EVERY scratch dir this JVM has created so far — the per-seed
    * hook for sweep loops, which run seeds strictly sequentially and
    * materialize each result to the dump dir before moving on (so no
    * live query can still be reading a prior seed's staging). The
    * shutdown hook remains the backstop for whatever is created after
    * the last drain. */
  def drain(): Unit = {
    val snapshot = created.toArray(Array.empty[java.io.File])
    snapshot.foreach(release)
  }
}
