package graft

import org.apache.spark.sql.SparkSession

/** Shared test SparkContext provider (optimization round 22).
  *
  * Round 21's driver run was taken down mid-suite by a teardown race:
  * every suite `getOrCreate()`d the same JVM-wide context AND stopped
  * it in `afterAll`, so ~30 contexts were started and stopped per
  * `sbt test`, and a single shutdown-hook stop landing mid-suite
  * cascaded into "SparkContext has been shutdown" failures in suites
  * that never touched it (OpFuzzSpec, StatsJoinSpec — VERDICT r21).
  *
  * The fix: ONE context for the whole forked test JVM, never stopped
  * by any suite (the JVM shutdown hook owns teardown), with each suite
  * taking its own `newSession()` so session state — conf mutations,
  * temp views, UDF registrations — cannot leak across suites. If an
  * external stop kills the context anyway, the next suite's
  * `session()` call revives it instead of collecting on a corpse.
  *
  * The context is built WITH the engine extensions
  * ([[graft.core.SessionDefaults.ExtensionsKey]]) — the engine's
  * standard session shape, required by FuzzSpec and harmless
  * elsewhere. DefuseExceptSpec is the one suite that needs a VANILLA
  * context; it builds (and stops) its own, and `session()` detects the
  * leftover vanilla context and replaces it.
  */
object TestSpark {
  private def rootBuilder() = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(graft.core.SessionDefaults.ExtensionsKey,
      graft.core.SessionDefaults.ExtensionsClass)

  private def hasExtensions(s: SparkSession): Boolean =
    s.conf.get(graft.core.SessionDefaults.ExtensionsKey, "")
      .contains(graft.core.SessionDefaults.ExtensionsClass)

  /** A fresh session on the shared context. Callers must NOT stop it. */
  def session(): SparkSession = synchronized {
    // getOrCreate self-revives: a stopped active/default session is
    // skipped and a new context built (SparkSession.Builder checks
    // sparkContext.isStopped before returning an existing session)
    var root = rootBuilder().getOrCreate()
    if (!hasExtensions(root)) {
      // a vanilla context leaked (extensions are static conf — they can
      // only be applied at context creation): replace it
      root.stop()
      root = rootBuilder().getOrCreate()
    }
    val s = root.newSession()
    // newSession state starts from the context conf; re-pin the
    // session-level defaults every suite expects
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s
  }
}
