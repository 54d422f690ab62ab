package graft.core

/** Engine-wide Spark session defaults that exist for ROBUSTNESS, kept
  * in one place so the product path (api.Main; tenant child sessions
  * inherit through `newSession()`) and every harness main
  * (Verify/Bench/FuzzSweep/OpFuzzSweep) run the exact configuration the
  * correctness gate verified.
  *
  * Currently one entry: the Catalyst extensions class installing
  * [[graft.plans.DefuseExceptRewrite]] — the workaround for the Spark
  * 4.1.2 `ReplaceExceptWithFilter` fault the relational fuzz sweep
  * found at seeds 166/320 (a legal same-relation EXCEPT with an
  * alias-shadowed projection fails the whole query; the rule is on
  * Spark's non-excludable list, so `spark.sql.optimizer.excludedRules`
  * cannot quarantine it — receipted in PLANS.md r17). */
object SessionDefaults {
  val ExtensionsKey: String = "spark.sql.extensions"
  val ExtensionsClass: String = "graft.plans.GraftExtensions"
}
