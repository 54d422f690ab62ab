package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit dump for the optimization rounds: writes
  * `explain("formatted")` of selected battery queries to files.
  *
  * Usage: `PLAN_QUERIES=q145_...,q49_... PLAN_OUT=plans/r21 PLAN_SUFFIX=before \
  *   sbt "runMain graft.PlanDump"` — one `<query>_<suffix>.txt` per query.
  *
  * Mirrors the bench session config (same shuffle partitions, extensions,
  * timezone) so the dumped plan is the one the bench executes. Queries
  * whose plan depends on staged side effects (streaming rows stage files,
  * store rows write stores) still run their staging here — the dump is
  * the FINAL returned DataFrame's plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("PLAN_OUT", "plans/r21")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.SessionDefaults.ExtensionsKey,
        graft.core.SessionDefaults.ExtensionsClass)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val names = sys.env.getOrElse("PLAN_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty)
    // PLAN_EXEC=1: run the query first (same action as the bench) so an
    // AdaptiveSparkPlan is dumped in its FINAL form — runtime stage
    // reuse (ReusedExchange / table-cache dedup) is invisible in the
    // initial plan, and that reuse is exactly what some optimizations
    // claim (e.g. q145's V-from-pairs).
    val exec = sys.env.get("PLAN_EXEC").contains("1")
    names.foreach { n =>
      System.err.println(s"[plandump] $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) df.queryExecution.toRdd.count()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
    }
    spark.stop()
  }
}
