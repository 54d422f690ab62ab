package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Direct receipts for [[DefuseExceptRewrite]] — the workaround for the
  * Spark 4.1.2 `ReplaceExceptWithFilter` fault the r17 fuzz sweep found
  * (seeds 166/320). This suite's session deliberately does NOT install
  * the engine extensions, so it can hold the halves a wired session
  * cannot:
  *
  *  1. the upstream-fault canary: the hazardous EXCEPT still crashes a
  *     vanilla session — when a Spark upgrade makes this test fail, the
  *     bug is fixed upstream and the defuse rule should be retired;
  *  2. rule-level structure: the rewrite fires exactly on the hazard
  *     pattern, PRESERVES the plan's output attributes (names, exprIds,
  *     types — parents must keep resolving), and leaves healthy EXCEPTs
  *     untouched so they keep the faster filter rewrite.
  *
  * End-to-end execution of the defused plan (non-empty case, exact
  * set-difference, via the installed extension) runs in FuzzSpec, whose
  * session carries SessionDefaults.ExtensionsClass like every engine
  * session.
  */
class DefuseExceptSpec extends AnyFunSuite with BeforeAndAfterAll {
  // spark.sql.extensions is STATIC config: getOrCreate() would happily
  // hand back an extension-bearing session another suite left active,
  // falsifying the "vanilla session" canary below. Stop any leaked
  // session first, then fail fast if the session isn't actually vanilla.
  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    assert(!s.conf.get(graft.core.SessionDefaults.ExtensionsKey, "")
        .contains(graft.core.SessionDefaults.ExtensionsClass),
      "DefuseExceptSpec needs a VANILLA session (an extension-bearing " +
        "session leaked past the stop() guard)")
    s
  }

  override def beforeAll(): Unit =
    spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .createOrReplaceTempView("part")

  override def afterAll(): Unit = spark.stop()

  // hazard anatomy: the RIGHT side's filter references p_size, whose
  // name the projected CAST alias shadows — exactly the name-map
  // confusion that crashes the rewrite (a right filter on an
  // unshadowed column, e.g. p_type, makes the rewrite bail safely)
  private val hazardous =
    """SELECT CAST(p_size AS BIGINT) AS p_size FROM part WHERE p_type = 'PROMO'
      |EXCEPT
      |SELECT CAST(p_size AS BIGINT) AS p_size FROM part WHERE p_size <= 20""".stripMargin

  test("upstream canary: the hazardous EXCEPT still crashes a vanilla session") {
    val failed =
      try { spark.sql(hazardous).collect(); false }
      catch { case e: Throwable =>
        assert(String.valueOf(e.getMessage).contains("ReplaceExceptWithFilter"),
          s"unexpected failure mode: ${e.getMessage}")
        true
      }
    assert(failed,
      "ReplaceExceptWithFilter no longer faults — Spark fixed it upstream; retire DefuseExceptRewrite")
  }

  test("the rewrite fires on the hazard and preserves the plan's output attributes") {
    val analyzed = spark.sql(hazardous).queryExecution.analyzed
    // the analyzed plan is already marked analyzed, which the
    // analyzer-path transform skips by design — use the direct handle
    val defused = DefuseExceptRewrite.forceApply(analyzed)
    assert(defused ne analyzed, "rule did not fire on the hazard pattern")
    // output contract: names, exprIds and types unchanged, so any parent
    // operators referencing the Except's attributes keep resolving
    val (before, after) = (analyzed.output, defused.output)
    assert(before.map(_.name) == after.map(_.name))
    assert(before.map(_.exprId) == after.map(_.exprId))
    assert(before.map(_.dataType) == after.map(_.dataType))
    assert(defused.resolved, "defused plan must remain resolved")
    // and the rename is actually in place on the left child
    val renamed = defused.collect {
      case p: Project if p.projectList.exists(_.name.startsWith("__graft_defuse_")) => p
    }
    assert(renamed.nonEmpty, "expected a __graft_defuse_ rename Project under the Except")
  }

  test("healthy EXCEPTs are untouched (the fast filter rewrite is preserved)") {
    val healthy =
      """SELECT p_size FROM part WHERE p_type = 'PROMO'
        |EXCEPT
        |SELECT p_size FROM part WHERE p_size <= 20""".stripMargin
    val analyzed = spark.sql(healthy).queryExecution.analyzed
    assert(DefuseExceptRewrite.forceApply(analyzed) eq analyzed,
      "rule fired on a healthy EXCEPT — it would disable the filter rewrite everywhere")
    // and the vanilla optimizer keeps turning it into a filter, not a join
    val optimized = spark.sql(healthy).queryExecution.optimizedPlan.toString
    assert(!optimized.contains("LeftAnti"),
      s"healthy EXCEPT lost the filter rewrite:\n$optimized")
  }
}
