package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property check on the operator-composition fuzzer: for many seeds,
  * the DataFrame-API plan and `spark.sql` of the generated SQL must
  * agree column-for-column and row-for-row. This pins the API-to-SQL
  * operator mapping across compositions no hand-written battery row
  * covers; the cross-ENGINE half of the differential (same SQL in
  * DuckDB) runs in the driver's gate via q190–q207. */
class FuzzSpec extends AnyFunSuite with BeforeAndAfterAll {
  // spark.sql.extensions is STATIC config: TestSpark guarantees the
  // shared context carries the engine extensions (replacing a vanilla
  // context another suite left active); the canary below fails fast if
  // that guarantee ever breaks.
  lazy val spark: SparkSession = {
    val s = TestSpark.session()
    assert(s.conf.get(graft.core.SessionDefaults.ExtensionsKey, "")
        .contains(graft.core.SessionDefaults.ExtensionsClass),
      "FuzzSpec needs a session built WITH the engine extensions")
    s
  }

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val tables = Seq("lineitem", "orders", "customer", "part", "supplier",
      "nation", "region")
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
  }

  /** Canonical form: (column names, sorted row renderings). Rows render
    * through toString in one JVM, so identical values — including
    * doubles — render identically on both sides. */
  private def canon(df: DataFrame): (Vector[String], Vector[String]) =
    (df.schema.fields.map(_.name).toVector,
      df.collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString("|")).toVector.sorted)

  test("API plan and generated SQL agree for seeds 1-60") {
    var nonEmpty = 0
    (1L to 60L).foreach { seed =>
      val g = FuzzQueries.generate(seed)
      val (ac, ar) = canon(g.query(spark, dir))
      val (sc, sr) = canon(spark.sql(g.sql))
      assert(ac == sc, s"seed=$seed shape=${g.shape} columns differ\nsql=${g.sql}")
      assert(ar == sr, s"seed=$seed shape=${g.shape} rows differ\nsql=${g.sql}")
      if (ar.nonEmpty) nonEmpty += 1
    }
    // the generator must not degenerate into empty-result queries
    // (vacuous agreement proves nothing) — EXCEPT and NOT-EXISTS
    // shapes can be legitimately empty, so the bar is loose
    assert(nonEmpty >= 45, s"only $nonEmpty/60 seeds returned rows")
  }

  test("battery seeds produce their named shapes, each with rows at sf0.001") {
    FuzzQueries.batterySeeds.foreach { case (name, seed) =>
      val g = FuzzQueries.generate(seed)
      assert(g.shape == FuzzQueries.expectedShape(name),
        s"$name (seed $seed) generated shape ${g.shape}")
      assert(g.query(spark, dir).count() > 0, s"$name is empty at sf0.001")
    }
  }

  test("generation is deterministic: same seed, same SQL") {
    (1L to 10L).foreach { seed =>
      assert(FuzzQueries.generate(seed).sql == FuzzQueries.generate(seed).sql)
    }
  }

  test("no generated plan degrades to a CartesianProduct") {
    // every join the grammar emits is keyed (equi, semi/anti, or a
    // 1-row broadcast for scalar subqueries — BroadcastNestedLoopJoin,
    // never CartesianProduct); a grammar bug dropping a join condition
    // would go corpus-quadratic at scale, so it must fail HERE
    (1L to 60L).foreach { seed =>
      val g = FuzzQueries.generate(seed)
      val plan = g.query(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"seed=$seed shape=${g.shape} planned a CartesianProduct\nsql=${g.sql}")
    }
  }

  test("seed-166 EXCEPT: the engine's DefuseExceptRewrite makes the fuzz catch executable") {
    // The r17 sweep found seeds 166/320 (same-relation EXCEPT with a
    // cast-aliased projection shadowing a filter column) CRASH Spark
    // 4.1.2's ReplaceExceptWithFilter rewrite on both the API and SQL
    // paths — a user-facing error on a legal query DuckDB runs fine.
    // The engine installs graft.plans.DefuseExceptRewrite through its
    // session extensions (this suite's builder, like every engine
    // session, carries SessionDefaults.ExtensionsClass): both halves
    // must now run and agree. The upstream-fault canary (the repro
    // WITHOUT the extension, which must keep failing until Spark fixes
    // the rule) lives in DefuseExceptSpec with its own session.
    val g = FuzzQueries.generate(166L)
    assert(g.sql.contains("EXCEPT"), s"seed 166 no longer an EXCEPT shape: ${g.shape}")
    val (ac, ar) = canon(g.query(spark, dir))
    val (sc, sr) = canon(spark.sql(g.sql))
    assert(ac == sc && ar == sr, s"seed 166 differential failed\nsql=${g.sql}")
    val g2 = FuzzQueries.generate(320L)
    val (_, ar2) = canon(g2.query(spark, dir))
    val (_, sr2) = canon(spark.sql(g2.sql))
    assert(ar2 == sr2, s"seed 320 differential failed\nsql=${g2.sql}")
    // non-empty hand case through the installed extension: exact set
    // difference (seeds 166/320 are legitimately empty at sf0.001, so
    // on their own they'd only prove "no crash")
    val hazard = spark.sql(
      """SELECT CAST(p_size AS BIGINT) AS p_size FROM part WHERE p_type = 'PROMO'
        |EXCEPT
        |SELECT CAST(p_size AS BIGINT) AS p_size FROM part WHERE p_size <= 20""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    val a = spark.sql("SELECT DISTINCT CAST(p_size AS BIGINT) v FROM part WHERE p_type = 'PROMO'")
      .collect().map(_.getLong(0)).toSet
    val b = spark.sql("SELECT DISTINCT CAST(p_size AS BIGINT) v FROM part WHERE p_size <= 20")
      .collect().map(_.getLong(0)).toSet
    assert((a -- b).nonEmpty, "fixture degenerated to an empty difference")
    assert(hazard == (a -- b), s"defused EXCEPT wrong: got $hazard expected ${a -- b}")
  }

  test("sensitivity: a mutated plan FAILS the differential (the gate is not vacuous)") {
    // take battery seeds and flip one literal in the SQL side only —
    // the canon comparison must notice, or green sweeps prove nothing.
    // Covers the three mutation classes a buggy operator mapping would
    // produce: a shifted constant, a dropped predicate, a wrong agg.
    var caught = 0
    FuzzQueries.batterySeeds.take(6).foreach { case (_, seed) =>
      val g = FuzzQueries.generate(seed)
      val mutated = Seq(
        ("25.0", "24.0"), ("<=", "<"), ("COUNT(*)", "COUNT(*) + 1"),
        ("= 'R'", "= 'A'"), ("MAX(", "MIN("), ("0.5", "0.6"))
        .collectFirst { case (from, to) if g.sql.contains(from) =>
          g.sql.replaceFirst(java.util.regex.Pattern.quote(from),
            java.util.regex.Matcher.quoteReplacement(to))
        }
      mutated.foreach { msql =>
        val (_, ar) = canon(g.query(spark, dir))
        val (_, mr) = canon(spark.sql(msql))
        // a mutation that happens not to change the result on this
        // testdata (e.g. <= → < with no row on the boundary) is "not
        // applicable", not a failure — the real assertion is the
        // caught-count floor below, which survives data regeneration
        if (ar != mr) caught += 1
      }
    }
    assert(caught >= 3, s"only $caught mutations changed the result")
  }
}
