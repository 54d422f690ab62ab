package graft.operators

import graft.operators.Expectations._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ExpectationsSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  private def report(df: org.apache.spark.sql.DataFrame, rules: Seq[Rule]) =
    Expectations.check(df, rules).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq

  test("hand-computed violations per rule family, null semantics included") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(10.0), Some("ok")),
      (Some(2L), Some(99.0), Some("ok")),   // out of range
      (None,     Some(5.0),  Some("bad!")), // null id + regex violation
      (Some(2L), None,       None),         // duplicate id; nulls NOT range/regex violations
      (Some(2L), Some(-1.0), Some("ok")))   // duplicate id + out of range
      .toDF("id", "v", "s")
    val dim = Seq(1L, 2L).toDF("id")
    val got = report(df, Seq(
      NotNull("id"),
      InRange("v", 0, 50),
      Matches("s", "^[a-z]+$"),
      Satisfies("v_below_20", col("v") < 20),
      Unique(Seq("id")),
      ForeignKey("id", dim, "id")))
    assert(got == Seq(
      ("not_null:id", 1L, false),
      ("in_range:v", 2L, false),
      ("matches:s", 1L, false),
      // v<20 fails for 99.0 and for the NULL row (a predicate that
      // can't be shown true is a violation)
      ("satisfies:v_below_20", 2L, false),
      ("unique:id", 2L, false), // id=2 three times -> 2 excess rows
      ("foreign_key:id", 0L, true)))
  }

  test("clean table passes everything; report preserves rule order") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 7.0)).toDF("id", "v")
    val got = report(df, Seq(
      Unique(Seq("id")), NotNull("v"), InRange("v", 0, 10)))
    assert(got == Seq(
      ("unique:id", 0L, true),
      ("not_null:v", 0L, true),
      ("in_range:v", 0L, true)))
  }

  test("unique counts null keys as values — two all-null keys are duplicates") {
    import spark.implicits._
    val df = Seq(Option.empty[Long], None, Some(1L)).toDF("id")
    assert(report(df, Seq(Unique(Seq("id")))) == Seq(("unique:id", 1L, false)))
  }

  test("row-local rules fuse into one scan of the input") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_expect").toString
    (1L to 100L).map(i => (i, i * 2.0, s"s$i")).toDF("id", "v", "s")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val rep = Expectations.check(df, Seq(
      NotNull("id"), InRange("v", 0, 1000), Matches("s", "^s"),
      Satisfies("pos", col("v") > 0)))
    // AQE hides the physical plan behind an adaptive node; the
    // optimized LOGICAL plan's leaves are the honest scan count
    val leaves = rep.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"expected one scan for 4 row-local rules, got:\n$leaves")
    assert(rep.collect().forall(_.getBoolean(2)))
  }

  test("duplicate rule names are rejected before any job runs") {
    import spark.implicits._
    val df = Seq((1L, 5.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(NotNull("id"), InRange("v", 0, 1),
        NotNull("id")))
    }
    assert(e.getMessage.contains("not_null:id"))
  }

  test("empty input: counts are zero, not null") {
    import spark.implicits._
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    val got = report(df, Seq(NotNull("id"), Unique(Seq("id")),
      InRange("v", 0, 1)))
    assert(got.forall { case (_, v, p) => v == 0L && p })
  }
}
