package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join contract: two tables bucketed on the join
  * key with equal bucket counts join with ZERO exchanges (and, sorted,
  * zero extra sorts on the streamed side) — the recurring-join layout
  * whose network cost is paid once at write. */
class BucketedSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  test("bucketed x bucketed join plans with no exchange; values match the plain join") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val fact = (1L to 5000L).map(i => (i % 97L, i)).toDF("uid", "amount")
    val dim = (0L until 97L).map(k => (k, s"seg${k % 5}")).toDF("uid", "segment")
    Bucketed.writeBucketed(fact, "bspec_fact", s"$base/fact", Seq("uid"), 8)
    Bucketed.writeBucketed(dim, "bspec_dim", s"$base/dim", Seq("uid"), 8)

    val prior = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.readBucketed(spark, "bspec_fact")
        .join(Bucketed.readBucketed(spark, "bspec_dim"), "uid")
      val agg = joined.groupBy("segment").agg(sum(col("amount")).as("total"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free:\n${plan.take(1500)}")

      val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = fact.join(dim, "uid").groupBy("segment")
        .agg(sum(col("amount")).as("total"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS bspec_fact")
      spark.sql("DROP TABLE IF EXISTS bspec_dim")
    }
  }
}
