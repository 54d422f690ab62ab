package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** External-scan posture checks. The formats' VALUES are gated by the
  * oracle battery (q37/q38/q101); these specs pin the SCAN SHAPE — the
  * plan properties that matter at 100 TB and that a values-only check
  * can't see. */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  test("ORC scan: round trip lossless, filter pushed to the stripe reader, projection pruned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/t"
    val src = (1L to 1000L).map(i => (i, if (i % 3 == 0) "click" else "view", i * 0.5))
      .toDF("event_id", "event_type", "value")
    src.write.mode("overwrite").orc(dir)
    val back = ExternalSources.readOrc(spark, dir)
    assert(back.count() == 1000L)
    assert(back.agg(sum(col("event_id"))).head().getLong(0) ==
      src.agg(sum(col("event_id"))).head().getLong(0))
    // the 100 TB property: predicate and projection both reach the scan
    val q = back.filter(col("event_type") === "click").select("event_id")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.treeString
    assert(scan.contains("Format: ORC"), scan.take(400))
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(event_type,click)"),
      s"filter not pushed to the ORC reader:\n${scan.take(600)}")
    assert(!scan.contains("value"), // pruned column must not be read
      s"projection not pruned at the ORC scan:\n${scan.take(600)}")
    assert(q.count() == 333L)
  }

  test("XML scan: round trip lossless with a pinned schema (native Spark 4 source)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString + "/t"
    val src = (1L to 500L).map(i => (i, s"name<&>$i", i * 0.25)).toDF("id", "name", "v")
    src.coalesce(1).write.mode("overwrite").option("rowTag", "rec").format("xml").save(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = ExternalSources.readXml(spark, dir, rowTag = "rec", Some(schema))
    assert(back.schema == schema, s"pinned schema not honored: ${back.schema}")
    assert(back.count() == 500L)
    // XML-special characters must survive the escape/unescape round trip
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }

  test("pinned-schema scans never run an inference pass (JSON/CSV/ORC agree on types)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-ext").toString
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "k", "v")
    src.write.json(s"$base/j"); src.write.option("header", "true").csv(s"$base/c")
    src.write.orc(s"$base/o")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("k", StringType), StructField("v", DoubleType)))
    for (df <- Seq(ExternalSources.readJson(spark, s"$base/j", Some(schema)),
                   ExternalSources.readCsv(spark, s"$base/c", header = true, Some(schema)),
                   ExternalSources.readOrc(spark, s"$base/o", Some(schema)))) {
      assert(df.schema == schema, s"pinned schema not honored: ${df.schema}")
      assert(df.count() == 2L)
    }
  }
}
