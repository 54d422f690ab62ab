package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiling/plan-audit harness (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.queryExecution.toRdd.count() // warm

    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val sh = docs.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 3).as("shingles"))
      .withColumn("n_sh", size(col("shingles")).cast("long"))
    t("shingle rows")(sh)
    val inv = sh.select(explode(col("shingles")).as("shingle"),
      struct(col("id"), col("n_sh")).as("doc"))
    t("inverted index")(inv)
    val grouped = inv.groupBy("shingle").agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, 1000))
      .withColumn("docs", array_sort(col("docs")))
    t("grouped shingles")(grouped)
    t("q49 full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3))
    t("q49 again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3))
    spark.stop()
  }
}
