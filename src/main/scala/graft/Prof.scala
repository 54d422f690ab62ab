package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, TextAnalysis}

/** Scratch profiling harness (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    t("tokens")(docs.select(TextAnalysis.tokens(col("text")).as("t")).selectExpr("sum(size(t))").count())
    t("shingles")(docs.select(Dedup.shingleHashes(col("text"), 3).as("s")).selectExpr("sum(size(s))").count())
    val sigs = docs.select(col("doc_id").as("id"),
      TextFunctions.minhash_signature(Dedup.shingleHashes(col("text"), 3), 32).as("sig"))
    t("minhash sigs")(sigs.count())
    t("minhash sigs again")(sigs.count())
    t("q46 full")(Dedup.minHashCandidates(docs, "doc_id", "text").count())
    t("q46 again")(Dedup.minHashCandidates(docs, "doc_id", "text").count())

    val sh = docs.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 3).as("shingles"))
    t("q49 shingle explode")(sh.select(explode(col("shingles"))).count())
    t("q49 full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    t("q49 again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
