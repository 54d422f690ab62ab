package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** Scratch A/B for the lexical-index store part count (VERDICT r21
  * item 4): times writeLexicalIndex + bm25TopKIndexed round trips at
  * nParts ∈ {1, 4, 16, 64} in one session, warm, 3 reps each. Results
  * recorded in OPTIMIZATION_r22.md. */
object ProfLex {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    for (n <- Seq(1, 4, 16, 64); rep <- 1 to 3) {
      val path = s"/tmp/graft_proflex_${ProcessHandle.current().pid()}_${n}_$rep"
      val t0 = System.nanoTime()
      SimilaritySearch.writeLexicalIndex(docs, "doc_id", "text", path, nParts = n)
      val t1 = System.nanoTime()
      val out = SimilaritySearch.bm25TopKIndexed(spark, path,
          Seq("hash", "join", "dup", "scan"), k = 20)
        .select(col("id").as("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
      out.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[prof] nParts=$n%3d rep$rep build ${(t1 - t0) / 1e9}%6.2f s  probe ${(t2 - t1) / 1e9}%6.2f s  total ${(t2 - t0) / 1e9}%6.2f s")
      rm(new java.io.File(path))
    }
    spark.stop()
  }
}
