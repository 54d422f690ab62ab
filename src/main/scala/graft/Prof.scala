package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit harness (not part of the library surface).
  * PROF_QUERIES=q01,... to print executed plans. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = sys.env.getOrElse("PROF_QUERIES", "q58_pivot").split(",")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.treeString.take(12000))
    }
    spark.stop()
  }
}
