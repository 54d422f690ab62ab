package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Chaos-receipt worker (forked by LocalClusterSpec): run star-contraction
  * connected components on a long path graph under `local-cluster` with a
  * RELIABLE checkpoint dir, so the spec can kill -9 one of the executor
  * JVMs mid-loop. The path shape forces ~log2(n) rounds, each a real
  * multi-JVM shuffle, and every round's edge set lives ONLY as a reliable
  * checkpoint on shared storage — exactly the production posture where
  * executor loss must cost a recompute, never the job.
  *
  * Prints one receipt line: `CC_DONE rounds=<r> total=<n+1> bad=<mislabeled>`
  * — the spec asserts bad=0 and total intact AFTER the kill.
  */
object ChaosCcWorker {
  def main(args: Array[String]): Unit = {
    val ckptDir = args(0)
    val n = if (args.length > 1) args(1).toLong else 50000L
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "none" runs the localCheckpoint fast path instead — the negative
    // control documenting WHY reliable mode exists (an executor kill
    // mid-loop is unrecoverable there; PLANS round-15 receipt)
    if (ckptDir != "none") spark.sparkContext.setCheckpointDir(ckptDir)
    val path = spark.range(0, n)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val comp = graft.operators.Dedup.connectedComponents(path)
    val bad = comp.filter(col("cluster") =!= 0L).count()
    val total = comp.count()
    println(s"CC_DONE rounds=${graft.operators.Dedup.ccRounds} total=$total bad=$bad")
    Console.flush()
    spark.stop()
  }
}
