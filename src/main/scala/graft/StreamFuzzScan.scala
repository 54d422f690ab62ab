package graft

import org.apache.spark.sql.DataFrame

/** Battery-seed scanner for [[StreamFuzz]]: prints, for a seed range,
  * each seed's family, row count at the given sf dir, and whether the
  * mutated twin produces a different output — the two conditions a
  * battery seed must satisfy (non-empty + mutation-sensitive). Run
  * whenever the family grammar changes (adding a family re-maps every
  * seed's `nextInt(families.size)` draw):
  *
  *   sbt "runMain graft.StreamFuzzScan /root/testdata/sf0.001 1 40"
  */
object StreamFuzzScan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, fromS, toS) = args
    val spark = FuzzSweepRunner.session()
    def canon(df: DataFrame): Vector[String] =
      df.collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString("|")).toVector.sorted
    (fromS.toLong to toS.toLong).foreach { seed =>
      val g = StreamFuzz.generate(seed)
      try {
        val out = canon(g.query(spark, sfDir))
        val mut = canon(g.mutated(spark, sfDir))
        println(s"seed=$seed family=${g.family} rows=${out.size} " +
          s"sensitive=${out != mut} params[${g.params}]")
      } catch {
        case e: Throwable =>
          println(s"seed=$seed family=${g.family} ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
