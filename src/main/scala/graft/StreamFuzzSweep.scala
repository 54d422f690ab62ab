package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Cross-engine sweep for the streaming fuzzer ([[StreamFuzz]]): each
  * seed runs the real Structured-Streaming machinery and the dump
  * replays the equivalent batch query in DuckDB via
  * `scripts/check_oracle.py`.
  *
  *   sbt "runMain graft.StreamFuzzSweep /root/testdata/sf0.01 /tmp/streamfuzz 1 30"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/streamfuzz
  */
object StreamFuzzSweep {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, fromS, toS) = args
    val (from, to) = (fromS.toLong, toS.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.SessionDefaults.ExtensionsKey,
        graft.core.SessionDefaults.ExtensionsClass)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val gens = (from to to).map(s => (f"streamfuzz_s$s%04d", StreamFuzz.generate(s)))
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    gens.foreach { case (name, g) =>
      System.err.println(s"[streamfuzz] running $name (${g.family} ${g.params})")
      try g.query(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures += name -> String.valueOf(e.getMessage).take(400)
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      gens.map { case (n, g) => s"${q(n)}: ${q(g.sql)}" }.mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (failures.nonEmpty)
      System.err.println(s"[streamfuzz] FAILED: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
