package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Shared driver for the fuzzer sweeps ([[OpFuzzSweep]],
  * [[StoreFuzzSweep]], [[StreamFuzzSweep]]): one session builder, one
  * dump loop, one JSON escaper — the three mains were verbatim copies
  * before. Each seed's generated query is materialized to
  * `<outDir>/<prefix>_sNNNN/` parquet and the oracle SQL collected into
  * `oracle_sql.json`, the exact layout `scripts/check_oracle.py`
  * replays in DuckDB. Failures land in `failures.json` instead of
  * aborting the range.
  */
object FuzzSweepRunner {

  /** Minimal JSON string escaper for the two sweep ledgers (no JSON
    * library in the unmanaged-Spark dependency set). */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def session(): SparkSession = {
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
    spark
  }

  /** args = Array(sfDir, outDir, fromSeed, toSeed); `generate` maps a
    * seed to (family, params, query, oracleSql). */
  def run(prefix: String, args: Array[String],
          generate: Long => (String, String, (SparkSession, String) => DataFrame, String)): Unit = {
    val Array(sfDir, outDir, fromS, toS) = args
    val (from, to) = (fromS.toLong, toS.toLong)
    val spark = session()
    new java.io.File(outDir).mkdirs()
    val gens = (from to to).map(s => (f"${prefix}_s$s%04d", generate(s)))
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    gens.foreach { case (name, (family, params, query, _)) =>
      System.err.println(s"[$prefix] running $name ($family $params)")
      try query(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures += name -> String.valueOf(e.getMessage).take(400)
      }
      // the result (or the failure) is durable: reclaim this seed's
      // scratch now instead of letting a 200-seed streaming sweep pile
      // every staged input + checkpoint in /tmp until JVM exit
      finally FuzzScratch.drain()
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      gens.map { case (n, (_, _, _, sql)) => s"${jsonStr(n)}: ${jsonStr(sql)}" }
        .mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
        .mkString("{", ",", "}"))
    if (failures.nonEmpty)
      System.err.println(s"[$prefix] FAILED: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
