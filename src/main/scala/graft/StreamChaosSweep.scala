package graft

import java.nio.file.{Files, Paths}

/** Kill -9 restart chaos at FUZZED parameter points, through the DuckDB
  * gate: for each seed, [[StreamChaos.runPoint]] stages the seed's
  * inputs, kills a worker JVM the moment its first durable output
  * lands, resumes in a second JVM, and the driver dumps the converged
  * result in Verify's layout so `scripts/check_oracle.py` replays the
  * seed's batch oracle in DuckDB — a hash match proves the crash cost
  * nothing and doubled nothing, at that seed's gap/window/join/key/
  * epoch-split parameters.
  *
  *   sbt "runMain graft.StreamChaosSweep /root/testdata/sf0.01 /tmp/streamchaos 1 12"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/streamchaos
  *
  * Also prints one receipt JSON line (seeds, families, kill/resume
  * flags) for the PLANS ledger.
  */
object StreamChaosSweep {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, fromS, toS) = args
    val spark = FuzzSweepRunner.session()
    new java.io.File(outDir).mkdirs()
    import FuzzSweepRunner.jsonStr
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = (fromS.toLong to toS.toLong).map { seed =>
      val name = f"streamchaos_s$seed%04d"
      // staging/checkpoints live BESIDE the dump dir: check_oracle.py
      // iterates every subdir of outDir as a result set
      val base = new java.io.File(outDir + "_work", name)
      System.err.println(s"[streamchaos] running $name")
      val (plan, res) = StreamChaos.runPoint(spark, sfDir, seed, base)
      System.err.println(s"[streamchaos] $name family=${res.family} " +
        s"killed=${res.killedMidFlight} timed_out=${res.timedOut} " +
        s"resumed=${res.resumedClean}")
      // a failed read writes no result dir, and check_oracle.py only
      // iterates existing subdirs — without a failures.json entry +
      // nonzero exit the seed would silently drop out of the DuckDB
      // gate and the sweep could read as fully green (ADVICE r19)
      try plan.read(spark, base).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[streamchaos] $name READ FAILED: ${e.getMessage}")
        failures += name -> String.valueOf(e.getMessage).take(400)
      }
      (name, plan.sql, res)
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      results.map { case (n, sql, _) => s"${jsonStr(n)}: ${jsonStr(sql)}" }
        .mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
        .mkString("{", ",", "}"))
    val receipt = results.map { case (n, _, r) =>
      s"""{"seed":${r.seed},"name":${jsonStr(n)},"family":${jsonStr(r.family)},""" +
        s""""params":${jsonStr(r.params)},"killed_mid_flight":${r.killedMidFlight},""" +
        s""""timed_out":${r.timedOut},"resumed_clean":${r.resumedClean}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stream_chaos","points":${results.size},""" +
      s""""killed":${results.count(_._3.killedMidFlight)},""" +
      s""""timed_out":${results.count(_._3.timedOut)},""" +
      s""""resumed_clean":${results.count(_._3.resumedClean)},""" +
      s""""read_failures":${failures.size},"points_detail":$receipt}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[streamchaos] ${failures.size} reads FAILED: " +
        failures.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
