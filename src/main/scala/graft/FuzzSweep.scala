package graft

/** Cross-engine fuzz sweep: dumps an arbitrary seed range of
  * [[FuzzQueries]] plans in Verify's format (parquet per query +
  * oracle_sql.json) so `scripts/check_oracle.py` can replay every
  * generated SQL in DuckDB — the full differential, not just the six
  * committed battery seeds.
  *
  *   sbt "runMain graft.FuzzSweep /root/testdata/sf0.01 /tmp/fuzzsweep 1 40"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/fuzzsweep
  */
object FuzzSweep {
  def main(args: Array[String]): Unit =
    FuzzSweepRunner.run("fuzz", args, { seed =>
      val g = FuzzQueries.generate(seed)
      (g.shape, "", g.query, g.sql)
    })
}
