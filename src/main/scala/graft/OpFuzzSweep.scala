package graft

/** Cross-engine sweep for the operator-PARAMETER fuzzer ([[OpFuzz]]):
  * dumps a seed range in Verify's format (parquet per seed +
  * oracle_sql.json) so `scripts/check_oracle.py` replays each generated
  * parameterization in DuckDB — the full differential over the custom
  * operator surface, beyond the committed battery seeds (one per
  * family).
  *
  *   sbt "runMain graft.OpFuzzSweep /root/testdata/sf0.01 /tmp/opfuzz 1 200"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/opfuzz
  */
object OpFuzzSweep {
  def main(args: Array[String]): Unit =
    FuzzSweepRunner.run("opfuzz", args, { seed =>
      val g = OpFuzz.generate(seed)
      (g.family, g.params, g.query, g.sql)
    })
}
