package graft

/** Cross-engine sweep for the merge-store fuzzer ([[StoreFuzz]]) —
  * [[OpFuzzSweep]]'s sibling: each seed physically builds its store
  * under /tmp, reads it back through the production read path, and the
  * dump replays in DuckDB via `scripts/check_oracle.py`.
  *
  *   sbt "runMain graft.StoreFuzzSweep /root/testdata/sf0.01 /tmp/storefuzz 1 100"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/storefuzz
  */
object StoreFuzzSweep {
  def main(args: Array[String]): Unit =
    FuzzSweepRunner.run("storefuzz", args, { seed =>
      val g = StoreFuzz.generate(seed)
      (g.family, g.params, g.query, g.sql)
    })
}
