package graft

/** Cross-engine sweep for the streaming fuzzer ([[StreamFuzz]]): each
  * seed runs the real Structured-Streaming machinery and the dump
  * replays the equivalent batch query in DuckDB via
  * `scripts/check_oracle.py`.
  *
  *   sbt "runMain graft.StreamFuzzSweep /root/testdata/sf0.01 /tmp/streamfuzz 1 200"
  *   python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/streamfuzz
  */
object StreamFuzzSweep {
  def main(args: Array[String]): Unit =
    FuzzSweepRunner.run("streamfuzz", args, { seed =>
      val g = StreamFuzz.generate(seed)
      (g.family, g.params, g.query, g.sql)
    })
}
