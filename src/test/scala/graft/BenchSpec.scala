package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench wall-outlier predicate — the artifact pipeline
  * shipped polluted totals in three of four tracked rounds (r12, r14)
  * before the flagger existed. Any >2x wall inflation vs the committed
  * prior triggers ONE re-measure recorded ALONGSIDE the tracked wall
  * (never replacing it): r16 measured hypervisor steal inflating
  * thread-CPU together with wall (q95 cpu 0.34 s -> 12.5 s, identical
  * code/data), so the original cpu-flat precondition was dropped — it
  * made the flagger blind to the exact pollution it exists for, and
  * a real regression simply reproduces in the re-run. */
class BenchSpec extends AnyFunSuite {
  private def flag(wall: Double, cpuMs: Double,
                   pw: Option[Double], pc: Option[Double]) =
    Bench.isContentionOutlier(wall, cpuMs, pw, pc)

  test("wall >2x prior with flat cpu is flagged") {
    assert(flag(wall = 10.0, cpuMs = 5000, pw = Some(4.0), pc = Some(5100)))
  }

  test("wall >2x prior with cpu moving too is STILL flagged (steal inflates cpu)") {
    // 4s -> 10s wall with cpu 5.1s -> 13s: either a plan regression or
    // hypervisor steal — indistinguishable from counters alone (r16:
    // q95 cpu 37x'd between idle runs of identical code). The re-run
    // is appended, never substituted, so both readings survive: a real
    // regression reproduces, contention doesn't.
    assert(flag(wall = 10.0, cpuMs = 13000, pw = Some(4.0), pc = Some(5100)))
  }

  test("wall inflation under 2x is never flagged") {
    assert(!flag(wall = 7.9, cpuMs = 5000, pw = Some(4.0), pc = Some(5100)))
  }

  test("sub-second walls are noise regardless of ratio") {
    assert(!flag(wall = 0.9, cpuMs = 10, pw = Some(0.1), pc = Some(10)))
  }

  test("no prior wall (first round / renamed query) disables the flag") {
    assert(!flag(wall = 10.0, cpuMs = 5000, pw = None, pc = Some(5100)))
    assert(!flag(wall = 10.0, cpuMs = 5000, pw = Some(0.0), pc = Some(5100)))
  }

  test("cpu priors are informational: neither missing nor zero prior cpu blocks the flag") {
    assert(flag(wall = 10.0, cpuMs = 5000, pw = Some(4.0), pc = None))
    assert(flag(wall = 10.0, cpuMs = 5000, pw = Some(4.0), pc = Some(0.0)))
  }

  test("subset runs never default onto the full-battery priors file") {
    // the priors file is load-bearing for the flagger: a SPARK_GRAFT_ONLY
    // isolation run defaulting onto it erases every other query's priors
    assert(Bench.defaultBenchOut(subset = true) == "BENCH_SUBSET_latest.json")
    assert(Bench.defaultBenchOut(subset = false) == "BENCH_FULL_latest.json")
  }

  test("compact final stdout line fits the driver's 2000-char tail window and parses") {
    // the driver records the LAST 2000 chars of stdout and parses JSON
    // lines out of it; BENCH_r17–r21 all have parsed=null because the
    // full record line is ~15 KB. The compact summary must fit the
    // window TOGETHER with sbt's trailing "[success] ..." line (~85
    // chars) at the full 243-query battery size, pessimistic values.
    val walls = (1 to 243).map(_ => "117.2").mkString(
      "\"walls_q01_to_q243\":[", ",", "]")
    val failed = "[\"q49\",\"q86\"]"
    val reruns = (1 to 10).map(i => s""""q$i":117.2""").mkString("{", ",", "}")
    val calib = """"calib_ms_before":33.9,"calib_ms_after":61.6,"value_calib":941.2"""
    val line = Bench.compactSummary(walls, failed, 3, reruns, calib,
      "/root/testdata/sf0.1", 449.2923282370001)
    assert(line.length <= 1900, s"compact line ${line.length} chars > 1900 budget")
    assert(!line.contains("\n"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("unit").asText() == "sec")
    assert(math.abs(root.get("value").asDouble() - 449.2923282370001) < 1e-9)
    assert(root.get("walls_q01_to_q243").size() == 243)
    assert(root.get("sf").asText() == "/root/testdata/sf0.1")
  }

  test("CPU calibration probe: fixed work, positive, repeatable within a loose band") {
    // the probe is the bench's host-speed self-adjudication (uniform
    // wall inflation moves the probe and the battery together); the pin
    // is deliberately loose — scheduling noise must not flake the suite,
    // only a broken probe (elided loop ~0 ms, or wildly unstable)
    val a = Bench.calibrateMedianMs()
    val b = Bench.calibrateMedianMs()
    assert(a > 1.0 && b > 1.0, s"probe too fast to be real work: $a ms / $b ms")
    assert(a < 10000 && b < 10000, s"probe absurdly slow: $a ms / $b ms")
    assert(math.max(a, b) / math.min(a, b) < 5.0,
      s"probe unstable across back-to-back medians: $a ms vs $b ms")
  }

}
