package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention-outlier predicate — the artifact pipeline
  * shipped polluted totals in three of four tracked rounds (r12, r14)
  * before the flagger existed, so its boundary behavior is worth a
  * spec: flag contention (wall up, cpu flat), NEVER flag real
  * regressions (cpu moves with wall — those must stay visible in the
  * tracked artifact, not be laundered by a calmer re-run). */
class BenchSpec extends AnyFunSuite {
  private def flag(wall: Double, cpuMs: Double,
                   pw: Option[Double], pc: Option[Double]) =
    Bench.isContentionOutlier(wall, cpuMs, pw, pc)

  test("wall >2x prior with flat cpu is flagged") {
    assert(flag(wall = 10.0, cpuMs = 5000, pw = Some(4.0), pc = Some(5100)))
  }

  test("a real regression — cpu moving with wall — is NOT flagged") {
    // 4s -> 10s wall with cpu 5.1s -> 13s: the plan got worse; the
    // tracked artifact must carry it, not re-measure it away
    assert(!flag(wall = 10.0, cpuMs = 13000, pw = Some(4.0), pc = Some(5100)))
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

  test("missing prior cpu cannot vouch for flatness but does not block the flag") {
    assert(flag(wall = 10.0, cpuMs = 5000, pw = Some(4.0), pc = None))
  }

  test("subset runs never default onto the full-battery priors file") {
    // the priors file is load-bearing for the flagger: a SPARK_GRAFT_ONLY
    // isolation run defaulting onto it erases every other query's priors
    assert(Bench.defaultBenchOut(subset = true) == "BENCH_SUBSET_latest.json")
    assert(Bench.defaultBenchOut(subset = false) == "BENCH_FULL_latest.json")
  }

  test("zero prior cpu (streaming rows report none) flags only genuinely idle cpu") {
    // max(pc, 1) floor: cpu <= 1.5ms passes, anything real fails
    assert(flag(wall = 10.0, cpuMs = 1.0, pw = Some(4.0), pc = Some(0.0)))
    assert(!flag(wall = 10.0, cpuMs = 5000, pw = Some(4.0), pc = Some(0.0)))
  }
}
