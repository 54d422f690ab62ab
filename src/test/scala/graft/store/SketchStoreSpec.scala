package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SketchStore contracts: the store's estimates must be EXACTLY what a
  * single from-scratch sketch over the same rows would say (HLL union
  * is a register-wise max — partitioning the input cannot move the
  * estimate), close to exact counts within the lgK error budget, and
  * idempotent under re-appends of the same batch. */
class SketchStoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  test("merged parts == one global sketch exactly; near exact counts; append idempotent") {
    import spark.implicits._
    // 3 groups x 5 parts; user ids overlap across parts (the case where
    // naive per-part count sums would overcount)
    val df = (0 until 30000).map { i =>
      (s"day${i % 5}", s"g${i % 3}", (i * 37) % 2000L)
    }.toDF("day", "g", "user")
    val path = java.nio.file.Files.createTempDirectory("graft-sketch").toString + "/s"
    SketchStore.writeDistinctSketches(df, Seq("g"), "user", path, col("day"))

    def estimates(parts: Seq[String] = Nil): Map[String, Long] =
      SketchStore.estimateDistinct(spark, path, Seq("g"), parts)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = estimates()

    // the from-scratch single sketch over the same rows
    val global = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user"), lit(12))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == global,
      s"union of per-part sketches diverged from the global sketch: $merged vs $global")

    // within the lgK=12 error budget of exact (~1.6% rsd; allow 5%)
    val exact = df.groupBy("g").agg(countDistinct(col("user")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (g, est) =>
      assert(math.abs(est - exact(g)).toDouble / exact(g) < 0.05,
        s"estimate for $g off: $est vs exact ${exact(g)}")
    }

    // re-appending the same batch must not move any estimate
    SketchStore.writeDistinctSketches(df, Seq("g"), "user", path, col("day"))
    assert(estimates() == merged, "append of identical sketches moved an estimate")

    // part pruning: one part's estimate == a direct sketch of that slice
    val day0 = df.filter(col("day") === "day0").groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user"), lit(12))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estimates(Seq("day0")) == day0)
  }

  test("theta store: exact-regime overlap report, part pruning, re-append idempotent") {
    import spark.implicits._
    // groups A and B over 2 day-parts; distinct ids well under 2^12 so
    // every estimate — incl. the set ops — must be the EXACT count.
    // A = ids 1..600 (300 per day), B = multiples of 3 in 1..900
    val rows =
      (1L to 600L).map(i => (s"day${(i % 2)}", "A", i)) ++
      (1L to 900L).filter(_ % 3 == 0).map(i => (s"day${(i % 2)}", "B", i))
    val df = rows.toDF("day", "seg", "user")
    val path = java.nio.file.Files.createTempDirectory("graft-theta").toString + "/s"
    SketchStore.writeThetaSketches(df, Seq("seg"), "user", path, col("day"))

    def overlap(parts: Seq[String] = Nil): Seq[Long] =
      SketchStore.estimateOverlap(spark, path, "seg", "A", "B", parts)
        .collect().map(r => (0 until 5).map(i => math.round(r.getDouble(i)))).head
    // |A|=600, |B|=300, |A∩B|=200 (multiples of 3 ≤ 600), |A\B|=400,
    // |A∪B|=700 (B has 100 ids in 601..900 outside A)
    assert(overlap() == Seq(600L, 300L, 200L, 400L, 700L), s"got ${overlap()}")

    // re-append: theta union is a hash-set union — nothing moves
    SketchStore.writeThetaSketches(df, Seq("seg"), "user", path, col("day"))
    assert(overlap() == Seq(600L, 300L, 200L, 400L, 700L), "re-append moved an estimate")

    // part pruning: day0 = even ids only -> A 300, B = even multiples
    // of 3 (mult of 6 ≤ 900: 150), A∩B = mult of 6 ≤ 600: 100
    assert(overlap(Seq("day0")) == Seq(300L, 150L, 100L, 200L, 350L),
      s"pruned overlap wrong: ${overlap(Seq("day0"))}")

    // an ABSENT segment (typo, or filtered out by the part probe) is an
    // empty audience, not an empty report: exactly one row, zeros on
    // the missing side, the present side's counts intact
    def report(a: String, b: String, parts: Seq[String] = Nil) =
      SketchStore.estimateOverlap(spark, path, "seg", a, b, parts).collect()
    val typo = report("A", "Z")
    assert(typo.length == 1, s"absent segment must still yield one row, got ${typo.length}")
    assert((0 until 5).map(i => math.round(typo.head.getDouble(i))) ==
      Seq(600L, 0L, 0L, 600L, 600L), s"got ${typo.head}")
    val bothGone = report("Y", "Z")
    assert(bothGone.length == 1 &&
      (0 until 5).forall(i => bothGone.head.getDouble(i) == 0.0),
      "two absent segments must yield one all-zero row")
  }
}
