package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.store.MergeStore
import scala.collection.immutable.ListMap
import scala.util.Random

/** Merge-STORE parameter fuzzer — [[OpFuzz]]'s sibling aimed at the
  * stateful surface: the on-disk merge stores whose read-time algebra
  * (latest-wins row_number, part-summing, binned quantiles, SCD2
  * intervals, tombstone erasure, compaction) is where a
  * parameter-dependent bug corrupts PERSISTED state rather than one
  * query's output. Each seed draws a family and a point in its real
  * parameter space (upsert slice modulus × upsert count × value delta,
  * part-split arity × bucket grain, quantile sets × bin scale, changelog
  * sampling, tombstone slice × compaction on/off), physically BUILDS the
  * store under /tmp, reads it back through the production read path, and
  * emits the DuckDB SQL replaying the logical parts (the parameterized
  * generators in [[OracleSql]]).
  *
  * What the differential proves, per family:
  *  - latest/compact: merge-on-read == logical row_number replay at any
  *    (mod, parts, delta) — and compaction changes NOTHING observable
  *    (the oracle has no compaction step, deliberately).
  *  - summing: any disjoint part split merges back to the from-scratch
  *    aggregate (the oracle is split-independent, deliberately).
  *  - quantile: binned percentiles at any (quantile set, scale) match
  *    the rank-exact integer-micro replay across any part split.
  *  - scd2: interval building at any changelog sampling.
  *  - tombstone: erasure survives upserts and mid-path compaction —
  *    a resurrected row hash-mismatches.
  *
  * Verification levels mirror [[OpFuzz]]: StoreFuzzSpec (in-process
  * invariants + mutation sensitivity + determinism), six FIXED seeds in
  * the battery as q230–q235, and [[StoreFuzzSweep]] for arbitrary seed
  * ranges through the DuckDB gate.
  */
object StoreFuzz {
  type Q = (SparkSession, String) => DataFrame

  /** Same contract as [[OpFuzz.Generated]]: `mutated` nudges ONE
    * parameter and must change the output for battery seeds. */
  final case class Generated(family: String, params: String, query: Q, sql: String,
                             mutated: Q)

  private def events(s: SparkSession, dir: String): DataFrame =
    Queries.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))

  private def pick[A](r: Random, xs: Vector[A]): A = xs(r.nextInt(xs.size))

  /** Fresh store dir per INVOCATION ([[FuzzScratch]]): unique paths, so
    * the query is re-runnable (Verify, the spec and the sweep all
    * invoke it repeatedly) and two concurrent same-family runs in one
    * JVM can never delete each other's parts. */
  private def storePath(family: String, d: String): String =
    FuzzScratch.fresh(s"storefuzz_$family").toString

  /** Base + upsert parts shared by latest/compact/tombstone: part k
    * re-emits the `user_id % mod = (k-1) % mod` slice at version k+1
    * with value + delta*k. `withDeleted` adds the tombstone flag
    * column (false on every non-tombstone part). */
  private def buildUpsertParts(s: SparkSession, d: String, path: String,
                               mod: Int, nUpserts: Int, delta: Int,
                               withDeleted: Boolean): Unit = {
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value").cast(DecimalType(18, 2)).as("value"))
    def shaped(df: DataFrame, version: Long): DataFrame = {
      val base = df.select(col("event_id"), col("event_type"), col("value"))
      (if (withDeleted) base.withColumn("deleted", lit(false)) else base)
        .withColumn("version", lit(version))
    }
    MergeStore.appendPart(shaped(ev, 1L), path)
    (1 to nUpserts).foreach { k =>
      MergeStore.appendPart(shaped(
        ev.filter(col("user_id") % mod === (k - 1) % mod)
          .withColumn("value",
            (col("value") + lit(delta * k)).cast(DecimalType(18, 2))),
        k + 1L), path)
    }
  }

  private def readLatestAgg(s: SparkSession, path: String,
                            aliveOnly: Boolean): DataFrame = {
    val merged = MergeStore.readLatest(s, path, Seq("event_id"), "version")
    (if (aliveOnly) merged.filter(!col("deleted")) else merged)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("version")).cast("long").as("version_sum"),
        sum(col("value")).cast("double").as("value_sum"))
      .orderBy("event_type")
  }

  private val modCycle = Map(3 -> 5, 5 -> 10, 10 -> 3)

  private def latestGen(r: Random): Generated = {
    val mod = pick(r, Vector(3, 5, 10))
    val p = pick(r, Vector(1, 2, 3))
    val delta = pick(r, Vector(7, 100))
    def run(m: Int): Q = (s, d) => {
      val path = storePath("latest", d)
      buildUpsertParts(s, d, path, m, p, delta, withDeleted = false)
      readLatestAgg(s, path, aliveOnly = false)
    }
    // mutation moves the upsert slice (different rows win at v>1)
    Generated("latest", s"upsertMod=$mod nUpserts=$p delta=$delta",
      run(mod),
      OracleSql.latestStoreSql(mod, p, delta, tomb = None),
      run(modCycle(mod)))
  }

  /** Same draw as [[latestGen]] plus a compactLatest before the read —
    * the oracle is latest's: compaction at fuzzed parameters must be
    * observably invisible. */
  private def compactGen(r: Random): Generated = {
    val mod = pick(r, Vector(3, 5, 10))
    val p = pick(r, Vector(1, 2, 3))
    val delta = pick(r, Vector(7, 100))
    def run(m: Int): Q = (s, d) => {
      val path = storePath("compact", d)
      buildUpsertParts(s, d, path, m, p, delta, withDeleted = false)
      MergeStore.compactLatest(s, path, Seq("event_id"), "version")
      readLatestAgg(s, path, aliveOnly = false)
    }
    Generated("compact", s"upsertMod=$mod nUpserts=$p delta=$delta",
      run(mod),
      OracleSql.latestStoreSql(mod, p, delta, tomb = None),
      run(modCycle(mod)))
  }

  private def tombstoneGen(r: Random): Generated = {
    val mod = pick(r, Vector(5, 10))
    val p = pick(r, Vector(1, 2))
    val delta = pick(r, Vector(7, 100))
    val tm = pick(r, Vector(3, 7, 13))
    val tr = r.nextInt(tm)
    val compact = r.nextBoolean()
    def run(tmod: Int): Q = (s, d) => {
      val path = storePath("tombstone", d)
      buildUpsertParts(s, d, path, mod, p, delta, withDeleted = true)
      MergeStore.appendPart(
        events(s, d).filter(col("user_id") % tmod === tr)
          .select(col("event_id"), col("event_type"),
            lit(null).cast(DecimalType(18, 2)).as("value"),
            lit(true).as("deleted"), lit(p + 2L).as("version")), path)
      if (compact) MergeStore.compactLatest(s, path, Seq("event_id"), "version")
      readLatestAgg(s, path, aliveOnly = true)
    }
    // mutation moves the tombstone slice — different rows get erased
    Generated("tombstone",
      s"upsertMod=$mod nUpserts=$p delta=$delta tombMod=$tm tombRem=$tr compact=$compact",
      run(tm),
      OracleSql.latestStoreSql(mod, p, delta, tomb = Some((tm, tr))),
      run(Map(3 -> 7, 7 -> 13, 13 -> 3)(tm)))
  }

  private def summingGen(r: Random): Generated = {
    val nParts = pick(r, Vector(2, 3, 4))
    val unit = pick(r, Vector("day", "hour"))
    def run(u: String): Q = (s, d) => {
      val path = storePath("summing", d)
      val ev = events(s, d).select(
        date_trunc(u, col("ts")).as("day"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("value"), col("event_id"))
      (0 until nParts).foreach { i =>
        MergeStore.appendPart(
          ev.filter(col("event_id") % nParts === i).groupBy("day", "event_type")
            .agg(count(lit(1)).as("n"), sum(col("value")).as("total")), path)
      }
      MergeStore.readSummed(s, path, Seq("day", "event_type"), Seq("n", "total"))
        .select(col("day"), col("event_type"), col("n").cast("long").as("n"),
          col("total").cast("double").as("total"))
        .orderBy("day", "event_type")
    }
    // the oracle is split-independent BY DESIGN (any disjoint split
    // must merge to the from-scratch aggregate), so sensitivity comes
    // from the bucket grain
    Generated("summing", s"nParts=$nParts unit=$unit",
      run(unit),
      OracleSql.summingStoreSql(unit),
      run(if (unit == "day") "hour" else "day"))
  }

  private val qSpace = Vector(0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)

  private def quantileGen(r: Random): Generated = {
    val qs = r.shuffle(qSpace).take(2 + r.nextInt(3)).sorted
    val splitMod = pick(r, Vector(2, 3))
    val scale = pick(r, Vector(10, 100))
    def run(sc: Int): Q = (s, d) => {
      val path = storePath("quantile", d)
      val ev = events(s, d).select(col("event_id"), col("event_type"), col("value"))
      (0 until splitMod).foreach { i =>
        MergeStore.writeQuantilePart(
          ev.filter(col("event_id") % splitMod === i).drop("event_id"),
          Seq("event_type"), "value", path, scale = sc)
      }
      MergeStore.readQuantiles(s, path, Seq("event_type"), qs, scale = sc)
        .orderBy("event_type")
    }
    // mutation changes the bin width — every percentile shifts to the
    // other quantization grid
    Generated("quantile",
      s"qs=${qs.mkString(",")} splitMod=$splitMod scale=$scale",
      run(scale),
      OracleSql.quantileStoreSql(qs, scale),
      run(if (scale == 10) 100 else 10))
  }

  private def scd2Gen(r: Random): Generated = {
    val mod = pick(r, Vector(11, 23, 37))
    def run(m: Int): Q = (s, d) =>
      MergeStore.scd2(
          events(s, d).filter(col("event_id") % m === 0)
            .select("user_id", "ts", "event_id", "event_type"),
          Seq("user_id"), "ts", "event_id")
        .select(col("user_id"), col("event_id").as("change_id"),
          col("event_type"), col("valid_from"), col("valid_to"),
          col("is_current"))
        .orderBy("user_id", "valid_from", "change_id")
    Generated("scd2", s"sampleMod=$mod",
      run(mod),
      OracleSql.scd2Sql(mod),
      run(Map(11 -> 23, 23 -> 37, 37 -> 11)(mod)))
  }

  private val families: Vector[Random => Generated] = Vector(
    latestGen, summingGen, compactGen, quantileGen, scd2Gen, tombstoneGen)

  /** Same splitmix64 pre-scramble as [[OpFuzz.generate]] — sequential
    * java.util.Random seeds draw near-identical first values. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic: same seed, same (store build, SQL) pair. */
  def generate(seed: Long): Generated = {
    val r = new Random(mix64(seed))
    families(r.nextInt(families.size))(r)
  }

  /** Battery seeds — six rows, one per family, each scanned to be both
    * non-empty and mutation-sensitive at sf0.001 (the OpFuzz battery
    * discipline). */
  private[graft] val batterySeeds: Vector[(String, Long)] = Vector(
    ("q230_storefuzz_latest", 2L),
    ("q231_storefuzz_summing", 7L),
    ("q232_storefuzz_compact", 5L),
    ("q233_storefuzz_quantile", 11L),
    ("q234_storefuzz_scd2", 1L),
    ("q235_storefuzz_tombstone", 3L))

  private[graft] def expectedFamily(name: String): String =
    name.substring("q2NN_storefuzz_".length)

  val queries: Map[String, Q] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).query
  }: _*)

  val oracles: Map[String, String] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).sql
  }: _*)
}
