package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property checks on the merge-store fuzzer ([[StoreFuzz]]) — the
  * OpFuzzSpec discipline over the stateful surface. The cross-engine
  * half runs in the driver's gate via q230–q235 and in bulk via
  * StoreFuzzSweep; pinned in-process here: determinism, battery family
  * coverage, per-family CONSERVATION LAWS at arbitrary seeds (a latest
  * store never loses or duplicates a key; tombstones erase exactly
  * their slice; summed parts carry the whole stream; quantiles are
  * monotone in q; SCD2 intervals tile each key's history), and
  * parameter-mutation sensitivity. */
class StoreFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.session()

  private val dir = "/root/testdata/sf0.001"


  private def canon(df: DataFrame): Vector[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
      .mkString("|")).toVector.sorted

  private def param(g: StoreFuzz.Generated, key: String): String =
    g.params.split(' ').find(_.startsWith(key + "="))
      .getOrElse(fail(s"param $key missing from '${g.params}'"))
      .stripPrefix(key + "=")

  private lazy val eventsDf: DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  private lazy val eventCount: Long = eventsDf.count()

  test("generation is deterministic: same seed, same family, params, SQL") {
    (1L to 12L).foreach { seed =>
      val (a, b) = (StoreFuzz.generate(seed), StoreFuzz.generate(seed))
      assert(a.family == b.family && a.params == b.params && a.sql == b.sql)
    }
  }

  test("battery seeds produce their named families, each with rows at sf0.001") {
    StoreFuzz.batterySeeds.foreach { case (name, seed) =>
      val g = StoreFuzz.generate(seed)
      assert(g.family == StoreFuzz.expectedFamily(name),
        s"$name (seed $seed) generated family ${g.family}")
      assert(g.query(spark, dir).count() > 0, s"$name (${g.params}) is empty at sf0.001")
    }
  }

  test("family conservation laws hold for seeds 1-18") {
    (1L to 18L).foreach { seed =>
      val g = StoreFuzz.generate(seed)
      val out = g.query(spark, dir)
      val rows = out.collect()
      g.family match {
        case "latest" | "compact" =>
          // merge-on-read neither loses nor duplicates a key: per-type
          // survivor counts sum to the event count (event_id is unique),
          // and every survivor's version is in [1, nUpserts+1]
          val p = param(g, "nUpserts").toInt
          assert(rows.map(_.getLong(1)).sum == eventCount,
            s"seed=$seed ${g.family}: ${rows.map(_.getLong(1)).sum} != $eventCount")
          rows.foreach { r =>
            val (n, vsum) = (r.getLong(1), r.getLong(2))
            assert(vsum >= n && vsum <= n * (p + 1L),
              s"seed=$seed ${g.family}: version_sum $vsum outside [$n, ${n * (p + 1)}]")
          }
        case "tombstone" =>
          // erasure is exact: survivors are exactly the events OUTSIDE
          // the tombstoned user slice
          val tm = param(g, "tombMod").toInt
          val tr = param(g, "tombRem").toInt
          val alive = eventsDf.filter(!(col("user_id") % tm === tr)).count()
          assert(rows.map(_.getLong(1)).sum == alive,
            s"seed=$seed tombstone: ${rows.map(_.getLong(1)).sum} " +
              s"survivors != $alive events outside slice $tr mod $tm")
        case "summing" =>
          // the split parts carry the WHOLE stream: bucket ns sum to
          // the event count however the stream was split
          assert(rows.map(_.getLong(2)).sum == eventCount,
            s"seed=$seed summing: ${rows.map(_.getLong(2)).sum} != $eventCount")
        case "quantile" =>
          // percentiles are non-decreasing in q (qs are emitted sorted)
          // and never null (every key has non-null values here)
          val nq = param(g, "qs").split(',').length
          rows.foreach { r =>
            val ps = (1 to nq).map(r.getDouble)
            assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
              s"seed=$seed quantile: non-monotone $ps for ${r.getString(0)}")
          }
        case "scd2" =>
          // intervals TILE each key's sampled history: one row per
          // changelog entry, exactly one current row per key, and each
          // valid_to equals the key's next valid_from
          val m = param(g, "sampleMod").toInt
          val sampled = eventsDf.filter(col("event_id") % m === 0).count()
          assert(rows.length.toLong == sampled,
            s"seed=$seed scd2: ${rows.length} rows != $sampled changelog entries")
          rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
            assert(rs.count(_.getBoolean(5)) == 1,
              s"seed=$seed scd2: user $u has ${rs.count(_.getBoolean(5))} current rows")
            val ordered = rs.sortBy(r => (r.getTimestamp(3).getTime, r.getLong(1)))
            ordered.sliding(2).foreach {
              case Array(a, b) =>
                assert(a.getTimestamp(4) == b.getTimestamp(3),
                  s"seed=$seed scd2: user $u interval gap " +
                    s"${a.getTimestamp(4)} != ${b.getTimestamp(3)}")
              case _ => ()
            }
          }
        case other => fail(s"unknown family $other")
      }
    }
  }

  test("sensitivity: a nudged parameter changes the output for every battery seed") {
    val unchanged = StoreFuzz.batterySeeds.filter { case (_, seed) =>
      val g = StoreFuzz.generate(seed)
      canon(g.query(spark, dir)) == canon(g.mutated(spark, dir))
    }.map(_._1)
    // battery seeds are SCANNED to be sensitive (StoreFuzz scaladoc),
    // so the floor here is exact
    assert(unchanged.isEmpty,
      s"parameter nudges left output unchanged for: ${unchanged.mkString(", ")}")
  }
}
