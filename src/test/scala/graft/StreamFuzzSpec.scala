package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property checks on the streaming fuzzer ([[StreamFuzz]]). The
  * cross-engine half (streamed result == batch replay in DuckDB) runs
  * in the driver's gate via q236–q240 and in bulk via StreamFuzzSweep;
  * pinned in-process here: determinism of generation, battery family
  * coverage, per-family invariants (sessions tile each user's events
  * without overlap, windows are epoch-aligned and carry the whole
  * stream, join matches respect the interval), and mutation
  * sensitivity. Each invariant check runs a REAL streaming query
  * (staging, watermark, AvailableNow), so the seed range is small. */
class StreamFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.session()

  private val dir = "/root/testdata/sf0.001"


  private def canon(df: DataFrame): Vector[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
      .mkString("|")).toVector.sorted

  private def param(g: StreamFuzz.Generated, key: String): String =
    g.params.split(' ').find(_.startsWith(key + "="))
      .getOrElse(fail(s"param $key missing from '${g.params}'"))
      .stripPrefix(key + "=")

  // through normalizeEventTs, like the fuzzer itself: events.ts has
  // shipped as a nanos LONG in past testdata generations (the r9
  // incident) — a raw read would compute garbage watermarks here while
  // the fuzzer stayed correct
  private lazy val eventsDf: DataFrame =
    Queries.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))

  private lazy val eventCount: Long = eventsDf.count()

  test("generation is deterministic: same seed, same family, params, SQL") {
    (1L to 12L).foreach { seed =>
      val (a, b) = (StreamFuzz.generate(seed), StreamFuzz.generate(seed))
      assert(a.family == b.family && a.params == b.params && a.sql == b.sql)
    }
  }

  test("battery seeds produce their named families, each with rows at sf0.001") {
    StreamFuzz.batterySeeds.foreach { case (name, seed) =>
      val g = StreamFuzz.generate(seed)
      assert(g.family == StreamFuzz.expectedFamily(name),
        s"$name (seed $seed) generated family ${g.family}")
      assert(g.query(spark, dir).count() > 0, s"$name (${g.params}) is empty at sf0.001")
    }
  }

  test("family invariants hold for seeds 1-12") {
    (1L to 12L).foreach { seed =>
      val g = StreamFuzz.generate(seed)
      val rows = g.query(spark, dir).collect()
      g.family match {
        case "ssession" =>
          // sessions TILE each user's events: every event lands in
          // exactly one emitted session (append mode emitted them all —
          // the sentinel drove the watermark past every real session),
          // and a user's sessions never overlap (next start >= prev
          // end, where end = last event + gap)
          val gapMs = param(g, "gapMinutes").toLong * 60000L
          assert(rows.map(_.getLong(3)).sum == eventCount,
            s"seed=$seed ssession: ${rows.map(_.getLong(3)).sum} events in " +
              s"sessions != $eventCount")
          rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
            val ordered = rs.sortBy(_.getTimestamp(1).getTime)
            ordered.foreach { r =>
              assert(r.getTimestamp(2).getTime - r.getTimestamp(1).getTime >= gapMs,
                s"seed=$seed ssession: user $u session shorter than the gap")
            }
            ordered.sliding(2).foreach {
              case Array(a, b) =>
                assert(b.getTimestamp(1).getTime >= a.getTimestamp(2).getTime,
                  s"seed=$seed ssession: user $u sessions overlap")
              case _ => ()
            }
          }
        case "swindow" =>
          // epoch-aligned tumbling windows carrying the whole stream
          val widthUs = param(g, "window") match {
            case "1_hour" => 3600000000L
            case "6_hours" => 21600000000L
            case "1_day" => 86400000000L
            case other => fail(s"unknown window $other")
          }
          assert(rows.map(_.getLong(2)).sum == eventCount,
            s"seed=$seed swindow: ${rows.map(_.getLong(2)).sum} != $eventCount")
          rows.foreach { r =>
            val us = r.getTimestamp(0).getTime * 1000L
            assert(us % widthUs == 0,
              s"seed=$seed swindow: window_start ${r.getTimestamp(0)} not " +
                s"aligned to ${widthUs}us")
          }
        case "sjoin" =>
          // inner: one row per MATCHED left event, counts positive,
          // bounded by the left-type population. left_outer: EVERY
          // left event emits exactly once (the sentinel pushed both
          // watermarks past every interval edge), unmatched with
          // n_matches = 0
          val lt = param(g, "leftType")
          val leftN = eventsDf.filter(col("event_type") === lt).count()
          if (param(g, "joinType") == "left_outer") {
            assert(rows.length.toLong == leftN,
              s"seed=$seed sjoin outer: ${rows.length} rows != $leftN $lt events")
            rows.foreach { r =>
              assert(r.getLong(1) >= 0, s"seed=$seed sjoin: n_matches < 0")
            }
          } else {
            assert(rows.length.toLong <= leftN,
              s"seed=$seed sjoin: ${rows.length} rows > $leftN $lt events")
            rows.foreach { r =>
              assert(r.getLong(1) >= 1, s"seed=$seed sjoin: n_matches < 1")
            }
          }
        case "slate" =>
          // the late-drop semantic bounds the surviving mass: every
          // even (on-time) row is counted, no more than the whole
          // stream is, and windows stay epoch-aligned
          val widthUs = param(g, "window") match {
            case "1_hour" => 3600000000L
            case "6_hours" => 21600000000L
            case "1_day" => 86400000000L
            case other => fail(s"unknown window $other")
          }
          val evenN = eventsDf.filter(col("event_id") % 2 === 0).count()
          val total = rows.map(_.getLong(2)).sum
          assert(total >= evenN && total <= eventCount,
            s"seed=$seed slate: surviving mass $total outside [$evenN, $eventCount]")
          assert(total < eventCount,
            s"seed=$seed slate: nothing was dropped — the late path did not engage")
          rows.foreach { r =>
            val us = r.getTimestamp(0).getTime * 1000L
            assert(us % widthUs == 0,
              s"seed=$seed slate: window_start ${r.getTimestamp(0)} misaligned")
          }
        case "slatesession" =>
          // exact conservation of the late-drop semantic: the emitted
          // sessions carry every even (on-time) row plus exactly the
          // odd rows whose own session window (ts + gap) cleared the
          // watermark (ms-floored max even ts − delay) — computed here
          // independently of the SQL oracle
          val gapUs = param(g, "gapMinutes").toLong * 60000000L
          val delayUs = param(g, "delayMin").toLong * 60000000L
          val evenTs = eventsDf.filter(col("event_id") % 2 === 0)
            .select(unix_micros(col("ts").cast("timestamp"))).collect().map(_.getLong(0))
          val wmUs = (evenTs.max / 1000L) * 1000L - delayUs
          val keptOdd = eventsDf.filter(col("event_id") % 2 === 1)
            .select(unix_micros(col("ts").cast("timestamp"))).collect()
            .count(r => r.getLong(0) + gapUs > wmUs)
          val mass = rows.map(_.getLong(3)).sum
          assert(mass == evenTs.length + keptOdd,
            s"seed=$seed slatesession: session mass $mass != " +
              s"${evenTs.length} even + $keptOdd kept-late rows")
          rows.foreach { r =>
            assert(r.getTimestamp(2).getTime - r.getTimestamp(1).getTime >=
              gapUs / 1000L,
              s"seed=$seed slatesession: session shorter than the gap")
          }
        case "sdedup" =>
          // exactly one survivor per distinct key, keys unique, every
          // payload is a real (type#id) row — the duplicates (within
          // batch AND across batches) all died in the state path
          val keyCol = param(g, "keyMode") match {
            case "type"      => col("event_type")
            case "user"      => col("user_id").cast("string")
            case "usermod7"  => (col("user_id") % 7).cast("string")
            case "usermod10" => (col("user_id") % 10).cast("string")
            case other       => fail(s"unknown keyMode $other")
          }
          val distinctKeys = eventsDf.select(keyCol).distinct().count()
          assert(rows.length.toLong == distinctKeys,
            s"seed=$seed sdedup: ${rows.length} survivors != $distinctKeys keys")
          assert(rows.map(_.getString(0)).distinct.length == rows.length,
            s"seed=$seed sdedup: duplicate keys in the output")
          rows.foreach { r =>
            assert(r.getString(1).matches(".+#\\d+"),
              s"seed=$seed sdedup: malformed payload ${r.getString(1)}")
          }
        case "ssum" =>
          // conservation at any key shape and epoch split: group counts
          // carry the whole stream, and the DECIMAL totals merge to the
          // global sum exactly (the doubles here are casts of exact
          // decimals, so only the final fold wobbles)
          val nIdx = rows.head.length - 1
          assert(rows.map(_.getLong(nIdx)).sum == eventCount,
            s"seed=$seed ssum: n sum ${rows.map(_.getLong(nIdx)).sum} != $eventCount")
          val globalTotal = eventsDf
            .select(sum(col("value").cast(DecimalType(18, 2)))).head()
            .getDecimal(0).doubleValue()
          val got = rows.map(_.getDouble(nIdx - 1)).sum
          assert(math.abs(got - globalTotal) <=
            math.abs(globalTotal) * 1e-9 + 1e-6,
            s"seed=$seed ssum: totals $got != $globalTotal")
        case "squant" =>
          // one row per key, quantiles non-null, monotone in q, and on
          // the 1/scale quantization grid (values the data actually
          // binned to — the store's whole contract)
          val sc = param(g, "scale").toInt
          val nTypes = eventsDf.select(col("event_type")).distinct().count()
          assert(rows.length.toLong == nTypes,
            s"seed=$seed squant: ${rows.length} rows != $nTypes types")
          rows.foreach { r =>
            val qvals = (1 until r.length).map { i =>
              assert(!r.isNullAt(i), s"seed=$seed squant: null quantile")
              r.getDouble(i)
            }
            qvals.sliding(2).foreach {
              case Seq(a, b) => assert(a <= b,
                s"seed=$seed squant: quantiles not monotone ($a > $b)")
              case _ => ()
            }
            qvals.foreach(v => assert(
              math.abs(v * sc - math.round(v * sc).toDouble) < 1e-6,
              s"seed=$seed squant: $v not on the 1/$sc grid"))
          }
        case other => fail(s"unknown family $other")
      }
    }
  }

  test("sensitivity: a nudged parameter changes the output for every battery seed") {
    val unchanged = StreamFuzz.batterySeeds.filter { case (_, seed) =>
      val g = StreamFuzz.generate(seed)
      canon(g.query(spark, dir)) == canon(g.mutated(spark, dir))
    }.map(_._1)
    assert(unchanged.isEmpty,
      s"parameter nudges left output unchanged for: ${unchanged.mkString(", ")}")
  }
}
