package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}

/** As-of join: for every left row, attach the nearest right row in the
  * same key group — DuckDB `ASOF JOIN` semantics (the reference exposes
  * DuckDB's dialect, so its users have this; SURVEY §2B row "Joins:
  * as-of / range"), extended with pandas-`merge_asof` direction and
  * tolerance:
  *
  *  - `backward` (default): most recent right row with `r.t <= l.t`
  *    (DuckDB `ON l.t >= r.t`);
  *  - `forward`: earliest right row with `r.t >= l.t`
  *    (DuckDB `ON l.t <= r.t`);
  *  - `nearest`: the closer of the two, ties to backward (pandas
  *    semantics).
  *
  * `toleranceMicros` nulls the match when |l.t - r.t| exceeds it. The
  * DIRECTIONAL nearest match is also the nearest row overall on that
  * side, so a post-match check is exact — no second lookup needed.
  *
  * Spark-first plan: NOT a range join (quadratic blow-up on hot keys)
  * but the union + ordered-window shape:
  *
  *   1. tag right rows 0 / left rows 1, union by name;
  *   2. one shuffle: window partitioned by key, ordered by (time, tag)
  *      — a right row at the same timestamp sorts BEFORE the left row,
  *      so ties match;
  *   3. `last(payload, ignoreNulls)` carries the latest right payload
  *      forward; keep only left rows.
  *
  * One hash shuffle on the key, linear in |L|+|R|, skew-bounded by the
  * per-key row count (same bound any keyed window has). `nearest` adds
  * a second Sort over the SAME partitioning (descending traversal) —
  * still one exchange. Left rows with no in-tolerance right row keep
  * NULL payload (ASOF LEFT JOIN).
  */
object AsofJoin {

  /** @param keys            equi-join key columns (same names both sides)
    * @param leftTime        left ordering column name
    * @param rightTime       right ordering column name
    * @param prefix          prefix for the right payload columns in the
    *                        output (right time arrives as `<prefix><rightTime>`)
    * @param direction       "backward" | "forward" | "nearest"
    * @param toleranceMicros max |l.t - r.t| for a match — MICROSECONDS
    *                        for timestamp/date columns, the column's own
    *                        units for numeric time columns (fractional
    *                        numerics keep their fraction — no long
    *                        truncation). Plain backward/forward without
    *                        tolerance accept ANY orderable time type;
    *                        tolerance/nearest need timestamp/date/numeric */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, prefix: String = "asof_",
           direction: String = "backward",
           toleranceMicros: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward/forward/nearest, got $direction")
    toleranceMicros.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val payloadCols: Seq[String] = right.columns.toSeq.filterNot(keys.contains)
    val payload = struct(payloadCols.map(c => col(s"`$c`").as(c)): _*)

    val r = right.select(
      keys.map(col) ++ Seq(col(s"`$rightTime`").as("__asof_t"), payload.as("__asof_p"), lit(0).as("__asof_side")): _*)
    val l = left.withColumn("__asof_t", col(s"`$leftTime`"))
      .withColumn("__asof_side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Numeric twin of the time column for tolerance/nearest deltas —
    // computed LAZILY so plain backward/forward joins keep working on
    // any orderable time type (strings included). Fractional numeric
    // times keep their own type (no long truncation — a 0.4 delta must
    // not compare as 0); NTZ goes through an explicit UTC round trip so
    // deltas are wall-clock-exact regardless of the session zone (a
    // bare cast would DST-warp them under zones with transitions).
    lazy val tMicros: Column = unioned.schema("__asof_t").dataType match {
      case TimestampType    => unix_micros(col("__asof_t"))
      case TimestampNTZType =>
        val sessionTz = left.sparkSession.sessionState.conf.sessionLocalTimeZone
        unix_micros(convert_timezone(lit("UTC"), lit(sessionTz), col("__asof_t"))
          .cast(TimestampType))
      case DateType         => datediff(col("__asof_t"), lit("1970-01-01")).cast("long") * 86400000000L
      case _: NumericType   => col("__asof_t")
      case dt => throw new IllegalArgumentException(
        s"asof tolerance/nearest needs a timestamp/date/numeric time column, got $dt")
    }

    // right-before-left at equal time => right rows at t == left.t match;
    // among right duplicates at one (key, time) the greatest payload wins
    // (deterministic; engines differ on this unspecified tie). The
    // descending traversal keeps the same tie rule via payload desc.
    // needsDelta: only tolerance and nearest do time ARITHMETIC; plain
    // backward/forward never touch tMicros, so they keep working on any
    // orderable time type (the pre-direction behavior)
    val needsDelta = toleranceMicros.isDefined || direction == "nearest"
    def pass(asc: Boolean): (Column, Column) = {
      // payload stays ASC in both traversals: `last` then lands on the
      // greatest payload among right duplicates at one (key, time) in
      // either direction — one deterministic tie rule everywhere
      val order =
        if (asc) Seq(col("__asof_t").asc, col("__asof_side").asc, col("__asof_p").asc_nulls_last)
        else Seq(col("__asof_t").desc, col("__asof_side").asc, col("__asof_p").asc_nulls_last)
      val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val matchedTime = if (needsDelta) tMicros else col("__asof_t")
      (last(col("__asof_p"), ignoreNulls = true).over(w),
       last(when(col("__asof_side") === 0, matchedTime), ignoreNulls = true).over(w))
    }

    def withinTol(delta: Column): Column =
      toleranceMicros.map(t => delta <= t).getOrElse(lit(true))

    lazy val lt = tMicros
    val matched = direction match {
      case "backward" =>
        val (p, mt) = pass(asc = true)
        unioned.withColumn("__asof_m",
          if (needsDelta) when(mt.isNotNull && withinTol(lt - mt), p)
          else when(mt.isNotNull, p))
      case "forward" =>
        val (p, mt) = pass(asc = false)
        unioned.withColumn("__asof_m",
          if (needsDelta) when(mt.isNotNull && withinTol(mt - lt), p)
          else when(mt.isNotNull, p))
      case "nearest" =>
        val (bp, bt) = pass(asc = true)
        val (fp, ft) = pass(asc = false)
        val bOk = bt.isNotNull && withinTol(lt - bt)
        val fOk = ft.isNotNull && withinTol(ft - lt)
        unioned
          .withColumn("__asof_m",
            when(bOk && (!fOk || (lt - bt) <= (ft - lt)), bp) // tie -> backward
              .otherwise(when(fOk, fp)))
    }

    val outCols =
      left.columns.toSeq.map(c => col(s"`$c`")) ++
        payloadCols.map(c => col(s"__asof_m.`$c`").as(s"$prefix$c"))
    matched.filter(col("__asof_side") === 1).select(outCols: _*)
  }
}
