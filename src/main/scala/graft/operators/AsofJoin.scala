package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * `right.time <= left.time` within the same key group — DuckDB `ASOF
  * JOIN` semantics (the reference exposes DuckDB's dialect, so its users
  * have this; SURVEY §2B row "Joins: as-of / range").
  *
  * Spark-first plan: NOT a range join (quadratic blow-up on hot keys) but
  * the union + ordered-window shape:
  *
  *   1. tag right rows 0 / left rows 1, union by name;
  *   2. one shuffle: window partitioned by key, ordered by (time, tag) —
  *      a right row at the same timestamp sorts BEFORE the left row, so
  *      `<=` matches;
  *   3. `last(payload, ignoreNulls)` carries the latest right payload
  *      forward; keep only left rows.
  *
  * One hash shuffle on the key, linear in |L|+|R|, skew-bounded by the
  * per-key row count (same bound any keyed window has). Left rows with no
  * prior right row keep NULL payload (ASOF LEFT JOIN).
  */
object AsofJoin {

  /** @param keys      equi-join key columns (same names both sides)
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    * @param prefix    prefix for the right payload columns in the output
    *                  (right time arrives as `<prefix><rightTime>`) */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val payloadCols: Seq[String] = right.columns.toSeq.filterNot(keys.contains)
    val payload = struct(payloadCols.map(c => col(s"`$c`").as(c)): _*)

    val r = right.select(
      keys.map(col) ++ Seq(col(s"`$rightTime`").as("__asof_t"), payload.as("__asof_p"), lit(0).as("__asof_side")): _*)
    val l = left.withColumn("__asof_t", col(s"`$leftTime`"))
      .withColumn("__asof_side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right-before-left at equal time => right rows at t == left.t match;
    // among right duplicates at one (key, time) the greatest payload wins
    // (deterministic; engines differ on this unspecified tie).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_t").asc, col("__asof_side").asc, col("__asof_p").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn("__asof_m", last(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)

    val outCols =
      left.columns.toSeq.map(c => col(s"`$c`")) ++
        payloadCols.map(c => col(s"__asof_m.`$c`").as(s"$prefix$c"))
    matched.select(outCols: _*)
  }
}
