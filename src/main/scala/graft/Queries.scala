package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import scala.collection.immutable.ListMap

/** The relational operator battery — SURVEY §2B exercised line by line as
  * concrete queries over the driver's parquet tables, each with a DuckDB
  * oracle (the reference's default destination engine, so the oracle IS
  * the reference's behavior for delegated SQL).
  *
  * Cross-engine determinism rules used throughout (so hash-compare is
  * exact, never "close"):
  *  - money (2-decimal doubles) is aggregated in DECIMAL(18,2) — exact,
  *    order-independent — then cast to double for a stable output type;
  *  - computed integers are cast to BIGINT on BOTH sides (DuckDB sum/len/
  *    row_number widths differ from Spark's);
  *  - date/timestamp outputs are formatted to strings;
  *  - every non-aggregate query ends in a deterministic ORDER BY.
  *
  * Scale notes are inline: joins mark their intended distribution
  * strategy (broadcast for dims), aggregations rely on partial
  * (map-side) aggregation, top-k lowers to TakeOrderedAndProject.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** events.ts has shipped in two parquet shapes across testdata
    * generations: TIMESTAMP(NANOS) — read as a long under
    * spark.sql.legacy.parquet.nanosAsLong=true (set in our session
    * builders), ns -> µs by integer division (`div`: a double roundtrip
    * would lose precision on 1.7e18 ns epochs) — and plain micros
    * without timezone, which Spark 4 reads as TIMESTAMP_NTZ. Normalize
    * both to TIMESTAMP; session tz is UTC so the NTZ cast preserves the
    * stored micros bit-for-bit (what DuckDB's oracle reads too).
    *
    * The long case dispatches on epoch MAGNITUDE instead of assuming
    * nanos: ONE non-null value classifies the whole generation — the
    * probe is a LIMIT-1 scan (a single parquet page, short-circuits; a
    * max() would scan the full column at 100 TB). Cuts sit at the
    * GEOMETRIC MEAN between adjacent unit bands over epochs 1971–2100
    * (ns spans 3.2e16–4.1e18, µs 3.2e13–4.1e15, ms 3.2e10–4.1e12, s
    * 3.2e7–4.1e9), so every in-range epoch classifies unambiguously —
    * a midpoint like 5e17 would misread a pre-1986 nanos value as
    * micros. The r9 testdata regeneration broke three queries on
    * exactly this class of silent shape drift. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    normalizeEventTs(df, df)

  /** `probeFrom` variant for STREAMING frames: the magnitude probe is a
    * collect, illegal on a streaming Dataset — pass the batch-read twin
    * of the same files as `probeFrom` (same schema, same unit). */
  private[graft] def normalizeEventTs(df: DataFrame, probeFrom: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val probe = probeFrom.select(abs(col("ts")).as("a"))
          .filter(col("a").isNotNull).limit(1).collect()
        val m = if (probe.isEmpty) Long.MaxValue else probe(0).getLong(0)
        if (m > 1e16.toLong)      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else if (m > 1e13.toLong) df.withColumn("ts", expr("timestamp_micros(ts)"))
        else if (m > 1e10.toLong) df.withColumn("ts", expr("timestamp_millis(ts)"))
        else                      df.withColumn("ts", expr("timestamp_seconds(ts)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Exact money arithmetic: 2-decimal double -> DECIMAL(18,2). */
  private def money(c: Column): Column = c.cast(DecimalType(18, 2))
  /** (1 - discount)-style unit factors: DECIMAL(4,2) keeps products
    * within DECIMAL(38,_) on both engines. */
  private def unit(c: Column): Column = c.cast(DecimalType(4, 2))
  private def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  // ---------------------------------------------------------------- scans

  val defs: ListMap[String, (Q, Option[String])] = ListMap(

    // Scan + filter + project: predicate and projection both push to the
    // parquet scan (PushedFilters / ReadSchema in explain).
    "q01_scan_filter_project" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
                  col("l_shipdate") <  to_timestamp(lit("1997-03-01")) &&
                  col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
             |       l_extendedprice, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-03-01'
             |  AND l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin))),

    // Global (ungrouped) aggregation; partial agg makes this a single
    // shuffle of one row per partition.
    "q02_agg_global" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"),
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          sumMoney(col("l_extendedprice")).as("sum_price")),
      Some("""SELECT count(*) AS n_rows, count(DISTINCT l_partkey) AS n_parts,
             |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             |       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem""".stripMargin))),

    // TPC-H Q1 shape: grouped agg with derived measures; hash aggregate
    // with map-side partials, 6 groups.
    "q03_agg_group" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem").filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).cast("double").as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            sum(money(col("l_extendedprice")) * unit(lit(1) - col("l_discount"))).cast("double").as("sum_disc_price"),
            sum(money(col("l_extendedprice")) * unit(lit(1) - col("l_discount")) * unit(lit(1) + col("l_tax"))).cast("double").as("sum_charge"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
             |  sum(l_quantity) / count(*) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin))),

    // HAVING over a grouped count.
    "q04_having" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders").groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
          .filter(col("n") > 100)
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY o_orderpriority HAVING count(*) > 100
             |ORDER BY o_orderpriority""".stripMargin))),

    // Two-table equi join + agg: shuffle join on l_orderkey=o_orderkey
    // (both large), AQE picks the strategy.
    "q05_join2_agg" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sumMoney(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |       count(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))),

    // TPC-H Q5 shape: 5-way join; nation/region are broadcast so only the
    // fact-fact join shuffles.
    "q06_join_multi" -> ((
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer"); val ord = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        val nat = t(s, d, "nation"); val reg = t(s, d, "region")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
                  col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                  col("o_orderdate") <  to_timestamp(lit("1998-01-01")))
          .groupBy(col("n_name"))
          .agg(sum(money(col("l_extendedprice")) * unit(lit(1) - col("l_discount"))).cast("double").as("revenue"),
               count(lit(1)).as("n"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
             |  count(*) AS n
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))),

    // Semi join (EXISTS): orders with a high-discount line.
    "q07_semi_join" -> ((
      (s: SparkSession, d: String) => {
        val hi = t(s, d, "lineitem").filter(col("l_discount") > 0.09)
        t(s, d, "orders")
          .join(hi, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))),

    // Anti join (NOT EXISTS): customers with no 'P'-status order.
    "q08_anti_join" -> ((
      (s: SparkSession, d: String) => {
        val pOrders = t(s, d, "orders").filter(col("o_orderstatus") === "P")
        t(s, d, "customer")
          .join(pOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))),

    // Non-equi (range) join against an inline band table: broadcast
    // nested-loop with a tiny build side.
    "q09_nonequi_join" -> ((
      (s: SparkSession, d: String) => {
        val bands = s.createDataFrame(Seq(
          ("cheap", 0.0, 1000.0), ("mid", 1000.0, 1500.0), ("pricey", 1500.0, 100000.0)
        )).toDF("band", "lo", "hi")
        t(s, d, "part")
          .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
          .groupBy(col("band")).agg(count(lit(1)).as("n"), sumMoney(col("p_retailprice")).as("total"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*) AS n,
             |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM part JOIN (VALUES ('cheap', 0.0, 1000.0), ('mid', 1000.0, 1500.0),
             |                       ('pricey', 1500.0, 100000.0)) b(band, lo, hi)
             |  ON p_retailprice >= lo AND p_retailprice < hi
             |GROUP BY band ORDER BY band""".stripMargin))),

    // Cross join (tiny x tiny).
    "q10_cross_join" -> ((
      (s: SparkSession, d: String) => {
        val r1 = t(s, d, "region").select(col("r_name").as("a"))
        val r2 = t(s, d, "region").select(col("r_name").as("b"))
        r1.crossJoin(r2).filter(col("a") < col("b")).orderBy("a", "b")
      },
      Some("""SELECT r1.r_name AS a, r2.r_name AS b FROM region r1, region r2
             |WHERE r1.r_name < r2.r_name ORDER BY a, b""".stripMargin))),

    // DISTINCT projection.
    "q11_distinct" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer").select(col("c_mktsegment"), col("c_nationkey"))
          .distinct().orderBy("c_mktsegment", "c_nationkey"),
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
             |ORDER BY c_mktsegment, c_nationkey""".stripMargin))),

    // COUNT(DISTINCT) per group (expand + two-phase agg in Spark).
    "q12_count_distinct" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "events").groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"),
               sumMoney(col("value")).as("sum_value"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))),

    // ROLLUP.
    "q13_rollup" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sumMoney(col("c_acctbal")).as("bal"))
          .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first),
      Some("""SELECT n_name, c_mktsegment, count(*) AS n,
             |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, c_mktsegment)
             |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin))),

    // CUBE.
    "q14_cube" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").cube(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin))),

    // GROUPING SETS (via SQL — the DataFrame API has no grouping-sets
    // verb; Catalyst plans Expand either way).
    "q15_grouping_sets" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "events").createOrReplaceTempView("q15_events")
        s.sql("""SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_mod, count(*) AS n
                |FROM q15_events
                |GROUP BY GROUPING SETS ((event_type), (user_mod), ())
                |ORDER BY event_type ASC NULLS FIRST, user_mod ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_mod, count(*) AS n
             |FROM events
             |GROUP BY GROUPING SETS ((event_type), (user_mod), ())
             |ORDER BY event_type ASC NULLS FIRST, user_mod ASC NULLS FIRST""".stripMargin))),

    // Ranking window functions; unique (ts, event_id) order keeps
    // row_number deterministic, ties make rank/dense_rank meaningful.
    "q16_window_rank" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wv = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
        t(s, d, "events")
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("rnk", rank().over(wv).cast("long"))
          .withColumn("drnk", dense_rank().over(wv).cast("long"))
          .withColumn("quartile", ntile(4).over(wv).cast("long"))
          .filter(col("rn") <= 3)
          .select("user_id", "event_id", "rn", "rnk", "drnk", "quartile")
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, event_id, rn, rnk, drnk, quartile FROM (
             |  SELECT user_id, event_id,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
             |    CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rnk,
             |    CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS drnk,
             |    CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS quartile
             |  FROM events) x
             |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin))),

    // lag/lead.
    "q17_window_lag" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "value", "prev_value", "next_type")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, value, prev_value, next_type FROM (
             |  SELECT user_id, event_id, value, event_type,
             |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
             |  FROM events) x
             |WHERE event_type = 'purchase' ORDER BY user_id, event_id""".stripMargin))),

    // Aggregate over a running frame (exact via decimal, cast at the end).
    "q18_window_frame" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .withColumn("running_total", sum(money(col("o_totalprice"))).over(w).cast("double"))
          .filter(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
             |FROM orders WHERE o_custkey < 50
             |ORDER BY o_custkey, o_orderkey""".stripMargin))),

    // Top-k: ORDER BY + LIMIT lowers to TakeOrderedAndProject (no global
    // sort materialization).
    "q19_topk" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .limit(15),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin))),

    // UNION (distinct) of two projections.
    "q20_union" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer").select(col("c_nationkey").as("key"))
          .union(t(s, d, "supplier").select(col("s_nationkey").as("key")))
          .distinct().orderBy("key"),
      Some("""SELECT c_nationkey AS key FROM customer
             |UNION SELECT s_nationkey AS key FROM supplier ORDER BY key""".stripMargin))),

    // INTERSECT.
    "q21_intersect" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer").select(col("c_nationkey").as("key")).intersect(
          t(s, d, "supplier").select(col("s_nationkey").as("key"))).orderBy("key"),
      Some("""SELECT c_nationkey AS key FROM customer
             |INTERSECT SELECT s_nationkey AS key FROM supplier ORDER BY key""".stripMargin))),

    // EXCEPT (supplier side filtered so the difference is non-empty).
    "q22_except" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer").select(col("c_nationkey").as("key")).except(
          t(s, d, "supplier").filter(col("s_suppkey") % 3 === 0)
            .select(col("s_nationkey").as("key"))).orderBy("key"),
      Some("""SELECT c_nationkey AS key FROM customer
             |EXCEPT SELECT s_nationkey AS key FROM supplier WHERE s_suppkey % 3 = 0
             |ORDER BY key""".stripMargin))),

    // String scalar functions.
    "q23_string_funcs" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "part").filter(col("p_partkey") <= 200)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up"),
            lower(col("p_brand")).as("lo"),
            substring(col("p_name"), 1, 5).as("sub"),
            regexp_replace(col("p_name"), " ", "_").as("repl"),
            concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
            length(col("p_name")).cast("long").as("len"),
            trim(col("p_name")).as("trimmed"),
            col("p_name").like("%green%").as("has_green"),
            split(col("p_name"), " ").getItem(0).as("first_word"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
             |  substr(p_name, 1, 5) AS sub, regexp_replace(p_name, ' ', '_', 'g') AS repl,
             |  concat_ws('|', p_brand, p_type) AS cat, CAST(length(p_name) AS BIGINT) AS len,
             |  trim(p_name) AS trimmed, p_name LIKE '%green%' AS has_green,
             |  regexp_split_to_array(p_name, ' ')[1] AS first_word
             |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin))),

    // Date/time scalar functions (string-formatted outputs).
    "q24_date_funcs" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders").filter(col("o_orderkey") <= 500)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            quarter(col("o_orderdate")).cast("long").as("qtr"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"), // floor(µs/1e6), matches epoch_us // 1000000
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
             |  CAST(date_part('month', o_orderdate) AS BIGINT) AS mo,
             |  CAST(date_part('day', o_orderdate) AS BIGINT) AS dom,
             |  CAST(date_part('quarter', o_orderdate) AS BIGINT) AS qtr,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  epoch_us(o_orderdate) // 1000000 AS epoch_s,
             |  strftime(o_orderdate, '%Y-%m-%d') AS day_str
             |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin))),

    // Math scalar functions (IEEE-exact subset only: no libm variance).
    "q25_math_funcs" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").filter(col("l_orderkey") <= 300)
          .select(
            col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
            abs(col("l_discount") - 0.05).as("a"),
            floor(col("l_extendedprice")).cast("long").as("fl"),
            ceil(col("l_extendedprice")).cast("long").as("ce"),
            sqrt(col("l_quantity")).as("sq"),
            (col("l_partkey") % 7).cast("long").as("md"),
            greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
            least(col("l_tax"), col("l_discount")).as("le"),
            round(money(col("l_extendedprice")) / 10, 1).cast("double").as("rd"))
          .orderBy("l_orderkey", "ln"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
             |  abs(l_discount - 0.05) AS a,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
             |  sqrt(l_quantity) AS sq,
             |  CAST(l_partkey % 7 AS BIGINT) AS md,
             |  greatest(l_quantity, l_discount * 100) AS gr,
             |  least(l_tax, l_discount) AS le,
             |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) / 10, 1) AS DOUBLE) AS rd
             |FROM lineitem WHERE l_orderkey <= 300 ORDER BY l_orderkey, ln""".stripMargin))),

    // JSON scalar functions over the events.props JSON column.
    "q26_json_funcs" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).cast("long").as("sum_k"),
               count(col("k")).as("n_k"),
               min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
             |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))),

    // CASE / COALESCE / NULLIF.
    "q27_case_coalesce" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "events")
          .select(
            when(col("value") < 5, "low").when(col("value") < 15, "mid")
              .otherwise("high").as("band"),
            coalesce(nullif(col("event_type"), lit("error")), lit("(err)")).as("etype"))
          .groupBy("band", "etype").agg(count(lit(1)).as("n"))
          .orderBy("band", "etype"),
      Some("""SELECT CASE WHEN value < 5 THEN 'low' WHEN value < 15 THEN 'mid'
             |            ELSE 'high' END AS band,
             |       coalesce(nullif(event_type, 'error'), '(err)') AS etype,
             |       count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY band, etype""".stripMargin))),

    // CTE-shaped composition (DataFrame reuse = WITH).
    "q28_cte" -> ((
      (s: SparkSession, d: String) => {
        val big = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        big.join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_big"), sumMoney(col("o_totalprice")).as("total"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH big AS (SELECT * FROM orders WHERE o_totalprice > 200000)
             |SELECT c_mktsegment, count(*) AS n_big,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM big JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))),

    // Correlated scalar subquery (expressed as groupBy+join in the
    // DataFrame API — Catalyst decorrelates the SQL form to the same plan).
    "q29_scalar_subquery" -> ((
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer")
        val natMax = cust.groupBy(col("c_nationkey").as("nk"))
          .agg(max(col("c_acctbal")).as("nation_max"))
        cust.join(broadcast(natMax), col("c_nationkey") === col("nk"))
          .filter(col("c_acctbal") > col("nation_max") * 0.95)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
             |WHERE c_acctbal > 0.95 * (SELECT max(c2.c_acctbal) FROM customer c2
             |                          WHERE c2.c_nationkey = c.c_nationkey)
             |ORDER BY c_custkey""".stripMargin))),

    // IN subquery.
    "q30_in_subquery" -> ((
      (s: SparkSession, d: String) => {
        val bigParts = t(s, d, "part").filter(col("p_size") >= 48).select(col("p_partkey"))
        t(s, d, "lineitem")
          .join(broadcast(bigParts), col("l_partkey") === col("p_partkey"), "left_semi")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("double").as("qty"))
      },
      Some("""SELECT count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS qty FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)""".stripMargin))),

    // Exact variance/stddev via decimal power sums (deterministic cross-
    // engine, unlike native stddev over doubles).
    "q31_variance_exact" -> ((
      (s: SparkSession, d: String) => {
        val x = money(col("l_extendedprice"))
        t(s, d, "lineitem").groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(x).cast("double").as("s1"),
            sum(x * x).cast("double").as("s2"))
          .select(col("l_returnflag"), col("n"),
            ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("variance"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, n, (s2 - s1 * s1 / n) / (n - 1) AS variance FROM (
             |  SELECT l_returnflag, count(*) AS n,
             |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
             |  FROM lineitem GROUP BY l_returnflag) g
             |ORDER BY l_returnflag""".stripMargin))),

    // Sessionization: lag-gap session starts, summed per user.
    "q32_sessionize" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .withColumn("new_session", when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM (
             |  SELECT user_id,
             |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_session
             |  FROM (
             |    SELECT user_id,
             |      epoch_us(ts) -
             |      epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
             |    FROM events) g) x
             |GROUP BY user_id ORDER BY user_id""".stripMargin))),

    // first/last value over explicit frames.
    "q33_first_last" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events")
          .withColumn("first_type", first(col("event_type")).over(w))
          .withColumn("last_type", last(col("event_type")).over(w))
          .groupBy(col("first_type"), col("last_type")).agg(count(lit(1)).as("n"))
          .orderBy("first_type", "last_type")
      },
      Some("""SELECT first_type, last_type, count(*) AS n FROM (
             |  SELECT
             |    first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
             |    last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
             |  FROM events) x
             |GROUP BY first_type, last_type ORDER BY first_type, last_type""".stripMargin))),

    // Exact interpolated median (both engines: linear interpolation).
    "q34_percentile" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
               expr("percentile(l_quantity, 0.9)").as("p90_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
             |       quantile_cont(l_quantity, 0.9) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))),

    // Approx distinct (HLL++): engines' sketches differ by design, so
    // the raw estimate can never hash-match a DuckDB replay. Instead
    // the row emits the EXACT count (computed in the same aggregate)
    // plus a within-corridor boolean — |est/exact − 1| ≤ 3×rsd (default
    // rsd 0.05 → 0.15) — which the oracle replays as count(DISTINCT)
    // and a literal `true`. The randomized internals stay covered (a
    // sketch outside its corridor flips the boolean and fails the
    // hash), while the gate reads hash-PASS. OperatorsSpec additionally
    // pins the estimate against the rsd directly.
    "q35_approx_distinct" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "events").groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id")).as("approx_users"),
               countDistinct(col("user_id")).as("exact_users"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx_users").cast("double") /
                 col("exact_users").cast("double") - 1.0) <= 0.15)
              .as("within_corridor"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |       true AS within_corridor
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))),

    // PIVOT (DuckDB dialect exposes it; Spark's relational pivot lowers
    // to a single two-phase aggregate — one shuffle, no per-column scan).
    // Fixed pivot-value list keeps the output schema static; counts are
    // null-coalesced to match SQL's FILTER-count zeros.
    "q58_pivot" -> ((
      (s: SparkSession, d: String) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = t(s, d, "events")
          .withColumn("bucket", (col("user_id") % 10).cast("long"))
          .groupBy(col("bucket"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        types.foldLeft(p) { (df, ty) =>
          df.withColumn(ty, coalesce(col(s"`$ty`"), lit(0L)).cast("long"))
        }.orderBy("bucket")
      },
      Some("""SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
             |  count(*) FILTER (WHERE event_type = 'click') AS click,
             |  count(*) FILTER (WHERE event_type = 'error') AS error,
             |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
             |  count(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin))),

    // UNPIVOT (melt): wide per-region aggregates back to (key, col, val)
    // rows — Spark's relational Unpivot (Expand, no shuffle beyond the
    // feeding aggregate); oracle via DuckDB UNPIVOT.
    "q60_unpivot" -> ((
      (s: SparkSession, d: String) => {
        val wide = t(s, d, "nation").groupBy(col("n_regionkey").cast("long").as("region"))
          .agg(count(lit(1)).cast("long").as("n_nations"),
               min(col("n_nationkey")).cast("long").as("min_key"),
               max(col("n_nationkey")).cast("long").as("max_key"))
        wide.unpivot(Array(col("region")),
            Array(col("n_nations"), col("min_key"), col("max_key")),
            "measure", "value")
          .orderBy("region", "measure")
      },
      Some("""SELECT region, measure, value FROM (
             |  SELECT CAST(n_regionkey AS BIGINT) AS region,
             |         CAST(count(*) AS BIGINT) AS n_nations,
             |         CAST(min(n_nationkey) AS BIGINT) AS min_key,
             |         CAST(max(n_nationkey) AS BIGINT) AS max_key
             |  FROM nation GROUP BY region) w
             |UNPIVOT (value FOR measure IN (n_nations, min_key, max_key))
             |ORDER BY region, measure""".stripMargin))),

    // As-of join (DuckDB `ASOF JOIN` dialect row of §2B): each click gets
    // the most recent error of the same user at or before it. Spark plan
    // is union + ordered window (operators.AsofJoin) — ONE key shuffle,
    // linear, never a range join; oracle is DuckDB's native ASOF LEFT
    // JOIN.
    "q36_asof_join" -> ((
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("value"))
        graft.operators.AsofJoin.asof(clicks, errors, Seq("user_id"), "ts", "ts", prefix = "err_")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
            date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
            col("err_value"))
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id,
             |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
             |       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
             |       e.value AS err_value
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
             |  ON c.user_id = e.user_id AND c.ts >= e.ts
             |ORDER BY c.event_id""".stripMargin))),

    // External file scans (§2B "Scans — external files"; reference loads
    // DuckDB json/httpfs for exactly this). The query exports a slice of
    // `events` to newline-delimited JSON under /tmp, then scans it back
    // through sources.ExternalSources with an EXPLICIT schema (the 100 TB
    // posture: no inference pass) and aggregates. Aggregates are chosen
    // order-independent (count / min / max / integer sum) so the oracle
    // — DuckDB read_json over the same files — hash-matches exactly.
    "q37_external_json" -> ((
      (s: SparkSession, d: String) => {
        val dir = s"/tmp/graft_external_${new java.io.File(d).getName}/events_json"
        t(s, d, "events").select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .coalesce(1).write.mode("overwrite").json(dir)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
        graft.sources.ExternalSources.readJson(s, dir, Some(schema))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
               max(col("value")).as("max_v"), sum(col("event_id")).cast("long").as("id_sum"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM read_json('/tmp/graft_external_{SFNAME}/events_json/part-*.json',
             |               format='newline_delimited',
             |               columns={event_id:'BIGINT', user_id:'BIGINT',
             |                        event_type:'VARCHAR', value:'DOUBLE'})
             |GROUP BY event_type ORDER BY event_type""".stripMargin))),

    // Array/map functions exercised head-on (§2B row that round 1 only
    // hit indirectly): split -> slice/join/contains/distinct + a map
    // literal with element_at. Outputs are scalars so the oracle hash-
    // compares without engine-specific nested-type encodings.
    "q39_array_map" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_words"),
            array_join(slice(col("w"), 1, 3), " ").as("first3"),
            array_contains(col("w"), "the").as("has_the"),
            size(array_distinct(col("w"))).cast("long").as("n_uniq"),
            element_at(map(lit("n"), size(col("w")), lit("u"), size(array_distinct(col("w")))),
              "u").cast("long").as("map_u"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             |       array_to_string(w[1:3], ' ') AS first3,
             |       list_contains(w, 'the') AS has_the,
             |       CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
             |       CAST(len(list_distinct(w)) AS BIGINT) AS map_u
             |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
             |ORDER BY doc_id""".stripMargin))),

    // External CSV scan: same shape through the CSV reader (header +
    // explicit schema both sides).
    "q38_external_csv" -> ((
      (s: SparkSession, d: String) => {
        val dir = s"/tmp/graft_external_${new java.io.File(d).getName}/events_csv"
        t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
        graft.sources.ExternalSources.readCsv(s, dir, header = true, Some(schema))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
               max(col("value")).as("max_v"), sum(col("event_id")).cast("long").as("id_sum"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM read_csv('/tmp/graft_external_{SFNAME}/events_csv/part-*.csv', header=true,
             |              columns={event_id:'BIGINT', event_type:'VARCHAR', value:'DOUBLE'})
             |GROUP BY event_type ORDER BY event_type""".stripMargin))),

    // Distribution window functions — the q16 ranking family's
    // remaining members. A (value DESC, event_id) total order makes
    // every rank unique, so percent_rank = (rn-1)/(n-1) and
    // cume_dist = rn/n are single divisions of exact integers —
    // bit-identical cross-engine; nth_value reads the partition's
    // 2nd-best value through an explicit full frame (the default
    // running frame would leak engine-specific null behavior).
    "q147_window_dist" -> ((
      (s: SparkSession, d: String) => {
        val wv = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
        val full = wv.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events")
          .withColumn("rn", row_number().over(wv).cast("long"))
          .withColumn("pr", percent_rank().over(wv))
          .withColumn("cd", cume_dist().over(wv))
          .withColumn("second_best", nth_value(col("value"), 2).over(full))
          .filter(col("rn") <= 3)
          .select("user_id", "event_id", "rn", "pr", "cd", "second_best")
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, event_id, rn, pr, cd, second_best FROM (
             |  SELECT user_id, event_id,
             |    CAST(row_number() OVER w AS BIGINT) AS rn,
             |    percent_rank() OVER w AS pr,
             |    cume_dist() OVER w AS cd,
             |    nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY value DESC, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)) x
             |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin)))
  )

  def queries: Map[String, Q] = defs.map { case (k, (q, _)) => k -> q }
  def oracles: Map[String, String] = defs.collect { case (k, (_, Some(o))) => k -> o }
}
