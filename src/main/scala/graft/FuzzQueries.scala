package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import scala.collection.immutable.ListMap
import scala.util.Random

/** Seeded operator-composition fuzzer: generates random relational plans
  * as PAIRED artifacts — a DataFrame-API plan (genuine `Column` ops, not
  * `expr` strings) and the equivalent ANSI SQL — from one seed. Two
  * verification levels:
  *
  *  1. [[FuzzSpec]] runs many seeds at sf0.001 and asserts the API plan
  *     and `spark.sql(sql)` agree row-for-row — a property check on the
  *     DataFrame-to-SQL operator mapping itself, across compositions no
  *     hand-written battery row exercises.
  *  2. Eighteen FIXED seeds (one per plan shape) join the battery as
  *     q190–q207, where the same SQL replays in DuckDB — the
  *     cross-ENGINE differential the driver's gate hashes. FuzzSweep
  *     replays arbitrary seed ranges through the same DuckDB gate
  *     (receipted at 400/400 PASS, PLANS.md r16).
  *
  * The grammar is restricted to the cross-engine-exact subset the
  * battery's determinism rules established ([[Queries]] scaladoc):
  * money aggregates in DECIMAL(18,2) cast back to DOUBLE, computed
  * integers cast to BIGINT on both sides, no timestamp OUTPUTS (literals
  * only in predicates — the tables carry midnight-exact micros), every
  * query ends in a total ORDER BY (unique keys always included) so
  * LIMIT is deterministic. Nullable outputs exist only where a shape
  * MANUFACTURES them (CASE without ELSE, null-extended outer-join
  * sides, empty window frames) and every nullable sort key carries an
  * explicit NULLS FIRST/LAST in both dialects — the engines' defaults
  * disagree (Spark: NULLS FIRST on ASC; DuckDB: NULLS LAST).
  *
  * Scale notes: generated joins mark dimension sides (part, supplier,
  * nation) with `broadcast()` — fact-fact edges (lineitem-orders,
  * orders-customer) shuffle on their keys as they must at 100 TB; all
  * aggregates are partial-aggregation-friendly (sum/count/min/max);
  * window shapes partition by a low-cardinality key and never sort
  * globally before the final bounded ORDER BY.
  *
  * Reference relevance: the reference delegates its whole SQL surface to
  * the destination verbatim (`/root/reference/pkg/api/data.go:29-56`,
  * `pkg/destinations/duckdb`), so "arbitrary composed SELECTs behave
  * like DuckDB" IS the product contract this fuzzer samples, beyond the
  * hand-picked battery rows.
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The same predicate in both dialects. */
  private final case class Pred(sql: String, api: Column)
  /** A select item (projection or aggregate) in both dialects. */
  private final case class Item(sql: String, api: Column, name: String)

  private final case class Tbl(
    name: String,
    uniqueKeys: Vector[String],       // total-order tiebreakers (non-null, unique as a tuple)
    groupables: Vector[String],       // low-cardinality group keys
    intCols: Set[String],             // int32 columns needing BIGINT casts
    money: Vector[String],            // 2-decimal doubles, DECIMAL(18,2)-summable
    predGroups: Vector[Vector[Pred]]  // at most ONE predicate drawn per group (per column)
  )

  private def tsPred(colName: String, op: String, v: String): Pred =
    Pred(s"$colName $op TIMESTAMP '$v'",
      if (op == "<") col(colName) < to_timestamp(lit(v))
      else col(colName) >= to_timestamp(lit(v)))

  private val lineitem = Tbl(
    "lineitem",
    // NOT (l_orderkey, l_linenumber): the synthetic lineitem violates
    // TPC-H's key (~20% of those pairs are duplicated, by generator
    // design), which made ROW_NUMBER over that order NONDETERMINISTIC —
    // found by the seed-386 sweep divergence (Spark and DuckDB broke a
    // tie differently at an rn boundary). l_extendedprice completes a
    // verified-unique triple at every test SF, and it's a 2-decimal
    // double both engines read bit-identically from the same parquet,
    // so the extended order is still cross-engine exact.
    uniqueKeys = Vector("l_orderkey", "l_linenumber", "l_extendedprice"),
    groupables = Vector("l_returnflag", "l_linestatus"),
    intCols = Set("l_linenumber"),
    money = Vector("l_extendedprice", "l_quantity"),
    predGroups = Vector(
      Vector(
        Pred("l_returnflag = 'R'", col("l_returnflag") === "R"),
        Pred("l_returnflag IN ('A', 'N')", col("l_returnflag").isin("A", "N"))),
      Vector(
        Pred("l_linestatus = 'O'", col("l_linestatus") === "O"),
        Pred("l_linestatus = 'F'", col("l_linestatus") === "F")),
      Vector(
        Pred("l_quantity <= 25.0", col("l_quantity") <= 25.0),
        Pred("l_quantity BETWEEN 10.0 AND 40.0", col("l_quantity").between(10.0, 40.0)),
        Pred("l_quantity > 35.0", col("l_quantity") > 35.0)),
      Vector(
        Pred("l_discount BETWEEN 0.02 AND 0.06", col("l_discount").between(0.02, 0.06)),
        Pred("l_discount < 0.05", col("l_discount") < 0.05)),
      Vector(
        tsPred("l_shipdate", "<", "1998-01-01 00:00:00"),
        tsPred("l_shipdate", ">=", "1996-06-01 00:00:00")),
      Vector(
        Pred("(l_orderkey % 7) = 3", col("l_orderkey") % 7 === 3),
        Pred("(l_orderkey % 5) = 0", col("l_orderkey") % 5 === 0))))

  private val orders = Tbl(
    "orders",
    uniqueKeys = Vector("o_orderkey"),
    groupables = Vector("o_orderstatus", "o_orderpriority"),
    intCols = Set.empty,
    money = Vector("o_totalprice"),
    predGroups = Vector(
      Vector(
        Pred("o_orderstatus = 'O'", col("o_orderstatus") === "O"),
        Pred("o_orderstatus = 'F'", col("o_orderstatus") === "F")),
      Vector(
        Pred("o_orderpriority = '1-URGENT'", col("o_orderpriority") === "1-URGENT"),
        Pred("o_orderpriority IN ('2-HIGH', '5-LOW')",
          col("o_orderpriority").isin("2-HIGH", "5-LOW"))),
      Vector(
        Pred("o_totalprice <= 250000.0", col("o_totalprice") <= 250000.0),
        Pred("o_totalprice > 100000.0", col("o_totalprice") > 100000.0)),
      Vector(
        tsPred("o_orderdate", "<", "1999-01-01 00:00:00"),
        tsPred("o_orderdate", ">=", "1996-01-01 00:00:00")),
      Vector(
        Pred("(o_custkey % 3) = 1", col("o_custkey") % 3 === 1))))

  private val customer = Tbl(
    "customer",
    uniqueKeys = Vector("c_custkey"),
    groupables = Vector("c_mktsegment", "c_nationkey"),
    intCols = Set("c_nationkey"),
    money = Vector("c_acctbal"),
    predGroups = Vector(
      Vector(
        Pred("c_mktsegment = 'BUILDING'", col("c_mktsegment") === "BUILDING"),
        Pred("c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')",
          col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))),
      Vector(
        Pred("c_acctbal > 0.0", col("c_acctbal") > 0.0),
        Pred("c_acctbal BETWEEN 1000.0 AND 8000.0", col("c_acctbal").between(1000.0, 8000.0))),
      Vector(
        Pred("c_nationkey < 12", col("c_nationkey") < 12),
        Pred("(c_custkey % 4) = 1", col("c_custkey") % 4 === 1))))

  private val part = Tbl(
    "part",
    uniqueKeys = Vector("p_partkey"),
    groupables = Vector("p_brand", "p_type", "p_size"),
    intCols = Set("p_size"),
    money = Vector("p_retailprice"),
    predGroups = Vector(
      Vector(
        Pred("p_type = 'PROMO'", col("p_type") === "PROMO"),
        Pred("p_type IN ('ECONOMY', 'STANDARD')", col("p_type").isin("ECONOMY", "STANDARD"))),
      Vector(
        Pred("p_size <= 20", col("p_size") <= 20),
        Pred("p_size BETWEEN 5 AND 25", col("p_size").between(5, 25))),
      Vector(
        Pred("p_retailprice BETWEEN 920.0 AND 980.0",
          col("p_retailprice").between(920.0, 980.0)))))

  private val supplier = Tbl(
    "supplier",
    uniqueKeys = Vector("s_suppkey"),
    groupables = Vector("s_nationkey"),
    intCols = Set("s_nationkey"),
    money = Vector("s_acctbal"),
    predGroups = Vector(
      Vector(
        Pred("s_nationkey < 15", col("s_nationkey") < 15),
        Pred("(s_suppkey % 2) = 0", col("s_suppkey") % 2 === 0)),
      Vector(
        Pred("s_acctbal > 0.0", col("s_acctbal") > 0.0))))

  private val baseTables = Vector(lineitem, orders, customer, part, supplier)

  /** Join edge: (dimension table, base key, dim key, broadcastable).
    * Broadcast marks true DIMENSIONS only — at 100 TB orders and
    * customer scale with the fact side and must shuffle-join. */
  private val joinEdges: Map[String, Vector[(Tbl, String, String, Boolean)]] = Map(
    "lineitem" -> Vector(
      (orders, "l_orderkey", "o_orderkey", false),
      (part, "l_partkey", "p_partkey", true),
      (supplier, "l_suppkey", "s_suppkey", true)),
    "orders" -> Vector((customer, "o_custkey", "c_custkey", false)),
    "customer" -> Vector.empty,
    "part" -> Vector.empty,
    "supplier" -> Vector.empty)

  private def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Projection item for a raw column, BIGINT-casting int32s so Spark and
    * DuckDB agree on the output schema. */
  private def colItem(t: Tbl, c: String): Item =
    if (t.intCols(c)) Item(s"CAST($c AS BIGINT) AS $c", col(c).cast("bigint").as(c), c)
    else Item(c, col(c), c)

  private def pickN[A](r: Random, xs: Vector[A], n: Int): Vector[A] =
    r.shuffle(xs).take(n)

  private def drawPreds(r: Random, t: Tbl, n: Int): Vector[Pred] =
    pickN(r, t.predGroups, n).map(g => g(r.nextInt(g.size)))

  /** Aggregate items: a0 is always COUNT(*) (HAVING's target), the rest
    * drawn from sum/min/max over money columns. */
  private def drawAggs(r: Random, tbls: Vector[Tbl], n: Int): Vector[Item] = {
    val money = tbls.flatMap(t => t.money)
    val cnt = Item("CAST(COUNT(*) AS BIGINT) AS a0", count(lit(1)).cast("bigint").as("a0"), "a0")
    val rest = (1 until n).toVector.map { i =>
      val c = money(r.nextInt(money.size))
      r.nextInt(3) match {
        case 0 => Item(s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS a$i",
          sum(col(c).cast(DecimalType(18, 2))).cast("double").as(s"a$i"), s"a$i")
        case 1 => Item(s"MIN($c) AS a$i", min(col(c)).as(s"a$i"), s"a$i")
        case _ => Item(s"MAX($c) AS a$i", max(col(c)).as(s"a$i"), s"a$i")
      }
    }
    cnt +: rest
  }

  /** Total ORDER BY over all output names with random directions; the
    * caller guarantees the name set is a total order (unique keys or a
    * full GROUP BY key set are always included). */
  private def orderClause(r: Random, names: Vector[String]): (String, Vector[Column]) = {
    val dirs = names.map(n => (n, r.nextBoolean()))
    (dirs.map { case (n, asc) => s"$n${if (asc) "" else " DESC"}" }.mkString(", "),
      dirs.map { case (n, asc) => if (asc) col(n).asc else col(n).desc })
  }

  private def whereSql(preds: Vector[Pred]): String =
    if (preds.isEmpty) "" else preds.map(_.sql).mkString(" WHERE ", " AND ", "")

  private def applyPreds(df: DataFrame, preds: Vector[Pred]): DataFrame =
    preds.foldLeft(df)((d, p) => d.filter(p.api))

  /** lineitem's computed revenue column, the battery's exact-money idiom. */
  private val revenueItem = Item(
    "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS DOUBLE) AS revenue",
    (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2))).cast(DecimalType(4, 2)))
      .cast(DecimalType(18, 4)).cast("double").as("revenue"),
    "revenue")

  // ---------------------------------------------------------------- shapes

  private def scanShape(r: Random, t: Tbl): (Q, String) = {
    val extra = pickN(r, t.groupables ++ t.money, 1 + r.nextInt(2))
    val withRevenue = t.name == "lineitem" && r.nextBoolean()
    val items = (t.uniqueKeys ++ extra).distinct.map(c => colItem(t, c)) ++
      (if (withRevenue) Vector(revenueItem) else Vector.empty)
    val preds = drawPreds(r, t, 1 + r.nextInt(3))
    val limit = 100 + r.nextInt(300)
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val sql = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${t.name}" +
      s"${whereSql(preds)} ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => applyPreds(read(s, dir, t.name), preds)
      .select(items.map(_.api): _*).orderBy(obApi: _*).limit(limit)
    (q, sql)
  }

  private def aggShape(r: Random, t: Tbl): (Q, String) = {
    val keys = pickN(r, t.groupables, 1 + r.nextInt(math.min(2, t.groupables.size)))
    val keyItems = keys.map(c => colItem(t, c))
    val aggs = drawAggs(r, Vector(t), 1 + r.nextInt(3))
    val preds = drawPreds(r, t, r.nextInt(3))
    val having = r.nextBoolean()
    val (obSql, obApi) = orderClause(r, keyItems.map(_.name) ++ aggs.map(_.name))
    val havingSql = if (having) " HAVING COUNT(*) >= 2" else ""
    val sql = s"SELECT ${(keyItems ++ aggs).map(_.sql).mkString(", ")} FROM ${t.name}" +
      s"${whereSql(preds)} GROUP BY ${keys.mkString(", ")}$havingSql ORDER BY $obSql"
    val q: Q = (s, dir) => {
      val g = applyPreds(read(s, dir, t.name), preds)
        .groupBy(keyItems.map(_.api): _*).agg(aggs.head.api, aggs.tail.map(_.api): _*)
      (if (having) g.filter(col("a0") >= 2) else g).orderBy(obApi: _*)
    }
    (q, sql)
  }

  private def joinAggShape(r: Random, t: Tbl): (Q, String) = {
    val edges0 = joinEdges(t.name)
    val first = edges0(r.nextInt(edges0.size))
    // optional second hop from the first dimension (e.g. lineitem ->
    // orders -> customer)
    val second = joinEdges(first._1.name) match {
      case es if es.nonEmpty && r.nextBoolean() => Some(es(r.nextInt(es.size)))
      case _ => None
    }
    val tbls = Vector(t, first._1) ++ second.map(_._1)
    val keys = pickN(r, tbls.flatMap(_.groupables), 1 + r.nextInt(2))
    val keyItems = keys.map { c =>
      val owner = tbls.find(tb => tb.groupables.contains(c)).get
      colItem(owner, c)
    }
    val aggs = drawAggs(r, tbls, 1 + r.nextInt(3))
    val preds = tbls.flatMap(tb => drawPreds(r, tb, r.nextInt(2)))
    val (obSql, obApi) = orderClause(r, keyItems.map(_.name) ++ aggs.map(_.name))
    val joinSql = s"${t.name} JOIN ${first._1.name} ON ${first._2} = ${first._3}" +
      second.map(e => s" JOIN ${e._1.name} ON ${e._2} = ${e._3}").getOrElse("")
    val sql = s"SELECT ${(keyItems ++ aggs).map(_.sql).mkString(", ")} FROM $joinSql" +
      s"${whereSql(preds)} GROUP BY ${keys.mkString(", ")} ORDER BY $obSql"
    val q: Q = (s, dir) => {
      def dim(e: (Tbl, String, String, Boolean)): DataFrame = {
        val d = read(s, dir, e._1.name)
        if (e._4) broadcast(d) else d
      }
      val j0 = read(s, dir, t.name).join(dim(first), col(first._2) === col(first._3))
      val j = second.fold(j0)(e => j0.join(dim(e), col(e._2) === col(e._3)))
      applyPreds(j, preds)
        .groupBy(keyItems.map(_.api): _*).agg(aggs.head.api, aggs.tail.map(_.api): _*)
        .orderBy(obApi: _*)
    }
    (q, sql)
  }

  private def windowShape(r: Random, t: Tbl): (Q, String) = {
    val g = t.groupables(r.nextInt(t.groupables.size))
    val keep = 2 + r.nextInt(4)
    val m = t.money(r.nextInt(t.money.size))
    // distinct AFTER appending m: lineitem's uniqueKeys include
    // l_extendedprice (also a money col), and a duplicate output column
    // is an analyzer error in Spark
    val items = (Vector(g) ++ t.uniqueKeys :+ m).distinct.map(c => colItem(t, c))
    val preds = drawPreds(r, t, r.nextInt(3))
    val fn = if (r.nextBoolean()) "ROW_NUMBER" else "RANK"
    val over = s"PARTITION BY $g ORDER BY ${t.uniqueKeys.mkString(", ")}"
    val (obSql, obApi) = orderClause(r, items.map(_.name) :+ "rn")
    val sql =
      s"SELECT ${items.map(_.name).mkString(", ")}, rn FROM (" +
        s"SELECT ${items.map(_.sql).mkString(", ")}, " +
        s"CAST($fn() OVER ($over) AS BIGINT) AS rn FROM ${t.name}${whereSql(preds)}" +
        s") s WHERE rn <= $keep ORDER BY $obSql"
    val q: Q = (s, dir) => {
      val w = Window.partitionBy(col(g)).orderBy(t.uniqueKeys.map(col): _*)
      val rnc = (if (fn == "ROW_NUMBER") row_number() else rank()).over(w).cast("bigint")
      applyPreds(read(s, dir, t.name), preds)
        .select(items.map(_.api) :+ rnc.as("rn"): _*)
        .filter(col("rn") <= keep).orderBy(obApi: _*)
    }
    (q, sql)
  }

  private def unionScanShape(r: Random, t: Tbl): (Q, String) = {
    val extra = pickN(r, t.groupables ++ t.money, 1)
    val items = (t.uniqueKeys ++ extra).distinct.map(c => colItem(t, c))
    val p1 = drawPreds(r, t, 1 + r.nextInt(2))
    val p2 = drawPreds(r, t, 1 + r.nextInt(2))
    val limit = 100 + r.nextInt(200)
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val sel = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${t.name}"
    // UNION ALL can duplicate rows; the ORDER BY key set covers every
    // output column, so boundary ties under LIMIT are EXACT duplicate
    // rows and the selected multiset is deterministic either way.
    val sql = s"SELECT * FROM ($sel${whereSql(p1)} UNION ALL $sel${whereSql(p2)}) u" +
      s" ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => {
      def side(p: Vector[Pred]) =
        applyPreds(read(s, dir, t.name), p).select(items.map(_.api): _*)
      side(p1).union(side(p2)).orderBy(obApi: _*).limit(limit)
    }
    (q, sql)
  }

  private def distinctShape(r: Random, t: Tbl): (Q, String) = {
    val keys = pickN(r, t.groupables, 1 + r.nextInt(math.min(2, t.groupables.size)))
    val items = keys.map(c => colItem(t, c))
    val preds = drawPreds(r, t, r.nextInt(3))
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val sql = s"SELECT DISTINCT ${items.map(_.sql).mkString(", ")} FROM ${t.name}" +
      s"${whereSql(preds)} ORDER BY $obSql"
    val q: Q = (s, dir) => applyPreds(read(s, dir, t.name), preds)
      .select(items.map(_.api): _*).distinct().orderBy(obApi: _*)
    (q, sql)
  }

  /** Semi/anti edges: (base, subquery table, base key, sub key). */
  private val semiEdges: Vector[(Tbl, Tbl, String, String)] = Vector(
    (orders, lineitem, "o_orderkey", "l_orderkey"),
    (customer, orders, "c_custkey", "o_custkey"),
    (part, lineitem, "p_partkey", "l_partkey"),
    (supplier, lineitem, "s_suppkey", "l_suppkey"))

  private def semiAntiShape(r: Random): (Q, String) = {
    val (base, sub, bk, sk) = semiEdges(r.nextInt(semiEdges.size))
    val anti = r.nextBoolean()
    val items = (base.uniqueKeys ++ pickN(r, base.groupables ++ base.money, 1))
      .distinct.map(c => colItem(base, c))
    val basePreds = drawPreds(r, base, r.nextInt(2))
    val subPreds = drawPreds(r, sub, 1 + r.nextInt(2))
    val limit = 100 + r.nextInt(200)
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val existsKw = if (anti) "NOT EXISTS" else "EXISTS"
    val sql = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${base.name}" +
      s" WHERE $existsKw (SELECT 1 FROM ${sub.name} WHERE $sk = $bk" +
      subPreds.map(p => s" AND ${p.sql}").mkString + ")" +
      basePreds.map(p => s" AND ${p.sql}").mkString +
      s" ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => {
      val subDf = applyPreds(read(s, dir, sub.name), subPreds)
      applyPreds(read(s, dir, base.name), basePreds)
        .join(subDf, col(bk) === col(sk), if (anti) "leftanti" else "leftsemi")
        .select(items.map(_.api): _*).orderBy(obApi: _*).limit(limit)
    }
    (q, sql)
  }

  private def caseAggShape(r: Random, t: Tbl): (Q, String) = {
    val key = t.groupables(r.nextInt(t.groupables.size))
    val keyItem = colItem(t, key)
    val m = t.money(r.nextInt(t.money.size))
    // the conditional draws from a DIFFERENT predicate group than the
    // WHERE below can (both sample the full pool; collisions are fine —
    // a pred AND'd with itself is still exact on both engines)
    val condPred = { val g = t.predGroups(r.nextInt(t.predGroups.size)); g(r.nextInt(g.size)) }
    val aggs = Vector(
      Item("CAST(COUNT(*) AS BIGINT) AS a0",
        count(lit(1)).cast("bigint").as("a0"), "a0"),
      Item(s"CAST(SUM(CASE WHEN ${condPred.sql} THEN CAST($m AS DECIMAL(18,2)) " +
        "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS a1",
        sum(when(condPred.api, col(m).cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("a1"), "a1"),
      Item(s"CAST(COUNT(CASE WHEN ${condPred.sql} THEN 1 END) AS BIGINT) AS a2",
        count(when(condPred.api, lit(1))).cast("bigint").as("a2"), "a2"))
    val preds = drawPreds(r, t, r.nextInt(2))
    val (obSql, obApi) = orderClause(r, Vector(keyItem.name) ++ aggs.map(_.name))
    val sql = s"SELECT ${(keyItem +: aggs).map(_.sql).mkString(", ")} FROM ${t.name}" +
      s"${whereSql(preds)} GROUP BY $key ORDER BY $obSql"
    val q: Q = (s, dir) => applyPreds(read(s, dir, t.name), preds)
      .groupBy(keyItem.api).agg(aggs.head.api, aggs.tail.map(_.api): _*)
      .orderBy(obApi: _*)
    (q, sql)
  }

  private def setOpShape(r: Random, t: Tbl): (Q, String) = {
    val keys = pickN(r, t.groupables, 1 + r.nextInt(math.min(2, t.groupables.size)))
    val items = keys.map(c => colItem(t, c))
    val p1 = drawPreds(r, t, 1 + r.nextInt(2))
    val p2 = drawPreds(r, t, 1 + r.nextInt(2))
    val op = if (r.nextBoolean()) "INTERSECT" else "EXCEPT"
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val sel = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${t.name}"
    // INTERSECT/EXCEPT are DISTINCT set semantics in both engines
    val sql = s"$sel${whereSql(p1)} $op $sel${whereSql(p2)} ORDER BY $obSql"
    val q: Q = (s, dir) => {
      def side(p: Vector[Pred]) =
        applyPreds(read(s, dir, t.name), p).select(items.map(_.api): _*)
      val combined = if (op == "INTERSECT") side(p1).intersect(side(p2))
                     else side(p1).except(side(p2))
      combined.orderBy(obApi: _*)
    }
    (q, sql)
  }

  /** Null-generating outer join: customers without orders surface NULL
    * order columns, exercising null-tolerant aggregation on both
    * engines (COUNT(col) skips nulls, SUM/MIN of all-null groups is
    * NULL). Predicates draw from the PRESERVED side only — a WHERE on
    * the nullable side would silently turn the join inner. */
  private def leftJoinAggShape(r: Random): (Q, String) = {
    val keys = pickN(r, customer.groupables, 1 + r.nextInt(2))
    val keyItems = keys.map(c => colItem(customer, c))
    val aggs = Vector(
      Item("CAST(COUNT(o_orderkey) AS BIGINT) AS a0",
        count(col("o_orderkey")).cast("bigint").as("a0"), "a0"),
      Item("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS a1",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("a1"), "a1")) ++
      (if (r.nextBoolean())
        Vector(Item("MIN(o_totalprice) AS a2", min(col("o_totalprice")).as("a2"), "a2"))
      else Vector.empty)
    val preds = drawPreds(r, customer, r.nextInt(3))
    val (obSql, obApi) = orderClause(r, keyItems.map(_.name) ++ aggs.map(_.name))
    val sql = s"SELECT ${(keyItems ++ aggs).map(_.sql).mkString(", ")} " +
      s"FROM customer LEFT JOIN orders ON c_custkey = o_custkey" +
      s"${whereSql(preds)} GROUP BY ${keys.mkString(", ")} ORDER BY $obSql"
    val q: Q = (s, dir) =>
      applyPreds(read(s, dir, "customer"), preds)
        .join(read(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(keyItems.map(_.api): _*).agg(aggs.head.api, aggs.tail.map(_.api): _*)
        .orderBy(obApi: _*)
    (q, sql)
  }

  /** ROLLUP over two STRING group keys (no casts — DuckDB matches
    * GROUP BY ROLLUP expressions to select items structurally, and
    * string keys need none), with GROUPING() markers cast to BIGINT on
    * both sides so subtotal rows are disambiguated from genuine-NULL
    * keys the way both engines define it. */
  private val rollupTables = Vector(
    (lineitem, "l_returnflag", "l_linestatus"),
    (orders, "o_orderstatus", "o_orderpriority"),
    (part, "p_brand", "p_type"))

  private def rollupShape(r: Random): (Q, String) = {
    val (t, g1, g2) = rollupTables(r.nextInt(rollupTables.size))
    val m = t.money(r.nextInt(t.money.size))
    val preds = drawPreds(r, t, r.nextInt(3))
    val names = Vector("gf1", "gf2", g1, g2, "a0", "a1")
    val (obSql, obApi) = orderClause(r, names)
    val sql = s"SELECT CAST(GROUPING($g1) AS BIGINT) AS gf1, " +
      s"CAST(GROUPING($g2) AS BIGINT) AS gf2, $g1, $g2, " +
      s"CAST(COUNT(*) AS BIGINT) AS a0, " +
      s"CAST(SUM(CAST($m AS DECIMAL(18,2))) AS DOUBLE) AS a1 " +
      s"FROM ${t.name}${whereSql(preds)} GROUP BY ROLLUP ($g1, $g2) ORDER BY $obSql"
    val q: Q = (s, dir) => applyPreds(read(s, dir, t.name), preds)
      .rollup(col(g1), col(g2))
      .agg(grouping(col(g1)).cast("bigint").as("gf1"),
        grouping(col(g2)).cast("bigint").as("gf2"),
        count(lit(1)).cast("bigint").as("a0"),
        sum(col(m).cast(DecimalType(18, 2))).cast("double").as("a1"))
      .select(col("gf1"), col("gf2"), col(g1), col(g2), col("a0"), col("a1"))
      .orderBy(obApi: _*)
    (q, sql)
  }

  /** Uncorrelated scalar subquery threshold: `m > (SELECT MAX(m2)*0.5
    * FROM t WHERE …)`. MAX over shared parquet doubles is bit-identical
    * in both engines and *0.5 is exact binary, so the filter cuts the
    * same rows; the API side expresses it as a broadcast cross join —
    * which IS the distributed plan a scalar subquery lowers to. An
    * empty subquery yields NULL and zero output rows in both engines. */
  private def scalarSubShape(r: Random, t: Tbl): (Q, String) = {
    val m = t.money(r.nextInt(t.money.size))
    val m2 = t.money(r.nextInt(t.money.size))
    val subPreds = drawPreds(r, t, 1 + r.nextInt(2))
    val basePreds = drawPreds(r, t, r.nextInt(2))
    val items = (t.uniqueKeys :+ m).distinct.map(c => colItem(t, c))
    val limit = 100 + r.nextInt(200)
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val sql = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${t.name}" +
      s" WHERE $m > (SELECT MAX($m2) * 0.5 FROM ${t.name}${whereSql(subPreds)})" +
      basePreds.map(p => s" AND ${p.sql}").mkString +
      s" ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => {
      val thr = applyPreds(read(s, dir, t.name), subPreds)
        .agg((max(col(m2)) * 0.5).as("__thr"))
      applyPreds(read(s, dir, t.name), basePreds)
        .crossJoin(broadcast(thr))
        .filter(col(m) > col("__thr"))
        .select(items.map(_.api): _*).orderBy(obApi: _*).limit(limit)
    }
    (q, sql)
  }

  /** `bk IN (SELECT sk FROM sub WHERE …)` — with non-null keys this is
    * exactly the leftsemi join EXISTS lowers to, but IN-subquery is a
    * distinct surface in both parsers (null-handling rules differ from
    * EXISTS in general), so it earns its own differential shape. */
  private def inSubShape(r: Random): (Q, String) = {
    val (base, sub, bk, sk) = semiEdges(r.nextInt(semiEdges.size))
    val items = (base.uniqueKeys ++ pickN(r, base.groupables ++ base.money, 1))
      .distinct.map(c => colItem(base, c))
    val basePreds = drawPreds(r, base, r.nextInt(2))
    val subPreds = drawPreds(r, sub, 1 + r.nextInt(2))
    val limit = 100 + r.nextInt(200)
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val sql = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${base.name}" +
      s" WHERE $bk IN (SELECT $sk FROM ${sub.name}${whereSql(subPreds)})" +
      basePreds.map(p => s" AND ${p.sql}").mkString +
      s" ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => {
      val subDf = applyPreds(read(s, dir, sub.name), subPreds)
      applyPreds(read(s, dir, base.name), basePreds)
        .join(subDf, col(bk) === col(sk), "leftsemi")
        .select(items.map(_.api): _*).orderBy(obApi: _*).limit(limit)
    }
    (q, sql)
  }

  /** Correlated scalar subquery: `(SELECT COUNT(*) FROM sub WHERE fk =
    * pk AND …)` per base row. The API side is the distributed lowering —
    * pre-aggregate the subquery side by its key, left-join, COALESCE
    * the no-match rows to 0 (COUNT of an empty correlated set is 0,
    * not NULL, in both engines). */
  private def corrScalarShape(r: Random): (Q, String) = {
    val (base, sub, bk, sk) = semiEdges(r.nextInt(semiEdges.size))
    val items = (base.uniqueKeys ++ pickN(r, base.groupables, 1))
      .distinct.map(c => colItem(base, c))
    val basePreds = drawPreds(r, base, r.nextInt(2))
    val subPreds = drawPreds(r, sub, 1 + r.nextInt(2))
    val limit = 100 + r.nextInt(200)
    val (obSql, obApi) = orderClause(r, items.map(_.name) :+ "cnt")
    val sql = s"SELECT ${items.map(_.sql).mkString(", ")}, " +
      s"CAST((SELECT COUNT(*) FROM ${sub.name} WHERE $sk = $bk" +
      subPreds.map(p => s" AND ${p.sql}").mkString + ") AS BIGINT) AS cnt" +
      s" FROM ${base.name}${whereSql(basePreds)} ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => {
      val counts = applyPreds(read(s, dir, sub.name), subPreds)
        .groupBy(col(sk)).agg(count(lit(1)).as("__cnt"))
      applyPreds(read(s, dir, base.name), basePreds)
        .join(counts, col(bk) === col(sk), "left")
        .select(items.map(_.api) :+
          coalesce(col("__cnt"), lit(0L)).cast("bigint").as("cnt"): _*)
        .orderBy(obApi: _*).limit(limit)
    }
    (q, sql)
  }

  // ------------------------------------- semantic dark-corner shapes (r17)
  //
  // Four shapes targeting the classes where Spark and DuckDB semantics
  // genuinely diverge by DEFAULT and agreement must be spelled out —
  // exactly where a wrong-answer bug in Spark usage (not test plumbing)
  // would hide: null ordering (Spark defaults NULLS FIRST on ASC, DuckDB
  // NULLS LAST — every nullable sort key below carries an explicit
  // NULLS clause in BOTH dialects), window frames (ROWS/RANGE with
  // unbounded and negative offsets, including empty frames that SUM to
  // NULL), outer joins with predicates on the null-extended side (ON- vs
  // WHERE-placement changes the join's meaning), and DECIMAL/DOUBLE
  // mixed arithmetic (promotion rules differ; the templates pin the
  // exact-representable subset).

  /** orderClause for outputs that may contain NULLs: nullable names get
    * an explicit seeded NULLS FIRST/LAST in both dialects (the engines'
    * DEFAULTS disagree), non-nullable names render as [[orderClause]]. */
  private def orderClauseN(r: Random, names: Vector[String],
                           nullable: Set[String]): (String, Vector[Column]) = {
    val picks = names.map(n => (n, r.nextBoolean(), r.nextBoolean()))
    (picks.map { case (n, asc, nf) =>
      s"$n${if (asc) "" else " DESC"}" +
        (if (nullable(n)) { if (nf) " NULLS FIRST" else " NULLS LAST" } else "")
    }.mkString(", "),
      picks.map { case (n, asc, nf) =>
        if (!nullable(n)) { if (asc) col(n).asc else col(n).desc }
        else (asc, nf) match {
          case (true, true)   => col(n).asc_nulls_first
          case (true, false)  => col(n).asc_nulls_last
          case (false, true)  => col(n).desc_nulls_first
          case (false, false) => col(n).desc_nulls_last
        }
      })
  }

  /** NULLS FIRST/LAST ordering over a CASE-generated nullable column.
    * The base tables are non-null by design, so the null source is an
    * ELSE-less CASE (NULL when the condition fails) — same rows null on
    * both engines. */
  private def nullsOrderShape(r: Random, t: Tbl): (Q, String) = {
    val m = t.money(r.nextInt(t.money.size))
    val cond = { val g = t.predGroups(r.nextInt(t.predGroups.size)); g(r.nextInt(g.size)) }
    val keyItems = t.uniqueKeys.map(c => colItem(t, c))
    val mval = Item(s"CASE WHEN ${cond.sql} THEN $m END AS mval",
      when(cond.api, col(m)).as("mval"), "mval")
    val preds = drawPreds(r, t, r.nextInt(2))
    val limit = 100 + r.nextInt(300)
    val (obSql, obApi) = orderClauseN(r, Vector("mval") ++ keyItems.map(_.name), Set("mval"))
    val sql = s"SELECT ${(keyItems :+ mval).map(_.sql).mkString(", ")} FROM ${t.name}" +
      s"${whereSql(preds)} ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => applyPreds(read(s, dir, t.name), preds)
      .select((keyItems :+ mval).map(_.api): _*).orderBy(obApi: _*).limit(limit)
    (q, sql)
  }

  /** RANGE frames need a single numeric order key; BIGINT-cast in both
    * dialects so Spark's frame-boundary type check is satisfied and
    * DuckDB sees the identical sort type. */
  private val rangeKeys: Map[String, String] = Map(
    "lineitem" -> "l_linenumber", "orders" -> "o_orderkey",
    "customer" -> "c_custkey", "part" -> "p_size", "supplier" -> "s_nationkey")

  private def frameBoundSql(v: Long): String = v match {
    case Long.MinValue      => "UNBOUNDED PRECEDING"
    case Long.MaxValue      => "UNBOUNDED FOLLOWING"
    case 0L                 => "CURRENT ROW"
    case n if n < 0         => s"${-n} PRECEDING"
    case n                  => s"$n FOLLOWING"
  }

  /** Window frames: SUM(DECIMAL money) over seeded ROWS/RANGE frames,
    * including unbounded bounds, negative offsets (N PRECEDING .. M
    * PRECEDING), and therefore frames that are EMPTY on leading rows
    * (SUM = NULL — projected, so the differential hashes the engines'
    * empty-frame agreement too). ROWS orders by the full unique-key
    * tuple (frame contents are order-exact); RANGE orders by one BIGINT
    * key, where ties share a frame by definition so duplicates stay
    * deterministic. */
  private def frameWindowShape(r: Random, t: Tbl): (Q, String) = {
    val g = t.groupables(r.nextInt(t.groupables.size))
    val m = t.money(r.nextInt(t.money.size))
    val keyItems = (Vector(g) ++ t.uniqueKeys).distinct.map(c => colItem(t, c))
    val preds = drawPreds(r, t, r.nextInt(2))
    val bounds = Vector[(Long, Long)](
      (Long.MinValue, 0L), (-2L, 0L), (-1L, 1L), (0L, Long.MaxValue), (-3L, -1L))
    val (lo, hi) = bounds(r.nextInt(bounds.size))
    val rows = r.nextBoolean()
    val rk = rangeKeys(t.name)
    val (frameSql, overApi) =
      if (rows) {
        val w = Window.partitionBy(col(g)).orderBy(t.uniqueKeys.map(col): _*)
          .rowsBetween(lo, hi)
        (s"PARTITION BY $g ORDER BY ${t.uniqueKeys.mkString(", ")} " +
          s"ROWS BETWEEN ${frameBoundSql(lo)} AND ${frameBoundSql(hi)}", w)
      } else {
        val w = Window.partitionBy(col(g)).orderBy(col(rk).cast("bigint"))
          .rangeBetween(lo, hi)
        (s"PARTITION BY $g ORDER BY CAST($rk AS BIGINT) " +
          s"RANGE BETWEEN ${frameBoundSql(lo)} AND ${frameBoundSql(hi)}", w)
      }
    val w0 = Item(
      s"CAST(SUM(CAST($m AS DECIMAL(18,2))) OVER ($frameSql) AS DOUBLE) AS w0",
      sum(col(m).cast(DecimalType(18, 2))).over(overApi).cast("double").as("w0"), "w0")
    val limit = 100 + r.nextInt(300)
    // w0 is functionally determined by the row (partition + order are
    // total), so ordering by the unique keys alone is a total order
    val (obSql, obApi) = orderClause(r, keyItems.map(_.name))
    val sql = s"SELECT ${(keyItems :+ w0).map(_.sql).mkString(", ")} FROM ${t.name}" +
      s"${whereSql(preds)} ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => applyPreds(read(s, dir, t.name), preds)
      .select((keyItems :+ w0).map(_.api): _*).orderBy(obApi: _*).limit(limit)
    (q, sql)
  }

  /** Outer-join edges: (preserved side, null-extended side, left key,
    * right key). Both are fact-fact joins — they shuffle on their keys
    * at scale, as they must. */
  private val outerEdges: Vector[(Tbl, Tbl, String, String)] = Vector(
    (orders, lineitem, "o_orderkey", "l_orderkey"),
    (customer, orders, "c_custkey", "o_custkey"))

  /** LEFT JOIN with predicates on the NULL-EXTENDED side in BOTH
    * positions: inside ON (restricts which rows match, keeps every
    * preserved row) and in WHERE behind an explicit IS-NULL escape
    * (without it the filter silently turns the join inner — the classic
    * outer-join bug this shape exists to differentiate). Nullable
    * right-side keys are projected and sorted with explicit NULLS
    * clauses. */
  private def outerFilterShape(r: Random): (Q, String) = {
    val (lt, rt, lk, rk) = outerEdges(r.nextInt(outerEdges.size))
    val onPreds = drawPreds(r, rt, 1 + r.nextInt(2))
    val leftPreds = drawPreds(r, lt, r.nextInt(2))
    val rm = rt.money(r.nextInt(rt.money.size))
    val post: Option[Pred] =
      if (r.nextBoolean()) Some { val g = rt.predGroups(r.nextInt(rt.predGroups.size)); g(r.nextInt(g.size)) }
      else None
    val leftItems = (lt.uniqueKeys ++ pickN(r, lt.groupables, 1)).distinct.map(c => colItem(lt, c))
    val rightItems = rt.uniqueKeys.map(c => colItem(rt, c))
    val rm0 = Item(
      s"CAST(COALESCE(CAST($rm AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS rm0",
      coalesce(col(rm).cast(DecimalType(18, 2)), lit(0).cast(DecimalType(18, 2)))
        .cast("double").as("rm0"), "rm0")
    val items = leftItems ++ rightItems :+ rm0
    val nullable = rightItems.map(_.name).toSet
    val limit = 150 + r.nextInt(300)
    val (obSql, obApi) = orderClauseN(r, items.map(_.name), nullable)
    val onSql = s"$lk = $rk" + onPreds.map(p => s" AND ${p.sql}").mkString
    val whereParts =
      leftPreds.map(_.sql) :+ post.fold(s"$rk IS NULL")(p => s"($rk IS NULL OR ${p.sql})")
    val sql = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${lt.name}" +
      s" LEFT JOIN ${rt.name} ON $onSql" +
      s" WHERE ${whereParts.mkString(" AND ")} ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => {
      val onApi = onPreds.foldLeft(col(lk) === col(rk))((c, p) => c && p.api)
      val joined = read(s, dir, lt.name).join(read(s, dir, rt.name), onApi, "left")
      val postApi = post.fold(col(rk).isNull)(p => col(rk).isNull || p.api)
      applyPreds(joined, leftPreds).filter(postApi)
        .select(items.map(_.api): _*).orderBy(obApi: _*).limit(limit)
    }
    (q, sql)
  }

  /** DECIMAL/DOUBLE mixed arithmetic over the exact-representable
    * subset: decimal+decimal (scale-aligned), decimal×int, a
    * double-digit-product normalized through an explicit DECIMAL(30,4)
    * cast, and an implicit decimal→double promotion (both engines
    * resolve decimal × double to DOUBLE; the row-level IEEE ops after
    * that are bit-identical). Division is excluded — result scale rules
    * genuinely differ and would fail the differential on rounding, not
    * on a bug. */
  private def mixedArithShape(r: Random, t: Tbl): (Q, String) = {
    val m1 = t.money(r.nextInt(t.money.size))
    val m2 = t.money(r.nextInt(t.money.size))
    val k = 2 + r.nextInt(8)
    val templates = Vector[Item](
      Item(s"CAST(CAST($m1 AS DECIMAL(18,2)) + CAST($m2 AS DECIMAL(18,2)) AS DOUBLE) AS v0",
        (col(m1).cast(DecimalType(18, 2)) + col(m2).cast(DecimalType(18, 2)))
          .cast("double").as("v0"), "v0"),
      Item(s"CAST(CAST($m1 AS DECIMAL(18,2)) * $k AS DOUBLE) AS v1",
        (col(m1).cast(DecimalType(18, 2)) * lit(k)).cast("double").as("v1"), "v1"),
      Item(s"CAST(CAST(CAST($m1 AS DECIMAL(18,2)) * CAST($m2 AS DECIMAL(9,2)) AS DECIMAL(30,4)) AS DOUBLE) AS v2",
        (col(m1).cast(DecimalType(18, 2)) * col(m2).cast(DecimalType(9, 2)))
          .cast(DecimalType(30, 4)).cast("double").as("v2"), "v2"),
      Item(s"CAST($m1 AS DECIMAL(18,2)) * CAST(1.5 AS DOUBLE) + $m2 AS v3",
        (col(m1).cast(DecimalType(18, 2)) * lit(1.5) + col(m2)).as("v3"), "v3"))
    val picked = pickN(r, templates, 2)
    val keyItems = t.uniqueKeys.map(c => colItem(t, c))
    val items = keyItems ++ picked
    val preds = drawPreds(r, t, 1 + r.nextInt(2))
    val limit = 100 + r.nextInt(300)
    val (obSql, obApi) = orderClause(r, items.map(_.name))
    val sql = s"SELECT ${items.map(_.sql).mkString(", ")} FROM ${t.name}" +
      s"${whereSql(preds)} ORDER BY $obSql LIMIT $limit"
    val q: Q = (s, dir) => applyPreds(read(s, dir, t.name), preds)
      .select(items.map(_.api): _*).orderBy(obApi: _*).limit(limit)
    (q, sql)
  }

  // ------------------------------------------------------------- generator

  final case class Generated(shape: String, query: Q, sql: String)

  /** Deterministic: same seed, same (plan, SQL) pair — java.util.Random's
    * LCG is specified behavior, stable across JVMs. */
  def generate(seed: Long): Generated = {
    val r = new Random(seed)
    val shapes = Vector[(String, Random => (Q, String))](
      ("scan", rr => scanShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("agg", rr => aggShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("join_agg", rr => {
        val joinable = Vector(lineitem, orders)
        joinAggShape(rr, joinable(rr.nextInt(joinable.size)))
      }),
      ("window", rr => windowShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("union_scan", rr => unionScanShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("distinct", rr => distinctShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("semi_anti", rr => semiAntiShape(rr)),
      ("case_agg", rr => caseAggShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("setop", rr => setOpShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("left_join_agg", rr => leftJoinAggShape(rr)),
      ("rollup", rr => rollupShape(rr)),
      ("scalar_sub", rr => scalarSubShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("in_sub", rr => inSubShape(rr)),
      ("corr_scalar", rr => corrScalarShape(rr)),
      ("nulls_order", rr => nullsOrderShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("frame_window", rr => frameWindowShape(rr, baseTables(rr.nextInt(baseTables.size)))),
      ("outer_filter", rr => outerFilterShape(rr)),
      ("mixed_arith", rr => mixedArithShape(rr, baseTables(rr.nextInt(baseTables.size)))))
    val (name, f) = shapes(r.nextInt(shapes.size))
    val (q, sql) = f(r)
    Generated(name, q, sql)
  }

  /** Battery seeds — eighteen rows, one per shape (asserted by
    * FuzzSpec so a generator change that silently redistributes
    * shapes fails loudly). Re-picked when the r17 dark-corner shapes
    * widened the grammar to 18 (the shape draw is mod shapes.size, so
    * growing the vector remaps every seed — the rows are generated
    * pairs, so the gate re-derives plan and oracle together and the
    * change is content-neutral by construction). */
  private[graft] val batterySeeds: Vector[(String, Long)] = Vector(
    ("q190_fuzz_scan", 11L),
    ("q191_fuzz_agg", 9L),
    ("q192_fuzz_join_agg", 30L),
    ("q193_fuzz_window", 15L),
    ("q194_fuzz_union_scan", 2L),
    ("q195_fuzz_distinct", 19L),
    ("q196_fuzz_semi_anti", 49L),
    ("q197_fuzz_case_agg", 6L),
    ("q198_fuzz_setop", 4L),
    ("q199_fuzz_left_join_agg", 10L),
    ("q200_fuzz_rollup", 8L),
    ("q201_fuzz_scalar_sub", 14L),
    ("q202_fuzz_in_sub", 12L),
    ("q203_fuzz_corr_scalar", 29L),
    ("q204_fuzz_nulls_order", 3L),
    ("q205_fuzz_frame_window", 1L),
    ("q206_fuzz_outer_filter", 7L),
    ("q207_fuzz_mixed_arith", 5L))

  private[graft] def expectedShape(name: String): String =
    name.substring("q19N_fuzz_".length)

  val queries: Map[String, Q] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).query
  }: _*)

  val oracles: Map[String, String] = ListMap(batterySeeds.map { case (n, seed) =>
    n -> generate(seed).sql
  }: _*)
}
