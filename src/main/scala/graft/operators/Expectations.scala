package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a
  * pipeline runs before trusting a batch (the Deequ / dbt-tests /
  * Great-Expectations category). The reference trusts its backends'
  * type coercion and reports per-row insert failures
  * (`/root/reference/pkg/api/data.go:108-120`); at warehouse scale the
  * question inverts: the batch landed, is it SANE? Null keys, broken
  * uniqueness, out-of-range measures, dangling foreign keys — each
  * rule evaluates to a violation count, and the report is the
  * merge-or-quarantine decision input.
  *
  * Execution shape, built for the 100 TB batch:
  *
  *  - ALL row-local rules (`notNull`, `inRange`, `matches`, `satisfies`)
  *    fuse into ONE aggregate over ONE scan — adding a rule adds a
  *    `sum(when(...))` buffer, never a pass (single-leaf plan pinned in
  *    ExpectationsSpec);
  *  - `unique` needs its own shuffle (duplicates are a cross-row fact):
  *    one partial-aggregated exchange to O(distinct keys), violations =
  *    Σ(count − 1) over over-represented keys;
  *  - `foreignKey` is a left-anti join probing the dimension — the big
  *    side streams, and Catalyst broadcasts the dim when it fits.
  *
  * The report is tiny (one row per rule), deterministic, and every
  * count is replayable as plain SQL — which is how the battery
  * hash-checks it against DuckDB.
  */
object Expectations {

  /** One expectation: a name, and a violation-count plan. */
  sealed trait Rule { def name: String }

  /** `col` must never be null. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null:$col"
  }
  /** `col` (when non-null) must lie in `[lo, hi]`, inclusive. Nulls are
    * `NotNull`'s business — range rules don't double-count them. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range:$col"
  }
  /** `col` (when non-null) must match the regex. */
  final case class Matches(col: String, regex: String) extends Rule {
    val name = s"matches:$col"
  }
  /** Escape hatch: any row-local predicate that must hold. */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    val name = s"satisfies:$label"
  }
  /** The column tuple must be unique across the table (null values
    * count as values — two all-null keys are duplicates). */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique:${cols.mkString(",")}"
  }
  /** Every non-null `col` value must exist in `dim(dimCol)`. */
  final case class ForeignKey(col: String, dim: DataFrame, dimCol: String) extends Rule {
    val name = s"foreign_key:$col"
  }

  /** Evaluate `rules` over `df` → one `(rule, violations, passed)` row
    * per rule, in the order given. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    // duplicate names would alias two identical agg buffers and make
    // the per-rule column lookups ambiguous — reject loudly
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).mkString(", ")}")
    val rowLocal = rules.collect {
      case r: NotNull => r.name -> col(s"`${r.col}`").isNull
      case r: InRange => r.name ->
        (col(s"`${r.col}`").isNotNull &&
          !(col(s"`${r.col}`") >= r.lo && col(s"`${r.col}`") <= r.hi))
      case r: Matches => r.name ->
        (col(s"`${r.col}`").isNotNull && !col(s"`${r.col}`").rlike(r.regex))
      case r: Satisfies => r.name -> !coalesce(r.predicate, lit(false))
    }
    val fused: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map { case (n, violated) =>
          sum(when(violated, 1L).otherwise(0L)).as(n)
        }
        val wide = df.agg(aggs.head, aggs.tail: _*)
        val entries = rowLocal.map { case (n, _) =>
          struct(lit(n).as("rule"), coalesce(col(s"`$n`"), lit(0L)).as("violations"))
        }
        Some(wide.select(explode(array(entries: _*)).as("s")).select("s.*"))
      }
    val perRule: Seq[DataFrame] = rules.collect {
      case r: Unique =>
        df.groupBy(r.cols.map(c => col(s"`$c`")): _*)
          .agg(count(lit(1)).as("__cnt"))
          .filter(col("__cnt") > 1)
          .agg(coalesce(sum(col("__cnt") - 1L), lit(0L)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case r: ForeignKey =>
        df.filter(col(s"`${r.col}`").isNotNull)
          .join(r.dim.select(col(s"`${r.dimCol}`").as(r.col)).distinct(),
            Seq(r.col), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
    }
    val all = (fused.toSeq ++ perRule).reduce(_.unionByName(_))
    // preserve the caller's rule order in the report
    val order = rules.map(_.name).zipWithIndex.toMap
    val orderCol = order.foldLeft(lit(Int.MaxValue)) { case (acc, (n, i)) =>
      when(col("rule") === n, i).otherwise(acc)
    }
    all.withColumn("passed", col("violations") === 0L)
      .withColumn("__ord", orderCol)
      .orderBy("__ord")
      .drop("__ord")
  }
}
