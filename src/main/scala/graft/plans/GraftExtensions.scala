package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Except, Filter, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine Catalyst extensions, installed through
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * ([[graft.core.SessionDefaults]] carries the key/value so the product
  * path and every harness main install identically; tenant child
  * sessions inherit extensions through `newSession()`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => DefuseExceptRewrite)
  }
}

/** Works around a Spark 4.1.2 optimizer fault the relational fuzz sweep
  * found at seeds 166/320 (PLANS.md r17): `ReplaceExceptWithFilter`
  * rewrites `EXCEPT` into a filter when both children are
  * projection/filter chains over the same relation, and it maps the
  * right side's filter attributes into the left side's output BY NAME.
  * When a projected alias SHADOWS a source column the right filter
  * references — e.g.
  *
  *   SELECT CAST(p_size AS BIGINT) AS p_size FROM part WHERE a
  *   EXCEPT
  *   SELECT CAST(p_size AS BIGINT) AS p_size FROM part WHERE p_size <= 20
  *
  * — the name map substitutes the WRONG attribute into the condition
  * and the whole query fails with
  * `PLAN_VALIDATION_FAILED_RULE_IN_BATCH … became unresolved` (both the
  * SQL and DataFrame paths; the rule is on Spark's non-excludable list,
  * so `spark.sql.optimizer.excludedRules` cannot quarantine it).
  *
  * The defuse: when the hazard pattern is present — a DISTINCT `Except`
  * whose right-side filters reference a name that the left side
  * produces via an `Alias` — rename the left child's output to fresh
  * names behind a `Project` and restore the original names (and
  * attribute ids, so parent plans keep resolving) above. The rename
  * makes the rewrite's name-map lookup miss, so it bails out and Spark
  * falls back to `ReplaceExceptWithAntiJoin` — the general plan that is
  * correct for every input. Healthy EXCEPTs (no alias shadowing) are
  * untouched and keep the faster filter rewrite. Semantically the
  * rename is an identity: project-rename → EXCEPT → project-restore.
  */
object DefuseExceptRewrite extends Rule[LogicalPlan] {

  /** Alias-produced output names along the Project/Filter/SubqueryAlias
    * spine of a child (lower-cased — Spark's default resolver is
    * case-insensitive, and the rewrite's name map inherits that). */
  private def aliasNames(p: LogicalPlan): Set[String] = p match {
    case Project(list, child) =>
      list.collect { case a: Alias => a.name.toLowerCase }.toSet ++ aliasNames(child)
    case Filter(_, child)        => aliasNames(child)
    case SubqueryAlias(_, child) => aliasNames(child)
    case v: View                 => aliasNames(v.child)
    case _                       => Set.empty
  }

  /** Names referenced by Filter conditions along the same spine. */
  private def filterRefNames(p: LogicalPlan): Set[String] = p match {
    case Filter(cond, child) =>
      cond.references.map(_.name.toLowerCase).toSet ++ filterRefNames(child)
    case Project(_, child)       => filterRefNames(child)
    case SubqueryAlias(_, child) => filterRefNames(child)
    case v: View                 => filterRefNames(v.child)
    case _                       => Set.empty
  }

  /** Only spines ReplaceExceptWithFilter could match are hazardous —
    * anything else (joins, aggregates below the Except) is already
    * ineligible for the broken rewrite. */
  private def isSpine(p: LogicalPlan): Boolean = p match {
    case Project(_, c)       => isSpine(c)
    case Filter(_, c)        => isSpine(c)
    case SubqueryAlias(_, c) => isSpine(c)
    case v: View             => isSpine(v.child)
    case other               => other.children.isEmpty
  }

  private def hazardous(left: LogicalPlan, right: LogicalPlan): Boolean =
    isSpine(left) && isSpine(right) &&
      (filterRefNames(right) intersect aliasNames(left)).nonEmpty

  /** The rewrite itself, shared between the analyzer path (apply, via
    * resolveOperatorsUp — the analyzer-safe transform, which also skips
    * already-analyzed subtrees) and [[forceApply]] (plain transformUp,
    * for direct receipts on plans the analyzer has already marked). */
  private val rewrite: PartialFunction[LogicalPlan, LogicalPlan] = {
    case e @ Except(left, right, false)
        if e.resolved && hazardous(left, right) &&
          !left.output.exists(_.name.startsWith("__graft_defuse_")) =>
      val fresh: Seq[NamedExpression] = left.output.map { a =>
        Alias(a, s"__graft_defuse_${a.exprId.id}")()
      }
      val renamed = Project(fresh, left)
      val inner = Except(renamed, right, isAll = false)
      // restore the ORIGINAL names and exprIds so references above the
      // Except keep resolving unchanged
      val restore: Seq[NamedExpression] = inner.output.zip(left.output).map {
        case (tmp: AttributeReference, orig) =>
          Alias(tmp, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier,
            explicitMetadata = Some(orig.metadata))
        case (other: Expression, orig) =>
          Alias(other, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier,
            explicitMetadata = Some(orig.metadata))
      }
      Project(restore, inner)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp(rewrite)

  private[graft] def forceApply(plan: LogicalPlan): LogicalPlan = plan.transformUp(rewrite)
}
