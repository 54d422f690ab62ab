package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Quantile-rank against a FIXED sorted boundary array: the number of
  * boundaries `<= value` — the per-row half of quantile bucketing
  * (boundaries come from one driver-side `approxQuantile` sketch; this
  * expression ranks the corpus against them). Used by the Z-order
  * layout writer, where every row is ranked per clustered dimension.
  *
  * Why native: the declarative forms (`size(filter(lit(bnds), _ <=
  * v))` or an `aggregate` fold) are Catalyst higher-order functions —
  * CodegenFallback, one interpreted lambda dispatch PER ARRAY ELEMENT
  * per row (~5 µs/row at 256 boundaries, measured), and `filter` also
  * allocates its result array per row. This expression is a codegen'd
  * `Arrays.binarySearch` over a referenced static array: O(log n), no
  * allocation, stays inside whole-stage codegen. Boundaries must be
  * sorted and distinct (the writer dedups; duplicate entries would
  * make "count <=" ambiguous under binary search). */
case class QuantileRank(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  // empty boundaries are legal and rank everything 0 — approxQuantile
  // returns an empty array for an empty/all-null input column, and the
  // layout writer must still complete (degenerate single-cell dim)
  override def prettyName: String = "quantile_rank"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def nullSafeEval(v: Any): Any =
    QuantileRank.rank(boundaries, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bndsRef = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.QuantileRank.rank($bndsRef, $x);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object QuantileRank {
  /** Shared by interpreted + generated code: count of boundaries <= v.
    * binarySearch hit i -> i+1 boundaries are <=; miss -> the insertion
    * point IS the count of strictly-smaller (== <=, entries distinct). */
  def rank(bnds: Array[Double], v: Double): Long = {
    val i = java.util.Arrays.binarySearch(bnds, v)
    if (i >= 0) (i + 1).toLong else (-i - 1).toLong
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def quantile_rank(value: Column, boundaries: Array[Double]): Column =
    C(QuantileRank(E(value), boundaries))
}

/** Quantile read off a serialized KLL sketch (the store's BINARY
  * column) at a FIXED rank — one static-helper call per sketch row,
  * codegen'd. INCLUSIVE search criteria (the DataSketches default):
  * the returned value's inclusive rank is >= q, matching the type-1
  * "smallest value with cum >= q·n" convention the histogram store's
  * readQuantiles uses. Runs over O(keys) sketch rows, never the
  * corpus. */
case class KllQuantile(child: Expression, q: Double)
    extends UnaryExpression with ExpectsInputTypes {
  require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    KllQuantile.quantile(v.asInstanceOf[Array[Byte]], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // freshName: two quantile columns in one projection would
      // otherwise redefine the same local and break codegen compile
      val r = ctx.freshName("kllq")
      s"""
         |java.lang.Double $r = graft.functions.KllQuantile.quantile($x, $q);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object KllQuantile {
  /** Shared by interpreted + generated code; null for an empty sketch
    * (no rows ever updated it — there is no quantile to report). */
  def quantile(bytes: Array[Byte], q: Double): java.lang.Double = {
    val s = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))
    if (s.isEmpty) null
    else java.lang.Double.valueOf(s.getQuantile(q,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def kll_quantile(sketch: Column, q: Double): Column = C(KllQuantile(E(sketch), q))
}

/** Row count carried by a serialized KLL sketch — n is exact (every
  * update counts), only rank positions are approximate; the store spec
  * pins exactness of n across part splits. */
case class KllN(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    KllN.n(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = graft.functions.KllN.n($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object KllN {
  def n(bytes: Array[Byte]): Long =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes)).getN

  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def kll_n(sketch: Column): Column = C(KllN(E(sketch)))
}

/** Distinct estimate off a serialized theta sketch. In the exact
  * regime (retained < nominal k) the estimate is the exact integer
  * count — the battery hash-checks that regime; estimation mode is
  * covered by bound specs. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(v: Any): Any =
    ThetaEstimate.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ThetaEstimate.estimate($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ThetaEstimate {
  def estimate(bytes: Array[Byte]): Double =
    org.apache.datasketches.theta.Sketches.wrapCompactSketch(
      org.apache.datasketches.memory.Memory.wrap(bytes)).getEstimate

  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def theta_estimate(sketch: Column): Column = C(ThetaEstimate(E(sketch)))
}

/** Set-operation estimate over two serialized theta sketches — the
  * capability HLL lacks: `intersect` (|A ∩ B|, audience overlap),
  * `a_not_b` (|A \ B|, churn/exclusive reach), `union` (|A ∪ B|).
  * Exact in the exact regime like [[ThetaEstimate]]; in estimation
  * mode intersection error compounds with the Jaccard similarity
  * (small overlaps of big sets are the weak spot — documented). */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with ExpectsInputTypes {
  require(ThetaSetEstimate.Ops.contains(op),
    s"theta set op must be one of ${ThetaSetEstimate.Ops.mkString(", ")}, got $op")
  override def prettyName: String = s"theta_$op"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaSetEstimate.estimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], op)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.ThetaSetEstimate.estimate($a, $b, "$op");""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ThetaSetEstimate {
  val Ops: Set[String] = Set("intersect", "a_not_b", "union")

  def estimate(a: Array[Byte], b: Array[Byte], op: String): Double = {
    val sa = org.apache.datasketches.theta.Sketches.wrapCompactSketch(
      org.apache.datasketches.memory.Memory.wrap(a))
    val sb = org.apache.datasketches.theta.Sketches.wrapCompactSketch(
      org.apache.datasketches.memory.Memory.wrap(b))
    val builder = org.apache.datasketches.theta.SetOperation.builder()
    op match {
      case "intersect" => builder.buildIntersection().intersect(sa, sb).getEstimate
      case "a_not_b"   => builder.buildANotB().aNotB(sa, sb).getEstimate
      case "union"     => builder.buildUnion().union(sa, sb).getEstimate
      case other       => throw new IllegalArgumentException(s"unknown theta op: $other")
    }
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def theta_intersect(a: Column, b: Column): Column = C(ThetaSetEstimate(E(a), E(b), "intersect"))
  def theta_a_not_b(a: Column, b: Column): Column = C(ThetaSetEstimate(E(a), E(b), "a_not_b"))
  def theta_union_est(a: Column, b: Column): Column = C(ThetaSetEstimate(E(a), E(b), "union"))
}
