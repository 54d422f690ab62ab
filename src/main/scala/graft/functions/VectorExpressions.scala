package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over embedding columns
  * (`ARRAY<FLOAT>`), used by the similarity-search and embedding-dedup
  * operators. All are codegen'd (single fused loop, no boxing) so they
  * stay inside whole-stage codegen on the brute-force scan path — the
  * property that makes brute-force top-k viable at scale.
  *
  * Accumulation is double-precision and strictly sequential (index
  * 0..n-1), so results are bit-deterministic for a given row.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT> arguments")
  }
}

/** dot(a, b); null when lengths differ. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0; var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (|a| |b|); null on length mismatch or zero norm. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket: sign bit of dot(vec, plane_j) for each of
  * `nPlanes` hyperplanes (flattened row-major into `planes`), packed into
  * an int. Cosine-similar vectors collide with high probability — the
  * blocking key for embedding dedup / ANN search. */
case class HyperplaneBucket(child: Expression, planes: Array[Double], nPlanes: Int)
    extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 30, "nPlanes must be in [1, 30]")
  override def prettyName: String = "lsh_bucket"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private lazy val dim = planes.length / nPlanes

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail loudly: a wrong-dim vector would otherwise silently bucket to
    // null and the downstream join would return empty results
    if (n != dim) throw HyperplaneBucket.dimMismatch(n, dim)
    var bucket = 0; var j = 0
    while (j < nPlanes) {
      var dot = 0.0; var i = 0; val off = j * dim
      while (i < n) { dot += x.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (dot > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val bucket = ctx.freshName("bucket"); val off = ctx.freshName("off")
      s"""
         |int $n = $x.numElements();
         |if ($n != $dim) { throw graft.functions.HyperplaneBucket.dimMismatch($n, $dim); }
         |int $bucket = 0;
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  double $dot = 0.0; int $off = $j * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $x.getFloat($i) * $planesRef[$off + $i];
         |  }
         |  if ($dot > 0) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneBucket {
  /** Shared by interpreted + generated code paths. */
  def dimMismatch(got: Int, expected: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"lsh_bucket: vector has dim $got but hyperplanes expect dim $expected")
}

/** IVF cell assignment: index of the centroid with maximum dot product
  * against the input vector. `centroids` is row-major (k x dim) and
  * expected PRE-NORMALIZED (unit L2), so max-dot == max-cosine and the
  * per-row work is one fused k*dim multiply-add loop. Codegen'd: cell
  * assignment of a 100 TB corpus stays inside whole-stage codegen. */
case class NearestCentroid(child: Expression, centroids: Array[Double], k: Int)
    extends UnaryExpression {
  require(k >= 1 && centroids.length % k == 0, "centroids must be k x dim row-major")
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private lazy val dim = centroids.length / k

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) throw HyperplaneBucket.dimMismatch(n, dim)
    NearestCentroid.assign(x, centroids, k, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      s"""
         |int $n = $x.numElements();
         |if ($n != $dim) { throw graft.functions.HyperplaneBucket.dimMismatch($n, $dim); }
         |${ev.value} = graft.functions.NearestCentroid.assign($x, $cRef, $k, $dim);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCentroid {
  /** Shared by interpreted + generated code. */
  def assign(x: ArrayData, centroids: Array[Double], k: Int, dim: Int): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < k) {
      var dot = 0.0; var i = 0; val off = j * dim
      while (i < dim) { dot += x.getFloat(i).toDouble * centroids(off + i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = j }
      j += 1
    }
    best
  }
}

/** Product-quantization encoder: split the vector into `m` contiguous
  * subvectors of dim/m coordinates; each subvector maps to the index of
  * the L2-nearest codeword slice (`argmin_j sum_i (x_i - cw_ji)^2`,
  * strict `<` so ties keep the LOWEST j — deterministic, SQL-replayable
  * with an ascending reduce). The codebook is `nCodes` FULL-dimension
  * rows laid out row-major; subspace `s` uses columns
  * `[s*dsub, (s+1)*dsub)` of every row, so one sampled-row codebook
  * serves all subspaces. Output is `ARRAY<TINYINT>` of length m with
  * codes stored as `j - 128` (nCodes <= 256): the 100 TB embedding
  * store shrinks from 4*dim bytes/row to m bytes/row (32x at dim=64,
  * m=8). Codegen'd — encoding a corpus is one fused map stage inside
  * whole-stage codegen. */
case class PqEncode(child: Expression, codebook: Array[Double], nCodes: Int, m: Int)
    extends UnaryExpression {
  require(nCodes >= 2 && nCodes <= 256, "nCodes must be in [2, 256]")
  require(codebook.length % nCodes == 0, "codebook must be nCodes x dim row-major")
  require(m >= 1 && (codebook.length / nCodes) % m == 0, "m must divide dim")
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val dim = codebook.length / nCodes

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) throw HyperplaneBucket.dimMismatch(x.numElements(), dim)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqEncode.encode(x, codebook, nCodes, dim, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      s"""
         |int $n = $x.numElements();
         |if ($n != $dim) { throw graft.functions.HyperplaneBucket.dimMismatch($n, $dim); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqEncode.encode($x, $cbRef, $nCodes, $dim, $m));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqEncode {
  /** Shared by interpreted + generated code. Distances accumulate in
    * double, ascending coordinate order within each subspace, codes
    * scan ascending j — bit-deterministic and first-min-wins. */
  def encode(x: ArrayData, cb: Array[Double], nCodes: Int, dim: Int, m: Int): Array[Byte] = {
    val dsub = dim / m
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var best = 0; var bestD = Double.PositiveInfinity
      var j = 0
      while (j < nCodes) {
        var d = 0.0; var i = 0; val off = j * dim + base
        while (i < dsub) {
          val diff = x.getFloat(base + i).toDouble - cb(off + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = (best - 128).toByte
      s += 1
    }
    out
  }
}

/** Asymmetric-distance (ADC) approximate cosine for a PQ-encoded row:
  * the query side precomputes, per (subspace, code), the partial inner
  * product `lutIp[s*nCodes+j] = dot(q_s, cw_j_s)` and the partial
  * codeword norm `lutNorm[s*nCodes+j] = |cw_j_s|^2` — m*nCodes doubles,
  * a broadcast constant — so scoring a row is m table lookups instead
  * of a dim-length float scan (the reason a PQ store is scanned at
  * memory bandwidth). Result: `sum_s ip / (qNorm * sqrt(sum_s n2))`,
  * null when either norm is zero (matches cosine_sim's convention).
  * Sums run ascending s, matching the nested-sum oracle replay. */
case class PqAdcScore(child: Expression, lutIp: Array[Double], lutNorm: Array[Double],
                      qNorm: Double, nCodes: Int, m: Int)
    extends UnaryExpression {
  require(lutIp.length == m * nCodes && lutNorm.length == m * nCodes,
    "LUTs must be m x nCodes row-major")
  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    if (codes.numElements() != m) throw HyperplaneBucket.dimMismatch(codes.numElements(), m)
    val r = PqAdcScore.score(codes, lutIp, lutNorm, qNorm, nCodes, m)
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ipRef = ctx.addReferenceObj("lutIp", lutIp, "double[]")
    val nrmRef = ctx.addReferenceObj("lutNorm", lutNorm, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val r = ctx.freshName("r")
      s"""
         |int $n = $c.numElements();
         |if ($n != $m) { throw graft.functions.HyperplaneBucket.dimMismatch($n, $m); }
         |double $r = graft.functions.PqAdcScore.score($c, $ipRef, $nrmRef, $qNorm, $nCodes, $m);
         |if (Double.isNaN($r)) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqAdcScore {
  /** Shared by interpreted + generated code; NaN signals null. */
  def score(codes: ArrayData, lutIp: Array[Double], lutNorm: Array[Double],
            qNorm: Double, nCodes: Int, m: Int): Double = {
    var ip = 0.0; var n2 = 0.0
    var s = 0
    while (s < m) {
      val j = codes.getByte(s) + 128
      ip += lutIp(s * nCodes + j); n2 += lutNorm(s * nCodes + j)
      s += 1
    }
    if (qNorm == 0.0 || n2 == 0.0) Double.NaN
    else ip / (qNorm * math.sqrt(n2))
  }
}

/** Inverse of the int8 affine quantization (see
  * `SimilaritySearch.quantizeEmbeddings`): `x = (float)((code + 128) *
  * scale + min)` per element, double math in that exact operation
  * order — bit-identical to the `transform` lambda it replaces, so the
  * q88 oracle replays unchanged. The lambda was the battery's one
  * interpreted hot-path eval: Catalyst higher-order functions are
  * CodegenFallback, so every probe of the quantized store paid
  * per-element interpreted dispatch; this expression keeps the
  * dequantizing scan inside whole-stage codegen, which is what makes
  * the 4×-smaller store CPU-free to read at 100 TB. */
case class Dequantize(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with ExpectsInputTypes {
  override def prettyName: String = "dequantize"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), DoubleType, DoubleType)

  override def nullSafeEval(codes: Any, scale: Any, vmin: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Dequantize.restore(codes.asInstanceOf[ArrayData],
        scale.asInstanceOf[Double], vmin.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s, mn) => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Dequantize.restore($c, $s, $mn));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object Dequantize {
  /** Shared by interpreted + generated code. Same op order as the
    * original lambda: (code_double + 128) * scale + min, cast float. */
  def restore(codes: ArrayData, scale: Double, vmin: Double): Array[Float] = {
    val n = codes.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = ((codes.getByte(i).toDouble + 128.0) * scale + vmin).toFloat
      i += 1
    }
    out
  }
}

/** Forward int8 affine quantization: `code = (tinyint)(round((x - min)
  * / scale) - 128)` per element, where `round` replicates Spark's
  * `Round(_, 0)` on double EXACTLY (java.math.BigDecimal.valueOf →
  * setScale(0, HALF_UP) → doubleValue, NaN/Inf passthrough — the same
  * code Spark's RoundBase generates), so the emitted codes are
  * bit-identical to the `transform(round(...))` lambda this replaces
  * and the q84/q88 SQL oracles replay unchanged. The lambda was
  * CodegenFallback; worse, Catalyst's collapsed projections inlined it
  * into every downstream consumer (q88's Filter evaluated the
  * quantize lambda THREE times per row, interpreted). This expression
  * keeps the whole quantize→search pipeline in one codegen span. */
case class QuantizeCodes(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with ExpectsInputTypes {
  override def prettyName: String = "quantize_codes"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), DoubleType, DoubleType)

  override def nullSafeEval(vec: Any, vmin: Any, scale: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      QuantizeCodes.encode(vec.asInstanceOf[ArrayData],
        vmin.asInstanceOf[Double], scale.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, s) => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.QuantizeCodes.encode($v, $mn, $s));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object QuantizeCodes {
  /** Spark `Round(d, 0)` double semantics, verbatim. */
  private def sparkRound(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared by interpreted + generated code. Same op order as the
    * original lambda: round((x_double - min) / scale) - 128, cast
    * tinyint. */
  def encode(vec: ArrayData, vmin: Double, scale: Double): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = (sparkRound((vec.getFloat(i).toDouble - vmin) / scale) - 128.0).toByte
      i += 1
    }
    out
  }
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def dot_product(a: Column, b: Column): Column = C(DotProduct(E(a), E(b)))
  def cosine_sim(a: Column, b: Column): Column = C(CosineSimilarity(E(a), E(b)))
  def lsh_bucket(v: Column, planes: Array[Double], nPlanes: Int): Column =
    C(HyperplaneBucket(E(v), planes, nPlanes))
  def nearest_centroid(v: Column, centroids: Array[Double], k: Int): Column =
    C(NearestCentroid(E(v), centroids, k))
  def pq_encode(v: Column, codebook: Array[Double], nCodes: Int, m: Int): Column =
    C(PqEncode(E(v), codebook, nCodes, m))
  def pq_adc_score(codes: Column, lutIp: Array[Double], lutNorm: Array[Double],
                   qNorm: Double, nCodes: Int, m: Int): Column =
    C(PqAdcScore(E(codes), lutIp, lutNorm, qNorm, nCodes, m))
  def dequantize(codes: Column, scale: Column, vmin: Column): Column =
    C(Dequantize(E(codes), E(scale), E(vmin)))
  def quantize_codes(vec: Column, vmin: Column, scale: Column): Column =
    C(QuantizeCodes(E(vec), E(vmin), E(scale)))

  /** Deterministic pseudo-random hyperplanes (SplitMix64 stream). */
  def makePlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Double] = {
    var s = seed
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.fill(nPlanes * dim)((next().toDouble / Long.MaxValue))
  }
}
