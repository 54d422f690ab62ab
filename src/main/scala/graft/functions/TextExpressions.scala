package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-analysis / dedup operators:
  * document fingerprinting (FNV-1a rolling hash), MinHash signatures and
  * SimHash — the sketch primitives behind near-duplicate detection at
  * scale (SURVEY §2B UDF row: MinHash/SimHash called out as the custom
  * pieces; everything else composes from built-ins).
  */

/** 64-bit FNV-1a over the UTF-8 bytes — a one-pass rolling document
  * fingerprint. Codegen'd: stays inside whole-stage codegen on scans. */
case class Fingerprint64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "fingerprint64"
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    Fingerprint64.hash(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.hash($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Fingerprint64 {
  /** FNV-1a 64-bit. Public so generated code can call it. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFF).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** MinHash signature: for each of `k` SplitMix64-derived permutations,
  * the minimum permuted hash over the input token/shingle hashes
  * (ARRAY<LONG> -> ARRAY<LONG> of length k). One pass over the array
  * computes all k mins. Empty/null array -> null. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && k <= 512, "k must be in [1, 512]")
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      val sig = MinHashSignature.compute(k, i => arr.getLong(i), n)
      new GenericArrayData(sig)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val vals = ctx.freshName("vals"); val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $vals = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) { $vals[$i] = $c.getLong($i); }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.MinHashSignature.computeArray($k, $vals));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  /** mix(seed_j ^ h): SplitMix64 finalizer as the j-th "permutation". */
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(k: Int, get: Int => Long, n: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = get(i)
      var j = 0
      while (j < k) {
        val p = mix(h + (j + 1) * 0x9E3779B97F4A7C15L)
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Entry point for generated code. */
  def computeArray(k: Int, vals: Array[Long]): Array[Long] =
    compute(k, vals(_), vals.length)
}

/** 64-bit SimHash over token hashes (ARRAY<LONG> -> LONG): per bit,
  * +1/-1 vote from each token hash; sign of the tally sets the bit.
  * Near-duplicate texts differ in few bits (compare via bit_count(a^b)). */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      var i = 0
      val counts = new Array[Int](64)
      while (i < n) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L; var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val vals = ctx.freshName("vals"); val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $vals = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) { $vals[$i] = $c.getLong($i); }
         |  ${ev.value} = graft.functions.SimHash64.compute($vals);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  def compute(vals: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < vals.length) {
      val h = vals(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def fingerprint64(c: Column): Column = C(Fingerprint64(E(c)))
  def minhash_signature(c: Column, k: Int): Column = C(MinHashSignature(E(c), k))
  def simhash64(c: Column): Column = C(SimHash64(E(c)))
}
