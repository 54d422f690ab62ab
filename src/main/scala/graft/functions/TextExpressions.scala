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

/** Tokenization shared by the native text expressions: trim -> lower ->
  * split on `\s+` -> drop empties. Bit-for-bit equivalent to the
  * declarative `filter(split(lower(trim(text)), "\\s+"), length(_) > 0)`
  * (UTF8String.trim trims 0x20 only, like Spark's `trim`; toLowerCase is
  * Spark's own Unicode mapping), but evaluated ONCE per row in a tight
  * loop instead of once per lambda element — higher-order functions are
  * CodegenFallback and re-evaluate their (expensive) input expression
  * per element, which made shingling ~1.4 ms/doc. */
object NativeTokens {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def tokenize(text: UTF8String): Array[String] = {
    val lowered = text.trim().toLowerCase().toString
    val raw = Ws.split(lowered, -1)
    var nonEmpty = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nonEmpty += 1; i += 1 }
    if (nonEmpty == raw.length) raw
    else {
      val out = new Array[String](nonEmpty)
      var j = 0; i = 0
      while (i < raw.length) { if (raw(i).nonEmpty) { out(j) = raw(i); j += 1 }; i += 1 }
      out
    }
  }

  /** xxhash64 (seed 42) of a Java string — matches Spark's `xxhash64`. */
  def hash(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(UTF8String.fromString(s), 42L)
}

/** Distinct xxhash64 hashes of lowercased w-token shingles
  * (STRING -> ARRAY<LONG>): one pass — tokenize, slide a w-window,
  * hash the space-joined shingle, keep first occurrence of each hash.
  * Fewer than w tokens -> the single hash of all tokens joined (so every
  * doc has >= 1 shingle and MinHash never sees an empty set). Equivalent
  * to the transform/slice/xxhash64 composition but ~100x faster (the HOF
  * version re-tokenized per shingle). */
case class ShingleHashes(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width >= 1, "width must be >= 1")
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $width)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  def compute(text: UTF8String, w: Int): ArrayData = {
    val toks = NativeTokens.tokenize(text)
    val n = toks.length
    if (n < w) {
      new GenericArrayData(Array(NativeTokens.hash(toks.mkString(" "))))
    } else {
      val seen = new java.util.HashSet[java.lang.Long](n * 2)
      val out = new Array[Long](n - w + 1)
      var k = 0
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= n - w) {
        sb.setLength(0)
        var j = 0
        while (j < w) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        val h = NativeTokens.hash(sb.toString)
        if (seen.add(h)) { out(k) = h; k += 1 }
        i += 1
      }
      new GenericArrayData(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
    }
  }
}

/** Token-window chunks of a document (STRING -> ARRAY<STRING>): the
  * SQL-surface form of `TextAnalysis.chunkDocuments` — chunk starts
  * step by `chunkSize - overlap`, a non-initial chunk is emitted only
  * when it contributes tokens beyond the overlap (never a pure
  * suffix-copy), and an empty document yields one empty chunk. Tenants
  * explode it: `SELECT doc_id, explode(chunk_text(text, 32, 8)) ...`.
  * One tokenize pass per row; codegen'd like the sibling expressions
  * (the declarative composition re-evaluates its higher-order lambdas
  * per element). RegistrySpec pins SQL == DataFrame-operator parity. */
case class ChunkText(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(chunkSize > 0, "chunkSize must be positive")
  require(overlap >= 0 && overlap < chunkSize, "overlap must be in [0, chunkSize)")
  override def prettyName: String = "chunk_text"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    ChunkText.compute(v.asInstanceOf[UTF8String], chunkSize, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChunkText.compute($c, $chunkSize, $overlap)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ChunkText {
  def compute(text: UTF8String, chunkSize: Int, overlap: Int): ArrayData = {
    val toks = NativeTokens.tokenize(text)
    val n = toks.length
    val step = chunkSize - overlap
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var s = 0
    while (s == 0 || s < n - overlap) {
      val end = math.min(s + chunkSize, n)
      val sb = new java.lang.StringBuilder(64)
      var i = s
      while (i < end) { if (i > s) sb.append(' '); sb.append(toks(i)); i += 1 }
      out += UTF8String.fromString(sb.toString)
      s += step
    }
    new GenericArrayData(out.toArray)
  }
}

/** xxhash64 of each token (STRING -> ARRAY<LONG>, empty array for blank
  * text) — the SimHash input, computed in one pass per row. */
case class TokenHashes(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    TokenHashes.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashes.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenHashes {
  def compute(text: UTF8String): ArrayData = {
    val toks = NativeTokens.tokenize(text)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = NativeTokens.hash(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Stopword-marker language ID (STRING -> STRING): one tokenize pass,
  * one marker-set lookup per token, CJK-codepoint ratio short-circuit to
  * "zh". Ties break toward the alphabetically-first language; zero hits
  * -> "unknown". Same semantics as the previous declarative fold of
  * `when` branches, whose nested `acc` duplication re-evaluated the
  * (interpreted) stopword filters exponentially many times per row. */
case class LangId(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "lang_id"
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    LangId.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LangId {
  /** Sorted language codes; markers mirror TextAnalysis.LangMarkers. */
  private val langs: Array[String] = Array("de", "en", "es", "fr")
  private val markers: Array[java.util.HashSet[String]] = {
    val m = Map(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "a"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las", "por"),
      "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "dans", "que", "pour"),
      "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "mit", "den", "zu", "auf"))
    langs.map { l =>
      val s = new java.util.HashSet[String]()
      m(l).foreach(s.add)
      s
    }
  }
  private val zh = UTF8String.fromString("zh")
  private val unknown = UTF8String.fromString("unknown")
  private val langU8 = langs.map(UTF8String.fromString)

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    // CJK ratio over code points (Spark length() counts code points)
    var cp = 0; var cjk = 0; var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      cp += 1
      if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
      i += Character.charCount(c)
    }
    if (cjk.toDouble / math.max(cp, 1).toDouble > 0.2) return zh
    val toks = NativeTokens.tokenize(text)
    val scores = new Array[Int](langs.length)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < langs.length) { if (markers(l).contains(toks(t))) scores(l) += 1; l += 1 }
      t += 1
    }
    var best = 0; var l = 1
    while (l < langs.length) { if (scores(l) > scores(best)) best = l; l += 1 }
    if (scores(best) == 0) unknown else langU8(best)
  }
}

/** Winnowing fingerprints (STRING -> ARRAY<LONG>): FNV-1a over each
  * k-character gram of the normalized text (lowercase, whitespace
  * collapsed to single spaces), then the MINIMUM hash of every sliding
  * window of `window` grams — keeping each selected position once
  * (rightmost-minimum rule). This is the standard local document
  * fingerprinting scheme (Schleimer/Wilkerson/Aiken, "Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003): any shared
  * substring of length >= window + k - 1 between two documents
  * guarantees a shared fingerprint, so overlap detection needs only a
  * fingerprint-equality join — same scale shape as the shingle index.
  * Fewer than k chars -> one hash of the whole normalized text. */
case class Winnow(child: Expression, k: Int, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 2 && window >= 1, "need k >= 2 and window >= 1")
  override def prettyName: String = "winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    Winnow.compute(v.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c, $k, $window)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Winnow {
  def compute(text: UTF8String, k: Int, window: Int): ArrayData = {
    // normalize: lowercase, runs of whitespace -> single space, trimmed
    val s = {
      val raw = text.trim().toLowerCase().toString
      val sb = new java.lang.StringBuilder(raw.length)
      var i = 0; var ws = false
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (Character.isWhitespace(c)) ws = true
        else { if (ws && sb.length > 0) sb.append(' '); ws = false; sb.append(c) }
        i += 1
      }
      sb.toString
    }
    if (s.length < k)
      return new GenericArrayData(Array(Fingerprint64.hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    val n = s.length - k + 1
    val grams = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h ^= (s.charAt(i + j) & 0xFF).toLong; h *= 0x100000001b3L; j += 1 }
      grams(i) = h
      i += 1
    }
    if (n <= window) {
      var min = grams(0); i = 1
      while (i < n) { if (grams(i) <= min) min = grams(i); i += 1 }
      return new GenericArrayData(Array(min))
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / window + 2)
    var lastPos = -1
    i = 0
    while (i <= n - window) {
      // rightmost minimum of grams[i, i+window)
      var minPos = i; var j = i + 1
      while (j < i + window) { if (grams(j) <= grams(minPos)) minPos = j; j += 1 }
      if (minPos != lastPos) { out += grams(minPos); lastPos = minPos }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Bloom-filter membership for a LONG key (the gram-hash domain).
  * `bits` is a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (built distributed via `DataFrameStatFunctions.bloomFilter`),
  * rebuilt lazily ONCE per deserialized expression instance — i.e. once
  * per executor plan, not per row. The use is a broadcast PRE-FILTER in
  * front of an exact join (decontamination at 100 TB): ~10 bits/element
  * at 1% fpp versus 64-bit join rows plus a hash table, no false
  * negatives — so an exact confirm join downstream keeps the composed
  * result bit-identical to the unfiltered join at ANY fpp. */
case class BloomMightContainLong(child: Expression, bits: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bloom_might_contain_long"
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType

  @transient private lazy val bloom = org.apache.spark.util.sketch.BloomFilter
    .readFrom(new java.io.ByteArrayInputStream(bits))

  /** Shared by interpreted + generated code. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode NFC normalization — the canonical-composition pass every
  * text pipeline needs before hashing, dedup, or token counting:
  * "é" as one codepoint and "e"+U+0301 are the SAME text to a reader
  * but different bytes to every fingerprint above, so un-normalized
  * corpora leak duplicates past exact-hash dedup. Wraps the JDK's
  * `java.text.Normalizer` (Unicode-standard NFC; engines on the same
  * Unicode version agree byte-for-byte — DuckDB's `nfc_normalize`
  * replays it, which is how the battery hash-checks this). Codegen'd:
  * a normalize stays inside whole-stage codegen on the scan. */
case class NfcNormalize(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def fingerprint64(c: Column): Column = C(Fingerprint64(E(c)))
  def nfc_normalize(c: Column): Column = C(NfcNormalize(E(c)))
  def bloom_might_contain_long(c: Column, bits: Array[Byte]): Column =
    C(BloomMightContainLong(E(c), bits))
  def minhash_signature(c: Column, k: Int): Column = C(MinHashSignature(E(c), k))
  def simhash64(c: Column): Column = C(SimHash64(E(c)))
  def shingle_hashes(c: Column, width: Int): Column = C(ShingleHashes(E(c), width))
  def token_hashes(c: Column): Column = C(TokenHashes(E(c)))
  def lang_id(c: Column): Column = C(LangId(E(c)))
  def winnow(c: Column, k: Int, window: Int): Column = C(Winnow(E(c), k, window))
  def chunk_text(c: Column, chunkSize: Int, overlap: Int): Column =
    C(ChunkText(E(c), chunkSize, overlap))
}

/** One-pass readability counts (STRING -> STRUCT<n_words, n_sentences,
  * n_syllables>), feeding Flesch reading-ease / Flesch-Kincaid grade
  * (Kincaid et al. 1975). All three counts use DELIBERATELY simple,
  * cross-engine-replayable rules — the point is a deterministic
  * quality signal whose DuckDB replay hash-matches, not a linguistics
  * engine:
  *
  *  - words: [[NativeTokens.tokenize]] (lowercase, \s+ split,
  *    non-empty) — the same tokenization every other text op uses;
  *  - sentences: runs of `[.!?]+` in the text, floored at 1 (headline
  *    fragments still form one "sentence");
  *  - syllables per token: vowel-GROUP count over [aeiouy], minus one
  *    for a silent final 'e' when more than one group remains, floored
  *    at 1 (the classic heuristic; the floor also covers digit/CJK
  *    tokens, which read as one syllable).
  *
  * Counts are exact longs; the score arithmetic lives in the OPERATOR
  * (fixed-order double math of these longs — the q137 discipline), so
  * scores hash-match across engines. */
case class ReadabilityCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "readability_counts"
  override def dataType: DataType = ReadabilityCounts.schema
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    ReadabilityCounts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ReadabilityCounts.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ReadabilityCounts {
  val schema: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("n_syllables", LongType, nullable = false)))

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = NativeTokens.tokenize(text)
    var syllables = 0L
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var groups = 0
      var inGroup = false
      var i = 0
      while (i < w.length) {
        if (isVowel(w.charAt(i))) {
          if (!inGroup) { groups += 1; inGroup = true }
        } else inGroup = false
        i += 1
      }
      if (groups > 1 && w.charAt(w.length - 1) == 'e') groups -= 1
      syllables += math.max(groups, 1)
      t += 1
    }
    val s = text.toString
    var sentences = 0
    var inRun = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isP = c == '.' || c == '!' || c == '?'
      if (isP) { if (!inRun) { sentences += 1; inRun = true } } else inRun = false
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length.toLong, math.max(sentences, 1).toLong, syllables)
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def readability_counts(text: Column): Column = C(ReadabilityCounts(E(text)))
}
