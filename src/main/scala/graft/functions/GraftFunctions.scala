package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Expression, LessThan, Literal, Pmod, RegExpReplace}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration of the engine's extension functions.
  *
  * The reference's only query surface is raw SQL over HTTP, and its
  * tenants reach the destination's ENTIRE function library through it
  * (/root/reference/pkg/api/data.go:29-56 forwards verbatim to DuckDB
  * with json/httpfs loaded). The Spark-native analogue: every custom
  * Catalyst expression is registered as a temp function in each tenant
  * child session's FunctionRegistry, so `SELECT fingerprint64(text)…`
  * works over /api/data/query exactly like any built-in — same
  * codegen'd expressions the Scala API uses, zero UDF boxing.
  *
  * Array arguments are wrapped in a Cast to the expression's expected
  * element type (float for vector ops, long for sketch ops), so SQL
  * literals like `array(0.1, 0.2)` (double) or ingested `array<double>`
  * columns work without explicit casts; a cast that is already a
  * no-op is removed by the optimizer.
  *
  * Size/shape parameters (k, width, nPlanes, fractions, salts) must be
  * LITERALS: they size generated code and hyperplane tables at plan
  * time. Non-literal arguments get an AnalysisException naming the
  * offending argument, not a runtime failure mid-query.
  */
object GraftFunctions {

  /** name -> (arity range, builder). */
  private val builders: Seq[(String, (Seq[Expression] => Expression, String))] = Seq(
    "fingerprint64" -> (((args: Seq[Expression]) => {
      requireArity("fingerprint64", args, 1, 1)
      Fingerprint64(args.head)
    }, "fingerprint64(text) - 64-bit FNV-1a content fingerprint")),

    "token_hashes" -> (((args: Seq[Expression]) => {
      requireArity("token_hashes", args, 1, 1)
      TokenHashes(args.head)
    }, "token_hashes(text) - xxhash64 of each lowercased whitespace token")),

    "shingle_hashes" -> (((args: Seq[Expression]) => {
      requireArity("shingle_hashes", args, 2, 2)
      ShingleHashes(args.head, intLit("shingle_hashes", "width", args(1)))
    }, "shingle_hashes(text, width) - distinct hashes of lowercased word shingles")),

    "minhash_signature" -> (((args: Seq[Expression]) => {
      requireArity("minhash_signature", args, 2, 2)
      MinHashSignature(longArray(args.head), intLit("minhash_signature", "k", args(1)))
    }, "minhash_signature(hashes, k) - k-permutation MinHash signature")),

    "simhash64" -> (((args: Seq[Expression]) => {
      requireArity("simhash64", args, 1, 1)
      SimHash64(longArray(args.head))
    }, "simhash64(hashes) - 64-bit SimHash sketch of token hashes")),

    "lang_id" -> (((args: Seq[Expression]) => {
      requireArity("lang_id", args, 1, 1)
      LangId(args.head)
    }, "lang_id(text) - stopword-marker language heuristic (en/es/fr/de/zh/unknown)")),

    "winnow" -> (((args: Seq[Expression]) => {
      requireArity("winnow", args, 3, 3)
      Winnow(args.head, intLit("winnow", "k", args(1)), intLit("winnow", "window", args(2)))
    }, "winnow(text, k, window) - winnowing fingerprints (Schleimer et al. 2003)")),

    "dot_product" -> (((args: Seq[Expression]) => {
      requireArity("dot_product", args, 2, 2)
      DotProduct(floatArray(args.head), floatArray(args(1)))
    }, "dot_product(a, b) - double-precision dot product of two vectors")),

    "cosine_sim" -> (((args: Seq[Expression]) => {
      requireArity("cosine_sim", args, 2, 2)
      CosineSimilarity(floatArray(args.head), floatArray(args(1)))
    }, "cosine_sim(a, b) - cosine similarity of two vectors")),

    "lsh_bucket" -> (((args: Seq[Expression]) => {
      requireArity("lsh_bucket", args, 3, 4)
      val nPlanes = intLit("lsh_bucket", "n_planes", args(1))
      val dim = intLit("lsh_bucket", "dim", args(2))
      val seed = if (args.size >= 4) intLit("lsh_bucket", "seed", args(3)).toLong else 42L
      HyperplaneBucket(floatArray(args.head),
        VectorFunctions.makePlanes(nPlanes, dim, seed), nPlanes)
    }, "lsh_bucket(vec, n_planes, dim[, seed]) - random-hyperplane LSH bucket")),

    "chunk_text" -> (((args: Seq[Expression]) => {
      requireArity("chunk_text", args, 3, 3)
      ChunkText(args.head,
        intLit("chunk_text", "chunk_size", args(1)),
        intLit("chunk_text", "overlap", args(2)))
    }, "chunk_text(text, chunk_size, overlap) - overlapped token-window chunks (explode for one row per chunk)")),

    // composed from the SAME patterns/constants as TextAnalysis.scrubPii
    // (the Column API can't be round-tripped inside a FunctionBuilder,
    // so the composition is restated in raw Catalyst expressions;
    // RegistrySpec pins SQL == Scala-API equivalence)
    "scrub_pii" -> (((args: Seq[Expression]) => {
      requireArity("scrub_pii", args, 1, 1)
      def re(subject: Expression, pattern: String, rep: String): Expression =
        new RegExpReplace(subject, Literal(pattern), Literal(rep))
      re(re(re(args.head,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
        "\\d{9,}", "<NUM>")
    }, "scrub_pii(text) - emails/IPv4/long digit runs -> typed placeholders")),

    // same membership contract as TextAnalysis.hashSampleCond: FNV-1a
    // bucket (0-9999) of concat(salt, id-as-string) below fraction*10000
    "hash_sample" -> (((args: Seq[Expression]) => {
      requireArity("hash_sample", args, 2, 3)
      val fraction = doubleLit("hash_sample", "fraction", args(1))
      val salt = if (args.size >= 3) stringLit("hash_sample", "salt", args(2)) else ""
      LessThan(
        Pmod(Fingerprint64(Concat(Seq(Literal(salt), Cast(args.head, StringType)))),
          Literal(10000L)),
        Literal(math.round(fraction * 10000)))
    }, "hash_sample(id, fraction[, salt]) - deterministic partition-invariant sample membership")),

    // KLL mergeable quantile sketches (DataSketches; MergeStore's
    // wide-range quantile store) — the analyzer wraps a returned
    // AggregateFunction in its AggregateExpression automatically
    "kll_sketch" -> (((args: Seq[Expression]) => {
      requireArity("kll_sketch", args, 1, 2)
      val k = if (args.size >= 2) intLit("kll_sketch", "k", args(1)) else 200
      KllSketchAgg(Cast(args.head, DoubleType), k)
    }, "kll_sketch(value[, k]) - mergeable KLL quantile sketch of a numeric column (agg)")),

    "kll_merge" -> (((args: Seq[Expression]) => {
      requireArity("kll_merge", args, 1, 2)
      val k = if (args.size >= 2) intLit("kll_merge", "k", args(1)) else 200
      KllMergeAgg(args.head, k)
    }, "kll_merge(sketch[, k]) - union of serialized KLL sketches (agg)")),

    "kll_quantile" -> (((args: Seq[Expression]) => {
      requireArity("kll_quantile", args, 2, 2)
      KllQuantile(args.head, doubleLit("kll_quantile", "q", args(1)))
    }, "kll_quantile(sketch, q) - quantile estimate from a serialized KLL sketch")),

    "kll_n" -> (((args: Seq[Expression]) => {
      requireArity("kll_n", args, 1, 1)
      KllN(args.head)
    }, "kll_n(sketch) - exact row count carried by a serialized KLL sketch")),

    // theta sketches: distinct counting WITH set operations (the
    // intersection/difference HLL cannot do); exact below ~2^lgK
    // distinct values, ~1/sqrt(2^lgK) relative error past it
    "theta_sketch" -> (((args: Seq[Expression]) => {
      requireArity("theta_sketch", args, 1, 2)
      val lgK = if (args.size >= 2) intLit("theta_sketch", "lg_k", args(1)) else 12
      ThetaSketchAgg(args.head, lgK)
    }, "theta_sketch(value[, lg_k]) - mergeable theta distinct sketch (agg; set-op capable)")),

    "theta_union" -> (((args: Seq[Expression]) => {
      requireArity("theta_union", args, 1, 2)
      val lgK = if (args.size >= 2) intLit("theta_union", "lg_k", args(1)) else 12
      ThetaUnionAgg(args.head, lgK)
    }, "theta_union(sketch[, lg_k]) - union of serialized theta sketches (agg)")),

    "theta_estimate" -> (((args: Seq[Expression]) => {
      requireArity("theta_estimate", args, 1, 1)
      ThetaEstimate(args.head)
    }, "theta_estimate(sketch) - distinct estimate from a serialized theta sketch")),

    "theta_intersect" -> (((args: Seq[Expression]) => {
      requireArity("theta_intersect", args, 2, 2)
      ThetaSetEstimate(args.head, args(1), "intersect")
    }, "theta_intersect(a, b) - |A intersect B| estimate from two theta sketches")),

    "theta_a_not_b" -> (((args: Seq[Expression]) => {
      requireArity("theta_a_not_b", args, 2, 2)
      ThetaSetEstimate(args.head, args(1), "a_not_b")
    }, "theta_a_not_b(a, b) - |A minus B| estimate from two theta sketches")),

    "readability_counts" -> (((args: Seq[Expression]) => {
      requireArity("readability_counts", args, 1, 1)
      ReadabilityCounts(args.head)
    }, "readability_counts(text) - struct(n_words, n_sentences, n_syllables) for Flesch scoring")),

    // restates TextAnalysis.stripHtml's exact chain (same Column-API
    // round-trip limitation as scrub_pii; RegistrySpec pins parity)
    "strip_html" -> (((args: Seq[Expression]) => {
      requireArity("strip_html", args, 1, 1)
      def re(subject: Expression, pattern: String, rep: String): Expression =
        new RegExpReplace(subject, Literal(pattern), Literal(rep))
      val noTags = re(args.head, "<[^>]*>", " ")
      val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
        .foldLeft(noTags) { case (c, (from, to)) => re(c, from, to) }
      org.apache.spark.sql.catalyst.expressions.StringTrim(re(ent, "\\s+", " "))
    }, "strip_html(text) - tags to spaces, core entities decoded, whitespace collapsed")))

  /** Register every extension function in `spark`'s session-local
    * FunctionRegistry (idempotent — createOrReplace). Call once per
    * tenant child session; functions are session-scoped, so one
    * tenant's registry never shadows another's. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, (builder, _)) =>
      // 'source' must come from Spark's fixed vocabulary; these are
      // native Catalyst expressions shipped by a Scala library
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** Registered names + one-line usage (introspection / docs). */
  def descriptions: Seq[(String, String)] = builders.map { case (n, (_, d)) => n -> d }

  private def fail(fn: String, msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> s"$fn: $msg"))

  private def requireArity(fn: String, args: Seq[Expression], min: Int, max: Int): Unit =
    if (args.size < min || args.size > max)
      fail(fn, if (min == max) s"expects $min argument(s), got ${args.size}"
               else s"expects $min to $max arguments, got ${args.size}")

  private def floatArray(e: Expression): Expression = Cast(e, ArrayType(FloatType))
  private def longArray(e: Expression): Expression = Cast(e, ArrayType(LongType))

  private def lit(fn: String, arg: String, e: Expression): Any = {
    if (!e.foldable) fail(fn, s"argument '$arg' must be a literal")
    e.eval(null)
  }

  private def intLit(fn: String, arg: String, e: Expression): Int = lit(fn, arg, e) match {
    case i: Int => i
    case l: Long if l.isValidInt => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case d: Decimal if d.scale == 0 && d.toLong.isValidInt => d.toInt
    case other => fail(fn, s"argument '$arg' must be an integer literal (got $other)")
  }

  private def doubleLit(fn: String, arg: String, e: Expression): Double = lit(fn, arg, e) match {
    case d: Double => d
    case f: Float => f.toDouble
    case d: Decimal => d.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case other => fail(fn, s"argument '$arg' must be a numeric literal (got $other)")
  }

  private def stringLit(fn: String, arg: String, e: Expression): String = lit(fn, arg, e) match {
    case s: UTF8String => s.toString
    case null => fail(fn, s"argument '$arg' must be a string literal (got NULL)")
    case other => fail(fn, s"argument '$arg' must be a string literal (got $other)")
  }
}
