package graft.functions

import graft.operators.TextAnalysis
import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The SQL surface (GraftFunctions.registerAll) must be bit-equivalent
  * to the Scala Column API for every registered function — the HTTP
  * tenant runs the SAME codegen'd expressions, not a re-implementation
  * that can drift. */
class RegistrySpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  private lazy val docs = {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "reach me at alice@example.com or 10.2.3.4 acct 123456789012"),
      (3L, "der schnelle braune fuchs und die faule katze"),
      (4L, "le renard brun et le chien paresseux dans les bois"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("rdocs")
    df
  }

  private def sqlVsScala(sql: String, scalaDf: org.apache.spark.sql.DataFrame): Unit = {
    val viaSql = spark.sql(sql)
    assert(viaSql.exceptAll(scalaDf).count() == 0 && scalaDf.exceptAll(viaSql).count() == 0,
      s"SQL and Scala-API results differ for: $sql")
  }

  test("every registered function evaluates via SQL == Scala API") {
    docs // force registration + view
    sqlVsScala(
      "SELECT doc_id, fingerprint64(text) AS fp FROM rdocs",
      docs.select(col("doc_id"), TextFunctions.fingerprint64(col("text")).as("fp")))
    sqlVsScala(
      "SELECT doc_id, token_hashes(text) AS th, shingle_hashes(text, 3) AS sh FROM rdocs",
      docs.select(col("doc_id"), TextFunctions.token_hashes(col("text")).as("th"),
        TextFunctions.shingle_hashes(col("text"), 3).as("sh")))
    sqlVsScala(
      "SELECT doc_id, minhash_signature(shingle_hashes(text, 3), 16) AS ms, " +
        "simhash64(token_hashes(text)) AS sim FROM rdocs",
      docs.select(col("doc_id"),
        TextFunctions.minhash_signature(TextFunctions.shingle_hashes(col("text"), 3), 16).as("ms"),
        TextFunctions.simhash64(TextFunctions.token_hashes(col("text"))).as("sim")))
    sqlVsScala(
      "SELECT doc_id, lang_id(text) AS lp, winnow(text, 8, 4) AS wf FROM rdocs",
      docs.select(col("doc_id"), TextFunctions.lang_id(col("text")).as("lp"),
        TextFunctions.winnow(col("text"), 8, 4).as("wf")))
    sqlVsScala(
      "SELECT doc_id, scrub_pii(text) AS sc FROM rdocs",
      docs.select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("sc")))
    sqlVsScala(
      "SELECT doc_id FROM rdocs WHERE hash_sample(doc_id, 0.5, 's1')",
      docs.filter(TextAnalysis.hashSampleCond(col("doc_id"), 0.5, "s1")).select("doc_id"))
    sqlVsScala(
      "SELECT doc_id, chunk_text(text, 4, 1) AS ch FROM rdocs",
      docs.select(col("doc_id"), TextFunctions.chunk_text(col("text"), 4, 1).as("ch")))
  }

  test("chunk_text via SQL explode == the chunkDocuments operator") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id, chunk_idx, chunk_text FROM rdocs
        |LATERAL VIEW posexplode(chunk_text(text, 4, 1)) t AS chunk_idx, chunk_text""".stripMargin)
    val viaOp = TextAnalysis.chunkDocuments(docs, "text", "doc_id", chunkSize = 4, overlap = 1)
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"), col("chunk_text"))
    assert(viaSql.exceptAll(viaOp).count() == 0 && viaOp.exceptAll(viaSql).count() == 0,
      "SQL chunk_text and the DataFrame operator disagree")
    // suffix-only trailing chunks suppressed in both: 9-token doc, starts 0/3/6 only
    assert(viaSql.filter(col("doc_id") === 1L).count() == 3)
  }

  test("scrub_pii via SQL replaces emails, IPs and long digit runs") {
    docs
    val sc = spark.sql("SELECT scrub_pii(text) AS sc FROM rdocs WHERE doc_id = 2")
      .head().getString(0)
    assert(sc == "reach me at <EMAIL> or <IP> acct <NUM>")
  }

  test("vector functions accept double arrays (cast to float) and match the Scala API") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val vecs = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(1.0f, 0.0f))).toDF("id", "v")
    vecs.createOrReplaceTempView("rvecs")
    val viaSql = spark.sql(
      "SELECT id, cosine_sim(v, array(3.0, 4.0)) AS cs, dot_product(v, array(1.0, 1.0)) AS dp, " +
        "lsh_bucket(v, 4, 2) AS lb FROM rvecs")
    val planes = VectorFunctions.makePlanes(4, 2)
    val viaScala = vecs.select(col("id"),
      VectorFunctions.cosine_sim(col("v"), array(lit(3.0f), lit(4.0f))).as("cs"),
      VectorFunctions.dot_product(col("v"), array(lit(1.0f), lit(1.0f))).as("dp"),
      VectorFunctions.lsh_bucket(col("v"), planes, 4).as("lb"))
    assert(viaSql.exceptAll(viaScala).count() == 0 && viaScala.exceptAll(viaSql).count() == 0)
  }

  test("size/shape arguments must be literals — analysis-time rejection") {
    docs
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(shingle_hashes(text, 3), CAST(doc_id AS INT)) FROM rdocs").collect()
    }
    assert(e.getMessage.contains("must be a literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT fingerprint64(text, 2) FROM rdocs").collect()
    }
    assert(e2.getMessage.contains("expects 1 argument"))
  }

  test("kll functions via SQL: sketch -> merge -> quantile pipeline, n exact") {
    docs
    import spark.implicits._
    (1 to 1000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kvals")
    // build per-group sketches, merge them globally, read quantiles —
    // the store's whole read path expressed in tenant SQL
    val row = spark.sql(
      """SELECT kll_n(m) AS n, kll_quantile(m, 0.5) AS p50
        |FROM (SELECT kll_merge(s) AS m
        |      FROM (SELECT g, kll_sketch(v) AS s FROM kvals GROUP BY g))""".stripMargin)
      .collect().head
    assert(row.getLong(0) == 1000L, "n must be exact through sketch+merge")
    assert(math.abs(row.getDouble(1) - 500.0) <= 30.0,
      s"p50 ${row.getDouble(1)} beyond the 3% rank corridor around 500")
    // shape args must be literals
    intercept[AnalysisException] {
      spark.sql("SELECT kll_sketch(v, g) FROM kvals GROUP BY g").collect()
    }
  }

  test("strip_html and readability_counts via SQL == the Scala API") {
    docs
    import spark.implicits._
    Seq((1L, "<p>T&amp;C</p> apply &lt;here&gt; now!"))
      .toDF("id", "raw").createOrReplaceTempView("hdocs")
    val viaSql = spark.sql("SELECT strip_html(raw) AS c FROM hdocs")
      .collect().head.getString(0)
    val viaScala = spark.table("hdocs")
      .select(TextAnalysis.stripHtml(col("raw")).as("c")).collect().head.getString(0)
    assert(viaSql == viaScala && viaSql == "T&C apply <here> now!")
    val counts = spark.sql(
      "SELECT readability_counts(c).n_words AS w FROM (SELECT strip_html(raw) AS c FROM hdocs)")
      .collect().head.getLong(0)
    assert(counts == 4L) // "t&c", "apply", "<here>", "now!"
  }

  test("theta functions via SQL: sketch + set ops exact in the exact regime") {
    docs
    import spark.implicits._
    (1L to 600L).toDF("id").createOrReplaceTempView("tvals")
    val row = spark.sql(
      """SELECT CAST(round(theta_estimate(a)) AS BIGINT) AS na,
        |       CAST(round(theta_intersect(a, b)) AS BIGINT) AS nab,
        |       CAST(round(theta_a_not_b(a, b)) AS BIGINT) AS anb
        |FROM (SELECT theta_sketch(id) AS a FROM tvals WHERE id % 2 = 0),
        |     (SELECT theta_sketch(id) AS b FROM tvals WHERE id % 3 = 0)""".stripMargin)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((300L, 100L, 200L)))
  }

  test("registration is session-scoped: a fresh child session has them only after registerAll") {
    docs
    val child = spark.newSession()
    import child.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    df.createOrReplaceTempView("cdocs")
    intercept[AnalysisException] { child.sql("SELECT fingerprint64(text) FROM cdocs").collect() }
    GraftFunctions.registerAll(child)
    assert(child.sql("SELECT fingerprint64(text) AS fp FROM cdocs").count() == 1)
  }
}
