package graft

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Dedup, SimilaritySearch}
import graft.store.{MergeStore, SketchStore}

/** Format-stability fixture for every PERSISTED store kind: one small
  * instance of each store, built ONCE from sf0.001 at pinned
  * parameters and COMMITTED to the repo
  * (`src/test/resources/golden/`), plus the canonical rows each
  * production read path returned at build time. GoldenStoreSpec
  * re-reads the committed bytes through the CURRENT read paths every
  * round and compares against the committed expectations — the test
  * that fails when a refactor silently changes gram hashing, part
  * addressing, bucket layout, sketch encoding, or merge algebra in a
  * way that invalidates stores built by earlier code. The meta files
  * guard PARAMETER drift (`Dedup.writeMinhashStore` refuses a
  * mismatched append); this fixture guards LAYOUT/SEMANTICS drift,
  * which no parameter check can see.
  *
  * Deliberate properties:
  *  - reads are self-contained: probe inputs (batch rows, query
  *    vector, query tokens) are stored INSIDE the fixture at build
  *    time, so the spec never touches /root/testdata (which
  *    regenerates per round);
  *  - every read path is the production one (dedupAgainstStore,
  *    minhashCandidatesAgainstStore, bm25TopKIndexed,
  *    ivfPqTopKIndexed, readLatest/readSummed/readQuantiles/
  *    readKllQuantiles, estimateDistinct);
  *  - the KLL store is included even though its build AND its merge
  *    are randomized: the committed sketch bytes are fixed, decoding
  *    them and the exact row counts must stay stable, and the
  *    quantile estimates must stay inside a rank-error band (the spec
  *    treats it as `exact = false`).
  *
  * Rebuild (ONLY when a layout change is intentional — the diff then
  * documents the break):
  *   sbt "Test/runMain graft.GoldenStoreBuild /root/testdata/sf0.001"
  */
object GoldenStores {

  val fixtureRoot = "src/test/resources/golden"

  /** Canonical row strings: the same encoding the fuzz specs pin. */
  def canon(df: DataFrame): Vector[String] =
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case d: java.math.BigDecimal => d.stripTrailingZeros().toPlainString
      case d: Double => f"$d%.9f"
      case v => v.toString
    }.mkString("|")).toVector.sorted

  private def docs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/documents.parquet")
  private def events(s: SparkSession, sfDir: String): DataFrame =
    Queries.normalizeEventTs(s.read.parquet(s"$sfDir/events.parquet"))
  private def embs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/embeddings.parquet")

  /** The probe slice stored inside the fixture: every 3rd document —
    * ids divisible by 6 are in the store (dedup hits), the rest are
    * novel (misses), so both probe branches stay exercised. */
  private def probeDocs(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/probe_docs")

  /** `exact = false` marks stores whose READ is legitimately
    * randomized (KLL merge compaction draws): the spec then pins keys
    * and exact counts but allows a band on the estimate columns. */
  final case class Golden(name: String,
                          build: (SparkSession, String, String) => Unit,
                          read: (SparkSession, String) => DataFrame,
                          exact: Boolean = true)

  val all: Vector[Golden] = Vector(
    Golden("fingerprint",
      build = (s, sf, p) => {
        Dedup.writeFingerprintStore(docs(s, sf).filter(col("doc_id") % 2 === 0),
          "text", s"$p/store", nBuckets = 8)
        docs(s, sf).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("text"))
          .coalesce(1).write.parquet(s"$p/probe_docs")
      },
      read = (s, p) => Dedup.dedupAgainstStore(probeDocs(s, p), "text", s"$p/store")
        .select(col("doc_id"))),

    Golden("minhash",
      build = (s, sf, p) => {
        Dedup.writeMinhashStore(docs(s, sf).filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$p/store",
          numHashes = 16, bands = 4, shingleWidth = 3, nParts = 8)
        docs(s, sf).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("text"))
          .coalesce(1).write.parquet(s"$p/probe_docs")
      },
      read = (s, p) => Dedup.minhashCandidatesAgainstStore(
          probeDocs(s, p), "doc_id", "text", s"$p/store", maxBucketSize = 500)
        .select(col("id_a"), col("id_b"),
          round(col("est_jaccard"), 6).as("est_jaccard"))),

    Golden("lexical",
      build = (s, sf, p) => SimilaritySearch.writeLexicalIndex(
        docs(s, sf), "doc_id", "text", s"$p/store", nParts = 8),
      read = (s, p) => SimilaritySearch.bm25TopKIndexed(s, s"$p/store",
        Seq("join", "hash", "window"), k = 20)
        .select(col("id"), round(col("bm25"), 6).as("bm25"))),

    Golden("ivfpq",
      build = (s, sf, p) => {
        SimilaritySearch.writeIvfPq(embs(s, sf), "vec_id", "embedding",
          s"$p/store", nCells = 4, nCodes = 16, m = 8)
        embs(s, sf).orderBy("vec_id").limit(1)
          .select(col("embedding"))
          .coalesce(1).write.parquet(s"$p/query_vec")
      },
      read = (s, p) => {
        val q = s.read.parquet(s"$p/query_vec").head()
          .getSeq[Float](0).toArray
        SimilaritySearch.ivfPqTopKIndexed(s, s"$p/store", "vec_id", q,
          k = 10, nProbe = 2)
          .select(col("vec_id"), round(col("adc_cosine"), 6).as("adc_cosine"))
      }),

    Golden("latest",
      build = (s, sf, p) => {
        val ev = events(s, sf).select(col("event_id"), col("user_id"),
          col("event_type"), col("value").cast(DecimalType(18, 2)).as("value"))
        MergeStore.appendPart(ev
          .select(col("event_id"), col("event_type"), col("value"))
          .withColumn("version", lit(1L)), s"$p/store")
        MergeStore.appendPart(ev.filter(col("user_id") % 5 === 0)
          .select(col("event_id"), col("event_type"),
            (col("value") + lit(7)).cast(DecimalType(18, 2)).as("value"))
          .withColumn("version", lit(2L)), s"$p/store")
      },
      read = (s, p) => MergeStore.readLatest(s, s"$p/store", Seq("event_id"), "version")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("version")).cast("long").as("version_sum"),
          sum(col("value")).cast("string").as("value_sum"))),

    Golden("summing_epochs",
      build = (s, sf, p) => {
        val ev = events(s, sf).select(col("event_type"),
          col("value").cast(DecimalType(18, 2)).as("value"),
          lit(1L).as("n"), col("event_id"))
        (0 until 3).foreach { e =>
          StreamingIngestShim.writeSummingPart(
            ev.filter(col("event_id") % 3 === e).drop("event_id"),
            Seq("event_type"), Seq("value", "n"), s"$p/store", e.toLong)
        }
      },
      read = (s, p) => MergeStore.readSummed(s, s"$p/store",
        Seq("event_type"), Seq("value", "n"))
        .select(col("event_type"), col("value").cast("string").as("total"),
          col("n").cast("long").as("n"))),

    Golden("quantile",
      build = (s, sf, p) => {
        val ev = events(s, sf).select(col("event_type"), col("value"), col("event_id"))
        (0 until 2).foreach { i =>
          MergeStore.writeQuantilePart(
            ev.filter(col("event_id") % 2 === i).drop("event_id"),
            Seq("event_type"), "value", s"$p/store", scale = 100)
        }
      },
      read = (s, p) => MergeStore.readQuantiles(s, s"$p/store",
        Seq("event_type"), Seq(0.25, 0.5, 0.95), scale = 100)),

    Golden("kll",
      build = (s, sf, p) => {
        val ev = events(s, sf).select(col("event_type"), col("value"), col("event_id"))
        (0 until 2).foreach { i =>
          MergeStore.writeKllPart(
            ev.filter(col("event_id") % 2 === i).drop("event_id"),
            Seq("event_type"), "value", s"$p/store", k = 200)
        }
      },
      read = (s, p) => MergeStore.readKllQuantiles(s, s"$p/store",
          Seq("event_type"), Seq(0.25, 0.75), k = 200)
        .select(col("event_type"), col("n_rows"),
          round(col("p25"), 6).as("p25"), round(col("p75"), 6).as("p75")),
      // KLL merge is randomized (documented not hash-replayable):
      // decode + exact n_rows are pinned, quantiles get a rank-error band
      exact = false),

    Golden("sketch",
      build = (s, sf, p) => SketchStore.writeDistinctSketches(
        events(s, sf), Seq("event_type"), "user_id", s"$p/store",
        partExpr = pmod(xxhash64(col("event_type")), lit(4L)), lgK = 12),
      read = (s, p) => SketchStore.estimateDistinct(s, s"$p/store",
          Seq("event_type"))
        .select(col("event_type"),
          round(col("approx_distinct"), 3).as("approx_distinct")))
  )
}

/** Bridge to the `private[graft]` streaming epoch writer from the
  * builder (same package, different file — keeps the production
  * visibility unchanged). */
private object StreamingIngestShim {
  def writeSummingPart(batch: DataFrame, groupCols: Seq[String],
                       sumCols: Seq[String], storePath: String,
                       epochId: Long): Unit =
    graft.streaming.StreamingIngest.writeSummingPart(
      batch, groupCols, sumCols, storePath, epochId)
}

/** Builder main — run ONCE (or when a layout change is intentional):
  * wipes `src/test/resources/golden/`, builds every store from the
  * given sf dir, runs each production read, and commits the canonical
  * rows as `<name>.expected.txt`. */
object GoldenStoreBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val root = new File(GoldenStores.fixtureRoot)
    def rmrf(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(root); root.mkdirs()
    val spark = FuzzSweepRunner.session()
    GoldenStores.all.foreach { g =>
      val p = new File(root, g.name).getAbsolutePath
      System.err.println(s"[golden] building ${g.name}")
      g.build(spark, sfDir, p)
      val rows = GoldenStores.canon(g.read(spark, p))
      Files.write(Paths.get(root.getPath, s"${g.name}.expected.txt"),
        (rows.mkString("\n") + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      System.err.println(s"[golden] ${g.name}: ${rows.size} expected rows")
    }
    // parquet writer turds the spec never reads — keep the fixture lean
    def scrub(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(scrub))
      else if (f.getName.endsWith(".crc") || f.getName == "_SUCCESS") { f.delete(); () }
    }
    scrub(root)
    spark.stop()
  }
}
