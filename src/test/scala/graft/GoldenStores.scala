package graft

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Dedup, SimilaritySearch}
import graft.store.{Bucketed, Layout, MergeStore, SketchStore}

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

  /** Layout signatures (the layout-writer goldens): one row per
    * physical FILE — the key range it covers and its row count. File
    * names are uuids, so identity is dropped and canon's row sort
    * makes the signature a set; what survives is exactly the
    * row-to-file ASSIGNMENT. The read side computes this twice — once
    * over the committed store bytes, once over a fresh rebuild from
    * the committed input — so BOTH a reader change and a writer change
    * (range boundaries, quantile bucketing, Morton interleave, bucket
    * hashing) that reassigns rows to files fails the spec, which is
    * the drift that silently invalidates layouts users already wrote. */
  private def rangeSignature(s: SparkSession, path: String, keyCol: String): DataFrame =
    s.read.parquet(path)
      .groupBy(input_file_name().as("__f"))
      .agg(min(col(keyCol)).as("min_k"), max(col(keyCol)).as("max_k"),
        count(lit(1)).as("n"))
      .drop("__f")

  private def zSignature(s: SparkSession, path: String,
                         a: String, b: String): DataFrame =
    s.read.parquet(path)
      .groupBy(input_file_name().as("__f"))
      .agg(min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"),
        count(lit(1)).as("n"))
      .drop("__f")

  /** Bucket files carry their bucket id in the name (`_NNNNN.c000`);
    * key ranges overlap across buckets by design, so the signature is
    * per-BUCKET: count, range, and an order-free key checksum — a
    * bucket-hash change moves keys between buckets and breaks the
    * checksum even when counts happen to collide. */
  private def bucketSignature(s: SparkSession, path: String, keyCol: String): DataFrame =
    s.read.parquet(path)
      .groupBy(regexp_extract(input_file_name(), "_(\\d{5})\\.c000", 1)
        .cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        // decimal sum: order-free and overflow-proof under ANSI (a
        // long sum of 64-bit hashes overflows)
        sum(xxhash64(col(keyCol)).cast(DecimalType(38, 0))).as("key_checksum"),
        min(col(keyCol)).as("min_k"), max(col(keyCol)).as("max_k"))

  private def bothSignatures(committed: DataFrame, rebuilt: DataFrame): DataFrame =
    committed.withColumn("src", lit("committed"))
      .unionAll(rebuilt.withColumn("src", lit("rebuilt")))

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
          round(col("approx_distinct"), 3).as("approx_distinct"))),

    Golden("theta",
      // element = user x value-digit rather than bare user_id: sf0.001
      // has only 15 users, ALL of whom both click and purchase, which
      // would pin n_a_only at a degenerate 0 no broken a-not-b could
      // miss; the finer element gives 115/113/87 partially-overlapping
      // audiences so every set-op column carries signal
      build = (s, sf, p) => SketchStore.writeThetaSketches(
        events(s, sf).withColumn("el",
          col("user_id") * 10 + col("value").cast("long") % 10),
        Seq("event_type"), "el", s"$p/store",
        partExpr = pmod(xxhash64(col("event_type")), lit(3L)), lgK = 12),
      // the overlap report drives every theta read path over the
      // committed bytes: per-part scan, theta_union merge, estimate,
      // intersect, a-not-b, union — a compact-encoding or set-algebra
      // drift breaks one of the five columns
      read = (s, p) => SketchStore.estimateOverlap(s, s"$p/store",
          "event_type", "click", "purchase")
        .select(round(col("n_a"), 3).as("n_a"), round(col("n_b"), 3).as("n_b"),
          round(col("n_both"), 3).as("n_both"),
          round(col("n_a_only"), 3).as("n_a_only"),
          round(col("n_union"), 3).as("n_union"))),

    Golden("layout_range",
      build = (s, sf, p) => {
        events(s, sf).select(col("event_id"), col("value"))
          .coalesce(1).write.parquet(s"$p/input")
        Layout.writeRangeSorted(s.read.parquet(s"$p/input"), s"$p/store",
          Seq("value"), numFiles = 4)
      },
      read = (s, p) => {
        val rebuilt = FuzzScratch.fresh("golden_layout_range")
        Layout.writeRangeSorted(s.read.parquet(s"$p/input"),
          s"$rebuilt/store", Seq("value"), numFiles = 4)
        bothSignatures(rangeSignature(s, s"$p/store", "value"),
          rangeSignature(s, s"$rebuilt/store", "value"))
      }),

    Golden("layout_zorder",
      build = (s, sf, p) => {
        events(s, sf).select(col("event_id"), col("user_id"), col("value"))
          .coalesce(1).write.parquet(s"$p/input")
        Layout.writeZOrdered(s.read.parquet(s"$p/input"), s"$p/store",
          Seq("user_id", "value"), numFiles = 4, bitsPerDim = 6)
      },
      read = (s, p) => {
        val rebuilt = FuzzScratch.fresh("golden_layout_zorder")
        Layout.writeZOrdered(s.read.parquet(s"$p/input"),
          s"$rebuilt/store", Seq("user_id", "value"), numFiles = 4, bitsPerDim = 6)
        bothSignatures(zSignature(s, s"$p/store", "user_id", "value"),
          zSignature(s, s"$rebuilt/store", "user_id", "value"))
      }),

    Golden("layout_bucketed",
      build = (s, sf, p) => {
        events(s, sf).select(col("event_id"), col("user_id"), col("event_type"))
          .coalesce(1).write.parquet(s"$p/input")
        s.sql("DROP TABLE IF EXISTS golden_bucketed_build")
        Bucketed.writeBucketed(s.read.parquet(s"$p/input"),
          "golden_bucketed_build", s"$p/store", Seq("user_id"), numBuckets = 4)
        // external table: dropping the catalog entry keeps the files
        s.sql("DROP TABLE IF EXISTS golden_bucketed_build")
        ()
      },
      read = (s, p) => {
        val rebuilt = FuzzScratch.fresh("golden_layout_bucketed")
        s.sql("DROP TABLE IF EXISTS golden_bucketed_rebuild")
        Bucketed.writeBucketed(s.read.parquet(s"$p/input"),
          "golden_bucketed_rebuild", s"$rebuilt/store", Seq("user_id"),
          numBuckets = 4)
        s.sql("DROP TABLE IF EXISTS golden_bucketed_rebuild")
        bothSignatures(bucketSignature(s, s"$p/store", "user_id"),
          bucketSignature(s, s"$rebuilt/store", "user_id"))
      })
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

/** Builder main — run ONCE per kind (or when a layout change is
  * intentional): builds each store from the given sf dir, runs each
  * production read, and commits the canonical rows as
  * `<name>.expected.txt`. With no names given it wipes and rebuilds
  * the ENTIRE fixture; naming kinds (`... sf0.001 theta layout_range`)
  * rebuilds only those, leaving every other kind's committed
  * past-build bytes untouched — which is the fixture's whole value. */
object GoldenStoreBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1).toSet
    val unknown = names.diff(GoldenStores.all.map(_.name).toSet)
    require(unknown.isEmpty, s"unknown golden kinds: ${unknown.mkString(", ")}")
    val selected = if (names.isEmpty) GoldenStores.all
                   else GoldenStores.all.filter(g => names(g.name))
    val root = new File(GoldenStores.fixtureRoot)
    def rmrf(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    if (names.isEmpty) rmrf(root)
    root.mkdirs()
    val spark = FuzzSweepRunner.session()
    selected.foreach { g =>
      val p = new File(root, g.name).getAbsolutePath
      rmrf(new File(root, g.name))
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
