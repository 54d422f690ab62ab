package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.GoldenStores
import graft.operators.{Dedup, SimilaritySearch}
import graft.store.{MergeStore, SketchStore}

/** Parameter-level fuzz of the index_build HTTP lifecycle (r19 verdict
  * stretch ask 8): each seed draws a store kind and a point in its
  * build-parameter space, then drives the REAL server over TCP through
  * the full lifecycle —
  *
  *   POST analytics/index_build → POST the kind's indexed probe →
  *   DELETE /api/stores/<name> → probe again (must 400)
  *
  * — and asserts the HTTP probe's rows equal the DIRECT operator
  * calls' rows (the same store writer + reader invoked as Scala, at
  * the same drawn parameters, on the same inputs). AnalyticsFuzzSpec
  * covers decoder validity; this puts the build lifecycle's PARAMETER
  * PLUMBING (JSON body → planBuild defaults/validation → store writer
  * args → probe reader args) under the same differential discipline as
  * the operators it wraps: a dropped or mis-defaulted parameter
  * changes the store and diverges from the direct call.
  *
  * KLL is the one kind compared in a band (n_rows and keys exact,
  * quantile estimates within 15%): its read-side merge compaction is
  * randomized by design (documented at MergeStore.readKllQuantiles);
  * every other kind must match exactly, canon row for canon row.
  */
object IndexBuildFuzz {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  final case class Outcome(seed: Long, kind: String, params: String,
                           httpRows: Int, matched: Boolean, detail: String)

  private def pick[A](r: scala.util.Random, xs: Vector[A]): A = xs(r.nextInt(xs.size))

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete(); ()
  }

  /** Exact canon compare, or the KLL band: keys and integer columns
    * exact, fractional columns within 15% relative. */
  private def matches(got: Vector[String], want: Vector[String],
                      band: Boolean): Boolean =
    if (!band) got == want
    else got.size == want.size && got.sorted.zip(want.sorted).forall {
      case (gl, el) =>
        val (gf, ef) = (gl.split('|'), el.split('|'))
        gf.length == ef.length && gf.zip(ef).forall { case (gv, ev) =>
          (gv.toDoubleOption, ev.toDoubleOption) match {
            case (Some(gd), Some(ed)) if gv.contains('.') || ev.contains('.') =>
              math.abs(gd - ed) <= math.abs(ed) * 0.15 + 1e-9
            case _ => gv == ev
          }
        }
    }

  /** One lifecycle point: boot server → build → probe → DELETE → probe
    * (400) → direct operator twin → compare. */
  def runPoint(s: SparkSession, sfDir: String, seed: Long): Outcome = {
    val r = new scala.util.Random(seed)
    val kind = pick(r, Vector("minhash", "fingerprint", "bm25", "ivfpq", "theta", "kll"))
    val base = new java.io.File(s"/tmp/graft_ibfuzz_${ProcessHandle.current().pid()}_$seed")
    rmrf(base); base.mkdirs()
    val scratch = new java.io.File(base, "direct_store").getAbsolutePath

    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val events = s.read.parquet(s"$sfDir/events.parquet")
    val embs = s.read.parquet(s"$sfDir/embeddings.parquet")
    // dedup stores are built on a SUBSET and probed with the full
    // table, so the probe exercises both hit and miss branches
    val docsBuild = docs.filter(col("doc_id") % 3 =!= 0)

    val catalog = new graft.store.TableCatalog(s"$base/tables")
    catalog.append(s, "1", "documents", docs)
    catalog.append(s, "1", "docs_build", docsBuild)
    catalog.append(s, "1", "events", events)
    catalog.append(s, "1", "embeddings", embs)
    val srv = new Server(
      ServerConfig(0, Map("k" -> "1"), None, s"$base/fail"),
      catalog, new graft.store.IngestService(s, catalog),
      new graft.store.Spool(s"$base/spool", graft.store.SpoolConfig(), _ => ()),
      new graft.engine.QueryExecutor(s, catalog),
      new graft.store.MetaStore(base.getAbsolutePath, Set(1L)))
    val port = srv.start()
    val client = HttpClient.newHttpClient()
    def post(op: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(java.net.URI.create(
          s"http://localhost:$port/api/data/analytics/$op?api_key=k"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    def delete(store: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(java.net.URI.create(
          s"http://localhost:$port/api/stores/$store?api_key=k"))
        .DELETE().build(), HttpResponse.BodyHandlers.ofString())

    try {
      // drawn parameters + both sides of the differential, per kind
      val (params, buildBody, probeOp, probeBody, parseSchema,
           direct: (() => DataFrame), band) = kind match {
        case "minhash" =>
          val nh = pick(r, Vector(8, 16, 32))
          val bd = pick(r, Vector(2, 4, 8).filter(b => nh % b == 0))
          val sw = pick(r, Vector(2, 3, 4))
          val np = pick(r, Vector(2, 4, 8))
          val mj = pick(r, Vector(0.3, 0.5, 0.7))
          val mb = pick(r, Vector(200, 500))
          (s"nh=$nh bd=$bd sw=$sw np=$np mj=$mj mb=$mb",
            s"""{"kind": "minhash", "store": "fz", "table": "docs_build",
               | "id_col": "doc_id", "text_col": "text", "num_hashes": $nh,
               | "bands": $bd, "shingle_width": $sw, "n_parts": $np}""".stripMargin,
            "dedup_near_indexed",
            s"""{"store": "fz", "table": "documents", "id_col": "doc_id",
               | "text_col": "text", "min_jaccard": $mj, "max_bucket_size": $mb}""".stripMargin,
            "id_a BIGINT, id_b BIGINT, est_jaccard DOUBLE",
            () => {
              Dedup.writeMinhashStore(docsBuild, "doc_id", "text", scratch,
                numHashes = nh, bands = bd, shingleWidth = sw, nParts = np)
              Dedup.minhashCandidatesAgainstStore(docs, "doc_id", "text",
                  scratch, maxBucketSize = mb)
                .filter(col("est_jaccard") >= mj)
                .select("id_a", "id_b", "est_jaccard")
            }, false)
        case "fingerprint" =>
          val nb = pick(r, Vector(4, 8, 32))
          (s"nb=$nb",
            s"""{"kind": "fingerprint", "store": "fz", "table": "docs_build",
               | "text_col": "text", "n_buckets": $nb}""".stripMargin,
            "dedup_new",
            """{"store": "fz", "table": "documents", "text_col": "text"}""",
            "doc_id BIGINT",
            () => {
              Dedup.writeFingerprintStore(docsBuild, "text", scratch, nBuckets = nb)
              Dedup.dedupAgainstStore(docs, "text", scratch).select("doc_id")
            }, false)
        case "bm25" =>
          val np = pick(r, Vector(2, 4, 8))
          val k = pick(r, Vector(5, 10, 20))
          val k1 = pick(r, Vector(1.25, 1.5))
          val b = pick(r, Vector(0.75, 0.4))
          val vocab = Vector("join", "hash", "window", "scan", "dup", "row", "sort")
          val toks = r.shuffle(vocab).take(2 + r.nextInt(3))
          (s"np=$np k=$k k1=$k1 b=$b toks=${toks.mkString("+")}",
            s"""{"kind": "bm25", "store": "fz", "table": "documents",
               | "id_col": "doc_id", "text_col": "text", "n_parts": $np}""".stripMargin,
            "bm25_indexed",
            s"""{"store": "fz", "query_tokens": [${toks.map("\"" + _ + "\"").mkString(",")}],
               | "k": $k, "k1": $k1, "b": $b}""".stripMargin,
            "id BIGINT, bm25 DOUBLE",
            () => {
              SimilaritySearch.writeLexicalIndex(docs, "doc_id", "text", scratch, nParts = np)
              SimilaritySearch.bm25TopKIndexed(s, scratch, toks, k = k, k1 = k1, b = b)
                .select("id", "bm25")
            }, false)
        case "ivfpq" =>
          val nc = pick(r, Vector(2, 4, 8))
          val codes = pick(r, Vector(16, 64))
          val m = pick(r, Vector(4, 8))
          val k = pick(r, Vector(5, 10))
          val nProbe = pick(r, Vector(1, 2, 4))
          val qv = embs.orderBy("vec_id").limit(1).head().getSeq[Float](1).toArray
          (s"nc=$nc codes=$codes m=$m k=$k nProbe=$nProbe",
            s"""{"kind": "ivfpq", "store": "fz", "table": "embeddings",
               | "id_col": "vec_id", "vec_col": "embedding", "n_cells": $nc,
               | "n_codes": $codes, "m": $m}""".stripMargin,
            "ann_indexed",
            s"""{"store": "fz", "id_col": "vec_id",
               | "query_vector": [${qv.mkString(",")}], "k": $k,
               | "n_probe": $nProbe}""".stripMargin,
            "vec_id BIGINT, adc_cosine DOUBLE",
            () => {
              SimilaritySearch.writeIvfPq(embs, "vec_id", "embedding", scratch,
                nCells = nc, nCodes = codes, m = m)
              SimilaritySearch.ivfPqTopKIndexed(s, scratch, "vec_id", qv, k,
                nProbe = nProbe).select("vec_id", "adc_cosine")
            }, false)
        case "theta" =>
          val lgK = pick(r, Vector(10, 12))
          val types = Vector("click", "purchase", "view", "signup", "error")
          val a = pick(r, types)
          val b = pick(r, types.filterNot(_ == a))
          (s"lgK=$lgK a=$a b=$b",
            s"""{"kind": "theta", "store": "fz", "table": "events",
               | "segment_col": "event_type", "value_col": "user_id",
               | "lg_k": $lgK}""".stripMargin,
            "audience_overlap_indexed",
            s"""{"store": "fz", "segment_col": "event_type", "a": "$a",
               | "b": "$b", "lg_k": $lgK}""".stripMargin,
            "n_a DOUBLE, n_b DOUBLE, n_both DOUBLE, n_a_only DOUBLE, n_union DOUBLE",
            () => {
              SketchStore.writeThetaSketches(events, Seq("event_type"), "user_id",
                scratch, partExpr = lit("all"), lgK = lgK)
              SketchStore.estimateOverlap(s, scratch, "event_type", a, b, lgK = lgK)
            }, false)
        case "kll" =>
          val k = pick(r, Vector(128, 200))
          val qs = Seq(0.25, 0.5, 0.9)
          (s"k=$k",
            s"""{"kind": "kll", "store": "fz", "table": "events",
               | "key_cols": ["event_type"], "value_col": "value", "k": $k}""".stripMargin,
            "quantiles_indexed",
            s"""{"store": "fz", "key_cols": ["event_type"],
               | "qs": [0.25, 0.5, 0.9], "k": $k}""".stripMargin,
            "event_type STRING, n_rows BIGINT, p25 DOUBLE, p50 DOUBLE, p90 DOUBLE",
            () => {
              MergeStore.writeKllPart(events, Seq("event_type"), "value", scratch, k = k)
              MergeStore.readKllQuantiles(s, scratch, Seq("event_type"), qs, k = k)
            }, true)
      }

      val built = post("index_build", buildBody)
      require(built.statusCode() == 200,
        s"seed=$seed $kind build: HTTP ${built.statusCode()}: ${built.body().take(300)}")
      val probed = post(probeOp, probeBody)
      require(probed.statusCode() == 200,
        s"seed=$seed $kind probe: HTTP ${probed.statusCode()}: ${probed.body().take(300)}")
      val dropped = delete("fz")
      require(dropped.statusCode() == 200,
        s"seed=$seed $kind delete: HTTP ${dropped.statusCode()}: ${dropped.body().take(300)}")
      val reprobe = post(probeOp, probeBody)
      require(reprobe.statusCode() == 400,
        s"seed=$seed $kind probe-after-delete: expected 400, got " +
          s"${reprobe.statusCode()}: ${reprobe.body().take(200)}")

      import s.implicits._
      val httpDf = s.read.schema(parseSchema).json(s.createDataset(Seq(probed.body())))
      val got = GoldenStores.canon(httpDf)
      val want = GoldenStores.canon(direct())
      Outcome(seed, kind, params, got.size, matches(got, want, band),
        if (matches(got, want, band)) "ok"
        else s"got=${got.size} want=${want.size} firstDiff=" +
          got.zipAll(want, "<missing>", "<missing>").find { case (a2, b2) => a2 != b2 }
            .map(_.toString).getOrElse(""))
    } finally {
      srv.stop()
      rmrf(base)
    }
  }
}

class IndexBuildFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  private val dir = "/root/testdata/sf0.001"

  // 12 seeded lifecycle points in-suite (the bulk receipt runs via
  // IndexBuildFuzzSweep); failures print the seed so any point replays
  test("12 seeded index_build lifecycles: HTTP probe == direct operator call") {
    val outcomes = (1L to 12L).map(IndexBuildFuzz.runPoint(spark, dir, _))
    val bad = outcomes.filterNot(_.matched)
    assert(bad.isEmpty, "diverged points:\n" +
      bad.map(o => s"  seed=${o.seed} ${o.kind} ${o.params}: ${o.detail}").mkString("\n"))
    // the 12-seed draw must cover more than half the kind space, or the
    // spec silently narrows when the kind vector changes
    assert(outcomes.map(_.kind).distinct.size >= 4,
      s"seed draw collapsed: only ${outcomes.map(_.kind).distinct} covered")
  }
}

/** Bulk ledger receipt: `sbt "Test/runMain graft.api.IndexBuildFuzzSweep
  * /root/testdata/sf0.001 1 60"` — one JSON line with per-kind counts. */
object IndexBuildFuzzSweep {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, fromS, toS) = args
    val spark = graft.FuzzSweepRunner.session()
    val outcomes = (fromS.toLong to toS.toLong).map { seed =>
      val o = IndexBuildFuzz.runPoint(spark, sfDir, seed)
      System.err.println(s"[ibfuzz] seed=${o.seed} ${o.kind} ${o.params} " +
        s"rows=${o.httpRows} matched=${o.matched}")
      o
    }
    val byKind = outcomes.groupBy(_.kind).toSeq.sortBy(_._1)
      .map { case (k, os) => s""""$k":${os.size}""" }.mkString("{", ",", "}")
    val failed = outcomes.filterNot(_.matched)
    println(s"""{"metric":"index_build_fuzz","points":${outcomes.size},""" +
      s""""matched":${outcomes.count(_.matched)},"by_kind":$byKind,""" +
      s""""failed_seeds":[${failed.map(_.seed).mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
