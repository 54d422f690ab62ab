package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs() = {
    import spark.implicits._
    Seq(
      (0L, "a video payload long enough to have several chunks " * 4, "crawl"),
      (1L, "short image bytes", "crawl"),
      (2L, "audio payload here with some more content", "upload"),
      (3L, "another video-kind doc with enough bytes to chunk " * 3, "crawl"))
      .toDF("doc_id", "text", "source")
  }

  test("decodeAndFeaturize: pinned schema, deterministic output, per-kind frames") {
    val assets = Multimodal.assetsFromDocuments(docs())
    val out = Multimodal.decodeAndFeaturize(assets, featureDim = 8)
    assert(out.schema == Multimodal.decodedSchema)
    val rows1 = out.orderBy("asset_id").collect()
    val rows2 = Multimodal.decodeAndFeaturize(assets, featureDim = 8).orderBy("asset_id").collect()
    assert(rows1.toSeq == rows2.toSeq) // stub is deterministic: same bytes -> same features
    rows1.foreach { r =>
      assert(r.getSeq[Float](5).length == 8)
      assert(r.getInt(2) >= 64 && r.getInt(3) >= 64)
      if (r.getString(1) != "video") assert(r.getInt(4) == 1) // frames only for video
    }
  }

  test("sampleFrames: every-nth chunk explode with correct counts and sizes") {
    val assets = Multimodal.assetsFromDocuments(docs())
    val frames = Multimodal.sampleFrames(assets, chunkBytes = 64, everyNth = 4)
    // only video assets (doc_id % 3 == 2 -> video per assetsFromDocuments kind cycle)
    val kinds = assets.select("asset_id", "kind").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byAsset = frames.groupBy("asset_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byAsset.keys.foreach(id => assert(kinds(id) == "video"))
    // expected: ceil(len/64) chunks, indices 0,4,8.. -> ceil(nChunks/4)
    val lens = assets.filter(col("kind") === "video")
      .select(col("asset_id"), length(col("bytes")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    lens.foreach { case (id, len) =>
      val nChunks = math.ceil(len / 64.0).toInt
      val expected = (0 until nChunks by 4).size
      assert(byAsset(id) == expected, s"asset $id: len $len")
    }
    // every sampled frame is a bounded slice
    frames.select(length(col("frame_bytes"))).collect().foreach(r => assert(r.getInt(0) <= 64))
  }

  test("resize caps the longest side and preserves aspect ordering") {
    val assets = Multimodal.assetsFromDocuments(docs())
    val decoded = Multimodal.decodeAndFeaturize(assets)
    val resized = Multimodal.resize(decoded, maxSide = 100)
    resized.select("width", "height").collect().foreach { r =>
      assert(math.max(r.getInt(0), r.getInt(1)) <= 100)
    }
  }
}
