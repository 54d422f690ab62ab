package graft.multimodal

import graft.functions.Fingerprint64
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Design: media assets are opaque BINARY columns + a typed metadata
  * struct, exactly how a 100 TB image/audio/video corpus is laid out in
  * parquet (bytes inline or as object-store pointers). Transform stages
  * run as mapPartitions over Arrow-sized batches of rows — the Scala
  * analogue of Python's mapInPandas — so a real decoder drops in without
  * changing the plan shape.
  *
  * The DECODERS ARE STUBS: this container has no image/audio libraries,
  * so decode/resize/feature-extract produce deterministic fakes derived
  * from the bytes (clearly marked below). The Spark-side contract —
  * schemas, batching, partitioning, explode shape — is real and tested.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("bytes", BinaryType, nullable = true),      // opaque payload
    StructField("meta", StructType(Seq(                     // typed metadata
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Build a synthetic asset table from the documents corpus (text bytes
    * as payload) — the stand-in for a real media crawl. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        col("source").as("source"),
        length(col("text")).cast("long").as("n_bytes"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** Decoded-image row: fixed-shape metadata + a feature vector. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Decode + feature-extract, batched per partition (mapInPandas
    * analogue). IMAGES decode for real (pure-JVM ImageIO: PNG/JPEG/GIF/
    * BMP); bytes that aren't a decodable image — and all audio/video,
    * which have no pure-JVM codec in this container — fall through to
    * the deterministic stub with the same signature, so the plan shape
    * is identical either way. */
  def decodeAndFeaturize(assets: DataFrame, featureDim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    assets.select("asset_id", "kind", "bytes").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0); val kind = row.getString(1)
        val bytes = if (row.isNullAt(2)) Array.empty[Byte] else row.getAs[Array[Byte]](2)
        val (w, h, frames, feats) =
          (if (kind == "image") decodeImage(bytes, featureDim) else None)
            .getOrElse(decodeStub(kind, bytes, featureDim))
        Row(id, kind, w, h, frames, feats)
      }
    }(enc)
  }

  /** REAL image decode: `javax.imageio.ImageIO` (in every JVM — no
    * native deps) reads PNG/JPEG/GIF/BMP payloads; width/height are the
    * actual pixel dimensions and the feature vector is a normalized
    * `dim`-bucket luminance histogram sampled on a <=64x64 grid — a
    * deterministic, content-derived embedding (near-dup image pairs land
    * near each other in cosine space). Returns None when the bytes
    * aren't a decodable image, letting the caller fall back to the
    * stub. */
  /** Magic-byte sniff (PNG/JPEG/GIF/BMP) so non-image payloads skip the
    * ImageIO reader search entirely — at corpus scale the undecodable
    * fallback must cost a few byte compares, not a codec probe per
    * row. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  private[multimodal] def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Int, Seq[Float])] =
    if (!looksLikeImage(bytes)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val stepX = math.max(1, w / 64); val stepY = math.max(1, h / 64)
        val hist = new Array[Float](dim)
        var total = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
            hist(math.min(dim - 1, lum * dim / 256)) += 1f
            total += 1
            x += stepX
          }
          y += stepY
        }
        Some((w, h, 1, hist.map(_ / math.max(1, total)).toSeq))
      }
    } catch { case _: Exception => None }

  /** ======== STUB ========
    * Deterministic fake "decode": dimensions and features derived from
    * the payload hash. Audio/video stay here until a real codec
    * (JNI/ffmpeg) is available; images only reach this when the bytes
    * aren't decodable. */
  private def decodeStub(kind: String, bytes: Array[Byte], dim: Int): (Int, Int, Int, Seq[Float]) = {
    val h = Fingerprint64.hash(bytes)
    val width = 64 + math.floorMod(h, 512).toInt
    val height = 64 + math.floorMod(h >>> 16, 512).toInt
    val frames = if (kind == "video") 1 + math.floorMod(h >>> 32, 120).toInt else 1
    val feats = (0 until dim).map { i =>
      val z = Fingerprint64.hash(Array((h >>> (i % 56)).toByte, i.toByte))
      (math.floorMod(z, 2000) - 1000) / 1000.0f
    }
    (width, height, frames, feats)
  }

  /** Frame sampling: explode a video payload into every-nth-chunk
    * "frames" (real pipelines: keyframe extraction). Pure plan-side:
    * substring on BINARY + posexplode, no UDF. */
  def sampleFrames(assets: DataFrame, chunkBytes: Int = 64, everyNth: Int = 4): DataFrame = {
    val nChunks = ceil(length(col("bytes")).cast("double") / chunkBytes).cast("int")
    assets.filter(col("kind") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(everyNth))))
      .select(
        col("asset_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("bytes").substr((col("frame_idx") * chunkBytes + 1).cast("int"), lit(chunkBytes))
          .as("frame_bytes"))
  }

  /** Resize: metadata-level transform (a real resize rewrites bytes;
    * the plan/schema contract is identical). */
  def resize(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("width", (col("width") * scale).cast("int"))
      .withColumn("height", (col("height") * scale).cast("int"))
  }
}
