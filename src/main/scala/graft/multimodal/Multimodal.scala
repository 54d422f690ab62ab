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
  * Codecs: IMAGE (ImageIO) and AUDIO (javax.sound.sampled) decode for
  * real — both are pure-JVM, no native deps. VIDEO container metadata
  * (MP4/ISO-BMFF and RIFF AVI: pixel dimensions + frame count) parses
  * for real via a byte-level box walk, and MJPEG AVI frames decode for
  * real too (each frame is a whole JPEG — ImageIO handles it; see
  * [[extractFrames]]). Inter-frame codecs (H.264 etc.) keep a
  * deterministic byte-derived fallback (clearly marked below) because
  * no pure-JVM decoder exists for them. The Spark-side contract —
  * schemas, batching, partitioning, explode shape — is identical
  * across real and fallback kinds, and tested.
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
    * BMP), so does AUDIO (pure-JVM javax.sound.sampled: WAV/AIFF/AU),
    * and VIDEO container metadata parses for real (MP4/AVI box walk —
    * true dimensions + frame count, no codec needed); bytes that aren't
    * parseable fall through to the deterministic stub with the same
    * signature, so the plan shape is identical either way.
    *
    * Column mapping for audio rows (the decoded schema is fixed across
    * kinds): `width` = sample rate in Hz, `height` = channel count,
    * `n_frames` = PCM frame count (frames / rate = duration). */
  def decodeAndFeaturize(assets: DataFrame, featureDim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    assets.select("asset_id", "kind", "bytes").mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0); val kind = row.getString(1)
        val bytes = if (row.isNullAt(2)) Array.empty[Byte] else row.getAs[Array[Byte]](2)
        val (w, h, frames, feats) =
          (kind match {
            case "image" => decodeImage(bytes, featureDim)
            case "audio" => decodeAudio(bytes, featureDim)
            case "video" => decodeVideo(bytes, featureDim)
            case _       => None
          }).getOrElse(decodeStub(kind, bytes, featureDim))
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
      else Some((img.getWidth, img.getHeight, 1, lumHistogram(img, dim)))
    } catch { case _: Exception => None }

  /** Normalized `dim`-bucket luminance histogram sampled on a <=64x64
    * grid — the shared content-derived feature for decoded pixels
    * (images AND decoded video frames). */
  private def lumHistogram(img: java.awt.image.BufferedImage, dim: Int): Seq[Float] = {
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
    hist.map(_ / math.max(1, total)).toSeq
  }

  /** Magic-byte sniff for the containers `javax.sound.sampled` reads
    * out of the box: RIFF/WAVE, FORM/AIFF-AIFC, and `.snd` (AU). Same
    * rationale as [[looksLikeImage]]: non-audio payloads must cost a few
    * byte compares, not a codec probe per row. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    (b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
       b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
       b(8) == 'A' && b(9) == 'I' && b(10) == 'F'))) ||
    (b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')

  /** REAL audio decode: `javax.sound.sampled` (in every JVM — no native
    * deps) reads WAV/AIFF/AU payloads. Output maps onto the fixed
    * decoded schema as (sample rate Hz, channel count, PCM frame count)
    * and the feature vector is a normalized `dim`-bucket amplitude
    * histogram of the first channel after converting to signed 16-bit
    * PCM — deterministic and content-derived, like the image luminance
    * histogram. The histogram reads at most 2^20 frames (~24 s at
    * 44.1 kHz): the metadata is exact for any length while the feature
    * pass stays O(bounded) per row at corpus scale. Returns None when
    * the bytes aren't decodable audio, letting the caller fall back to
    * the stub. */
  private[multimodal] def decodeAudio(bytes: Array[Byte], dim: Int): Option[(Int, Int, Int, Seq[Float])] =
    if (!looksLikeAudio(bytes)) None
    else try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = raw.getFormat
        val nFrames = math.min(raw.getFrameLength, Int.MaxValue.toLong).toInt
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, raw)
        val frameSize = pcmFmt.getFrameSize
        val maxFrames = 1 << 20
        val hist = new Array[Float](dim)
        val buf = new Array[Byte](frameSize * 1024)
        var total = 0
        var eof = false
        while (!eof && total < maxFrames) {
          val n = pcm.read(buf)
          if (n <= 0) eof = true
          else {
            var off = 0
            while (off + frameSize <= n && total < maxFrames) {
              // first channel, little-endian signed 16-bit
              val s = (buf(off + 1) << 8) | (buf(off) & 0xFF)
              hist(math.min(dim - 1, (s + 32768) * dim / 65536)) += 1f
              total += 1
              off += frameSize
            }
          }
        }
        pcm.close()
        Some((src.getSampleRate.toInt, src.getChannels, nFrames,
          hist.map(_ / math.max(1, total)).toSeq))
      } finally raw.close()
    } catch { case _: Exception => None }

  /** Magic-byte sniff for the two video containers the metadata parser
    * reads: ISO-BMFF (`ftyp` at offset 4 — MP4/MOV/M4V) and RIFF `AVI `.
    * Same rationale as [[looksLikeImage]]. */
  private def looksLikeVideo(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') ||
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
       b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '))

  /** REAL video container metadata: a pure-JVM byte-level parse of the
    * two mainstream containers — ISO-BMFF (MP4/MOV: box walk
    * `moov/trak/tkhd` for pixel dimensions, `stbl/stsz` of the `vide`
    * track for the frame count) and RIFF AVI (`hdrl/avih` main header:
    * dwWidth/dwHeight/dwTotalFrames). No codec is involved, so this is
    * exact for any payload the container describes. For MJPEG AVIs —
    * the one codec a bare JVM CAN decode, every frame being a whole
    * JPEG — the first frame additionally DECODES for real: true pixel
    * dimensions from the decoded frame and the same luminance-histogram
    * features as the image path. Other codecs (H.264 etc.) keep the
    * container metadata and a normalized byte-value histogram over the
    * first 1 MiB of payload (deterministic and content-derived; see
    * README deviation #4 — inter-frame codecs need a native decoder).
    * Returns None when the bytes aren't a parseable container, letting
    * the caller fall back to the stub. */
  private[multimodal] def decodeVideo(bytes: Array[Byte], dim: Int): Option[(Int, Int, Int, Seq[Float])] =
    if (!looksLikeVideo(bytes)) None
    else try {
      val parsed =
        if (bytes(0) == 'R') parseAvi(bytes)
        else new Mp4Walk(bytes).parse()
      parsed.map { case (w, h, frames) =>
        // MJPEG AVI: the first video chunk is a whole JPEG — decode it
        // for REAL pixel dims + luminance features (one frame per row,
        // O(1) regardless of video length). Other codecs keep the exact
        // container metadata + a payload byte histogram.
        firstJpegFrame(bytes).flatMap(decodeJpegFrame(_, dim)) match {
          case Some((fw, fh, feats)) => (fw, fh, frames, feats)
          case None => (w, h, frames, byteHistogram(bytes, dim))
        }
      }
    } catch { case _: Exception => None }

  /** First `movi` video chunk that carries a JPEG payload (MJPEG AVI),
    * None for other codecs/containers. */
  private def firstJpegFrame(b: Array[Byte]): Option[Array[Byte]] = {
    val it = aviVideoChunks(b)
    while (it.hasNext) {
      val f = it.next()
      if (f.length >= 3 && f(0) == 0xFF.toByte && f(1) == 0xD8.toByte && f(2) == 0xFF.toByte)
        return Some(f)
    }
    None
  }

  private def decodeJpegFrame(jpeg: Array[Byte], dim: Int): Option[(Int, Int, Seq[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      if (img == null) None else Some((img.getWidth, img.getHeight, lumHistogram(img, dim)))
    } catch { case _: Exception => None }

  /** Video data chunks (`##db`/`##dc`) inside a RIFF AVI's `movi` LIST,
    * in stream order, descending into interleave `rec ` sub-LISTs.
    * Returns payload slices lazily — callers sampling every nth frame
    * never copy the rest. Empty iterator for non-AVI bytes. */
  private[multimodal] def aviVideoChunks(b: Array[Byte]): Iterator[Array[Byte]] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ') return Iterator.empty
    def fourcc(off: Int) = new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def isVideoData(cc: String) =
      cc.length == 4 && cc(0).isDigit && cc(1).isDigit && cc(2) == 'd' && (cc(3) == 'b' || cc(3) == 'c')
    // find the movi LIST at top level
    var off = 12L
    var movi = -1L; var moviEnd = -1L
    while (movi < 0 && off + 12 <= b.length) {
      val cc = fourcc(off.toInt)
      val size = le32(b, off.toInt + 4)
      if (cc == "LIST" && fourcc(off.toInt + 8) == "movi") {
        movi = off + 12; moviEnd = math.min(b.length.toLong, off + 8 + size)
      }
      off = off + 8 + size + (size & 1)
    }
    if (movi < 0) return Iterator.empty
    new Iterator[Array[Byte]] {
      // chunk walk with one level of `rec ` descent
      private var stack = List((movi, moviEnd))
      private var nextFrame: Array[Byte] = null
      private def advance(): Unit = {
        nextFrame = null
        while (nextFrame == null && stack.nonEmpty) {
          val (pos, end) = stack.head
          if (pos + 8 > end) stack = stack.tail
          else {
            val cc = fourcc(pos.toInt)
            val size = le32(b, pos.toInt + 4)
            val after = pos + 8 + size + (size & 1)
            stack = (after, end) :: stack.tail
            if (cc == "LIST" && pos + 12 <= end && fourcc(pos.toInt + 8) == "rec ")
              stack = (pos + 12, math.min(end, pos + 8 + size)) :: stack
            else if (isVideoData(cc) && pos + 8 + size <= end && size > 0)
              nextFrame = java.util.Arrays.copyOfRange(b, (pos + 8).toInt, (pos + 8 + size).toInt)
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextFrame != null
      override def next(): Array[Byte] = { val f = nextFrame; advance(); f }
    }
  }

  /** REAL frame extraction: explode every `everyNth` ACTUAL video frame
    * of an MJPEG AVI payload as its own row — `frame_bytes` is a whole
    * JPEG, decodable downstream by the image path (the keyframe-
    * extraction stage of a video pipeline). Videos that aren't MJPEG
    * AVIs fall back to the deterministic byte-chunk sampling of
    * [[sampleFrames]] under the SAME output schema, so mixed-codec
    * corpora run in one plan. mapPartitions (row-level codec work), no
    * driver involvement, output rows carry only the sampled frames. */
  def extractFrames(assets: DataFrame, everyNth: Int = 4, chunkBytes: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.filter(col("kind") === "video").select("asset_id", "bytes").mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val bytes = if (row.isNullAt(1)) Array.empty[Byte] else row.getAs[Array[Byte]](1)
        val real = aviVideoChunks(bytes).zipWithIndex.collect {
          case (f, i) if i % everyNth == 0 => Row(id, i.toLong, f)
        }
        if (real.hasNext) real
        else Iterator.range(0, math.max(1, (bytes.length + chunkBytes - 1) / chunkBytes), everyNth)
          .map { i =>
            val from = i * chunkBytes
            Row(id, i.toLong, java.util.Arrays.copyOfRange(bytes, from,
              math.min(bytes.length, from + chunkBytes)))
          }
      }
    }(enc)
  }

  private def byteHistogram(b: Array[Byte], dim: Int): Seq[Float] = {
    val n = math.min(b.length, 1 << 20)
    val hist = new Array[Float](dim)
    var i = 0
    while (i < n) { hist((b(i) & 0xFF) * dim / 256) += 1f; i += 1 }
    hist.map(_ / math.max(1, n)).toSeq
  }

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xFFL) << 24) | ((b(off + 2) & 0xFFL) << 16) |
      ((b(off + 1) & 0xFFL) << 8) | (b(off) & 0xFFL)

  /** ISO-BMFF box walker. Boxes are [size:4][type:4][payload]; size==1
    * means a 64-bit size follows, size==0 means to-end-of-enclosing.
    * Descends only into the container boxes on the moov->stbl spine.
    * Per `trak`, records tkhd pixel dims (16.16 fixed point, last 8
    * payload bytes), whether hdlr says `vide`, and the stsz
    * sample_count; the video track (or the first with dims) wins. */
  private final class Mp4Walk(b: Array[Byte]) {
    private var w = 0; private var h = 0; private var frames = 0; private var seenMoov = false
    private var tW = 0; private var tH = 0; private var tFrames = 0; private var tVideo = false
    private var tSpsW = 0; private var tSpsH = 0

    def parse(): Option[(Int, Int, Int)] = {
      walk(0L, b.length.toLong)
      if (seenMoov) Some((w, h, frames)) else None
    }

    private def walk(start: Long, end: Long): Unit = {
      var off = start
      while (off + 8 <= end) {
        var size = be32(b, off.toInt)
        var hdr = 8L
        if (size == 1 && off + 16 <= end) { size = be64(b, off.toInt + 8); hdr = 16 }
        else if (size == 0) size = end - off
        if (size < hdr || off + size > end) return
        val boxEnd = off + size
        val p = (off + hdr).toInt // payload start
        typeOf(off.toInt) match {
          case "moov" => seenMoov = true; walk(off + hdr, boxEnd)
          case "mdia" | "minf" | "stbl" => walk(off + hdr, boxEnd)
          case "trak" =>
            tW = 0; tH = 0; tFrames = 0; tVideo = false; tSpsW = 0; tSpsH = 0
            walk(off + hdr, boxEnd)
            // SPS coded dims (from the bitstream itself) beat tkhd's
            // presentation dims when both are present
            val (rw, rh) = if (tSpsW > 0) (tSpsW, tSpsH) else (tW, tH)
            if (tVideo || (w == 0 && rw > 0)) { w = rw; h = rh; frames = tFrames }
          case "tkhd" if boxEnd - p >= 8 =>
            tW = (be32(b, boxEnd.toInt - 8) >> 16).toInt
            tH = (be32(b, boxEnd.toInt - 4) >> 16).toInt
          case "hdlr" if boxEnd - p >= 12 =>
            if (typeOf(p + 8 - 4) == "vide") tVideo = true // handler_type at payload+8
          case "stsz" if boxEnd - p >= 12 =>
            tFrames = be32(b, p + 8).toInt // after version/flags + sample_size
          case "stsd" => parseStsd(p, boxEnd)
          case _ => // leaf we don't need
        }
        off = boxEnd
      }
    }

    /** 4CC at `off+4` (box type) — also reused for hdlr handler_type. */
    private def typeOf(off: Int): String =
      new String(b, off + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    /** `stsd` leaf: walk the sample entries for an AVC one (`avc1` /
      * `avc3`), find its `avcC` child (AVCDecoderConfigurationRecord),
      * and parse the first SPS for the CODED pixel dimensions — the
      * true frame size straight from the bitstream, where `tkhd`
      * carries the (possibly scaled, possibly zero) PRESENTATION size.
      * Payload layout: version/flags(4) entry_count(4), then
      * [size:4][format:4]-headed entries; a VisualSampleEntry's child
      * boxes start 86 bytes into the entry (8 header + 78 fixed
      * fields, ISO 14496-12 §12.1.3). */
    private def parseStsd(p: Int, boxEnd: Long): Unit = {
      if (boxEnd - p < 8) return
      val entries = be32(b, p + 4).toInt
      var off = p + 8L
      var i = 0
      while (i < entries && off + 8 <= boxEnd) {
        val esize = be32(b, off.toInt)
        if (esize < 8 || off + esize > boxEnd) return
        if (typeOf(off.toInt) == "avc1" || typeOf(off.toInt) == "avc3") {
          var child = off + 86
          while (child + 8 <= off + esize) {
            val csize = be32(b, child.toInt)
            if (csize < 8 || child + csize > off + esize) return
            if (typeOf(child.toInt) == "avcC") {
              H264Sps.firstSpsDims(b, child.toInt + 8, (child + csize).toInt)
                .foreach { case (sw, sh) => tSpsW = sw; tSpsH = sh }
              return
            }
            child += csize
          }
        }
        off += esize; i += 1
      }
    }
  }

  /** RIFF AVI main header: top-level chunks are [fourcc:4][size:4 LE]
    * [payload]; a LIST chunk nests [listType:4][children]. The `hdrl`
    * LIST's first child is `avih` with dwTotalFrames at payload+16 and
    * dwWidth/dwHeight at +32/+36 (all little-endian). */
  private def parseAvi(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var off = 12L // past RIFF size 'AVI '
    while (off + 8 <= b.length) {
      val cc = new String(b, off.toInt, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val size = le32(b, off.toInt + 4)
      if (cc == "LIST" && off + 12 <= b.length &&
          new String(b, off.toInt + 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1) == "hdrl") {
        var in = off + 12
        val listEnd = math.min(b.length.toLong, off + 8 + size)
        while (in + 8 <= listEnd) {
          val icc = new String(b, in.toInt, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
          val isz = le32(b, in.toInt + 4)
          if (icc == "avih" && in + 8 + 40 <= listEnd)
            return Some((le32(b, in.toInt + 8 + 32).toInt, le32(b, in.toInt + 8 + 36).toInt,
              le32(b, in.toInt + 8 + 16).toInt))
          in += 8 + isz + (isz & 1) // chunks are word-aligned
        }
        return None
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** ======== STUB ========
    * Deterministic fake "decode": dimensions and features derived from
    * the payload hash. Only pixel/frame decode lands here now — video
    * CONTAINER metadata parses for real above; images and audio only
    * reach this when the bytes aren't decodable. */
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

/** H.264 sequence-parameter-set parser — pure-JVM extraction of the
  * CODED frame dimensions from the `avcC` box's first SPS NAL, per the
  * published bitstream syntax (ISO/IEC 14496-10 §7.3.2.1
  * `seq_parameter_set_data`). This closes true-dimension extraction for
  * inter-frame codecs without a native decoder: no pixel is decoded,
  * only the header bits every conformant stream must carry.
  *
  * Reference stores video as opaque blobs and never parses it
  * (/root/reference/pkg/storage/blobstore/ — content-agnostic);
  * dimension metadata is this rebuild's multimodal extension. */
private[multimodal] object H264Sps {

  /** MSB-first bit reader with Exp-Golomb (ue/se) decoding. */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def u1(): Int = {
      val bit = (b(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1; bit
    }
    def u(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | u1(); i += 1 }; v }
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) { zeros += 1; if (zeros > 31) throw new IllegalArgumentException("bad ue(v)") }
      ((1 << zeros) - 1) + (if (zeros > 0) u(zeros) else 0)
    }
    def se(): Int = { val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
  }

  /** Strip emulation-prevention bytes (00 00 03 xx -> 00 00 xx): NAL
    * payloads escape start-code-like runs; the RBSP the syntax reads is
    * the unescaped form. */
  private def unescape(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var i = 0
    while (i < nal.length) {
      if (i + 2 < nal.length && nal(i) == 0 && nal(i + 1) == 0 && nal(i + 2) == 3) {
        out.write(0); out.write(0); i += 3
      } else { out.write(nal(i)); i += 1 }
    }
    out.toByteArray
  }

  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var lastScale = 8; var nextScale = 8; var j = 0
    while (j < size) {
      if (nextScale != 0) nextScale = (lastScale + r.se() + 256) % 256
      if (nextScale != 0) lastScale = nextScale
      j += 1
    }
  }

  /** Coded (width, height) from one SPS NAL (header byte included),
    * applying frame cropping in chroma-format units. None if the bits
    * don't parse as an SPS. */
  def parseSps(nal: Array[Byte]): Option[(Int, Int)] =
    try {
      if (nal.length < 4 || (nal(0) & 0x1F) != 7) return None // nal_unit_type 7 = SPS
      val r = new BitReader(unescape(nal.drop(1)))
      val profileIdc = r.u(8)
      r.u(8) // constraint flags + reserved
      r.u(8) // level_idc
      r.ue() // seq_parameter_set_id
      var chromaFormatIdc = 1
      var separateColourPlane = 0
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135).contains(profileIdc)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) separateColourPlane = r.u1()
        r.ue(); r.ue() // bit_depth_luma/chroma_minus8
        r.u1() // qpprime_y_zero_transform_bypass_flag
        if (r.u1() == 1) { // seq_scaling_matrix_present_flag
          val lists = if (chromaFormatIdc == 3) 12 else 8
          var i = 0
          while (i < lists) {
            if (r.u1() == 1) skipScalingList(r, if (i < 6) 16 else 64)
            i += 1
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      r.ue() match { // pic_order_cnt_type
        case 0 => r.ue() // log2_max_pic_order_cnt_lsb_minus4
        case 1 =>
          r.u1(); r.se(); r.se()
          val n = r.ue()
          var i = 0; while (i < n) { r.se(); i += 1 }
        case _ => // type 2: nothing
      }
      r.ue() // max_num_ref_frames
      r.u1() // gaps_in_frame_num_value_allowed_flag
      val widthMbs = r.ue() + 1
      val heightMapUnits = r.ue() + 1
      val frameMbsOnly = r.u1()
      if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field_flag
      r.u1() // direct_8x8_inference_flag
      var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
      if (r.u1() == 1) { cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue() }
      // crop units per chroma format (spec table 6-1): 4:2:0 -> (2,2),
      // 4:2:2 -> (2,1), 4:4:4/monochrome/separate planes -> (1,1);
      // vertical unit additionally doubles for field-coded (interlaced)
      val (subW, subH) = chromaFormatIdc match {
        case 0 => (1, 1)
        case 1 => (2, 2)
        case 2 => (2, 1)
        case _ => if (separateColourPlane == 1) (1, 1) else (1, 1)
      }
      val cropUnitX = subW
      val cropUnitY = subH * (2 - frameMbsOnly)
      val w = widthMbs * 16 - (cropL + cropR) * cropUnitX
      val h = (2 - frameMbsOnly) * heightMapUnits * 16 - (cropT + cropB) * cropUnitY
      if (w > 0 && h > 0) Some((w, h)) else None
    } catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  /** Dims from the first SPS of an AVCDecoderConfigurationRecord
    * (`avcC` payload at [start, end)): version(1) profile(1) compat(1)
    * level(1) lengthSize(1) numSPS(1), then [len:2 BE][NAL] per SPS. */
  def firstSpsDims(b: Array[Byte], start: Int, end: Int): Option[(Int, Int)] = {
    if (end - start < 8 || b(start) != 1) return None
    val numSps = b(start + 5) & 0x1F
    if (numSps < 1) return None
    val lenOff = start + 6
    if (lenOff + 2 > end) return None
    val spsLen = ((b(lenOff) & 0xFF) << 8) | (b(lenOff + 1) & 0xFF)
    if (lenOff + 2 + spsLen > end) return None
    parseSps(java.util.Arrays.copyOfRange(b, lenOff + 2, lenOff + 2 + spsLen))
  }
}
