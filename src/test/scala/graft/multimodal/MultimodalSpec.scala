package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


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

  test("decodeAndFeaturize: REAL PNG bytes decode to true dimensions + luminance features") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (10L, "image", png(120, 80, 0xFFFFFF)), // white
      (11L, "image", png(33, 47, 0x000000)),  // black
      (12L, "image", "not an image".getBytes("UTF-8"))) // undecodable -> stub
      .toDF("asset_id", "kind", "bytes")
    val out = Multimodal.decodeAndFeaturize(df, featureDim = 8).orderBy("asset_id").collect()
    // true pixel dimensions, not hash-derived fakes
    assert(out(0).getInt(2) == 120 && out(0).getInt(3) == 80)
    assert(out(1).getInt(2) == 33 && out(1).getInt(3) == 47)
    // luminance histogram: all-white mass in the top bucket, all-black in
    // the bottom; normalized to 1
    val wf = out(0).getSeq[Float](5); val bf = out(1).getSeq[Float](5)
    assert(math.abs(wf.sum - 1.0) < 1e-3 && wf(7) > 0.99f, s"white hist: $wf")
    assert(math.abs(bf.sum - 1.0) < 1e-3 && bf(0) > 0.99f, s"black hist: $bf")
    // undecodable bytes keep the stub's deterministic contract
    assert(out(2).getInt(2) >= 64 && out(2).getSeq[Float](5).length == 8)
  }

  test("decodeAndFeaturize: REAL WAV bytes decode to true rate/channels/frames + amplitude features") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // synthesize PCM signed 16-bit little-endian WAVs in-memory
    def wav(rate: Float, channels: Int, frames: Int)(sample: Int => Short): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, channels,
        channels * 2, rate, false)
      val pcm = new Array[Byte](frames * channels * 2)
      for (i <- 0 until frames; c <- 0 until channels) {
        val s = sample(i)
        val off = (i * channels + c) * 2
        pcm(off) = (s & 0xFF).toByte; pcm(off + 1) = ((s >> 8) & 0xFF).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val silent = wav(8000f, 1, 4000)(_ => 0.toShort)                  // mid-bucket mass
    val loudSquare = wav(44100f, 2, 1000)(i => if (i % 2 == 0) 30000 else -30000) // extreme buckets
    val df = Seq(
      (20L, "audio", silent),
      (21L, "audio", loudSquare),
      (22L, "audio", "RIFF not really a wave file".getBytes("UTF-8"))) // undecodable -> stub
      .toDF("asset_id", "kind", "bytes")
    val out = Multimodal.decodeAndFeaturize(df, featureDim = 8).orderBy("asset_id").collect()
    // true sample rate / channels / frame count, not hash-derived fakes
    assert(out(0).getInt(2) == 8000 && out(0).getInt(3) == 1 && out(0).getInt(4) == 4000)
    assert(out(1).getInt(2) == 44100 && out(1).getInt(3) == 2 && out(1).getInt(4) == 1000)
    // amplitude histograms: silence in the middle bucket, the square wave
    // splits between the outer buckets; both normalized to 1
    val sf = out(0).getSeq[Float](5); val qf = out(1).getSeq[Float](5)
    assert(math.abs(sf.sum - 1.0) < 1e-3 && sf(4) > 0.99f, s"silent hist: $sf")
    assert(math.abs(qf.sum - 1.0) < 1e-3 && qf(0) + qf(7) > 0.99f, s"square hist: $qf")
    // undecodable bytes keep the stub's deterministic contract
    assert(out(2).getInt(2) >= 64 && out(2).getSeq[Float](5).length == 8)
  }

  test("decodeAndFeaturize: REAL MP4/AVI containers parse to true dimensions + frame counts") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    // ISO-BMFF: boxes are [size:4 BE][fourcc:4][payload]
    def box(cc: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(cc.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    def mp4(w: Int, h: Int, frames: Int): Array[Byte] = {
      val tkhd = ByteBuffer.allocate(84) // v0: ver/flags,ctime,mtime,id,res,dur,res8,layer2,alt2,vol2,res2,matrix36,w,h
      tkhd.position(76); tkhd.putInt(w << 16).putInt(h << 16)
      val hdlr = ByteBuffer.allocate(25)
      hdlr.position(8); hdlr.put("vide".getBytes("ISO-8859-1"))
      val stsz = ByteBuffer.allocate(12)
      stsz.position(8); stsz.putInt(frames) // ver/flags, sample_size=0, sample_count
      val mvhd = new Array[Byte](100)       // v0 payload, contents unused by the parser
      val stbl = box("stbl", box("stsz", stsz.array()))
      val minf = box("minf", stbl)
      val mdia = box("mdia", box("hdlr", hdlr.array()) ++ minf)
      val trak = box("trak", box("tkhd", tkhd.array()) ++ mdia)
      box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++ box("moov", box("mvhd", mvhd) ++ trak)
    }
    // RIFF AVI: chunks are [fourcc:4][size:4 LE][payload]
    def avi(w: Int, h: Int, frames: Int): Array[Byte] = {
      val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      avih.position(16); avih.putInt(frames)
      avih.position(32); avih.putInt(w).putInt(h)
      val bb = ByteBuffer.allocate(12 + 12 + 8 + 56).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + 12 + 8 + 56).put("AVI ".getBytes("ISO-8859-1"))
      bb.put("LIST".getBytes("ISO-8859-1")).putInt(4 + 8 + 56).put("hdrl".getBytes("ISO-8859-1"))
      bb.put("avih".getBytes("ISO-8859-1")).putInt(56).put(avih.array())
      bb.array()
    }
    val df = Seq(
      (30L, "video", mp4(640, 360, 240)),
      (31L, "video", avi(320, 240, 120)),
      (32L, "video", "not a video container at all, long enough".getBytes("UTF-8"))) // -> stub
      .toDF("asset_id", "kind", "bytes")
    val out = Multimodal.decodeAndFeaturize(df, featureDim = 8).orderBy("asset_id").collect()
    // true container metadata, not hash-derived fakes
    assert(out(0).getInt(2) == 640 && out(0).getInt(3) == 360 && out(0).getInt(4) == 240)
    assert(out(1).getInt(2) == 320 && out(1).getInt(3) == 240 && out(1).getInt(4) == 120)
    // byte-histogram features: normalized, deterministic
    val f0 = out(0).getSeq[Float](5)
    assert(f0.length == 8 && math.abs(f0.sum - 1.0) < 1e-3, s"mp4 hist: $f0")
    // unparseable bytes keep the stub's deterministic contract
    assert(out(2).getInt(2) >= 64 && out(2).getSeq[Float](5).length == 8)
  }

  test("H.264 SPS: coded dims from avcC (crop + emulation-prevention bytes); SPS beats tkhd presentation size") {
    import spark.implicits._
    import java.nio.ByteBuffer
    def box(cc: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(cc.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    // bitstream writer for seq_parameter_set_data (ISO 14496-10 §7.3.2.1)
    class BitWriter {
      private val bits = scala.collection.mutable.ArrayBuffer[Int]()
      def u(v: Int, n: Int): this.type = { ((n - 1) to 0 by -1).foreach(i => bits += ((v >> i) & 1)); this }
      def ue(v: Int): this.type = {
        val k = v + 1
        val len = 32 - Integer.numberOfLeadingZeros(k)
        u(0, len - 1); u(k, len)
      }
      def rbsp: Array[Byte] = {
        val all = bits :+ 1 // rbsp_stop_one_bit
        val padded = all ++ Seq.fill((8 - all.length % 8) % 8)(0)
        padded.grouped(8).map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
      }
    }
    // emulation-prevention escaping: 00 00 followed by <= 03 gets a 03
    def escape(rbsp: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      var zeros = 0
      rbsp.foreach { b =>
        if (zeros >= 2 && (b & 0xFF) <= 3) { out += 3; zeros = 0 }
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      out.toArray
    }
    // baseline 320x180: 20x12 macroblocks with 6 map units of bottom
    // crop (x2 for 4:2:0 chroma) — 192 - 12 = 180
    def sps(spsId: Int, level: Int, cropBottom: Int): Array[Byte] = {
      val w = new BitWriter
      w.u(66, 8).u(0, 8).u(level, 8).ue(spsId)
      w.ue(0)      // log2_max_frame_num_minus4
      w.ue(0)      // pic_order_cnt_type 0
      w.ue(0)      // log2_max_pic_order_cnt_lsb_minus4
      w.ue(1)      // max_num_ref_frames
      w.u(0, 1)    // gaps_in_frame_num_value_allowed_flag
      w.ue(19)     // pic_width_in_mbs_minus1  -> 320
      w.ue(11)     // pic_height_in_map_units_minus1 -> 192
      w.u(1, 1)    // frame_mbs_only_flag
      w.u(1, 1)    // direct_8x8_inference_flag
      if (cropBottom > 0) { w.u(1, 1); w.ue(0); w.ue(0); w.ue(0); w.ue(cropBottom) }
      else w.u(0, 1)
      Array(0x67.toByte) ++ escape(w.rbsp)
    }
    assert(H264Sps.parseSps(sps(0, 30, 6)) == Some((320, 180)))
    // constraint+level bytes 00 00 followed by sps_id ue(63) = bits
    // 000000100.. forces a real 00 00 03 escape in the NAL — the parser
    // must read through it
    val escaped = sps(63, 0, 0)
    assert(escaped.containsSlice(Array[Byte](0, 0, 3)), "fixture must exercise escaping")
    assert(H264Sps.parseSps(escaped) == Some((320, 192)))
    // full container: avcC inside an avc1 sample entry inside stsd;
    // tkhd deliberately carries a DIFFERENT (scaled) presentation size
    val nal = sps(0, 30, 6)
    val avcC = box("avcC", Array[Byte](1, 66, 0, 30, 0xFF.toByte, 0xE1.toByte,
      (nal.length >> 8).toByte, (nal.length & 0xFF).toByte) ++ nal ++ Array[Byte](0))
    val avc1 = {
      val fields = new Array[Byte](78) // VisualSampleEntry fixed fields
      val bb = ByteBuffer.allocate(8 + 78 + avcC.length)
      bb.putInt(8 + 78 + avcC.length).put("avc1".getBytes("ISO-8859-1")).put(fields).put(avcC)
      bb.array()
    }
    val stsd = {
      val bb = ByteBuffer.allocate(8 + avc1.length)
      bb.putInt(0).putInt(1).put(avc1) // version/flags, entry_count
      box("stsd", bb.array())
    }
    val tkhd = ByteBuffer.allocate(84)
    tkhd.position(76); tkhd.putInt(640 << 16).putInt(360 << 16) // presentation 2x
    val hdlr = ByteBuffer.allocate(25)
    hdlr.position(8); hdlr.put("vide".getBytes("ISO-8859-1"))
    val stsz = ByteBuffer.allocate(12)
    stsz.position(8); stsz.putInt(240)
    val stbl = box("stbl", stsd ++ box("stsz", stsz.array()))
    val mdia = box("mdia", box("hdlr", hdlr.array()) ++ box("minf", stbl))
    val trak = box("trak", box("tkhd", tkhd.array()) ++ mdia)
    val mp4 = box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", new Array[Byte](100)) ++ trak)
    val out = Multimodal.decodeAndFeaturize(Seq((40L, "video", mp4)).toDF("asset_id", "kind", "bytes"),
      featureDim = 8).collect()(0)
    assert(out.getInt(2) == 320 && out.getInt(3) == 180,
      s"coded SPS dims must beat tkhd presentation dims, got ${out.getInt(2)}x${out.getInt(3)}")
    assert(out.getInt(4) == 240)
  }

  test("MJPEG AVI: REAL frame decode (true dims + luminance features) and extractFrames returns whole JPEGs") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    def jpeg(w: Int, h: Int, shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // RIFF AVI with an hdrl (avih: frame count + WRONG header dims, so the
    // test proves dims come from the DECODED frame) and a movi LIST of
    // 00dc JPEG chunks, one interleaved inside a `rec ` sub-LIST
    def mjpegAvi(headerW: Int, headerH: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
        val pad = payload.length & 1
        val bb = ByteBuffer.allocate(8 + payload.length + pad).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(cc.getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
        bb.array()
      }
      def list(kind: String, children: Array[Byte]): Array[Byte] =
        chunk("LIST", kind.getBytes("ISO-8859-1") ++ children)
      val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      avih.position(16); avih.putInt(frames.size)
      avih.position(32); avih.putInt(headerW).putInt(headerH)
      val moviChildren = frames.zipWithIndex.flatMap { case (f, i) =>
        if (i == frames.size - 1) list("rec ", chunk("00dc", f)) // interleave descent path
        else chunk("00dc", f)
      }.toArray
      val body = list("hdrl", chunk("avih", avih.array())) ++ list("movi", moviChildren)
      val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + body.length).put("AVI ".getBytes("ISO-8859-1"))
      bb.put(body)
      bb.array()
    }
    val fs = Seq(jpeg(48, 32, 30), jpeg(48, 32, 120), jpeg(48, 32, 220), jpeg(48, 32, 250))
    val avi = mjpegAvi(999, 888, fs)
    val df = Seq((40L, "video", avi)).toDF("asset_id", "kind", "bytes")

    val dec = Multimodal.decodeAndFeaturize(df, featureDim = 8).collect().head
    // dims from the DECODED first frame, not the (deliberately wrong) header
    assert(dec.getInt(2) == 48 && dec.getInt(3) == 32)
    assert(dec.getInt(4) == 4) // frame count still from avih
    // dark first frame -> luminance mass in the low buckets
    val feats = dec.getSeq[Float](5)
    assert(math.abs(feats.sum - 1.0) < 1e-3 && feats.head > 0.9, s"feats: $feats")

    val frames = Multimodal.extractFrames(df, everyNth = 2).orderBy("frame_idx").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 2L)) // every 2nd of 4
    // each extracted frame is the exact original JPEG, decodable downstream
    frames.zip(Seq(fs(0), fs(2))).foreach { case (r, expect) =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), expect))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(img.getWidth == 48 && img.getHeight == 32)
    }
    // non-MJPEG video payloads keep the byte-chunk fallback shape
    val fallback = Multimodal.extractFrames(
      Seq((41L, "video", "not an avi but long enough to chunk twice ok".getBytes("UTF-8") ++ new Array[Byte](200)))
        .toDF("asset_id", "kind", "bytes"), everyNth = 4, chunkBytes = 64).collect()
    assert(fallback.nonEmpty && fallback.forall(_.getAs[Array[Byte]](2).length <= 64))
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
