package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

/** Adversarial-bytes fuzz over the multimodal decode surface — the one
  * hand-rolled parser family (ISO-BMFF box walk, RIFF/AVI chunk walk,
  * H.264 SPS bit reader, ImageIO/AudioSystem probes) that never faced
  * malformed input. Contract under test: [[Multimodal.decodeAndFeaturize]]
  * NEVER throws — undecodable bytes fall back to the deterministic
  * byte-derived stub with the same schema — and the result is
  * deterministic (same bytes, same row). [[Multimodal.extractFrames]]
  * (the movi chunk walk) gets the same never-throw pin on the video
  * cases.
  *
  * Seeded families:
  *  - `random`: arbitrary bytes, arbitrary length (incl. empty);
  *  - `magic_garbage`: a REAL magic prefix (PNG/JPEG/GIF/BMP/WAVE/AVI/
  *    ftyp) followed by garbage — defeats the sniffers, lands in the
  *    real decoder's error path;
  *  - `truncate`: a VALID asset cut at a seeded offset — half headers,
  *    split size fields, movi walks off the end;
  *  - `bitflip`: a valid asset with seeded byte corruptions — bad CRCs,
  *    corrupt avcC/SPS payloads, inconsistent chunk sizes;
  *  - `size_bomb`: container size fields rewritten to 0 / 0x7FFFFFFF /
  *    0xFFFFFFFF — targets the box/chunk-walk arithmetic (overflow,
  *    infinite-loop, negative-length windows).
  */
class MultimodalFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  // ---- minimal valid-asset builders (the MultimodalSpec shapes) ----

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1,
      2, 8000f, false)
    val pcm = new Array[Byte](frames * 2)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def box(cc: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(cc.getBytes("ISO-8859-1")).put(payload)
    bb.array()
  }

  private def mp4(w: Int, h: Int, frames: Int): Array[Byte] = {
    val tkhd = ByteBuffer.allocate(84)
    tkhd.position(76); tkhd.putInt(w << 16).putInt(h << 16)
    val hdlr = ByteBuffer.allocate(25)
    hdlr.position(8); hdlr.put("vide".getBytes("ISO-8859-1"))
    val stsz = ByteBuffer.allocate(12)
    stsz.position(8); stsz.putInt(frames)
    // an avcC with a deliberately tiny/garbage SPS payload sits on the
    // stsd path so bitflip/truncate reach the SPS bit reader too
    val avcC = ByteBuffer.allocate(16)
    avcC.put(1.toByte).position(5); avcC.put(0xE1.toByte).putShort(6.toShort)
      .put(Array[Byte](0x67, 0x42, 0x00, 0x1E, 0x8C.toByte, 0x68))
    val avc1 = ByteBuffer.allocate(86 + 24)
    avc1.position(86); avc1.put(box("avcC", avcC.array()))
    val stsd = ByteBuffer.allocate(8).array() ++ box("avc1", avc1.array())
    val stbl = box("stbl", box("stsd", stsd) ++ box("stsz", stsz.array()))
    val mdia = box("mdia", box("hdlr", hdlr.array()) ++ box("minf", stbl))
    val trak = box("trak", box("tkhd", tkhd.array()) ++ mdia)
    box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", new Array[Byte](100)) ++ trak)
  }

  private def avi(w: Int, h: Int, frames: Int): Array[Byte] = {
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.position(16); avih.putInt(frames)
    avih.position(32); avih.putInt(w).putInt(h)
    // hdrl + a movi LIST with two 00dc chunks so the frame walk runs
    val chunk = Array.fill[Byte](32)(0x5A)
    val movi = ByteBuffer.allocate(12 + 2 * (8 + chunk.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    movi.put("LIST".getBytes("ISO-8859-1"))
      .putInt(4 + 2 * (8 + chunk.length)).put("movi".getBytes("ISO-8859-1"))
    (0 until 2).foreach { _ =>
      movi.put("00dc".getBytes("ISO-8859-1")).putInt(chunk.length).put(chunk)
    }
    val bb = ByteBuffer.allocate(12 + 12 + 8 + 56 + movi.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1"))
      .putInt(4 + 12 + 8 + 56 + movi.capacity()).put("AVI ".getBytes("ISO-8859-1"))
    bb.put("LIST".getBytes("ISO-8859-1")).putInt(4 + 8 + 56)
      .put("hdrl".getBytes("ISO-8859-1"))
    bb.put("avih".getBytes("ISO-8859-1")).putInt(56).put(avih.array())
    bb.put(movi.array())
    bb.array()
  }

  // ---- seeded adversarial generator ----

  private val magics: Vector[Array[Byte]] = Vector(
    Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
    Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte),
    "GIF89a".getBytes("ISO-8859-1"),
    "BM".getBytes("ISO-8859-1"),
    "RIFF????WAVE".getBytes("ISO-8859-1"),
    "RIFF????AVI ".getBytes("ISO-8859-1"),
    Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("ISO-8859-1"))

  private def validAsset(r: Random): (String, Array[Byte]) =
    r.nextInt(4) match {
      case 0 => ("image", png(8 + r.nextInt(24), 8 + r.nextInt(24)))
      case 1 => ("audio", wav(100 + r.nextInt(400)))
      case 2 => ("video", mp4(64 + r.nextInt(256), 64 + r.nextInt(256), 1 + r.nextInt(100)))
      case _ => ("video", avi(64 + r.nextInt(256), 64 + r.nextInt(256), 1 + r.nextInt(100)))
    }

  private def adversarial(seed: Int): (String, Array[Byte]) = {
    val r = new Random(seed * 0x9E3779B9L)
    r.nextInt(5) match {
      case 0 => // random bytes, any kind
        val b = new Array[Byte](r.nextInt(4096))
        r.nextBytes(b)
        (Vector("image", "audio", "video")(r.nextInt(3)), b)
      case 1 => // real magic + garbage
        val m = magics(r.nextInt(magics.size))
        val tail = new Array[Byte](r.nextInt(2048))
        r.nextBytes(tail)
        (Vector("image", "audio", "video")(r.nextInt(3)), m ++ tail)
      case 2 => // truncated valid asset
        val (kind, b) = validAsset(r)
        (kind, b.take(r.nextInt(math.max(1, b.length))))
      case 3 => // bit-flipped valid asset
        val (kind, b) = validAsset(r)
        val out = b.clone()
        (0 until (1 + r.nextInt(8))).foreach { _ =>
          if (out.nonEmpty) out(r.nextInt(out.length)) =
            (out(r.nextInt(out.length)) ^ (1 << r.nextInt(8))).toByte
        }
        (kind, out)
      case _ => // size bombs in container length fields
        val (kind, b) = validAsset(r)
        val out = b.clone()
        val bomb = Vector(0, 0x7FFFFFFF, 0xFFFFFFFF)(r.nextInt(3))
        (0 until (1 + r.nextInt(3))).foreach { _ =>
          if (out.length >= 8) {
            val off = r.nextInt(out.length - 4)
            val bb = ByteBuffer.wrap(out, off, 4)
            if (r.nextBoolean()) bb.order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(bomb)
          }
        }
        (kind, out)
    }
  }

  test("decodeAndFeaturize never throws on adversarial bytes, falls back to the stub, deterministic") {
    import spark.implicits._
    val cases = (1 to 150).map { seed =>
      val (kind, bytes) = adversarial(seed)
      (seed.toLong, kind, bytes)
    }
    val df = cases.toDF("asset_id", "kind", "bytes")
    val out1 = Multimodal.decodeAndFeaturize(df, featureDim = 8)
      .orderBy("asset_id").collect()
    val out2 = Multimodal.decodeAndFeaturize(df, featureDim = 8)
      .orderBy("asset_id").collect()
    assert(out1.length == cases.size, "a row was lost in the decode path")
    assert(out1.toSeq == out2.toSeq, "decode is not deterministic on corrupt bytes")
    out1.foreach { r =>
      assert(r.getSeq[Float](5).length == 8,
        s"asset ${r.getLong(0)}: feature vector length ${r.getSeq[Float](5).length}")
      assert(!r.isNullAt(2) && !r.isNullAt(3) && !r.isNullAt(4),
        s"asset ${r.getLong(0)}: null dims from the fallback path")
    }
  }

  test("extractFrames (movi chunk walk) never throws on adversarial video bytes") {
    import spark.implicits._
    val cases = (1 to 150).map(adversarial).filter(_._1 == "video")
      .zipWithIndex.map { case ((k, b), i) => (i.toLong, k, b) }
    val df = cases.toDF("asset_id", "kind", "bytes")
    // materialize fully: the walk must neither throw nor loop on
    // 0 / 0x7FFFFFFF / 0xFFFFFFFF chunk sizes
    val n = Multimodal.extractFrames(df, everyNth = 2, chunkBytes = 32).count()
    assert(n >= 0)
    val s = Multimodal.sampleFrames(df, chunkBytes = 32, everyNth = 2).count()
    assert(s >= 0)
  }
}
