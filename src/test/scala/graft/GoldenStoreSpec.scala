package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Standing format-stability gate over the committed golden stores
  * ([[GoldenStores]]): every persisted store kind is read through its
  * CURRENT production read path from bytes a PAST build wrote, and the
  * canonical rows must match the expectations committed next to them.
  * A refactor that changes gram hashing, part addressing, bucket
  * layout, sketch encoding, or merge algebra — invalidating every
  * store users built with earlier code — fails here, not in
  * production. (Parameter drift is separately guarded by the stores'
  * own meta checks; this is the layout/semantics half no meta file can
  * see.) If a break is INTENTIONAL, rebuild via GoldenStoreBuild and
  * let the fixture diff document it. */
class GoldenStoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.session()


  private val root = new File(GoldenStores.fixtureRoot)

  GoldenStores.all.foreach { g =>
    test(s"golden ${g.name}: committed bytes read back identically") {
      assert(new File(root, g.name).isDirectory,
        s"fixture ${g.name} missing — run GoldenStoreBuild once and commit it")
      val expectedFile = Paths.get(root.getPath, s"${g.name}.expected.txt")
      val expected = new String(Files.readAllBytes(expectedFile), "UTF-8")
        .linesIterator.filter(_.nonEmpty).toVector
      val got = GoldenStores.canon(
        g.read(spark, new File(root, g.name).getAbsolutePath))
      if (g.exact) {
        assert(got == expected,
          s"golden ${g.name}: read-path drift — got ${got.size} rows vs " +
            s"${expected.size} expected; first diff: " +
            s"${got.zipAll(expected, "<missing>", "<missing>")
              .find { case (a, b) => a != b }.getOrElse(("", ""))}")
      } else {
        // randomized-read store (KLL): pin row set shape, keys, and
        // exact integer columns; numeric estimate columns get a 15%
        // relative band (k = 200 rank error is ~1.65%; the band covers
        // value-space amplification without hiding a broken decoder)
        assert(got.size == expected.size,
          s"golden ${g.name}: ${got.size} rows vs ${expected.size} expected")
        got.sorted.zip(expected.sorted).foreach { case (gl, el) =>
          val (gf, ef) = (gl.split('|'), el.split('|'))
          assert(gf.length == ef.length, s"golden ${g.name}: column drift $gl vs $el")
          gf.zip(ef).foreach { case (gv, ev) =>
            (gv.toDoubleOption, ev.toDoubleOption) match {
              case (Some(gd), Some(ed)) if gv.contains('.') || ev.contains('.') =>
                assert(math.abs(gd - ed) <= math.abs(ed) * 0.15 + 1e-9,
                  s"golden ${g.name}: $gv outside the 15% band of $ev (row $el)")
              case _ =>
                assert(gv == ev, s"golden ${g.name}: $gv != $ev (row $el)")
            }
          }
        }
      }
    }
  }
}
