package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Layout.writeRangeSorted posture: the VALUES are gated by q106's
  * oracle row; these specs pin the layout properties that make footer
  * statistics prune at 100 TB — disjoint per-file sort-key ranges and
  * a sort-key predicate that reaches the parquet scan. */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()


  /** Per-file [min,max] of a long column, straight from the footers. */
  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.toSeq.map { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val stats = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == column)
          .map(_.getStatistics)
        (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
         stats.map(_.genericGetMax.asInstanceOf[Long]).max)
      } finally reader.close()
    }
  }

  test("writeRangeSorted: per-file sort-key ranges are pairwise disjoint, content exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/t"
    // keys arrive shuffled — the rewrite must impose the clustering
    val src = (1L to 10000L).map(i => ((i * 7919L) % 10007L, i))
      .toDF("k", "payload")
    Layout.writeRangeSorted(src, dir, Seq("k"), numFiles = 8)

    val ranges = fileRanges(dir, "k").sortBy(_._1)
    assert(ranges.size >= 2, s"expected a multi-file layout, got $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping file ranges: $ranges")
      case _ =>
    }

    val back = Layout.readSorted(spark, dir)
    assert(back.count() == 10000L)
    assert(back.agg(sum(col("payload"))).head().getLong(0) ==
      src.agg(sum(col("payload"))).head().getLong(0))
    assert(back.select("k", "payload").except(src).isEmpty &&
      src.except(back.select("k", "payload")).isEmpty)
  }

  test("writeZOrdered: files bound BOTH dims — a narrow 2nd-dim band prunes; 1-D sort reads all") {
    import spark.implicits._
    // independent 2-D grid: a 1-D sort on x leaves y unbounded per file
    val n = 141
    val src = (0 until n * n).map(i => (i.toLong % n, i.toLong / n)).toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft-z").toString
    Layout.writeZOrdered(src, s"$base/z", Seq("x", "y"), numFiles = 16, bitsPerDim = 7)
    Layout.writeRangeSorted(src, s"$base/x", Seq("x"), numFiles = 16)

    def overlapping(dir: String, lo: Long, hi: Long): Int =
      fileRanges(dir, "y").count { case (mn, mx) => mx >= lo && mn < hi }
    val zFiles = fileRanges(s"$base/z", "y").size
    val xFiles = fileRanges(s"$base/x", "y").size
    // y-band query: the z layout prunes at least half the files on the
    // SECOND dimension; the x-sorted layout can prune none
    assert(overlapping(s"$base/z", 10L, 20L) <= zFiles / 2,
      s"z layout did not bound y: ${fileRanges(s"$base/z", "y")}")
    assert(overlapping(s"$base/x", 10L, 20L) == xFiles,
      "x-sorted layout unexpectedly bounded y — test premise broken")

    val back = Layout.readSorted(spark, s"$base/z")
    assert(back.count() == n.toLong * n)
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }

  test("QuantileRank: binary search counts boundaries <= value, inclusive at cuts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bnds = Array(10.0, 20.0, 30.0)
    val got = Seq(5.0, 10.0, 15.0, 30.0, 99.0).toDF("v")
      .select(graft.functions.QuantileRank.quantile_rank(col("v"), bnds).as("r"))
      .collect().map(_.getLong(0)).toSeq
    // below-all -> 0; == a cut counts it; above-all -> n
    assert(got == Seq(0L, 1L, 1L, 3L, 3L))
    // interpreted path agrees with codegen
    assert(Seq(5.0, 10.0, 15.0, 30.0, 99.0).map(
      graft.functions.QuantileRank.rank(bnds, _)) == Seq(0L, 1L, 1L, 3L, 3L))
    // empty boundaries (approxQuantile of an empty/all-null column)
    // rank everything 0 instead of refusing
    assert(graft.functions.QuantileRank.rank(Array.empty[Double], 42.0) == 0L)
  }

  test("writeZOrdered tolerates null and empty dimensions (rank 0, other dims still cluster)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-znull").toString + "/t"
    // y null for a third of rows; the write must complete and keep rows
    val src = (1L to 3000L).map(i =>
      (i % 50L, if (i % 3 == 0) None else Some(i / 50L), i)).toDF("x", "y", "p")
    Layout.writeZOrdered(src, dir, Seq("x", "y"), numFiles = 4)
    val back = Layout.readSorted(spark, dir)
    assert(back.count() == 3000L)
    assert(back.select("p").except(src.select("p")).isEmpty)
    // null-y rows are NOT collapsed into one file: their x bits still
    // spread them (multiple files contain null-y rows)
    val dirs = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val filesWithNullY = dirs.count { f =>
      spark.read.parquet(f).filter(col("y").isNull).limit(1).count() > 0
    }
    assert(filesWithNullY >= 2, s"null-y rows collapsed into $filesWithNullY file(s)")

    // an ENTIRELY null dimension degenerates to 1-D clustering, no crash
    val dir2 = java.nio.file.Files.createTempDirectory("graft-znull2").toString + "/t"
    val allNull = (1L to 500L).map(i => (i, Option.empty[Long])).toDF("x", "y")
    Layout.writeZOrdered(allNull, dir2, Seq("x", "y"), numFiles = 2)
    assert(Layout.readSorted(spark, dir2).count() == 500L)
  }

  test("sort-key range predicate reaches the parquet scan as a pushed filter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-layout2").toString + "/t"
    Layout.writeRangeSorted(
      (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v"), dir, Seq("k"), numFiles = 4)
    val q = Layout.readSorted(spark, dir)
      .filter(col("k") >= 100L && col("k") < 200L).select("k")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.treeString
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(k,100)") && scan.contains("LessThan(k,200)"),
      s"sort-key range not pushed to the scan:\n${scan.take(600)}")
    assert(q.count() == 100L)
  }
}
