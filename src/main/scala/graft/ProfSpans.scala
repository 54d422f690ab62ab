package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the duplicated-span excision family
  * (q75/q86/q89/q217/q218) — times each pipeline piece against a noop
  * sink (guide §1.4) so the per-stage CPU sink is measured, not
  * guessed. Not part of the library surface; results recorded in
  * OPTIMIZATION_r22.md. */
object ProfSpans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val k = 8

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(df: => DataFrame): Unit = {
      // cold (first run: planning + codegen + JIT), then median of 3 warm
      val frame = df
      spark.sparkContext.setJobDescription(label)
      val c0 = System.nanoTime(); noop(frame)
      val cold = (System.nanoTime() - c0) / 1e9
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(frame); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[prof] $label%-34s cold $cold%7.2f s  warm-median ${ts(1)}%7.2f s  (${ts.mkString(", ")})")
      spark.sparkContext.setJobDescription(null)
    }

    val spreadN = spark.sparkContext.defaultParallelism
    val src = docs.repartition(spreadN, col("id"))
    val toked = src.select(col("id"),
      filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0).as("__t"))

    // A. tokenize only
    time("A_tokenize")(toked)

    // B. gram starts, current form: concat_ws over sliced token tails
    def gramStartsText(t: DataFrame): DataFrame =
      t.select(col("id"),
        posexplode(when(size(col("__t")) >= k,
          transform(sequence(lit(1), size(col("__t")) - (k - 1)),
            i => concat_ws(" ", slice(col("__t"), i, lit(k)))))
          .otherwise(array().cast("array<string>"))).as(Seq("__p", "__g")))
        .select(col("id"), (col("__p") + 1).as("i"),
          xxhash64(col("__g")).as("gram"),
          xxhash64(lit(0x9E3779B97F4A7C15L), col("__g")).as("gram2"))
    time("B_gramStarts_text")(gramStartsText(toked))

    // C. candidate: hash-of-token-hashes (two independent token-hash
    // chains preserve the 128-bit destructive-op guarantee)
    def gramStartsHash(t: DataFrame): DataFrame = {
      val withH = t.select(col("id"),
        transform(col("__t"), w => xxhash64(w)).as("__h1"),
        transform(col("__t"), w => xxhash64(lit(0x9E3779B97F4A7C15L), w)).as("__h2"),
        size(col("__t")).as("__n"))
      withH.select(col("id"),
        posexplode(when(col("__n") >= k,
          transform(sequence(lit(1), col("__n") - (k - 1)),
            i => struct(
              xxhash64((0 until k).map(o => element_at(col("__h1"), i + o)): _*).as("g1"),
              xxhash64((0 until k).map(o => element_at(col("__h2"), i + o)): _*).as("g2"))))
          .otherwise(array().cast("array<struct<g1:bigint,g2:bigint>>"))).as(Seq("__p", "__g")))
        .select(col("id"), (col("__p") + 1).as("i"),
          col("__g.g1").as("gram"), col("__g.g2").as("gram2"))
    }
    time("C_gramStarts_tokenhash")(gramStartsHash(toked))

    // D. covered positions (window + filter + explode + distinct), on B
    import org.apache.spark.sql.expressions.Window
    val byGram = Window.partitionBy("gram", "gram2")
    def covered(gs: DataFrame): DataFrame = gs
      .repartition(spreadN, col("gram"), col("gram2"))
      .withColumn("total", count(lit(1)).over(byGram))
      .filter(col("total") >= 2)
      .select(col("id"), explode(sequence(col("i"), col("i") + (k - 1))).as("j"))
      .distinct()
    time("D_covered_on_text")(covered(gramStartsText(toked)))
    time("D_covered_on_tokenhash")(covered(gramStartsHash(toked)))

    // E. token rows (posexplode every token)
    def tokenRows(t: DataFrame): DataFrame = t
      .select(col("id"), posexplode(col("__t")).as(Seq("__p", "tok")))
      .select(col("id"), (col("__p") + 1).as("j"), col("tok"))
    time("E_tokenRows")(tokenRows(toked))

    // F. anti join + reassembly (the exciseCovered tail), on B's covered
    def excise(cov: DataFrame): DataFrame = {
      val kept = tokenRows(toked).join(cov, Seq("id", "j"), "left_anti")
        .groupBy("id")
        .agg(array_join(transform(array_sort(collect_list(struct(col("j"), col("tok")))),
            s => s.getField("tok")), " ").as("clean_text"),
          count(lit(1)).as("n_kept"))
      docs.select(col("id"),
          size(filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0))
            .cast("long").as("n_tokens"))
        .join(kept, Seq("id"), "left")
        .select(col("id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
          col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    }
    time("F_full_excise_text")(excise(covered(gramStartsText(toked))))
    time("F_full_excise_tokenhash")(excise(covered(gramStartsHash(toked))))

    // G. array-based excision candidate: aggregate covered positions
    // per doc, join doc-level, excise with array expressions (no
    // token-row shuffle, no collect_list/array_sort)
    def exciseArr(cov: DataFrame): DataFrame = {
      val covArr = cov.groupBy("id").agg(collect_list(col("j")).as("__cov"))
      toked.join(covArr, Seq("id"), "left")
        .select(col("id"),
          when(col("__cov").isNull, array_join(col("__t"), " "))
            .otherwise(array_join(
              transform(
                filter(sequence(lit(1), size(col("__t"))),
                  j => !array_contains(col("__cov"), j)),
                j => element_at(col("__t"), j)), " ")).as("clean_text"),
          size(col("__t")).cast("long").as("n_tokens"),
          coalesce(size(col("__cov")), lit(0)).cast("long").as("n_removed"))
    }
    time("G_excise_arrays_tokenhash")(exciseArr(covered(gramStartsHash(toked))))

    spark.stop()
  }
}
