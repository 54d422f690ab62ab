package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler for the scale-slope receipts: tiles the
  * sf0.1 testdata `mult`× into an output dir so the heavy operator
  * families can be measured at two scales and their wall/cpu ratios
  * compared against the linear ideal (PLANS.md receipts; the driver's
  * testdata is capped at sf0.1, so the 10× corpus is synthesized
  * locally, never committed).
  *
  * Replication is id-disjoint and — for text — SHINGLE-disjoint:
  * every word in replica i > 0 is suffixed `_r<i>`, so each replica
  * reproduces the original's internal duplicate/near-duplicate
  * structure without creating cross-replica near-dups (a plain tile
  * would give every doc `mult` near-copies — a 10× corpus with a 10×
  * duplicate RATE, which is not how corpora grow; dup rate should stay
  * scale-invariant). Document length, token-frequency shape, and
  * per-doc structure are preserved exactly. Events replicate by
  * offsetting the id spaces (user_id, event_id) — per-user journey
  * shapes are preserved, the user population grows `mult`×.
  *
  *   SPARK_GRAFT_SCALE_MULT=10 \
  *   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1"
  *
  * Small dimension tables copy through unchanged (none are in the
  * heavy subset; region.parquet must exist for Bench's warm-up).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame)(variant: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(i => variant(df, i)).reduce(_ unionByName _)

    // documents: disjoint ids, shingle-disjoint text per replica
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    replicate(docs) { (d, i) =>
      if (i == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(i * maxDoc))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_r$i"))
    }.repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // events: disjoint user/event id spaces, journeys preserved
    val events = spark.read.parquet(s"$srcDir/events.parquet")
    val maxUser = events.agg(max(col("user_id"))).head().getLong(0) + 1
    val maxEvent = events.agg(max(col("event_id"))).head().getLong(0) + 1
    replicate(events) { (d, i) =>
      if (i == 0) d
      else d.withColumn("user_id", col("user_id") + lit(i * maxUser))
        .withColumn("event_id", col("event_id") + lit(i * maxEvent))
    }.repartition(32).write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // embeddings: disjoint vec_ids; replica i's vectors are the
    // original ROTATED by i positions (same norm, deterministic, and a
    // rotated vector points somewhere genuinely different, so replicas
    // spread across ANN cells/buckets instead of stacking mult× copies
    // into the original's cell — uniform corpus growth, which is the
    // shape the IVF/LSH scale claims are about)
    val embSrc = s"$srcDir/embeddings.parquet"
    if (new java.io.File(embSrc).exists()) {
      val emb = spark.read.parquet(embSrc)
      val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      replicate(emb) { (d, i) =>
        if (i == 0) d
        else d.withColumn("vec_id", col("vec_id") + lit(i * maxVec))
          .withColumn("embedding", expr(
            s"concat(slice(embedding, (int($i) % size(embedding)) + 1, " +
              s"size(embedding) - (int($i) % size(embedding))), " +
              s"slice(embedding, 1, int($i) % size(embedding)))"))
          // rotation alone is the identity whenever i % dim == 0, so
          // replicas past the dimension would stack exact copies into
          // the original's cell — compose a sign flip and a reverse
          // keyed on i / dim (norm-preserving, deterministic), giving
          // 4×dim distinct transforms before any replica repeats
          .withColumn("embedding", expr(
            s"if((int($i) div size(embedding)) % 2 = 1, " +
              s"transform(embedding, x -> -x), embedding)"))
          .withColumn("embedding", expr(
            s"if((int($i) div (2 * size(embedding))) % 2 = 1, " +
              s"reverse(embedding), embedding)"))
      }.repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }

    // everything else copies through (small dims + tables outside the
    // heavy subset)
    val rest = new java.io.File(srcDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName)
      .filterNot(n => n == "documents.parquet" || n == "events.parquet" ||
        n == "embeddings.parquet")
    rest.foreach { n =>
      spark.read.parquet(s"$srcDir/$n").write.mode("overwrite").parquet(s"$outDir/$n")
    }
    println(s"""{"scaled":"$outDir","mult":$mult,"docs":${maxDoc - 1},"users":${maxUser - 1}}""")
    spark.stop()
  }
}
