package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is one hash-partitioned shuffle on the dedup key;
  *  - near-dup methods never self-join the full corpus: they block first
  *    (MinHash LSH bands / SimHash pigeonhole bands / shared shingles),
  *    so the join key-space is (band-id, band-value) buckets and only
  *    bucket-mates meet. Skewed mega-buckets should be salted or capped
  *    (cap is a TODO documented on minHashCandidates).
  *  - all sketches are computed with native codegen'd expressions
  *    (MinHashSignature / SimHash64), one map pass, no UDF boxing.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeps the row with the lowest
    * tiebreak value per key. One shuffle (window over the key). */
  def exact(df: DataFrame, keys: Seq[String], tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tiebreak))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup via md5 of the text (hash-groupBy; avoids
    * shuffling full text when only the verdict is needed). */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exact(df.withColumn("__h", md5(col(textCol))), Seq("__h"), idCol).drop("__h")

  /** Lowercased word shingles of size `w`, hashed to 64 bits. */
  def shingleHashes(text: Column, w: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    val shingles = when(n >= w,
      transform(sequence(lit(0), n - w), i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(w))))))
      .otherwise(transform(sequence(lit(0), lit(0)), _ => xxhash64(concat_ws(" ", toks))))
    array_distinct(shingles)
  }

  /** MinHash LSH candidate pairs: signature of `numHashes`, cut into
    * `bands`; docs sharing any band bucket become a candidate pair,
    * scored by signature agreement (unbiased Jaccard estimate).
    *
    * Plan shape: map (sig) -> explode bands (xN) -> shuffle on
    * (band, bucket) -> within-bucket pairing -> distinct pairs.
    * At 100 TB add a bucket-size cap (count per bucket, drop/salt
    * pathological buckets) before pairing.
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, bands: Int = 8,
                        shingleWidth: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
        TextFunctions.minhash_signature(shingleHashes(col(textCol), shingleWidth), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    // band value = hash of its signature slice
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
          .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes).as("est_jaccard"))
      .distinct()
  }

  /** MinHash dedup: candidates above `threshold` collapse; every doc that
    * has a smaller-id near-duplicate is dropped (single pass, no
    * union-find — transitive chains keep their minimum representative
    * with one extra iteration at most; good enough for corpus dedup). */
  def minHashDedup(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val dupIds = minHashCandidates(df, idCol, textCol, numHashes, bands)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Blocking is pigeonhole-exact: the 64-bit simhash is cut into
    * (maxHamming+1) bands — any pair within distance k must agree on at
    * least one band, so the band-equality join loses no true pair. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val sh = df.select(col(idCol).as("id"),
      TextFunctions.simhash64(transform(TextAnalysis.tokens(col(textCol)), xxhash64(_))).as("sh"))
      .filter(col("sh").isNotNull)
    val mask = (1L << width) - 1
    val banded = sh.select(col("id"), col("sh"),
      posexplode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> shiftright(sh, b * $width) & $mask)"))
        .as(Seq("band", "bits")))
    val l = banded.select(col("band"), col("bits"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bits"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for candidate pairs that share at
    * least one shingle-hash (inverted-index blocking: explode shingles,
    * join on shingle, count shared; |A∪B| = |A|+|B|-shared). Full
    * exactness without a cross join. `minShared` prunes the long tail of
    * single-shingle collisions before the expensive distinct. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleWidth: Int = 3, threshold: Double = 0.5,
                        minShared: Int = 2): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingleHashes(col(textCol), shingleWidth).as("shingles"))
      .withColumn("n_sh", size(col("shingles")).cast("long"))
    val inv = sh.select(col("id"), col("n_sh"), explode(col("shingles")).as("shingle"))
    val l = inv.select(col("shingle"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val r = inv.select(col("shingle"), col("id").as("id_b"), col("n_sh").as("n_b"))
    l.join(r, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
