package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** External file scans — the rebuild of the reference's ability to query
  * raw files next to managed tables (DuckDB `json`/`httpfs`/`aws`
  * extensions are force-loaded for user queries,
  * /root/reference/pkg/destinations/duckdb/duckdb.go:74-79, and
  * `read_ndjson_auto` is the internal ingest reader, insert.go:61).
  *
  * Spark-side posture for 100 TB:
  *  - ALWAYS pass an explicit schema for production paths — schema
  *    inference is a full extra pass over the data; these helpers take
  *    one and only fall back to inference when none is given;
  *  - no `mergeSchema`: footer-merging across millions of parquet files
  *    is a driver-side stall;
  *  - the same calls accept `s3a://` URIs unchanged (hadoop-aws), which
  *    is the reference's httpfs/aws story.
  */
object ExternalSources {

  /** Newline-delimited JSON scan. */
  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** CSV scan (`header` = first line carries column names). */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** Parquet scan with a pinned schema (no footer merge). */
  def readParquet(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).parquet(path)
  }

  /** ORC scan with a pinned schema — the fourth columnar format a
    * migrating warehouse most often brings along (Hive-era lakes are
    * ORC). Same pushdown story as parquet in Spark: predicates and
    * column pruning reach the stripe reader, so the 100 TB posture is
    * identical. */
  def readOrc(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).orc(path)
  }

  /** XML scan — Spark 4 ships the XML source natively (the spark-xml
    * package was donated upstream in 4.0), so feed exports and legacy
    * enterprise dumps read without an extra dependency. `rowTag` names
    * the repeating record element. Row-based like JSON/CSV: column
    * pruning applies after parse, predicates do NOT push into the
    * parser — at 100 TB, convert to a columnar layout after one pass
    * rather than re-scanning XML per query. */
  def readXml(spark: SparkSession, path: String, rowTag: String,
              schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).format("xml").load(path)
  }
}
