package graft.store

import com.fasterxml.jackson.databind.node.ObjectNode
import graft.core._
import org.apache.spark.sql.SparkSession
import java.io.File
import java.nio.file.Files
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Outcome of one insert body, reproducing the reference's
  * partial-success semantics (/root/reference/pkg/api/data.go:140-150):
  * all rows in -> ok; some -> "Partially inserted data"; none -> error. */
final case class InsertResult(inserted: Int, failed: Int) {
  def status: Int = if (failed == 0) 200 else 500
  def message: String =
    if (failed == 0) "ok"
    else if (inserted > 0) "Partially inserted data"
    else "Unable to insert data"
}

/** The ingest dataflow: validate -> array-unwrap -> flatten -> stamp
  * `__row_id` -> spool (reference api/data.go:74-156), plus the worker
  * half: closed NDJSON file -> infer -> evolve -> aligned append
  * (workers.go:64-116 collapsed onto Spark per SURVEY §3.1).
  */
final class IngestService(spark: SparkSession, catalog: TableCatalog,
                          snowflake: Snowflake = Snowflake.default) {

  /** API half: flatten and spool one HTTP body. Elements that fail to
    * flatten are counted, valid ones proceed (data.go:109-137). */
  def acceptBody(spool: Spool, db: String, table: String, body: String,
                 flattenMode: String): InsertResult = {
    withFlattened(table, body, flattenMode) { rows =>
      rows.foreach(r => spool.writeData(db, r.table, r.json))
    }
  }

  /** Test/embedded path: flatten straight into the catalog, no spool. */
  def insertDirect(db: String, table: String, body: String,
                   flattenMode: String = ""): InsertResult =
    withFlattened(table, body, flattenMode) { rows =>
      ingestLines(db, table, rows.map(_.json))
    }

  private def withFlattened(table: String, body: String, flattenMode: String)(
      sink: Seq[JsonRow] => Unit): InsertResult = {
    val flattener = Flattener.forMode(flattenMode)
    Json.parse(body) match {
      case None => InsertResult(0, 1)
      case Some(node) =>
        val elements =
          if (node.isArray) node.elements().asScala.toSeq else Seq(node)
        var ok = 0; var bad = 0
        val out = Seq.newBuilder[JsonRow]
        elements.foreach { el =>
          flattener.flatten(table, Json.write(el)) match {
            case Right(rows) =>
              ok += 1
              out ++= rows.map(r => r.copy(json = stampRowId(r.json)))
            case Left(_) => bad += 1
          }
        }
        val rows = out.result()
        if (rows.nonEmpty) sink(rows)
        InsertResult(ok, bad)
    }
  }

  /** Add `__row_id` unless the client supplied one (data.go:123-129,
    * FIXTURES A8). */
  def stampRowId(jsonLine: String): String = {
    val node = Json.parse(jsonLine).get.asInstanceOf[ObjectNode]
    if (!node.has("__row_id")) node.put("__row_id", snowflake.next())
    Json.write(node)
  }

  /** Largest batch the DRIVER-side path will materialize. Spool files cap
    * at ~2 MB (SpoolConfig), so this only trips on foreign bulk files —
    * which must go through the distributed path (spark.read.json over the
    * file + catalog.append) instead of driver-side line inference. */
  val MaxDriverBatchBytes: Long = 256L * 1024 * 1024

  /** Worker half for one closed spool file; deletes it on success
    * (at-least-once like the reference: failure leaves the file for
    * retry, workers.go:44-52). */
  def ingestFile(db: String, table: String, file: File): Long = {
    require(file.length() <= MaxDriverBatchBytes,
      s"batch file ${file.getName} is ${file.length()} bytes; driver-side inference is " +
        s"capped at $MaxDriverBatchBytes — bulk-load via spark.read.json + catalog.append")
    val lines = Using.resource(scala.io.Source.fromFile(file, "UTF-8")) { src =>
      src.getLines().toVector
    }
    // the spool file's snowflake name is the idempotency key: a retry of
    // the same file OVERWRITES its batch directory instead of doubling it
    val n = ingestLines(db, table, lines,
      batchId = Some(file.getName.stripSuffix(".ndjson")))
    Files.deleteIfExists(file.toPath)
    n
  }

  /** Distributed bulk load: the scale path the 256MB driver guard points
    * at. Inference runs as per-partition partial type counts merged in
    * partition order (identical precedence and first-appearance column
    * order to the line path — the driver never materializes the data),
    * then one distributed JSON parse feeds the aligned append. The
    * file/directory name is the idempotency key, so a retried bulk load
    * overwrites its batch. Two passes over the data total (inference is
    * full-scan by reference semantics), both distributed. */
  def ingestBulkFile(db: String, table: String, path: String): Unit = {
    val ok = ingestTextBatch(db, table, spark.read.textFile(path),
      batchId = Some("bulk-" + new File(path).getName))
    require(ok, s"bulk load: no data at $path")
  }

  /** Distributed infer -> evolve -> aligned append over a Dataset of raw
    * NDJSON lines — the shared engine behind [[ingestBulkFile]] and the
    * streaming ingest's per-micro-batch schema evolution
    * (graft.streaming.StreamingIngest). Inference runs as per-partition
    * partial type counts merged in partition order (same precedence and
    * first-appearance column order as the driver line path); the driver
    * never materializes rows. Returns false for an empty batch (nothing
    * appended). Uses the DATASET's session, not the service's — inside
    * `foreachBatch` the micro-batch runs on a cloned session. */
  def ingestTextBatch(db: String, table: String,
                      lines: org.apache.spark.sql.Dataset[String],
                      batchId: Option[String] = None): Boolean = {
    val sess = lines.sparkSession
    val partials = lines.rdd
      .mapPartitionsWithIndex { (i, it) => Iterator.single(i -> SchemaInference.inferCounts(it)) }
      .collect().sortBy(_._1).map(_._2)
    if (partials.isEmpty) return false
    val counts = partials.reduceLeft((a, b) => SchemaInference.mergeCounts(a, b))
    if (counts.isEmpty) return false
    val types = counts.map { case (k, c) => k -> SchemaInference.resolve(c) }
    val batchSchema = SchemaInference.toStruct(types)
    val merged = catalog.evolve(sess, db, table, batchSchema)
    val readSchema = org.apache.spark.sql.types.StructType(
      batchSchema.fields.map(f => f.copy(dataType = merged(f.name).dataType)))
    val df = sess.read.schema(readSchema).json(lines)
    catalog.append(sess, db, table, df, batchId)
    true
  }

  /** Infer (full-scan, reference precedence) -> evolve catalog schema ->
    * read with the batch schema -> aligned append. */
  def ingestLines(db: String, table: String, lines: Seq[String],
                  batchId: Option[String] = None): Long = {
    if (lines.isEmpty) return 0L
    val types = SchemaInference.inferTypes(lines.iterator)
    val batchSchema = SchemaInference.toStruct(types)
    val merged = catalog.evolve(spark, db, table, batchSchema)
    import spark.implicits._
    val ds = spark.createDataset(lines)
    // read each batch column directly at the table's (possibly wider)
    // type — Spark's JSON reader parses int tokens as double and any
    // token as string, so no second cast pass is needed.
    val readSchema = org.apache.spark.sql.types.StructType(
      batchSchema.fields.map(f => f.copy(dataType = merged(f.name).dataType)))
    val df = spark.read.schema(readSchema).json(ds)
    catalog.append(spark, db, table, df, batchId)
    lines.size.toLong
  }
}
