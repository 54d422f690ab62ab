package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.{BufferedWriter, OutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets

/** Streaming result encoders.
  *
  * Both stream through `toLocalIterator` — one partition in driver memory
  * at a time — preserving the reference's never-materialize property
  * (duckdb/query.go:63-110 named-pipe pump; clickhouse/query.go:26-52
  * line relay).
  */
object ResultEncoders {

  /** Single JSON array of row objects, the reference's default format
    * (`COPY (q) TO ... (FORMAT JSON, ARRAY TRUE)`, duckdb/query.go:56).
    * Null columns serialize as `"col":null` — every row carries every
    * schema key, like the reference's DuckDB JSON export (Spark's
    * `toJSON` would drop null fields per row). */
  def writeJson(df: DataFrame, out: OutputStream): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(out, StandardCharsets.UTF_8), 1 << 16)
    val it =
      if (df.schema.isEmpty) df.toJSON.toLocalIterator()
      else df.select(
        to_json(struct(df.schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*),
          java.util.Map.of("ignoreNullFields", "false")).as("j"))
        .as(org.apache.spark.sql.Encoders.STRING).toLocalIterator()
    w.write("[")
    var first = true
    while (it.hasNext) {
      if (!first) w.write(",")
      w.write(it.next())
      first = false
    }
    w.write("]")
    w.flush()
  }

  /** CSV with a header row; NULLs written as the literal `null` to match
    * the reference's csv writers (redshift/query.go:84-142,
    * bigquery/query.go:57-125). */
  def writeCsv(df: DataFrame, out: OutputStream): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(out, StandardCharsets.UTF_8), 1 << 16)
    val names = df.schema.fieldNames
    w.write(names.map(csvQuote).mkString(","))
    w.write("\n")
    // cast every column to string engine-side so the driver loop only
    // shuttles text (timestamps/decimals format via Spark CAST, not JVM
    // toString)
    val strDf = df.select(names.map(n => col(s"`$n`").cast("string")).toIndexedSeq: _*)
    val it = strDf.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      val sb = new StringBuilder
      var i = 0
      while (i < names.length) {
        if (i > 0) sb.append(',')
        if (row.isNullAt(i)) sb.append("null") else sb.append(csvQuote(row.getString(i)))
        i += 1
      }
      sb.append('\n')
      w.write(sb.result())
    }
    w.flush()
  }

  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
