package graft.core

/** SQL text helpers mirroring /root/reference/pkg/util/sql.go and
  * util/stringbuffer.go:36-58. */
object SqlUtil {
  /** Strip surrounding whitespace and ONE trailing `;`
    * (util/sql.go:9-13 — TrimSuffix removes a single suffix). */
  def trimQuery(q: String): String = {
    val t = q.trim
    if (t.endsWith(";")) t.dropRight(1) else t
  }

  /** Single-quote a SQL string literal, doubling embedded quotes
    * (stringbuffer.go:44-49). */
  def sqlString(s: String): String = "'" + s.replace("'", "''") + "'"

  private val Plain = "^[a-zA-Z][a-zA-Z0-9_]*$".r

  /** Quote an identifier unless it is a plain word (stringbuffer.go:51-58). */
  def sqlIdent(s: String): String =
    if (Plain.pattern.matcher(s).matches()) s
    else "\"" + s.replace("\"", "\"\"") + "\""
}
