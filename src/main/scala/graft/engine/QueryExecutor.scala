package graft.engine

import graft.core.SqlUtil
import graft.store.TableCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Executes a tenant's raw SQL against its catalog namespace.
  *
  * The reference forwards query text verbatim to the destination engine
  * (/root/reference/pkg/api/data.go:29-56 -> duckdb/query.go); here the
  * "destination" is Catalyst: parse/analyze/optimize/execute all happen in
  * `session.sql`. Tenant isolation = one child SparkSession per database
  * id (`newSession()` shares the SparkContext but not temp views), with
  * that tenant's tables registered as views before each query — the
  * degenerate form of the reference's per-destination connection pool
  * (destinations.go:85-126).
  */
final class QueryExecutor(spark: SparkSession, catalog: TableCatalog) {
  private val sessions = TrieMap.empty[String, SparkSession]

  def sessionFor(db: String): SparkSession =
    sessions.getOrElseUpdate(db, spark.newSession())

  /** Raw passthrough, reference semantics: only TrimQuery sanitation
    * (util/sql.go:9-13) — statement type is NOT gated. */
  def execute(db: String, sql: String): DataFrame = {
    val s = sessionFor(db)
    catalog.registerViews(s, db)
    s.sql(SqlUtil.trimQuery(sql))
  }
}
