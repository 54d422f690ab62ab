package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Relational battery lives in [[Queries]]; pipeline extensions (dedup,
  * similarity, text analysis, multimodal) in [[ExtQueries]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q06_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * seeded operator-composition fuzz rows (q190–q207), the
    * operator-parameter fuzz rows (q208–q229), the merge-store fuzz
    * rows (q230–q235) and the streaming fuzz rows (q236–q240). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ ExtQueries.queries ++ FuzzQueries.queries ++
      OpFuzz.queries ++ StoreFuzz.queries ++ StreamFuzz.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ ExtQueries.oracles ++ FuzzQueries.oracles ++
      OpFuzz.oracles ++ StoreFuzz.oracles ++ StreamFuzz.oracles
}
