package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Training-data-pipeline extension queries (dedup, similarity search,
  * text analysis, multimodal) — filled in as the operators land. */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: ListMap[String, (Q, Option[String])] = ListMap()

  def queries: Map[String, Q] = defs.map { case (k, (q, _)) => k -> q }
  def oracles: Map[String, String] = defs.collect { case (k, (_, Some(o))) => k -> o }
}
