package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import scala.util.Try

/** Thin Jackson helpers shared by the ingest dataflow.
  *
  * The reference parses ingest bodies with gjson and re-serializes with
  * sjson (/root/reference/pkg/api/data.go:86-137); here a single Jackson
  * ObjectMapper (already on Spark's classpath) plays both roles.
  */
object Json {
  val mapper: ObjectMapper = new ObjectMapper()
  val nodes: JsonNodeFactory = JsonNodeFactory.instance

  /** Parse, or None when the body is not valid JSON (gjson.ValidBytes
    * equivalent, data.go:95-99). */
  def parse(s: String): Option[JsonNode] = Try(mapper.readTree(s)).toOption.filter(_ != null)

  def write(n: JsonNode): String = mapper.writeValueAsString(n)

  def obj(): ObjectNode = nodes.objectNode()
  def arr(): ArrayNode = nodes.arrayNode()

  /** JSON-escape a string minus the surrounding quotes
    * (reference util/sql.go:17-24 JsonEscape). */
  def escape(s: String): String = {
    val q = mapper.writeValueAsString(s)
    q.substring(1, q.length - 1)
  }
}
