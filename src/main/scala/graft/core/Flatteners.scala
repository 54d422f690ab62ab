package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** One flattened output row destined for `table`, as a JSON text line. */
final case class JsonRow(table: String, json: String)

/** Flatteners turn one arbitrary JSON document into 1..N flat rows whose
  * keys are underscore-joined paths.
  *
  * Behavior mirrors the reference (/root/reference/pkg/api/flattener.go):
  *  - Horizontal (default): one row per document; nested objects join path
  *    segments with `_`, array elements get their index as a segment
  *    (flattener.go:141-154 via jeremywohl/flatten UnderscoreStyle).
  *  - Vertical (`?flatten=vertical`): arrays explode into rows; sibling
  *    arrays cross-product (flattener.go:30-41); every row from one source
  *    document shares a ULID `___document_id` (flattener.go:118-127) and
  *    carries `__order_<path>` index columns per exploded array
  *    (flattener.go:73-77); an empty array yields a single row with a null
  *    (flattener.go:82-86).
  */
sealed trait Flattener {
  def flatten(table: String, json: String): Either[String, Seq[JsonRow]]
}

object HorizontalFlattener extends Flattener {
  def flatten(table: String, json: String): Either[String, Seq[JsonRow]] =
    Json.parse(json) match {
      case Some(node) if node.isObject =>
        val out = Json.obj()
        walk(node, "", out)
        Right(Seq(JsonRow(table, Json.write(out))))
      case _ => Left("not valid json input")
    }

  private def walk(node: JsonNode, prefix: String, out: ObjectNode): Unit = {
    def key(seg: String) = if (prefix.isEmpty) seg else s"${prefix}_$seg"
    if (node.isObject) {
      node.fields().asScala.foreach(e => walk(e.getValue, key(e.getKey), out))
    } else if (node.isArray) {
      var i = 0
      node.elements().asScala.foreach { el => walk(el, key(i.toString), out); i += 1 }
    } else {
      out.set[JsonNode](prefix, node)
      ()
    }
  }
}

object VerticalFlattener extends Flattener {
  type FlatRow = mutable.LinkedHashMap[String, JsonNode]

  def flatten(table: String, json: String): Either[String, Seq[JsonRow]] =
    flattenWithDocId(table, json, Ulid.next())

  /** Exposed for deterministic tests. */
  def flattenWithDocId(table: String, json: String, docId: String): Either[String, Seq[JsonRow]] =
    Json.parse(json) match {
      case Some(node) if node.isObject =>
        // reference stamps ___document_id into the document pre-flatten
        // (flattener.go:119-120), so it is just another scalar sibling key.
        node.asInstanceOf[ObjectNode].put("___document_id", docId)
        val rows = flattenObject(node, Nil)
        Right(rows.map(r => JsonRow(table, serialize(r))))
      case _ => Left("not valid json input")
    }

  private def serialize(row: FlatRow): String = {
    val o = Json.obj()
    row.foreach { case (k, v) => o.set[JsonNode](k, v) }
    Json.write(o)
  }

  private def pathStr(path: List[String]): String = path.mkString("_")

  private def flattenObject(node: JsonNode, path: List[String]): Seq[FlatRow] =
    if (node.isArray) {
      if (node.size() > 0) {
        node.elements().asScala.zipWithIndex.flatMap { case (item, i) =>
          val rows = flattenObject(item, path)
          rows.foreach(_.update("__order_" + pathStr(path), Json.nodes.numberNode(i)))
          rows
        }.toSeq
      } else {
        Seq(mutable.LinkedHashMap(pathStr(path) -> (Json.nodes.nullNode(): JsonNode)))
      }
    } else if (node.isObject) {
      val perKey = node.fields().asScala.map { e =>
        flattenObject(e.getValue, path :+ e.getKey)
      }.toList
      crossProduct(perKey)
    } else {
      Seq(mutable.LinkedHashMap(pathStr(path) -> node))
    }

  private def crossProduct(dicts: List[Seq[FlatRow]]): Seq[FlatRow] = dicts match {
    case Nil => Seq(mutable.LinkedHashMap.empty)
    case head :: tail =>
      val rest = crossProduct(tail)
      for (l <- head; r <- rest) yield {
        val m: FlatRow = mutable.LinkedHashMap.empty
        m ++= l; m ++= r
        m
      }
  }
}

object Flattener {
  /** Select by the `flatten` query param (reference api/data.go:77-84). */
  def forMode(mode: String): Flattener =
    if (mode != null && mode.equalsIgnoreCase("vertical")) VerticalFlattener
    else HorizontalFlattener
}
