package graft.core

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Four-type JSON schema inference with the reference's exact widening
  * precedence (/root/reference/pkg/util/types.go:12-89):
  *
  *  - gjson.String -> string; Number -> int when the raw token parses as a
  *    64-bit integer (strconv.Atoi) else float; True/False -> bool;
  *    Null counted but never wins; nested object/array -> "undefined".
  *  - Resolution per key (types.go:65-84): string > undefined(->string) >
  *    float > int > bool > default string (null-only keys become string).
  *
  * Inference scans EVERY row of a batch (full-scan, not sampled), exactly
  * like the reference's GetJSONTypes.
  */
object SchemaInference {
  final val JString = "string"
  final val JInt = "int"
  final val JFloat = "float"
  final val JBool = "bool"

  /** Classify one JSON value the way gjson + Atoi does (types.go:35-53). */
  def typeOf(v: JsonNode): String =
    if (v.isTextual) "string"
    else if (v.isNull) "null"
    else if (v.isBoolean) "bool"
    else if (v.isNumber) {
      // strconv.Atoi on the raw token: "1" -> int; "1.0", "1e3", and
      // integers beyond 64 bits all fail -> float (types.go:44-50).
      val raw = v.asText()
      try { java.lang.Long.parseLong(raw); "int" }
      catch { case _: NumberFormatException => "float" }
    } else "undefined"

  /** Resolve a key's observed type counts to its final JSON type
    * (types.go:65-84). */
  def resolve(counts: collection.Map[String, Int]): String =
    if (counts.getOrElse("string", 0) > 0) JString
    else if (counts.getOrElse("undefined", 0) > 0) JString
    else if (counts.getOrElse("float", 0) > 0) JFloat
    else if (counts.getOrElse("int", 0) > 0) JInt
    else if (counts.getOrElse("bool", 0) > 0) JBool
    else JString // null-only

  /** Per-key type counts over NDJSON lines — the mergeable intermediate
    * (partial inference of one partition in the distributed path).
    * Invalid lines are skipped (gjson.Parse tolerates garbage; we drop
    * it). Key order of first appearance is preserved. */
  def inferCounts(lines: Iterator[String]): mutable.LinkedHashMap[String, mutable.Map[String, Int]] = {
    val counts = mutable.LinkedHashMap.empty[String, mutable.Map[String, Int]]
    lines.foreach { line =>
      Json.parse(line).filter(_.isObject).foreach { node =>
        node.fields().asScala.foreach { e =>
          val c = counts.getOrElseUpdate(e.getKey, mutable.Map.empty[String, Int].withDefaultValue(0))
          c(typeOf(e.getValue)) += 1
        }
      }
    }
    counts
  }

  /** Merge partial counts (left partition order wins for key order). */
  def mergeCounts(a: mutable.LinkedHashMap[String, mutable.Map[String, Int]],
                  b: collection.Map[String, collection.Map[String, Int]])
      : mutable.LinkedHashMap[String, mutable.Map[String, Int]] = {
    b.foreach { case (k, c) =>
      val tgt = a.getOrElseUpdate(k, mutable.Map.empty[String, Int].withDefaultValue(0))
      c.foreach { case (t, n) => tgt(t) += n }
    }
    a
  }

  /** Full-scan type inference over NDJSON lines. */
  def inferTypes(lines: Iterator[String]): mutable.LinkedHashMap[String, String] =
    inferCounts(lines).map { case (k, c) => k -> resolve(c) }

  /** JSON type -> Spark storage type (SURVEY §1.2 physical mapping). */
  def toSpark(jsonType: String): DataType = jsonType match {
    case JInt   => LongType
    case JFloat => DoubleType
    case JBool  => BooleanType
    case _      => StringType
  }

  def toStruct(types: collection.Map[String, String]): StructType =
    StructType(types.map { case (k, t) => StructField(k, toSpark(t), nullable = true) }.toSeq)
}

/** Additive, widening schema evolution (SURVEY §1.2 / FIXTURES A6).
  *
  * The reference only ever ADDs columns (`ALTER TABLE ADD COLUMN IF NOT
  * EXISTS`, duckdb/insert.go:12-26) and never retypes; a type conflict on
  * an existing column is destination-defined. Our pinned semantics: widen
  * along bool < long < double < string; any non-chain conflict degrades to
  * string. Merge is commutative, associative and idempotent (property-
  * tested).
  */
object SchemaMerge {
  def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else (a, b) match {
      case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
      case _ => StringType // bool vs numeric, anything vs string
    }

  /** existing ∪ incoming: existing field order first, new fields appended
    * in incoming order. */
  def merge(existing: StructType, incoming: StructType): StructType = {
    val inMap = incoming.fields.map(f => f.name -> f).toMap
    val merged = existing.fields.map { f =>
      inMap.get(f.name) match {
        case Some(nf) => StructField(f.name, widen(f.dataType, nf.dataType), nullable = true)
        case None     => f.copy(nullable = true)
      }
    }
    val existingNames = existing.fieldNames.toSet
    val added = incoming.fields.filterNot(f => existingNames.contains(f.name)).map(_.copy(nullable = true))
    StructType(merged ++ added)
  }
}
