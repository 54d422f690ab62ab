package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class SchemaInferenceSpec extends AnyFunSuite {
  // scalatestplus bridge isn't in the offline cache; sample Gens directly.
  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (1 to n).foreach(i => g.sample.foreach(f))
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 100).foreach(_ => for (a <- ga.sample; b <- gb.sample) f(a, b))

  test("inference precedence on the FIXTURES A3 batch") {
    val batch = Seq(
      """{"a": 1,     "b": 1,    "c": true,  "d": null, "e": "x", "f": 1}""",
      """{"a": 2.5,   "b": 2,    "c": false, "d": null, "e": 2,   "f": null}""",
      """{"a": null,  "b": null, "c": null,  "d": null, "e": 3.5, "f": 2}""")
    val t = SchemaInference.inferTypes(batch.iterator)
    assert(t("a") == "float") // float beats int
    assert(t("b") == "int")
    assert(t("c") == "bool")
    assert(t("d") == "string") // null-only defaults to string
    assert(t("e") == "string") // string beats all
    assert(t("f") == "int")    // null never wins
  }

  test("Atoi fidelity: 1.0 and 1e3 and >64-bit ints are float; numeric strings stay string") {
    val t = SchemaInference.inferTypes(Iterator(
      """{"a": 1.0, "b": 1e3, "c": 12345678901234567890, "d": "2", "e": 42}"""))
    assert(t == collection.mutable.LinkedHashMap(
      "a" -> "float", "b" -> "float", "c" -> "float", "d" -> "string", "e" -> "int"))
  }

  test("nested remnants (raw objects/arrays) are undefined -> string") {
    val t = SchemaInference.inferTypes(Iterator("""{"o": {}, "arr": [1]}"""))
    assert(t("o") == "string" && t("arr") == "string")
  }

  test("spark type mapping") {
    val s = SchemaInference.toStruct(collection.mutable.LinkedHashMap(
      "s" -> "string", "i" -> "int", "f" -> "float", "b" -> "bool"))
    assert(s == StructType(Seq(
      StructField("s", StringType), StructField("i", LongType),
      StructField("f", DoubleType), StructField("b", BooleanType))))
  }

  test("inference is order-insensitive (property)") {
    val lineGen = Gen.listOf(Gen.oneOf(
      """{"x": 1}""", """{"x": 1.5}""", """{"x": "s"}""", """{"x": null}""", """{"x": true}"""))
    forAll(lineGen) { lines =>
      val a = SchemaInference.inferTypes(lines.iterator)
      val b = SchemaInference.inferTypes(lines.reverse.iterator)
      assert(a == b)
    }
  }

  test("merge: additive columns, widening, never drops (FIXTURES A6)") {
    val t1 = StructType(Seq(StructField("__row_id", LongType), StructField("a", LongType)))
    val t2 = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val m = SchemaMerge.merge(t1, t2)
    assert(m.fieldNames.toSeq == Seq("__row_id", "a", "b"))
    val t3 = StructType(Seq(StructField("a", DoubleType)))
    val m2 = SchemaMerge.merge(m, t3)
    assert(m2("a").dataType == DoubleType) // long widened to double
    assert(SchemaMerge.widen(BooleanType, LongType) == StringType)
    assert(SchemaMerge.widen(DoubleType, StringType) == StringType)
  }

  test("merge is commutative on types and idempotent (property)") {
    val dtGen = Gen.oneOf[DataType](BooleanType, LongType, DoubleType, StringType)
    val schemaGen = Gen.mapOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"), dtGen))
      .map(m => StructType(m.map { case (k, v) => StructField(k, v) }.toSeq))
    forAll2(schemaGen, schemaGen) { (x, y) =>
      val xy = SchemaMerge.merge(x, y); val yx = SchemaMerge.merge(y, x)
      assert(xy.fields.map(f => f.name -> f.dataType).toMap ==
             yx.fields.map(f => f.name -> f.dataType).toMap)
      assert(SchemaMerge.merge(xy, xy) == xy)
    }
  }

  test("snowflake: monotone, unique, layout round-trips time") {
    val g = new Snowflake(5)
    val ids = (1 to 2000).map(_ => g.next())
    assert(ids.distinct.size == ids.size)
    assert(ids == ids.sorted)
    val t0 = System.currentTimeMillis()
    assert(math.abs(Snowflake.millisOf(g.next()) - t0) < 1000)
  }

  test("trimQuery strips whitespace and one trailing semicolon (util/sql.go:9-13)") {
    assert(SqlUtil.trimQuery("  select 1 ;  ".stripMargin) == "select 1 ")
    assert(SqlUtil.trimQuery("select 1;;") == "select 1;")
    assert(SqlUtil.trimQuery("\nselect 1\n") == "select 1")
  }

  test("sql quoting helpers (stringbuffer.go:36-58)") {
    assert(SqlUtil.sqlString("o'brien") == "'o''brien'")
    assert(SqlUtil.sqlIdent("plain_name") == "plain_name")
    assert(SqlUtil.sqlIdent("0bad") == "\"0bad\"")
    assert(SqlUtil.sqlIdent("with\"quote") == "\"with\"\"quote\"")
  }
}
