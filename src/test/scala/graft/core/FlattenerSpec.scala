package graft.core

import org.scalatest.funsuite.AnyFunSuite

class FlattenerSpec extends AnyFunSuite {

  private def parseRow(r: JsonRow): Map[String, String] = {
    val n = Json.parse(r.json).get
    import scala.jdk.CollectionConverters._
    n.fields().asScala.map(e => e.getKey -> e.getValue.toString).toMap
  }

  test("horizontal: nested objects join with underscore, arrays get index segments (FIXTURES A4)") {
    val in = """{"user": {"name": "alice", "geo": {"lat": 1.5, "lon": 2.5}}, "tags": ["a", "b"]}"""
    val Right(rows) = HorizontalFlattener.flatten("t", in)
    assert(rows.size == 1)
    val m = parseRow(rows.head)
    assert(m == Map(
      "user_name" -> "\"alice\"", "user_geo_lat" -> "1.5", "user_geo_lon" -> "2.5",
      "tags_0" -> "\"a\"", "tags_1" -> "\"b\""))
  }

  test("horizontal: scalar doc fields pass through; invalid json rejected") {
    val Right(rows) = HorizontalFlattener.flatten("t", """{"msg": "hello world"}""")
    assert(parseRow(rows.head) == Map("msg" -> "\"hello world\""))
    assert(HorizontalFlattener.flatten("t", "not json").isLeft)
    assert(HorizontalFlattener.flatten("t", "[1,2]").isLeft) // non-object
  }

  test("vertical: sibling-array cross product with __order_ and shared ___document_id (FIXTURES A5)") {
    val in = """{"order": 7, "items": [{"sku": "x"}, {"sku": "y"}], "codes": [10, 20]}"""
    val Right(rows) = VerticalFlattener.flattenWithDocId("t", in, "DOCID")
    assert(rows.size == 4)
    val ms = rows.map(parseRow)
    // every row has all five data keys + doc id
    ms.foreach { m =>
      assert(m("order") == "7")
      assert(m("___document_id") == "\"DOCID\"")
      assert(m.keySet == Set("order", "items_sku", "codes", "__order_items", "__order_codes", "___document_id"))
    }
    val combos = ms.map(m => (m("items_sku"), m("codes"))).toSet
    assert(combos == Set(("\"x\"", "10"), ("\"x\"", "20"), ("\"y\"", "10"), ("\"y\"", "20")))
    // order columns track the exploded index per path
    assert(ms.map(m => (m("items_sku"), m("__order_items"))).toSet == Set(("\"x\"", "0"), ("\"y\"", "1")))
    assert(ms.map(m => (m("codes"), m("__order_codes"))).toSet == Set(("10", "0"), ("20", "1")))
  }

  test("vertical: empty array yields one row with null (flattener.go:82-86)") {
    val Right(rows) = VerticalFlattener.flattenWithDocId("t", """{"xs": [], "a": 1}""", "D")
    assert(rows.size == 1)
    val m = parseRow(rows.head)
    assert(m("xs") == "null")
    assert(m("a") == "1")
  }

  test("vertical: nested object inside array keeps full path") {
    val in = """{"a": [{"b": {"c": 1}}, {"b": {"c": 2}}]}"""
    val Right(rows) = VerticalFlattener.flattenWithDocId("t", in, "D")
    val ms = rows.map(parseRow)
    assert(ms.map(m => (m("a_b_c"), m("__order_a"))).toSet == Set(("1", "0"), ("2", "1")))
  }

  test("vertical: scalar array explodes to one row per element") {
    val Right(rows) = VerticalFlattener.flattenWithDocId("t", """{"v": [5, 6, 7]}""", "D")
    val ms = rows.map(parseRow)
    assert(ms.map(m => (m("v"), m("__order_v"))) == Seq(("5", "0"), ("6", "1"), ("7", "2")))
  }

  test("ulid: 26 chars, time-prefix sortable") {
    val a = Ulid.at(1000L); val b = Ulid.at(2000L)
    assert(a.length == 26 && b.length == 26)
    assert(a.substring(0, 10) < b.substring(0, 10))
  }
}
