package graft.api

import graft.engine.{QueryExecutor, ResultEncoders}
import graft.store.{IngestService, Spool, SpoolConfig, TableCatalog}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.io.ByteArrayOutputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

class ServerSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private var server: Server = _
  private var port: Int = 0
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    val base = Files.createTempDirectory("graft-api").toString
    val catalog = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, catalog)
    val spool = new Spool(s"$base/spool", SpoolConfig(maxRows = 1, rotatePeriodMillis = 100),
      f => ingest.ingestFile(f.getParentFile.getParentFile.getName, f.getParentFile.getName, f))
    val executor = new QueryExecutor(spark, catalog)
    server = new Server(ServerConfig(0, Map("key1" -> "1", "key2" -> "2"), Some("admin")),
      catalog, ingest, spool, executor)
    port = server.start()
  }

  override def afterAll(): Unit = { server.stop(); spark.stop() }

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def eventually[A](f: => A): A = {
    var last: Throwable = null
    for (_ <- 1 to 50) {
      try return f
      catch { case e: Throwable => last = e; Thread.sleep(100) }
    }
    throw last
  }

  test("readme quickstart: insert then query returns the row (readme.md:33-49)") {
    val ins = post("/api/data/insert/events?api_key=key1", """{"user": "alice", "event": "click"}""")
    assert(ins.statusCode() == 200)
    eventually {
      val q = get("/api/data/query?api_key=key1&query=" +
        java.net.URLEncoder.encode("select user, event from events;", "UTF-8"))
      assert(q.statusCode() == 200)
      assert(q.body() == """[{"user":"alice","event":"click"}]""")
      assert(q.headers().firstValue("Content-Type").get.startsWith("application/json"))
    }
  }

  test("csv format, POST query body, blank query 400") {
    post("/api/data/insert/ev2?api_key=key1", """{"a": 1, "b": "x,y"}""")
    eventually {
      val q = get("/api/data/query?api_key=key1&format=csv&query=" +
        java.net.URLEncoder.encode("select a, b from ev2", "UTF-8"))
      assert(q.body() == "a,b\n1,\"x,y\"\n")
      assert(q.headers().firstValue("Content-Type").get.startsWith("text/csv"))
    }
    val viaPost = post("/api/data/query?api_key=key1", "select count(*) as n from ev2")
    assert(viaPost.body() == """[{"n":1}]""")
    assert(post("/api/data/query?api_key=key1", "  ").statusCode() == 400)
  }

  test("auth: bad key 401, tenant isolation, admin destination_id") {
    assert(get("/api/tables?api_key=nope").statusCode() == 401)
    post("/api/data/insert/mine?api_key=key2", """{"v": 7}""")
    eventually {
      assert(get("/api/tables?api_key=key2").body() == """["mine"]""")
    }
    // tenant 1 does not see tenant 2's table
    val t1 = get("/api/data/query?api_key=key1&query=" +
      java.net.URLEncoder.encode("select * from mine", "UTF-8"))
    assert(t1.statusCode() == 500)
    // admin key reaches tenant 2 via destination_id
    assert(get("/api/tables?api_key=admin&destination_id=2").body() == """["mine"]""")
  }

  test("tables + columns introspection (A14)") {
    eventually {
      val cols = get("/api/tables/events/columns?api_key=key1").body()
      assert(cols.contains(""""name":"user","type":"STRING""""))
      assert(cols.contains(""""name":"__row_id","type":"BIGINT""""))
    }
  }

  test("share links: create, replay without auth, expiry (A15)") {
    val created = post("/api/data/query/share?api_key=key1",
      """{"query": "select count(*) as n from events", "duration": 60}""")
    assert(created.statusCode() == 200)
    val id = created.body().split("\"")(3)
    val pub = get(s"/share/$id/data.json")
    assert(pub.body() == """[{"n":1}]""")
    val csv = get(s"/share/$id/data.csv")
    assert(csv.body() == "n\n1\n")
    assert(get("/share/00000000-0000-0000-0000-000000000000/data.json").statusCode() == 404)
    val expired = post("/api/data/query/share?api_key=key1",
      """{"query": "select 1", "duration": 0}""")
    val eid = expired.body().split("\"")(3)
    Thread.sleep(10)
    assert(get(s"/share/$eid/data.json").statusCode() == 404)
  }

  test("partial insert semantics over HTTP (FIXTURES A7)") {
    val r = post("/api/data/insert/px?api_key=key1", """[{"ok":1}, 5, {"ok":2}]""")
    assert(r.statusCode() == 500 && r.body() == "Partially inserted data")
  }

  test("json encoder: null handling and streaming shape") {
    import spark.implicits._
    val df = Seq((1, Option("a")), (2, None)).toDF("i", "s")
    val bos = new ByteArrayOutputStream()
    ResultEncoders.writeJson(df, bos)
    assert(bos.toString("UTF-8") == """[{"i":1,"s":"a"},{"i":2}]""")
    val csv = new ByteArrayOutputStream()
    ResultEncoders.writeCsv(df, csv)
    assert(csv.toString("UTF-8") == "i,s\n1,a\n2,null\n")
  }

  test("healthcheck") { assert(get("/healthcheck").body() == "ok") }
}
