package graft.api

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** Boots the PRODUCTION entrypoint (`graft.api.Main`) as a real
  * subprocess and exercises the paths only it owns — ServerSpec wires
  * the Server class directly, so boot-time recovery, the env-config
  * plumbing, the spool→uploader→ingest loop composition, and the
  * SIGTERM shutdown hook had no standing test:
  *
  *  1. crash debris planted BEFORE boot (an orphaned store-build temp)
  *     is reclaimed and logged by startup recovery;
  *  2. insert → spool rotation → ingest → query answers over real TCP
  *     exactly as the reference quickstart does (readme.md:33-49);
  *  3. SIGTERM triggers the drain hook (logged, bounded by
  *     GRAFT_DRAIN_S) and the process exits by signal, hooks run.
  */
class MainBootSpec extends AnyFunSuite {

  private val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def text(f: File): String =
    if (f.exists()) new String(Files.readAllBytes(f.toPath), "UTF-8") else ""

  test("Main boots, reclaims crash debris, serves insert->query, drains on SIGTERM") {
    val data = Files.createTempDirectory("graft-mainboot").toString
    // crash debris from a hypothetical previous life: boot must reclaim
    val orphan = new File(s"$data/tables/1/stores.d/.ghost.build-cafe")
    orphan.mkdirs()
    Files.writeString(new File(orphan, "junk.parquet").toPath, "junk")

    val log = new File(data, "main.log")
    val cmd = (Seq(
      new File(System.getProperty("java.home"), "bin/java").getAbsolutePath) ++
      opens ++ Seq("-Xmx2g",
        "-Dspark.scheduler.mode=FAIR", // Main sets FAIR pools per tenant
        "-cp", System.getProperty("java.class.path"), "graft.api.Main"))
    val pb = new ProcessBuilder(cmd: _*)
      .redirectOutput(log).redirectErrorStream(true)
    val env = pb.environment()
    env.put("PORT", "0") // ephemeral; the boot line reports the real one
    env.put("GRAFT_DATA", data)
    env.put("GRAFT_API_KEY", "bootkey")
    env.put("GRAFT_DRAIN_S", "5")
    env.put("SPARK_GRAFT_CPUS", "4")
    val p = pb.start()
    try {
      val deadline = System.currentTimeMillis() + 180000
      def port: Option[Int] =
        "listening on :(\\d+)".r.findFirstMatchIn(text(log)).map(_.group(1).toInt)
      while (port.isEmpty && System.currentTimeMillis() < deadline && p.isAlive)
        Thread.sleep(200)
      assert(port.isDefined, s"Main never booted; log tail:\n${text(log).takeRight(2000)}")
      assert(p.isAlive, s"Main exited at boot; log tail:\n${text(log).takeRight(2000)}")
      val base = s"http://localhost:${port.get}"
      // 1. recovery reclaimed the planted debris, and said so
      assert(text(log).contains("[recovery] reclaimed orphaned store-build dir"),
        s"boot recovery never reclaimed the planted orphan:\n${text(log).takeRight(1500)}")
      assert(!orphan.exists(), "the orphan dir must be gone from disk")

      // 2. the reference quickstart: insert JSON, query it back
      val client = HttpClient.newHttpClient()
      val ins = client.send(HttpRequest.newBuilder(
        URI.create(s"$base/api/data/insert/boot_t?api_key=bootkey"))
        .POST(HttpRequest.BodyPublishers.ofString("""[{"a": 1, "b": {"c": "x"}}]"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(ins.statusCode() == 200, s"${ins.statusCode()} ${ins.body()}")
      val q = java.net.URLEncoder.encode(
        "SELECT a, b_c FROM boot_t", "UTF-8")
      val end2 = System.currentTimeMillis() + 60000
      var got = ""
      while (got != """[{"a":1,"b_c":"x"}]""" && System.currentTimeMillis() < end2) {
        Thread.sleep(500)
        val r = client.send(HttpRequest.newBuilder(
          URI.create(s"$base/api/data/query?api_key=bootkey&query=$q")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        if (r.statusCode() == 200) got = r.body()
      }
      assert(got == """[{"a":1,"b_c":"x"}]""",
        s"insert->spool->ingest->query roundtrip never landed: '$got'")

      // 3. SIGTERM: the drain hook runs and the process dies by signal
      p.destroy() // SIGTERM, not destroyForcibly — hooks must run
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
        s"Main survived SIGTERM past the drain bound; log tail:\n${text(log).takeRight(1000)}")
      assert(text(log).contains("[shutdown] draining"),
        s"the shutdown hook never logged its drain line:\n${text(log).takeRight(1000)}")
      // JVM after SIGTERM with hooks run exits 128+15
      assert(p.exitValue() == 143, s"expected signal exit 143, got ${p.exitValue()}")
    } finally if (p.isAlive) p.destroyForcibly()
  }
}
