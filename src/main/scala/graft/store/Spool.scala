package graft.store

import graft.core.Snowflake
import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}

/** Rotation thresholds (reference `data_sink.settings`:
  * /root/reference/pkg/datasink/filesystem/filesystem.go:30-33). A file
  * rotates when ANY limit is hit (filesystem.go:191-205). */
final case class SpoolConfig(
    maxSizeBytes: Long = 2L * 1024 * 1024,
    maxRows: Long = 10000,
    maxAgeSeconds: Long = 5,
    rotatePeriodMillis: Long = 1000)

/** Per-(db, table) NDJSON spool with size/rows/age rotation — the
  * rebuild of the reference's filesystem datasink
  * (filesystem.go:313-357 write, 191-247 rotate, 253-282 create).
  *
  * Rows append to `<root>/open/<db>/<table>/<snowflake>.ndjson`; full or
  * aged files move to `<root>/closed/<db>/<table>/` where the ingest loop
  * (the worker-pool analogue) picks them up via `onClosed`.
  */
final class Spool(rootDir: String, config: SpoolConfig = SpoolConfig(),
                  onClosed: File => Unit = _ => ()) {

  private final class OpenFile(val db: String, val table: String) {
    val createdAt: Long = System.currentTimeMillis()
    val file: File = {
      val dir = new File(new File(new File(rootDir, "open"), db), table)
      dir.mkdirs()
      new File(dir, s"${Snowflake.default.next()}.ndjson")
    }
    val out = new BufferedOutputStream(new FileOutputStream(file, true))
    var rows: Long = 0
    var bytes: Long = 0

    def write(line: String): Unit = {
      val b = (line + "\n").getBytes(StandardCharsets.UTF_8)
      out.write(b); rows += 1; bytes += b.length
    }
    def needsRotation(now: Long): Boolean =
      bytes >= config.maxSizeBytes || rows >= config.maxRows ||
        (now - createdAt) / 1000 >= config.maxAgeSeconds
    def close(): Unit = out.close()
  }

  private val open = new ConcurrentHashMap[(String, String), OpenFile]()
  private val ticker: ScheduledExecutorService = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "spool-rotate"); t.setDaemon(true); t
  }
  ticker.scheduleAtFixedRate(() => rotateDue(), config.rotatePeriodMillis,
    config.rotatePeriodMillis, TimeUnit.MILLISECONDS)

  /** Append one flattened JSON row (filesystem.go:313-357). Locking is
    * striped per (db, table): `ConcurrentHashMap.compute` serializes
    * writers of the SAME table (bin lock) while different tables/tenants
    * ingest fully in parallel — the reference's per-key mutex map
    * (filesystem.go:63-71). */
  def writeData(db: String, table: String, jsonLine: String): Unit = {
    val key = (db, table)
    var rotated: OpenFile = null
    open.compute(key, (_, cur) => {
      val f = if (cur == null) new OpenFile(db, table) else cur
      f.write(jsonLine)
      if (f.needsRotation(System.currentTimeMillis())) { rotated = f; null } else f
    })
    if (rotated != null) rotate(rotated)
  }

  private def rotateDue(): Unit = {
    val now = System.currentTimeMillis()
    import scala.jdk.CollectionConverters._
    open.keySet().asScala.toSeq.foreach { key =>
      var due: OpenFile = null
      open.computeIfPresent(key, (_, f) =>
        if (f.needsRotation(now)) { due = f; null } else f)
      if (due != null) rotate(due)
    }
  }

  private def rotate(f: OpenFile): Unit = {
    f.close()
    val dir = new File(new File(new File(rootDir, "closed"), f.db), f.table)
    dir.mkdirs()
    val dest = new File(dir, f.file.getName)
    Files.move(f.file.toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
    onClosed(dest)
  }

  /** Force-rotate everything now (shutdown / test flush). */
  def flush(): Unit = {
    import scala.jdk.CollectionConverters._
    open.keySet().asScala.toSeq.foreach { key =>
      var f: OpenFile = null
      open.computeIfPresent(key, (_, cur) => { f = cur; null })
      if (f != null) rotate(f)
    }
  }

  /** Crash recovery, run at startup BEFORE accepting writes: any file
    * still under `open/` belongs to a previous process — close it out by
    * moving it to `closed/` (and firing `onClosed`) so no spooled rows
    * are silently lost. Returns how many orphans were recovered. */
  def recoverOrphans(): Int = {
    val openRoot = new File(rootDir, "open")
    if (!openRoot.exists()) return 0
    var n = 0
    for {
      dbDir <- Option(openRoot.listFiles()).getOrElse(Array.empty[File]) if dbDir.isDirectory
      tDir <- Option(dbDir.listFiles()).getOrElse(Array.empty[File]) if tDir.isDirectory
      f <- Option(tDir.listFiles()).getOrElse(Array.empty[File]) if f.getName.endsWith(".ndjson")
    } {
      val dir = new File(new File(new File(rootDir, "closed"), dbDir.getName), tDir.getName)
      dir.mkdirs()
      val dest = new File(dir, f.getName)
      Files.move(f.toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
      onClosed(dest)
      n += 1
    }
    n
  }

  /** Parse `<root>/closed/<db>/<table>/x.ndjson` back to its (db, table). */
  def ownerOf(closedFile: File): (String, String) = {
    val table = closedFile.getParentFile.getName
    val db = closedFile.getParentFile.getParentFile.getName
    (db, table)
  }

  def shutdown(): Unit = { ticker.shutdownNow(); flush() }
}
