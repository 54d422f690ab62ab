package graft.store

import graft.core.SchemaMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap

/** Per-destination ("database id") namespace of auto-created columnar
  * tables, the rebuild's analogue of ScratchDB's destination database.
  *
  * Reference behavior being reproduced:
  *  - tables auto-created on first insert with only `__row_id BIGINT`
  *    (/root/reference/pkg/destinations/duckdb/insert.go:72-76);
  *  - columns only ever ADDed, never dropped (`ALTER TABLE ADD COLUMN IF
  *    NOT EXISTS`, duckdb/insert.go:12-26); missing keys land as NULL
  *    (`INSERT ... BY NAME`, duckdb/insert.go:56-70).
  *
  * Storage is parquet under `<root>/<db>/<table>/data/`, schema pinned in
  * `<root>/<db>/<table>/_schema.json`. Data files are sorted within
  * partitions by `__row_id` before write so parquet min/max stats give
  * rough time-clustering — the Spark analogue of ClickHouse's
  * `MergeTree PRIMARY KEY (__row_id)` (clickhouse/destination.go:14-17).
  *
  * Scale posture: appends are O(batch); reads prune via explicit schema
  * (no mergeSchema scan of every footer at 100 TB). The rare widening of
  * an existing column (FIXTURES A6 pinned semantics) rewrites the table —
  * additive evolution, the common case, never rewrites.
  */
final class TableCatalog(rootDir: String) {
  private val schemas = TrieMap.empty[(String, String), StructType]
  private val versions = TrieMap.empty[String, Long]

  /** Per-table append/rewrite exclusion. Appends hold the READ side while
    * their parquet write commits; [[migrate]] (the only operation that
    * swaps the whole data/ directory out from under writers) holds the
    * WRITE side. [[compact]] deliberately does NOT block appends during
    * its rewrite: it rewrites only the exact file snapshot it listed and
    * deletes exactly those files, so a batch that lands mid-compaction is
    * untouched (see compact). */
  private val tableLocks = TrieMap.empty[(String, String), java.util.concurrent.locks.ReentrantReadWriteLock]
  private def lockFor(db: String, table: String) =
    tableLocks.getOrElseUpdate((db, table), new java.util.concurrent.locks.ReentrantReadWriteLock())
  /** One compaction at a time per table (two overlapping snapshots would
    * both rewrite the same rows); independent of the append locks, so a
    * compacting table keeps ingesting. */
  private val compactLocks = TrieMap.empty[(String, String), java.util.concurrent.locks.ReentrantLock]
  private def compactLockFor(db: String, table: String) =
    compactLocks.getOrElseUpdate((db, table), new java.util.concurrent.locks.ReentrantLock())
  private def withAppendLock[T](db: String, table: String)(body: => T): T = {
    val l = lockFor(db, table).readLock(); l.lock()
    try body finally l.unlock()
  }
  private def withRewriteLock[T](db: String, table: String)(body: => T): T = {
    val l = lockFor(db, table).writeLock(); l.lock()
    try body finally l.unlock()
  }

  /** Monotonic per-db counter, bumped whenever the db's visible state
    * changes (schema evolve, append, drop). Lets QueryExecutor cache
    * registered views and re-register only when something changed. */
  def version(db: String): Long = versions.getOrElse(db, 0L)
  private def bump(db: String): Unit = {
    versions.updateWith(db) { v => Some(v.getOrElse(0L) + 1) }
    graft.core.DataEpoch.bump() // invalidate derived-metadata caches
  }

  val RowId = "__row_id"
  private def tableDir(db: String, table: String) = new File(new File(rootDir, db), table)
  private def dataDir(db: String, table: String) = new File(tableDir(db, table), "data")
  private def schemaFile(db: String, table: String) = new File(tableDir(db, table), "_schema.json")

  def emptySchema: StructType = StructType(Seq(StructField(RowId, LongType, nullable = true)))

  def exists(db: String, table: String): Boolean = schemaFile(db, table).exists() || schemas.contains((db, table))

  def createEmptyTable(db: String, table: String): Unit =
    if (!exists(db, table)) setSchema(db, table, emptySchema)

  def schema(db: String, table: String): Option[StructType] =
    schemas.get((db, table)).orElse {
      val f = schemaFile(db, table)
      if (f.exists()) {
        val st = DataType.fromJson(Files.readString(f.toPath)).asInstanceOf[StructType]
        schemas.putIfAbsent((db, table), st)
        Some(st)
      } else None
    }

  private def setSchema(db: String, table: String, st: StructType): Unit = {
    val dir = tableDir(db, table)
    dir.mkdirs()
    dataDir(db, table).mkdirs()
    val tmp = new File(dir, "_schema.json.tmp")
    Files.writeString(tmp.toPath, st.json)
    Files.move(tmp.toPath, schemaFile(db, table).toPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    schemas.put((db, table), st)
    bump(db)
  }

  /** ALTER-equivalent: union-merge the incoming batch schema into the
    * table schema (additive + widening). Returns the merged schema.
    * If an EXISTING column widened (long->double etc.) the stored parquet
    * is migrated (read-cast-rewrite) — rare by construction. Serialized
    * PER TABLE (not on the catalog monitor): a long widening migrate of
    * one table never blocks another table's ingest. */
  private val evolveLocks = TrieMap.empty[(String, String), Object]
  def evolve(spark: SparkSession, db: String, table: String, incoming: StructType): StructType =
    evolveLocks.getOrElseUpdate((db, table), new Object).synchronized {
      createEmptyTable(db, table)
      val current = schema(db, table).get
      val merged = SchemaMerge.merge(current, incoming)
      if (merged != current) {
        val widened = current.fields.exists(f => merged(f.name).dataType != f.dataType)
        if (widened && hasData(db, table)) migrate(spark, db, table, current, merged)
        setSchema(db, table, merged)
      }
      merged
    }

  /** All COMMITTED parquet fragments, including per-batch subdirectories.
    * Files under hidden path segments (`_temporary` staging of an
    * in-flight append, `.`-prefixed) are excluded, same as Spark's own
    * scan listing — compaction must never snapshot an uncommitted file. */
  private def parquetFiles(db: String, table: String): Seq[File] = {
    val d = dataDir(db, table)
    if (!d.exists()) return Seq.empty
    // manual walk, NOT Files.walk: hidden dirs are pruned BEFORE descent
    // (Files.walk traverses into `_temporary` even when the filter drops
    // its entries, and throws NoSuchFileException when the in-flight
    // append commits and the staging dir vanishes mid-walk), and a
    // directory vanishing between list and descend reads as empty — the
    // compactor racing live appends must never crash on staging churn.
    val out = Seq.newBuilder[File]
    def walk(dir: File): Unit =
      Option(dir.listFiles()).getOrElse(Array.empty[File]).foreach { f =>
        val n = f.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (f.isDirectory) walk(f)
          else if (n.endsWith(".parquet")) out += f
        }
      }
    walk(d)
    out.result()
  }

  private def hasData(db: String, table: String): Boolean = parquetFiles(db, table).nonEmpty

  /** Crash-safe rewrite: build `data_migrating`, move live `data` aside
    * to `data_old`, promote, then delete the old copy — a crash at any
    * point leaves either the old or the new data at a recoverable path
    * (never "schema promises data that is gone"); [[recoverMigration]]
    * finishes or rolls back on next open. */
  private def migrate(spark: SparkSession, db: String, table: String,
                      oldSchema: StructType, newSchema: StructType): Unit =
    withRewriteLock(db, table) {
      val dir = dataDir(db, table)
      val tmp = new File(tableDir(db, table), "data_migrating")
      val old = new File(tableDir(db, table), "data_old")
      if (tmp.exists()) deleteRecursive(tmp.toPath)
      val df = spark.read.schema(oldSchema).option("recursiveFileLookup", "true")
        .parquet(dir.getAbsolutePath)
      align(df, newSchema).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      Files.move(dir.toPath, old.toPath, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp.toPath, dir.toPath, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursive(old.toPath)
      refreshFragmentBaseline(db, table) // the migrate rewrote every fragment
    }

  /** Compact a table's parquet fragments: every ingest batch appends one
    * small file (spool rotation is ~2 MB), so a hot table accumulates
    * thousands of fragments — the classic small-file problem that kills
    * scan throughput (per-file open cost, tiny row groups, no effective
    * min/max pruning). Rewrites into ceil(bytes/targetFileBytes) files
    * RANGE-partitioned by `__row_id` (global time-clustering: each output
    * file owns a row-id range, so min/max pruning works across files, not
    * just within them). Returns (filesBefore, filesAfter).
    *
    * Concurrency contract (Main's sweeper auto-compacts exactly the
    * tables that are actively ingesting): compaction rewrites ONLY the
    * file snapshot it listed and then deletes exactly those files — it
    * never moves the whole data/ directory, so a batch appended mid-
    * compaction is never swept away and appends are not blocked during
    * the (long) rewrite. The rewrite runs with NO catalog lock held —
    * only a per-table compact mutex (one compaction per table) — so
    * evolve/append on every table proceed concurrently; the catalog-wide
    * monitor is reserved for schema coordination. At commit (the short
    * per-table write-lock window) the snapshot is REVALIDATED: if any
    * input file vanished mid-rewrite (a widening migrate rewrote the
    * table, or a batch-dir re-ingest replaced its files), committing
    * would lose or duplicate those rows, so the compaction aborts and
    * discards its output — the next sweep retries against fresh state.
    * Crash-safety: the compacted output lands in data/ via one atomic
    * directory move carrying a `_manifest` of the input files; a crash
    * before the move leaves the old files intact (tmp is garbage-
    * collected), a crash after it leaves duplicates that
    * [[recoverMigration]] finishes deleting from the manifest. */
  def compact(spark: SparkSession, db: String, table: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val st = schema(db, table).getOrElse(
      throw new IllegalArgumentException(s"no such table: $db.$table"))
    val cl = compactLockFor(db, table); cl.lock()
    try {
      val dir = dataDir(db, table)
      val files = parquetFiles(db, table) // exact input snapshot
      if (files.length <= 1) return (files.length, files.length)
      val bytes = files.map(_.length()).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val df = spark.read.schema(st).parquet(files.map(_.getAbsolutePath): _*)
      val tmp = new File(tableDir(db, table), "compact_tmp")
      if (tmp.exists()) deleteRecursive(tmp.toPath)
      df.repartitionByRange(nOut, col(RowId)).sortWithinPartitions(RowId)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val manifest = files.map(f => dir.toPath.relativize(f.toPath).toString)
      Files.writeString(new File(tmp, "_manifest").toPath, manifest.mkString("\n"))
      compactTestHook()
      val out = new File(dir, s"batch-compact-${System.nanoTime()}")
      val committed = withRewriteLock(db, table) {
        if (dir.exists() && files.forall(_.exists())) {
          Files.move(tmp.toPath, out.toPath, StandardCopyOption.ATOMIC_MOVE)
          applyCompactManifest(db, table, dir, out)
          true
        } else false
      }
      if (!committed) { deleteRecursive(tmp.toPath); return (files.length, files.length) }
      refreshFragmentBaseline(db, table) // the rewrite legitimately removed inputs
      bump(db)
      (files.length, parquetFiles(db, table).length)
    } finally cl.unlock()
  }

  /** Batch directories whose rows were folded into a compacted output.
    * A blob redelivered AFTER its batch was compacted (at-least-once
    * retry with a long gap) must NOT re-create the batch dir — the rows
    * already live in the compacted file, so the overwrite-idempotency
    * trick would become permanent duplication. Names are persisted one
    * per line in `<table>/_compacted_batches`, written BEFORE the input
    * files are deleted (idempotent: a crash-replay re-appends, deduped
    * on load), and consulted by [[append]] under the same read lock the
    * write itself takes. One short line per compacted ingest batch. */
  private val tombstones = TrieMap.empty[(String, String), java.util.Set[String]]
  private def tombstoneFile(db: String, table: String) =
    new File(tableDir(db, table), "_compacted_batches")
  private def tombstoneSet(db: String, table: String): java.util.Set[String] =
    tombstones.getOrElseUpdate((db, table), {
      val s = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val f = tombstoneFile(db, table)
      if (f.exists()) Files.readAllLines(f.toPath).forEach(l => if (l.nonEmpty) s.add(l))
      s
    })
  private def addTombstones(db: String, table: String, dirs: Seq[String]): Unit = {
    val s = tombstoneSet(db, table)
    val fresh = dirs.distinct.filterNot(s.contains)
    if (fresh.nonEmpty) {
      Files.writeString(tombstoneFile(db, table).toPath, fresh.mkString("", "\n", "\n"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      fresh.foreach(s.add)
    }
  }

  /** Delete the input files recorded in `out/_manifest` (those the
    * compacted output replaces), then the manifest itself; empty batch
    * dirs left behind are removed. Idempotent — safe to re-run after a
    * crash mid-delete. */
  private def applyCompactManifest(db: String, table: String, dataDir: File, out: File): Unit = {
    val mf = new File(out, "_manifest")
    if (!mf.exists()) return
    import scala.jdk.CollectionConverters._
    val rels = Files.readAllLines(mf.toPath).asScala.filter(_.nonEmpty).toSeq
    // tombstone folded ingest-batch dirs BEFORE their files disappear
    addTombstones(db, table, rels.map(_.takeWhile(_ != '/'))
      .filter(d => d.startsWith("batch-") && !d.startsWith("batch-compact-")))
    rels.foreach { rel =>
      Files.deleteIfExists(dataDir.toPath.resolve(rel))
    }
    // sweep now-empty batch directories (but never the compact output)
    Option(dataDir.listFiles()).getOrElse(Array.empty[File])
      .filter(d => d.isDirectory && d != out)
      .filter(d => Option(d.listFiles()).forall(_.forall(f => f.getName.startsWith("_") || f.getName.startsWith("."))))
      .foreach(d => deleteRecursive(d.toPath))
    Files.delete(mf.toPath)
  }

  /** Parquet fragment count (compaction trigger input). */
  def fileCount(db: String, table: String): Int = parquetFiles(db, table).length

  /** Test seam: runs between a compaction's rewrite and its commit, so a
    * spec can interleave a racing append/migrate deterministically. */
  private[store] var compactTestHook: () => Unit = () => ()

  /** Repair an interrupted [[migrate]]: if `data` is missing, promote
    * whichever of `data_migrating`/`data_old` exists; stale leftovers
    * are deleted. Called from schema() lazily via table open is overkill
    * — callers (Main) run it once per table at startup. */
  def recoverMigration(db: String, table: String): Unit = synchronized {
    val dir = dataDir(db, table)
    val tmp = new File(tableDir(db, table), "data_migrating")
    val old = new File(tableDir(db, table), "data_old")
    if (!dir.exists() && old.exists())
      Files.move(old.toPath, dir.toPath, StandardCopyOption.ATOMIC_MOVE)
    else if (!dir.exists() && tmp.exists())
      Files.move(tmp.toPath, dir.toPath, StandardCopyOption.ATOMIC_MOVE)
    if (tmp.exists()) deleteRecursive(tmp.toPath)
    if (old.exists()) deleteRecursive(old.toPath)
    // interrupted compact: uncommitted output is garbage (inputs intact);
    // a committed output with a surviving _manifest finishes its deletes
    val ctmp = new File(tableDir(db, table), "compact_tmp")
    if (ctmp.exists()) deleteRecursive(ctmp.toPath)
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(d => d.isDirectory && new File(d, "_manifest").exists())
      .foreach(d => applyCompactManifest(db, table, dir, d))
  }

  /** Name-based column alignment with NULL fill — DuckDB `INSERT ... BY
    * NAME` semantics (duckdb/insert.go:56-70). Extra input columns are
    * dropped (callers evolve() first, so none in the ingest path). */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val in = df.schema.fieldNames.toSet
    df.select(target.fields.map { f =>
      if (in.contains(f.name)) col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** Append a batch: align to the (already evolved) table schema, sort
    * within partitions by __row_id for min/max pruning, append parquet.
    * One Spark job — the batch is read exactly once (callers already
    * know the row count; recomputing it here would re-parse the batch).
    *
    * With a `batchId` (the spool file's unique snowflake name) the batch
    * lands in its own `data/batch-<id>/` subdirectory written with
    * OVERWRITE — re-ingesting the same file (at-least-once retry after a
    * crash between append and blob delete) replaces the batch instead of
    * duplicating it, upgrading the retry path to effectively-once. */
  def append(spark: SparkSession, db: String, table: String, df: DataFrame,
             batchId: Option[String] = None): Unit = {
    val st = schema(db, table).getOrElse {
      evolve(spark, db, table, df.schema)
    }
    val aligned = align(df, st).sortWithinPartitions(RowId)
    withAppendLock(db, table) {
      batchId match {
        case Some(id) =>
          val safe = id.map(c => if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '_')
          // a tombstoned batch was folded into a compacted file — this is
          // a redelivery; re-creating the dir would duplicate its rows
          if (!tombstoneSet(db, table).contains(s"batch-$safe")) {
            val dir = new File(dataDir(db, table), s"batch-$safe")
            aligned.write.mode("overwrite").parquet(dir.getAbsolutePath)
          }
        case None =>
          aligned.write.mode("append").parquet(dataDir(db, table).getAbsolutePath)
      }
    }
    refreshFragmentBaseline(db, table) // overwrite legitimately replaces files
    bump(db)
  }

  // --- missing-fragment surfacing ------------------------------------
  // read()'s ignoreMissingFiles keeps a query alive across a compact
  // commit, but the same option would mask PERMANENT loss (disk
  // corruption, accidental rm) as silent row loss on every read. The
  // catalog therefore remembers the fragment listing it last saw per
  // table; fragments that vanish WITHOUT a catalog mutation (mutations
  // refresh the baseline) are returned by [[missingFragments]], which
  // the server's sweeper logs loudly.
  private val lastSeenFragments =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Set[String]]()

  private def refreshFragmentBaseline(db: String, table: String): Unit =
    lastSeenFragments.put((db, table), parquetFiles(db, table).map(_.getAbsolutePath).toSet)

  /** Fragments present at the previous call that have since vanished
    * without a legitimate catalog mutation — the quiet-row-loss case
    * ignoreMissingFiles would otherwise hide forever. The baseline
    * advances to the current listing on every call. */
  def missingFragments(db: String, table: String): Seq[String] = {
    val now = parquetFiles(db, table).map(_.getAbsolutePath).toSet
    val prev = Option(lastSeenFragments.put((db, table), now)).getOrElse(now)
    (prev -- now).toSeq.sorted
  }

  /** Read a table as a DataFrame with the pinned schema (missing columns
    * in older parquet files are NULL-filled by the explicit schema).
    * `ignoreMissingFiles`: a query planned just before a compact commit
    * may list fragments the commit then deletes mid-execution. Skipping
    * them trades a hard FileNotFound failure for a bounded-staleness
    * read (that one in-flight query misses the swapped fragments' rows;
    * the next read lists the compacted file and sees everything) — the
    * same read-uncommitted-snapshot semantics the append path already
    * has, and the standard Spark setting for compacting layouts.
    * Permanent loss is surfaced by [[missingFragments]], not here. */
  def read(spark: SparkSession, db: String, table: String): DataFrame = {
    val st = schema(db, table).getOrElse(
      throw new IllegalArgumentException(s"no such table: $db.$table"))
    if (hasData(db, table))
      spark.read.schema(st).option("recursiveFileLookup", "true")
        .option("ignoreMissingFiles", "true")
        .parquet(dataDir(db, table).getAbsolutePath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
  }

  def listTables(db: String): Seq[String] = {
    val d = new File(rootDir, db)
    val onDisk = Option(d.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && new File(f, "_schema.json").exists()).map(_.getName)
    (onDisk ++ schemas.keys.collect { case (`db`, t) => t }).distinct.sorted.toSeq
  }

  /** Per-tenant persisted index/store namespace (analytics
    * index_build + *_indexed probes), a sibling of the table dirs
    * under the same tenant root. The `stores.d` segment contains a dot,
    * which table names can never carry (Server.SafeName is
    * [A-Za-z0-9_]+), so a store can never collide with any table's
    * directory — and [[listTables]] skips it anyway (no _schema.json). */
  def storeDir(db: String, name: String): String =
    new File(new File(new File(rootDir, db), "stores.d"), name).getAbsolutePath

  /** The tenant's persisted stores: (name, kind, approx bytes on disk).
    * Only COMPLETE stores appear — a directory without the `_kind`
    * marker is either mid-build (the marker lands last) or debris from
    * a failed build, and probing it would 400 anyway. */
  def listStores(db: String): Seq[(String, String, Long)] = {
    val d = new File(new File(rootDir, db), "stores.d")
    Option(d.listFiles()).getOrElse(Array.empty[File])
      .filter(s => s.isDirectory && !s.getName.startsWith(".")) // skip in-flight build temps
      .flatMap { s =>
        // a concurrent dropStore can delete the marker between the
        // isFile check and the read — a vanishing entry is skipped,
        // never a 500 out of GET /api/stores
        try {
          val kind = new File(s, "_kind")
          if (kind.isFile)
            Some((s.getName, java.nio.file.Files.readString(kind.toPath).trim, dirBytes(s)))
          else None
        } catch { case _: java.io.IOException => None }
      }.sortBy(_._1).toSeq
  }

  /** Drop a persisted store (tables-side [[dropTable]]'s sibling).
    * Also removes marker-less build debris of the same name. */
  def dropStore(db: String, name: String): Boolean = {
    val dir = new File(storeDir(db, name))
    if (dir.exists()) { deleteRecursive(dir.toPath); true } else false
  }

  /** Boot-time reclaim of index_build debris: overwrite rebuilds write
    * into dot-prefixed `.{name}.build-<tag>` siblings and set the old
    * store aside as `.{name}.old-<tag>` during the swap. An in-process
    * failure cleans both up, but a process CRASH mid-build (kill -9,
    * OOM) strands them — invisible to listStores (dot-skipped) and to
    * the store quota, so they'd leak disk forever. Same single-writer
    * assumption as [[recoverMigration]]: one server owns a data dir,
    * so anything dot-prefixed at boot is debris by definition. Returns
    * the reclaimed paths for the boot log. */
  def cleanOrphanStoreBuilds(db: String): Seq[String] = {
    val d = new File(new File(rootDir, db), "stores.d")
    Option(d.listFiles()).getOrElse(Array.empty[File])
      .filter(s => s.isDirectory && s.getName.startsWith("."))
      .map { s => deleteRecursive(s.toPath); s.getAbsolutePath }
      .toSeq
  }

  private def dirBytes(f: File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File]).map(dirBytes).sum
    else f.length()

  def listColumns(db: String, table: String): Seq[(String, String)] =
    schema(db, table).map(_.fields.map(f => f.name -> f.dataType.sql).toSeq).getOrElse(Seq.empty)

  def dropTable(db: String, table: String): Boolean = {
    schemas.remove((db, table))
    lastSeenFragments.remove((db, table))
    bump(db)
    val dir = tableDir(db, table)
    if (dir.exists()) { deleteRecursive(dir.toPath); true } else false
  }

  /** Register every table of the tenant as a temp view on the session —
    * the resolve step before spark.sql serves a tenant query. Temp views
    * for tables that no longer exist (dropTable) are removed, so a
    * dropped table cannot be queried through a stale view. */
  def registerViews(spark: SparkSession, db: String): Unit = {
    val current = listTables(db)
    val keep = current.map(_.toLowerCase).toSet
    import scala.jdk.CollectionConverters._
    spark.catalog.listTables().collectAsList().asScala
      .filter(t => t.isTemporary && !keep.contains(t.name.toLowerCase))
      .foreach(t => spark.catalog.dropTempView(t.name))
    current.foreach { t =>
      read(spark, db, t).createOrReplaceTempView(t)
    }
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverseIterator.foreach(Files.delete)
  }
}
