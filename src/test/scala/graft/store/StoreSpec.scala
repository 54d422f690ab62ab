package graft.store

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.io.File
import java.nio.file.Files

class StoreSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.TestSpark.session()

  private def tmpDir(): String = Files.createTempDirectory("graft-store").toString


  test("auto-create, additive evolution, NULL fill across batches (FIXTURES A6)") {
    val cat = new TableCatalog(tmpDir())
    val ing = new IngestService(spark, cat)
    ing.ingestLines("db1", "t", Seq("""{"a": 1, "__row_id": 10}"""))
    assert(cat.schema("db1", "t").get.fieldNames.toSet == Set("__row_id", "a"))
    ing.ingestLines("db1", "t", Seq("""{"a": 2, "b": "hi", "__row_id": 11}"""))
    val rows = cat.read(spark, "db1", "t").orderBy("__row_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("a") == 1L && rows(0).isNullAt(rows(0).fieldIndex("b")))
    assert(rows(1).getAs[String]("b") == "hi")
  }

  test("widening an existing column migrates stored data (int batch then float batch)") {
    val cat = new TableCatalog(tmpDir())
    val ing = new IngestService(spark, cat)
    ing.ingestLines("db1", "w", Seq("""{"a": 1, "__row_id": 1}"""))
    assert(cat.schema("db1", "w").get("a").dataType == LongType)
    ing.ingestLines("db1", "w", Seq("""{"a": 3.5, "__row_id": 2}"""))
    assert(cat.schema("db1", "w").get("a").dataType == DoubleType)
    val vals = cat.read(spark, "db1", "w").orderBy("__row_id")
      .collect().map(_.getAs[Double]("a")).toSeq
    assert(vals == Seq(1.0, 3.5))
  }

  test("insertDirect: flatten + stamp + partial-success semantics (FIXTURES A7/A8)") {
    val cat = new TableCatalog(tmpDir())
    val ing = new IngestService(spark, cat)
    val r = ing.insertDirect("db1", "e", """[{"ok": 1}, "noflat", {"ok": 2}]""")
    assert(r.inserted == 2 && r.failed == 1 && r.message == "Partially inserted data" && r.status == 500)
    val all = ing.insertDirect("db1", "e", """"just-a-string"""")
    assert(all.message == "Unable to insert data")
    // pre-supplied __row_id is kept
    ing.insertDirect("db1", "keep", """{"__row_id": 42, "v": "keep"}""")
    assert(cat.read(spark, "db1", "keep").collect().head.getAs[Long]("__row_id") == 42L)
    // auto-stamped ids are present and unique
    val ids = cat.read(spark, "db1", "e").collect().map(_.getAs[Long]("__row_id")).toSeq
    assert(ids.size == 2 && ids.distinct.size == 2 && ids.forall(_ > 0))
  }

  test("vertical flatten through ingest: doc explodes into linked rows") {
    val cat = new TableCatalog(tmpDir())
    val ing = new IngestService(spark, cat)
    ing.insertDirect("db1", "v", """{"k": 1, "xs": [{"s": "a"}, {"s": "b"}]}""", "vertical")
    val df = cat.read(spark, "db1", "v")
    assert(df.count() == 2)
    assert(df.select("___document_id").distinct().count() == 1)
    assert(df.select("xs_s").collect().map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("spool: rotation by rows + closed-file handoff") {
    val dir = tmpDir()
    var closed = Vector.empty[File]
    val spool = new Spool(dir, SpoolConfig(maxRows = 3, maxAgeSeconds = 3600,
      rotatePeriodMillis = 50), f => closed :+= f)
    (1 to 7).foreach(i => spool.writeData("db1", "t", s"""{"i": $i}"""))
    Thread.sleep(200)
    assert(closed.size == 2) // two full files of 3; 1 row still open
    spool.flush()
    assert(closed.size == 3)
    val lines = closed.flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines.size == 7)
    assert(spool.ownerOf(closed.head) == ("db1", "t"))
    spool.shutdown()
  }

  test("spool + ingest end-to-end: closed file lands in catalog queryable") {
    val cat = new TableCatalog(tmpDir())
    val ing = new IngestService(spark, cat)
    val spool = new Spool(tmpDir(), SpoolConfig(maxRows = 2, rotatePeriodMillis = 50),
      f => { val (db, t) = (f.getParentFile.getParentFile.getName, f.getParentFile.getName); ing.ingestFile(db, t, f) })
    val res = ing.acceptBody(spool, "db9", "ev", """[{"u": "alice"}, {"u": "bob"}]""", "")
    assert(res.status == 200)
    Thread.sleep(300)
    assert(cat.read(spark, "db9", "ev").count() == 2)
    spool.shutdown()
  }

  test("catalog introspection + drop") {
    val cat = new TableCatalog(tmpDir())
    val ing = new IngestService(spark, cat)
    ing.ingestLines("d", "t1", Seq("""{"a": 1}"""))
    ing.ingestLines("d", "t2", Seq("""{"b": "x"}"""))
    assert(cat.listTables("d") == Seq("t1", "t2"))
    assert(cat.listColumns("d", "t2").toMap == Map("__row_id" -> "BIGINT", "b" -> "STRING"))
    assert(cat.dropTable("d", "t1"))
    assert(cat.listTables("d") == Seq("t2"))
  }

  test("blob-store ingest seam: upload -> ingest -> delete; failures retried (A6)") {
    val base = tmpDir()
    val cat = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, cat)
    val store = new LocalBlobStore(s"$base/blobs")
    var failFirst = true
    val uploader = new Uploader(store, (db, table, f) => {
      if (failFirst) { failFirst = false; sys.error("transient ingest failure") }
      ingest.ingestFile(db, table, f)
    })
    val spoolFile = new File(base, "batch.ndjson")
    Files.writeString(spoolFile.toPath, "{\"a\": 1, \"__row_id\": 10}\n{\"a\": 2, \"__row_id\": 11}\n")
    // first attempt fails -> blob must remain for retry
    intercept[RuntimeException] { uploader.accept("9", "blobbed", spoolFile) }
    assert(store.list("9/blobbed/") == Seq("9/blobbed/batch.ndjson"))
    // sweep retries and succeeds -> blob gone, rows queryable
    assert(uploader.retryPending() == 1)
    assert(store.list("").isEmpty)
    assert(cat.read(spark, "9", "blobbed").count() == 2)
  }

  test("hadoop blob store (file:// scheme): ingest seam works through the FileSystem API") {
    val base = tmpDir()
    val cat = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, cat)
    val store = BlobStore.forConfig("hadoop", Map("uri" -> s"file://$base/blobs"))
    val uploader = new Uploader(store, (db, table, f) => ingest.ingestFile(db, table, f))
    val spoolFile = new File(base, "7311209127400.ndjson")
    Files.writeString(spoolFile.toPath, "{\"a\": 1, \"__row_id\": 1}\n{\"a\": 2, \"__row_id\": 2}\n")
    uploader.accept("8", "hblob", spoolFile)
    assert(!spoolFile.exists(), "put must consume the local spool file")
    assert(store.list("").isEmpty, "processed blob must be deleted")
    assert(cat.read(spark, "8", "hblob").count() == 2)
    // pending blobs are listed and retried like the local impl
    val f2 = new File(base, "7311209127401.ndjson")
    Files.writeString(f2.toPath, "{\"a\": 3, \"__row_id\": 3}\n")
    store.put("8/hblob/7311209127401.ndjson", f2)
    assert(store.list("8/hblob/") == Seq("8/hblob/7311209127401.ndjson"))
    assert(uploader.retryPending() == 1)
    assert(cat.read(spark, "8", "hblob").count() == 3)
    intercept[IllegalArgumentException] { store.put("../escape", spoolFile) }
  }

  test("two uploaders over one blob store split ingest: every batch processed exactly once") {
    val base = tmpDir()
    val cat = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, cat)
    val store = new LocalBlobStore(s"$base/blobs")
    val processed = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    // each uploader gets its OWN FileLeaseQueue instance over the shared
    // dir — two processes coordinating through the filesystem only
    def mkUploader() = new Uploader(store, (db, t, f) => {
      processed.computeIfAbsent(f.getName, _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
      ingest.ingestFile(db, t, f)
    }, claims = new FileLeaseQueue(s"$base/claims"))
    val nBatches = 12
    (1 to nBatches).foreach { i =>
      val f = new File(base, s"731120950$i.ndjson")
      Files.writeString(f.toPath, s"""{"v": $i, "__row_id": $i}""" + "\n")
      store.put(s"5/two/${f.getName}", f)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val f1 = pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int = mkUploader().retryPending() })
    val f2 = pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int = mkUploader().retryPending() })
    val (n1, n2) = (f1.get(), f2.get()); pool.shutdown()
    assert(n1 + n2 == nBatches, s"split was $n1 + $n2, expected $nBatches total")
    import scala.jdk.CollectionConverters._
    val counts = processed.values().asScala.map(_.get())
    assert(counts.forall(_ == 1), s"some batch processed more than once: $counts")
    assert(store.list("").isEmpty)
    assert(cat.read(spark, "5", "two").count() == nBatches)
  }

  test("file lease queue: live leases exclusive; expired leases stolen by exactly one of N workers") {
    val dir = tmpDir()
    // injected clock: lease age is decided by `now`, not wall time, so a
    // starved test thread can never spuriously expire (or fail to
    // expire) a lease — the steal race below stays genuinely concurrent
    @volatile var now = 1000000L
    def mkQ() = new FileLeaseQueue(dir, leaseTtlMillis = 1000, clock = () => now)
    val q = mkQ()
    assert(q.tryClaim("k", "a"))
    assert(!q.tryClaim("k", "b"), "live lease must not be re-claimable")
    q.release("k", "a")
    assert(q.tryClaim("k", "b"), "released lease must be claimable")
    // age the lease past the STEALERS' TTL (but not the holder's own
    // 1000 ms): the marker carries no TTL — each reader judges
    // staleness by its own configured TTL, so the 300 ms stealers see
    // an expired lease exactly where a 1000 ms reader would not.
    // N stealers race, exactly one rename wins.
    now += 500
    assert(!mkQ().tryClaim("k", "same-ttl"),
      "a reader at the holder's own TTL must still see a live lease")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val wins = (1 to 8).map { i =>
      val sq = new FileLeaseQueue(dir, leaseTtlMillis = 300, clock = () => now)
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = sq.tryClaim("k", s"w$i")
      })
    }.count(_.get())
    pool.shutdown()
    assert(wins == 1, s"$wins stealers claimed one expired lease")
    // renew keeps a slow-but-alive worker's lease: expire the stealer's
    // marker, claim it, then renew at 80% TTL so the second 80% doesn't
    // cross expiry
    val holder = mkQ()
    now += 1500
    assert(holder.tryClaim("k", "slow"), "expired stealer lease should be re-claimable")
    now += 800; holder.renew("k", "slow"); now += 800
    assert(!holder.tryClaim("k", "thief"), "renewed lease was stolen")
    // fencing: renew/release under the WRONG owner must not touch the lease
    holder.renew("k", "imposter")
    holder.release("k", "imposter")
    assert(!mkQ().tryClaim("k", "thief2"),
      "imposter release deleted a live holder's marker")
    holder.release("k", "slow")
    assert(holder.tryClaim("k", "next"), "owner release must free the lease")
  }

  test("cas claim queue: live exclusive, one-of-N steal, fenced renew/release (no shared dir)") {
    casQueueSuite(new InMemoryCasStore)
  }

  test("cas claim queue over the file-backed CasStore: same steal/fence/renew contract") {
    casQueueSuite(new FileCasStore(s"${tmpDir()}/caskv"))
  }

  test("file cas store: conditional primitives are atomic under racing writers") {
    val kv = new FileCasStore(s"${tmpDir()}/caskv")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    // exactly one of 8 racing creators wins
    val created = (1 to 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = kv.putIfAbsent("k", s"v$i")
      })
    }.count(_.get())
    assert(created == 1, s"$created racing putIfAbsent calls succeeded")
    val v0 = kv.get("k").get
    // exactly one of 8 racing CAS replacers (all expecting v0) wins
    val replaced = (1 to 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = kv.replaceIf("k", v0, s"r$i")
      })
    }.count(_.get())
    pool.shutdown()
    assert(replaced == 1, s"$replaced racing replaceIf calls succeeded")
    assert(kv.get("k").exists(_.startsWith("r")))
    // deleteIf fences on the exact value
    assert(!kv.deleteIf("k", v0))
    assert(kv.deleteIf("k", kv.get("k").get))
    assert(kv.get("k").isEmpty)
  }

  test("ttl cache: expiry on read, default ttl, LRU bound (reference Cache service surface)") {
    var now = 1000L
    val c = new TtlCache(defaultTtlMillis = 100L, maxEntries = 3, clock = () => now)
    c.set("a", Array[Byte](1))
    assert(c.get("a").exists(_.sameElements(Array[Byte](1))))
    now += 101 // default TTL passed
    assert(c.get("a").isEmpty && c.size == 0, "expired entry must drop on read")
    c.set("b", Array[Byte](2), ttlMillis = Some(1000L)) // per-entry TTL beats default
    now += 500
    assert(c.get("b").isDefined)
    // LRU bound: touch b, then insert past the cap — eldest untouched goes
    c.set("c", Array[Byte](3), Some(1000L)); c.set("d", Array[Byte](4), Some(1000L))
    assert(c.get("b").isDefined) // b is now most-recently-used
    c.set("e", Array[Byte](5), Some(1000L)) // evicts c (eldest by access)
    assert(c.size == 3 && c.get("c").isEmpty && c.get("b").isDefined && c.get("e").isDefined)
  }

  test("ttl cache: total-byte bound evicts LRU entries; oversized value not retained; accounting exact") {
    var now = 1000L
    val c = new TtlCache(defaultTtlMillis = 10000L, maxEntries = 100,
      maxBytes = 10L, clock = () => now)
    c.set("a", Array.fill[Byte](4)(1))
    c.set("b", Array.fill[Byte](4)(2))
    assert(c.bytes == 8L && c.size == 2)
    c.get("a") // a is now most-recently-used
    c.set("c", Array.fill[Byte](4)(3)) // 12 > 10: evicts b (LRU), not a
    assert(c.size == 2 && c.bytes == 8L, s"bytes=${c.bytes}")
    assert(c.get("b").isEmpty && c.get("a").isDefined && c.get("c").isDefined)
    // replacing a key swaps its bytes, never double-counts
    c.set("a", Array.fill[Byte](6)(9))
    assert(c.bytes == 10L && c.size == 2)
    // a value bigger than the whole budget is not retained at all
    c.set("big", Array.fill[Byte](11)(7))
    assert(c.get("big").isEmpty && c.bytes <= 10L)
    // expiry-on-read releases its bytes
    now += 10001
    assert(c.get("a").isEmpty && c.get("c").isEmpty && c.bytes == 0L)
  }

  test("cas claim queue over S3 conditional writes: same steal/fence/renew contract (SigV4-verified fake)") {
    val fake = new FakeS3("AKTEST", "sekrit", "eu-west-1")
    try casQueueSuite(new S3CasStore(fake.endpoint, "graft-test", "claims",
      "eu-west-1", "AKTEST", "sekrit"))
    finally fake.stop()
  }

  test("s3 cas store: ETag CAS makes racing conditional writes one-winner; keys land under bucket/prefix") {
    val fake = new FakeS3("AKTEST", "sekrit", "eu-west-1")
    try {
      val kv = new S3CasStore(fake.endpoint, "graft-test", "claims",
        "eu-west-1", "AKTEST", "sekrit")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val created = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = kv.putIfAbsent("db/table/batch.ndjson", s"v$i")
        })
      }.count(_.get())
      assert(created == 1, s"$created racing If-None-Match:* PUTs succeeded")
      // claim keys keep their '/'s and live under <bucket>/<prefix>/
      assert(fake.keys == Set("/graft-test/claims/db/table/batch.ndjson"))
      val v0 = kv.get("db/table/batch.ndjson").get
      val replaced = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = kv.replaceIf("db/table/batch.ndjson", v0, s"r$i")
        })
      }.count(_.get())
      pool.shutdown()
      assert(replaced == 1, s"$replaced racing If-Match PUTs succeeded")
      assert(!kv.deleteIf("db/table/batch.ndjson", v0), "stale-value delete must fail")
      assert(kv.deleteIf("db/table/batch.ndjson", kv.get("db/table/batch.ndjson").get))
      assert(kv.get("db/table/batch.ndjson").isEmpty)
      // a wrong secret is rejected by the fake's signature verification
      val badKv = new S3CasStore(fake.endpoint, "graft-test", "claims",
        "eu-west-1", "AKTEST", "wrong-secret")
      intercept[java.io.IOException] { badKv.get("db/table/batch.ndjson") }
    } finally fake.stop()
  }

  private def casQueueSuite(kv: CasStore): Unit = {
    @volatile var now = 1000000L
    def mkQ() = new CasClaimQueue(kv, leaseTtlMillis = 1000, clock = () => now)
    val q = mkQ()
    assert(q.tryClaim("k", "a"))
    assert(!q.tryClaim("k", "b"), "live lease must not be re-claimable")
    q.release("k", "a")
    assert(q.tryClaim("k", "b"), "released lease must be claimable")
    // expire b's lease by advancing the clock: 8 stealers race, one CAS wins
    now += 1500
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val wins = (1 to 8).map { i =>
      val sq = mkQ()
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = sq.tryClaim("k", s"w$i")
      })
    }.count(_.get())
    pool.shutdown()
    assert(wins == 1, s"$wins stealers claimed one expired lease")
    // renew pushes expiry forward so a thief can't steal a live worker's lease
    now += 1500 // would expire the winner...
    val winner = kv.get("k").get.split(" ").head
    mkQ().renew("k", winner) // ...but the winner heartbeats first
    assert(!mkQ().tryClaim("k", "thief"), "renewed lease was stolen")
    // fencing: wrong-owner renew/release are no-ops
    mkQ().renew("k", "imposter")
    mkQ().release("k", "imposter")
    assert(kv.get("k").exists(_.startsWith(winner)), "imposter touched a live holder's claim")
    mkQ().release("k", winner)
    assert(kv.get("k").isEmpty, "owner release must delete the claim")
    assert(mkQ().tryClaim("k", "next"))
    // release must survive its own in-flight heartbeat: the uploader
    // cancels the renewer with cancel(false), so ONE renew can land
    // between release's read and the fenced delete — the delete then
    // sees a newer value and no-ops, orphaning the claim until TTL
    // (caught live by SeamSpec's S3 kill-steal receipt: one leftover
    // claim object after a clean 200/200 drain). The wrapper injects
    // exactly that interleaving before the first delete attempt.
    assert(mkQ().tryClaim("k2", "hb"))
    var injected = false
    val racy = new CasStore {
      def putIfAbsent(key: String, value: String) = kv.putIfAbsent(key, value)
      def get(key: String) = kv.get(key)
      def replaceIf(key: String, expect: String, value: String) =
        kv.replaceIf(key, expect, value)
      def deleteIf(key: String, expect: String) = {
        // advance the fake clock so the renewed value (expiry stamp)
        // actually DIFFERS from the one release read — a same-instant
        // renew rewrites an identical string and can't defeat the CAS
        if (!injected) { injected = true; now += 100; mkQ().renew("k2", "hb") }
        kv.deleteIf(key, expect)
      }
    }
    new CasClaimQueue(racy, leaseTtlMillis = 1000, clock = () => now).release("k2", "hb")
    assert(kv.get("k2").isEmpty,
      "release orphaned the claim after a concurrent heartbeat renew")
  }

  test("uploader heartbeats its lease: a batch slower than the TTL is never stolen mid-ingest") {
    val base = tmpDir()
    val store = new LocalBlobStore(s"$base/blobs")
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val processedTimes = new java.util.concurrent.atomic.AtomicInteger(0)
    // process takes 2x the lease TTL — without the TTL/3 heartbeat the
    // second uploader steals the lease and both write concurrently.
    // The heartbeat thread is real wall-clock, so this test can't use a
    // fake clock; instead the TTL (1200 ms, beats every 400 ms) leaves
    // enough slack that only a multi-second scheduler stall could miss
    // three consecutive beats and flake it.
    def slowProcess(db: String, t: String, f: File): Unit = {
      val n = inFlight.incrementAndGet()
      maxInFlight.updateAndGet(m => math.max(m, n))
      try { Thread.sleep(2400); processedTimes.incrementAndGet() }
      finally inFlight.decrementAndGet()
    }
    def mkUploader() = new Uploader(store, slowProcess,
      claims = new FileLeaseQueue(s"$base/claims", leaseTtlMillis = 1200))
    val f = new File(base, "7311209990.ndjson")
    Files.writeString(f.toPath, "{\"v\": 1, \"__row_id\": 1}\n")
    store.put("5/slow/7311209990.ndjson", f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val a = pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int = mkUploader().retryPending() })
    Thread.sleep(1600) // a is mid-process, its original lease would have expired
    val b = pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int = mkUploader().retryPending() })
    val (na, nb) = (a.get(), b.get()); pool.shutdown()
    assert(processedTimes.get() == 1, s"batch processed ${processedTimes.get()} times, want exactly 1")
    assert(maxInFlight.get() == 1, "two workers processed one batch CONCURRENTLY (lease stolen mid-ingest)")
    assert(na + nb == 1, s"split was $na + $nb")
    assert(store.list("").isEmpty, "blob must be deleted after the single successful process")
  }

  test("multi-node boot from env only: hadoop blob store + file-lease claims, end-to-end") {
    val base = tmpDir()
    val env = Map(
      "GRAFT_BLOB_TYPE" -> "hadoop",
      "GRAFT_BLOB_URI" -> s"file://$base/blobs",
      "GRAFT_CLAIM_QUEUE" -> s"file-lease:$base/claims",
      "GRAFT_LEASE_TTL_MS" -> "60000")
    val (store, claims) = graft.api.Main.storesFromEnv(env, base,
      new org.apache.hadoop.conf.Configuration())
    assert(store.isInstanceOf[HadoopBlobStore])
    assert(claims.isInstanceOf[FileLeaseQueue])
    val cat = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, cat)
    val up = new Uploader(store, (db, t, f) => ingest.ingestFile(db, t, f), claims = claims)
    val f = new File(base, "7311209995.ndjson")
    Files.writeString(f.toPath, "{\"a\": 7, \"__row_id\": 1}\n")
    up.accept("6", "boot", f)
    assert(cat.read(spark, "6", "boot").count() == 1)
    assert(store.list("").isEmpty)
    // defaults: local store under <data>/blobs + local claims
    val (dstore, dclaims) = graft.api.Main.storesFromEnv(Map.empty, base,
      sys.error("default local path must not touch hadoop conf"))
    assert(dstore.isInstanceOf[LocalBlobStore])
    assert(dclaims.isInstanceOf[LocalClaimQueue])
    intercept[IllegalArgumentException] {
      graft.api.Main.storesFromEnv(Map("GRAFT_CLAIM_QUEUE" -> "sqs"), base,
        new org.apache.hadoop.conf.Configuration())
    }
    // README deviation #5's cas:<dir> boots a CasClaimQueue over the
    // file-backed CasStore and carries ingest end-to-end
    val (cstore, cclaims) = graft.api.Main.storesFromEnv(
      Map("GRAFT_CLAIM_QUEUE" -> s"cas:$base/casclaims"), base,
      sys.error("cas queue must not touch hadoop conf"))
    assert(cclaims.isInstanceOf[CasClaimQueue])
    val cup = new Uploader(cstore, (db, t, f) => ingest.ingestFile(db, t, f), claims = cclaims)
    val f2 = new File(base, "7311209996.ndjson")
    Files.writeString(f2.toPath, "{\"a\": 8, \"__row_id\": 1}\n")
    cup.accept("6", "boot", f2)
    assert(cat.read(spark, "6", "boot").count() == 2)
    // cas-s3:<bucket/prefix> boots S3-conditional-write claims from the
    // blob store's credential env keys and carries ingest end-to-end
    val fake = new FakeS3("AKBOOT", "bootsecret", "us-west-2")
    try {
      val (sstore, sclaims) = graft.api.Main.storesFromEnv(Map(
        "GRAFT_CLAIM_QUEUE" -> "cas-s3:claims-bucket/leases",
        "GRAFT_BLOB_ENDPOINT" -> fake.endpoint,
        "GRAFT_BLOB_REGION" -> "us-west-2",
        "GRAFT_BLOB_ACCESS_KEY_ID" -> "AKBOOT",
        "GRAFT_BLOB_SECRET_ACCESS_KEY" -> "bootsecret"), base,
        sys.error("cas-s3 queue must not touch hadoop conf"))
      assert(sclaims.isInstanceOf[CasClaimQueue])
      val sup = new Uploader(sstore, (db, t, f) => ingest.ingestFile(db, t, f), claims = sclaims)
      val f3 = new File(base, "7311209997.ndjson")
      Files.writeString(f3.toPath, "{\"a\": 9, \"__row_id\": 1}\n")
      sup.accept("6", "boot", f3)
      assert(cat.read(spark, "6", "boot").count() == 3)
      assert(fake.keys.isEmpty, "claim must be released after the batch lands")
    } finally fake.stop()
  }

  test("spool orphan recovery: open files of a dead process are closed out") {
    val base = tmpDir()
    var handed = Vector.empty[String]
    // a previous process died with a row still in open/
    val orphan = new File(s"$base/open/5/evts")
    orphan.mkdirs()
    Files.writeString(new File(orphan, "123.ndjson").toPath, "{\"a\":1}\n")
    val spool = new Spool(base, SpoolConfig(), f => handed :+= f.getName)
    assert(spool.recoverOrphans() == 1)
    assert(handed == Vector("123.ndjson"))
    assert(!new File(s"$base/open/5/evts/123.ndjson").exists())
    assert(new File(s"$base/closed/5/evts/123.ndjson").exists())
    spool.shutdown()
  }

  test("interrupted migration recovers: data_old or data_migrating promoted") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    ingest.ingestLines("d", "m1", Seq("{\"v\": 1, \"__row_id\": 1}"))
    // simulate a crash after `data` was moved aside but before promote
    val tdir = new File(new File(base, "d"), "m1")
    Files.move(new File(tdir, "data").toPath, new File(tdir, "data_old").toPath)
    cat.recoverMigration("d", "m1")
    assert(new File(tdir, "data").exists() && !new File(tdir, "data_old").exists())
    assert(cat.read(spark, "d", "m1").count() == 1)
  }

  test("compact: many small batch files rewrite into few range-clustered files") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    (1 to 6).foreach { b =>
      ingest.ingestLines("d", "frag",
        (1 to 50).map(i => s"""{"v": ${b * 1000 + i}, "__row_id": ${b * 1000 + i}}"""))
    }
    assert(cat.fileCount("d", "frag") >= 6)
    val before = cat.read(spark, "d", "frag").orderBy("__row_id")
      .collect().map(_.getLong(0)).toSeq
    val (nb, na) = cat.compact(spark, "d", "frag")
    assert(nb >= 6 && na == 1) // 6 tiny batches fit one target file
    val after = cat.read(spark, "d", "frag").orderBy("__row_id")
      .collect().map(_.getLong(0)).toSeq
    assert(after == before) // same rows, same order
    // idempotent: nothing left to do
    assert(cat.compact(spark, "d", "frag") == (1, 1))
  }

  test("bulk load: distributed inference matches line-path precedence; idempotent on retry") {
    val base = tmpDir()
    val cat = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, cat)
    // multi-file "bulk" directory: int in one file widens to float via the
    // other; a string appearance wins over everything (types.go precedence)
    val bulk = new File(base, "bulkload"); bulk.mkdirs()
    Files.writeString(new File(bulk, "part-0.ndjson").toPath,
      "{\"v\": 1, \"s\": 5, \"__row_id\": 1}\n{\"v\": 2, \"s\": 6, \"__row_id\": 2}\n")
    Files.writeString(new File(bulk, "part-1.ndjson").toPath,
      "{\"v\": 2.5, \"s\": \"seven\", \"__row_id\": 3}\n")
    ingest.ingestBulkFile("b", "big", bulk.getAbsolutePath)
    assert(cat.listColumns("b", "big").toMap ==
      Map("__row_id" -> "BIGINT", "v" -> "DOUBLE", "s" -> "STRING"))
    assert(cat.read(spark, "b", "big").count() == 3)
    // retry (same path) overwrites its batch, no duplication
    ingest.ingestBulkFile("b", "big", bulk.getAbsolutePath)
    assert(cat.read(spark, "b", "big").count() == 3)
    val vs = cat.read(spark, "b", "big").orderBy("__row_id")
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(vs == Seq(1.0, 2.0, 2.5))
  }

  test("ingestLines runs exactly one Spark job: the batch is parsed once (no recount)") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = ingest.ingestLines("j", "once",
        (1 to 100).map(i => s"""{"v": $i, "__row_id": $i}"""))
      Thread.sleep(500) // let listener-bus events drain
      assert(n == 100)
      assert(jobs.get() == 1, s"expected 1 job (the parquet write), saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ingest retry is idempotent: re-processing the same batch file does not duplicate rows") {
    val base = tmpDir()
    val cat = new TableCatalog(s"$base/tables")
    val ingest = new IngestService(spark, cat)
    def writeBatch(): File = {
      val f = new File(base, "7311209127311.ndjson") // snowflake-named spool file
      Files.writeString(f.toPath, "{\"a\": 1, \"__row_id\": 1}\n{\"a\": 2, \"__row_id\": 2}\n")
      f
    }
    ingest.ingestFile("1", "idem", writeBatch())
    assert(cat.read(spark, "1", "idem").count() == 2)
    // crash-between-append-and-delete replay: same file ingested again
    ingest.ingestFile("1", "idem", writeBatch())
    assert(cat.read(spark, "1", "idem").count() == 2) // overwritten, not doubled
    // a DIFFERENT batch still appends
    val f2 = new File(base, "7311209127999.ndjson")
    Files.writeString(f2.toPath, "{\"a\": 3, \"__row_id\": 3}\n")
    ingest.ingestFile("1", "idem", f2)
    assert(cat.read(spark, "1", "idem").count() == 3)
    // compaction flattens batch dirs and preserves rows
    val (nb, na) = cat.compact(spark, "1", "idem")
    assert(nb >= 2 && na == 1)
    assert(cat.read(spark, "1", "idem").count() == 3)
  }

  test("compact racing concurrent appends loses no rows (sweeper-vs-ingest)") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    // establish schema so appends and compact agree on it
    ingest.ingestLines("r", "hot", Seq("""{"v": 0, "__row_id": 0}"""))
    val nAppenders = 4; val perThread = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nAppenders + 1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val appenders = (0 until nAppenders).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until perThread).foreach { i =>
          val id = t * 1000 + i + 1
          // unique batch ids mirror the spool path (one dir per batch)
          ingest.ingestLines("r", "hot", Seq(s"""{"v": $id, "__row_id": $id}"""),
            batchId = Some(s"race-$id"))
        }
      })
    }
    // the sweeper: compact continuously while appends are in flight
    val compacter = pool.submit(new Runnable {
      def run(): Unit = while (!stop.get()) {
        if (cat.fileCount("r", "hot") > 2) { cat.compact(spark, "r", "hot"); compactions.incrementAndGet() }
        else Thread.sleep(10)
      }
    })
    appenders.foreach(_.get())
    stop.set(true); compacter.get(); pool.shutdown()
    assert(compactions.get() > 0, "test never exercised a concurrent compaction")
    val ids = cat.read(spark, "r", "hot").collect().map(_.getAs[Long]("__row_id")).toSet
    assert(ids.size == nAppenders * perThread + 1,
      s"lost ${nAppenders * perThread + 1 - ids.size} rows across ${compactions.get()} compactions")
  }

  test("interrupted compact recovers: committed manifest finishes, uncommitted tmp is dropped") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    (1 to 3).foreach(i => ingest.ingestLines("r", "c1", Seq(s"""{"v": $i, "__row_id": $i}""")))
    cat.compact(spark, "r", "c1")
    assert(cat.read(spark, "r", "c1").count() == 3)
    // simulate a crash AFTER the compacted dir moved in but BEFORE the
    // old fragments were deleted: re-create a duplicate fragment and a
    // manifest pointing at it
    val tdir = new File(new File(base, "r"), "c1")
    val data = new File(tdir, "data")
    val outDir = data.listFiles().filter(_.getName.startsWith("batch-compact-")).head
    val dupe = new File(data, "stale-fragment.parquet")
    val anyParquet = outDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(anyParquet.toPath, dupe.toPath)
    Files.writeString(new File(outDir, "_manifest").toPath, "stale-fragment.parquet")
    assert(cat.read(spark, "r", "c1").count() == 6) // duplicates visible pre-recovery
    // and an uncommitted tmp from another crashed compact
    val ctmp = new File(tdir, "compact_tmp"); ctmp.mkdirs()
    Files.writeString(new File(ctmp, "junk").toPath, "x")
    cat.recoverMigration("r", "c1")
    assert(!ctmp.exists())
    assert(!dupe.exists())
    assert(cat.read(spark, "r", "c1").count() == 3)
  }

  test("compact aborts commit when a snapshotted batch is rewritten mid-rewrite (no dup, no loss)") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    ingest.ingestLines("r", "abt", Seq("""{"v": 1, "__row_id": 1}"""), batchId = Some("b1"))
    ingest.ingestLines("r", "abt", Seq("""{"v": 2, "__row_id": 2}"""), batchId = Some("b2"))
    val filesBefore = cat.fileCount("r", "abt")
    // at-least-once redelivery of b1 lands BETWEEN the rewrite and the
    // commit: its overwrite replaces the snapshotted files, so the
    // commit must abort (else b1's rows double or vanish)
    cat.compactTestHook = () => {
      ingest.ingestLines("r", "abt", Seq("""{"v": 1, "__row_id": 1}"""), batchId = Some("b1"))
      cat.compactTestHook = () => ()
    }
    val (nb, na) = cat.compact(spark, "r", "abt")
    assert(nb == na, "an aborted compact must report no file-count change")
    val ids = cat.read(spark, "r", "abt").collect().map(_.getAs[Long]("__row_id")).toSeq.sorted
    assert(ids == Seq(1L, 2L), s"rows corrupted by aborted compact: $ids")
    assert(cat.fileCount("r", "abt") == filesBefore)
    // with no race, the retry commits normally
    assert(cat.compact(spark, "r", "abt")._2 == 1)
    assert(cat.read(spark, "r", "abt").count() == 2)
  }

  test("batch redelivered after compaction folded it in is dropped (tombstone, survives reopen)") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    def batchFile(): File = {
      val f = new File(base, "7311209555001.ndjson")
      Files.writeString(f.toPath, "{\"a\": 1, \"__row_id\": 1}\n{\"a\": 2, \"__row_id\": 2}\n")
      f
    }
    ingest.ingestFile("1", "tomb", batchFile())
    ingest.ingestLines("1", "tomb", Seq("""{"a": 3, "__row_id": 3}"""), batchId = Some("other"))
    cat.compact(spark, "1", "tomb")
    assert(cat.read(spark, "1", "tomb").count() == 3)
    // the blob survived a crash-before-delete; a sweeper replays it long
    // after compaction already folded the batch into the compacted file
    ingest.ingestFile("1", "tomb", batchFile())
    assert(cat.read(spark, "1", "tomb").count() == 3, "redelivered compacted batch duplicated rows")
    // tombstones persist: a fresh catalog instance (restart) still drops it
    val cat2 = new TableCatalog(base)
    val ingest2 = new IngestService(spark, cat2)
    ingest2.ingestFile("1", "tomb", batchFile())
    assert(cat2.read(spark, "1", "tomb").count() == 3)
  }

  test("spool striped locking: concurrent writers to many tables lose no rows") {
    val base = tmpDir()
    val closedRows = new java.util.concurrent.atomic.AtomicLong
    val spool = new Spool(base, SpoolConfig(maxRows = 50, maxAgeSeconds = 3600),
      f => closedRows.addAndGet(Files.readAllLines(f.toPath).size().toLong))
    val nThreads = 8; val perThread = 500
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val futures = (0 until nThreads).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until perThread).foreach { i =>
          // threads collide on shared tables AND write private ones
          spool.writeData("1", s"t${i % 3}", s"""{"t":$t,"i":$i}""")
          spool.writeData("2", s"own$t", s"""{"i":$i}""")
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    spool.flush()
    spool.shutdown()
    assert(closedRows.get() == nThreads.toLong * perThread * 2)
  }

  test("dropped table is not queryable through a stale temp view") {
    val base = tmpDir()
    val cat = new TableCatalog(base)
    val ingest = new IngestService(spark, cat)
    val exec = new graft.engine.QueryExecutor(spark, cat)
    ingest.ingestLines("9", "keepme", Seq("{\"a\": 1, \"__row_id\": 1}"))
    ingest.ingestLines("9", "dropme", Seq("{\"b\": 2, \"__row_id\": 2}"))
    assert(exec.execute("9", "select count(*) as n from dropme").collect().head.getLong(0) == 1)
    cat.dropTable("9", "dropme")
    val ex = intercept[graft.engine.QueryRejectedException] {
      exec.execute("9", "select * from dropme")
    }
    assert(ex.getMessage.contains("unknown table"))
    // the surviving table still resolves
    assert(exec.execute("9", "select count(*) as n from keepme").collect().head.getLong(0) == 1)
  }

  test("missingFragments surfaces externally-deleted files; catalog mutations never false-positive") {
    val cat = new TableCatalog(tmpDir())
    val ingest = new IngestService(spark, cat)
    (1 to 3).foreach(i => ingest.ingestLines("m", "frag", Seq(s"""{"v": $i, "__row_id": $i}"""),
      batchId = Some(s"b$i")))
    assert(cat.missingFragments("m", "frag").isEmpty) // baseline
    // compact removes inputs LEGITIMATELY: no false positive
    cat.compact(spark, "m", "frag")
    assert(cat.missingFragments("m", "frag").isEmpty,
      "compact-removed fragments must not be reported as lost")
    // widening migrate rewrites everything: also clean
    ingest.ingestLines("m", "frag", Seq("""{"v": 4.5, "__row_id": 4}"""), batchId = Some("b4"))
    assert(cat.missingFragments("m", "frag").isEmpty)
    // ...but a fragment deleted OUTSIDE the catalog is surfaced
    val files = cat.read(spark, "m", "frag").inputFiles
    val path = new java.net.URI(files.head).getPath
    Files.delete(java.nio.file.Path.of(path))
    val missing = cat.missingFragments("m", "frag")
    assert(missing == Seq(path), s"expected $path reported, got $missing")
    // and only once: the baseline advanced
    assert(cat.missingFragments("m", "frag").isEmpty)
  }

  test("metastore: auth reads are lock-free — resolveKey answers while a writer holds the monitor") {
    val m = new MetaStore(tmpDir())
    val key = m.addKey("9")
    val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
    try m.synchronized { // a writer mid-save() holds exactly this monitor
      val f = ex.submit(new java.util.concurrent.Callable[Option[String]] {
        def call(): Option[String] = m.resolveKey(MetaStore.sha256(key))
      })
      assert(f.get(2, java.util.concurrent.TimeUnit.SECONDS).contains("9"),
        "resolveKey blocked behind the writer monitor")
      val g = ex.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = m.listDestinations.isEmpty && !m.destinationExists("1")
      })
      assert(g.get(2, java.util.concurrent.TimeUnit.SECONDS))
    } finally ex.shutdown()
  }

  test("metastore: destinations, keys and shares persist across reopen") {
    val base = tmpDir()
    val m1 = new MetaStore(base, reservedIds = Set(1L))
    val d = m1.createDestination("spark", "team-x")
    assert(d.id == 2) // 1 is reserved for the static tenant
    val key = m1.addKey(d.id.toString)
    val uuid = m1.createShare(d.id.toString, "select 1", 3600)
    val m2 = new MetaStore(base) // reopen from disk
    assert(m2.resolveKey(MetaStore.sha256(key)).contains(d.id.toString))
    assert(m2.listDestinations.map(_.name) == Seq("team-x"))
    assert(m2.getShare(uuid).exists(_.query == "select 1"))
    assert(m2.getShare("nope").isEmpty)
    // expired shares are evicted lazily and by the purge sweep
    val dead = m2.createShare("2", "select 2", -1)
    assert(m2.getShare(dead).isEmpty)
    assert(m2.purgeExpiredShares() == 0) // already evicted on read
  }
}
