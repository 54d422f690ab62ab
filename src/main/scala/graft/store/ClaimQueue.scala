package graft.store

import java.io.File
import java.nio.file.{FileAlreadyExistsException, Files, NoSuchFileException, Path, StandardCopyOption, StandardOpenOption}

/** Cross-process work-claim coordination for the spool -> ingest
  * handoff: the reference runs N ingest workers against a durable queue
  * whose dequeue CLAIMS a message exclusively but leaves it recoverable
  * if the claimant dies — `FOR UPDATE SKIP LOCKED` + status=claimed in
  * the gorm queue (/root/reference/pkg/storage/database/gorm/queue.go:
  * 29-63) and the visibility timeout in the SQS backend
  * (/root/reference/pkg/storage/queue/sqs/). Claim-then-process gives
  * at-least-once: a claimant that dies mid-batch releases nothing, its
  * lease expires, and another worker re-claims — the batch-dir
  * overwrite idempotency downstream turns that into effectively-once.
  *
  * All three methods take the `owner` id so expiring implementations
  * can FENCE: renew/release only act when the claim is still held by
  * that owner — a worker whose lease was stolen and re-claimed by a
  * peer can neither resurrect the lease nor delete the new holder's
  * claim.
  */
trait ClaimQueue {
  /** Exclusively claim `key`; false if another live worker holds it. */
  def tryClaim(key: String, owner: String): Boolean

  /** Release a claim (after success OR failure — failure releases so
    * the retry sweep can re-claim immediately instead of waiting out
    * the lease). No-op if `owner` no longer holds the claim. */
  def release(key: String, owner: String): Unit

  /** Extend a held lease mid-batch so a slow (but alive) worker isn't
    * stolen from. No-op where claims don't expire, and no-op if
    * `owner` no longer holds the claim. */
  def renew(key: String, owner: String): Unit = ()

  /** How often a long-running holder should call [[renew]];
    * None = claims never expire, no heartbeat needed. */
  def renewIntervalMillis: Option[Long] = None
}

/** In-process claims only — the single-node default, equivalent to the
  * Uploader's original in-flight key set. Claims never expire (the
  * holder is a thread in this process; if the process dies the claims
  * die with it), so renew is the trait's no-op. */
final class LocalClaimQueue extends ClaimQueue {
  private val held = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  override def tryClaim(key: String, owner: String): Boolean = held.add(key)
  override def release(key: String, owner: String): Unit = held.remove(key)
}

/** File-lease claims over a SHARED directory (NFS, or the same local
  * disk for co-located processes): the two-node story for splitting
  * ingest without a database.
  *
  *  - claim = atomic create (CREATE_NEW) of `<dir>/<key>.claim`
  *    containing the owner id — exactly one creator wins;
  *  - lease TTL: a marker older than `leaseTtlMillis` belongs to a dead
  *    worker. Stealing is rename-based: the stale marker is atomically
  *    renamed to a unique name first, so of N stealers exactly one
  *    rename succeeds and only that worker proceeds to re-claim — two
  *    workers can never both reclaim one expired lease;
  *  - [[renew]] bumps the marker's mtime, but ONLY if the marker still
  *    carries this owner's id — a holder whose lease was stolen and
  *    re-claimed cannot extend the new holder's lease, and [[release]]
  *    checks the same so it cannot delete the new holder's marker.
  *
  * Fencing honesty: the renew/release owner checks are read-then-act —
  * POSIX gives no compare-and-delete, so a steal landing in the
  * microseconds between heldBy and the mtime-set/delete can still be
  * clobbered. That window requires a peer to steal at the exact instant
  * the owner acts, which in turn requires the lease to be AT expiry —
  * and the TTL/3 heartbeat keeps live owners far from expiry, so the
  * exposure is a dead-worker race measured in microseconds against a
  * TTL measured in minutes. Deployments that cannot tolerate it use
  * [[CasClaimQueue]], whose every transition is a true CAS.
  *
  * An object-store deployment swaps this for [[CasClaimQueue]] over a
  * conditional-PUT store (S3 lacks atomic create-if-absent on the
  * filesystem API); the Uploader doesn't care. */
final class FileLeaseQueue(dir: String, leaseTtlMillis: Long = 5 * 60 * 1000,
                           clock: () => Long = System.currentTimeMillis) extends ClaimQueue {
  private val root: Path = new File(dir).toPath

  private def marker(key: String): Path = {
    val safe = key.map(c => if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '~')
    root.resolve(s"$safe.claim")
  }

  private def heldBy(f: Path, owner: String): Boolean =
    try new String(Files.readAllBytes(f), "UTF-8") == owner
    catch { case _: java.io.IOException => false }

  override def tryClaim(key: String, owner: String): Boolean = {
    val f = marker(key)
    Files.createDirectories(root)
    try {
      Files.write(f, owner.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
      // stamp the lease birth from OUR clock, not the filesystem's: the
      // expiry check below compares against the same clock, so lease
      // age is consistent even when the marker lives on a remote mount
      // whose server time drifts from the claimant's
      try Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(clock()))
      catch { case _: java.io.IOException => } // marker keeps fs mtime; lease still works
      // verify-after-stamp: if the mount's server clock lags our clock
      // by more than the TTL, a peer could judge the freshly created
      // marker (briefly carrying the fs mtime) expired and steal it in
      // the create->stamp window. We hold the lease only if the marker
      // still carries OUR id after stamping — the thief's recreate wrote
      // its own id, so exactly one of us proceeds. Gone = stolen-and-
      // renamed = lost; a TRANSIENT read error must NOT report lost
      // (the marker would sit orphaned for a full TTL with its creator
      // gone) — unreadable-but-present keeps the pre-verify behavior of
      // trusting our own successful create.
      readOwner(f) match {
        case OwnerRead(Some(id)) => id == owner
        case OwnerRead(None)     => false // positively gone: stolen
        case OwnerReadError      => true  // can't know; we did create it
      }
    } catch {
      case _: FileAlreadyExistsException =>
        val expired =
          try clock() - Files.getLastModifiedTime(f).toMillis > leaseTtlMillis
          catch { case _: NoSuchFileException => false } // released just now; next sweep gets it
        if (!expired) false
        else {
          val steal = root.resolve(f.getFileName.toString + ".stale-" + java.util.UUID.randomUUID())
          try {
            Files.move(f, steal, StandardCopyOption.ATOMIC_MOVE) // exactly one stealer wins
            // recheck-after-rename: the stat that judged `f` expired may
            // be stale — a faster stealer can have already renamed,
            // deleted AND recreated it, in which case the move above
            // grabbed the winner's FRESH marker. Renaming is the only
            // atomic primitive here, so the recheck reads the captured
            // copy: fresh ⇒ we raced a live recreate — restore it and
            // lose; actually stale ⇒ discard and re-claim.
            val fresh =
              try clock() - Files.getLastModifiedTime(steal).toMillis <= leaseTtlMillis
              catch { case _: NoSuchFileException => false }
            if (fresh) {
              try { Files.move(steal, f, StandardCopyOption.ATOMIC_MOVE); false }
              catch { case _: FileAlreadyExistsException =>
                // a third claimant recreated f inside this microsecond
                // window; the captured copy is superseded either way
                Files.deleteIfExists(steal); false
              }
            } else {
              Files.deleteIfExists(steal)
              tryClaim(key, owner)
            }
          } catch {
            case _: NoSuchFileException => false // another worker stole or released it first
          }
        }
    }
  }

  /** Three-way marker read: present-with-content / positively absent /
    * unreadable (transient IO) — callers fence differently on each. */
  private sealed trait OwnerReadResult
  private case class OwnerRead(id: Option[String]) extends OwnerReadResult
  private case object OwnerReadError extends OwnerReadResult
  private def readOwner(f: Path): OwnerReadResult =
    try OwnerRead(Some(new String(Files.readAllBytes(f), "UTF-8")))
    catch {
      case _: NoSuchFileException => OwnerRead(None)
      case _: java.io.IOException => OwnerReadError
    }

  override def renew(key: String, owner: String): Unit = {
    val f = marker(key)
    if (heldBy(f, owner)) // fencing: never extend a lease we no longer hold
      try Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(clock()))
      catch { case _: NoSuchFileException => }
  }

  /** Renew at TTL/3: two missed beats of slack before expiry. */
  override def renewIntervalMillis: Option[Long] = Some(math.max(1L, leaseTtlMillis / 3))

  override def release(key: String, owner: String): Unit = {
    val f = marker(key)
    if (heldBy(f, owner)) Files.deleteIfExists(f)
  }
}

/** The minimal conditional-write KV surface an object store or KV
  * database provides, and all [[CasClaimQueue]] needs:
  *
  *  - S3: `PUT If-None-Match: *` (create-if-absent) and
  *    `If-Match: <etag>` on PUT/DELETE give exactly these three
  *    primitives (conditional writes are standard S3 API);
  *  - DynamoDB: `attribute_not_exists` / equality condition
  *    expressions;
  *  - any CP store (etcd, ZooKeeper) trivially.
  *
  * Every mutation is atomic w.r.t. the expected current value, which
  * is what makes N racing workers resolve to exactly one winner. */
trait CasStore {
  /** Create `key`=`value` iff absent. False if the key exists. */
  def putIfAbsent(key: String, value: String): Boolean
  /** Current value, if the key exists. */
  def get(key: String): Option[String]
  /** Replace the value iff the current value == `expect` (CAS). */
  def replaceIf(key: String, expect: String, value: String): Boolean
  /** Delete iff the current value == `expect`.
    *
    * Contract (relied on by [[CasClaimQueue.release]]'s retry loop):
    * false means ONLY that the stored value no longer equals `expect`
    * — transient backend errors must THROW, never return false, or a
    * caller retrying on false would spin against a healthy value. */
  def deleteIf(key: String, expect: String): Boolean
}

/** File-backed [[CasStore]] over a shared directory — the production
  * local/NFS backend for [[CasClaimQueue]] (the object-store deployments
  * swap in a conditional-PUT impl behind the same 4 methods).
  *
  * Atomicity:
  *  - `putIfAbsent` is lock-free: the value is written to a unique temp
  *    file and hard-LINKED to the key path — `link(2)` fails atomically
  *    if the target exists, giving create-if-absent WITH full content
  *    (a plain CREATE_NEW write could expose a torn half-write to
  *    readers; ATOMIC_MOVE can't be used because rename(2) silently
  *    replaces an existing target).
  *  - `replaceIf` / `deleteIf` serialize through a short-lived lock
  *    file (atomic CREATE_NEW; stale locks of crashed processes are
  *    stolen via the same one-winner rename dance as FileLeaseQueue),
  *    then read-compare-swap; the swap is temp + ATOMIC_MOVE so `get`
  *    never sees a torn value.
  *  - `get` is lock-free: every visible key file is a complete value.
  */
final class FileCasStore(dir: String, lockTtlMillis: Long = 10000) extends CasStore {
  private val root: Path = new File(dir).toPath

  private def safe(key: String): String =
    key.map(c => if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '~')
  private def keyFile(key: String): Path = root.resolve(s"${safe(key)}.kv")
  private def lockFile(key: String): Path = root.resolve(s"${safe(key)}.kvlock")

  private def withLock[A](key: String)(f: => A): A = {
    val lock = lockFile(key)
    Files.createDirectories(root)
    var acquired = false
    while (!acquired) {
      try { Files.write(lock, Array.emptyByteArray, StandardOpenOption.CREATE_NEW); acquired = true }
      catch {
        case _: FileAlreadyExistsException =>
          // mutations are milliseconds; an old lock is a crashed process
          val expired =
            try System.currentTimeMillis() - Files.getLastModifiedTime(lock).toMillis > lockTtlMillis
            catch { case _: NoSuchFileException => false }
          if (expired) {
            val steal = root.resolve(lock.getFileName.toString + ".stale-" + java.util.UUID.randomUUID())
            try { Files.move(lock, steal, StandardCopyOption.ATOMIC_MOVE); Files.deleteIfExists(steal) }
            catch { case _: NoSuchFileException => () } // another stealer/holder got there first
          } else Thread.sleep(2)
      }
    }
    try f finally Files.deleteIfExists(lock)
  }

  override def putIfAbsent(key: String, value: String): Boolean = {
    Files.createDirectories(root)
    val tmp = root.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, value.getBytes("UTF-8"))
    try { Files.createLink(keyFile(key), tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def get(key: String): Option[String] =
    try Some(new String(Files.readAllBytes(keyFile(key)), "UTF-8"))
    catch { case _: java.io.IOException => None }

  override def replaceIf(key: String, expect: String, value: String): Boolean = withLock(key) {
    if (!get(key).contains(expect)) false
    else {
      val tmp = root.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, value.getBytes("UTF-8"))
      Files.move(tmp, keyFile(key), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      true
    }
  }

  override def deleteIf(key: String, expect: String): Boolean = withLock(key) {
    if (!get(key).contains(expect)) false
    else { Files.deleteIfExists(keyFile(key)); true }
  }
}

/** In-memory [[CasStore]] — the test double, and the single-process
  * reference semantics the remote impls must match. */
final class InMemoryCasStore extends CasStore {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
  override def putIfAbsent(key: String, value: String): Boolean = m.putIfAbsent(key, value) == null
  override def get(key: String): Option[String] = Option(m.get(key))
  override def replaceIf(key: String, expect: String, value: String): Boolean = m.replace(key, expect, value)
  override def deleteIf(key: String, expect: String): Boolean = m.remove(key, expect)
}

/** Claim queue over a [[CasStore]] — the blob-store-only deployment's
  * coordination, needing NO shared POSIX directory (vs
  * [[FileLeaseQueue]]'s NFS requirement). Semantics mirror the
  * reference's SQS backend (/root/reference/pkg/storage/queue/sqs/):
  * a claim is visible to exactly one worker, and the lease TTL plays
  * the visibility timeout — an expired claim re-enters circulation.
  *
  * Unlike the file impl there is no mtime: the claim VALUE carries
  * `owner` + absolute expiry, and every transition (steal, renew,
  * release) is a compare-and-swap against the exact value last read,
  * so of N racing stealers exactly one CAS succeeds; a holder whose
  * lease was stolen fails its own renew/release CAS and cannot touch
  * the new holder's claim — fencing for free. */
final class CasClaimQueue(store: CasStore, leaseTtlMillis: Long = 5 * 60 * 1000,
                          clock: () => Long = System.currentTimeMillis) extends ClaimQueue {

  private def value(owner: String): String = s"$owner ${clock() + leaseTtlMillis}"
  private def ownerOf(v: String): String = v.substring(0, v.lastIndexOf(' '))
  private def expiryOf(v: String): Long = v.substring(v.lastIndexOf(' ') + 1).toLong

  override def tryClaim(key: String, owner: String): Boolean =
    if (store.putIfAbsent(key, value(owner))) true
    else store.get(key) match {
      case Some(cur) if expiryOf(cur) < clock() =>
        // expired: CAS-steal against the exact stale value — one winner
        store.replaceIf(key, cur, value(owner))
      case Some(_) => false // live lease
      case None    => false // released just now; next sweep gets it
    }

  override def renew(key: String, owner: String): Unit =
    store.get(key) match {
      case Some(cur) if ownerOf(cur) == owner => store.replaceIf(key, cur, value(owner))
      case _ => () // stolen or released: never extend a lease we lost
    }

  override def renewIntervalMillis: Option[Long] = Some(math.max(1L, leaseTtlMillis / 3))

  override def release(key: String, owner: String): Unit = {
    // Retry while we still own the claim: the heartbeat is cancelled
    // before release, but cancel(false) lets one in-flight renew
    // finish CONCURRENTLY — if its CAS lands between our read and the
    // fenced delete, deleteIf sees a newer value and no-ops, orphaning
    // the claim until TTL (found by SeamSpec's S3 kill-steal receipt:
    // one leftover claim object after a clean drain). Only the owner
    // can renew, so a failed delete here means OUR renew moved the
    // value — re-read and delete that; anyone else's write changes the
    // owner and ends the loop.
    // Bounded: cancel(false) leaves at most ONE in-flight renew, so
    // one extra pass suffices in practice; the cap is defensive —
    // deleteIf's contract says false ⇔ value changed (errors throw),
    // but if a future backend breaks that, we log and fall back to
    // orphan-until-TTL (the steal sweep reaps it) instead of spinning.
    var attempts = 0
    var done = false
    while (!done && attempts < 8) {
      attempts += 1
      done = store.get(key) match {
        case Some(cur) if ownerOf(cur) == owner => store.deleteIf(key, cur)
        case _ => true // stolen or already gone: not ours to delete
      }
    }
    if (!done)
      System.err.println(s"[graft] release($key): still contended after " +
        s"$attempts attempts; leaving claim to expire at TTL")
  }
}
