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
  */
trait ClaimQueue {
  /** Exclusively claim `key`; false if another live worker holds it. */
  def tryClaim(key: String, owner: String): Boolean

  /** Release a claim (after success OR failure — failure releases so
    * the retry sweep can re-claim immediately instead of waiting out
    * the lease). */
  def release(key: String): Unit
}

/** In-process claims only — the single-node default, equivalent to the
  * Uploader's original in-flight key set. */
final class LocalClaimQueue extends ClaimQueue {
  private val held = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  override def tryClaim(key: String, owner: String): Boolean = held.add(key)
  override def release(key: String): Unit = held.remove(key)
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
  *  - [[renew]] lets a long-running batch bump its marker's mtime.
  *
  * An object-store deployment swaps this for an SQS-style impl of the
  * same two-method trait (S3 lacks atomic create-if-absent); the
  * Uploader doesn't care. */
final class FileLeaseQueue(dir: String, leaseTtlMillis: Long = 5 * 60 * 1000) extends ClaimQueue {
  private val root: Path = new File(dir).toPath

  private def marker(key: String): Path = {
    val safe = key.map(c => if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '~')
    root.resolve(s"$safe.claim")
  }

  override def tryClaim(key: String, owner: String): Boolean = {
    val f = marker(key)
    Files.createDirectories(root)
    try {
      Files.write(f, owner.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: FileAlreadyExistsException =>
        val expired =
          try System.currentTimeMillis() - Files.getLastModifiedTime(f).toMillis > leaseTtlMillis
          catch { case _: NoSuchFileException => false } // released just now; next sweep gets it
        if (!expired) false
        else {
          val steal = root.resolve(f.getFileName.toString + ".stale-" + java.util.UUID.randomUUID())
          try {
            Files.move(f, steal, StandardCopyOption.ATOMIC_MOVE) // exactly one stealer wins
            Files.deleteIfExists(steal)
            tryClaim(key, owner)
          } catch {
            case _: NoSuchFileException => false // another worker stole or released it first
          }
        }
    }
  }

  /** Bump the lease mtime mid-batch so a slow (but alive) ingest isn't
    * stolen from. */
  def renew(key: String): Unit =
    try Files.setLastModifiedTime(marker(key),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: NoSuchFileException => }

  override def release(key: String): Unit = Files.deleteIfExists(marker(key))
}
