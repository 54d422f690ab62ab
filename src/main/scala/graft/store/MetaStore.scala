package graft.store

import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.core.Json
import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import java.security.MessageDigest
import java.util.UUID

/** A tenant destination (reference `models.Destination`,
  * /root/reference/pkg/storage/database/gorm/gorm.go + destinations.go).
  * `dtype` is informational here — every destination is served by the
  * same Spark engine (the reference multiplexes duckdb/clickhouse/...).
  */
final case class Destination(id: Long, dtype: String, name: String)

/** A shared-query link (reference `models.SharedQuery`, gorm.go:93-129). */
final case class Share(uuid: String, db: String, query: String, expiresAtMillis: Long)

/** A dashboard user (reference `models.User` — email + auth provider +
  * the provider's raw userinfo payload; gorm.go:207-232). */
final case class User(id: Long, email: String, authType: String, authDetails: String)

/** Persistent control-plane metadata: destinations, hashed API keys and
  * shared-query links, stored as one JSON document with atomic
  * tmp-then-move rewrites — the single-node stand-in for the reference's
  * gorm metadata database (/root/reference/pkg/storage/database/gorm/).
  *
  * Durability contract the reference also provides and round 1 lacked:
  * share links and minted keys survive a server restart, and expired
  * shares are evicted (lazily on read plus `purgeExpiredShares`).
  *
  * Volume is control-plane-tiny (destinations x keys x live shares), so
  * one JSON file + full rewrite per mutation is the right durability/
  * complexity trade; the interface is what a SQL-backed impl would keep.
  */
final class MetaStore(rootDir: String, reservedIds: Set[Long] = Set.empty) {
  private val file = new File(rootDir, "metadata.json")
  // @volatile immutable snapshots: READS (every authenticated request
  // resolves a key; shares are read on every replay) take no lock at
  // all — they see the latest published snapshot. WRITERS serialize on
  // the monitor, mutate, and publish by reassigning the field; the
  // save() full-file rewrite therefore never blocks an auth read.
  @volatile private var destinations = Vector.empty[Destination]
  @volatile private var keys = Map.empty[String, String] // sha256(key) -> db id
  @volatile private var shares = Map.empty[String, Share]
  @volatile private var users = Vector.empty[User]
  load()

  def sha256(s: String): String = MetaStore.sha256(s)

  // -- destinations ---------------------------------------------------

  /** Ids never collide with `reservedIds` (statically-configured tenant
    * ids) — a dynamically created destination must not alias an existing
    * tenant's namespace. */
  def createDestination(dtype: String, name: String): Destination = synchronized {
    val id = (destinations.map(_.id) ++ reservedIds).maxOption.getOrElse(0L) + 1
    val d = Destination(id, dtype, name)
    destinations :+= d
    save()
    d
  }

  def listDestinations: Seq[Destination] = destinations // volatile snapshot, no lock

  def destinationExists(id: String): Boolean =
    destinations.exists(_.id.toString == id)

  /** Mint a new API key for a destination; returns the plaintext key,
    * which is shown once and stored only as a SHA-256 hash
    * (destinations.go:14-21, auth semantics of auth.go:60-72). */
  def addKey(destId: String): String = synchronized {
    val key = UUID.randomUUID().toString
    keys += (sha256(key) -> destId)
    save()
    key
  }

  /** Hot path (every authenticated request): a lock-free snapshot read,
    * deliberately NOT on the monitor that save()'s full JSON rewrite
    * holds. */
  def resolveKey(hashedKey: String): Option[String] = keys.get(hashedKey)

  // -- shares ---------------------------------------------------------

  def createShare(db: String, query: String, durationSeconds: Long): String = synchronized {
    val uuid = UUID.randomUUID().toString
    shares += (uuid -> Share(uuid, db, query, System.currentTimeMillis() + durationSeconds * 1000))
    save()
    uuid
  }

  /** Live share or None; expired entries are evicted on access. The
    * live/missing cases are lock-free snapshot reads; only an eviction
    * takes the writer monitor (re-checking under it). */
  def getShare(uuid: String): Option[Share] =
    shares.get(uuid) match {
      case Some(s) if s.expiresAtMillis > System.currentTimeMillis() => Some(s)
      case Some(_) =>
        synchronized { if (shares.contains(uuid)) { shares -= uuid; save() } }
        None
      case None => None
    }

  /** Drop all expired share links (the reference deletes them on a
    * sweep); returns how many were evicted. */
  def purgeExpiredShares(): Int = synchronized {
    val now = System.currentTimeMillis()
    val dead = shares.collect { case (u, s) if s.expiresAtMillis <= now => u }
    if (dead.nonEmpty) { shares --= dead; save() }
    dead.size
  }

  // -- users ------------------------------------------------------------

  /** First-or-create by (email, authType) — the reference's CreateUser
    * transaction (gorm.go:216-232, `FirstOrCreate`): a returning user
    * keeps their id and original details; a new login row persists the
    * provider's raw userinfo payload. */
  def createUser(email: String, authType: String, authDetails: String): User = synchronized {
    users.find(u => u.email == email && u.authType == authType).getOrElse {
      val u = User(users.map(_.id).maxOption.getOrElse(0L) + 1, email, authType, authDetails)
      users :+= u
      save()
      u
    }
  }

  /** User by id, or None (reference GetUser returns a zero-ID sentinel;
    * an Option is the honest Scala shape). Lock-free snapshot read —
    * this runs on every authenticated dashboard request. */
  def getUser(id: Long): Option[User] = users.find(_.id == id)

  // -- persistence ----------------------------------------------------

  private def load(): Unit = synchronized {
    if (!file.exists()) return
    Json.parse(Files.readString(file.toPath)).foreach { root =>
      if (root.has("destinations")) {
        root.get("destinations").forEach { n =>
          destinations :+= Destination(n.get("id").asLong,
            n.get("type").asText, n.get("name").asText)
        }
      }
      if (root.has("keys")) {
        root.get("keys").forEach { n =>
          keys += (n.get("hash").asText -> n.get("destination_id").asText)
        }
      }
      if (root.has("shares")) {
        root.get("shares").forEach { n =>
          val s = Share(n.get("uuid").asText, n.get("destination_id").asText,
            n.get("query").asText, n.get("expires_at").asLong)
          shares += (s.uuid -> s)
        }
      }
      if (root.has("users")) {
        root.get("users").forEach { n =>
          users :+= User(n.get("id").asLong, n.get("email").asText,
            n.get("auth_type").asText, n.get("auth_details").asText)
        }
      }
    }
  }

  private def save(): Unit = {
    val root = Json.mapper.createObjectNode()
    val ds = root.putArray("destinations")
    destinations.foreach { d =>
      val n = ds.addObject()
      n.put("id", d.id); n.put("type", d.dtype); n.put("name", d.name)
    }
    val ks = root.putArray("keys")
    keys.foreach { case (h, db) =>
      val n = ks.addObject()
      n.put("hash", h); n.put("destination_id", db)
    }
    val ss = root.putArray("shares")
    shares.values.foreach { s =>
      val n = ss.addObject()
      n.put("uuid", s.uuid); n.put("destination_id", s.db)
      n.put("query", s.query); n.put("expires_at", s.expiresAtMillis)
    }
    val us = root.putArray("users")
    users.foreach { u =>
      val n = us.addObject()
      n.put("id", u.id); n.put("email", u.email)
      n.put("auth_type", u.authType); n.put("auth_details", u.authDetails)
    }
    file.getParentFile.mkdirs()
    val tmp = new File(rootDir, "metadata.json.tmp")
    Files.writeString(tmp.toPath, Json.write(root))
    Files.move(tmp.toPath, file.toPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object MetaStore {
  def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
