package graft.engine

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

/** The storage verbs the manifest commit protocol rests on — extracted so
  * the protocol's correctness claim is explicit about WHAT it assumes of
  * the store, instead of quietly riding POSIX `ATOMIC_MOVE`:
  *
  *   - `writeAtomic` — publish an IMMUTABLE object (manifest, bloom
  *     sidecar). Names are single-writer by construction (attempt-unique),
  *     so even a plain object-store PUT satisfies this; the local impl
  *     uses temp-file + rename for crash cleanliness.
  *   - `putIfMatch` — conditional swap of the one MUTABLE pointer
  *     (`refs.json`): replace content iff the current content equals what
  *     the committer read (None = must not exist yet). This is S3/GCS
  *     conditional PUT (`If-Match` etag), a catalog compare-and-swap, or
  *     a Nessie commit — the ONLY primitive that must be atomic for two
  *     racing commits to produce one winner and one clean refusal.
  *
  * Everything else (reads, deletes) needs no atomicity: manifests are
  * immutable once named by a committed refs state, and orphan cleanup is
  * best-effort.
  */
trait FileIO {
  /** Full content, or None if absent. */
  def readBytes(path: Path): Option[Array[Byte]]

  /** Publish an immutable, attempt-uniquely-named object. */
  def writeAtomic(path: Path, bytes: Array[Byte]): Unit

  /** Conditional PUT: replace `path` with `bytes` iff its current content
    * equals `expected` (byte-for-byte; None = path must not exist).
    * Returns true iff this call installed `bytes`. */
  def putIfMatch(path: Path, expected: Option[Array[Byte]],
      bytes: Array[Byte]): Boolean

  /** Best-effort removal (orphan cleanup, GC). */
  def deleteIfExists(path: Path): Unit
}

/** Local-filesystem [[FileIO]]. `putIfMatch` takes an exclusive lock file
  * next to the target (JVM-level monitor for in-process racers — JDK file
  * locks throw rather than queue within one JVM — plus an OS `FileChannel`
  * lock for cross-process ones), then read-compare-swaps under it. That
  * makes the conditional PUT genuinely atomic on a local FS; an object
  * store provides the same verb natively, with no lock object at all. */
object LocalFileIO extends FileIO {
  private val monitors = new ConcurrentHashMap[String, Object]()

  override def readBytes(path: Path): Option[Array[Byte]] =
    if (!Files.exists(path)) None else Some(Files.readAllBytes(path))

  override def writeAtomic(path: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(
      path.getFileName.toString + "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, path,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def putIfMatch(path: Path, expected: Option[Array[Byte]],
      bytes: Array[Byte]): Boolean = {
    Files.createDirectories(path.getParent)
    val monitor = monitors.computeIfAbsent(
      path.toAbsolutePath.toString, _ => new Object)
    monitor.synchronized {
      val lockPath = path.resolveSibling("." + path.getFileName.toString + ".lock")
      val ch = FileChannel.open(lockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          val current = readBytes(path)
          val matches = (current, expected) match {
            case (None, None) => true
            case (Some(c), Some(e)) => java.util.Arrays.equals(c, e)
            case _ => false
          }
          if (matches) writeAtomic(path, bytes)
          matches
        } finally lock.release()
      } finally ch.close()
    }
  }

  override def deleteIfExists(path: Path): Unit = Files.deleteIfExists(path)
}

/** In-process object store with S3-style semantics — the closest local
  * stand-in for the store the reference mounts
  * (`compose.yaml:59-77` MinIO, `seed.sh:65` `s3://warehouse/demo/`):
  *
  *   - `putIfMatch` compares ETAGS, not bytes: the current object's etag
  *     against the etag of the expected content, where etag = content
  *     MD5 — exactly S3's etag for single-part PUTs, and exactly the
  *     `If-Match` conditional-write API (expected = None is
  *     `If-None-Match: *`, create-only). The compare-and-swap is
  *     linearized on the store's service side (a per-key monitor here;
  *     S3 does the same internally) — callers never hold a lock object,
  *     unlike [[LocalFileIO]]'s lock-file discipline.
  *   - `writeAtomic` is a plain object PUT — no temp+rename exists on an
  *     object store; safe because manifest names are attempt-unique and
  *     readers follow refs.
  *   - `visibilityLagMs > 0` emulates EVENTUAL read visibility
  *     (pre-2020 S3): for that window after a PUT, `readBytes` serves
  *     the PREVIOUS object state. The conditional PUT always judges the
  *     AUTHORITATIVE latest state — never the laggy read view — so
  *     staleness can only turn a would-be winner into a clean refusal
  *     (safety holds: one winner, no lost update); retry-loop LIVENESS
  *     is the store's read-your-writes property, which modern S3
  *     guarantees (strongly consistent since 2020) and lag 0 models.
  *
  * Objects are backed by the real filesystem so immutable manifests
  * written through this io stay readable by direct file GETs (the same
  * split a real deployment has between the refs pointer and bulk object
  * reads); the etag table and visibility window are the in-memory
  * "service" state, which also means pre-existing untracked files read
  * through transparently.
  */
final class ObjectStoreFileIO(visibilityLagMs: Long = 0L) extends FileIO {
  private final case class Ver(bytes: Array[Byte], etag: String,
      visibleAtNanos: Long, prev: Option[Array[Byte]])

  private val live = new ConcurrentHashMap[String, Ver]()
  private val monitors = new ConcurrentHashMap[String, Object]()

  private def key(p: Path): String = p.toAbsolutePath.toString
  private def monitor(p: Path): Object =
    monitors.computeIfAbsent(key(p), _ => new Object)

  /** S3 single-part etag: hex MD5 of the content. */
  def etag(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** The latest committed object state — what conditional writes judge
    * against, independent of read-visibility lag. */
  private def authoritative(p: Path): Option[Array[Byte]] =
    Option(live.get(key(p))).map(_.bytes)
      .orElse(if (Files.exists(p)) Some(Files.readAllBytes(p)) else None)

  override def readBytes(path: Path): Option[Array[Byte]] = {
    val v = live.get(key(path))
    if (v == null) {
      if (!Files.exists(path)) None else Some(Files.readAllBytes(path))
    } else if (System.nanoTime() < v.visibleAtNanos) v.prev
    else Some(v.bytes)
  }

  override def writeAtomic(path: Path, bytes: Array[Byte]): Unit =
    monitor(path).synchronized {
      val prev = authoritative(path)
      Files.createDirectories(path.getParent)
      Files.write(path, bytes)
      live.put(key(path), Ver(bytes, etag(bytes),
        System.nanoTime() + visibilityLagMs * 1000000L, prev))
    }

  override def putIfMatch(path: Path, expected: Option[Array[Byte]],
      bytes: Array[Byte]): Boolean =
    monitor(path).synchronized {
      val current = authoritative(path)
      val matches = (current, expected) match {
        case (None, None) => true
        case (Some(c), Some(e)) => etag(c) == etag(e)
        case _ => false
      }
      if (matches) writeAtomic(path, bytes)
      matches
    }

  override def deleteIfExists(path: Path): Unit =
    monitor(path).synchronized {
      live.remove(key(path))
      Files.deleteIfExists(path)
    }

  /** The object + its etag — the GET response shape a real store serves
    * (and [[ObjectStoreHttp]] forwards as the `ETag` header). Subject
    * to the same visibility lag as [[readBytes]]. */
  def getWithEtag(path: Path): Option[(Array[Byte], String)] =
    readBytes(path).map(b => (b, etag(b)))

  /** Etag-conditional PUT — the exact `If-Match` / `If-None-Match: *`
    * judgment S3 makes service-side, for callers (the HTTP front) that
    * hold only the ETAG of their expected state, not its bytes.
    * `expectedEtag = None` is create-only. Linearized on the same
    * per-key monitor as [[putIfMatch]], judged against AUTHORITATIVE
    * state (never the laggy read view). */
  def putIfEtagMatch(path: Path, expectedEtag: Option[String],
      bytes: Array[Byte]): Boolean =
    monitor(path).synchronized {
      val current = authoritative(path)
      val matches = (current, expectedEtag) match {
        case (None, None) => true
        case (Some(c), Some(e)) => etag(c) == e
        case _ => false
      }
      if (matches) writeAtomic(path, bytes)
      matches
    }
}
