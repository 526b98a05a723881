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
