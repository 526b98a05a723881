package graft.engine

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.annotation.JsonDeserialize
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Manifest-file snapshot metadata — the Iceberg-shaped storage model that
  * replaces round ≤4's POSIX-hardlink tag directories.
  *
  * Why manifests: the reference's storage is an object store (MinIO,
  * compose.yaml:59-77) where hardlinks do not exist and directory listing
  * is slow and eventually consistent. A snapshot here is therefore what it
  * is in Iceberg: a JSON **manifest** naming the immutable data files that
  * make up a table state, plus per-file statistics (row count, size,
  * per-column min/max bounds read once from the parquet footers). Tagged
  * reads resolve through the manifest — zero LISTs, zero data movement —
  * and a snapshot costs O(files) footer reads (distributed), never
  * O(bytes).
  *
  * Layout on disk (per table, under the warehouse):
  * {{{
  *   _graft_meta/<table>/
  *     refs.json          tags → snapshot seq, head pointer, next seq
  *     snap-<seq>.json    one manifest per commit (the commit log)
  *     data/c<uuid>/      data-file directories owned by commits
  * }}}
  *
  * Commit protocol: a manifest is written whole to a temp name and
  * atomically renamed; `refs.json` is swapped the same way. The refs swap
  * is the single point of atomicity — the local-FS stand-in for an object
  * store's conditional PUT / a catalog's compare-and-swap (Nessie commit,
  * Iceberg metadata pointer). Data files are immutable once a manifest
  * names them; reclamation happens only in [[Layout.expireSnapshots]]'s
  * GC, exactly Iceberg's `expire_snapshots` contract.
  */
object Manifests {

  /** One immutable data file + its manifest statistics. `lower`/`upper`
    * are per-column min/max as strings (the Iceberg manifest convention);
    * a column ABSENT from the maps has no usable stats — readers must
    * treat that as "cannot skip", never as a guess. `dataSeq` is the
    * Iceberg DATA SEQUENCE NUMBER: the commit seq at which the file's
    * rows entered the table (inherited across commits by path). It
    * scopes equality deletes — an equality-delete file at seq D erases
    * matching rows only from data files with dataSeq < D, which is what
    * lets an upsert's own inserted rows survive its own delete. Old
    * manifests deserialize it as 0 (every file predates every delete —
    * the conservative direction). */
  final case class FileEntry(path: String, records: Long, bytes: Long,
      lower: Map[String, String], upper: Map[String, String],
      dataSeq: Long = 0L)

  /** A committed table state. `parent` is the previous head (-1 for the
    * first commit) — the chain IS the commit log. `schemaJson` pins the
    * as-of-commit schema so time-travel reads never depend on live state.
    * `deletes` (Iceberg v2 merge-on-read) are POSITIONAL DELETE files:
    * parquet of (file_path, pos) rows that readers subtract from `files`
    * — written by [[Layout.deleteWhereMor]], empty for copy-on-write
    * commits. Read through [[Snapshot.deleteEntries]] only: manifests
    * written before this field existed deserialize it as null, and the
    * accessor is the single null boundary. `recordCount` stays the BASE
    * file count (Iceberg's total-records semantics: position deletes are
    * accounted separately, not subtracted — subtracting would require
    * dedup across delete files at commit time). */
  final case class Snapshot(seq: Long, parent: Long, operation: String,
      createdMs: Long, basePath: String, schemaJson: String,
      files: Seq[FileEntry], deletes: Seq[FileEntry] = Seq.empty,
      eqDeletes: Seq[FileEntry] = Seq.empty) {
    def deleteEntries: Seq[FileEntry] = Option(deletes).getOrElse(Seq.empty)
    /** Equality-delete files (Iceberg v2): parquet of key values, one
      * column named after the key; each erases matching rows from data
      * files with dataSeq < the delete's dataSeq. Null-safe accessor for
      * pre-field manifests, like [[deleteEntries]]. */
    def eqDeleteEntries: Seq[FileEntry] = Option(eqDeletes).getOrElse(Seq.empty)
    def recordCount: Long = files.map(_.records).sum
    def totalBytes: Long = files.map(_.bytes).sum
  }

  /** The mutable ref state: named tags → snapshot seq, plus the head of
    * the commit chain. Swapped via conditional PUT on every commit. (The
    * contentAs annotation is the jackson-scala requirement for
    * primitive-valued generic containers — without it map values
    * deserialize as Integer.)
    *
    * `snaps` maps committed seq (as a string key — JSON object keys) to
    * the manifest FILE NAME for that seq. Manifest names are
    * attempt-unique (uuid suffix), so a committer that loses the refs
    * race can never have overwritten the winner's manifest — the Iceberg
    * metadata-file-per-attempt discipline. Pre-field manifests (legacy
    * `snap-<seq>.json` names) deserialize `snaps` as null; resolution
    * falls back to the legacy name via [[snapName]]. */
  final case class Refs(head: Long, nextSeq: Long,
      @JsonDeserialize(contentAs = classOf[java.lang.Long])
      tags: Map[String, Long],
      snaps: Map[String, String] = Map.empty,
      @JsonDeserialize(contentAs = classOf[java.lang.Long])
      expired: Seq[Long] = Seq.empty) {
    def snapName(seq: Long): String =
      Option(snaps).flatMap(_.get(seq.toString)).getOrElse(f"snap-$seq%06d.json")
    def snapsOrEmpty: Map[String, String] = Option(snaps).getOrElse(Map.empty)
    /** Seqs retired by `expire_snapshots` retention: their manifests
      * survive as commit-log HISTORY, but time travel to them refuses
      * loudly — their unreferenced data files are GC'd, so a read would
      * otherwise fail three layers down on missing parquet. Null-safe
      * for pre-field refs files, like [[snapsOrEmpty]]. */
    def expiredOrEmpty: Set[Long] = Option(expired).map(_.toSet).getOrElse(Set.empty)
  }

  /** A commit lost the refs compare-and-swap: someone else committed
    * between this writer's refs read and its swap. The table state is
    * untouched by the loser; retry by re-running the whole commit (reload
    * refs, re-resolve seq). */
  final class ConcurrentCommitException(table: String, seq: Long)
    extends RuntimeException(
      s"concurrent commit on $table: seq $seq was taken between refs " +
        "read and swap; reload and retry")

  private val mapper: ObjectMapper =
    new ObjectMapper().registerModule(DefaultScalaModule)

  /** The storage backend for all manifest/refs I/O. Defaults to the local
    * FS; tests swap in degraded stores (non-atomic writes, conditional
    * PUT only) to prove the commit protocol needs nothing more than
    * [[FileIO.putIfMatch]]. */
  @volatile var io: FileIO = LocalFileIO

  /** Resolve the warehouse dir conf (plain path or file: URI) to a Path. */
  private def warehousePath(spark: SparkSession): Path = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    if (wh.startsWith("file:")) Paths.get(new java.net.URI(wh))
    else Paths.get(wh)
  }

  /** Per-table metadata root — keyed by NAME, not by table location, so
    * tagged reads survive even a DROP TABLE of the live table. */
  def root(spark: SparkSession, table: String): Path =
    warehousePath(spark).resolve("_graft_meta").resolve(table.replace('.', '_'))

  private def refsPath(root: Path) = root.resolve("refs.json")
  private def bloomPath(root: Path, seq: Long) = root.resolve(f"bloom-$seq%06d.json")

  /** Persist a bloom sidecar next to its manifest (same immutability:
    * written once when the snapshot commits, GC'd with it). Kept OUT of
    * the manifest proper so plain ref/commit-log reads never pay for
    * bitset payloads. */
  def saveBlooms(root: Path, seq: Long, sidecar: Blooms.Sidecar): Unit =
    writeJsonAtomic(bloomPath(root, seq), sidecar)

  /** The sidecar for a snapshot, if one was built — absent is normal
    * (blooms are opt-in per snapshot) and means "cannot bloom-skip". */
  def loadBlooms(root: Path, seq: Long): Option[Blooms.Sidecar] = {
    val p = bloomPath(root, seq)
    if (!Files.exists(p)) None
    else Some(mapper.readValue(Files.readAllBytes(p), classOf[Blooms.Sidecar]))
  }

  private def writeJsonAtomic(path: Path, value: AnyRef): Unit =
    io.writeAtomic(path, mapper.writeValueAsBytes(value))

  private def parseRefs(bytes: Option[Array[Byte]]): Refs =
    bytes.map(b => mapper.readValue(b, classOf[Refs]))
      .getOrElse(Refs(head = -1L, nextSeq = 0L, tags = Map.empty))

  def loadRefs(root: Path): Refs = parseRefs(io.readBytes(refsPath(root)))

  /** Read-modify-write of refs under compare-and-swap, retried on
    * contention — for pointer updates with no seq claim (tag expiry).
    * Commits do NOT retry here: a lost commit race must surface as
    * [[ConcurrentCommitException]] so the caller re-resolves its base
    * state, never silently re-applies on top of someone else's commit. */
  def updateRefs(root: Path)(f: Refs => Refs): Refs = {
    var attempts = 0
    while (attempts < 16) {
      val bytes = io.readBytes(refsPath(root))
      val next = f(parseRefs(bytes))
      if (io.putIfMatch(refsPath(root), bytes, mapper.writeValueAsBytes(next)))
        return next
      attempts += 1
    }
    throw new IllegalStateException(s"refs update contended 16x under $root")
  }

  def loadSnapshot(root: Path, seq: Long): Snapshot = {
    val p = root.resolve(loadRefs(root).snapName(seq))
    require(Files.exists(p), s"missing manifest snap-$seq under $root")
    mapper.readValue(Files.readAllBytes(p), classOf[Snapshot])
  }

  /** All committed manifests, oldest first — the commit log. Committed =
    * named by refs (`snaps` map) or legacy-pattern files; a losing
    * attempt's orphan manifest has a uuid name no refs state ever points
    * to, so it can never appear here. */
  def listSnapshots(root: Path): Seq[Snapshot] = {
    if (!Files.exists(root)) return Seq.empty
    val legacy = scala.util.Using.resource(Files.list(root)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("snap-\\d+\\.json")).toSeq
    }
    val named = loadRefs(root).snapsOrEmpty.values.toSeq
    (legacy ++ named).distinct.map(root.resolve)
      .filter(Files.exists(_))
      .map(p => mapper.readValue(Files.readAllBytes(p), classOf[Snapshot]))
      .sortBy(_.seq)
  }

  /** Commit a new snapshot. Protocol (the Iceberg pointer-swap shape):
    *
    *   1. read refs (remembering the exact bytes — the CAS expectation);
    *   2. write the manifest under an ATTEMPT-UNIQUE name (uuid suffix) —
    *      immutable, collision-free even against a racing committer that
    *      resolved the same seq;
    *   3. conditional-PUT refs (head advance + seq→name binding +
    *      optional tag in ONE swap) expecting the bytes from (1).
    *
    * A reader sees either the old refs or the fully committed new state;
    * a racing committer loses the swap, deletes its orphan manifest, and
    * gets [[ConcurrentCommitException]] — the winner's state is untouched
    * because the loser never wrote to any name the winner's refs mention.
    * Returns the committed seq. */
  def commit(spark: SparkSession, table: String, operation: String,
      basePath: String, schemaJson: String, files: Seq[FileEntry],
      tag: Option[String] = None,
      deletes: Seq[FileEntry] = Seq.empty,
      eqDeletes: Seq[FileEntry] = Seq.empty): Long = {
    val r = root(spark, table)
    val refsBytes = io.readBytes(refsPath(r))
    val refs = parseRefs(refsBytes)
    val seq = refs.nextSeq
    val name = f"snap-$seq%06d-${java.util.UUID.randomUUID().toString.take(8)}%s.json"
    writeJsonAtomic(r.resolve(name),
      Snapshot(seq, refs.head, operation, System.currentTimeMillis(),
        basePath, schemaJson, files, deletes, eqDeletes))
    val next = refs.copy(head = seq, nextSeq = seq + 1,
      tags = tag.fold(refs.tags)(t => refs.tags + (t -> seq)),
      snaps = refs.snapsOrEmpty + (seq.toString -> name))
    if (!io.putIfMatch(refsPath(r), refsBytes, mapper.writeValueAsBytes(next))) {
      io.deleteIfExists(r.resolve(name))
      throw new ConcurrentCommitException(table, seq)
    }
    seq
  }

  /** Data files under `dir` (skips `_SUCCESS`/checksum sidecars), with
    * sizes — the listing HALF of manifest creation; stats come from
    * [[collectStats]]. This is the only place the versioned path lists a
    * directory, and it runs at WRITE time — reads are list-free. */
  def listDataFiles(dir: Path): Seq[(String, Long)] =
    if (!Files.exists(dir)) Seq.empty
    else scala.util.Using.resource(Files.walk(dir)) { walk =>
      walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .map(p => (p.toString, Files.size(p)))
        .toList.sortBy(_._1)
    }

  /** Per-file manifest statistics in ONE footer pass: record count +
    * per-column min/max bounds ([[statsOf]] per file). Footers only —
    * column stats and block metadata, never data pages. Small file sets
    * read on the driver; a 100 k-file table costs 100 k footer reads
    * spread over the cluster (see the branch note below). */
  def collectStats(spark: SparkSession,
      files: Seq[(String, Long)]): Seq[FileEntry] = {
    if (files.isEmpty) return Seq.empty
    // Small commits read their footers ON THE DRIVER (r19): a footer is
    // O(KB) metadata, and the distributed pass costs a whole Spark job
    // (dataset + repartition exchange + collect = 2 stages) to read a
    // handful of them — pure job overhead on every MOR commit/snapshot
    // (the q231/q235 lifecycle ran 4-6 such jobs per entry). Production
    // commits with many files keep the distributed pass: 100 k footers
    // belong on the cluster, not the driver. Iceberg itself plans
    // manifests driver-side at exactly this scale boundary.
    val driverMax = sys.props.getOrElse("graft.stats.driver.files", "64").toInt
    if (files.size <= driverMax) {
      val conf = new Configuration()
      files.map { case (path, bytes) => statsOf(path, bytes, conf) }
        .sortBy(_.path)
    } else {
      import spark.implicits._
      val slices = math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism))
      spark.createDataset(files).repartition(slices)
        .mapPartitions { it =>
          val conf = new Configuration()
          it.map { case (path, bytes) => statsOf(path, bytes, conf) }
        }
        .collect().toSeq.sortBy(_.path)
    }
  }

  /** First field name of a parquet file's schema, read from the footer
    * ON THE DRIVER — no Spark job. The eq-delete key-column probe:
    * `spark.read.parquet(path).schema` submits a footer-inference job
    * per call per plan construction (measured: 48 such jobs inside one
    * q231 rep before this existed). */
  def firstFieldName(path: String): String = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(path), new Configuration()))
    try reader.getFooter.getFileMetaData.getSchema.getFields.get(0).getName
    finally reader.close()
  }

  /** One file's footer → manifest entry (record count + per-column
    * min/max bounds) — the shared kernel of both [[collectStats]] paths.
    *
    * Bounds discipline (the skipping-safety rule): a column's bounds are
    * recorded only if EVERY row-group chunk of that column carries usable
    * statistics — one stats-less chunk could hide values outside the
    * other chunks' range. All-null chunks do not widen bounds. */
  private def statsOf(path: String, bytes: Long,
      conf: Configuration): FileEntry = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(path), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val records = reader.getRecordCount
      val byCol = blocks.flatMap(_.getColumns.asScala)
        .groupBy(_.getPath.toDotString)
      val bounds = byCol.flatMap { case (name, chunks) =>
        val stats = chunks.map(_.getStatistics)
        // any chunk with absent/empty stats poisons the column
        if (stats.exists(s => s == null || s.isEmpty)) None
        else {
          val nonNull = stats.filter(_.hasNonNullValue)
          if (nonNull.isEmpty) None // all-null column: no bounds
          else {
            val merged = nonNull.reduce { (a, b) =>
              val c = a.copy(); c.mergeStatistics(b); c
            }
            Some(name -> (merged.minAsString, merged.maxAsString))
          }
        }
      }
      FileEntry(path, records, bytes,
        bounds.map { case (k, v) => k -> v._1 }.toMap,
        bounds.map { case (k, v) => k -> v._2 }.toMap)
    } finally reader.close()
  }
}
