package graft.engine

import java.util.Base64

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file Bloom filters in a manifest SIDECAR — equality-predicate file
  * skipping where min/max bounds cannot help.
  *
  * Bounds prune range queries on clustered columns; they are useless for
  * a point lookup on a high-cardinality key scattered across files (every
  * file's [min,max] spans the whole key space). Iceberg's answer is
  * parquet's built-in bloom filters, but those live INSIDE each data file
  * — a 100 k-file needle query still opens 100 k footers to consult them.
  * Keeping a compact per-file bloom in snapshot metadata moves that test
  * into the DRIVER's planning pass, next to the bounds check: the
  * executors receive only the handful of files whose blooms claim the
  * key. The sidecar is immutable alongside its manifest (keyed by
  * snapshot seq) and is advisory: a missing sidecar, an uncovered
  * column, or an unhashable literal all fail open to "keep the file".
  *
  * Filter shape: classic split-hash Bloom over Spark's own `xxhash64`
  * (seed 42) — the SQL-side hash is codegen'd in the build scan, and the
  * probe side recomputes the identical hash on the driver via the same
  * catalyst function, so build and probe cannot drift. k positions come
  * from double hashing (h1 + i·h2 over m bits, m a power of two).
  * ~9.6 bits/key at k=7 ≈ 1% false-positive rate; false positives cost
  * one extra file scanned, never a wrong row (the residual row filter
  * still applies — the pruning safety contract of [[Pruning]]).
  */
object Blooms {

  /** Sidecar payload: per data file, per column, a base64 bitset. */
  final case class Sidecar(numBits: Int, numHashes: Int, cols: Seq[String],
      files: Map[String, Map[String, String]])

  /** Bitset buffer aggregator: input is the row's xxhash64 (computed
    * codegen'd in SQL); the buffer is the packed bitset; merge is
    * word-wise OR — associative, commutative, partial-aggregatable, so
    * the build is one map-side-combined groupBy per file. */
  private final class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Byte]] {
    private val words = numBits / 64
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], h: Long): Array[Long] = { set(b, h); b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < words) { a(i) |= b(i); i += 1 }; a
    }
    def finish(b: Array[Long]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(words * 8)
      b.foreach(out.putLong); out.array()
    }
    private def set(bits: Array[Long], h: Long): Unit = {
      val h1 = (h >>> 32).toInt
      val h2 = (h.toInt) | 1 // odd step → full cycle over pow2 m
      var i = 0
      while (i < numHashes) {
        val pos = ((h1 + i * h2) & Int.MaxValue) % numBits
        bits(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Probe-side membership: does `bitsB64` possibly contain `hash`?
    * Must mirror [[BloomAgg.set]] exactly. */
  def mayContain(bitsB64: String, numBits: Int, numHashes: Int,
      hash: Long): Boolean = {
    val bytes = Base64.getDecoder.decode(bitsB64)
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var w = 0; while (w < words.length) { words(w) = buf.getLong(); w += 1 }
    val h1 = (hash >>> 32).toInt
    val h2 = (hash.toInt) | 1
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Int.MaxValue) % numBits
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Spark's xxhash64(value, seed=42) recomputed on the driver for a
    * probe literal, matching the SQL build side bit-for-bit. Only types
    * whose internal representation we can construct faithfully; None →
    * the caller must fail open. */
  def probeHash(value: Any, dt: DataType): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.unsafe.types.UTF8String
    val internal: Option[(Any, DataType)] = (value, dt) match {
      case (n: Long, LongType) => Some((n, LongType))
      case (n: Int, LongType) => Some((n.toLong, LongType))
      case (n: Int, IntegerType) => Some((n, IntegerType))
      case (s: String, StringType) => Some((UTF8String.fromString(s), StringType))
      case (d: java.sql.Date, DateType) =>
        Some((d.toLocalDate.toEpochDay.toInt, DateType))
      case _ => None
    }
    internal.map { case (v, t) => XxHash64Function.hash(v, t, 42L) }
  }

  /** Build the sidecar for a committed snapshot in ONE distributed pass:
    * a column-pruned scan of exactly the manifest's files reading
    * (`_metadata.file_path`, bloom columns), xxhash64 codegen'd per
    * column, one map-side-combined groupBy(file). Nulls are excluded —
    * equality probes never match null, so hashing them would only raise
    * the false-positive rate. Bits sized from the manifest's per-file
    * row counts (~9.6 bits/key, capped so a sidecar entry stays ≤ 128 KB
    * even for huge files — at the cap the filter degrades gracefully to
    * a higher fp rate, never to a wrong skip). */
  def build(spark: SparkSession, snap: Manifests.Snapshot,
      cols: Seq[String]): Sidecar = {
    require(cols.nonEmpty, "need at least one bloom column")
    val maxRecords = math.max(1L, snap.files.map(_.records).max)
    val numBits = math.min(1 << 20,
      java.lang.Long.highestOneBit(math.max(64L, maxRecords * 10L) * 2 - 1)).toInt
    val numHashes = 7
    val agg = udaf(new BloomAgg(numBits, numHashes))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val df: DataFrame = spark.read.schema(schema)
      .option("basePath", snap.basePath)
      .parquet(snap.files.map(_.path): _*)
      .select(col("_metadata.file_path").as("__file") +:
        cols.map(c => col(c)): _*)
    val aggCols = cols.map(c =>
      agg(when(col(c).isNotNull, xxhash64(col(c)))).as(s"__bloom_$c"))
    val rows = df.groupBy(col("__file"))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
    val b64 = Base64.getEncoder
    val files = rows.map { r =>
      // `_metadata.file_path` is a file: URI; manifest entries are plain
      // paths — key the sidecar in manifest form so lookups match
      val raw = r.getString(0)
      val path = if (raw.contains(":")) new java.net.URI(raw).getPath else raw
      val perCol = cols.zipWithIndex.flatMap { case (c, i) =>
        Option(r.get(i + 1)).map(b =>
          c -> b64.encodeToString(b.asInstanceOf[Array[Byte]]))
      }.toMap
      path -> perCol
    }.toMap
    Sidecar(numBits, numHashes, cols, files)
  }

  /** Can `file` possibly contain `value` in `colName`? Fail-open on any
    * missing piece: no sidecar entry for the file, column not covered,
    * unhashable literal. `when(isNotNull)` in the build means an
    * ALL-NULL file yields a null aggregate → no entry → kept; that file
    * cannot match an equality probe, but correctness only needs
    * may-read-extra, and the bounds check usually removes it anyway. */
  def fileMayContain(sidecar: Sidecar, filePath: String, colName: String,
      dt: DataType, value: Any): Boolean =
    sidecar.files.get(filePath).flatMap(_.get(colName)) match {
      case None => true
      case Some(bits) => probeHash(value, dt) match {
        case None => true
        case Some(h) => mayContain(bits, sidecar.numBits, sidecar.numHashes, h)
      }
    }
}
