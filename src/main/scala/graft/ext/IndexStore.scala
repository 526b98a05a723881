package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable ANN index storage — the missing half of build-once/search-many:
  * [[LshIndex]]/[[IvfIndex]]/[[Pq]] builds materialize into THIS process
  * (persisted DataFrames + a process-lifetime memo), but a production index
  * over 10⁹ vectors is built by one job and served by many — it must
  * survive the JVM. Each index kind serializes to a directory of plain
  * parquet tables plus a `meta.json` carrying the structural parameters
  * (the part of an index that is NOT a table: bits, tables, m, ksub…).
  *
  * Layout discipline mirrors what each search scans:
  *   - LSH signatures cluster by (table_id, bucket) — a search joins
  *     probe buckets against exactly these keys, so co-locating a
  *     bucket's rows keeps the join's build side dense (and at 100 TB the
  *     written table would be bucketed on the same key, making the
  *     search join shuffle-free on the index side).
  *   - IVF assignment clusters by centroid_id — a search reads the
  *     `nprobe` lists its probes select; clustering turns that into a
  *     contiguous-row-group read instead of a full-table sieve.
  *   - PQ codes write as-is: the design point of PQ is that search SCANS
  *     the whole code table (m bytes/vector), so there is no key to
  *     cluster by — only the small codebooks ride beside it.
  *
  * Initial writes are idempotent overwrites of a directory the caller
  * owns; APPENDS commit under the repo's own discipline (the
  * [[graft.engine.FileIO]] CAS verb): increments stage under
  * `inc/<token>/`, and a compare-and-swap of `meta.json` is the single
  * commit point — a torn append never loads, a retry never
  * double-appends, a racing writer is refused loudly
  * (IndexStoreAtomicitySpec kills each family between the steps). A
  * production deployment would publish the same way through the
  * snapshot-commit protocol ([[graft.engine.Manifests]]) — index
  * publication is just a table commit.
  */
object IndexStore {

  private val mapper = new ObjectMapper()

  private def metaJson(kvs: Seq[(String, Any)]): Array[Byte] = {
    val n = mapper.createObjectNode()
    kvs.foreach {
      case (k, v: Int)    => n.put(k, v)
      case (k, v: Long)   => n.put(k, v)
      case (k, v: Double) => n.put(k, v)
      case (k, v: String) => n.put(k, v)
      case (k, v: Seq[_]) =>
        val arr = n.putArray(k); v.foreach(x => arr.add(String.valueOf(x))); ()
      case (k, v)         => n.put(k, String.valueOf(v))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(n)
  }

  private def metaPath(dir: String) = Paths.get(dir, "meta.json")

  private def writeMeta(dir: String, kvs: (String, Any)*): Unit = {
    Files.createDirectories(Paths.get(dir))
    graft.engine.LocalFileIO.writeAtomic(metaPath(dir), metaJson(kvs))
  }

  private def readMeta(dir: String) =
    mapper.readTree(new String(
      Files.readAllBytes(metaPath(dir)), UTF_8))

  // ---- append commit discipline -------------------------------------
  //
  // Round-11 shipped the appends as direct SaveMode.Append writes into
  // the base tables plus a meta rewrite — three non-atomic steps whose
  // torn middle state LOADS (postings disagreeing with their (nDocs,
  // sumDl) scalars) instead of failing, and whose retry double-appends
  // (VERDICT r11 What's-wrong #2). The fix is the repo's own commit
  // discipline (engine/FileIO): an append STAGES its files under an
  // attempt-unique `inc/<token>/` directory — invisible to every load —
  // and then commits by compare-and-swapping `meta.json` from the exact
  // pre-append bytes to a state that lists the token in `incs`. The CAS
  // is the single commit point: a crash before it leaves the old bundle
  // fully readable (the orphaned stage is inert and GC-safe), a retry
  // stages a NEW token (no double-append), and a concurrent writer makes
  // the CAS refuse loudly instead of interleaving.

  private def newToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Committed increment tokens, oldest first ([] for pre-append-format
    * and freshly-written bundles). */
  private def incTokens(m: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    Option(m.get("incs"))
      .map(n => (0 until n.size).map(i => n.get(i).asText()).toSeq)
      .getOrElse(Seq.empty)

  /** Base directory for one sub-table: `<table>` for fresh bundles; a
    * compaction ([[compact]]/[[compactCc]]) swaps in a VERSIONED dir via
    * a `<table>Dir` meta pointer, so the corpus-sized rewrite commits
    * atomically through the meta CAS instead of overwriting the live
    * dir in place. */
  private def tableDirName(m: com.fasterxml.jackson.databind.JsonNode,
      table: String): String =
    Option(m.get(table + "Dir")).map(_.asText()).getOrElse(table)

  /** The live read set for one sub-table: base + every COMMITTED
    * increment. A committed token's directory must exist — a missing one
    * fails the read loudly (it would mean a corrupted bundle, which must
    * never be served silently). Legacy bundles (appends written straight
    * into the base directory, rounds ≤11) carry no `incs` and read
    * exactly as before. */
  private def livePaths(dir: String,
      m: com.fasterxml.jackson.databind.JsonNode, table: String): Seq[String] =
    s"$dir/${tableDirName(m, table)}" +: incTokens(m).map(t => s"$dir/inc/$t/$table")

  /** CAS-commit an append staged under `stage`: swap meta.json from the
    * exact bytes the append read (`expected`) to the new content. On
    * refusal the stage is deleted (best-effort) and the append fails
    * loudly — the bundle is untouched. */
  private def commitAppend(dir: String, stage: String,
      expected: Array[Byte], kvs: (String, Any)*): Unit = {
    val ok = graft.engine.LocalFileIO.putIfMatch(
      metaPath(dir), Some(expected), metaJson(kvs))
    if (!ok) {
      try {
        val sp = Paths.get(stage)
        if (Files.exists(sp))
          Files.walk(sp).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
      } catch { case _: Exception => () }
      throw new IllegalStateException(
        s"$dir: bundle changed under this append — commit refused, " +
          "staged increment discarded; reload and retry")
    }
  }

  private def metaBytes(dir: String): Array[Byte] =
    Files.readAllBytes(metaPath(dir))

  /** Every versioned-base pointer (`<table>Dir`) in a bundle's meta.
    * Appends re-emit their meta from scratch, so each one must CARRY
    * these through its commit — dropping a pointer would re-aim the
    * next load at a default dir the compaction already GC'd. */
  private def dirPointers(
      m: com.fasterxml.jackson.databind.JsonNode): Seq[(String, Any)] = {
    import scala.jdk.CollectionConverters._
    m.properties().asScala.toSeq.collect {
      case e if e.getKey.endsWith("Dir") => e.getKey -> (e.getValue.asText(): Any)
    }
  }

  /** A bundle's meta fields re-expressed as writer kvs, minus `incs`
    * and any `<table>Dir` pointers (the compaction rewrites both).
    * Numeric JSON types survive (readers use asInt/asLong/asDouble on
    * plain JSON numbers either way). */
  private def carriedKvs(
      m: com.fasterxml.jackson.databind.JsonNode): Seq[(String, Any)] = {
    import scala.jdk.CollectionConverters._
    m.properties().asScala.toSeq.collect {
      case e if e.getKey != "incs" && !e.getKey.endsWith("Dir") =>
        val v = e.getValue
        val a: Any =
          if (v.isIntegralNumber) v.asLong()
          else if (v.isFloatingPointNumber) v.asDouble()
          else if (v.isArray) (0 until v.size).map(i => v.get(i).asText())
          else v.asText()
        e.getKey -> a
    }
  }

  /** Recursive best-effort delete (post-commit GC only — never on a
    * path a live meta references). */
  private def deleteTree(p: java.nio.file.Path): Unit =
    try {
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { Files.deleteIfExists(q); () })
    } catch { case _: Exception => () }

  /** Token directories currently present under `inc/` — the compaction
    * GC's pre-CAS snapshot. */
  private def listStagedTokens(dir: String): Seq[String] =
    Option(Paths.get(dir, "inc").toFile.listFiles())
      .map(_.toSeq.filter(_.isDirectory).map(_.getName))
      .getOrElse(Seq.empty)

  /** GC exactly the token dirs that existed BEFORE the compaction's CAS
    * (`preStaged`, a [[listStagedTokens]] snapshot: the committed
    * increments being folded plus any dead orphans from crashed
    * appends) — per token, never the shared `inc/` root recursively: an
    * append racing past the compaction's commit stages under a fresh
    * `inc/<token>/`, and a recursive root delete would eat that stage
    * while its CAS still succeeds (meta unchanged since the compaction)
    * — committing a reference to missing files (round-12 advisor,
    * medium). The snapshot discriminates safely: a stage created before
    * the CAS belongs either to a folded increment or to a writer
    * holding pre-compaction meta bytes, whose own CAS is now doomed to
    * refuse (and self-clean); a stage created after the CAS is never in
    * the snapshot and never touched. The root itself is removed only by
    * a non-recursive delete that fails harmlessly if a concurrent
    * stager repopulated it. */
  private def gcIncrements(dir: String, preStaged: Seq[String]): Unit = {
    preStaged.foreach(t => deleteTree(Paths.get(dir, "inc", t)))
    try { Files.deleteIfExists(Paths.get(dir, "inc")); () }
    catch { case _: Exception => () }
  }

  private def requireKind(dir: String, kind: String) = {
    val m = readMeta(dir)
    require(m.path("kind").asText() == kind,
      s"$dir holds a '${m.path("kind").asText()}' index, expected '$kind'")
    m
  }

  /** k-row/driver-safe table → LocalRelation pin (the build-time
    * discipline, reapplied at load so search plans broadcast without
    * re-reading the file). */
  private def pinLocal(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  // ---- LSH ----------------------------------------------------------

  def writeLsh(index: LshIndex.Index, dir: String): Unit = {
    writeMeta(dir, "kind" -> "lsh", "tables" -> index.tables,
      "bits" -> index.bits, "dim" -> index.dim)
    index.buckets
      .repartition(col("table_id"), col("bucket"))
      .sortWithinPartitions("table_id", "bucket")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/buckets")
  }

  def loadLsh(spark: SparkSession, dir: String): LshIndex.Index = {
    val m = requireKind(dir, "lsh")
    LshIndex.Index(spark.read.parquet(livePaths(dir, m, "buckets"): _*),
      m.get("tables").asInt(), m.get("bits").asInt(), m.get("dim").asInt())
  }

  /** The data-table side of the LSH serving layout (BASELINE §q187's
    * "one level down" rule): vectors range-partitioned AND sorted on the
    * id key, so a candidate-id predicate pushed into the scan skips
    * row-groups by min/max stats — the fetch join reads O(candidates),
    * not O(corpus). At 100 TB this is the partition-pruned layout of
    * the data table itself (the q147 bucket-lookup move). */
  def writeLshVectors(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit =
    corpus.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")

  def loadLshVectors(spark: SparkSession, dir: String): DataFrame =
    if (!Files.exists(metaPath(dir))) spark.read.parquet(s"$dir/vectors")
    else spark.read.parquet(livePaths(dir, readMeta(dir), "vectors"): _*)

  /** Bucket-clustered LSH serving table ([[LshIndex.Bucketed]]): each
    * vector stored once per hash table BESIDE its (table_id, bucket)
    * key, clustered+sorted on that key — one probed bucket's whole
    * candidate set (signatures AND vectors) sits in one row-group run,
    * so a search is a single pruned scan with no second fetch join
    * (BASELINE §q187's "fetch dominates" lever). Storage: ×tables the
    * vector bytes — the explicit space/time trade; `tables` is small
    * (8) by the q30-family convention. */
  def writeLshBucketed(index: LshIndex.Index, corpus: DataFrame,
      idCol: String, vecCol: String, dir: String): Unit = {
    writeMeta(dir, "kind" -> "lshb", "tables" -> index.tables,
      "bits" -> index.bits, "dim" -> index.dim)
    index.buckets.join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("table_id"), col("bucket"), col(idCol), col(vecCol))
      .repartition(col("table_id"), col("bucket"))
      .sortWithinPartitions("table_id", "bucket", idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/rows")
  }

  def loadLshBucketed(spark: SparkSession, dir: String): LshIndex.Bucketed = {
    val m = requireKind(dir, "lshb")
    LshIndex.Bucketed(spark.read.parquet(livePaths(dir, m, "rows"): _*),
      m.get("tables").asInt(), m.get("bits").asInt(), m.get("dim").asInt())
  }

  /** INT8 variant of [[writeLshBucketed]] — the gsf100 cold-spread fix
    * (BASELINE §two-decade: the float bundle's ×tables vector copies are
    * ~4 GB at 2M vectors, 4× what the page cache needs to hold): the
    * bucket-clustered rows carry q170-gated [[Quantize.int8]] vectors +
    * per-vector scales (¼ the bytes in the hot probed row-groups), and
    * ONE float copy lands beside them as an id-sorted `vectors` table
    * that only the exact re-rank tail reads (O(shortlist) row-groups per
    * search — the [[writeLshVectors]] layout). Total bundle bytes:
    * tables·(dim + 8) + dim·4 per vector vs tables·dim·4 float — ~0.4×
    * at tables=8/dim=64. */
  def writeLshBucketedQ8(index: LshIndex.Index, corpus: DataFrame,
      idCol: String, vecCol: String, dir: String): Unit = {
    writeMeta(dir, "kind" -> "lshbq", "tables" -> index.tables,
      "bits" -> index.bits, "dim" -> index.dim)
    val q = Quantize.int8(
        corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__fv")),
        "__fv")
      .select(col(idCol), col("q8"), col("scale"))
    index.buckets.join(q, Seq(idCol))
      .select(col("table_id"), col("bucket"), col(idCol),
        col("q8"), col("scale"))
      .repartition(col("table_id"), col("bucket"))
      .sortWithinPartitions("table_id", "bucket", idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/rows")
    corpus.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")
  }

  def loadLshBucketedQ8(spark: SparkSession, dir: String): LshIndex.BucketedQ8 = {
    val m = requireKind(dir, "lshbq")
    LshIndex.BucketedQ8(
      spark.read.parquet(livePaths(dir, m, "rows"): _*),
      spark.read.parquet(livePaths(dir, m, "vectors"): _*),
      m.get("tables").asInt(), m.get("bits").asInt(), m.get("dim").asInt())
  }

  /** Append an increment to a bucketed bundle — the [[appendLsh]]
    * frozen-parameter move: hash the new vectors with the bundle's
    * fixed-seed hyperplanes (bit-identical to a rebuild's assignment)
    * and stage their (table_id, bucket, id, vec) rows as files that
    * are themselves bucket-clustered, so probed-bucket row-group
    * skipping keeps working over base + increments; the meta CAS is
    * the commit point (see the commit-discipline note above). */
  def appendLshBucketed(increment: DataFrame, idCol: String,
      vecCol: String, dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "lshb")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    Similarity.lshBuckets(increment.select(col(idCol), col(vecCol)),
        idCol, vecCol, m.get("tables").asInt(), m.get("bits").asInt(),
        m.get("dim").asInt())
      .join(increment.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("table_id"), col("bucket"), col(idCol), col(vecCol))
      .repartition(col("table_id"), col("bucket"))
      .sortWithinPartitions("table_id", "bucket", idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/rows")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "lshb",
      "tables" -> m.get("tables").asInt(), "bits" -> m.get("bits").asInt(),
      "dim" -> m.get("dim").asInt(), "incs" -> (incTokens(m) :+ token)) ++
      dirPointers(m)): _*)
  }

  /** [[appendLshBucketed]] for the INT8 bundle: the increment hashes with
    * the bundle's frozen hyperplane parameters and quantizes with the
    * same per-vector [[Quantize.int8]] rule (quantization is per-row, so
    * an append's q8 rows are bit-identical to a rebuild's), staging both
    * the bucket-clustered q8 rows AND the increment's float `vectors`
    * slice under one token — the meta CAS commits them together. */
  def appendLshBucketedQ8(increment: DataFrame, idCol: String,
      vecCol: String, dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "lshbq")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    val q = Quantize.int8(
        increment.select(col(idCol), col(vecCol).cast("array<double>").as("__fv")),
        "__fv")
      .select(col(idCol), col("q8"), col("scale"))
    Similarity.lshBuckets(increment.select(col(idCol), col(vecCol)),
        idCol, vecCol, m.get("tables").asInt(), m.get("bits").asInt(),
        m.get("dim").asInt())
      .join(q, Seq(idCol))
      .select(col("table_id"), col("bucket"), col(idCol),
        col("q8"), col("scale"))
      .repartition(col("table_id"), col("bucket"))
      .sortWithinPartitions("table_id", "bucket", idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/rows")
    increment.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/vectors")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "lshbq",
      "tables" -> m.get("tables").asInt(), "bits" -> m.get("bits").asInt(),
      "dim" -> m.get("dim").asInt(), "incs" -> (incTokens(m) :+ token)) ++
      dirPointers(m)): _*)
  }

  /** Append an increment to a stored LSH serving bundle — the D14/N14′
    * incremental move for the hash family, and the easiest of the three:
    * LSH signatures are DATA-INDEPENDENT (fixed-seed hyperplanes frozen
    * in the bundle's meta), so hashing only the increment and appending
    * its (id, table_id, bucket) rows yields BIT-IDENTICAL index content
    * to a from-scratch rebuild over the union — no graph to grow, no
    * statistics to refresh, one map-only pass over the new vectors.
    * The vectors side appends id-range-sorted files, so per-file min/max
    * stats keep the candidate-fetch row-group skipping of
    * [[writeLshVectors]] (increments are typically contiguous high ids —
    * their files prune perfectly). `bits` stays frozen at build time:
    * bucket occupancy therefore drifts upward as the corpus grows, which
    * degrades candidate-set size, never recall — re-bucketing cadence is
    * the operator's knob, exactly as in production vector stores.
    * The increment must carry the same id/vector column names the bundle
    * was built with. */
  def appendLsh(increment: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "lsh")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    Similarity.lshBuckets(increment.select(col(idCol), col(vecCol)),
        idCol, vecCol, m.get("tables").asInt(), m.get("bits").asInt(),
        m.get("dim").asInt())
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/buckets")
    increment.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/vectors")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "lsh",
      "tables" -> m.get("tables").asInt(), "bits" -> m.get("bits").asInt(),
      "dim" -> m.get("dim").asInt(), "incs" -> (incTokens(m) :+ token)) ++
      dirPointers(m)): _*)
  }

  // ---- BQ (1-bit binary quantization) --------------------------------

  /** Binary-quantized serving bundle ([[BqIndex]], N15): `sigs` — one
    * packed sign-bit row per vector (⌈dim/32⌉ BIGINT lanes, 16 bytes at
    * dim 64 — the 16×-smaller table the Hamming shortlist scans) — and
    * the float `vectors` side only the exact re-rank tail reads, both
    * id-range-clustered so shortlist-id predicates prune row-groups.
    * The bundle's ONLY parameter is `dim`: the signature is a pure
    * function of the vector (no planes, no centroids, no seed), which
    * is what makes the append below trivially rebuild-identical. */
  def writeBq(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, dir: String): Unit = {
    BqIndex.signatures(corpus, idCol, vecCol, dim)
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/sigs")
    corpus.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")
    // meta LAST — it is the bundle's existence marker (loads and
    // build-if-missing callers key on it), so a build killed mid-write
    // leaves no meta rather than a meta pointing at missing tables
    writeMeta(dir, "kind" -> "bq", "dim" -> dim)
  }

  def loadBq(spark: SparkSession, dir: String): BqIndex.Bundle = {
    val m = requireKind(dir, "bq")
    BqIndex.Bundle(
      spark.read.parquet(livePaths(dir, m, "sigs"): _*),
      spark.read.parquet(livePaths(dir, m, "vectors"): _*),
      m.get("dim").asInt())
  }

  /** Append an increment to a BQ bundle: sign-pack the new vectors
    * (parameter-free — bit-identical to a rebuild by definition, the
    * strongest append ≡ rebuild in the store) and stage id-sorted sig +
    * vector slices under one token; the meta CAS is the commit point.
    * Increments are typically contiguous high ids, so their files prune
    * perfectly under shortlist-id predicates. */
  def appendBq(increment: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "bq")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    BqIndex.signatures(increment, idCol, vecCol, m.get("dim").asInt())
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/sigs")
    increment.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/vectors")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "bq",
      "dim" -> m.get("dim").asInt(),
      "incs" -> (incTokens(m) :+ token)) ++ dirPointers(m)): _*)
  }

  /** IVF-routed BQ bundle ([[BqIndex.Routed]], N16 — the faiss IVF+BQ
    * composition): trained centroids (k rows, the frozen routing
    * parameters), packed signatures CLUSTERED by centroid_id so a
    * search's probed lists are row-group runs under the driver-known
    * `centroid_id IN (...)` predicate, and the float vectors id-sorted
    * for the re-rank tail. Sub-linear shortlist (IVF's routing) over
    * 16-byte rows (BQ's bytes): both decade levers in one layout. */
  def writeIvfBq(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nCentroids: Int, lloydIters: Int, dir: String): Unit = {
    val idx = IvfIndex.buildTrained(corpus, idCol, vecCol, nCentroids,
      lloydIters)
    idx.centroids.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    idx.assignment
      .join(BqIndex.signatures(corpus, idCol, vecCol, dim), Seq(idCol))
      .select(col("centroid_id"), col(idCol), col("sig"))
      .repartition(col("centroid_id"))
      .sortWithinPartitions("centroid_id", idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/rows")
    IvfIndex.drop(idx)
    corpus.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")
    // meta LAST — the existence marker (see writeBq)
    writeMeta(dir, "kind" -> "ivfbq", "dim" -> dim)
  }

  def loadIvfBq(spark: SparkSession, dir: String): BqIndex.Routed = {
    val m = requireKind(dir, "ivfbq")
    BqIndex.Routed(
      pinLocal(spark.read.parquet(s"$dir/centroids")),
      spark.read.parquet(livePaths(dir, m, "rows"): _*),
      spark.read.parquet(livePaths(dir, m, "vectors"): _*),
      m.get("dim").asInt())
  }

  /** Append to a routed BQ bundle: the [[appendIvf]] frozen-centroid
    * move (assignment is a pure per-row argmin against the STORED
    * centroids — append ≡ rebuild-with-same-centroids exactly) composed
    * with BQ's parameter-free packing; both staged centroid-clustered
    * under one token, the meta CAS commits them together. No retraining
    * — list-occupancy drift under distribution shift degrades balance,
    * never correctness, and re-clustering cadence is the operator's
    * knob (the [[appendIvf]] story verbatim). */
  def appendIvfBq(increment: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "ivfbq")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    val spark = increment.sparkSession
    val centroids = pinLocal(spark.read.parquet(s"$dir/centroids"))
    Similarity.ivfAssign(increment, idCol, vecCol, centroids)
      .join(BqIndex.signatures(increment, idCol, vecCol,
        m.get("dim").asInt()), Seq(idCol))
      .select(col("centroid_id"), col(idCol), col("sig"))
      .repartition(col("centroid_id"))
      .sortWithinPartitions("centroid_id", idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/rows")
    increment.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/vectors")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "ivfbq",
      "dim" -> m.get("dim").asInt(),
      "incs" -> (incTokens(m) :+ token)) ++ dirPointers(m)): _*)
  }

  // ---- perceptual image hashes (N17) --------------------------------

  /** Durable pHash near-dup bundle: the id-sorted hash table (the
    * verify side) plus a PRE-BANDED table clustered by (band, value) —
    * a probe's candidate buckets are contiguous row-group runs, the
    * [[writeLshBucketed]] layout transplanted to Hamming space. Hashing
    * is per-row pure (no trained state), so append ≡ rebuild is
    * bit-identical by construction, the [[writeBq]] class. */
  def writePhash(spark: SparkSession, media: DataFrame, dir: String,
      maxDist: Int, bands: Int): Unit = {
    require(maxDist < bands,
      s"banded recall guarantee needs maxDist < bands: $maxDist >= $bands")
    val h = ImageHash.hashes(spark, media).toDF().where(col("decode_ok"))
    h.select("media_id", "phash", "dhash")
      .repartitionByRange(col("media_id"))
      .sortWithinPartitions("media_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/hashes")
    phashBanded(spark, s"$dir/hashes" :: Nil, bands)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/bands")
    // meta LAST — the existence marker (see writeBq)
    writeMeta(dir, "kind" -> "phash", "maxDist" -> maxDist, "bands" -> bands)
  }

  private def phashBanded(spark: SparkSession, hashPaths: Seq[String],
      bands: Int): DataFrame =
    spark.read.parquet(hashPaths: _*)
      .select(col("media_id").as("corpus_id"),
        explode(ImageHash.bandCols(col("phash"), bands)).as("b"))
      .select(col("b.band").as("band"), col("b.value").as("value"),
        col("corpus_id"))
      .repartition(col("band"))
      .sortWithinPartitions("band", "value")

  def loadPhash(spark: SparkSession, dir: String): ImageHash.Bundle = {
    val m = requireKind(dir, "phash")
    ImageHash.Bundle(
      spark.read.parquet(livePaths(dir, m, "hashes"): _*),
      spark.read.parquet(livePaths(dir, m, "bands"): _*),
      m.get("maxDist").asInt(), m.get("bands").asInt())
  }

  /** Append new images: hash the increment (pure per-row — identical
    * to what a rebuild would compute) and stage hash + band slices
    * under one token; the meta CAS is the commit point. */
  def appendPhash(spark: SparkSession, increment: DataFrame,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "phash")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    val h = ImageHash.hashes(spark, increment).toDF().where(col("decode_ok"))
    h.select("media_id", "phash", "dhash")
      .repartitionByRange(col("media_id"))
      .sortWithinPartitions("media_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/hashes")
    phashBanded(spark, s"$stage/hashes" :: Nil, m.get("bands").asInt())
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/bands")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "phash",
      "maxDist" -> m.get("maxDist").asInt(),
      "bands" -> m.get("bands").asInt(),
      "incs" -> (incTokens(m) :+ token)) ++ dirPointers(m)): _*)
  }

  // ---- audio fingerprints (N18) --------------------------------------

  /** Durable audio-fingerprint bundle: ONE print table — (frame, bin,
    * corpus_id) clustered by (frame, bin) so a probe's candidate
    * buckets are row-group runs — plus the match floor in meta.
    * Fingerprinting is per-row pure (no trained state): append ≡
    * rebuild bit-identically by construction, the [[writePhash]]
    * class. */
  def writeAudioFp(spark: SparkSession, media: DataFrame, dir: String,
      minShared: Int): Unit = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    audioPrints(spark, media)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/prints")
    // meta LAST — the existence marker (see writeBq)
    writeMeta(dir, "kind" -> "audiofp", "minShared" -> minShared)
  }

  private def audioPrints(spark: SparkSession, media: DataFrame): DataFrame =
    AudioFingerprint.peaks(spark, media).toDF()
      .where(col("decode_ok"))
      .select(col("media_id").as("corpus_id"),
        posexplode(col("peaks")).as(Seq("frame", "bin")))
      .select(col("frame"), col("bin"), col("corpus_id"))
      .repartition(col("frame"))
      .sortWithinPartitions("frame", "bin")

  def loadAudioFp(spark: SparkSession, dir: String): AudioFingerprint.Bundle = {
    val m = requireKind(dir, "audiofp")
    AudioFingerprint.Bundle(
      spark.read.parquet(livePaths(dir, m, "prints"): _*),
      m.get("minShared").asInt())
  }

  def appendAudioFp(spark: SparkSession, increment: DataFrame,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "audiofp")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    audioPrints(spark, increment)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/prints")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "audiofp",
      "minShared" -> m.get("minShared").asInt(),
      "incs" -> (incTokens(m) :+ token)) ++ dirPointers(m)): _*)
  }

  // ---- video fingerprints (N19) ---------------------------------------

  /** Durable video-fingerprint bundle: ONE print table — (frame_index,
    * qluma, corpus_id) clustered by (frame_index, qluma) so a probe's
    * candidate buckets are row-group runs — plus the match floor in
    * meta. Fingerprinting is per-row pure (real MJPEG decode + the
    * shared luma quantizer, no trained state): append ≡ rebuild
    * bit-identically by construction, the [[writeAudioFp]] class. */
  def writeVideoFp(spark: SparkSession, media: DataFrame, dir: String,
      minShared: Int): Unit = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    videoPrints(spark, media)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/prints")
    // meta LAST — the existence marker (see writeBq)
    writeMeta(dir, "kind" -> "videofp", "minShared" -> minShared)
  }

  private def videoPrints(spark: SparkSession, media: DataFrame): DataFrame =
    Multimodal.videoFingerprint(spark, media)
      .select(col("frame_index"), col("qluma"),
        col("media_id").as("corpus_id"))
      .repartition(col("frame_index"))
      .sortWithinPartitions("frame_index", "qluma")

  def loadVideoFp(spark: SparkSession, dir: String): Multimodal.VideoBundle = {
    val m = requireKind(dir, "videofp")
    Multimodal.VideoBundle(
      spark.read.parquet(livePaths(dir, m, "prints"): _*),
      m.get("minShared").asInt())
  }

  def appendVideoFp(spark: SparkSession, increment: DataFrame,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "videofp")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    videoPrints(spark, increment)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/prints")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "videofp",
      "minShared" -> m.get("minShared").asInt(),
      "incs" -> (incTokens(m) :+ token)) ++ dirPointers(m)): _*)
  }

  // ---- IVF ----------------------------------------------------------

  def writeIvf(index: IvfIndex.Index, dir: String): Unit = {
    writeMeta(dir, "kind" -> "ivf")
    index.centroids.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    index.assignment
      .repartition(col("centroid_id"))
      .sortWithinPartitions("centroid_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/assignment")
  }

  def loadIvf(spark: SparkSession, dir: String): IvfIndex.Index = {
    val m = requireKind(dir, "ivf")
    IvfIndex.Index(pinLocal(spark.read.parquet(s"$dir/centroids")),
      spark.read.parquet(livePaths(dir, m, "assignment"): _*))
  }

  /** Append an increment to a stored IVF bundle — the [[appendLsh]]
    * frozen-parameter move for the coarse-quantizer family: the stored
    * CENTROIDS are frozen (they are the index's trained parameters, the
    * analogue of LSH's fixed-seed hyperplanes), the increment is assigned
    * to its nearest frozen centroid in one broadcast-join map pass, and
    * the new (id, centroid_id) rows append to the clustered assignment
    * table — each appended file is itself clustered/sorted by centroid_id,
    * so probe-list row-group skipping keeps working over base + increment.
    * Append ≡ assign-on-rebuild EXACTLY: a rebuild that reuses the same
    * centroids assigns every base row identically (assignment is a pure
    * per-row argmin), so the unioned table is bit-identical to rebuilding
    * the lists over base+increment with frozen centroids. What an append
    * does NOT do is retrain: as the corpus drifts from the build-time
    * distribution, list occupancy skews — which degrades candidate-list
    * balance, never correctness (the final re-rank is exact) — and
    * re-clustering cadence is the operator's knob, exactly the
    * [[appendLsh]] re-bucketing story. The increment must carry the same
    * id/vector column names the bundle was built with. */
  def appendIvf(increment: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "ivf")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    val spark = increment.sparkSession
    val centroids = pinLocal(spark.read.parquet(s"$dir/centroids"))
    Similarity.ivfAssign(increment, idCol, vecCol, centroids)
      .repartition(col("centroid_id"))
      .sortWithinPartitions("centroid_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/assignment")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "ivf",
      "incs" -> (incTokens(m) :+ token)) ++ dirPointers(m)): _*)
  }

  // ---- HNSW ---------------------------------------------------------

  /** Shard-parallel HNSW graph ([[Hnsw.build]] rows): clustered by
    * shard_id and sorted by (shard_id, id), so each serving task reads
    * exactly its shards' row-groups and the per-shard slot order (= id
    * order) is reproduced on load — the entry-point derivation and
    * therefore every search is identical across JVMs. */
  def writeHnsw(graph: DataFrame, params: Hnsw.Params, dir: String): Unit = {
    writeMeta(dir, "kind" -> "hnsw", "m" -> params.m,
      "efConstruction" -> params.efConstruction, "efSearch" -> params.efSearch)
    graph
      .repartition(col("shard_id"))
      .sortWithinPartitions("shard_id", "id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/graph")
  }

  def loadHnsw(spark: SparkSession, dir: String): (DataFrame, Hnsw.Params) = {
    val m = requireKind(dir, "hnsw")
    (spark.read.parquet(s"$dir/graph"),
      Hnsw.Params(m.get("m").asInt(), m.get("efConstruction").asInt(),
        m.get("efSearch").asInt()))
  }

  // ---- k-means clustering (SemDeDup) --------------------------------

  /** SemDeDup's k-means state ([[SemDedup.Clustering]]): centroids +
    * the corpus-sized assignment, clustered by centroid_id — the dedup
    * pair-join groups by exactly that key, so at 100 TB the written
    * table is bucketed on it and the pair stage's index side arrives
    * pre-grouped. */
  def writeKmeans(c: SemDedup.Clustering, dir: String): Unit = {
    writeMeta(dir, "kind" -> "kmeans", "idCol" -> c.idCol)
    c.centroids.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    c.assignment
      .repartition(col("centroid_id"))
      .sortWithinPartitions("centroid_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/assignment")
  }

  def loadKmeans(spark: SparkSession, dir: String): SemDedup.Clustering = {
    val m = requireKind(dir, "kmeans")
    SemDedup.Clustering(pinLocal(spark.read.parquet(s"$dir/centroids")),
      spark.read.parquet(s"$dir/assignment"), m.get("idCol").asText())
  }

  // ---- MinHash band index (incremental text dedup) ------------------

  /** [[MinHashIndex]]: band keys clustered by (band_id, band_key) — the
    * probe's equi-join keys — and shingle sets clustered by doc_id —
    * the exact-verify candidate fetch (both halves laid out as what a
    * probe scans, the LSH/IVF rule). */
  def writeMinhash(index: MinHashIndex.Index, dir: String): Unit = {
    writeMeta(dir, "kind" -> "minhash", "numHashes" -> index.numHashes,
      "numBands" -> index.numBands, "shingleK" -> index.shingleK)
    index.bands
      .repartition(col("band_id"), col("band_key"))
      .sortWithinPartitions("band_id", "band_key")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/bands")
    index.shingles
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/shingles")
  }

  def loadMinhash(spark: SparkSession, dir: String): MinHashIndex.Index = {
    val m = requireKind(dir, "minhash")
    MinHashIndex.Index(spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/shingles"),
      m.get("numHashes").asInt(), m.get("numBands").asInt(),
      m.get("shingleK").asInt())
  }

  /** Fingerprinted MinHash bundle ([[MinHashIndex.IndexFp]]): same
    * band-clustered bands; the verify side stores (doc_id, fp) — the
    * sorted 64-bit base-hash array of each doc's shingle set — instead
    * of the shingle strings. ~4–5× fewer verify-fetch bytes at k=5 word
    * shingles; the gsf100 probe_full lever (BASELINE §Round 14). */
  def writeMinhashFp(index: MinHashIndex.Index, dir: String): Unit = {
    writeMeta(dir, "kind" -> "minhashfp", "numHashes" -> index.numHashes,
      "numBands" -> index.numBands, "shingleK" -> index.shingleK)
    index.bands
      .repartition(col("band_id"), col("band_key"))
      .sortWithinPartitions("band_id", "band_key")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/bands")
    index.shingles
      .select(col("doc_id"), MinHashIndex.fpOf(col("sh")).as("fp"))
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/fps")
  }

  def loadMinhashFp(spark: SparkSession, dir: String): MinHashIndex.IndexFp = {
    val m = requireKind(dir, "minhashfp")
    MinHashIndex.IndexFp(spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/fps"),
      m.get("numHashes").asInt(), m.get("numBands").asInt(),
      m.get("shingleK").asInt())
  }

  // ---- BM25 inverted index ------------------------------------------

  /** [[InvertedIndex]]: postings clustered+sorted by term, so a query's
    * `term IN (...)` predicate row-group-skips to exactly the queried
    * terms; docFreq rides beside (vocabulary-sized); the two corpus
    * scalars live in meta. */
  def writeInverted(index: InvertedIndex.Index, dir: String): Unit = {
    writeMeta(dir, "kind" -> "inverted", "nDocs" -> index.nDocs,
      "avgdl" -> index.avgdl, "sumDl" -> index.sumDl)
    index.postings
      .repartition(col("term"))
      .sortWithinPartitions("term")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/postings")
    index.docFreq.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/docfreq")
  }

  /** The df read folds appended per-increment rows: after
    * [[appendInverted]] a term can hold one df row per increment, and
    * BM25's broadcast join needs ONE row per term — the sum IS the
    * union-corpus df (each document contributes to exactly one
    * increment's count). Vocabulary-sized aggregate, paid once per
    * load. */
  def loadInverted(spark: SparkSession, dir: String): InvertedIndex.Index = {
    val m = requireKind(dir, "inverted")
    val nDocs = m.get("nDocs").asLong()
    // pre-round-11 bundles carry no sumDl; avgdl was derived from the
    // exact integer total, so the rounded product recovers it — a clear
    // fallback instead of an NPE on a surviving old bundle
    val sumDl = Option(m.get("sumDl")).map(_.asLong()).getOrElse(
      math.round(m.get("avgdl").asDouble() * nDocs))
    InvertedIndex.Index(
      spark.read.parquet(livePaths(dir, m, "postings"): _*),
      spark.read.parquet(livePaths(dir, m, "docfreq"): _*)
        .groupBy(col("term")).agg(sum(col("df")).as("df")),
      nDocs, sumDl.toDouble / nDocs, sumDl)
  }

  /** Append NEW documents to a stored BM25 bundle — the first append
    * family whose MODEL STATE drifts with the corpus: unlike the
    * frozen-parameter ANN appends ([[appendLsh]]/[[appendIvf]]/
    * [[appendPq]], pure per-row maps against frozen parameters), BM25's
    * df table and corpus scalars (N, avgdl) are functions of the WHOLE
    * corpus, so an append must fold them under the MV1 counting
    * discipline: postings and per-increment df rows append (the load
    * re-aggregates df from the deltas — vocabulary-sized), and
    * (nDocs, sumDl) fold additively in meta, from which avgdl is
    * re-derived exactly. Append ≡ rebuild EXACTLY — postings are a row
    * union, df is a sum of disjoint-document counts, and the scalars
    * fold losslessly (see [[InvertedIndex.Index]] on sumDl) — so scores
    * through the reloaded bundle are bit-identical to a full rebuild
    * (InvertedIndexSpec pins it).
    *
    * Precondition (the counting algorithm's): the increment is NEW
    * documents — an id present in the base would double-count its df
    * contribution. Same contract as every append in the family. */
  def appendInverted(increment: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "inverted")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    val inc = InvertedIndex.build(increment, idCol, textCol)
    try {
      inc.postings
        .repartition(col("term"))
        .sortWithinPartitions("term")
        .write.mode(SaveMode.Overwrite).parquet(s"$stage/postings")
      inc.docFreq.coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$stage/docfreq")
      val nDocs = m.get("nDocs").asLong() + inc.nDocs
      val sumDl = m.get("sumDl").asLong() + inc.sumDl
      commitAppend(dir, stage, before, (Seq[(String, Any)](
        "kind" -> "inverted",
        "nDocs" -> nDocs, "avgdl" -> (sumDl.toDouble / nDocs),
        "sumDl" -> sumDl, "incs" -> (incTokens(m) :+ token)) ++
        dirPointers(m)): _*)
    } finally InvertedIndex.drop(inc)
  }

  /** Positional postings ([[InvertedIndex.buildPositional]]): clustered+
    * sorted by term like the tf postings, so a phrase query's
    * `term IN (...)` row-group-skips to the phrase's terms. */
  def writePositional(positional: DataFrame, dir: String): Unit = {
    writeMeta(dir, "kind" -> "positional")
    positional
      .repartition(col("term"))
      .sortWithinPartitions("term")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/postings")
  }

  def loadPositional(spark: SparkSession, dir: String): DataFrame = {
    val m = requireKind(dir, "positional")
    spark.read.parquet(livePaths(dir, m, "postings"): _*)
  }

  /** Append NEW documents' positional postings (R4′): the positional
    * index carries no model state at all — no df, no scalars — so the
    * append IS a clustered row append, and append ≡ rebuild is a plain
    * row-set union. Each staged file is itself clustered+sorted by
    * term, so phrase-query row-group skipping keeps working over
    * base + increments; the meta CAS is the commit point. */
  def appendPositional(increment: DataFrame, idCol: String,
      textCol: String, dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "positional")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    InvertedIndex.buildPositional(increment, idCol, textCol)
      .repartition(col("term"))
      .sortWithinPartitions("term")
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/postings")
    commitAppend(dir, stage, before, (Seq[(String, Any)](
      "kind" -> "positional",
      "incs" -> (incTokens(m) :+ token)) ++ dirPointers(m)): _*)
  }

  // ---- PQ -----------------------------------------------------------

  def writePq(index: Pq.Index, dir: String): Unit = {
    writeMeta(dir, "kind" -> "pq", "m" -> index.m, "ksub" -> index.ksub)
    index.codebooks.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/codebooks")
    index.codes.write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
  }

  def loadPq(spark: SparkSession, dir: String): Pq.Index = {
    val m = requireKind(dir, "pq")
    Pq.Index(pinLocal(spark.read.parquet(s"$dir/codebooks")),
      spark.read.parquet(livePaths(dir, m, "codes"): _*),
      m.get("m").asInt(), m.get("ksub").asInt())
  }

  /** Append an increment to a stored PQ bundle — frozen-parameter append
    * for the compressed-domain family: the stored CODEBOOKS are the
    * trained parameters and stay frozen, the increment is PQ-encoded
    * against them (one broadcast-join pass — [[Pq.encode]]), and the new
    * (id, codes) rows append to the code table. Append ≡
    * encode-on-rebuild EXACTLY: encoding is a pure per-row per-subspace
    * argmin against the codebooks, so a rebuild that reuses the same
    * codebooks emits bit-identical codes for every base row. Drift story
    * as [[appendIvf]]: quantization error grows as the corpus leaves the
    * training distribution — which widens ADC ranking noise (recall is
    * bought back by the exact float re-rank tail), never corrupts the
    * index; re-training cadence is the knob. The increment must carry
    * the same id/vector column names the bundle was built with. */
  def appendPq(increment: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "pq")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    val spark = increment.sparkSession
    val codebooks = pinLocal(spark.read.parquet(s"$dir/codebooks"))
    val mSub = m.get("m").asInt()
    val dim = Pq.dimOf(codebooks, mSub)
    Pq.encode(increment, idCol, vecCol, codebooks, mSub, dim)
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/codes")
    commitAppend(dir, stage, before, (Seq[(String, Any)]("kind" -> "pq",
      "m" -> mSub,
      "ksub" -> m.get("ksub").asInt(), "incs" -> (incTokens(m) :+ token)) ++
      dirPointers(m)): _*)
  }

  // ---- DSIR model ---------------------------------------------------

  /** DSIR's fitted bucket table ([[Dsir.Model]]): ≤B rows of
    * (__bkt, __rc, __tc, __lr) plus the totals/params the smoothing
    * default for unseen buckets reconstructs from — the model an
    * incremental crawl-scoring job broadcasts (the [[writeMinhash]]
    * increment discipline applied to selection). */
  def writeDsir(model: Dsir.Model, dir: String): Unit = {
    writeMeta(dir, "kind" -> "dsir", "buckets" -> model.buckets,
      "alpha" -> model.alpha, "rawN" -> model.rawN,
      "targetN" -> model.targetN)
    model.weights.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/weights")
  }

  def loadDsir(spark: SparkSession, dir: String): Dsir.Model = {
    val m = requireKind(dir, "dsir")
    Dsir.Model(pinLocal(spark.read.parquet(s"$dir/weights")),
      m.get("buckets").asInt(), m.get("alpha").asDouble(),
      m.get("rawN").asLong(), m.get("targetN").asLong())
  }

  // ---- Kneser–Ney LM ------------------------------------------------

  /** [[KneserNey.Model]]: the four Zipf-bounded count tables + vocab,
    * persisted so nightly increments score against a FROZEN LM (the
    * writeDsir serving discipline) — only the increment is ever
    * tokenized, and scores are comparable across increments because the
    * model never drifts with them. */
  def writeKnlm(model: KneserNey.Model, dir: String): Unit = {
    writeMeta(dir, "kind" -> "knlm", "discount" -> model.discount)
    model.lm.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/lm")
    model.ctx.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/ctx")
    model.cont.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/cont")
    model.tot.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/tot")
    model.vocab.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/vocab")
  }

  def loadKnlm(spark: SparkSession, dir: String): KneserNey.Model = {
    val m = requireKind(dir, "knlm")
    KneserNey.Model(
      spark.read.parquet(s"$dir/lm"),
      spark.read.parquet(s"$dir/ctx"),
      spark.read.parquet(s"$dir/cont"),
      pinLocal(spark.read.parquet(s"$dir/tot")),
      spark.read.parquet(s"$dir/vocab"),
      m.get("discount").asDouble())
  }

  // ---- logistic quality classifier ----------------------------------

  /** [[QualityClassifier.LogisticModel]]: the dense (B+ramps)-vector as
    * a (b, w) parquet table, bias + ramp cutoffs in meta. */
  def writeLogreg(model: QualityClassifier.LogisticModel, dir: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    writeMeta(dir, "kind" -> "logreg", "buckets" -> model.buckets,
      "bias" -> model.bias,
      "statRamps" -> model.statRamps.mkString(","))
    model.weights.toSeq.zipWithIndex.map { case (w, b) => (b.toLong, w) }
      .toDF("b", "w").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/weights")
  }

  // ---- softmax language-ID model ------------------------------------

  /** [[LangId.Model]]: the L·(B+1) weight matrix as a (l, b, w) parquet
    * table (b = −1 is the bias row, the logreg convention), label list +
    * bucket count in meta — the broadcastable model an incremental
    * crawl-labeling job loads (the [[writeLogreg]] serving discipline,
    * multiclass). */
  def writeLangid(model: LangId.Model, dir: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    writeMeta(dir, "kind" -> "langid", "buckets" -> model.buckets,
      "labels" -> model.labels) // JSON array: labels may contain any char
    LangId.weightRows(model).toDF("l", "b", "w").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/weights")
  }

  def loadLangid(spark: SparkSession, dir: String): LangId.Model = {
    val m = requireKind(dir, "langid")
    val ln = m.get("labels")
    val labels =
      if (ln.isArray) (0 until ln.size).map(i => ln.get(i).asText()).toSeq
      else ln.asText().split(",").toSeq // legacy comma-joined meta
    val buckets = m.get("buckets").asInt()
    val rows = spark.read.parquet(s"$dir/weights").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val w = Array.fill(labels.size)(Array.fill(buckets + 1)(0.0))
    rows.foreach { case (l, b, wv) => w(l)((b + 1L).toInt) = wv }
    LangId.Model(labels, buckets, w)
  }

  // ---- connected-component labeling (dedup clusters) ----------------

  /** A stored [[Clustering.connectedComponents]] labeling — the dedup
    * cluster table D6/P8 key on, maintained incrementally as MERGE-ON-READ:
    * the corpus-sized `labels/` table is written once (range-clustered on
    * node, so endpoint lookups prune row-groups) and NEVER rewritten by an
    * append. Each [[appendCcEdges]] batch appends only (a) labels for
    * genuinely new nodes and (b) slim (old label → merged root) FORWARDING
    * rows for the components the batch merged; [[loadCc]] resolves
    * forwarding chains (pointer-doubled over the forwarding table alone —
    * bounded by appends since the last compaction, never corpus-sized)
    * and applies them in ONE join. [[compactCc]] materializes — the same
    * base + delta + compact lifecycle as the MOR delete path
    * ([[graft.engine.Layout]]), applied to a graph labeling. */
  def writeCc(labels: DataFrame, dir: String): Unit = {
    writeMeta(dir, "kind" -> "cc")
    labels.select(col("node"), col("component"))
      .repartitionByRange(col("node"))
      .sortWithinPartitions("node")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/labels")
  }

  /** Base-labels directory name: "labels" for fresh bundles; compaction
    * ([[compactCc]]) swaps in a VERSIONED labels_<token> dir so the
    * corpus-sized rewrite commits atomically through the meta CAS
    * instead of overwriting the live dir in place ([[tableDirName]] —
    * the key is `labelsDir`, the generic pointer convention). */
  private def ccLabelsDirName(
      m: com.fasterxml.jackson.databind.JsonNode): String =
    tableDirName(m, "labels")

  /** The resolved current labeling: base labels with forwarding chains
    * collapsed. Resolution cost rides on the FORWARDING table (one row
    * per component merged since compaction): pointer-doubling runs there,
    * and the corpus-sized base crosses exactly one left join. */
  def loadCc(spark: SparkSession, dir: String): DataFrame = {
    val m = requireKind(dir, "cc")
    val labels = spark.read.parquet(
      (s"$dir/${ccLabelsDirName(m)}" +:
        incTokens(m).map(t => s"$dir/inc/$t/labels")): _*)
    // forwarding rows live in the committed increments (plus, for
    // legacy bundles, a base-level forward dir rounds ≤11 appended into)
    val fwdPaths = (s"$dir/forward" +:
        incTokens(m).map(t => s"$dir/inc/$t/forward"))
      .filter(p => Files.exists(Paths.get(p)))
    if (fwdPaths.isEmpty) labels
    else {
      var fwd = spark.read.parquet(fwdPaths: _*)
        .groupBy(col("lbl")).agg(min(col("root")).as("root"))
        .localCheckpoint(true)
      // collapse chains a→b, b→c (across appends) to a→c, b→c. Roots
      // strictly decrease along a chain (min-id merging), so no cycles;
      // doubling halves chain length per round.
      var iter = 0
      var converged = false
      while (!converged && iter < 25) {
        val next = fwd.alias("f")
          .join(fwd.select(col("lbl").as("__l2"), col("root").as("__r2")),
            col("f.root") === col("__l2"), "left")
          .select(col("f.lbl").as("lbl"),
            coalesce(col("__r2"), col("f.root")).as("root"),
            col("__r2").isNotNull.as("__hop"))
          .localCheckpoint(true)
        converged = next.where(col("__hop")).isEmpty
        fwd = next.select(col("lbl"), col("root"))
        iter += 1
      }
      require(converged, "cc forwarding chains not resolved after 25 rounds")
      labels.join(fwd, labels("component") === fwd("lbl"), "left")
        .select(col("node"),
          coalesce(col("root"), col("component")).as("component"))
    }
  }

  /** Fold an edge increment into the stored labeling — O(increment +
    * touched components), base never rewritten. The endpoint-label lookup
    * reads the node-clustered base with an id-set predicate (row-group
    * pruned); the contracted CC and all writes are increment-sized.
    * Append ≡ rebuild exactly ([[Clustering.appendEdges]]'s contraction
    * argument), spec-pinned through this store lifecycle. */
  def appendCcEdges(edges: DataFrame, srcCol: String, dstCol: String,
      dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "cc")
    val token = newToken()
    val stage = s"$dir/inc/$token"
    val spark = edges.sparkSession
    val current = loadCc(spark, dir)
    val inc = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val endpoints = inc.select(col("src").as("node"))
      .unionAll(inc.select(col("dst").as("node"))).distinct()
    val endpointLabels = endpoints
      .join(current, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("lbl"))
      .localCheckpoint(true)
    val contracted = inc
      .join(endpointLabels.withColumnRenamed("node", "src"), Seq("src"))
      .withColumnRenamed("lbl", "la")
      .join(endpointLabels.withColumnRenamed("node", "dst"), Seq("dst"))
      .withColumnRenamed("lbl", "lb")
      .where(col("la") =!= col("lb"))
      .select(col("la"), col("lb"))
    val mapping = Clustering.connectedComponents(contracted, "la", "lb")
      .where(col("node") =!= col("component"))
      .select(col("node").as("lbl"), col("component").as("root"))
      .localCheckpoint(true)
    // new nodes enter the base at their RESOLVED root (less forwarding
    // work at read); merged old labels become forwarding rows
    val newNodes = endpointLabels
      .join(current.select(col("node")), Seq("node"), "left_anti")
      .join(mapping, endpointLabels("lbl") === mapping("lbl"), "left")
      .select(col("node"),
        coalesce(col("root"), endpointLabels("lbl")).as("component"))
    newNodes.repartitionByRange(col("node")).sortWithinPartitions("node")
      .write.mode(SaveMode.Overwrite).parquet(s"$stage/labels")
    mapping.write.mode(SaveMode.Overwrite).parquet(s"$stage/forward")
    commitAppend(dir, stage, before, "kind" -> "cc",
      "labelsDir" -> ccLabelsDirName(m), // preserve a compaction's pointer
      "incs" -> (incTokens(m) :+ token))
  }

  /** Materialize the resolved labeling and drop the forwarding pile —
    * the compaction half of the MOR lifecycle. The rewrite lands in a
    * NEW versioned labels dir and commits through the meta CAS (a crash
    * mid-compaction leaves the old labels + increments fully live); the
    * old dir, the pre-compaction increments (PER TOKEN — see
    * [[gcIncrements]] on why never the shared `inc/` root), and any
    * legacy forward pile are GC'd best-effort after the commit. */
  def compactCc(spark: SparkSession, dir: String): Unit = {
    val before = metaBytes(dir)
    val m = requireKind(dir, "cc")
    val resolved = loadCc(spark, dir).localCheckpoint(true)
    val newLabels = s"labels_${newToken()}"
    resolved.select(col("node"), col("component"))
      .repartitionByRange(col("node"))
      .sortWithinPartitions("node")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$newLabels")
    val preStaged = listStagedTokens(dir) // pre-CAS snapshot (see gcIncrements)
    commitAppend(dir, s"$dir/$newLabels", before,
      "kind" -> "cc", "labelsDir" -> newLabels)
    deleteTree(Paths.get(dir, ccLabelsDirName(m)))
    deleteTree(Paths.get(dir, "forward"))
    gcIncrements(dir, preStaged)
  }

  // ---- generic bundle compaction -------------------------------------

  /** Per-family rewrite layouts for [[compact]]: each live table's
    * union re-clusters exactly as its `write*` laid the base out, so
    * the probed-key row-group skipping every serving path relies on is
    * RESTORED over one file set. `None` sort = write as-is (PQ codes —
    * search scans the whole table by design). */
  private val compactLayouts: Map[String, Seq[(String, DataFrame => DataFrame)]] = {
    def cluster(cols: Seq[String], sortCols: Seq[String]): DataFrame => DataFrame =
      df => df.repartition(cols.map(col): _*)
        .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    Map(
      "lsh" -> Seq(
        "buckets" -> cluster(Seq("table_id", "bucket"), Seq("table_id", "bucket")),
        "vectors" -> (df => df.repartitionByRange(col(df.columns.head))
          .sortWithinPartitions(df.columns.head))),
      "lshb" -> Seq(
        "rows" -> (df => df.repartition(col("table_id"), col("bucket"))
          .sortWithinPartitions("table_id", "bucket", df.columns(2)))),
      "lshbq" -> Seq(
        "rows" -> (df => df.repartition(col("table_id"), col("bucket"))
          .sortWithinPartitions("table_id", "bucket", df.columns(2))),
        "vectors" -> (df => df.repartitionByRange(col(df.columns.head))
          .sortWithinPartitions(df.columns.head))),
      "bq" -> Seq(
        "sigs" -> (df => df.repartitionByRange(col(df.columns.head))
          .sortWithinPartitions(df.columns.head)),
        "vectors" -> (df => df.repartitionByRange(col(df.columns.head))
          .sortWithinPartitions(df.columns.head))),
      "ivf" -> Seq(
        "assignment" -> cluster(Seq("centroid_id"), Seq("centroid_id"))),
      "phash" -> Seq(
        "hashes" -> (df => df.repartitionByRange(col("media_id"))
          .sortWithinPartitions("media_id")),
        "bands" -> (df => df.repartition(col("band"))
          .sortWithinPartitions("band", "value"))),
      "audiofp" -> Seq(
        "prints" -> (df => df.repartition(col("frame"))
          .sortWithinPartitions("frame", "bin"))),
      "videofp" -> Seq(
        "prints" -> (df => df.repartition(col("frame_index"))
          .sortWithinPartitions("frame_index", "qluma"))),
      "ivfbq" -> Seq(
        "rows" -> (df => df.repartition(col("centroid_id"))
          .sortWithinPartitions("centroid_id", df.columns(1))),
        "vectors" -> (df => df.repartitionByRange(col(df.columns.head))
          .sortWithinPartitions(df.columns.head))),
      "inverted" -> Seq(
        "postings" -> cluster(Seq("term"), Seq("term")),
        // fold the per-increment df rows to one row per term — the
        // vocabulary-sized aggregate loadInverted otherwise re-pays on
        // every load (it stays in the load for un-compacted bundles)
        "docfreq" -> (df => df.groupBy(col("term"))
          .agg(sum(col("df")).as("df")).coalesce(1))),
      "positional" -> Seq(
        "postings" -> cluster(Seq("term"), Seq("term"))),
      "pq" -> Seq(
        "codes" -> (df => df)))
  }

  /** Fold a bundle's `inc/<token>/` chain back into ONE re-clustered
    * base — the [[graft.engine.Layout]] compact discipline applied to
    * the index-store surface (VERDICT r12 What's-wrong #2: every
    * nightly append adds an increment directory; the union read and
    * `meta.incs` grow without bound, and probed-key pruning degrades
    * across many small per-increment row-groups). For each family
    * table, base + increments rewrite into a fresh VERSIONED dir
    * (`compact_<token>/<table>`), and ONE meta CAS swaps the bundle's
    * base pointers while resetting `incs` — load-before ≡ load-after
    * row-for-row (the live set is the same rows, re-clustered), a crash
    * mid-compaction leaves the old base + increments fully live (the
    * stage is unreferenced until the swap), and a concurrent append's
    * CAS defeat is mutual: whichever commits second is refused loudly.
    * Post-commit GC removes the old base dirs and exactly the
    * pre-compaction increment tokens ([[gcIncrements]]). `cc` bundles
    * route to [[compactCc]] (their base is merge-on-read, not a plain
    * union). A bundle with no increments is a no-op. */
  def compact(spark: SparkSession, dir: String): Unit = {
    // Bytes FIRST, then parse those same bytes — the fail-safe read
    // order every append (and compactCc) already uses. Parsing a fresh
    // read after grabbing the CAS-expected bytes would let an append
    // committing between the two reads vanish silently: the rewrite
    // folds a stale inc list, the CAS still succeeds against the newer
    // bytes, and gcIncrements deletes the committed increment's data.
    val before = metaBytes(dir)
    val m = mapper.readTree(new String(before, UTF_8))
    val kind = m.path("kind").asText()
    if (kind == "cc") return compactCc(spark, dir)
    val toks = incTokens(m)
    if (toks.isEmpty) return // nothing staged — compaction is idempotent
    val layout = compactLayouts.getOrElse(kind,
      throw new IllegalArgumentException(
        s"$dir: kind '$kind' carries increments but has no compaction " +
          "layout — refuse rather than guess a clustering"))
    val token = newToken()
    val stage = s"compact_$token"
    val written = layout.flatMap { case (table, recluster) =>
      // a family table may be absent (an lsh bundle written without its
      // vectors side): skip it, and leave no pointer for it either
      val paths = livePaths(dir, m, table)
        .filter(p => Files.exists(Paths.get(p)))
      if (paths.isEmpty) None
      else {
        recluster(spark.read.parquet(paths: _*))
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/$stage/$table")
        Some(table)
      }
    }
    val preStaged = listStagedTokens(dir) // pre-CAS snapshot (see gcIncrements)
    commitAppend(dir, s"$dir/$stage", before,
      (carriedKvs(m) ++
        written.map(t => (t + "Dir") -> (s"$stage/$t": Any))): _*)
    // GC: the old base dirs' top-level segments + the folded increments
    written.map(t => tableDirName(m, t).split('/').head).distinct
      .foreach(seg => deleteTree(Paths.get(dir, seg)))
    gcIncrements(dir, preStaged)
  }

  def loadLogreg(spark: SparkSession, dir: String): QualityClassifier.LogisticModel = {
    val m = requireKind(dir, "logreg")
    val w = spark.read.parquet(s"$dir/weights").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    val ramps = m.get("statRamps").asText() match {
      case "" => Nil
      case s  => s.split(",").toSeq.map(_.toDouble)
    }
    QualityClassifier.LogisticModel(m.get("buckets").asInt(), ramps,
      m.get("bias").asDouble(), w)
  }
}
