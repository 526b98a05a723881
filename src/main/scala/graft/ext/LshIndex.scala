package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions

/** Build-once / search-many LSH index — the missing amortization for the
  * q30 family: [[Similarity.lshTopK]] hashes EVERY corpus vector inside
  * every query (tables × bits hyperplane dots each), which the round-6
  * sf1 checkpoint measured as the dominant, linear term (exponent 0.98)
  * once auto-bits flattened the candidate stage. Signatures are index
  * state, not query work: build them once (one corpus pass, persisted —
  * the 100 TB analogue is a written table bucketed by (table_id,
  * bucket)), and a search touches probe-count signature rows plus the
  * bucket-mates they select — steady-state exponents in the q78_search /
  * q175 band (measured 0.2–0.35), not 1.0.
  *
  * Same recall surface as [[Similarity.lshTopK]]: identical hyperplanes
  * (fixed seed), identical bucket semantics, exact cosine re-rank — the
  * q30 recall contract carries over unchanged.
  */
object LshIndex {

  /** Prebuilt signatures: (id, table_id, bucket), persisted + counted. */
  final case class Index(buckets: DataFrame, tables: Int, bits: Int, dim: Int)

  /** Hash the corpus once. `bits = -1` auto-sizes occupancy-constant
    * buckets ([[Similarity.autoBits]] — footer stats, no count() job);
    * pass `n` when the row count is already known from manifest stats. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      tables: Int = 8, bits: Int = -1, dim: Int = 64,
      n: Long = -1L): Index = {
    val useBits = Similarity.autoBits(corpus, bits, n)
    val buckets = Similarity.lshBuckets(corpus, idCol, vecCol, tables, useBits, dim)
      .persist(StorageLevel.MEMORY_AND_DISK)
    buckets.count() // pay the corpus pass HERE, never inside a search
    Index(buckets, tables, useBits, dim)
  }

  /** Probe-side search: hash the probes (probe-count rows), join their
    * buckets against the prebuilt signatures, exact-cosine re-rank of
    * the bucket-mates. Output: (probeIdCol, idCol, cos_sim). */
  def search(index: Index, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    val pb = Similarity.lshBuckets(
      probes.select(col(probeIdCol).as("pid"), col(probeVecCol).as("pv")),
      "pid", "pv", index.tables, index.bits, index.dim)
    val candidates = index.buckets.join(broadcast(pb), Seq("table_id", "bucket"))
      .select(col("pid"), col(idCol)).distinct()
    val rescored = candidates
      .join(broadcast(probes.select(col(probeIdCol).as("pid"),
        col(probeVecCol).as("pv"))), Seq("pid"))
      .join(corpus, Seq(idCol))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** [[search]] with the probe buckets PUSHED INTO the index scan — the
    * stored-index (IndexStore) serving path. `search`'s broadcast join
    * filters bucket-mates during the scan, but the scan itself still
    * READS the whole signature table; on a parquet-backed index that is
    * the entire remaining linear term (the 0.63–0.66 second-decade
    * exponents of the steady-state searches in BASELINE §sf10). The
    * probe bucket set is tiny and known up front (probes × tables keys —
    * the probe side is small by contract), so it becomes a literal
    * per-table `bucket IN (...)` predicate that reaches the parquet
    * reader as a pushed filter; [[IndexStore.writeLsh]] clusters and
    * sorts the stored table by (table_id, bucket), so row-group min/max
    * stats skip everything outside the probed buckets — the scan reads
    * O(selected buckets), not O(N). (At 100 TB the same layout serves
    * partition-level pruning; this is the row-group form of it.)
    *
    * The driver-side `collect` of probe buckets is the bounded
    * metadata-class read (probes × tables rows); results are identical
    * to [[search]] — the predicate selects a superset of the join keys,
    * and the same join then applies exactly. */
  def searchPruned(index: Index, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    // probe-count rows: cheap to recompute, no persist needed (a persist
    // here would accumulate cache entries across serving calls)
    val pb = Similarity.lshBuckets(
      probes.select(col(probeIdCol).as("pid"), col(probeVecCol).as("pv")),
      "pid", "pv", index.tables, index.bits, index.dim)
    // bounded: probes × tables (table_id, bucket) keys
    val probed = pb.select(col("table_id"), col("bucket")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val prune = probed.toSeq.sortBy(_._1).map { case (t, bs) =>
      col("table_id") === t && col("bucket").isin(bs: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val candidates = index.buckets.where(prune)
      .join(broadcast(pb), Seq("table_id", "bucket"))
      .select(col("pid"), col(idCol)).distinct()
    val rescored = candidates
      .join(broadcast(probes.select(col(probeIdCol).as("pid"),
        col(probeVecCol).as("pv"))), Seq("pid"))
      .join(corpus, Seq(idCol))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** [[searchPruned]] with the CANDIDATE-VECTOR FETCH also pruned — the
    * last linear term of the stored-index serving path. BASELINE §q187's
    * sf10 reading: once the signature scan is row-group-skipped, what
    * remains is the exact re-rank's equi-join pulling each candidate's
    * vector out of the corpus-sized embeddings table — a full corpus
    * scan per search. Fix, one level down the same discipline: the
    * vectors live in a STORED table range-partitioned and sorted on the
    * id key ([[IndexStore.writeLshVectors]]), the bounded candidate set
    * (probes × tables × occupancy-constant bucket size — the same
    * contract that bounds the probe-bucket collect) becomes an
    * `id IN (...)` predicate pushed into that scan, and row-group
    * min/max stats on the sorted id column skip everything but the
    * row-groups holding candidates. The fetch reads O(candidates), not
    * O(N); at 100 TB the same layout serves partition-level pruning.
    *
    * Results are identical to [[search]]/[[searchPruned]]: the id
    * predicate selects exactly the candidate rows the join would keep,
    * and both candidate list and probe table are broadcast, so the only
    * exchange left is the per-probe top-k window. */
  def searchStored(index: Index, vectors: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, maxCandidates: Int = 1 << 20): DataFrame = {
    val spark = vectors.sparkSession
    val pb = Similarity.lshBuckets(
      probes.select(col(probeIdCol).as("pid"), col(probeVecCol).as("pv")),
      "pid", "pv", index.tables, index.bits, index.dim)
    val probed = pb.select(col("table_id"), col("bucket")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val prune = probed.toSeq.sortBy(_._1).map { case (t, bs) =>
      col("table_id") === t && col("bucket").isin(bs: _*)
    }.reduceOption(_ || _).getOrElse(lit(false))
    // bounded by contract (see scaladoc); materialized driver-side so the
    // candidate ids can prune the vector scan AND the list can broadcast
    // without recomputing the bucket join.
    val candidates = index.buckets.where(prune)
      .join(broadcast(pb), Seq("table_id", "bucket"))
      .select(col("pid"), col(idCol)).distinct()
    val candSchema = candidates.schema
    // loud guard on the bounded-by-contract collect: a hot/promiscuous
    // bucket (occupancy far beyond the design constant — bits sized too
    // low for the corpus, or a degenerate all-equal vector region) would
    // otherwise become an unbounded driver collect and a giant literal
    // In(...) filter; fail with the knob named instead of OOMing the
    // driver (round-8 advisor item)
    val candRows = candidates.limit(maxCandidates + 1).collect()
    require(candRows.length <= maxCandidates,
      s"LSH candidate set exceeds maxCandidates=$maxCandidates " +
        s"(hot bucket / under-sized bits?); raise maxCandidates, add bits, " +
        s"or reduce the probe batch")
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(candRows.toIndexedSeq: _*), candSchema)
    val ids = candRows.map(_.get(1)).distinct.toSeq
    val fetch =
      if (ids.isEmpty) vectors.where(lit(false))
      else vectors.where(col(idCol).isin(ids: _*))
    val rescored = fetch
      .join(broadcast(candDf), Seq(idCol))
      .join(broadcast(probes.select(col(probeIdCol).as("pid"),
        col(probeVecCol).as("pv"))), Seq("pid"))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** A fully durable serving bundle: signature index + id-sorted vector
    * table, both parquet-backed ([[IndexStore.writeLsh]] /
    * [[IndexStore.writeLshVectors]]). */
  final case class Stored(index: Index, vectors: DataFrame)

  /** Bucket-CLUSTERED serving bundle: one stored table of
    * (table_id, bucket, id, vec) — each vector duplicated once per hash
    * table (×tables storage, the classic space/time trade), clustered
    * and sorted by (table_id, bucket). See [[searchBucketed]]. */
  final case class Bucketed(rows: DataFrame, tables: Int, bits: Int, dim: Int)

  /** Bucket-clustered bundle with INT8 rows ([[IndexStore.writeLshBucketedQ8]]):
    * the hot pruned scan carries (table_id, bucket, id, q8, scale) —
    * ¼ the float bundle's bytes, which is the direct attack on the
    * gsf100 cold-cache spread (BASELINE §two-decade: the float bundle is
    * ~4 GB vs page cache; its pass spread was 1.14–12.6 s cold → warm) —
    * plus an id-sorted FLOAT `vectors` side table that only the
    * O(shortlist) exact re-rank tail reads. */
  final case class BucketedQ8(rows: DataFrame, vectors: DataFrame,
      tables: Int, bits: Int, dim: Int)

  /** [[searchStored]] with the candidate-vector fetch CO-CLUSTERED with
    * the buckets — the next lever BASELINE §q187 names: at sf10 the
    * pruned and unpruned paths converge because the per-probe candidate
    * FETCH dominates — the id-sorted vectors table scatters one
    * bucket's candidates across row-groups, so each probe pays many
    * row-group reads plus a driver-side candidate collect to build the
    * id predicate. The bucketed layout ([[IndexStore.writeLshBucketed]])
    * stores each vector BESIDE its (table_id, bucket) assignment, so the
    * probed buckets' `(table_id, bucket) IN (...)` predicate — already
    * bounded and driver-known — prunes ONE scan that yields signatures
    * AND vectors together: one row-group serves one probe's whole
    * candidate set, there is no second fetch join, and no candidate-id
    * collect at all (the only driver-side read left is the probes ×
    * tables bucket-key set). Cost per search: O(probed-bucket
    * row-groups); at 100 TB the same layout serves partition pruning.
    *
    * Results are identical to [[search]]: same fixed-seed hyperplanes
    * and bucket semantics select the same candidates (a multi-table
    * collision collapses to one row — its vector copies are identical
    * by construction), and the exact cosine re-rank is verbatim. */
  def searchBucketed(b: Bucketed, probes: DataFrame, idCol: String,
      vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    val pb = Similarity.lshBuckets(
      probes.select(col(probeIdCol).as("pid"), col(probeVecCol).as("pv")),
      "pid", "pv", b.tables, b.bits, b.dim)
    // The probed-bucket key set is probes × tables rows — bounded because
    // the probe side is small BY CONTRACT, but the contract needs teeth
    // (round-11 advisor): collect at most maxProbeKeys+1 keys, and past
    // the bound SKIP the driver-built prune predicate entirely — the
    // bucket-equi join below is what's correct, the IN-predicate is only
    // its row-group-skipping accelerator, and a million-key OR-of-isin
    // would blow the driver and degrade the scan anyway. The fallback's
    // full scan is the honest plan for a probe set that large.
    val maxKeys = Memo.intProp("graft.lsh.maxProbeKeys", 8192)
    val probedRows = pb.select(col("table_id"), col("bucket")).distinct()
      .limit(maxKeys + 1).collect()
    val pruned = probedRows.length <= maxKeys
    if (!pruned)
      System.err.println(s"[lsh] probe-bucket keys exceed $maxKeys " +
        "(graft.lsh.maxProbeKeys) — serving via the join-only full scan")
    val prune =
      if (!pruned) lit(true)
      else {
        val probed = probedRows.map(r => (r.getInt(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
        probed.toSeq.sortBy(_._1).map { case (t, bs) =>
          col("table_id") === t && col("bucket").isin(bs: _*)
        }.reduceOption(_ || _).getOrElse(lit(false))
      }
    val cand = b.rows.where(prune)
      .join(broadcast(pb), Seq("table_id", "bucket"))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol), col(vecCol))
      .dropDuplicates("pid", idCol)
    val rescored = cand
      .join(broadcast(probes.select(col(probeIdCol).as("pid"),
        col(probeVecCol).as("pv"))), Seq("pid"))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** [[searchBucketed]] over the INT8 bundle — the q172 verify-tail
    * pattern applied to the stored serving path: the pruned scan and
    * candidate join ride the quantized rows (¼ bytes — candidate
    * SELECTION is identical to the float bundle's, because bucket
    * assignments are stored, not recomputed), candidates shortlist by
    * integer-exact [[Quantize.cosineQ8]] (per-vector scales cancel in
    * cosine, so q8 ranking is the dequantized ranking exactly — only
    * elementwise rounding differs from float), and the top
    * `rerankFactor`·k per probe re-rank in FLOAT from the bundle's
    * id-sorted vectors table (an O(shortlist) pruned fetch, the
    * [[searchStored]] discipline). Scores are float-exact, so the
    * q30-family recall contract applies unchanged; LshIndexSpec pins
    * result equality against [[searchBucketed]] on the gate corpus. */
  def searchBucketedQ8(b: BucketedQ8, probes: DataFrame, idCol: String,
      vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, rerankFactor: Int = 4): DataFrame = {
    val spark = b.rows.sparkSession
    val probesF = probes.select(col(probeIdCol).as("pid"),
      col(probeVecCol).cast("array<double>").as("pv"))
    val q8Scored = bucketedQ8Scored(b, probesF, idCol)
    val wq = Window.partitionBy(col("pid")).orderBy(col("q8_sim").desc, col(idCol))
    val shortlist = q8Scored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= k * rerankFactor)
      .select(col("pid"), col(idCol))
    // float tail: shortlist is ≤ probes · k · rerankFactor rows by
    // construction (bounded like the probe side itself), so the
    // driver-side id collect that prunes the vectors fetch is safe
    val slSchema = shortlist.schema
    val slRows = shortlist.collect()
    val slDf = spark.createDataFrame(
      java.util.Arrays.asList(slRows.toIndexedSeq: _*), slSchema)
    val ids = slRows.map(_.get(1)).distinct.toSeq
    val fetch =
      if (ids.isEmpty) b.vectors.where(lit(false))
      // a giant literal In() degrades the plan past ~1e5 ids (huge probe
      // batches) — the broadcast join below is already correct; the
      // predicate is only the row-group-skipping accelerator
      else if (ids.length > 100000) b.vectors
      else b.vectors.where(col(idCol).isin(ids: _*))
    val rescored = fetch
      .join(broadcast(slDf), Seq(idCol))
      .join(broadcast(probesF), Seq("pid"))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** The q8 candidate-scoring stage of [[searchBucketedQ8]] — split out
    * because the shortlist COLLECT severs the executed plan in two: the
    * search's returned plan is only the float tail, so the pruned-scan
    * shape of this stage must be assertable on its own (LshIndexSpec). */
  private[ext] def bucketedQ8Scored(b: BucketedQ8, probesF: DataFrame,
      idCol: String): DataFrame = {
    val pb = Similarity.lshBuckets(probesF, "pid", "pv", b.tables, b.bits, b.dim)
    // same bounded probe-key prune + loud join-only fallback as
    // searchBucketed — the predicate is the row-group-skipping
    // accelerator, never the correctness
    val maxKeys = Memo.intProp("graft.lsh.maxProbeKeys", 8192)
    val probedRows = pb.select(col("table_id"), col("bucket")).distinct()
      .limit(maxKeys + 1).collect()
    val pruned = probedRows.length <= maxKeys
    if (!pruned)
      System.err.println(s"[lsh] probe-bucket keys exceed $maxKeys " +
        "(graft.lsh.maxProbeKeys) — serving via the join-only full scan")
    val prune =
      if (!pruned) lit(true)
      else {
        val probed = probedRows.map(r => (r.getInt(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
        probed.toSeq.sortBy(_._1).map { case (t, bs) =>
          col("table_id") === t && col("bucket").isin(bs: _*)
        }.reduceOption(_ || _).getOrElse(lit(false))
      }
    val probesQ = Quantize.int8(probesF, "pv").select(col("pid"), col("q8").as("pq8"))
    b.rows.where(prune)
      .join(broadcast(pb.select(col("table_id"), col("bucket"), col("pid"))),
        Seq("table_id", "bucket"))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol), col("q8"))
      .dropDuplicates("pid", idCol)
      .join(broadcast(probesQ), Seq("pid"))
      .select(col("pid"), col(idCol),
        Quantize.cosineQ8(col("q8"), col("pq8")).as("q8_sim"))
  }

  private val bucketedQ8Cache = Memo.unmanaged[BucketedQ8]

  /** Serving memo for the [[BucketedQ8]] bundle (lazy parquet reads). */
  def cachedBucketedQ8(key: String)(build: => BucketedQ8): BucketedQ8 =
    bucketedQ8Cache(key)(build)

  private val bucketedCache = Memo.unmanaged[Bucketed]

  /** Serving memo for the [[Bucketed]] bundle (lazy parquet reads —
    * nothing cluster-side to release; the bound still caps JVM state). */
  def cachedBucketed(key: String)(build: => Bucketed): Bucketed =
    bucketedCache(key)(build)

  /** Release the index's cluster-side state. */
  def drop(index: Index): Unit = { index.buckets.unpersist(); () }

  private val storedCache = new Memo[Stored](s => drop(s.index))

  /** Serving memo for the [[Stored]] bundle (the [[cached]] semantics,
    * one level wider); bounded LRU, eviction unpersists ([[Memo]]). */
  def cachedStored(key: String)(build: => Stored): Stored =
    storedCache(key)(build)

  private val cache = new Memo[Index](drop)

  /** Serving memo — the q78_search/q175 semantics; bounded LRU,
    * eviction unpersists ([[Memo]]). */
  def cached(key: String)(build: => Index): Index = cache(key)(build)
}
