package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over embedding columns
  * (`ARRAY<FLOAT>`), three tiers:
  *
  *   - `bruteForceTopK` — exact cosine top-k: probes broadcast, corpus
  *     streamed once, per-probe heap via window row_number (fuses to a
  *     partial top-k; no global sort). The correctness baseline.
  *   - `lshTopK` — random-hyperplane LSH: per-vector bit signatures over L
  *     tables, candidates = bucket-mates in ≥1 table, exact re-rank.
  *     Corpus signatures are one map pass; the probe⋈corpus join is an
  *     equi-join on (table, bucket) — the 100 TB path, since only
  *     1/2^bits of the corpus is touched per probe per table.
  *   - `ivfTopK` — inverted-file index: a deterministic sample of corpus
  *     vectors acts as centroids, every vector is assigned to its nearest
  *     centroid (one shuffle), probes search the `nprobe` nearest
  *     centroids' inverted lists only. All dataframe-native — no driver
  *     materialization; at production scale the centroid stage would be
  *     k-means‖, the rest is unchanged.
  *
  * Synthetic-data caveat: the driver embeddings are uniform-random (no
  * cluster structure, max cosine ≈ 0.5), the worst case for ANN recall —
  * specs therefore measure recall against brute force rather than assert
  * perfection.
  */
object Similarity {

  // Hyperplane generation lives with the native signature expression
  // ([[org.apache.spark.sql.graft.LshSignatures.flatPlanes]]): one
  // deterministic Random(seed) Gaussian stream in (table, bit, dim)
  // order — SimilaritySpec pins the buckets against an independent
  // plain-Scala recomputation of the same draw.

  /** Occupancy-constant LSH bucket sizing: bits = log2(N / 32) clamped to
    * [4, 20], so expected bucket occupancy stays ≈ 32 per table as the
    * corpus grows and the candidate stage (Σ occupancy² per bucket) scales
    * ~linearly instead of re-quadratizing — the q164 fix, shared by every
    * hyperplane-LSH operator. `explicitBits > 0` pins a manual operating
    * point; `n > 0` supplies a known row count (e.g. from manifest stats,
    * [[graft.engine.Manifests.FileEntry.records]]); otherwise N comes from
    * [[graft.engine.TableStats.rowCountNoJob]] — parquet footers / plan
    * statistics, never a `count()` job over the corpus. */
  private[ext] def autoBits(vecs: DataFrame, explicitBits: Int, n: Long = -1L): Int =
    if (explicitBits > 0) explicitBits
    else {
      val rows =
        if (n > 0) n.toDouble
        else graft.engine.TableStats.rowCountNoJob(vecs).toDouble
      math.min(20, math.max(4,
        math.ceil(math.log(rows / 32.0) / math.log(2.0)).toInt))
    }

  /** Exact cosine top-k of `corpus` for each probe row.
    * Output: (probe_id, id, cos_sim) — cos rounded for stable ordering. */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(probes), col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col(probeVecCol)), 6).as("cos_sim"))
    val w = Window.partitionBy(col(probeIdCol)).orderBy(col("cos_sim").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** Driver-checkable contract view of an approximate top-k result — the
    * q13 (approx_count_distinct) pattern: the approximate rows themselves
    * are engine-specific (hash/sample dependent), so the CHECKED output is
    * one row per probe asserting (a) exactly `k` results came back and
    * (b) ≥ `minHits` of them are in the exact top-k (computed in-plan by
    * [[bruteForceTopK]]). The oracle states the same contract; if the
    * ANN stage degrades (bucketing bug, wrong re-rank), `recall_ok` flips
    * false and the gate goes red. Floors are set with margin under the
    * deterministic measured recall at the gate SF (LSH ≥0.3/probe,
    * IVF ≥0.2/probe at sf0.01) while staying above the random-candidate
    * floor the specs also guard. */
  def recallContract(ann: DataFrame, exact: DataFrame,
      probeIdCol: String, idCol: String, k: Int, minHits: Double): DataFrame = {
    val hits = ann.join(exact.select(col(probeIdCol), col(idCol)),
        Seq(probeIdCol, idCol), "left_semi")
      .groupBy(col(probeIdCol)).agg(count(lit(1)).as("__hits"))
    ann.groupBy(col(probeIdCol)).agg(count(lit(1)).as("n_results"))
      .join(hits, Seq(probeIdCol), "left")
      .select(col(probeIdCol), col("n_results"),
        ((col("n_results") === k) &&
          (coalesce(col("__hits"), lit(0L)) >= minHits)).as("recall_ok"))
      .orderBy(probeIdCol)
  }

  /** The per-row ARRAY<STRUCT<table_id, bucket>> of LSH assignments — a
    * plain column expression, so stream-side callers (ST16) can explode
    * it while keeping their own columns (watermarked timestamps survive
    * only as top-level attributes). */
  def lshBucketArray(vec: Column, tables: Int, bits: Int, dim: Int,
      seed: Long = 42L): Column =
    // native signature pass (ONE jit-able loop — the composed 128-dot
    // form fell out of JIT at auto-bits ≥ 13, see
    // [[org.apache.spark.sql.graft.LshSignatures]]), wrapped back into
    // the documented ARRAY<STRUCT<table_id, bucket>> contract; the cast
    // names the transform's anonymous struct fields
    transform(
      org.apache.spark.sql.graft.VectorExprs
        .lshSignatures(vec, tables, bits, dim, seed),
      (bucket, t) => struct(t, bucket))
      .cast("array<struct<table_id:int,bucket:bigint>>")

  /** Per-vector LSH bucket ids, one row per (id, table, bucket) — the
    * corpus/probe hashing hot path: the native signature array
    * posexplodes directly (pos = table_id), no struct wrap at all. */
  def lshBuckets(
      vecs: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int, dim: Int, seed: Long = 42L): DataFrame =
    vecs.select(col(idCol),
        posexplode(org.apache.spark.sql.graft.VectorExprs
          .lshSignatures(col(vecCol), tables, bits, dim, seed))
          .as(Seq("table_id", "bucket")))
      .select(col(idCol), col("table_id"), col("bucket"))

  /** LSH-bucketed approximate top-k with exact cosine re-rank.
    *
    * `bits = -1` (default) sizes the bucket space to the corpus via
    * [[autoBits]] — with FIXED bits, per-probe candidates are N/2^bits
    * per table, i.e. linear in corpus size, and the candidate stage
    * swamps the verify tail at 10⁹ vectors; occupancy-constant sizing
    * holds candidate volume flat and moves the recall trade into the
    * `tables` knob. Pass explicit `bits` to pin an operating point, or
    * `n` when the row count is already known (manifest stats). */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, tables: Int = 8, bits: Int = -1, dim: Int = 64,
      n: Long = -1L): DataFrame = {
    val useBits = autoBits(corpus, bits, n)
    val cb = lshBuckets(corpus, idCol, vecCol, tables, useBits, dim)
    val pb = lshBuckets(
      probes.select(col(probeIdCol).as("pid"), col(probeVecCol).as("pv")),
      "pid", "pv", tables, useBits, dim)
    val candidates = cb.join(pb, Seq("table_id", "bucket"))
      .select(col("pid").as(probeIdCol), col(idCol)).distinct()
    val rescored = candidates
      .join(broadcast(probes), Seq(probeIdCol))
      .join(corpus, Seq(idCol))
      .where(col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col(probeVecCol)), 6).as("cos_sim"))
    val w = Window.partitionBy(col(probeIdCol)).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** IVF approximate top-k: nearest-centroid assignment + nprobe search.
    * Centroids are a deterministic hash-stratified corpus sample
    * (id-hash modulus), so the whole pipeline stays a pure dataframe plan.
    */
  def ivfTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // Exactly nCentroids deterministic pseudo-random corpus vectors: hash-
    // ordered top-n (a small TakeOrdered, broadcast downstream). A modulus
    // filter would select a hash-proportional COUNT (n·c/m), not c rows —
    // which silently explodes the centroid count and craters recall.
    val centroids = corpus
      .select(col(idCol).as("centroid_id"), v.as("cv"))
      .orderBy(xxhash64(col("centroid_id")))
      .limit(nCentroids)
    ivfSearch(corpus, probes, idCol, vecCol, probeIdCol, probeVecCol,
      k, nprobe, centroids)
  }

  /** IVF with Lloyd-trained centroids ([[KMeans.fit]]) instead of the
    * random sample — the production index build: a few spherical-k-means
    * rounds move centroids onto the corpus density modes, tightening the
    * inverted lists the probes search. Same search path afterwards. */
  def ivfTopKTrained(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, nCentroids: Int = 16, nprobe: Int = 4,
      lloydIters: Int = 3): DataFrame = {
    val centroids = KMeans.fit(corpus, idCol, vecCol, nCentroids, lloydIters)
      .select(col("cid").as("centroid_id"), col("cv"))
    ivfSearch(corpus, probes, idCol, vecCol, probeIdCol, probeVecCol,
      k, nprobe, centroids)
  }

  /** Nearest-`keep` centroids per row (broadcast centroid table).
    * Assignment metric = search metric (cosine): lists must be built with
    * the same geometry probes search with, or recall drops to the random-
    * subset floor. Output: (m_id, centroid_id). */
  private[ext] def nearestCentroids(df: DataFrame, did: Column, dvec: Column,
      keep: Int, centroids: DataFrame): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .select(did.as("m_id"), col("centroid_id"),
        VectorFunctions.cosine(dvec, col("cv")).as("csim"))
    val w = Window.partitionBy(col("m_id")).orderBy(col("csim").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= keep)
      .select(col("m_id"), col("centroid_id"))
  }

  /** The inverted lists: each corpus vector on its single nearest
    * centroid's list — the index's big half, built once per index and
    * persisted by [[IvfIndex]] for search-many workloads. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    nearestCentroids(
      corpus.select(col(idCol), col(vecCol).cast("array<double>").as("av")),
      col(idCol), col("av"), 1, centroids)
      .select(col("m_id").as(idCol), col("centroid_id"))

  /** Probe-side IVF search against PREBUILT centroids + inverted lists:
    * assign each probe to its `nprobe` nearest centroids (k-row broadcast,
    * probe-count rows — the cheap side), join candidates off the prebuilt
    * lists, exact-cosine re-rank. This is the search half of the
    * build-once/search-many split; [[ivfTopK]]/[[ivfTopKTrained]] are the
    * build-per-query composition. */
  def ivfSearchLists(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, nprobe: Int, centroids: DataFrame,
      assignment: DataFrame): DataFrame = {
    val probeLists = nearestCentroids(
      probes.select(col(probeIdCol), col(probeVecCol).cast("array<double>").as("pv")),
      col(probeIdCol), col("pv"), nprobe, centroids)
      .select(col("m_id").as(probeIdCol), col("centroid_id"))

    val candidates = probeLists.join(assignment, Seq("centroid_id"))
      .select(col(probeIdCol), col(idCol)).distinct()
    val rescored = candidates
      .join(broadcast(probes), Seq(probeIdCol))
      .join(corpus, Seq(idCol))
      .where(col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col(probeVecCol)), 6).as("cos_sim"))
    val w = Window.partitionBy(col(probeIdCol)).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col(probeIdCol), col(idCol), col("cos_sim"))
  }

  private def ivfSearch(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, nprobe: Int, centroids: DataFrame): DataFrame =
    ivfSearchLists(corpus, probes, idCol, vecCol, probeIdCol, probeVecCol,
      k, nprobe, centroids, ivfAssign(corpus, idCol, vecCol, centroids))

  /** LSH-bucketed top-k with the verify tail in int8: candidates are
    * scored with [[Quantize.cosineQ8]] (integer dot products over q8
    * vectors — a quarter of the verify stage's bytes at any dim), the
    * top `rerankFactor`·k per probe re-ranked in float for the final k.
    * The bucket stage is identical to [[lshTopK]] (hyperplane signs are
    * scale-invariant, so hashing the float vectors is correct); only the
    * wide verify join — the stage whose bytes dominate at 10⁹ vectors —
    * rides the quantized representation. Same output shape as
    * [[lshTopK]]: (probeIdCol, idCol, cos_sim) with float-exact scores,
    * so the q30-family recall contract applies unchanged, and the
    * integers under the hood are the q170-gated [[Quantize.int8]]. */
  def lshTopKQ8(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, tables: Int = 8, bits: Int = -1, dim: Int = 64,
      n: Long = -1L, rerankFactor: Int = 4): DataFrame = {
    val useBits = autoBits(corpus, bits, n)
    val corpusF = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as("fv"))
    val probesF = probes.select(col(probeIdCol).as("pid"),
      col(probeVecCol).cast("array<double>").as("pv"))
    val corpusQ = Quantize.int8(corpusF, "fv")
      .select(col(idCol), col("q8").as("cq8"))
    val probesQ = Quantize.int8(probesF, "pv")
      .select(col("pid"), col("q8").as("pq8"))

    val cb = lshBuckets(corpusF, idCol, "fv", tables, useBits, dim)
    val pb = lshBuckets(probesF, "pid", "pv", tables, useBits, dim)
    val candidates = cb.join(pb, Seq("table_id", "bucket"))
      .select(col("pid"), col(idCol)).distinct()

    // verify in int8: the candidate-volume × vector-width product is the
    // scan/shuffle cost at scale — q8 rides it at 4× fewer bytes
    val q8Scored = candidates
      .join(broadcast(probesQ), Seq("pid"))
      .join(corpusQ, Seq(idCol))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol),
        Quantize.cosineQ8(col("cq8"), col("pq8")).as("q8_sim"))
    val wq = Window.partitionBy(col("pid")).orderBy(col("q8_sim").desc, col(idCol))
    val shortlist = q8Scored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= k * rerankFactor)
      .select(col("pid"), col(idCol))

    // float re-rank of the short list only (k·rerankFactor rows/probe)
    val rescored = shortlist
      .join(broadcast(probesF), Seq("pid"))
      .join(corpusF, Seq(idCol))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col("fv"), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }
}
