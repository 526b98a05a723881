package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the compressed-domain ANN tier
  * below [[Quantize]]'s int8: each unit-normalized vector is split into
  * `m` subvectors, each subvector is vector-quantized against its own
  * `ksub`-entry codebook, and the stored representation collapses to `m`
  * small integers — 8 bytes/vector at (m=8, ksub≤256) against 256 float
  * bytes for a 64-dim embedding, a 32× cut. Search never reconstructs:
  * a probe precomputes one `m·ksub` table of subspace inner products and
  * every corpus vector is scored with `m` table lookups (ADC —
  * asymmetric distance computation), so the corpus-sized scan touches
  * only codes.
  *
  * Scale shape:
  *   - training iterates on (id, j, subvector) rows — ONE explode of the
  *     corpus, each Lloyd round is a broadcast-join score + a map-side-
  *     combined `min(struct(dist, cid))` argmin (never a per-group sort)
  *     + a [[VectorAgg.centroids]] scalar-row mean; the driver holds
  *     only the m·ksub codebook, `localCheckpoint`ed per round (the
  *     [[KMeans]] lineage discipline);
  *   - encoding is one broadcast-join pass over the corpus; codes are
  *     `m` ints;
  *   - ADC search broadcasts per-probe LUTs (m·ksub doubles each) and
  *     scans only the codes column — the 100 TB story: candidate scoring
  *     bytes drop 32× and the float corpus is touched only by the final
  *     `rerankFactor·k`-row re-rank join, exactly the [[Similarity.lshTopKQ8]]
  *     verify-tail pattern one tier further down.
  *
  * Cosine geometry: corpus and probes are unit-normalized first, so
  * cos(q, x) = ⟨q, x⟩ = Σ_j ⟨q_j, x_j⟩ ≈ Σ_j ⟨q_j, c_{j,code_j(x)}⟩ —
  * per-subspace Euclidean k-means (the canonical PQ objective) minimizes
  * exactly the reconstruction error that bounds the ADC approximation.
  */
object Pq {

  private def unitize(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn("__dv", col(vecCol).cast("array<double>"))
      .withColumn("__n", sqrt(aggregate(col("__dv"), lit(0.0), (a, x) => a + x * x)))
      .withColumn(out, when(col("__n") === 0.0, col("__dv"))
        .otherwise(transform(col("__dv"), x => x / col("__n"))))
      .drop("__dv", "__n")

  /** (id, j, sv): subspace-j slice of each unit-normalized vector. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame = {
    val slices = (0 until m).map(j =>
      struct(lit(j).as("j"),
        slice(col("__nv"), j * subDim + 1, subDim).as("sv")))
    unitize(df, vecCol, "__nv")
      .select(col(idCol), explode(array(slices: _*)).as("__s"))
      .select(col(idCol), col("__s.j").as("j"), col("__s.sv").as("sv"))
  }

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Nearest-codebook-entry per (id, j): a broadcast join on `j` scored
    * with subspace L2, argmin via map-side-combined `min(struct)` —
    * the subvector rides the struct so re-estimation needs no rejoin.
    * Output: (id, j, cid, sv). */
  private def assign(subvecs: DataFrame, idCol: String,
      codebooks: DataFrame): DataFrame =
    subvecs.join(broadcast(codebooks), Seq("j"))
      .select(col(idCol), col("j"),
        struct(sqDist(col("sv"), col("cv")).as("d"), col("cid"),
          col("sv")).as("__a"))
      .groupBy(col(idCol), col("j"))
      .agg(min(col("__a")).as("__a"))
      .select(col(idCol), col("j"), col("__a.cid").as("cid"),
        col("__a.sv").as("sv"))

  /** Train the m per-subspace codebooks: (j, cid, cv), m·ksub rows.
    *
    * Init: one TakeOrdered hash-sample of `ksub` corpus vectors, sliced —
    * codebook entry (j, c) starts as subvector j of sample c (the
    * [[Similarity.ivfTopK]] init, exploded across subspaces; no per-
    * subspace window over the corpus). `iters` joint Lloyd rounds follow:
    * all m subspaces assign and re-estimate in the SAME two shuffles per
    * round (grouped on an encoded j·ksub+cid key), not m sequential
    * jobs — the m-fold job fan-out is the non-scalable formulation.
    * Empty cells keep their previous centroid, so every code stays
    * addressable. `dim` must divide evenly into m subspaces. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val subvecs = subvectors(corpus, idCol, vecCol, m, subDim)

    val sample = unitize(corpus, vecCol, "__nv")
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(ksub)
      .select(col("__nv"),
        (row_number().over(Window.orderBy(xxhash64(col(idCol)), col(idCol)))
          - 1).as("cid"))
    val initSlices = (0 until m).map(j =>
      struct(lit(j).as("j"), slice(col("__nv"), j * subDim + 1, subDim).as("cv")))
    var codebooks = sample
      .select(col("cid"), explode(array(initSlices: _*)).as("__s"))
      .select(col("__s.j").as("j"), col("cid"), col("__s.cv").as("cv"))
      .localCheckpoint(true)

    for (_ <- 0 until iters) {
      val assigned = assign(subvecs, idCol, codebooks)
      val means = VectorAgg.centroids(
        assigned.withColumn("__grp", col("j") * ksub + col("cid")),
        "__grp", "sv")
        .select((col("group") / ksub).cast("int").as("j"),
          (col("group") % ksub).cast("int").as("cid"),
          col("centroid").as("cv"))
      codebooks = means
        .unionByName(codebooks.join(means.select("j", "cid"),
          Seq("j", "cid"), "left_anti"))
        .localCheckpoint(true)
    }
    codebooks
  }

  /** PQ-encode the corpus: (idCol, codes ARRAY<INT> length m) — the
    * stored index, m small ints per vector. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, dim: Int): DataFrame =
    assign(subvectors(corpus, idCol, vecCol, m, dim / m), idCol, codebooks)
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("cid")))),
        x => x.getField("cid")).as("codes"))

  /** Reconstruct the quantized approximation of each vector (specs and
    * error audits): concatenate the m assigned centroids. */
  def reconstruct(codes: DataFrame, idCol: String,
      codebooks: DataFrame, m: Int): DataFrame =
    codes.select(col(idCol), posexplode(col("codes")).as(Seq("j", "cid")))
      .join(broadcast(codebooks), Seq("j", "cid"))
      .groupBy(col(idCol))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("j"), col("cv")))),
          x => x.getField("cv")),
        array().cast("array<double>"), (acc, v) => concat(acc, v))
        .as("recon"))

  /** Subspace width from the codebook itself (k-row metadata read, no
    * corpus job): dim = m · |cv|. */
  private[ext] def dimOf(codebooks: DataFrame, m: Int): Int =
    m * codebooks.select(size(col("cv"))).head().getInt(0)

  /** Per-probe ADC lookup table: lut[j·ksub + cid] = ⟨q_j, c_{j,cid}⟩,
    * one flat m·ksub-double array per probe — built from k-row joins,
    * broadcast to the candidate scan. Output: (pid, lut). */
  private def probeLuts(probes: DataFrame, probeIdCol: String,
      probeVecCol: String, codebooks: DataFrame, m: Int, dim: Int): DataFrame =
    subvectors(
      probes.select(col(probeIdCol).as("pid"), col(probeVecCol).as("pv")),
      "pid", "pv", m, dim / m)
      .join(broadcast(codebooks), Seq("j"))
      .select(col("pid"), col("j"), col("cid"),
        VectorFunctions.dot(col("sv"), col("cv")).as("w"))
      .groupBy(col("pid"))
      .agg(transform(
        array_sort(collect_list(struct(col("j"), col("cid"), col("w")))),
        x => x.getField("w")).as("lut"))

  /** ADC score (m LUT lookups) for a (pid, codes) row set. */
  private def adcScore(m: Int, ksub: Int): org.apache.spark.sql.Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc + get(col("lut"), j * ksub + get(col("codes"), j)))

  /** Float re-rank of a (pid, id) shortlist — the exact-scores tail every
    * ANN operator here shares. Output: (probeIdCol, idCol, cos_sim). */
  private def rerank(shortlist: DataFrame, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    val corpusF = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("fv"))
    val probesF = probes.select(col(probeIdCol).as("pid"),
      col(probeVecCol).cast("array<double>").as("pvf"))
    val rescored = shortlist
      .join(broadcast(probesF), Seq("pid"))
      .join(corpusF, Seq(idCol))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col("fv"), col("pvf")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** ADC top-k: score every code row with m LUT lookups, take the
    * `rerankFactor·k` shortlist per probe, re-rank the shortlist in
    * float. Output (probeIdCol, idCol, cos_sim) — the
    * [[Similarity.recallContract]] shape. */
  def topKAdc(corpus: DataFrame, codes: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      codebooks: DataFrame, k: Int, m: Int, ksub: Int,
      rerankFactor: Int = 4): DataFrame = {
    val dim = dimOf(codebooks, m)
    val luts = probeLuts(probes, probeIdCol, probeVecCol, codebooks, m, dim)
    val adcScored = codes.crossJoin(broadcast(luts))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol), adcScore(m, ksub).as("adc"))
    val ws = Window.partitionBy(col("pid")).orderBy(col("adc").desc, col(idCol))
    val shortlist = adcScored.withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= k * rerankFactor)
      .select(col("pid"), col(idCol))
    rerank(shortlist, corpus, probes, idCol, vecCol, probeIdCol, probeVecCol, k)
  }

  /** IVF-PQ (the IVFADC architecture of Jégou et al. §V / FAISS
    * `IndexIVFPQ` — the composition production systems run at 10⁹
    * vectors): the IVF coarse quantizer restricts candidates to the
    * `nprobe` nearest inverted lists (probe-count × nprobe slim rows
    * joined against the prebuilt assignment — the full-corpus ADC scan
    * of [[topKAdc]] never happens), the survivors are scored in the
    * compressed domain (m LUT lookups each), and only the
    * `rerankFactor·k` shortlist touches float vectors. Cost per probe:
    * O(N/nlist · nprobe) code lookups + O(k·rerankFactor) float rows —
    * both knobs, neither corpus-sized. */
  def searchIvfAdc(ivf: IvfIndex.Index, pq: Index,
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, nprobe: Int = 4, rerankFactor: Int = 4): DataFrame = {
    val dim = dimOf(pq.codebooks, pq.m)
    val probeLists = Similarity.nearestCentroids(
      probes.select(col(probeIdCol), col(probeVecCol).cast("array<double>").as("pv")),
      col(probeIdCol), col("pv"), nprobe, ivf.centroids)
      .select(col("m_id").as("pid"), col("centroid_id"))
    val candidates = probeLists.join(ivf.assignment, Seq("centroid_id"))
      .select(col("pid"), col(idCol))
    val luts = probeLuts(probes, probeIdCol, probeVecCol, pq.codebooks, pq.m, dim)
    val adcScored = candidates
      .join(pq.codes, Seq(idCol))
      .join(broadcast(luts), Seq("pid"))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol), adcScore(pq.m, pq.ksub).as("adc"))
    val ws = Window.partitionBy(col("pid")).orderBy(col("adc").desc, col(idCol))
    val shortlist = adcScored.withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= k * rerankFactor)
      .select(col("pid"), col(idCol))
    rerank(shortlist, corpus, probes, idCol, vecCol, probeIdCol, probeVecCol, k)
  }

  /** Train + encode + ADC-search in one call — the build-per-query
    * composition (the prebuilt-index split is [[build]] once,
    * [[topKAdc]] many, the [[IvfIndex]] pattern). */
  def topK(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, m: Int = 8, ksub: Int = 16, iters: Int = 2, dim: Int = 64,
      rerankFactor: Int = 4): DataFrame = {
    val codebooks = train(corpus, idCol, vecCol, m, ksub, iters, dim)
    val codes = encode(corpus, idCol, vecCol, codebooks, m, dim)
    topKAdc(corpus, codes, probes, idCol, vecCol, probeIdCol, probeVecCol,
      codebooks, k, m, ksub, rerankFactor)
  }

  /** A prebuilt PQ index: driver-pinned codebooks (m·ksub rows — a
    * LocalRelation every search plan broadcasts with zero recompute) +
    * the persisted, materialized code table (the 100 TB analogue is a
    * written m-int-wide table — the whole point of PQ is that THIS is
    * what search scans). */
  final case class Index(codebooks: DataFrame, codes: DataFrame,
      m: Int, ksub: Int)

  /** Build-once: train, pin codebooks driver-side, encode and
    * materialize the code table — cost paid HERE, never lazily inside a
    * search (the [[IvfIndex.buildTrained]] discipline). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, iters: Int = 2, dim: Int = 64): Index = {
    val spark = corpus.sparkSession
    val cb = train(corpus, idCol, vecCol, m, ksub, iters, dim)
    val local = spark.createDataFrame(
      java.util.Arrays.asList(cb.collect(): _*), cb.schema)
    val codes = encode(corpus, idCol, vecCol, local, m, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    Index(local, codes, m, ksub)
  }

  /** ADC search against a prebuilt index. */
  def search(index: Index, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, rerankFactor: Int = 4): DataFrame =
    topKAdc(corpus, index.codes, probes, idCol, vecCol, probeIdCol,
      probeVecCol, index.codebooks, k, index.m, index.ksub, rerankFactor)

  /** Release a built index's cluster-side state. */
  def drop(index: Index): Unit = { index.codes.unpersist(); () }

  private val cache = new Memo[Index](drop)

  /** Serving memo — the search-many semantics the q175 bench entry
    * measures from rep 2 on. Bounded LRU, eviction unpersists
    * ([[Memo]]). */
  def cached(key: String)(build: => Index): Index = cache(key)(build)
}
