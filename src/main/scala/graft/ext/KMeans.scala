package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed spherical k-means (Lloyd iterations under cosine geometry) —
  * the centroid-training stage `Similarity.ivfTopK` declares as its
  * production path: the sampled-centroid IVF build keeps recall only as
  * good as its random seeds; a few Lloyd rounds move centroids to the
  * actual density modes.
  *
  * Spherical variant: assignment by cosine, re-estimation = per-cluster
  * element-wise mean re-normalized to unit length — the standard
  * formulation when downstream search is cosine (Dhillon & Modha,
  * "Concept decompositions for large sparse text data using clustering",
  * Machine Learning 42, 2001).
  *
  * Scale shape per iteration: centroids (k·dim doubles) broadcast to every
  * executor; assignment is one corpus pass + per-row top-1 window over k
  * candidate rows; re-estimation is [[VectorAgg.centroids]] (scalar
  * long-form shuffle, map-side partial agg). The driver never holds
  * vectors — each round's centroid set is a k-row `localCheckpoint`
  * (lineage truncation, the iterative-plan discipline from
  * [[Clustering]]). Empty clusters keep their previous centroid, so k is
  * stable across rounds. Unit-normalization follows the TextPrep staging
  * discipline: the norm is its own projected column referenced twice, so
  * CollapseProject can't inline the O(dim) aggregate into the per-element
  * division lambda.
  */
object KMeans {

  /** Stage `out` = L2-normalized `vecCol` (zero vectors pass through). */
  private def unitize(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn("__dv", col(vecCol).cast("array<double>"))
      .withColumn("__n", sqrt(aggregate(col("__dv"), lit(0.0), (a, x) => a + x * x)))
      .withColumn(out, when(col("__n") === 0.0, col("__dv"))
        .otherwise(transform(col("__dv"), x => x / col("__n"))))
      .drop("__dv", "__n")

  /** Nearest-centroid assignment under cosine. `centroids`: (cid, cv).
    * Output: (idCol, cid). */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val scored = vecs
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("cid"),
        VectorFunctions.cosine(col("__v"), col("cv")).as("__csim"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__csim").desc, col("cid"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("cid"))
  }

  /** Nearest-centroid assignment as a map-side-combined aggregate — the
    * large-k formulation: [[assign]]'s per-row window re-shuffles the
    * N·k scored rows by id; this one folds them with partial aggregation
    * before any exchange (max of (sim, -cid) per id — the -cid makes
    * exact ties deterministic toward the smaller cid, so identical
    * vectors always co-cluster). At SemDeDup-scale k (N/256) the window
    * form would shuffle 256× the corpus; this shuffles at most one
    * combined row per (id, input partition). Output: (idCol, cid). */
  def assignAgg(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    vecs.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(centroids))
      .select(col(idCol),
        struct(VectorFunctions.cosine(col("__v"), col("cv")).as("__csim"),
          (-col("cid")).as("__ncid")).as("__s"))
      .groupBy(col(idCol))
      .agg(max(col("__s")).as("__m"))
      .select(col(idCol), (-col("__m.__ncid")).as("cid"))

  /** Two-level (coarse-quantized) nearest-centroid assignment — the
    * large-k regime. [[assignAgg]] scores N·k pairs; when k scales with
    * N (SemDeDup's k = N/256) that is O(N²/256) and re-quadratizes: the
    * round-7 sf10 checkpoint measured q179_build at decade exponent
    * 1.37 (435 s at sf10 — 1 B scored rows). This is the standard IVF
    * answer applied to the centroids themselves:
    *
    *   1. coarse = √k of the centroids (deterministic hash sample);
    *   2. each FINE centroid registers in its `nprobe` nearest coarse
    *      cells (k·√k scores — centroid-sized, never corpus-sized;
    *      boundary centroids appear in several cells, softening cell-
    *      edge misassignment the way IVF nprobe does);
    *   3. each point takes its best coarse cell (N·√k scores, struct-max
    *      map-side combined) and scores ONLY that cell's fine members
    *      (expected nprobe·k/√k = nprobe·√k each) — argmax as in
    *      [[assignAgg]], same (-cid) tie-break.
    *
    * Total N·(1+nprobe)·√k vs N·k — 15× fewer scored rows at sf10, and
    * with k capped at 2^16 ([[graft.queries.Round6Queries]] q179's
    * broadcast bound) the assignment is asymptotically LINEAR in N
    * (the SemDeDup paper's own fixed-k regime past the cap).
    *
    * Approximation note: a point whose true nearest fine centroid lives
    * outside its chosen coarse cell lands on its best IN-CELL centroid
    * instead — exactly IVF's recall trade, softened by fine-side nprobe.
    * SemDeDup's invariants (and the q179 contract) are stated over the
    * PRODUCED clustering, so they hold under any assignment; results
    * stay deterministic (hash sample, rounded ranks, struct-max ties).
    * Every cell always contains its own coarse centroid (coarse ⊆ fine,
    * self-registered), so no point can end up candidate-less. */
  def assignAggTwoLevel(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val nc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val coarse = centroids
      .orderBy(xxhash64(col("cid")), col("cid")).limit(nc)
      .select(col("cid").as("ccid"), col("cv").as("ccv"))
    // fine → nprobe nearest coarse cells (k·nc rows — centroid-sized,
    // a window here never touches the corpus)
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("__cs").desc, col("ccid"))
    val members = centroids.crossJoin(broadcast(coarse))
      .select(col("cid"), col("cv"), col("ccid"),
        VectorFunctions.cosine(col("cv"), col("ccv")).as("__cs"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= nprobe)
      .select(col("ccid"), col("cid"), col("cv"))
      // self-registration: a cell always holds its own coarse centroid
      .unionByName(coarse.select(col("ccid"), col("ccid").as("cid"),
        col("ccv").as("cv")))
      .distinct()
    // point → best coarse cell (N·nc, map-side-combined argmax)
    val cells = assignAgg(vecs, idCol, vecCol,
      coarse.select(col("ccid").as("cid"), col("ccv").as("cv")))
      .select(col(idCol), col("cid").as("ccid"))
    // point → best fine centroid among its cell's members
    vecs.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .join(cells, Seq(idCol))
      .join(broadcast(members), Seq("ccid"))
      .select(col(idCol),
        struct(VectorFunctions.cosine(col("__v"), col("cv")).as("__csim"),
          (-col("cid")).as("__ncid")).as("__s"))
      .groupBy(col(idCol))
      .agg(max(col("__s")).as("__m"))
      .select(col(idCol), (-col("__m.__ncid")).as("cid"))
  }

  /** [[assignAggTwoLevel]] when k is large enough for the coarse pass
    * to pay for itself; plain [[assignAgg]] below — gate-SF plans (and
    * their oracles) are unchanged. */
  def assignAggAuto(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int): DataFrame =
    if (k >= 64) assignAggTwoLevel(vecs, idCol, vecCol, centroids, k)
    else assignAgg(vecs, idCol, vecCol, centroids)

  /** Large-k training: ONE-pass deterministic hash seeding (top-k by
    * xxhash64 — the uniform-sample stand-in for k-means‖ oversampling,
    * Bahmani et al. VLDB'12) + the same Lloyd loop with the [[assignAgg]]
    * assignment. [[fit]]'s farthest-first init is the right trade at
    * IVF-scale k (one corpus pass per seed, 8–64 seeds); SemDeDup-scale
    * k (N/256 clusters) needs seeding whose cost does not scale with k.
    * Output: (cid, cv), k rows, cid = each seed row's id. */
  def fitHashSeeded(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int): DataFrame = {
    val unitized = unitize(vecs, vecCol, "__nv").select(col(idCol), col("__nv"))
    var centroids = unitized
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(k)
      .select(col(idCol).cast("long").as("cid"), col("__nv").as("cv"))
      .localCheckpoint(true)
    for (_ <- 0 until maxIter) {
      val assigned = assignAggAuto(unitized, idCol, "__nv", centroids, k)
      val means = unitize(
        VectorAgg.centroids(assigned.join(unitized, idCol), "cid", "__nv"),
        "centroid", "cv")
        .select(col("group").cast("long").as("cid"), col("cv"))
      centroids = means
        .unionByName(centroids.join(means.select("cid"), Seq("cid"), "left_anti"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Train `k` unit-length centroids with `maxIter` Lloyd rounds.
    *
    * Init: deterministic farthest-first traversal — seed with the hash-min
    * vector, then repeatedly add the vector least similar to its nearest
    * chosen centroid. The nearest-chosen similarity is maintained
    * INCREMENTALLY: each round folds only the newest centroid into a
    * running `greatest(best, cos(v, new))` column (a narrow map + a 1-row
    * broadcast), then takes the argmin via TakeOrdered(1) — no
    * crossJoin-against-all-centroids, no per-round groupBy shuffle, which
    * cut the k=8 init from ~5 s to ~1.5 s at 5k vectors and is the only
    * formulation that stays one-pass-per-seed at corpus scale. Lloyd
    * can't merge two blobs that a clumped random init put under one
    * centroid, and farthest-first provably 2-approximates the k-center
    * objective (Gonzalez 1985). At very large k the k passes give way to
    * k-means‖ oversampling (Bahmani et al., VLDB'12) — same Lloyd loop
    * afterwards. Output: (cid, cv: Array[Double]), k rows. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int): DataFrame = {
    val spark = vecs.sparkSession
    val unitized = unitize(vecs, vecCol, "__nv").select(col(idCol), col("__nv"))
      .localCheckpoint(true)
    // Each farthest-first pick is ONE row — the k-row-centroid bounded
    // driver-read class. Collect it and fold the vector back in as a
    // LITERAL column (r18): the old 1-row checkpoint + broadcast per
    // round cost 2 extra jobs each on a loop that is pure job overhead,
    // and the final union-of-k-frames another. Arithmetic is unchanged —
    // the same cosine against the same vector, literal vs broadcast.
    val seedRow = unitized
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(1)
      .select(col(idCol).cast("long"), col("__nv"))
      .collect().headOption
      // loud empty-input contract (ADVICE r18): head() on an empty frame
      // threw a bare NoSuchElementException three calls deep
      .getOrElse(throw new IllegalArgumentException(
        "KMeans.fit: input has no rows — cannot seed centroids"))
    var chosen = Seq((seedRow.getLong(0), seedRow.getSeq[Double](1).toArray))
    // (id, vector, similarity to the nearest picked centroid)
    var state = unitized
      .select(col(idCol), col("__nv"),
        VectorFunctions.cosine(col("__nv"), typedLit(chosen.head._2)).as("__best"))
      .localCheckpoint(true)
    for (round <- 1 until k) {
      val row = state.orderBy(col("__best").asc, col(idCol)).limit(1)
        .select(col(idCol).cast("long"), col("__nv"))
        .head()
      val cv = row.getSeq[Double](1).toArray
      chosen :+= ((row.getLong(0), cv))
      if (round < k - 1)
        // lazy: the next round's TakeOrdered head materializes this fold,
        // so each init round costs ONE job (the BpeTrainer r18 pattern)
        // at the same k·N arithmetic
        state = state
          .select(col(idCol), col("__nv"),
            greatest(col("__best"),
              VectorFunctions.cosine(col("__nv"), typedLit(cv))).as("__best"))
          .localCheckpoint(eager = false)
    }
    import spark.implicits._
    var centroids = chosen.toDF("cid", "cv").localCheckpoint(true)
    for (_ <- 0 until maxIter) {
      val assigned = assign(unitized, idCol, "__nv", centroids)
      val means = unitize(
        VectorAgg.centroids(assigned.join(unitized, idCol), "cid", "__nv"),
        "centroid", "cv")
        .select(col("group").cast("long").as("cid"), col("cv"))
      // empty clusters vanish from `means`; carry their old centroid over
      centroids = means
        .unionByName(centroids.join(means.select("cid"), Seq("cid"), "left_anti"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** Mean within-cluster cosine to the assigned centroid — the (negated)
    * spherical k-means objective; one scalar, for specs and convergence
    * monitoring. */
  def objective(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): Double = {
    val unitized = unitize(vecs, vecCol, "__nv").select(col(idCol), col("__nv"))
    assign(unitized, idCol, "__nv", centroids)
      .join(unitized, idCol)
      .join(broadcast(centroids), Seq("cid"))
      .agg(avg(VectorFunctions.cosine(col("__nv"), col("cv"))))
      .head().getDouble(0)
  }
}
