package graft.ext

import breeze.linalg.{DenseMatrix, DenseVector}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Alternating Least Squares matrix factorization — learned latent
  * factors over an interaction matrix (the co-purchase matrix [[CoOccurrence]]
  * counts directly, factorized; user/item embeddings that then feed the
  * engine's ANN serving family exactly like text embeddings do).
  *
  * Classic ridge-regularized ALS (Zhou et al. 2008, "Large-scale Parallel
  * Collaborative Filtering for the Netflix Prize"): alternate solving, for
  * each user u with the items fixed,
  *
  *   (Σ_{i∈R(u)} fᵢfᵢᵀ + λI) x_u = Σ_{i∈R(u)} r_{ui}·fᵢ
  *
  * and symmetrically for items. Each normal-equation system is rank×rank
  * — tiny — and the DISTRIBUTED part is accumulating the per-key sums.
  *
  * == Plan shape (the 100 TB part) ==
  *
  * One half-iteration = one equi-join of the ratings with the fixed-side
  * factor table, then `aggregateByKey` over PRIMITIVE stat arrays
  * (ΣffT, Σrf — rank²+rank doubles per key): map-side combine reduces
  * each partition to one stat row per present key, so the exchange
  * carries ≤ |keys|·P stat arrays regardless of rating count, with ZERO
  * row amplification (see [[solveSide]] for why this beats the SQL
  * explode formulation 8×). The per-key rank×rank ridge solve runs
  * INSIDE the partitions of the solved side (breeze LAPACK per key, no
  * driver round-trip); factor tables localCheckpoint per half-iteration
  * (the KMeans/BpeTrainer lineage rule). Driver state: nothing but conf.
  *
  * Determinism: the hash init is a pure column expression
  * (`xxhash64(id, pos)`), so runs are reproducible; the per-key float
  * sums share the fitted-model caveat of every model in the engine
  * (KMeans precedent) — bit-stability is per-partitioning, and the gate
  * asserts CONTRACTS (RMSE improvement vs baselines), not raw floats.
  */
object Als {

  case class Model(rank: Int, userFactors: DataFrame, itemFactors: DataFrame)

  /** Deterministic init: factor f(id)[p] = (xxhash64(id, p) mod 1000)/1000
    * − 0.5, scaled by 1/rank — zero-mean, reproducible, no RNG state. */
  private def initFactors(keys: DataFrame, rank: Int): DataFrame =
    keys.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        p => ((pmod(xxhash64(col("id"), p), lit(1000)).cast("double")
          / lit(1000.0)) - lit(0.5)) / lit(rank.toDouble)).as("f"))

  /** One half-iteration: re-solve `solveCol`'s factors with
    * `fixedCol`'s factors held fixed.
    *
    * The per-key sufficient statistics (ΣffT, Σrf — rank²+rank doubles)
    * accumulate via `aggregateByKey` over PRIMITIVE arrays: map-side
    * combine, ONE stat-array row per (key, partition) across the
    * exchange, zero row amplification. (A first draft expressed this as
    * a codegen'd posexplode + (key, pos) groupBy — SQL aggregation can
    * only see the array elementwise — and the 73× row blow-up through
    * two exchanges made the gate query 8× slower than this form; this is
    * the documented justification for the RDD aggregation.) The
    * rank×rank ridge solve runs in the same stage, per key, partitions
    * of the solved side — no driver round-trip. */
  private def solveSide(ratings: DataFrame, solveCol: String,
      fixedCol: String, fixed: DataFrame, rank: Int,
      lambda: Double): DataFrame = {
    val spark = ratings.sparkSession
    import spark.implicits._
    val statSize = rank * rank + rank
    val rKeyed = ratings
      .select(col(fixedCol).cast("long"), col(solveCol).cast("long"),
        col("r").cast("double"))
      .as[(Long, Long, Double)].rdd
      .map { case (fid, sid, r) => (fid, (sid, r)) }
    val fKeyed = fixed.select(col("id").cast("long"), col("f"))
      .as[(Long, Seq[Double])].rdd
      .mapValues(_.toArray)
    val solved = rKeyed.join(fKeyed)
      .map { case (_, ((sid, r), f)) => (sid, (f, r)) }
      .aggregateByKey(new Array[Double](statSize))(
        (acc, fr) => {
          val (f, r) = fr
          var i = 0
          while (i < rank) {
            val fi = f(i)
            var j = 0
            while (j < rank) { acc(i * rank + j) += fi * f(j); j += 1 }
            acc(rank * rank + i) += fi * r
            i += 1
          }
          acc
        },
        (a, b) => {
          var q = 0
          while (q < statSize) { a(q) += b(q); q += 1 }
          a
        })
      .map { case (sid, st) =>
        val a = new DenseMatrix[Double](rank, rank,
          java.util.Arrays.copyOfRange(st, 0, rank * rank))
        val b = DenseVector(
          java.util.Arrays.copyOfRange(st, rank * rank, statSize))
        var i = 0
        while (i < rank) { a(i, i) += lambda; i += 1 }
        (sid, (a \ b).toArray.toSeq)
      }
    spark.createDataset(solved).toDF("id", "f")
  }

  /** Train on (userCol, itemCol, ratingCol) with `iters` full
    * alternations. Ids must be integral; ratings double-castable. */
  def train(ratings: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rank: Int, iters: Int,
      lambda: Double = 0.1): Model = {
    require(rank >= 1 && iters >= 1, "need rank >= 1 and iters >= 1")
    val r = ratings.select(col(userCol).cast("long").as("u"),
      col(itemCol).cast("long").as("i"),
      col(ratingCol).cast("double").as("r"))
      .localCheckpoint()
    var items = initFactors(r.select(col("i").as("id")).distinct(), rank)
      .localCheckpoint()
    var users: DataFrame = null
    for (_ <- 1 to iters) {
      users = solveSide(r, "u", "i", items, rank, lambda).localCheckpoint()
      items = solveSide(r, "i", "u", users, rank, lambda).localCheckpoint()
    }
    Model(rank, users, items)
  }

  /** Root-mean-square error of the model on a ratings table — the
    * fit diagnostic every ALS contract gates on. */
  def rmse(model: Model, ratings: DataFrame, userCol: String,
      itemCol: String, ratingCol: String): Double = {
    val r = ratings.select(col(userCol).cast("long").as("u"),
      col(itemCol).cast("long").as("i"),
      col(ratingCol).cast("double").as("r"))
    val pred = r
      .join(model.userFactors.select(col("id").as("u"), col("f").as("uf")), "u")
      .join(model.itemFactors.select(col("id").as("i"), col("f").as("if")), "i")
      .select(col("r"), VectorFunctions.dot(col("uf"), col("if")).as("p"))
    val row = pred.agg(sqrt(avg(pow(col("r") - col("p"), 2))).as("rmse"))
      .collect()(0)
    row.getDouble(0)
  }
}
