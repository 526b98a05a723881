package graft.ext

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** PCA over an embedding column — the dimensionality-reduction primitive
  * of the vector pipeline (embedding compression ahead of ANN/PQ,
  * variance diagnostics, whitening). Reference context: the reference
  * stack serves fixed-width embedding columns; reducing them is the
  * standard pre-index move at corpus scale.
  *
  * == Fit (one pass, bounded state) ==
  *
  * The sufficient statistics of PCA are (n, Σx, Σxxᵀ) — d + d² numbers
  * regardless of corpus size. `fit` accumulates them per partition with
  * one `mapPartitions` pass (primitive double arrays, no per-row
  * allocation beyond the input row itself), merges the ≤P partition
  * states on the driver IN PARTITION-INDEX ORDER (deterministic for a
  * fixed partitioning — the float-sum caveat every fitted model in the
  * engine shares; KMeans' `avg`-built centroids are the precedent), and
  * eigendecomposes the d×d covariance with breeze's `eigSym` (a Spark
  * runtime jar — LAPACK symmetric eigensolver; d ≤ a few thousand is a
  * driver-side triviality). Eigenvector SIGN is fixed by convention —
  * the largest-|coordinate| entry is made positive (first such index on
  * ties) — so the model is reproducible run-to-run.
  *
  * == Project (codegen-friendly, no array math in the plan) ==
  *
  * Centering commutes with the dot product: (x − μ)·c = x·c − μ·c, and
  * μ·c is a SCALAR per component, precomputed at plan-build time. Each
  * output coordinate is therefore one codegen'd [[VectorFunctions.dot]]
  * against a literal component vector minus a literal double — the
  * projection stays inside whole-stage codegen with zero per-row array
  * allocation, and the model never ships as data (it is baked into the
  * plan as literals; at d·k in the few-thousands that is well under
  * task-binary budgets — beyond that, broadcast + a custom expression).
  */
object Pca {

  /** Fitted model: orthonormal components (rows, length `dim`), their
    * eigenvalues (sample covariance, 1/n convention), descending. */
  case class PcaModel(dim: Int, k: Int, n: Long, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def totalVariance: Double = eigenvalues.sum
    /** Fraction of total variance captured by the top `k` components. */
    def explainedRatio: Double = {
      val t = totalVariance
      if (t == 0.0) 1.0 else eigenvalues.take(k).sum / t
    }
  }

  /** Fit a `k`-component model on `vecCol` (`array<float|double>`, dense,
    * fixed width `dim`). One corpus pass; driver state O(d²). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val rows = df.select(col(vecCol).cast("array<double>"))
      .where(col(vecCol).isNotNull)

    // (partitionId, n, Σx, Σxxᵀ) per partition; merged driver-side in
    // partition-index order for run-to-run determinism.
    val parts = rows.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      val s = new Array[Double](dim)
      val ss = new Array[Double](dim * dim)
      it.foreach { row =>
        val v = row.getSeq[Double](0)
        require(v.length == dim, s"vector width ${v.length} != dim $dim")
        var i = 0
        while (i < dim) {
          val xi = v(i)
          s(i) += xi
          var j = i
          while (j < dim) { ss(i * dim + j) += xi * v(j); j += 1 }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty else Iterator((pid, n, s, ss))
    }.collect().sortBy(_._1)
    val n = parts.map(_._2).sum
    require(n > 1, "need at least 2 vectors to fit PCA")

    val sum = new Array[Double](dim)
    val sumSq = new Array[Double](dim * dim)
    parts.foreach { case (_, _, s, ss) =>
      var i = 0
      while (i < dim) { sum(i) += s(i); i += 1 }
      var q = 0
      while (q < dim * dim) { sumSq(q) += ss(q); q += 1 }
    }
    val mean = sum.map(_ / n)
    val cov = DenseMatrix.zeros[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = sumSq(i * dim + j) / n - mean(i) * mean(j)
        cov(i, j) = c
        cov(j, i) = c
        j += 1
      }
      i += 1
    }
    val eig = eigSym(cov) // ascending eigenvalues
    val order = (0 until dim).sortBy(idx => -eig.eigenvalues(idx))
    val comps = order.take(k).map { idx =>
      val v = eig.eigenvectors(::, idx).toArray
      // sign convention: largest-|coordinate| entry positive
      val m = v.indices.maxBy(p => (math.abs(v(p)), -p))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    val evs = order.take(k).map(idx => math.max(eig.eigenvalues(idx), 0.0)).toArray
    PcaModel(dim, k, n, mean, comps, evs)
  }

  /** Append `outCol` = the k-coordinate projection of `vecCol` onto the
    * model's components (mean-centered). Pure codegen'd dots against
    * literal vectors — see the class doc. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String): DataFrame = {
    val coords: Seq[Column] = model.components.map { c =>
      val offset = c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum
      VectorFunctions.dot(col(vecCol), typedLit(c.toSeq)) - lit(offset)
    }.toSeq
    df.withColumn(outCol, array(coords: _*))
  }

  /** Mean squared reconstruction error of the k-component model over the
    * corpus — the model-quality diagnostic (0 at k = dim up to float
    * noise; eigen-optimal for every k below). One pass over the
    * projected coordinates: ‖x − μ‖² − ‖proj‖² per row, averaged. */
  def reconstructionError(df: DataFrame, vecCol: String,
      model: PcaModel): Double = {
    val centeredSq = {
      val meanDot = VectorFunctions.dot(col(vecCol), typedLit(model.mean.toSeq))
      VectorFunctions.dot(col(vecCol), col(vecCol)) -
        lit(2.0) * meanDot + lit(model.mean.map(m => m * m).sum)
    }
    val projSq = (0 until model.k)
      .map(i => element_at(col("__proj"), i + 1))
      .map(c => c * c).reduce(_ + _)
    val row = project(df, vecCol, model, "__proj")
      .select(avg(centeredSq - projSq).as("mse"))
      .collect()(0)
    math.max(row.getDouble(0), 0.0)
  }
}
