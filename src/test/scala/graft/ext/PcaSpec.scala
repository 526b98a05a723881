package graft.ext

import breeze.linalg.{eigSym, DenseMatrix}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pca]] contracts: recovery of planted structure, exact agreement with
  * an independent single-node covariance+eigen reference, orthonormality,
  * projection arithmetic, reconstruction-error behavior, and the sign
  * convention's run-to-run determinism.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Deterministic pseudo-random corpus with planted 2D structure:
    * x = a·u + b·v + ε, u/v orthogonal, ε small. */
  private def planted(n: Int): Seq[Seq[Double]] = {
    val u = Array(1.0, 1, 1, 1, 0, 0, 0, 0).map(_ / 2.0)
    val v = Array(0.0, 0, 0, 0, 1, 1, 1, 1).map(_ / 2.0)
    (0 until n).map { i =>
      val r = new scala.util.Random(i * 2654435761L)
      val (a, b) = (r.nextGaussian() * 3.0, r.nextGaussian() * 1.5)
      (0 until dim).map(j =>
        a * u(j) + b * v(j) + r.nextGaussian() * 0.01).toSeq
    }
  }

  private def fit(data: Seq[Seq[Double]], k: Int, parts: Int = 4) =
    Pca.fit(data.toDF("v").repartition(parts), "v", dim, k)

  test("recovers the planted subspace; explained ratio near 1 at k=2") {
    val data = planted(500)
    val m = fit(data, k = 2)
    assert(m.explainedRatio > 0.999)
    // the planted directions lie in the span of the top-2 components
    val u = Array(0.5, 0.5, 0.5, 0.5, 0, 0, 0, 0)
    val inSpan = m.components.map(c => c.zip(u).map(p => p._1 * p._2).sum)
      .map(x => x * x).sum
    assert(math.abs(inSpan - 1.0) < 1e-3) // ‖proj_span(u)‖² ≈ ‖u‖² = 1
  }

  test("agrees with an independent single-node reference") {
    val data = planted(300)
    val m = fit(data, k = dim)
    // reference: plain covariance + eigSym on the driver
    val n = data.size
    val mean = (0 until dim).map(j => data.map(_(j)).sum / n)
    val cov = DenseMatrix.tabulate(dim, dim) { (i, j) =>
      data.map(x => x(i) * x(j)).sum / n - mean(i) * mean(j)
    }
    val eig = eigSym(cov)
    val refEvs = eig.eigenvalues.toArray.sorted.reverse
    m.eigenvalues.zip(refEvs).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"eigenvalue $a vs $b")
    }
    // components match up to sign (convention makes them exact, but the
    // reference here does not apply it — compare |cos|)
    val refComps = (0 until dim).sortBy(i => -eig.eigenvalues(i))
      .map(i => eig.eigenvectors(::, i).toArray)
    m.components.zip(refComps).take(2).foreach { case (a, b) =>
      val cos = a.zip(b).map(p => p._1 * p._2).sum
      assert(math.abs(math.abs(cos) - 1.0) < 1e-6)
    }
  }

  test("components are orthonormal; sign convention is deterministic") {
    val data = planted(200)
    val m = fit(data, k = 4)
    for (i <- 0 until 4; j <- i until 4) {
      val d = m.components(i).zip(m.components(j)).map(p => p._1 * p._2).sum
      val exp = if (i == j) 1.0 else 0.0
      assert(math.abs(d - exp) < 1e-9, s"⟨c$i, c$j⟩ = $d")
    }
    m.components.foreach { c =>
      val mx = c.indices.maxBy(p => (math.abs(c(p)), -p))
      assert(c(mx) > 0, "sign convention: largest-|coord| positive")
    }
    val m2 = fit(data, k = 4)
    assert(m.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
  }

  test("project matches driver-side arithmetic; reconstruction error behaves") {
    val data = planted(150)
    val m = fit(data, k = 2)
    val got = Pca.project(data.toDF("v"), "v", m, "p")
      .select("p").as[Seq[Double]].collect()
    data.zip(got).foreach { case (x, p) =>
      m.components.zipWithIndex.foreach { case (c, i) =>
        val exp = c.zip(x).map(q => q._1 * q._2).sum -
          c.zip(m.mean).map(q => q._1 * q._2).sum
        assert(math.abs(p(i) - exp) < 1e-9)
      }
    }
    val full = Pca.reconstructionError(data.toDF("v"), "v", fit(data, dim))
    assert(full < 1e-9) // k = dim reconstructs exactly
    val e1 = Pca.reconstructionError(data.toDF("v"), "v", fit(data, 1))
    val e2 = Pca.reconstructionError(data.toDF("v"), "v", m)
    assert(e1 > e2 && e2 < 0.01) // monotone; planted rank-2 ⇒ tiny at k=2
  }
}
