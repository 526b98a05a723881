package graft.ext

import breeze.linalg.{DenseMatrix, DenseVector}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Als]] contracts: near-exact recovery of an exactly-factorizable
  * matrix, agreement with an independent single-node ALS reference run
  * from the SAME init, monotone improvement over iterations, and a
  * global-mean baseline beat.
  */
class AlsSpec extends SparkSpec {
  import spark.implicits._

  /** Fully observed rank-2 ground truth: r(u,i) = uf(u)·if(i). */
  private def syntheticRatings(nU: Int, nI: Int): Seq[(Long, Long, Double)] = {
    def uf(u: Int) = Array(1.0 + (u % 3) * 0.5, 0.5 + (u % 5) * 0.25)
    def itf(i: Int) = Array(0.8 + (i % 4) * 0.3, 1.2 - (i % 3) * 0.4)
    for (u <- 0 until nU; i <- 0 until nI) yield {
      val p = uf(u).zip(itf(i)).map(q => q._1 * q._2).sum
      (u.toLong, i.toLong, p)
    }
  }

  test("recovers an exactly-factorizable matrix (RMSE ≈ 0)") {
    val df = syntheticRatings(20, 15).toDF("u", "i", "r")
    val m = Als.train(df, "u", "i", "r", rank = 2, iters = 8, lambda = 0.01)
    val e = Als.rmse(m, df, "u", "i", "r")
    assert(e < 0.05, s"rmse $e")
  }

  test("RMSE improves with iterations and beats the global-mean baseline") {
    val df = syntheticRatings(15, 12).toDF("u", "i", "r")
    val e1 = Als.rmse(Als.train(df, "u", "i", "r", 2, 1, 0.01), df, "u", "i", "r")
    val e5 = Als.rmse(Als.train(df, "u", "i", "r", 2, 5, 0.01), df, "u", "i", "r")
    assert(e5 < e1, s"$e5 !< $e1")
    val base = {
      val rows = df.select(col("r")).as[Double].collect()
      val mean = rows.sum / rows.length
      math.sqrt(rows.map(x => (x - mean) * (x - mean)).sum / rows.length)
    }
    assert(e5 < base * 0.5, s"als $e5 vs baseline $base")
  }

  test("matches an independent single-node ALS run from the same init") {
    val rank = 2
    val lambda = 0.05
    val ratings = syntheticRatings(8, 6)
    val df = ratings.toDF("u", "i", "r")
    val m = Als.train(df, "u", "i", "r", rank, iters = 3, lambda = lambda)

    // Reference: same alternation schedule in plain breeze, starting from
    // the SAME deterministic init (read back from the engine's init
    // expression so the hash seeding itself is shared, not re-derived).
    val init = {
      // initFactors is private; recompute the same deterministic column
      // expression so the hash seeding is shared, not re-derived
      df.select(col("i").cast("long").as("id")).distinct()
        .select(col("id"),
          transform(sequence(lit(0), lit(rank - 1)),
            p => ((pmod(xxhash64(col("id"), p), lit(1000)).cast("double")
              / lit(1000.0)) - lit(0.5)) / lit(rank.toDouble)).as("f"))
        .as[(Long, Seq[Double])].collect().toMap
    }
    var itemF: Map[Long, DenseVector[Double]] =
      init.map { case (k, v) => k -> DenseVector(v.toArray) }
    var userF: Map[Long, DenseVector[Double]] = Map.empty
    def solve(byKey: Map[Long, Seq[(Long, Double)]],
        fixed: Map[Long, DenseVector[Double]]): Map[Long, DenseVector[Double]] =
      byKey.map { case (k, obs) =>
        val a = DenseMatrix.zeros[Double](rank, rank)
        val b = DenseVector.zeros[Double](rank)
        obs.foreach { case (fid, r) =>
          val f = fixed(fid)
          a += f * f.t
          b += f * r
        }
        (0 until rank).foreach(d => a(d, d) += lambda)
        k -> (a \ b)
      }
    val byUser = ratings.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(x => (x._2, x._3)).toSeq }
    val byItem = ratings.groupBy(_._2).map { case (i, xs) =>
      i -> xs.map(x => (x._1, x._3)).toSeq }
    for (_ <- 1 to 3) {
      userF = solve(byUser, itemF)
      itemF = solve(byItem, userF)
    }
    val gotU = m.userFactors.as[(Long, Seq[Double])].collect().toMap
    gotU.foreach { case (u, f) =>
      f.zip(userF(u).toArray).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"user $u: $a vs $b")
      }
    }
  }

  test("choleskySolve matches breeze LU on random SPD ridge systems") {
    // the r18 solver swap: packed-triangle stats + in-place Cholesky must
    // reproduce the previous breeze `\` path to machine precision
    val rnd = new scala.util.Random(7)
    for (rank <- Seq(1, 2, 4, 8); _ <- 1 to 5) {
      val tri = rank * (rank + 1) / 2
      // build stats from k random factor/rating observations, exactly as
      // the aggregateByKey seqOp does
      val st = new Array[Double](tri + rank)
      val full = DenseMatrix.zeros[Double](rank, rank)
      val rhs = DenseVector.zeros[Double](rank)
      for (_ <- 1 to rank + 3) {
        val f = Array.fill(rank)(rnd.nextDouble() - 0.5)
        val r = rnd.nextDouble()
        var i = 0; var p = 0
        while (i < rank) {
          var j = i
          while (j < rank) { st(p) += f(i) * f(j); j += 1; p += 1 }
          st(tri + i) += f(i) * r
          i += 1
        }
        val fv = DenseVector(f)
        full += fv * fv.t
        rhs += fv * r
      }
      val lambda = 0.1
      (0 until rank).foreach(d => full(d, d) += lambda)
      val want = (full \ rhs).toArray
      val got = Als.choleskySolve(st, rank, tri, lambda)
      want.zip(got).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"rank $rank: $a vs $b")
      }
    }
  }
}
