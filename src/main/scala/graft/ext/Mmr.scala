package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity layer of the serving stack: retrievers (BM25 R1/R2,
  * dense N-family, fused R3) return the most RELEVANT k, which for a
  * near-duplicate-rich corpus means k copies of the same answer; MMR
  * greedily picks argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), trading
  * relevance against similarity to what's already selected.
  *
  * Scale shape — the RRF rule ([[HybridRetrieval]]): the expensive work
  * (scoring the corpus) already happened on each retriever's own scale
  * path; MMR touches only the retrieved candidate list, which is
  * driver-bounded BY CONSTRUCTION (a top-n result). The greedy is
  * inherently sequential (selection i depends on 1..i−1), so it runs
  * driver-side over the ≤`maxCandidates` rows — the k-row-centroid
  * class of bounded driver state, not a distributed-work dodge.
  *
  * Determinism: cosine in doubles over the candidate vectors; ties
  * break (score desc, id asc); scores round to 6 dp in the output. A
  * candidate identical to one already selected contributes sim = 1, so
  * exact duplicates are maximally penalized — with λ < 1 a duplicate
  * can never outrank a distinct candidate of equal relevance.
  */
object Mmr {

  /** Diversified top-k over a retrieved candidate list.
    *
    * `candidates`: (idCol: integral, relCol: numeric, vecCol: numeric
    * array) — every numeric input type is accepted via analysis-time
    * casts (array<float> and array<double> vectors both occur in the
    * retriever family); a null relevance or vector is rejected with a
    * clear error rather than a downstream NPE.
    * Returns (rank, idCol, rel, mmr_score) — rank 1-based in selection
    * order. `lambda` = 1 degrades to plain relevance top-k. */
  def rerank(spark: org.apache.spark.sql.SparkSession, candidates: DataFrame,
      idCol: String, relCol: String, vecCol: String, k: Int,
      lambda: Double, maxCandidates: Int = 10000): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0,1]")
    val rows = candidates
      .select(col(idCol).cast("long"), col(relCol).cast("double"),
        col(vecCol).cast("array<double>"))
      .limit(maxCandidates + 1).collect()
    require(rows.length <= maxCandidates,
      s"MMR reranks retrieved top-n lists (<= $maxCandidates rows); " +
        "run a retriever first")

    final case class Cand(id: Long, rel: Double, vec: Array[Double])
    val cands = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
        s"MMR candidate with null $idCol/$relCol/$vecCol: $r")
      Cand(r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray)
    }.sortBy(c => (-c.rel, c.id))

    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Cand, Double)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.map { c =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cosine(c.vec, s._1.vec)).max
        (c, lambda * c.rel - (1 - lambda) * maxSim)
      }
      val best = scored.minBy { case (c, s) => (-s, c.id) }
      selected += best
      remaining -= best._1
    }

    val out = selected.zipWithIndex.map { case ((c, s), i) =>
      Row(i + 1, c.id, c.rel,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("mmr_score", DoubleType, nullable = false))))
  }
}
