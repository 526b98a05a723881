package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val probes = emb.where(col("vec_id") < 5)
    .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap

  private lazy val brute = topkSet(
    Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", "probe_id", "pv", 10)
      .orderBy(col("probe_id"), col("cos_sim").desc, col("vec_id")))

  test("bruteForceTopK returns k ordered neighbors per probe, excluding self") {
    assert(brute.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(brute.values.forall(_.size == 10))
    brute.foreach { case (p, ids) => assert(!ids.contains(p)) }
  }

  test("lshTopK candidates re-rank exactly and achieve nontrivial recall") {
    val lsh = topkSet(Similarity.lshTopK(emb, probes, "vec_id", "embedding",
      "probe_id", "pv", 10, tables = 8, bits = 6, dim = 64))
    // Uniform-random vectors are ANN's worst case; still, 8 tables × 6 bits
    // must beat random-candidate recall by a wide margin. Random subset of
    // ~8*1/64 ≈ 12% of corpus would give recall ≈ 0.12.
    val recall = brute.map { case (p, ids) =>
      lsh.getOrElse(p, Nil).count(ids.contains).toDouble / ids.size
    }.sum / brute.size
    assert(recall >= 0.3, s"LSH recall@10 = $recall")
  }

  test("ivfTopK achieves nontrivial recall") {
    val ivf = topkSet(Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
      "probe_id", "pv", 10, nCentroids = 16, nprobe = 4))
    val recall = brute.map { case (p, ids) =>
      ivf.getOrElse(p, Nil).count(ids.contains).toDouble / ids.size
    }.sum / brute.size
    // nprobe/ncentroids = 1/4 of the corpus scanned ⇒ expect ≳ that fraction.
    assert(recall >= 0.25, s"IVF recall@10 = $recall")
  }

  test("approximate scores are exact cosine (re-rank correctness)") {
    val bruteScores = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", "probe_id", "pv", 500)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lshScores = Similarity.lshTopK(emb, probes, "vec_id", "embedding", "probe_id", "pv", 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    lshScores.foreach { case (k, v) => assert(bruteScores(k) === v) }
  }
}
