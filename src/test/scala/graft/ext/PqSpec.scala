package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class PqSpec extends SparkSpec {

  private lazy val embeddings = Tables.embeddings(spark, sf0001).cache()
  private lazy val probes = embeddings.where(col("vec_id") < 5)
    .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  /** Corpus whose subvectors come from a tiny alphabet: PQ must become a
    * LOSSLESS code (every cell's members are identical, so each trained
    * centroid equals its members exactly and reconstruction is exact). */
  private def plantedCorpus() = {
    // dim 8, m 2 → subspaces of 4; subvector alphabet {e0, e1} per
    // subspace; corpus = the 4 combinations × 3 copies, distinct ids
    val e = Seq(
      Seq(1.0, 0.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0, 0.0))
    val rows = for {
      copy <- 0 until 3
      i <- 0 until 2
      j <- 0 until 2
    } yield ((copy * 4 + i * 2 + j).toLong, e(i) ++ e(j))
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

  test("PQ is lossless on an alphabet corpus: reconstruction is exact") {
    val corpus = plantedCorpus()
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, ksub = 4,
      iters = 2, dim = 8)
    assert(cb.count() === 8L, "m·ksub codebook rows")
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb, m = 2, dim = 8)
    val recon = Pq.reconstruct(codes, "vec_id", cb, m = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // unit-normalized original: 1/√2 at the two hot positions
    val h = 1.0 / math.sqrt(2.0)
    plantedCorpus().collect().foreach { r =>
      val id = r.getLong(0)
      val expected = r.getSeq[Double](1).map(_ * h)
      val got = recon(id)
      assert(got.size === 8)
      got.zip(expected).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-12, s"vec $id reconstruction drift")
      }
    }
  }

  test("ADC top-k equals brute force when reconstruction is exact") {
    val corpus = plantedCorpus()
    val p = corpus.where(col("vec_id") < 2)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val pq = Pq.topK(corpus, p, "vec_id", "embedding", "probe_id", "pv",
      k = 5, m = 2, ksub = 4, iters = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(corpus, p, "vec_id", "embedding",
      "probe_id", "pv", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq === exact)
  }

  test("codes are m ints in [0, ksub) for every corpus vector") {
    val cb = Pq.train(embeddings, "vec_id", "embedding", m = 8, ksub = 16,
      iters = 1, dim = 64)
    val codes = Pq.encode(embeddings, "vec_id", "embedding", cb, m = 8, dim = 64)
    val bad = codes.where(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad === 0L)
    assert(codes.count() === embeddings.count())
  }

  test("recall contract holds on the gate embeddings (uniform worst case)") {
    val ann = Pq.topK(embeddings, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, m = 8, ksub = 16, iters = 2, dim = 64)
    val exact = Similarity.bruteForceTopK(embeddings, probes,
      "vec_id", "embedding", "probe_id", "pv", 10)
    val contract = Similarity.recallContract(ann, exact, "probe_id",
      "vec_id", k = 10, minHits = 2.0).collect()
    assert(contract.length === 5)
    assert(contract.forall(_.getBoolean(2)),
      s"recall floor: ${contract.mkString(", ")}")
  }

  test("prebuilt index search equals the build-per-query composition") {
    val idx = Pq.build(embeddings, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2, dim = 64)
    try {
      // codebooks are driver-pinned: search plans must not re-run Lloyd
      assert(idx.codebooks.queryExecution.optimizedPlan.collectLeaves()
        .forall(_.getClass.getSimpleName.contains("LocalRelation")))
      val viaIndex = Pq.search(idx, embeddings, probes, "vec_id", "embedding",
        "probe_id", "pv", k = 10)
      val composed = Pq.topK(embeddings, probes, "vec_id", "embedding",
        "probe_id", "pv", k = 10, m = 8, ksub = 16, iters = 2, dim = 64)
      assert(viaIndex.exceptAll(composed).isEmpty &&
        composed.exceptAll(viaIndex).isEmpty)
    } finally Pq.drop(idx)
  }

  test("IVF-PQ restricts ADC to the probed lists and keeps the recall floor") {
    val ivf = IvfIndex.buildTrained(embeddings, "vec_id", "embedding",
      nCentroids = 8, lloydIters = 2)
    val pq = Pq.build(embeddings, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2, dim = 64)
    try {
      val ann = Pq.searchIvfAdc(ivf, pq, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10,
        nprobe = 4, rerankFactor = 8)
      val exact = Similarity.bruteForceTopK(embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", 10)
      val contract = Similarity.recallContract(ann, exact, "probe_id",
        "vec_id", k = 10, minHits = 2.0).collect()
      assert(contract.length === 5 && contract.forall(_.getBoolean(2)),
        contract.mkString(", "))
      // with every list probed the candidate set is the whole corpus:
      // IVF-PQ degrades to plain ADC — the composition is sound
      val allLists = Pq.searchIvfAdc(ivf, pq, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10,
        nprobe = 8, rerankFactor = 4)
      val plain = Pq.search(pq, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      assert(allLists.exceptAll(plain).isEmpty && plain.exceptAll(allLists).isEmpty)
    } finally { IvfIndex.drop(ivf); Pq.drop(pq) }
  }

  test("PQ search is deterministic across runs") {
    val run = () => Pq.topK(embeddings, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, m = 8, ksub = 16, iters = 1, dim = 64)
    val a = run(); val b = run()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
