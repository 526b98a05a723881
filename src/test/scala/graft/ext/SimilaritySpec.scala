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

  test("native lsh_signatures ≡ independent plain-Scala hyperplane recomputation, bucket for bucket") {
    // independent reference: the SAME deterministic draw re-derived here
    // with no engine code — Random(42) Gaussians in (table, bit, dim)
    // order, double dot in element order, strict > 0 sign rule. This is
    // the bit-compatibility contract every stored LSH bundle depends on
    // (an append hashes new vectors against planes frozen at build time).
    val (tables, bits, dim) = (4, 11, 64)
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(tables * bits * dim)(rnd.nextGaussian())
    def refBuckets(v: Seq[Float]): Seq[Long] =
      (0 until tables).map { t =>
        (0 until bits).foldLeft(0L) { (acc, b) =>
          val base = (t * bits + b) * dim
          var s = 0.0
          var i = 0
          val n = math.min(dim, v.size)
          while (i < n) { s += v(i).toDouble * planes(base + i); i += 1 }
          if (s > 0) acc | (1L << b) else acc
        }
      }
    val rows = emb.where(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = Similarity.lshBuckets(emb.where(col("vec_id") < 50),
        "vec_id", "embedding", tables, bits, dim)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(got.keySet === rows.keySet)
    got.foreach { case (id, buckets) =>
      assert(buckets === refBuckets(rows(id)),
        s"vector $id: native signatures diverge from the reference draw")
    }
    // the struct-array wrapper serves the same assignments
    val viaArray = emb.where(col("vec_id") < 50)
      .select(col("vec_id"),
        explode(Similarity.lshBucketArray(col("embedding"), tables, bits, dim))
          .as("tb"))
      .select(col("vec_id"), col("tb.table_id"), col("tb.bucket"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(viaArray === got, "lshBucketArray wrapper diverged from lshBuckets")
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

  test("lshTopKQ8 recall matches the float LSH path; final scores are float-exact") {
    val q8 = topkSet(Similarity.lshTopKQ8(emb, probes, "vec_id", "embedding",
      "probe_id", "pv", 10, tables = 8, dim = 64))
    val recall = brute.map { case (p, ids) =>
      q8.getOrElse(p, Nil).count(ids.contains).toDouble / ids.size
    }.sum / brute.size
    assert(recall >= 0.3, s"Q8-verify LSH recall@10 = $recall")
    // the re-rank emits EXACT float cosine — quantization never leaks
    // into reported scores
    val bruteScores = Similarity.bruteForceTopK(emb, probes, "vec_id",
      "embedding", "probe_id", "pv", 500)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    Similarity.lshTopKQ8(emb, probes, "vec_id", "embedding", "probe_id", "pv", 10)
      .collect().foreach(r =>
        assert(bruteScores((r.getLong(0), r.getLong(1))) === r.getDouble(2)))
  }

  test("prebuilt IVF index: search equals the build-per-query path, build runs once") {
    val idx = IvfIndex.buildTrained(emb, "vec_id", "embedding",
      nCentroids = 8, lloydIters = 2)
    try {
      val prebuilt = IvfIndex.search(idx, emb, probes, "vec_id", "embedding",
        "probe_id", "pv", k = 10, nprobe = 3)
      val perQuery = Similarity.ivfTopKTrained(emb, probes, "vec_id", "embedding",
        "probe_id", "pv", k = 10, nCentroids = 8, nprobe = 3, lloydIters = 2)
      assert(prebuilt.exceptAll(perQuery).isEmpty &&
        perQuery.exceptAll(prebuilt).isEmpty,
        "prebuilt-index search must equal the per-query build result")
      // centroids are driver-pinned: a LocalRelation leaf, no Lloyd rerun
      val leaves = idx.centroids.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode => l
      }
      assert(leaves.forall(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    } finally IvfIndex.drop(idx)
  }

  test("q8 verify representation is ≤ 1/3 the parquet bytes of the float one") {
    val dir = java.nio.file.Files.createTempDirectory("q8bytes")
    val base = Quantize.int8(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("fv")), "fv")
    base.select(col("vec_id"), col("fv"))
      .write.mode("overwrite").parquet(s"$dir/float")
    base.select(col("vec_id"), col("q8"))
      .write.mode("overwrite").parquet(s"$dir/q8")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (fb, qb) = (bytes(s"$dir/float"), bytes(s"$dir/q8"))
    // theoretical 8× (double→int8); parquet packs ints as INT32 but
    // bit-packs/RLEs the small magnitudes, so ≥3× measured is the floor
    assert(qb * 3 <= fb, s"q8 bytes $qb vs float bytes $fb — expected ≥3× cut")
  }
}
