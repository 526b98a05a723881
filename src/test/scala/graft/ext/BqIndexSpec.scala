package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** N15 — 1-bit binary quantization + Hamming shortlist serving.
  *
  * Pins: (1) the packed signature matches an independent plain-Scala
  * recomputation of the sign-bit/32-bit-lane contract on real corpus
  * vectors; (2) Hamming is an exact popcount-of-xor (self = 0,
  * symmetric, Scala-recomputed); (3) the stored serve path is
  * result-identical to the in-plan twin; (4) append ≡ rebuild
  * bit-for-bit (the signature is a pure function of the vector — the
  * strongest append equivalence in the store); (5) the shortlist-id
  * predicate reaches the float-vector scan (the O(shortlist) fetch is
  * the design, not an accident); (6) compaction folds the inc chain
  * with identical serving; (7) recall floor vs exact brute force. */
class BqIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("binarySig matches a plain-Scala recomputation (32-bit lanes)") {
    val got = emb.select(col("vec_id"),
        Quantize.binarySig(col("embedding"), 64).as("sig"))
      .orderBy("vec_id").limit(50).collect()
    val raw = emb.orderBy("vec_id").limit(50).collect()
    got.zip(raw).foreach { case (g, r) =>
      val vec = r.getSeq[Float](1)
      val expect = (0 until 2).map { w =>
        (0 until 32).foldLeft(0L) { (acc, i) =>
          if (vec(w * 32 + i) > 0f) acc | (1L << i) else acc
        }
      }
      assert(g.getSeq[Long](1) == expect, s"vec_id ${g.getLong(0)}")
    }
  }

  test("hamming: zero on self, symmetric, equals Scala popcount") {
    val sigs = emb.select(col("vec_id"),
        Quantize.binarySig(col("embedding"), 64).as("sig"))
      .orderBy("vec_id").limit(10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    val df = spark.createDataFrame(sigs.map { case (id, s) =>
      (id, s)
    }.toIndexedSeq).toDF("id", "sig")
    val a = df.select(col("id").as("id_a"), col("sig").as("sa"))
    val b = df.select(col("id").as("id_b"), col("sig").as("sb"))
    val got = a.crossJoin(b)
      .select(col("id_a"), col("id_b"),
        Quantize.hamming(col("sa"), col("sb")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byId = sigs.toMap
    for ((ia, sa) <- sigs; (ib, sb) <- sigs) {
      val expect = sa.zip(sb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y).toLong
      }.sum
      assert(got((ia, ib)) == expect)
      assert(got((ia, ib)) == got((ib, ia)))
      if (ia == ib) assert(got((ia, ib)) == 0L)
    }
    assert(byId.size == 10)
  }

  test("stored serve ≡ in-plan twin; append ≡ rebuild; pushdown; compact") {
    val dir = java.nio.file.Files.createTempDirectory("bq").toString
    val full = emb
    val base = full.where(col("vec_id") < 350)
    val inc = full.where(col("vec_id") >= 350)
    val probes = full.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

    // incremental lifecycle: build on base, append the rest
    IndexStore.writeBq(base, "vec_id", "embedding", dim = 64, s"$dir/i")
    IndexStore.appendBq(inc, "vec_id", "embedding", s"$dir/i")
    val b = IndexStore.loadBq(spark, s"$dir/i")

    // append ≡ rebuild bit-for-bit (both tables)
    IndexStore.writeBq(full, "vec_id", "embedding", dim = 64, s"$dir/r")
    val rb = IndexStore.loadBq(spark, s"$dir/r")
    assert(b.sigs.orderBy("vec_id").collect().toSeq ==
      rb.sigs.orderBy("vec_id").collect().toSeq)
    assert(b.vectors.select("vec_id").orderBy("vec_id").collect().toSeq ==
      rb.vectors.select("vec_id").orderBy("vec_id").collect().toSeq)

    // stored ≡ in-plan (scores included)
    val stored = BqIndex.searchStored(b, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, rerankFactor = 4)
      .orderBy("probe_id", "cos_sim", "vec_id").collect().toSeq
    val inplan = BqIndex.topK(full, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, dim = 64, rerankFactor = 4)
      .orderBy("probe_id", "cos_sim", "vec_id").collect().toSeq
    assert(stored == inplan)
    assert(stored.size == 50)

    // the shortlist-id predicate reaches the float-vector scan
    val shortlist = BqIndex.hammingShortlist(b.sigs, probes, "vec_id",
      "probe_id", "pv", keep = 40, dim = 64)
    val ids = shortlist.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val plan = b.vectors.where(col("vec_id").isin(ids: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(vec_id"),
      s"no pushed In filter in:\n$plan")

    // compaction folds the inc chain; serving identical
    IndexStore.compact(spark, s"$dir/i")
    val bc = IndexStore.loadBq(spark, s"$dir/i")
    val afterCompact = BqIndex.searchStored(bc, probes, "vec_id",
      "embedding", "probe_id", "pv", k = 10, rerankFactor = 4)
      .orderBy("probe_id", "cos_sim", "vec_id").collect().toSeq
    assert(afterCompact == stored)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/i/inc")))
  }

  test("routed bundle: all-lists ≡ unrouted; append ≡ rebuild; pushdown; compact") {
    val dir = java.nio.file.Files.createTempDirectory("ivfbq").toString
    val full = emb
    val probes = full.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

    IndexStore.writeIvfBq(full.where(col("vec_id") < 350), "vec_id",
      "embedding", dim = 64, nCentroids = 8, lloydIters = 3, s"$dir/i")
    IndexStore.appendIvfBq(full.where(col("vec_id") >= 350), "vec_id",
      "embedding", s"$dir/i")
    val b = IndexStore.loadIvfBq(spark, s"$dir/i")

    // append ≡ rebuild-with-frozen-params: re-derive the expected rows
    // from the STORED centroids over the full corpus (assignment is a
    // pure per-row argmin; packing is parameter-free)
    val expectRows = Similarity.ivfAssign(full, "vec_id", "embedding",
        b.centroids)
      .join(BqIndex.signatures(full, "vec_id", "embedding", 64), Seq("vec_id"))
      .select(col("centroid_id"), col("vec_id"), col("sig"))
      .orderBy("centroid_id", "vec_id").collect().toSeq
    assert(b.rows.orderBy("centroid_id", "vec_id").collect().toSeq
      == expectRows)

    // nprobe = all lists → routing admits everything → IDENTICAL to the
    // unrouted two-stage (same shortlist semantics, same re-rank)
    val all = BqIndex.searchRouted(b, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nprobe = 8, rerankFactor = 4)
      .orderBy("probe_id", "cos_sim", "vec_id").collect().toSeq
    val unrouted = BqIndex.topK(full, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, dim = 64, rerankFactor = 4)
      .orderBy("probe_id", "cos_sim", "vec_id").collect().toSeq
    assert(all == unrouted)

    // routed (nprobe 4 of 8) still returns k rows per probe and the
    // probed-list predicate reaches the signature scan
    val routed = BqIndex.searchRouted(b, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nprobe = 4, rerankFactor = 4)
    val counts = routed.groupBy("probe_id").count()
      .collect().map(_.getLong(1))
    assert(counts.length == 5 && counts.forall(_ == 10L))
    val plan = b.rows.where(col("centroid_id").isin(Seq(0L, 1L): _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(centroid_id"),
      s"no pushed In filter on the rows scan:\n$plan")

    // compaction folds the inc chain; all-lists serving identical
    IndexStore.compact(spark, s"$dir/i")
    val bc = IndexStore.loadIvfBq(spark, s"$dir/i")
    val afterCompact = BqIndex.searchRouted(bc, probes, "vec_id",
      "embedding", "probe_id", "pv", k = 10, nprobe = 8, rerankFactor = 4)
      .orderBy("probe_id", "cos_sim", "vec_id").collect().toSeq
    assert(afterCompact == all)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/i/inc")))
  }

  test("recall floor vs exact brute force (rerankFactor 4, k 10)") {
    val probes = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val ann = BqIndex.topK(emb, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, dim = 64, rerankFactor = 4)
    val exact = Similarity.bruteForceTopK(emb, probes, "vec_id",
      "embedding", "probe_id", "pv", 10)
    val hits = ann.join(exact.select("probe_id", "vec_id"),
        Seq("probe_id", "vec_id"), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mean = (0L until 20L).map(p => hits.getOrElse(p, 0L)).sum / 20.0
    info(s"per-probe hits: ${(0L until 20L).map(p => hits.getOrElse(p, 0L)).mkString(",")}")
    info(f"mean recall@10 = ${mean / 10.0}%.2f")
    assert(mean >= 3.0, s"mean hits $mean under floor")
  }
}
