package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Contracts for shard-parallel [[Hnsw]]: structural invariants (degree
  * caps, deterministic levels), exact-recovery on planted geometry,
  * recall vs brute force on the real embeddings, store round-trip
  * determinism, and partitioning invariance. */
class HnswSpec extends SparkSpec {

  private lazy val embeddings = Tables.embeddings(spark, sf0001)
  private lazy val probes = embeddings.where(col("vec_id") < 5)
    .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  private val params = Hnsw.Params(m = 8, efConstruction = 64, efSearch = 48)

  test("levels are deterministic md5 draws with the geometric profile") {
    val ls = (0L until 4096L).map(Hnsw.levelOf(_, 8))
    assert(ls.forall(_ >= 0))
    // P(level >= 1) = 1/m: 4096 draws at m=8 -> ~512, wide tolerance
    val deep = ls.count(_ >= 1)
    assert(deep > 300 && deep < 750, s"level>=1 count $deep")
    assert(ls == (0L until 4096L).map(Hnsw.levelOf(_, 8)), "not deterministic")
  }

  test("graph invariants: every node present once, degree caps hold") {
    val g = Hnsw.build(embeddings, "vec_id", "embedding", shards = 4, params)
      .cache()
    try {
      assert(g.count() == embeddings.count())
      assert(g.select("id").distinct().count() == embeddings.count())
      // level 0 capped at 2M, higher levels at M
      val caps = g.select(col("id"),
          size(element_at(col("levels"), 1)).as("d0"),
          when(size(col("levels")) > 1,
            size(element_at(col("levels"), 2))).as("d1"))
        .agg(max("d0").as("m0"), max("d1").as("m1")).head()
      assert(caps.getInt(0) <= 2 * params.m, s"level-0 degree ${caps.getInt(0)}")
      assert(caps.isNullAt(1) || caps.getInt(1) <= params.m)
      // shard assignment is the declared pmod
      val bad = g.filter(pmod(col("id"), lit(4)).cast("int") =!= col("shard_id")).count()
      assert(bad == 0)
    } finally g.unpersist()
  }

  test("planted geometry: the true nearest cluster is retrieved exactly") {
    val s = spark; import s.implicits._
    // 4 tight clusters at orthogonal axes in R^8, 32 points each
    val pts = for {
      c <- 0 until 4
      i <- 0 until 32
    } yield {
      val base = Array.fill(8)(0.01f * ((c * 31 + i * 7) % 5))
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.1f * (i % 3)
      ((c * 32 + i).toLong, base.toSeq)
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val g = Hnsw.build(corpus, "vec_id", "embedding", shards = 2, params)
    val probe = Seq((1000L, {
      val v = Array.fill(8)(0.0f); v(2) = 1.0f; v.toSeq // cluster 1's axis
    })).toDF("probe_id", "pv")
    val got = Hnsw.search(g, probe, "probe_id", "pv", k = 10, params)
      .collect().map(_.getLong(1)).toSet
    assert(got.forall(id => id >= 32 && id < 64),
      s"retrieved outside the true cluster: $got")
    assert(got.size == 10)
  }

  test("recall contract vs brute force on the real embeddings") {
    val g = Hnsw.build(embeddings, "vec_id", "embedding", shards = 4, params)
    val ann = Hnsw.search(g, probes, "probe_id", "pv", k = 10, params)
    val exact = Similarity.bruteForceTopK(embeddings, probes,
      "vec_id", "embedding", "probe_id", "pv", 10)
    val contract = Similarity.recallContract(ann, exact, "probe_id",
      "vec_id", k = 10, minHits = 7.0).collect()
    assert(contract.length == 5 && contract.forall(_.getBoolean(2)),
      contract.mkString(", "))
  }

  test("store round-trip: loaded graph searches identically, kind is checked") {
    val g = Hnsw.build(embeddings, "vec_id", "embedding", shards = 4, params)
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw").toString
    IndexStore.writeHnsw(g, params, dir)
    val (loaded, p2) = IndexStore.loadHnsw(spark, dir)
    assert(p2 == params)
    val a = Hnsw.search(g, probes, "probe_id", "pv", k = 10, params)
    val b = Hnsw.search(loaded, probes, "probe_id", "pv", k = 10, p2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "stored search must equal in-memory search row for row")
    intercept[IllegalArgumentException] {
      IndexStore.loadLsh(spark, dir)
    }
  }

  test("resident serving: warm searches equal cold, clearResident releases") {
    // the serving path: prepared (shard-clustered, persisted) input +
    // executor-pinned decoded graphs — results must be identical to the
    // plain path on every rep, warm or cold
    val g = Hnsw.build(embeddings, "vec_id", "embedding", shards = 4, params)
    val prepared = Hnsw.prepareServing(g)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val key = "hnsw-spec-resident-" + System.nanoTime()
      val plain = Hnsw.search(g, probes, "probe_id", "pv", k = 10, params)
      val cold = Hnsw.search(prepared, probes, "probe_id", "pv", k = 10,
        params, residentKey = Some(key), prepared = true)
      assert(plain.exceptAll(cold).isEmpty && cold.exceptAll(plain).isEmpty,
        "cold resident search must equal the plain path")
      // second run hits the resident graphs (rows drained, no decode)
      val warm = Hnsw.search(prepared, probes, "probe_id", "pv", k = 10,
        params, residentKey = Some(key), prepared = true)
      assert(plain.exceptAll(warm).isEmpty && warm.exceptAll(plain).isEmpty,
        "warm resident search must equal the plain path")
      Hnsw.clearResident(key)
      val after = Hnsw.search(prepared, probes, "probe_id", "pv", k = 10,
        params, residentKey = Some(key), prepared = true)
      assert(plain.exceptAll(after).isEmpty && after.exceptAll(plain).isEmpty,
        "post-clear search must rebuild and still match")
    } finally { prepared.unpersist(); () }
  }

  test("partitioning invariance: input layout does not change the graph") {
    val a = Hnsw.build(embeddings, "vec_id", "embedding", shards = 3, params)
    val b = Hnsw.build(embeddings.repartition(13), "vec_id", "embedding",
      shards = 3, params)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "graph must be a pure function of (corpus, shards, params)")
  }
}
