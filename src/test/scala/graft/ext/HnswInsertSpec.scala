package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for [[Hnsw.insert]] — incremental append into a stored
  * shard-parallel HNSW graph. The load-bearing claim: an append-style
  * increment (new ids above every stored id) through rebuild+insert
  * yields the BIT-IDENTICAL graph a from-scratch build of the union
  * would, because every traversal decision is a function of the
  * adjacency sets with id tie-breaks, never of in-memory neighbor order.
  */
class HnswInsertSpec extends SparkSpec {

  private val params = Hnsw.Params(m = 4, efConstruction = 32, efSearch = 24)

  /** Deterministic pseudo-random unit-ish vectors (tie-free distances). */
  private def corpus(n: Int, dim: Int = 8): DataFrame = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(41)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def canon(g: DataFrame): Set[(Int, Long, Seq[Float], Seq[Seq[Long]])] =
    g.collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toSeq,
        r.getSeq[scala.collection.Seq[Long]](3).toSeq.map(_.toSeq.sorted))
    }.toSet

  test("append increment reproduces the from-scratch build row-for-row") {
    val all = corpus(240)
    for (shards <- Seq(1, 3)) {
      val base = all.where(col("vec_id") < 200)
      val inc = all.where(col("vec_id") >= 200)
      val built = Hnsw.build(all, "vec_id", "embedding", shards, params)
      val grown = Hnsw.insert(
        Hnsw.build(base, "vec_id", "embedding", shards, params),
        inc, "vec_id", "embedding", shards, params)
      assert(canon(grown) == canon(built), s"shards=$shards")
    }
  }

  test("incremental ≡ from-scratch through a store round-trip") {
    val all = corpus(160)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-inc").toString
    val base = all.where(col("vec_id") < 140)
    val inc = all.where(col("vec_id") >= 140)
    IndexStore.writeHnsw(
      Hnsw.build(base, "vec_id", "embedding", 2, params), params, dir)
    val (loaded, _) = IndexStore.loadHnsw(spark, dir)
    val grown = Hnsw.insert(loaded, inc, "vec_id", "embedding", 2, params)
    val built = Hnsw.build(all, "vec_id", "embedding", 2, params)
    assert(canon(grown) == canon(built))
  }

  test("duplicate vectors (distance ties) still append ≡ rebuild") {
    // The dedup-corpus shape: many IDENTICAL vectors force exact distance
    // ties, where beam exploration is sensitive to neighbor ITERATION
    // order. Canonical id-sorted adjacency (round-9 advisor item) makes
    // in-build order ≡ stored order, so the bit-identity claim holds on
    // tied inputs too — the round-9 spec deliberately used tie-free
    // random vectors and left this unproven.
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(53)
    val distinct = Array.fill(8)(Array.fill(6)(rnd.nextFloat() * 2f - 1f))
    // 96 vectors over only 8 distinct values -> 12-way exact ties each
    val all = (0 until 96).map(i =>
      (i.toLong, distinct(i % 8).toSeq)).toDF("vec_id", "embedding")
    for (shards <- Seq(1, 2)) {
      val base = all.where(col("vec_id") < 80)
      val inc = all.where(col("vec_id") >= 80)
      val built = Hnsw.build(all, "vec_id", "embedding", shards, params)
      val grown = Hnsw.insert(
        Hnsw.build(base, "vec_id", "embedding", shards, params),
        inc, "vec_id", "embedding", shards, params)
      assert(canon(grown) == canon(built), s"shards=$shards")
    }
  }

  test("empty increment is the identity") {
    val all = corpus(80)
    val g = Hnsw.build(all, "vec_id", "embedding", 2, params)
    val grown = Hnsw.insert(g, all.where(col("vec_id") < 0),
      "vec_id", "embedding", 2, params)
    assert(canon(grown) == canon(g))
  }

  test("increment into an empty shard set builds that shard from scratch") {
    val all = corpus(60)
    // base holds only even ids -> with shards=2, shard 1 starts empty
    val base = all.where(col("vec_id") % 2 === 0 && col("vec_id") < 40)
    val inc = all.where(col("vec_id") % 2 === 1 || col("vec_id") >= 40)
    val grown = Hnsw.insert(
      Hnsw.build(base, "vec_id", "embedding", 2, params),
      inc, "vec_id", "embedding", 2, params)
    assert(grown.select("id").distinct().count() == all.count())
    // degree caps still hold everywhere
    val d0max = grown.select(size(element_at(col("levels"), 1)).as("d0"))
      .agg(max("d0")).head().getInt(0)
    assert(d0max <= 2 * params.m)
  }

  test("non-append increment still searches at full recall on planted geometry") {
    val s = spark; import s.implicits._
    // 3 orthogonal clusters; the increment carries LOW ids (non-append)
    val pts = for (c <- 0 until 3; i <- 0 until 20) yield {
      val v = Array.fill(6)(0.01f * ((c + i) % 3))
      v(c * 2) = 1.0f
      ((c * 20 + i).toLong, v.toSeq)
    }
    val all = pts.toDF("vec_id", "embedding")
    val base = all.where(col("vec_id") >= 10)
    val inc = all.where(col("vec_id") < 10)
    val grown = Hnsw.insert(
      Hnsw.build(base, "vec_id", "embedding", 2, params),
      inc, "vec_id", "embedding", 2, params)
    val probes = all.where(col("vec_id").isin(0L, 25L, 45L))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val got = Hnsw.search(grown, probes, "probe_id", "pv", k = 5, params)
    val exact = Similarity.bruteForceTopK(all, probes, "vec_id", "embedding",
      "probe_id", "pv", 5)
    val rc = Similarity.recallContract(got, exact, "probe_id", "vec_id",
      k = 5, minHits = 4.0).collect()
    assert(rc.length == 3 && rc.forall(_.getBoolean(2)),
      rc.mkString("; ")) // contract: every probe passes the floor
  }
}
