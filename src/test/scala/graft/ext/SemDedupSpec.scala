package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SemDedupSpec extends SparkSpec {

  private lazy val embeddings = Tables.embeddings(spark, sf0001)

  // plant exact duplicates of vecs 0..9 under ids 1000.. — cosine 1 to
  // their originals, identical centroid scores, so they co-cluster with
  // them deterministically (assignAgg tie-break) and MUST be dropped
  private lazy val planted = embeddings.select("vec_id", "embedding")
    .unionByName(embeddings.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding")))

  test("planted exact duplicates are dropped; their originals are kept") {
    val verdict = SemDedup.dedup(planted, "vec_id", "embedding",
      k = 8, lloydIters = 2, tau = 0.95).cache()
    val copies = verdict.where(col("vec_id") >= 1000)
    assert(copies.count() === 10)
    assert(copies.where(col("kept")).count() === 0,
      "every planted copy has its original as an earlier τ-witness")
    assert(verdict.where(col("vec_id") < 10 && !col("kept")).count() === 0,
      "originals (min ids in their ε-groups) must survive")
    assert(verdict.count() === 510)
  }

  test("both contract invariants hold on the real corpus") {
    val verdict = SemDedup.dedup(embeddings, "vec_id", "embedding",
      k = 8, lloydIters = 2, tau = 0.4)
    val rows = SemDedup.contract(verdict, embeddings, "vec_id", "embedding",
      k = 8, tau = 0.4).collect()
    assert(rows.length === 8)
    assert(rows.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      rows.mkString(", "))
  }

  test("contract catches violations, not just blesses output") {
    val verdict = SemDedup.dedup(planted, "vec_id", "embedding",
      k = 8, lloydIters = 2, tau = 0.95).cache()
    // keep everything → τ-similar kept pairs exist → kept_ok flips
    val allKept = verdict.withColumn("kept", lit(true))
    val c1 = SemDedup.contract(allKept, planted, "vec_id", "embedding",
      k = 8, tau = 0.95).collect()
    assert(c1.exists(!_.getBoolean(1)), c1.mkString(", "))
    // drop everything → witness-less dropped points exist (each
    // cluster's min id) → dropped_ok flips
    val allDropped = verdict.withColumn("kept", lit(false))
    val c2 = SemDedup.contract(allDropped, planted, "vec_id", "embedding",
      k = 8, tau = 0.95).collect()
    assert(c2.exists(!_.getBoolean(2)), c2.mkString(", "))
  }

  test("deterministic across runs; cluster ids dense in [0, k)") {
    val run = () => SemDedup.dedup(embeddings, "vec_id", "embedding",
      k = 8, lloydIters = 1, tau = 0.4)
    val (v1, v2) = (run(), run())
    assert(v1.exceptAll(v2).isEmpty && v2.exceptAll(v1).isEmpty)
    val ids = v1.select(col("cluster_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.forall(c => c >= 0 && c < 8), ids.mkString(","))
  }
}
