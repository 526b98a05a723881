package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IndexStoreSpec extends SparkSpec {

  // uncached: autoBits sizes from parquet footer stats (production shape)
  private lazy val embeddings = Tables.embeddings(spark, sf0001)
  private lazy val probes = embeddings.where(col("vec_id") < 5)
    .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  private def tmp(): String =
    Files.createTempDirectory("graft-idxstore").toString

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, hint)

  test("LSH index round-trips: loaded search ≡ in-memory search, meta intact") {
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    val dir = tmp()
    try {
      IndexStore.writeLsh(built, dir)
      val loaded = IndexStore.loadLsh(spark, dir)
      assert(loaded.tables === built.tables && loaded.bits === built.bits &&
        loaded.dim === built.dim)
      assertSame(
        LshIndex.search(loaded, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10),
        LshIndex.search(built, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10),
        "search through the stored index must equal the in-memory index")
    } finally LshIndex.drop(built)
  }

  test("IVF index round-trips and the loaded centroids are driver-pinned") {
    val built = IvfIndex.buildTrained(embeddings, "vec_id", "embedding",
      nCentroids = 8, lloydIters = 2)
    val dir = tmp()
    try {
      IndexStore.writeIvf(built, dir)
      val loaded = IndexStore.loadIvf(spark, dir)
      assertSame(
        IvfIndex.search(loaded, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10, nprobe = 2),
        IvfIndex.search(built, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10, nprobe = 2),
        "search through the stored index must equal the in-memory index")
      // centroids must be a LocalRelation (broadcast with zero recompute),
      // not a lazy file scan re-read by every search plan
      assert(loaded.centroids.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty, loaded.centroids.queryExecution.optimizedPlan.toString)
    } finally IvfIndex.drop(built)
  }

  test("PQ index round-trips: ADC search ≡, codebooks and params intact") {
    val built = Pq.build(embeddings, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2, dim = 64)
    val dir = tmp()
    try {
      IndexStore.writePq(built, dir)
      val loaded = IndexStore.loadPq(spark, dir)
      assert(loaded.m === built.m && loaded.ksub === built.ksub)
      assertSame(loaded.codebooks, built.codebooks, "codebooks differ")
      assertSame(
        Pq.search(loaded, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10),
        Pq.search(built, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10),
        "search through the stored index must equal the in-memory index")
    } finally Pq.drop(built)
  }

  test("kmeans clustering round-trips: loaded dedup ≡ in-memory dedup") {
    val built = SemDedup.cluster(embeddings, "vec_id", "embedding",
      k = 8, lloydIters = 2)
    val dir = tmp()
    try {
      IndexStore.writeKmeans(built, dir)
      val loaded = IndexStore.loadKmeans(spark, dir)
      assert(loaded.idCol === "vec_id")
      assertSame(
        SemDedup.dedupClustered(embeddings, "embedding", loaded, tau = 0.4),
        SemDedup.dedupClustered(embeddings, "embedding", built, tau = 0.4),
        "dedup through the stored clustering must equal the in-memory one")
      assert(loaded.centroids.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty, loaded.centroids.queryExecution.optimizedPlan.toString)
    } finally SemDedup.drop(built)
  }

  test("appendIvf == assign-on-rebuild: frozen centroids, identical lists") {
    // the N6′ contract: assignment is a pure per-row argmin against the
    // stored centroids, so appending the increment's assignments must
    // yield exactly the table a rebuild-with-frozen-centroids would
    val cut = 450L
    val base = embeddings.where(col("vec_id") < cut)
    val inc = embeddings.where(col("vec_id") >= cut)
    val built = IvfIndex.buildTrained(base, "vec_id", "embedding",
      nCentroids = 8, lloydIters = 2)
    val dir = tmp()
    try {
      IndexStore.writeIvf(built, dir)
      IndexStore.appendIvf(inc, "vec_id", "embedding", dir)
      val loaded = IndexStore.loadIvf(spark, dir)
      assertSame(loaded.assignment,
        Similarity.ivfAssign(embeddings, "vec_id", "embedding",
          loaded.centroids),
        "appended assignment must equal assigning the union against the " +
          "frozen stored centroids")
      // increment fully searchable through the appended bundle: search over
      // the union corpus ≡ search through an index whose lists were
      // re-assigned from scratch with the same centroids
      val rebuilt = IvfIndex.Index(loaded.centroids,
        Similarity.ivfAssign(embeddings, "vec_id", "embedding",
          loaded.centroids))
      assertSame(
        IvfIndex.search(loaded, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10, nprobe = 2),
        IvfIndex.search(rebuilt, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10, nprobe = 2),
        "search through the appended bundle must equal the frozen-centroid rebuild")
    } finally IvfIndex.drop(built)
  }

  test("appendPq == encode-on-rebuild: frozen codebooks, identical codes") {
    // the N8′ contract: encoding is a pure per-row per-subspace argmin
    // against the stored codebooks, so appended codes must be
    // code-for-code what a rebuild-with-frozen-codebooks would emit
    val cut = 450L
    val base = embeddings.where(col("vec_id") < cut)
    val inc = embeddings.where(col("vec_id") >= cut)
    val built = Pq.build(base, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2, dim = 64)
    val dir = tmp()
    try {
      IndexStore.writePq(built, dir)
      IndexStore.appendPq(inc, "vec_id", "embedding", dir)
      val loaded = IndexStore.loadPq(spark, dir)
      assertSame(loaded.codes,
        Pq.encode(embeddings, "vec_id", "embedding", loaded.codebooks,
          loaded.m, 64),
        "appended codes must equal encoding the union against the frozen " +
          "stored codebooks")
      assert(loaded.codes.count() === embeddings.count(),
        "every union vector must carry exactly one code row")
    } finally Pq.drop(built)
  }

  test("kind mismatch is refused, not misparsed") {
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 4, dim = 64)
    val dir = tmp()
    try {
      IndexStore.writeLsh(built, dir)
      val e = intercept[IllegalArgumentException] {
        IndexStore.loadPq(spark, dir)
      }
      assert(e.getMessage.contains("lsh") && e.getMessage.contains("pq"))
    } finally LshIndex.drop(built)
  }
}
