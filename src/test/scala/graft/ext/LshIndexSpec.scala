package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class LshIndexSpec extends SparkSpec {

  // NOT cached: autoBits sizes buckets from parquet footer counts; a
  // .cache() swaps the leaf for an InMemoryRelation whose size-estimate
  // stats would mis-size bits. Production (q177) reads parquet the same way.
  private lazy val embeddings = Tables.embeddings(spark, sf0001)
  private lazy val probes = embeddings.where(col("vec_id") < 5)
    .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  test("prebuilt-signature search equals lshTopK exactly (same planes, same buckets)") {
    val idx = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    try {
      val viaIndex = LshIndex.search(idx, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val inQuery = Similarity.lshTopK(embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10,
        tables = 8, bits = idx.bits, dim = 64)
      assert(viaIndex.exceptAll(inQuery).isEmpty &&
        inQuery.exceptAll(viaIndex).isEmpty,
        "index search must be the same operator with the corpus pass hoisted")
    } finally LshIndex.drop(idx)
  }

  test("pruned search over a STORED index: identical results, filter pushed to the parquet scan") {
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-pruned").toString
    try {
      IndexStore.writeLsh(built, dir)
      val loaded = IndexStore.loadLsh(spark, dir)
      val pruned = LshIndex.searchPruned(loaded, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val plain = LshIndex.search(built, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
        "bucket pruning must not change results — it selects a join-key superset")
      // the probe buckets must reach the parquet reader as pushed filters
      // (row-group skipping on the (table_id, bucket)-sorted layout).
      // Plan assertion via the formatted explain: AQE wraps finalized
      // stages in leaf QueryStageExec nodes, so a TreeNode.collect can't
      // reach the scan — the explain string renders the whole tree.
      val explained = pruned.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val scanBlock = explained.linesIterator
        .filter(l => l.contains("PushedFilters")).mkString("\n")
      assert(scanBlock.contains("In(bucket") || scanBlock.contains("EqualTo(bucket"),
        s"bucket predicate not pushed:\n$explained")
    } finally LshIndex.drop(built)
  }

  test("stored search (pruned fetch): identical results, id predicate pushed to the vectors scan") {
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-stored").toString
    try {
      IndexStore.writeLsh(built, dir)
      IndexStore.writeLshVectors(embeddings, "vec_id", "embedding", dir)
      val loaded = IndexStore.loadLsh(spark, dir)
      val vectors = IndexStore.loadLshVectors(spark, dir)
      val stored = LshIndex.searchStored(loaded, vectors, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val plain = LshIndex.search(built, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      assert(stored.exceptAll(plain).isEmpty && plain.exceptAll(stored).isEmpty,
        "pruned fetch must not change results — the id predicate selects " +
          "exactly the candidate rows the join keeps")
      // the candidate ids must reach the vectors parquet reader as a
      // pushed filter (row-group skipping on the id-sorted layout)
      val explained = stored.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val scanBlock = explained.linesIterator
        .filter(l => l.contains("PushedFilters")).mkString("\n")
      assert(scanBlock.contains("In(vec_id") || scanBlock.contains("EqualTo(vec_id"),
        s"candidate-id predicate not pushed:\n$explained")
    } finally LshIndex.drop(built)
  }

  test("bucketed search: identical results, one pruned scan, no fetch join") {
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-lshb").toString
    try {
      IndexStore.writeLshBucketed(built, embeddings, "vec_id", "embedding", dir)
      val bucketed = IndexStore.loadLshBucketed(spark, dir)
      assert(bucketed.tables === built.tables && bucketed.bits === built.bits)
      val viaBucketed = LshIndex.searchBucketed(bucketed, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val plain = LshIndex.search(built, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      assert(viaBucketed.exceptAll(plain).isEmpty &&
        plain.exceptAll(viaBucketed).isEmpty,
        "bucketed path must select the same candidates and re-rank exactly")
      val explained = viaBucketed.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // the probed buckets reach the ONE scan as pushed filters...
      val scanBlock = explained.linesIterator
        .filter(_.contains("PushedFilters")).mkString("\n")
      assert(scanBlock.contains("In(bucket") || scanBlock.contains("EqualTo(bucket"),
        s"bucket predicate not pushed:\n$scanBlock")
      // ...and the bundle contributes exactly ONE scan: signatures and
      // vectors arrive together — no second fetch scan of a vectors
      // table (the searchStored shape). Probe-side scans of the
      // embeddings table are expected and not counted.
      val bundleScans = explained.linesIterator
        .count(l => l.contains("Location") && l.contains(dir))
      assert(bundleScans === 1,
        s"expected ONE bundle scan, found $bundleScans:\n$explained")
    } finally LshIndex.drop(built)
  }

  test("bucketed INT8 search: equals the float bucketed path, recall floor holds, q8 pruned scan") {
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    val dirF = java.nio.file.Files.createTempDirectory("graft-lshb-f").toString
    val dirQ = java.nio.file.Files.createTempDirectory("graft-lshb-q").toString
    try {
      IndexStore.writeLshBucketed(built, embeddings, "vec_id", "embedding", dirF)
      IndexStore.writeLshBucketedQ8(built, embeddings, "vec_id", "embedding", dirQ)
      val bucketed = IndexStore.loadLshBucketed(spark, dirF)
      val q8 = IndexStore.loadLshBucketedQ8(spark, dirQ)
      assert(q8.tables === built.tables && q8.bits === built.bits)
      val viaQ8 = LshIndex.searchBucketedQ8(q8, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val viaFloat = LshIndex.searchBucketed(bucketed, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      // result EQUALITY, scores included: candidate selection is stored
      // (identical buckets), the int8 shortlist at rerankFactor=4 retains
      // every true top-10 on this corpus, and the float tail re-scores
      // with the same rounded cosine
      assert(viaQ8.exceptAll(viaFloat).isEmpty &&
        viaFloat.exceptAll(viaQ8).isEmpty,
        "int8 bundle must reproduce the float bundle's results exactly")
      // recall contract (the q30 floor) through the q8 path
      val exact = Similarity.bruteForceTopK(embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", 10)
      val contract = Similarity.recallContract(viaQ8, exact,
        "probe_id", "vec_id", k = 10, minHits = 2.0).collect()
      assert(contract.forall(_.getBoolean(2)), "recall floor broken")
      // the shortlist COLLECT severs the executed plan: the returned
      // search plan is the float tail (whose vectors fetch must carry
      // the shortlist-id pushdown), and the candidate stage — exposed as
      // bucketedQ8Scored for exactly this assertion — must carry the
      // bucket pushdown into the q8 rows scan
      val tail = viaQ8.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
      assert(tail.contains("In(vec_id") || tail.contains("EqualTo(vec_id"),
        s"shortlist-id predicate not pushed to the vectors fetch:\n$tail")
      val probesF = probes.select(col("probe_id").as("pid"),
        col("pv").cast("array<double>").as("pv"))
      val candStage = LshIndex.bucketedQ8Scored(q8, probesF, "vec_id")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
      assert(candStage.contains("In(bucket") || candStage.contains("EqualTo(bucket"),
        s"bucket predicate not pushed to the q8 rows scan:\n$candStage")
    } finally LshIndex.drop(built)
  }

  test("appendLshBucketedQ8 == rebuild: identical rows and identical search") {
    val base = embeddings.where(col("vec_id") < 120)
    val inc = embeddings.where(col("vec_id") >= 120)
    val builtBase = LshIndex.build(base, "vec_id", "embedding",
      tables = 8, bits = 4, dim = 64)
    val builtAll = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, bits = 4, dim = 64)
    val dirA = java.nio.file.Files.createTempDirectory("graft-lshbq-app").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft-lshbq-reb").toString
    try {
      IndexStore.writeLshBucketedQ8(builtBase, base, "vec_id", "embedding", dirA)
      IndexStore.appendLshBucketedQ8(inc, "vec_id", "embedding", dirA)
      IndexStore.writeLshBucketedQ8(builtAll, embeddings, "vec_id", "embedding", dirR)
      val appended = IndexStore.loadLshBucketedQ8(spark, dirA)
      val rebuilt = IndexStore.loadLshBucketedQ8(spark, dirR)
      assert(appended.rows.exceptAll(rebuilt.rows).isEmpty &&
        rebuilt.rows.exceptAll(appended.rows).isEmpty,
        "frozen-parameter hashing + per-row quantization ⇒ bit-identical rows")
      val sa = LshIndex.searchBucketedQ8(appended, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val sr = LshIndex.searchBucketedQ8(rebuilt, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      assert(sa.exceptAll(sr).isEmpty && sr.exceptAll(sa).isEmpty)
    } finally { LshIndex.drop(builtBase); LshIndex.drop(builtAll) }
  }

  test("bucketed search past the probe-key bound: join-only fallback, identical results") {
    val built = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-lshbf").toString
    try {
      IndexStore.writeLshBucketed(built, embeddings, "vec_id", "embedding", dir)
      val bucketed = IndexStore.loadLshBucketed(spark, dir)
      // 5 probes × 8 tables ≫ 4 keys: the driver-built IN-predicate must
      // be SKIPPED (no unbounded collect, no mega-OR), and the bucket
      // equi-join alone must still produce the exact same results
      sys.props("graft.lsh.maxProbeKeys") = "4"
      try {
        val fallback = LshIndex.searchBucketed(bucketed, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10)
        val explained = fallback.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert(!explained.contains("In(bucket"),
          "over-bound probe set must not build the driver-side IN predicate")
        val plain = LshIndex.search(built, embeddings, probes,
          "vec_id", "embedding", "probe_id", "pv", k = 10)
        assert(fallback.exceptAll(plain).isEmpty &&
          plain.exceptAll(fallback).isEmpty,
          "join-only fallback must be result-identical")
      } finally sys.props.remove("graft.lsh.maxProbeKeys")
    } finally LshIndex.drop(built)
  }

  test("appendLshBucketed == rebuild: identical rows and identical search") {
    val base = embeddings.where(col("vec_id") < 400)
    val inc = embeddings.where(col("vec_id") >= 400)
    val builtBase = LshIndex.build(base, "vec_id", "embedding",
      tables = 8, bits = 6, dim = 64)
    val builtAll = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, bits = 6, dim = 64)
    val dirA = java.nio.file.Files.createTempDirectory("graft-lshb-app").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft-lshb-reb").toString
    try {
      IndexStore.writeLshBucketed(builtBase, base, "vec_id", "embedding", dirA)
      IndexStore.appendLshBucketed(inc, "vec_id", "embedding", dirA)
      IndexStore.writeLshBucketed(builtAll, embeddings, "vec_id", "embedding", dirR)
      val a = IndexStore.loadLshBucketed(spark, dirA)
      val r = IndexStore.loadLshBucketed(spark, dirR)
      assert(a.rows.select("table_id", "bucket", "vec_id")
        .exceptAll(r.rows.select("table_id", "bucket", "vec_id")).isEmpty &&
        r.rows.select("table_id", "bucket", "vec_id")
          .exceptAll(a.rows.select("table_id", "bucket", "vec_id")).isEmpty,
        "frozen-plane append must reproduce the rebuild's assignment rows")
      val sa = LshIndex.searchBucketed(a, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val sr = LshIndex.searchBucketed(r, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      assert(sa.exceptAll(sr).isEmpty && sr.exceptAll(sa).isEmpty)
    } finally { LshIndex.drop(builtBase); LshIndex.drop(builtAll) }
  }

  test("auto-bits sizing matches the in-query path and needs no corpus job") {
    val idx = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 4, dim = 64)
    try {
      // 500 vectors → ceil(log2(500/32)) = 4 (clamped floor)
      assert(idx.bits === 4)
      assert(idx.tables === 4)
      // signatures: one row per (vector, table)
      assert(idx.buckets.count() === embeddings.count() * 4)
    } finally LshIndex.drop(idx)
  }

  test("recall contract holds through the prebuilt path") {
    val idx = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, dim = 64)
    try {
      val ann = LshIndex.search(idx, embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", k = 10)
      val exact = Similarity.bruteForceTopK(embeddings, probes,
        "vec_id", "embedding", "probe_id", "pv", 10)
      val contract = Similarity.recallContract(ann, exact, "probe_id",
        "vec_id", k = 10, minHits = 2.0).collect()
      assert(contract.length === 5 && contract.forall(_.getBoolean(2)),
        contract.mkString(", "))
    } finally LshIndex.drop(idx)
  }

  test("appendLsh == rebuild: identical bucket rows AND identical search") {
    val base = embeddings.where(col("vec_id") < 400)
    val inc = embeddings.where(col("vec_id") >= 400)
    val dirApp = java.nio.file.Files.createTempDirectory("lsh-app").toString
    val dirFull = java.nio.file.Files.createTempDirectory("lsh-full").toString

    val builtBase = LshIndex.build(base, "vec_id", "embedding",
      tables = 8, dim = 64)
    IndexStore.writeLsh(builtBase, dirApp)
    IndexStore.writeLshVectors(base, "vec_id", "embedding", dirApp)
    LshIndex.drop(builtBase)
    IndexStore.appendLsh(inc, "vec_id", "embedding", dirApp)

    // rebuild over the union AT THE SAME bits (append freezes build-time
    // bits by contract; the from-scratch twin must hash identically)
    val bits = IndexStore.loadLsh(spark, dirApp).bits
    val builtFull = LshIndex.build(embeddings, "vec_id", "embedding",
      tables = 8, bits = bits, dim = 64)
    IndexStore.writeLsh(builtFull, dirFull)
    IndexStore.writeLshVectors(embeddings, "vec_id", "embedding", dirFull)
    LshIndex.drop(builtFull)

    val appended = IndexStore.loadLsh(spark, dirApp)
    val rebuilt = IndexStore.loadLsh(spark, dirFull)
    assert(appended.buckets.exceptAll(rebuilt.buckets).isEmpty &&
      rebuilt.buckets.exceptAll(appended.buckets).isEmpty,
      "appended bucket rows must be exactly the rebuild's")

    val sApp = LshIndex.searchStored(appended,
      IndexStore.loadLshVectors(spark, dirApp), probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10)
    val sFull = LshIndex.searchStored(rebuilt,
      IndexStore.loadLshVectors(spark, dirFull), probes,
      "vec_id", "embedding", "probe_id", "pv", k = 10)
    assert(sApp.exceptAll(sFull).isEmpty && sFull.exceptAll(sApp).isEmpty,
      "search over the appended bundle must equal the rebuilt bundle's")
    // the increment is actually searchable: its ids can appear in results
    val vecCount = IndexStore.loadLshVectors(spark, dirApp).count()
    assert(vecCount === embeddings.count())
  }
}
