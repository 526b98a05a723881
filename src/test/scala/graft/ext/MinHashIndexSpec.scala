package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The incremental dedup probe must be the SAME operator as the full
  * minHashLshPairs pass, restricted to (corpus × increment) pairs —
  * identical sketches, identical verification — and must survive the
  * IndexStore round-trip. */
class MinHashIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"))
  private val cut = 300L
  private lazy val corpus = docs.filter(col("doc_id") < cut)
  private lazy val increment = docs.filter(col("doc_id") >= cut)

  test("probe ≡ full-pass pairs restricted to the corpus×increment cross") {
    val idx = MinHashIndex.build(corpus, "doc_id", "text")
    try {
      val got = MinHashIndex.probe(idx, increment, "doc_id", "text",
        threshold = 0.8)
      val full = Dedup.minHashLshPairs(docs, "doc_id", "text",
          threshold = 0.8, shingleK = 3, numHashes = 128, bands = 32)
        .where(col("id_a") < cut && col("id_b") >= cut)
      assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
        "incremental probe must equal the full pass on cross pairs")
      assert(got.count() > 0, "gate data must actually contain cross dups")
    } finally MinHashIndex.drop(idx)
  }

  test("stored index round-trips: loaded probe ≡ in-memory probe") {
    val built = MinHashIndex.build(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mh").toString
    try {
      IndexStore.writeMinhash(built, dir)
      val loaded = IndexStore.loadMinhash(spark, dir)
      assert(loaded.numHashes === built.numHashes &&
        loaded.numBands === built.numBands &&
        loaded.shingleK === built.shingleK)
      val a = MinHashIndex.probe(loaded, increment, "doc_id", "text", 0.8)
      val b = MinHashIndex.probe(built, increment, "doc_id", "text", 0.8)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    } finally MinHashIndex.drop(built)
  }

  test("fingerprinted bundle: probeFp ≡ probe result-identical, fp fetch reads longs") {
    val built = MinHashIndex.build(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mhfp").toString
    try {
      IndexStore.writeMinhashFp(built, dir)
      val fp = IndexStore.loadMinhashFp(spark, dir)
      assert(fp.numHashes === built.numHashes &&
        fp.numBands === built.numBands && fp.shingleK === built.shingleK)
      // exact Jaccard over fingerprint sets ≡ over shingle strings on
      // the gate corpus (a 64-bit collision inside one pair's union is
      // the only divergence — ~1e-15 at these document sizes)
      val a = MinHashIndex.probeFp(fp, increment, "doc_id", "text", 0.8)
      val b = MinHashIndex.probe(built, increment, "doc_id", "text", 0.8)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "fingerprint verify must reproduce the string verify's pairs and values")
      assert(a.count() > 0, "the fixture must actually exercise the verify")
      // the stored fp column is long[], not string[] — the bytes claim
      val fpType = fp.fps.schema("fp").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      assert(fpType === org.apache.spark.sql.types.LongType,
        s"fp column must store 64-bit fingerprints, got $fpType")
    } finally MinHashIndex.drop(built)
  }

  test("SortedJaccard ≡ the array_intersect/array_union composition on sorted-distinct sets") {
    import org.apache.spark.sql.graft.SketchExprs
    val rnd = new scala.util.Random(19)
    val sets: Seq[(Seq[Long], Seq[Long])] =
      (1 to 60).map { _ =>
        val universe = (0 until 40).map(_ => rnd.nextLong() % 50)
        def pick() = rnd.shuffle(universe).take(rnd.nextInt(universe.size))
          .distinct.sorted
        (pick(), pick())
      } ++ Seq(
        (Seq.empty[Long], Seq.empty[Long]), // empty union → 0.0
        (Seq(1L, 2L), Seq.empty[Long]),
        (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)), // identical → 1.0
        (Seq(Long.MinValue, 0L), Seq(Long.MaxValue))) // disjoint extremes
    val df = spark.createDataFrame(sets.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a, b) }).toDF("i", "a", "b")
    val out = df.select(col("i"),
        SketchExprs.jaccardSorted(col("a"), col("b")).as("fast"),
        TextPrep.jaccard(col("a"), col("b")).as("ref"))
      .orderBy("i").collect()
    out.foreach(r => assert(r.getDouble(1) === r.getDouble(2),
      s"row ${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}"))
    // null propagation
    import spark.implicits._
    val withNull = Seq((Some(Seq(1L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
      .select(SketchExprs.jaccardSorted(col("a"), col("b")).as("j"))
      .collect()
    assert(withNull.head.isNullAt(0))
  }

  test("pruned stored probe: identical results, band predicate pushed, over-bound fallback identical") {
    val built = MinHashIndex.build(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mhp").toString
    // force the pruned route: the spec corpus sits far below the
    // production crossover the size router consults
    sys.props("graft.minhash.pruneMinBandRows") = "0"
    try {
      IndexStore.writeMinhash(built, dir)
      val loaded = IndexStore.loadMinhash(spark, dir)
      val pruned = MinHashIndex.probePruned(loaded, increment,
        "doc_id", "text", 0.8)
      val plain = MinHashIndex.probe(loaded, increment, "doc_id", "text", 0.8)
      assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
        "pruned probe must select the same candidates and verify identically")
      // the probed band keys reach the stored bands scan as pushed filters
      val explained = MinHashIndex.candidatesPruned(loaded,
          MinHashIndex.shingleSetsOf(increment, "doc_id", "text",
            loaded.shingleK))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(explained.contains("In(band_key") ||
        explained.contains("EqualTo(band_key"),
        s"band-key predicate not pushed:\n$explained")
      // past the key bound: the IN accelerator is skipped, results equal
      sys.props("graft.minhash.maxProbeKeys") = "4"
      try {
        val fb = MinHashIndex.probePruned(loaded, increment,
          "doc_id", "text", 0.8)
        assert(fb.exceptAll(plain).isEmpty && plain.exceptAll(fb).isEmpty,
          "join-only fallback must be result-identical")
      } finally sys.props.remove("graft.minhash.maxProbeKeys")
    } finally {
      sys.props.remove("graft.minhash.pruneMinBandRows")
      MinHashIndex.drop(built)
    }
  }

  test("size-routed pruning: below the crossover the plain join serves, above it the predicate prunes — results identical") {
    val built = MinHashIndex.build(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mhr").toString
    try {
      IndexStore.writeMinhash(built, dir)
      val loaded = IndexStore.loadMinhash(spark, dir)
      val sh = MinHashIndex.shingleSetsOf(increment, "doc_id", "text",
        loaded.shingleK)
      def explained(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // below the threshold (default 4M band rows ≫ this corpus): the
      // router must hand back the PLAIN join — no IN accelerator
      val below = MinHashIndex.candidatesPruned(loaded, sh)
      assert(!explained(below).contains("In(band_key"),
        "below the crossover the plain join must serve (no IN predicate)")
      // above (threshold forced to 0): pruned plan with the predicate
      sys.props("graft.minhash.pruneMinBandRows") = "0"
      val above =
        try MinHashIndex.candidatesPruned(loaded, sh)
        finally sys.props.remove("graft.minhash.pruneMinBandRows")
      assert(explained(above).contains("In(band_key") ||
        explained(above).contains("EqualTo(band_key"),
        "above the crossover the band-key predicate must push")
      // both routes: identical candidate sets
      assert(below.exceptAll(above).isEmpty && above.exceptAll(below).isEmpty,
        "size routing must not change results")
    } finally MinHashIndex.drop(built)
  }

  test("only the increment is sketched: corpus text never enters the probe plan") {
    val idx = MinHashIndex.build(corpus, "doc_id", "text")
    try {
      val probe = MinHashIndex.probe(idx, increment, "doc_id", "text", 0.8)
      // the probe's unresolved-to-optimized lineage must not re-read the
      // corpus docs' text: its only corpus-side inputs are the index's
      // persisted bands/shingles (InMemoryRelation after build)
      val plan = probe.queryExecution.optimizedPlan.toString
      assert(!plan.contains("doc_id < 300"),
        s"corpus filter leaked into the probe plan:\n$plan")
    } finally MinHashIndex.drop(idx)
  }
}
