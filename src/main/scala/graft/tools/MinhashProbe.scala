package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{IndexStore, MinHashIndex}

/** One-off calibration probe for the stored-MinHash serving path (not a
  * gate) — the q187/LshProbe measurement discipline applied to the
  * ST14/ST17 verify stage (VERDICT r11, Next-round #5): splits a batch
  * probe against a STORED bundle into its candidate half (band-key join)
  * and the full path (candidates + doc-clustered shingle FETCH + exact
  * Jaccard), so the fetch+verify term is measured rather than guessed.
  * If the fetch dominates and grows with the corpus the way q187's
  * vector fetch did, a band-clustered shingle layout
  * (`writeMinhashBucketed`) is the next lever; if not, the doc-clustered
  * layout stands. `MinhashProbe <sfDir> [passes] [probeDocs]`. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val nProbe = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = graft.GraftSession.local("minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, d, "documents")
      .select(col("doc_id"), col("text"))
    val built = MinHashIndex.build(docs, "doc_id", "text",
      shingleK = 5, numHashes = 128, numBands = 32)
    val dir = java.nio.file.Files.createTempDirectory("minhash-probe").toString
    IndexStore.writeMinhash(built, dir)
    MinHashIndex.drop(built)
    val loaded = IndexStore.loadMinhash(spark, dir)
    // probes: real corpus docs under shifted ids (realistic near-dup
    // hits; the shift keeps the self-pair guard out of the measurement)
    val probes = docs.where(col("doc_id") < nProbe)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val probeSh = MinHashIndex.shingleSetsOf(probes, "doc_id", "text",
      loaded.shingleK).persist()
    probeSh.count() // probe-side prep paid outside every timed window
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to passes).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[minhash-probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("candidates")(MinHashIndex.candidates(loaded, probeSh))
    // force the pruned path (the size router would hand the plain join
    // back below the crossover — this probe MEASURES both sides so the
    // router's threshold stays an empirical number)
    sys.props("graft.minhash.pruneMinBandRows") = "0"
    try time("candidates_pruned")(MinHashIndex.candidatesPruned(loaded, probeSh))
    finally sys.props.remove("graft.minhash.pruneMinBandRows")
    // the production route at this corpus size (whichever side the
    // default threshold picks)
    time("candidates_routed")(MinHashIndex.candidatesPruned(loaded, probeSh))
    time("probe_full")(
      MinHashIndex.candidates(loaded, probeSh)
        .join(loaded.shingles.select(col("doc_id").as("id_a"),
          col("sh").as("sh_a")), Seq("id_a"))
        .join(probeSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.ext.TextPrep.jaccard(col("sh_a"), col("sh_b")), 6)
            .as("jaccard"))
        .where(col("jaccard") >= 0.8))
    // fingerprinted verify side (round 14): IDENTICAL candidate stage
    // and pre-paid probe prep — only the fetch changes, so the delta vs
    // probe_full isolates the string-vs-fingerprint fetch bytes
    IndexStore.writeMinhashFp(loaded, dir + "fp")
    val fp = IndexStore.loadMinhashFp(spark, dir + "fp")
    val probeFpSide = probeSh
      .select(col("doc_id"), MinHashIndex.fpOf(col("sh")).as("fp"))
      .persist()
    probeFpSide.count() // probe-side prep paid outside the timed window
    time("probe_full_fp")(
      MinHashIndex.candidates(loaded, probeSh)
        .join(fp.fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")),
          Seq("id_a"))
        .join(probeFpSide.select(col("doc_id").as("id_b"),
          col("fp").as("fp_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.ext.TextPrep.jaccard(col("fp_a"), col("fp_b")), 6)
            .as("jaccard"))
        .where(col("jaccard") >= 0.8))
    // the PRODUCTION fp path (probeFp): routed candidates + the
    // candidate-id predicate pushed into the fps scan — includes the
    // probe-side shingling the other legs pre-paid, so its floor is the
    // honest end-to-end serving number
    val probeDocs = docs.where(col("doc_id") < nProbe)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    time("probe_fp_routed")(
      MinHashIndex.probeFp(fp, probeDocs, "doc_id", "text", threshold = 0.8))
    spark.stop()
  }
}
