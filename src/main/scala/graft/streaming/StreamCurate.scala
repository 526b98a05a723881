package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchExprs

import graft.ext.{LangId, MinHashIndex, TextAnalysis, TextPrep, TextQuality}

/** ST17: the composed streaming ingest-curation pipeline — the production
  * end-cap over the streaming-serving family: a crawl stream is quality-
  * gated, language-filtered, decontaminated, and near-dup-checked against
  * the EXISTING corpus as it arrives, emitting only documents a training
  * run should keep. Every stage is a gated operator reused verbatim, in
  * the order the scale discipline dictates — the cheap map-only drops run
  * FIRST so the expensive index probe sees only survivors:
  *
  *   1. Gopher rule battery ([[TextQuality.gopherRules]], T13) — per-row
  *      staged projection, map-only;
  *   2. language filter — the T1 marker heuristic by default, or the
  *      TRAINED T1′ softmax when a [[LangId.Model]] is passed: [[LangId
  *      .scoreExpr]] folds the whole argmax into one in-row expression
  *      (weights as a literal), so the trained tier is map-only and
  *      append-mode-safe too;
  *   3. train/test decontamination (ST15's per-row [[SketchExprs
  *      .bloomHitCount]] loop over a broadcast test-set bloom — zero
  *      state, no false negatives);
  *   4. near-dup verdict against the stored MinHash band index (ST14's
  *      stream-static band join + post-fan-out re-shingle + exact
  *      Jaccard), LEFT variants so candidate-less documents survive,
  *      folded to one per-document flag by THE pipeline's single
  *      stateful stage: a watermarked tumbling-window aggregate (state =
  *      one row per in-window document, emitted on window close).
  *
  * Output (append mode, on window close): one row per CURATED document —
  * (idCol, win_start, lang, n_tokens, textCol). Documents failing any
  * gate, or τ-similar to any corpus document, never reach the sink.
  *
  * [[batch]] is the same composition over a static frame (the gates plus
  * [[MinHashIndex.probe]]'s verdict as an anti-join); StreamCurateSpec
  * pins stream ≡ batch over multi-batch delivery, per-gate drop cases,
  * and the candidate-less-document path.
  */
object StreamCurate {

  /** The map-only gate conjunction shared by both forms: Gopher keep ∧
    * allowed language ∧ not contaminated. One staged projection. The
    * language tier is the T1 marker heuristic by default; pass a TRAINED
    * [[LangId.Model]] to serve T1′ instead — [[LangId.scoreExpr]] is one
    * in-row expression (weights ride as a broadcast-equivalent literal),
    * so the trained tier is just as append-mode-safe as the heuristic. */
  private def gated(df: DataFrame, textCol: String, langs: Set[String],
      bf: Array[Byte], shingleK: Int, minHits: Int,
      minWords: Int, maxWords: Int,
      langModel: Option[LangId.Model]): DataFrame = {
    val staged = df
      .withColumn("__gtoks", TextPrep.tokens(col(textCol)))
      .withColumn("__lines", split(col(textCol), "\n"))
    val keep = TextQuality.gopherKeep(TextQuality.gopherRules(
      col(textCol), col("__gtoks"), col("__lines"), minWords, maxWords))
    val lang = langModel.map(m => LangId.scoreExpr(m, col(textCol)))
      .getOrElse(TextAnalysis.langId(col(textCol)))
    TextPrep.stagedShingles(
        staged.withColumn("__keep", keep).withColumn("lang", lang)
          .withColumn("n_tokens", size(col("__gtoks")).cast("long"))
          .drop("__gtoks", "__lines"),
        textCol, shingleK, "__sh")
      .withColumn("__hits",
        SketchExprs.bloomHitCount(bf, TextPrep.baseHashes(col("__sh"))))
      .where(col("__keep") && col("lang").isInCollection(langs) &&
        col("__hits") < minHits)
      .drop("__keep", "__hits", "__sh")
  }

  /** Streaming form. `stream` must carry (idCol, tsCol, textCol). */
  def pipeline(index: MinHashIndex.Index, bf: Array[Byte], stream: DataFrame,
      idCol: String, textCol: String, tsCol: String, langs: Set[String],
      threshold: Double, watermark: String, windowDur: String,
      shingleK: Int = 5, minHits: Int = 1,
      minWords: Int = 20, maxWords: Int = 90,
      langModel: Option[LangId.Model] = None): DataFrame = {
    // the Gopher word floor is what guarantees every survivor has a
    // non-empty index-k shingle set to sign
    require(minWords >= index.shingleK,
      s"minWords ($minWords) must be >= the index shingle length " +
        s"(${index.shingleK}) so survivors always sign")
    val survivors = gated(
        stream.select(col(idCol), col(tsCol), col(textCol)),
        textCol, langs, bf, shingleK, minHits, minWords, maxWords, langModel)
      .withWatermark(tsCol, watermark)
    // band fan-out (map-side; rows carry TEXT, re-shingled after the
    // fan-out — the ST14 payload rule). Signatures use the INDEX's
    // shingle length (the bloom gate's k is independent). LEFT join: a
    // document with no band collision must survive to the aggregate
    // with verified=false.
    val banded = TextPrep
      .stagedShingles(survivors.select(col(idCol), col(tsCol), col(textCol),
        col("lang"), col("n_tokens")), textCol, index.shingleK, "__ish")
      .select(col(idCol), col(tsCol), col(textCol), col("lang"),
        col("n_tokens"),
        posexplode(SketchExprs.lshBands(
          SketchExprs.minHashSig(
            TextPrep.baseHashes(col("__ish")), index.numHashes),
          index.numBands, index.numHashes / index.numBands))
          .as(Seq("band_id", "band_key")))
    // candidate dedup BEFORE the verify (the ST14 discipline): a pair
    // colliding in b bands must fetch corpus shingles and Jaccard once,
    // not b times — and the 32 no-collision rows of a candidate-less
    // document collapse to one (null __cid) row for the aggregate
    // self-candidates are NULLED OUT, not filtered: a stream document
    // whose id exists in the corpus and whose every band collides only
    // with itself would otherwise lose all its rows here and silently
    // vanish, while batch() keeps it (probe drops self pairs, so no
    // dupIds row anti-joins it away). A null __cid row survives to the
    // windowed verdict as a non-dup — the same row shape a no-collision
    // document produces — and the dedup collapses the nulls to one.
    val cand = banded
      .join(index.bands.select(col("band_id"), col("band_key"),
        col("doc_id").as("__cid")), Seq("band_id", "band_key"), "left")
      .withColumn("__cid", when(col("__cid") === col(idCol), lit(null))
        .otherwise(col("__cid")))
      .drop("band_id", "band_key")
      .dropDuplicatesWithinWatermark(idCol, "__cid")
    val verified = TextPrep
      .stagedShingles(cand, textCol, index.shingleK, "__vsh")
      .join(index.shingles.select(col("doc_id").as("__cid"),
        col("sh").as("__csh")), Seq("__cid"), "left")
      .withColumn("__dup", col("__csh").isNotNull &&
        round(TextPrep.jaccard(col("__csh"), col("__vsh")), 6) >= threshold)
    verified
      .groupBy(window(col(tsCol), windowDur), col(idCol))
      .agg(first(col(textCol)).as(textCol), first(col("lang")).as("lang"),
        first(col("n_tokens")).as("n_tokens"),
        max(col("__dup")).as("__anydup"))
      .where(!col("__anydup"))
      .select(col(idCol), col("window.start").as("win_start"), col("lang"),
        col("n_tokens"), col(textCol))
  }

  /** [[pipeline]] composed onto the DURABLE MOR sink — the last seam
    * between the streaming family and the storage layer: curated
    * documents land in managed table `table` through [[StreamSink
    * .ingestCdc]] ([[graft.engine.Layout.upsertMor]] per micro-batch —
    * O(batch) regardless of table size), keyed on `idCol` with the
    * window start as the tie-break. Effectively-once: the pipeline's
    * append-mode windows emit each curated document once per closed
    * window, and a REPLAYED delivery (at-least-once foreachBatch, or a
    * whole re-run of the stream) converges by the CDC sink's
    * sequence-number scoping — the replay's equality delete erases the
    * earlier application's rows while its identical rows land, so the
    * table state is byte-equal to single delivery (StreamSinkSpec pins
    * it against the batch twin). */
  def pipelineInto(index: MinHashIndex.Index, bf: Array[Byte],
      stream: DataFrame, idCol: String, textCol: String, tsCol: String,
      langs: Set[String], threshold: Double, watermark: String,
      windowDur: String, table: String, checkpointDir: String,
      shingleK: Int = 5, minHits: Int = 1,
      minWords: Int = 20, maxWords: Int = 90,
      langModel: Option[LangId.Model] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    StreamSink.ingestCdc(
      pipeline(index, bf, stream, idCol, textCol, tsCol, langs, threshold,
        watermark, windowDur, shingleK, minHits, minWords, maxWords,
        langModel),
      table, idCol, tieBreakCol = "win_start",
      checkpointDir = checkpointDir)

  /** Batch twin: identical gates over a static frame, near-dup verdict
    * via [[MinHashIndex.probe]] + anti-join. The spec's ground truth. */
  def batch(index: MinHashIndex.Index, bf: Array[Byte], docs: DataFrame,
      idCol: String, textCol: String, langs: Set[String], threshold: Double,
      shingleK: Int = 5, minHits: Int = 1,
      minWords: Int = 20, maxWords: Int = 90,
      langModel: Option[LangId.Model] = None): DataFrame = {
    val survivors = gated(docs.select(col(idCol), col(textCol)),
      textCol, langs, bf, shingleK, minHits, minWords, maxWords, langModel)
    val dupIds = MinHashIndex.probe(index, survivors, idCol, textCol,
        threshold)
      .select(col("id_b").as(idCol)).distinct()
    survivors.join(dupIds, Seq(idCol), "left_anti")
      .select(col(idCol), col("lang"), col("n_tokens"), col(textCol))
  }
}
