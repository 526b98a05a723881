package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test decontamination — find training documents that contain a
  * benchmark/test document's content, the overlap audit every LLM data
  * pipeline runs before training (the reference stack has no native
  * operator for this; it is the pipeline-side complement of the dedup
  * family in [[Dedup]]).
  *
  * Contamination here is asymmetric n-gram *containment* (not Jaccard):
  * `|shingles(test) ∩ shingles(train)| / |shingles(test)|` — a short
  * benchmark prompt fully embedded in a long web document scores 1.0
  * even though its Jaccard against the page is tiny. This is the
  * standard containment form (Broder, "On the resemblance and
  * containment of documents", SEQUENCES 1997).
  *
  * == Scale shape ==
  *
  * Never all-pairs: both sides explode to (doc, shingle) rows and meet in
  * ONE equi-join on the shingle — an inverted index. The TEST side is the
  * build/broadcast side (test sets are benchmark suites — small by
  * definition), so the train corpus streams through the probe without
  * ever shuffling; only the matching (test, train) pairs reach the count
  * shuffle, partial-aggregated map-side. Shingles are distinct per doc,
  * so the join emits exactly one row per intersection element — counts
  * ARE intersection sizes, no dedup pass. (A genuinely huge test set
  * would flip this to a shuffle join on the shingle; not this default.)
  *
  * Explodes are `explode_outer`: shingle sets are non-empty by
  * construction (token-count prefilter), and the non-outer form triggers
  * InferFiltersFromGenerate's `size(sh) > 0` guard, which predicate
  * pushdown substitutes into a per-row re-evaluation of the whole
  * tokenize→shingle pipeline inside the scan filter (the
  * PushPredicateThroughNonJoin recompute trap — measured ~3.5× this
  * operator's cost; see TextPrep's evaluation-cost discipline). The
  * outer generate infers nothing; its null rows don't exist here, and an
  * equi-join would drop null keys anyway.
  *
  * `dfCap` drops shingles appearing in more than `dfCap` training docs
  * before the join (one cheap partial-agg'd count over the exploded train
  * side + an anti-join against the broadcast DROPPED set — O(boilerplate),
  * never the kept vocabulary). Boilerplate n-grams ("all rights
  * reserved") otherwise dominate the join fan-out at corpus scale; capped
  * shingles undercount containment, so the cap is an explicit
  * approximation knob, off by default (and off in the oracle-checked
  * query q68).
  */
object Decontaminate {

  /** Contaminated pairs: (test_id, train_id, containment) with
    * containment ≥ `tau`, rounded to 6 places for engine-stable
    * comparison. Docs with fewer than `shingleK` tokens have no shingles
    * and cannot appear on either side. */
  def contamination(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      tau: Double = 0.5,
      dfCap: Int = Int.MaxValue): DataFrame = {
    val testSets = Dedup.shingleSets(test, idCol, textCol, shingleK)
    // Divisor |shingles(test)| is taken BEFORE any df-capping: the cap
    // approximates the numerator only, keeping containment ≤ true value.
    val testSizes = testSets.select(col("doc_id").as("test_id"),
      size(col("sh")).as("__n_test"))

    val testSh = testSets.select(col("doc_id").as("test_id"),
      explode_outer(col("sh")).as("__sh"))
    val trainShAll = Dedup.shingleSets(train, idCol, textCol, shingleK)
      .select(col("doc_id").as("train_id"), explode_outer(col("sh")).as("__sh"))
    // The broadcast side is the DROPPED set (df > dfCap — a handful of
    // boilerplate shingles), never the kept set (≈ the whole vocabulary):
    // anti-join against small, not semi-join against everything.
    val trainSh =
      if (dfCap == Int.MaxValue) trainShAll
      else trainShAll.join(
        broadcast(trainShAll.groupBy(col("__sh"))
          .agg(count(lit(1)).as("__df")).filter(col("__df") > dfCap)
          .select(col("__sh"))),
        Seq("__sh"), "left_anti")

    trainSh.join(broadcast(testSh), Seq("__sh"))
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("__overlap"))
      .join(broadcast(testSizes), Seq("test_id"))
      .select(col("test_id"), col("train_id"),
        round(col("__overlap").cast("double") / col("__n_test"), 6)
          .as("containment"))
      .filter(col("containment") >= tau)
  }
}
