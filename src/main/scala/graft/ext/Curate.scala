package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the pipeline this engine exists to run,
  * composed from its own operators:
  *
  *   1. near-dup collapse: MinHash-LSH verified pairs ([[Dedup]]) →
  *      connected components ([[Clustering]]) → keep the
  *      HIGHEST-QUALITY representative per cluster ([[TextAnalysis
  *      .qualityScore]]; min doc id breaks ties). Not min-id rep-keep:
  *      dedup should keep the best copy of a duplicated page, not an
  *      arbitrary one.
  *   2. per-language size budget taken in QUALITY order (best docs
  *      first) — greedy cut via the two-level sharded prefix sum
  *      ([[PrefixSum]]), so the dominant language never serializes into
  *      one window task.
  *
  * Scale shape: LSH pair generation is the banded slim-row design
  * (never all-pairs); component labels are one row per PAIRED doc
  * (singletons never enter the label propagation and rejoin with a
  * left join + coalesce); the rep window partitions by component —
  * dedup clusters are small by nature; the budget cut is shard-bounded.
  */
object Curate {

  /** Curated corpus: (idCol, langCol, sizeCol, quality) for every kept
    * doc. Languages absent from `budgets` are dropped. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, sizeCol: String, threshold: Double,
      budgets: Map[String, Long], shards: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "budgets must be non-empty")
    val pairs = Dedup.minHashLshPairs(docs, idCol, textCol, threshold)
    val comps = Clustering.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    val scored = docs.select(col(idCol), col(langCol), col(sizeCol),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
    val labeled = scored.join(comps, Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("component"), col(idCol)))
    val wRep = Window.partitionBy(col("__comp"))
      .orderBy(col("quality").desc, col(idCol))
    val reps = labeled.withColumn("__rn", row_number().over(wRep))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(langCol), col(sizeCol), col("quality"))

    val budget = budgets.toSeq.sortBy(_._1)
      .foldRight(lit(null).cast("long")) { case ((lang, b), otherwise) =>
        when(col(langCol) === lit(lang), lit(b)).otherwise(otherwise)
      }
    PrefixSum.exclusive(
        reps.filter(budget.isNotNull).withColumn("__negq", -col("quality")),
        langCol, Seq("__negq", idCol), sizeCol, "__before", shards)
      .filter(col("__before") < budget)
      .drop("__negq", "__before")
  }

  /** Leakage-safe train/val/test split: the split draw keys on the
    * near-duplicate CLUSTER representative, not the document — so two
    * near-duplicates the LSH stage surfaces can never land on opposite
    * sides of a train/test boundary. The guarantee inherits LSH recall:
    * banding (32×4) has a nonzero false-negative rate (~5e-8 per
    * qualifying pair at threshold 0.8 — the q64 convention), so a pair
    * the bands miss is split independently; pairs that ARE surfaced are
    * exact-verified and clustered, which eliminates the dominant
    * failure mode (the eval-contamination leak document-keyed
    * splitting like [[Splits.assign]] cannot prevent: near-dups of a
    * test document in train leak the answer; Lee et al. 2022 §6 measure
    * exactly this). Composition: LSH candidate pairs exact-verified at
    * `threshold` ([[Dedup.minHashLshPairs]]) → connected components
    * ([[Clustering.connectedComponents]] — min-id label) → every doc
    * keyed by `coalesce(component, id)` → the PORTABLE md5 split draw
    * on that representative ([[Splits.assign]]). Singleton docs draw on
    * their own id, so the distribution matches weights in expectation;
    * clusters move as indivisible units.
    *
    * Output: (idCol, rep, split). Scale: the pair/CC stages are the q64
    * machinery (banded, never all-pairs; one equi-join shuffle per CC
    * round over cluster-member rows only); the split itself is a
    * map-only expression. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, weights: Seq[(String, Int)]): DataFrame = {
    val pairs = Dedup.minHashLshPairs(docs, idCol, textCol, threshold)
    val comps = Clustering.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    val withRep = docs.select(col(idCol)).join(comps, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("component"), col(idCol)))
    Splits.assign(withRep, "rep", weights, portable = true)
      .select(col(idCol), col("rep"), col("split"))
  }
}
