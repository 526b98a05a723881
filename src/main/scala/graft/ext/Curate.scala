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
}
