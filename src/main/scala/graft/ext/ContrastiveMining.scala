package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Contrastive training-pair mining — the embedding-model training-data
  * op: for each anchor, the top positives (same label, most similar)
  * and top HARD negatives (different label, most similar — the
  * "hardest" examples, which carry the gradient signal; easy negatives
  * teach nothing). This is how retrieval/embedding models (SimCSE,
  * DPR-style in-batch extensions) assemble their triplets from a
  * labeled or weakly-labeled corpus.
  *
  * Scale shape (the q24/N1 discipline): anchors are a bounded probe set
  * broadcast onto the corpus; scoring is one codegen'd cosine per
  * (corpus row, anchor) with NO corpus shuffle; ranking shuffles only
  * the slim (anchor, role, id, sim) stream into per-(anchor, role)
  * windows. At 10⁹ vectors the candidate generator swaps for a stored
  * ANN index (N2″/N9 — q187's bucket-pruned search) with the same
  * label-aware re-rank; brute-force here is the declared exact baseline
  * the ANN variants contract against.
  */
object ContrastiveMining {

  /** Mine (anchor, role, rank, id, cos_sim) rows: `kPos` positives and
    * `kNeg` hard negatives per anchor. The anchor never pairs with
    * itself. Vectors are cast to double before the cosine so rounding
    * is engine-stable (the q24 rule). */
  def minePairs(corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      probeIdCol: String, probeVecCol: String, probeLabelCol: String,
      kPos: Int, kNeg: Int): DataFrame = {
    require(kPos >= 0 && kNeg >= 0 && kPos + kNeg > 0,
      "kPos/kNeg must be non-negative and not both zero")
    val c = corpus.select(col(idCol), col(labelCol),
      col(vecCol).cast("array<double>").as("__v"))
    val a = anchors.select(col(probeIdCol), col(probeLabelCol),
      col(probeVecCol).cast("array<double>").as("__pv"))
    val scored = c.join(broadcast(a), col(idCol) =!= col(probeIdCol))
      .select(col(probeIdCol), col(idCol),
        when(col(labelCol) === col(probeLabelCol), lit("positive"))
          .otherwise(lit("hard_negative")).as("role"),
        round(VectorFunctions.cosine(col("__v"), col("__pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col(probeIdCol), col("role"))
      .orderBy(col("cos_sim").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <=
        when(col("role") === "positive", lit(kPos)).otherwise(lit(kNeg)))
      .select(col(probeIdCol), col("role"), col("rank"), col(idCol),
        col("cos_sim"))
  }
}
