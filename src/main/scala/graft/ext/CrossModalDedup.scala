package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D20 — CROSS-MODAL near-dup removal: the curation stage a multimodal
  * corpus actually needs and no single-modality dedup covers. Two
  * documents are duplicates when their TEXT is near-identical (scraped
  * twice, boilerplate re-wrap) OR their attached IMAGE is (same photo
  * re-encoded under different prose) — and duplicate-ness composes
  * transitively ACROSS modalities: text(a~b) and image(b~c) must
  * collapse a, b, c into one cluster or the corpus keeps two copies of
  * the same underlying content.
  *
  * Law: edges = text near-dup pairs ([[Dedup.minHashLshPairs]] — LSH
  * candidates, exact Jaccard verify) ∪ image near-dup pairs
  * ([[ImageHash.nearDupPairs]] — banded Hamming, exact verify) → ONE
  * [[Clustering.connectedComponents]] pass over the union → keep the
  * min-id representative per cluster plus every unclustered doc (the
  * q64 closure-correct policy, now over the union graph).
  *
  * Shape at scale: both edge generators are the measured bucket-join
  * shapes (never all-pairs), the union is edge-count-sized, CC is the
  * same min-label propagation q64 runs (rounds ≤ component diameter),
  * and the final keep is one left join — composing modalities adds ONE
  * cheap union, not a new corpus-wide pass. */
object CrossModalDedup {

  /** Survivors of cross-modal dedup. `media` carries (idCol, media)
    * image blobs keyed by the SAME ids as `docs`; docs with no/corrupt
    * image simply contribute no image edges. */
  def dropNearDuplicates(spark: SparkSession, docs: DataFrame,
      media: DataFrame, idCol: String, textCol: String,
      textThreshold: Double, imageMaxDist: Int,
      shingleK: Int = 3, numHashes: Int = 128, textBands: Int = 32,
      imageBands: Int = 8): DataFrame = {
    val textPairs = Dedup.minHashLshPairs(docs, idCol, textCol,
      textThreshold, shingleK, numHashes, textBands)
      .select("id_a", "id_b")
    val hashes = ImageHash.hashes(spark,
      media.select(col(idCol).as("media_id"), col("media"))).toDF()
      .where(col("decode_ok"))
    val imagePairs = ImageHash.nearDupPairs(hashes, "media_id", "phash",
      imageMaxDist, imageBands)
      .select("id_a", "id_b")
    val edges = textPairs.unionByName(imagePairs).distinct()
    val comps = Clustering.connectedComponents(edges, "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    docs.join(comps, Seq(idCol), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("component")
  }
}
