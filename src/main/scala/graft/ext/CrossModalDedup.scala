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
    val imagePairs = imageEdges(spark, media, idCol, imageMaxDist, imageBands)
    dropNearDuplicatesMulti(docs, idCol, Seq(textPairs, imagePairs))
  }

  /** Image-plane edge generator: decode → pHash → banded Hamming join
    * ([[ImageHash.nearDupPairs]]); corrupt blobs contribute no edges. */
  def imageEdges(spark: SparkSession, media: DataFrame, idCol: String,
      maxDist: Int, bands: Int = 8): DataFrame = {
    val hashes = ImageHash.hashes(spark,
      media.select(col(idCol).as("media_id"), col("media"))).toDF()
      .where(col("decode_ok"))
    ImageHash.nearDupPairs(hashes, "media_id", "phash", maxDist, bands)
      .select("id_a", "id_b")
  }

  /** Audio-plane edge generator: RIFF decode → framed DFT peaks →
    * (frame, bin) bucket join ([[AudioFingerprint.nearDupPairs]]). */
  def audioEdges(spark: SparkSession, media: DataFrame, idCol: String,
      minShared: Int): DataFrame = {
    val p = AudioFingerprint.peaks(spark,
      media.select(col(idCol).as("media_id"), col("media"))).toDF()
      .where(col("decode_ok"))
    AudioFingerprint.nearDupPairs(p, "media_id", "peaks", minShared)
      .select("id_a", "id_b")
  }

  /** Video-plane edge generator: MJPEG frame decode → quantized luma →
    * (frame, bucket) bucket join ([[Multimodal.videoNearDupPairs]]). */
  def videoEdges(spark: SparkSession, media: DataFrame, idCol: String,
      minShared: Int): DataFrame = {
    val fp = Multimodal.videoFingerprint(spark,
      media.select(col(idCol).as("media_id"), col("media")))
    Multimodal.videoNearDupPairs(fp, minShared).select("id_a", "id_b")
  }

  /** The closure over ANY set of modality edge generators (D20 widened
    * to the full quadruple, VERDICT r15 #5): union the per-modality
    * (id_a, id_b) pair sets, ONE connected-components pass, keep the
    * min-id representative per cluster plus every unclustered doc.
    * Each added modality costs one `unionByName` over an
    * edge-count-sized relation — never a new corpus-wide pass. */
  def dropNearDuplicatesMulti(docs: DataFrame, idCol: String,
      edgeSets: Seq[DataFrame]): DataFrame = {
    require(edgeSets.nonEmpty, "need at least one modality edge set")
    val edges = edgeSets.map(_.select("id_a", "id_b")).reduce(_ unionByName _)
      .distinct()
    val comps = Clustering.connectedComponents(edges, "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    docs.join(comps, Seq(idCol), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("component")
  }
}
