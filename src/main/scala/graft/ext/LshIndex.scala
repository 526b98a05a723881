package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions

/** Build-once / search-many LSH index — the missing amortization for the
  * q30 family: [[Similarity.lshTopK]] hashes EVERY corpus vector inside
  * every query (tables × bits hyperplane dots each), which the round-6
  * sf1 checkpoint measured as the dominant, linear term (exponent 0.98)
  * once auto-bits flattened the candidate stage. Signatures are index
  * state, not query work: build them once (one corpus pass, persisted —
  * the 100 TB analogue is a written table bucketed by (table_id,
  * bucket)), and a search touches probe-count signature rows plus the
  * bucket-mates they select — steady-state exponents in the q78_search /
  * q175 band (measured 0.2–0.35), not 1.0.
  *
  * Same recall surface as [[Similarity.lshTopK]]: identical hyperplanes
  * (fixed seed), identical bucket semantics, exact cosine re-rank — the
  * q30 recall contract carries over unchanged.
  */
object LshIndex {

  /** Prebuilt signatures: (id, table_id, bucket), persisted + counted. */
  final case class Index(buckets: DataFrame, tables: Int, bits: Int, dim: Int)

  /** Hash the corpus once. `bits = -1` auto-sizes occupancy-constant
    * buckets ([[Similarity.autoBits]] — footer stats, no count() job);
    * pass `n` when the row count is already known from manifest stats. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      tables: Int = 8, bits: Int = -1, dim: Int = 64,
      n: Long = -1L): Index = {
    val useBits = Similarity.autoBits(corpus, bits, n)
    val buckets = Similarity.lshBuckets(corpus, idCol, vecCol, tables, useBits, dim)
      .persist(StorageLevel.MEMORY_AND_DISK)
    buckets.count() // pay the corpus pass HERE, never inside a search
    Index(buckets, tables, useBits, dim)
  }

  /** Probe-side search: hash the probes (probe-count rows), join their
    * buckets against the prebuilt signatures, exact-cosine re-rank of
    * the bucket-mates. Output: (probeIdCol, idCol, cos_sim). */
  def search(index: Index, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    val pb = Similarity.lshBuckets(
      probes.select(col(probeIdCol).as("pid"), col(probeVecCol).as("pv")),
      "pid", "pv", index.tables, index.bits, index.dim)
    val candidates = index.buckets.join(broadcast(pb), Seq("table_id", "bucket"))
      .select(col("pid"), col(idCol)).distinct()
    val rescored = candidates
      .join(broadcast(probes.select(col(probeIdCol).as("pid"),
        col(probeVecCol).as("pv"))), Seq("pid"))
      .join(corpus, Seq(idCol))
      .where(col(idCol) =!= col("pid"))
      .select(col("pid"), col(idCol),
        round(VectorFunctions.cosine(col(vecCol), col("pv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("pid")).orderBy(col("cos_sim").desc, col(idCol))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("pid").as(probeIdCol), col(idCol), col("cos_sim"))
  }

  /** Release the index's cluster-side state. */
  def drop(index: Index): Unit = { index.buckets.unpersist(); () }

  private val cache = new ConcurrentHashMap[String, Index]()

  /** Process-lifetime memo — the q78_search/q175 serving semantics. */
  def cached(key: String)(build: => Index): Index =
    cache.computeIfAbsent(key, _ => build)
}
