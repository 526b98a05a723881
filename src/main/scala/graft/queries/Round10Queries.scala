package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 declared queries: incremental append for the two index
  * families that lacked it — IVF inverted lists and PQ codes — completing
  * the build-once/serve-incrementally matrix (text MinHash q190, graph
  * HNSW q223, hash LSH q225, coarse-quantizer IVF q226, compressed-domain
  * PQ q227).
  */
object Round10Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def probesOf(e: DataFrame): DataFrame =
    e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  /** Q226 (N6′, incremental IVF append): the q225 lifecycle for the
    * coarse-quantizer family — base index (all but the top-50 ids)
    * Lloyd-trained and written through [[graft.ext.IndexStore]]
    * (kind=ivf), the increment assigned to the FROZEN stored centroids in
    * one broadcast-join map pass and APPENDED to the clustered assignment
    * table ([[graft.ext.IndexStore.appendIvf]] — assignment is a pure
    * per-row argmin, so append ≡ assign-on-rebuild exactly; drift vs
    * retraining is the documented knob), then the q30-family recall
    * contract over the union corpus through the reloaded bundle. */
  val q226 = GQuery("q226_ann_ivf_append", (s, d) => {
    import graft.ext.{IndexStore, IvfIndex, Similarity}
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val idx = IvfIndex.cached(s.sparkContext.applicationId + ":ivfapp:" + d) {
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId - 49
      val base = e.where(col("vec_id") < cut)
      val built = IvfIndex.buildTrained(base, "vec_id", "embedding",
        nCentroids = 8, lloydIters = 2)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/ivfapp_${math.abs(d.hashCode)}"
      IndexStore.writeIvf(built, dir)
      IvfIndex.drop(built)
      IndexStore.appendIvf(e.where(col("vec_id") >= cut),
        "vec_id", "embedding", dir)
      IndexStore.loadIvf(s, dir)
    }
    val ann = IvfIndex.search(idx, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10, nprobe = 3)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  /** Q227 (N8′, incremental PQ append): the same lifecycle one tier down
    * the compression ladder — base codebooks trained and written
    * (kind=pq), the increment PQ-ENCODED against the frozen stored
    * codebooks and its (id, codes) rows appended
    * ([[graft.ext.IndexStore.appendPq]] — encoding is a pure per-row
    * per-subspace argmin, so append ≡ encode-on-rebuild exactly; training
    * drift widens ADC noise, which the exact float re-rank tail absorbs),
    * then the recall contract over the union corpus through the reloaded
    * bundle's full-scan ADC search. */
  val q227 = GQuery("q227_ann_pq_append", (s, d) => {
    import graft.ext.{IndexStore, Pq, Similarity}
    val e = t(s, d, "embeddings")
    val probes = probesOf(e)
    val idx = Pq.cached(s.sparkContext.applicationId + ":pqapp:" + d) {
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId - 49
      val base = e.where(col("vec_id") < cut)
      val built = Pq.build(base, "vec_id", "embedding",
        m = 8, ksub = 16, iters = 2, dim = 64)
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/pqapp_${math.abs(d.hashCode)}"
      IndexStore.writePq(built, dir)
      Pq.drop(built)
      IndexStore.appendPq(e.where(col("vec_id") >= cut),
        "vec_id", "embedding", dir)
      IndexStore.loadPq(s, dir)
    }
    val ann = Pq.search(idx, e, probes, "vec_id", "embedding",
      "probe_id", "pv", k = 10)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
      "probe_id", "pv", 10)
    Similarity.recallContract(ann, exact, "probe_id", "vec_id", k = 10,
      minHits = 2.0)
  }, Some(PipelineQueries.annContractSql))

  val all: Seq[GQuery] = Seq(q226, q227)
}
