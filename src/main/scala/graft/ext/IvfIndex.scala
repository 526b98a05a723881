package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Build-once / search-many IVF index — the production shape of
  * approximate nearest-neighbor serving: the expensive parts (Lloyd
  * iterations + the corpus-sized inverted-list assignment) run ONCE at
  * build time; each search afterwards touches only probe-count rows, the
  * k-row centroid table, and the lists the probes select.
  *
  * The q78-family bench entries split along exactly this line
  * (`q78_build` = this object's build, `q78_search` = probes against the
  * prebuilt index), so the artifact prices index amortization instead of
  * charging a full build to every query — the round-5 bench placement
  * critique.
  *
  * Index anatomy:
  *   - `centroids` — k rows, pinned DRIVER-side as a LocalRelation at
  *     build time: every search plan broadcasts it with zero recompute
  *     (a k-means plan re-executed per query was the q78 cost).
  *   - `assignment` — (id, centroid_id), one row per corpus vector,
  *     persisted MEMORY_AND_DISK and materialized at build: the 100 TB
  *     analogue is a written table bucketed by centroid_id.
  */
object IvfIndex {

  /** A prebuilt index: driver-pinned centroids + persisted lists. */
  final case class Index(centroids: DataFrame, assignment: DataFrame)

  /** Lloyd-trained build ([[KMeans.fit]] → [[Similarity.ivfAssign]]),
    * materialized before returning — build cost is paid HERE, never
    * lazily inside a search. */
  def buildTrained(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, lloydIters: Int): Index = {
    val spark = corpus.sparkSession
    val fitted = KMeans.fit(corpus, idCol, vecCol, nCentroids, lloydIters)
      .select(col("cid").as("centroid_id"), col("cv"))
    // k rows → driver → LocalRelation: bounded (k vectors), and search
    // plans broadcast it without re-running Lloyd
    val local = spark.createDataFrame(
      java.util.Arrays.asList(fitted.collect(): _*), fitted.schema)
    val assignment = Similarity.ivfAssign(corpus, idCol, vecCol, local)
      .persist(StorageLevel.MEMORY_AND_DISK)
    assignment.count() // materialize the inverted lists now
    Index(local, assignment)
  }

  /** Probe-side search against a prebuilt index —
    * [[Similarity.ivfSearchLists]] with this index's halves. */
  def search(index: Index, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String, probeVecCol: String,
      k: Int, nprobe: Int): DataFrame =
    Similarity.ivfSearchLists(corpus, probes, idCol, vecCol,
      probeIdCol, probeVecCol, k, nprobe, index.centroids, index.assignment)

  /** Release a built index's cluster-side state. */
  def drop(index: Index): Unit = { index.assignment.unpersist(); () }

  private val cache = new Memo[Index](drop)

  /** Serving memo for query entries: `q78_search` (and any search-many
    * caller) builds on first use and reuses thereafter — which is the
    * semantics being benchmarked. Keyed by caller-chosen key
    * (application id + table dir). Bounded LRU, eviction unpersists
    * ([[Memo]] — the suite-drift fix). */
  def cached(key: String)(build: => Index): Index = cache(key)(build)
}
