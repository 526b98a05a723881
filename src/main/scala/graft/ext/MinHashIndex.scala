package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchExprs
import org.apache.spark.storage.StorageLevel

/** Build-once / probe-increment MinHash band index — the text-dedup
  * twin of the ANN index lifecycle ([[LshIndex]]/[[IvfIndex]]/[[Pq]]):
  * [[Dedup.minHashLshPairs]] sketches the ENTIRE corpus inside every
  * call (shingle → 128 hashes → band keys per document), but the
  * production shape of crawl dedup is incremental — yesterday's corpus
  * is already indexed; only the new increment should pay sketching,
  * and its candidates should verify against stored corpus state.
  *
  * Index anatomy (both halves are what a probe JOINS, so the stored
  * layout clusters on exactly those keys — the [[IndexStore]] rule):
  *   - `bands` — (band_id, band_key, doc_id): the banded MinHash keys,
  *     clustered by (band_id, band_key) — a probe joins the increment's
  *     band keys against these;
  *   - `shingles` — (doc_id, sh): the distinct word-shingle sets,
  *     clustered by doc_id — the exact-Jaccard verify fetches candidate
  *     corpus docs' sets by id (the q187 candidate-fetch lesson: the
  *     verify side must be a clustered lookup, not a text re-scan).
  *
  * A probe therefore costs: sketch the INCREMENT (increment-sized), one
  * slim band equi-join, exact verification on the surviving candidates.
  * The corpus is never re-read, never re-hashed. Growing the index with
  * the deduplicated increment is a table append of the increment's two
  * halves — at 100 TB, a [[graft.engine.Manifests]] commit.
  *
  * Same sketch parameters and verification as [[Dedup.minHashLshPairs]]
  * (identical native expressions), so the candidate/recall surface of
  * the q26 gate carries over unchanged.
  */
object MinHashIndex {

  final case class Index(bands: DataFrame, shingles: DataFrame,
      numHashes: Int, numBands: Int, shingleK: Int)

  /** Fingerprinted index ([[IndexStore.writeMinhashFp]]): the verify
    * side stores each doc's shingle set as its SORTED 64-bit base-hash
    * array (`fp` = the same per-shingle xxhash64 the band keys already
    * derive from, [[TextPrep.baseHashes]]) instead of the shingle
    * STRINGS — the gsf100 MinhashProbe finding (BASELINE §Round 14: the
    * doc-clustered shingle fetch dominates probe_full at 2.5M docs, the
    * q187 shape) attacked at its bytes: a k=5-word shingle string is
    * ~30–40 bytes, its fingerprint is 8. Jaccard over fingerprint sets
    * equals Jaccard over shingle sets except under a 64-bit collision
    * WITHIN one compared pair's union (~m²/2⁶⁴ for m-shingle docs,
    * ~1e-15 at corpus document sizes — the q26 miss-probability class,
    * stated rather than hidden; MinHashIndexSpec pins result equality
    * against the string path on the gate corpus). */
  final case class IndexFp(bands: DataFrame, fps: DataFrame,
      numHashes: Int, numBands: Int, shingleK: Int)

  /** Sorted distinct fingerprint array of a shingle-set column. */
  private[graft] def fpOf(sh: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_sort(array_distinct(TextPrep.baseHashes(sh)))

  /** Banded MinHash keys of a document set: (band_id, band_key, doc_id). */
  private[ext] def bandKeys(sh: DataFrame, numHashes: Int,
      numBands: Int): DataFrame =
    sh.withColumn("hs", TextPrep.baseHashes(col("sh")))
      .select(col("doc_id"),
        posexplode(SketchExprs.lshBands(
          SketchExprs.minHashSig(col("hs"), numHashes),
          numBands, numHashes / numBands))
          .as(Seq("band_id", "band_key")))
      .select(col("band_id"), col("band_key"), col("doc_id"))

  /** Sketch + shingle the corpus once; both halves persisted and
    * materialized — build cost is paid HERE, never inside a probe. */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, numBands: Int = 32): Index = {
    require(numHashes % numBands == 0, "numHashes must divide into bands")
    val sh = Dedup.shingleSets(corpus, idCol, textCol, shingleK)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = bandKeys(sh, numHashes, numBands)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bands.count() // materialize the corpus pass now
    Index(bands, sh, numHashes, numBands, shingleK)
  }

  /** Near-dup pairs between a NEW increment and the indexed corpus:
    * sketch only `newDocs`, join band keys, exact-verify candidates
    * against the index's stored shingle sets. Output:
    * (id_a = corpus doc, id_b = new doc, jaccard ≥ threshold), rounded
    * to 6 places (engine-stable ordering). An increment doc whose id
    * collides with an indexed id is the caller's upstream bug — ids are
    * assumed globally unique across corpus generations. */
  def probe(index: Index, newDocs: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val newSh = Dedup.shingleSets(newDocs, idCol, textCol, index.shingleK)
    candidates(index, newSh)
      .join(index.shingles.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(newSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextPrep.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** The increment-side shingle sets a [[candidates]] caller prepares
    * once (exposed for the serving-cost probe tool's prep step). */
  def shingleSetsOf(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = Dedup.shingleSets(docs, idCol, textCol, k)

  /** The candidate half of [[probe]] alone — (id_a = corpus doc,
    * id_b = new doc) distinct band collisions, BEFORE the shingle fetch
    * and exact verify. Split out so the serving-cost probe
    * ([[graft.tools.MinhashProbe]]) can price the fetch+verify term
    * separately from candidate generation — the q187 measurement
    * discipline applied to the MinHash family. `newSh` is the
    * increment's shingle sets ([[Dedup.shingleSets]]). */
  def candidates(index: Index, newSh: DataFrame): DataFrame =
    candidatesCore(index.bands, index.numHashes, index.numBands, newSh)

  private def candidatesCore(bands: DataFrame, numHashes: Int,
      numBands: Int, newSh: DataFrame): DataFrame = {
    val newBands = bandKeys(newSh, numHashes, numBands)
      .select(col("band_id"), col("band_key"), col("doc_id").as("id_b"))
    bands
      .select(col("band_id"), col("band_key"), col("doc_id").as("id_a"))
      .join(newBands, Seq("band_id", "band_key"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** [[candidates]] with the probe band keys PUSHED INTO the bands scan
    * — the `searchPruned` discipline ([[LshIndex.searchPruned]]) applied
    * to the last stored-index family without it: the stored bundle
    * clusters+sorts bands by (band_id, band_key)
    * ([[IndexStore.writeMinhash]]), so a literal per-band
    * `band_key IN (...)` predicate reaches the parquet reader and
    * row-group min/max stats skip everything outside the probed keys —
    * the scan reads O(probed buckets), not O(corpus bands). The
    * driver-side key collect is probes × numBands rows, bounded at
    * `graft.minhash.maxProbeKeys` (default 8192, the
    * [[LshIndex.searchBucketed]] teeth): past the bound the predicate
    * accelerator is skipped loudly and the bucket equi-join alone
    * serves — correct either way, the join is what's exact. Results are
    * identical to [[candidates]] (the predicate selects a superset of
    * the join keys; the same join then applies). MinhashProbe measured
    * the UNpruned candidates term scaling with the corpus (0.38/0.52/
    * 1.22 s at sf0.1/1/10, BASELINE §Round 12) — this is the zero-
    * storage-cost lever that attacks it, preferred over a ×bands
    * shingle-duplicating bundle the same measurement rejected.
    * Below the measured crossover (~gsf1) the same measurement shows
    * the PLAIN join is cheaper than the pruned path's fixed costs, so
    * the route is picked by stored-band row count (job-free footer
    * stats; `graft.minhash.pruneMinBandRows`, default 4M) — identical
    * results either side by the superset argument above. */
  def candidatesPruned(index: Index, newSh: DataFrame): DataFrame =
    candidatesPrunedCore(index.bands, index.numHashes, index.numBands, newSh)

  private def candidatesPrunedCore(idxBands: DataFrame, numHashes: Int,
      numBands: Int, newSh: DataFrame): DataFrame = {
    // SIZE-ROUTED (VERDICT r12 #4): below the measured crossover the
    // plain equi-join is CHEAPER than the pruned path's fixed costs
    // (probe-side sketch persist + key collect + IN-predicate planning)
    // — BASELINE §Round 12 measured unpruned 0.53 s vs pruned 0.74 s at
    // gsf1 (1.6M band rows) and 1.60 vs 0.75 s at gsf10 (16M), so the
    // default threshold sits between the decades. The stored-band row
    // count is job-free (parquet footers / cached-plan stats —
    // [[graft.engine.TableStats.rowCountNoJob]], the parameter-sizing
    // discipline); `graft.minhash.pruneMinBandRows` overrides.
    val minRows = Memo.intProp("graft.minhash.pruneMinBandRows", 4000000)
    if (graft.engine.TableStats.rowCountNoJob(idxBands) < minRows)
      return candidatesCore(idxBands, numHashes, numBands, newSh)
    // persisted: the probe-side sketch (shingle hashes → 128-hash sig →
    // band keys) is the pruned path's fixed cost and feeds BOTH the key
    // collect and the join — without the persist it runs twice, which
    // the probe tool measured as a ~0.5 s penalty that buried the scan
    // saving at small corpora. Probe-count × numBands rows — tiny;
    // tracked in [[Memo.trackTransient]] so a harness boundary (the
    // bench's per-group release, the probe tools) unpersists the blocks
    // deterministically — the producer cannot (the returned plan still
    // references them), and the ContextCleaner alone let each bench rep
    // leak a block set until GC noticed (round-12 advisor finding).
    val newBands = Memo.trackTransient(
      bandKeys(newSh, numHashes, numBands)
        .select(col("band_id"), col("band_key"), col("doc_id").as("id_b"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val maxKeys = Memo.intProp("graft.minhash.maxProbeKeys", 8192)
    val probed = newBands.select(col("band_id"), col("band_key")).distinct()
      .limit(maxKeys + 1).collect()
    val prune =
      if (probed.length > maxKeys) {
        System.err.println(s"[minhash] probe band keys exceed $maxKeys " +
          "(graft.minhash.maxProbeKeys) — serving via the join-only scan")
        lit(true)
      } else probed.map(r => (r.getInt(0), r.getLong(1))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)
        .map { case (b, ks) =>
          col("band_id") === b && col("band_key").isin(ks: _*)
        }.reduceOption(_ || _).getOrElse(lit(false))
    idxBands.where(prune)
      .select(col("band_id"), col("band_key"), col("doc_id").as("id_a"))
      .join(newBands, Seq("band_id", "band_key"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** [[probe]] through [[candidatesPruned]] — the stored-bundle serving
    * form (band scan pruned to the probed keys, then the doc-clustered
    * shingle fetch + exact verify). Result-identical to [[probe]]. */
  def probePruned(index: Index, newDocs: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val newSh = Dedup.shingleSets(newDocs, idCol, textCol, index.shingleK)
    candidatesPruned(index, newSh)
      .join(index.shingles.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(newSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextPrep.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** [[probe]] against a FINGERPRINTED bundle ([[IndexFp]]): identical
    * candidate stage (the bands are the same rows), verify fetch reads
    * 8-byte fingerprints instead of shingle strings, and the exact
    * Jaccard runs over sorted long arrays — same `array_intersect`/
    * `array_union` codegen, ~4–5× fewer fetched bytes. Result-identical
    * to [[probe]] modulo 64-bit collisions (see [[IndexFp]]);
    * size-routed through the pruned band scan like [[probePruned]]. */
  def probeFp(index: IndexFp, newDocs: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      maxCandidates: Int = 1 << 20): DataFrame = {
    val spark = index.fps.sparkSession
    val newSh = Dedup.shingleSets(newDocs, idCol, textCol, index.shingleK)
    val cand = candidatesPrunedCore(
      index.bands, index.numHashes, index.numBands, newSh)
    // the candidate-id predicate must reach the fps scan (the
    // searchStored/q187 lesson, and what the first gsf100 fp probe
    // still paid for: without it every probe re-scans the WHOLE
    // doc-clustered fps table — 2 GB at 2.5M docs — when the doc-sorted
    // layout can row-group-skip to the candidates). The collect is
    // bounded by the same band-collision contract as searchStored's,
    // with the same loud guard.
    val candSchema = cand.schema
    val candRows = cand.limit(maxCandidates + 1).collect()
    require(candRows.length <= maxCandidates,
      s"MinHash candidate set exceeds maxCandidates=$maxCandidates " +
        "(hot band / degenerate corpus?); raise maxCandidates or reduce " +
        "the probe batch")
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(candRows.toIndexedSeq: _*), candSchema)
    val ids = candRows.map(_.getLong(0)).distinct.toSeq
    val fetch =
      if (ids.isEmpty) index.fps.where(lit(false))
      // past ~1e5 ids a literal In() hurts more than it skips — the
      // join below is already correct (the predicate only accelerates)
      else if (ids.length > 100000) index.fps
      else index.fps.where(col("doc_id").isin(ids: _*))
    fetch.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
      .join(broadcast(candDf), Seq("id_a"))
      .join(newSh.select(col("doc_id").as("id_b"), fpOf(col("sh")).as("fp_b")),
        Seq("id_b"))
      // native two-pointer walk over the sorted fingerprint sets —
      // value-identical to the array_intersect/array_union composition
      // (SketchExprsSpec), zero per-row set/array allocation
      .select(col("id_a"), col("id_b"),
        round(org.apache.spark.sql.graft.SketchExprs
          .jaccardSorted(col("fp_a"), col("fp_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Candidate (corpus, stream) pairs for the streaming probe (ST14):
    * the stream side is map-only (per-row shingles → signature → band
    * keys, all `SketchExprs` native loops), candidates come from a
    * stream-static equi-join on the persisted band table — no streaming
    * state, append-legal under any upstream watermark. A pair colliding
    * in b bands surfaces b times. Rows carry the stream doc's TEXT, not
    * its shingle set — text is ~k× smaller than the k-shingle array it
    * expands to, and this projection is duplicated through the ×bands
    * explode and shuffled by any downstream dedup, so the verify stage
    * re-derives shingles (a cheap per-row native expression) AFTER the
    * fan-out instead. Output: (id_a, __sid, ts, __text). */
  private[graft] def candidateStream(index: Index, stream: DataFrame,
      idCol: String, textCol: String, tsCol: String): DataFrame = {
    val base = stream
      .select(col(idCol).as("__sid"), col(tsCol).as("ts"),
        col(textCol).as("__text"))
      .filter(size(TextPrep.tokens(col("__text"))) >= index.shingleK)
    val withBands = TextPrep
      .stagedShingles(base, "__text", index.shingleK, "__sh0")
      .withColumn("hs", TextPrep.baseHashes(col("__sh0")))
      .select(col("__sid"), col("ts"), col("__text"),
        posexplode(SketchExprs.lshBands(
          SketchExprs.minHashSig(col("hs"), index.numHashes),
          index.numBands, index.numHashes / index.numBands))
          .as(Seq("band_id", "band_key")))
    withBands
      .join(index.bands.select(col("band_id"), col("band_key"),
        col("doc_id").as("id_a")), Seq("band_id", "band_key"))
      .where(col("id_a") =!= col("__sid"))
      .select(col("id_a"), col("__sid"), col("ts"), col("__text"))
  }

  /** Exact-Jaccard verification of [[candidateStream]] rows against the
    * persisted shingle table — a stream-static clustered lookup, zero
    * streaming state. Output: (id_a, id_b, ts, jaccard ≥ threshold). */
  private[graft] def verifyStream(index: Index, cand: DataFrame,
      threshold: Double): DataFrame =
    TextPrep.stagedShingles(cand, "__text", index.shingleK, "__sh")
      .join(index.shingles.select(col("doc_id").as("id_a"),
        col("sh").as("sh_a")), Seq("id_a"))
      .select(col("id_a"), col("__sid").as("id_b"), col("ts"),
        round(TextPrep.jaccard(col("sh_a"), col("__sh")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** Streaming form of [[probe]] (ST14 — see
    * [[graft.streaming.StreamNearDup]] for the serving contract):
    * [[candidateStream]] verified by [[verifyStream]] with nothing in
    * between — at-least-once per colliding band (exactly-once needs
    * keyed state; [[graft.streaming.StreamNearDup.dedupedPairs]] puts
    * that dedup BETWEEN the two stages so each pair verifies once).
    * Output: (id_a = corpus doc, id_b = stream doc, ts, jaccard). */
  def probeStream(index: Index, stream: DataFrame, idCol: String,
      textCol: String, tsCol: String, threshold: Double): DataFrame =
    verifyStream(index,
      candidateStream(index, stream, idCol, textCol, tsCol), threshold)

  /** Release the index's cluster-side state. */
  def drop(index: Index): Unit = {
    index.bands.unpersist(); index.shingles.unpersist(); ()
  }

  private val cache = new Memo[Index](drop)

  private val fpCache = Memo.unmanaged[IndexFp]

  /** Serving memo for the fingerprinted bundle (lazy parquet reads —
    * nothing cluster-side to release; the bound caps JVM state). */
  def cachedFp(key: String)(build: => IndexFp): IndexFp = fpCache(key)(build)

  /** Serving memo — the q78_search semantics; bounded LRU, eviction
    * unpersists ([[Memo]]). */
  def cached(key: String)(build: => Index): Index = cache(key)(build)
}
