package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchExprs

/** Deduplication operators for large text corpora — the LLM-training-data
  * pipeline surface (exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard).
  *
  * Scale design (the point of every choice here):
  *
  *   - Exact dedup is one hash-partitioned shuffle on the dedup key with
  *     map-side partial aggregation — never a driver collect.
  *   - Near-dup candidate generation is MinHash + banded LSH: cost is
  *     O(docs × shingles) string hashing plus O(docs × shingles × k) cheap
  *     long re-hashes map-side, then one shuffle of SLIM rows
  *     (doc_id, band_id, band_key) — the shingle sets themselves never ride
  *     through the band shuffle. The all-pairs O(n²) comparison never
  *     happens; only bucket-mates are compared. Skewed buckets (boilerplate
  *     docs) are handled by AQE skew-join splitting.
  *   - Candidates are then *verified* with exact Jaccard on the shingle
  *     sets (joined back by id), so the emitted pairs have exact-threshold
  *     semantics. With bands=32, rows=4 the LSH miss probability at j=0.8
  *     is (1-0.8^4)^32 ≈ 5e-8 — vanishing at the j≥0.9 similarities real
  *     corpora dedup at.
  *   - Every stage is a separate projection with multi-referenced columns
  *     (see TextPrep's evaluation-cost discipline) so tokenizing/hashing
  *     happens exactly once per row, not once per band/permutation.
  */
object Dedup {

  /** Exact duplicate removal on a key: keep the smallest `idCol` per
    * distinct key — deterministic, unlike dropDuplicates (which keeps an
    * arbitrary row per key). One shuffle, map-side combine. */
  def exactKeepFirst(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Per-group duplicate stats (the monitoring twin of exactKeepFirst). */
  def exactStats(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("doc_cnt"),
        countDistinct(col(textCol)).as("distinct_cnt"),
        (count(lit(1)) - countDistinct(col(textCol))).as("dup_cnt"))

  /** (doc_id, sh) shingle sets for docs with ≥1 shingle — the shared
    * verify-side input. Built via the staged (non-collapsible) pipeline.
    *
    * The ≥1-shingle condition is expressed as `tokens ≥ k` BEFORE the
    * shingle projection (they are equivalent): a `size(sh) > 0` filter
    * AFTER it would be alias-substituted and pushed below the projection by
    * PushPredicateThroughNonJoin, re-evaluating the whole shingle pipeline
    * (with the tokenizer re-inlined into the per-index lambda) once per
    * row — measured 5× the query's entire runtime at sf0.1. */
  private[ext] def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    TextPrep.stagedShingles(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
          .filter(size(TextPrep.tokens(col("__text"))) >= shingleK),
        "__text", shingleK, "sh")
      .select(col("doc_id"), col("sh"))

  /** Near-duplicate pairs via MinHash + banded LSH, verified with exact
    * Jaccard over distinct word-`shingleK`-shingles; emits pairs with
    * rounded Jaccard ≥ threshold, each pair once (id_a < id_b).
    *
    * Output: (id_a, id_b, jaccard) — jaccard rounded to 6 places so
    * ordering/comparison is engine-stable.
    */
  def minHashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    val sh = shingleSets(docs, idCol, textCol, shingleK)

    // Sketch: base hashes (one string hash per shingle) → native codegen'd
    // MinHash signature → native band keys (org.apache.spark.sql.graft
    // .SketchExprs — tight k×n loops, no interpreted lambdas).
    val banded = sh
      .withColumn("hs", TextPrep.baseHashes(col("sh")))
      .select(col("doc_id"),
        posexplode(SketchExprs.lshBands(
          SketchExprs.minHashSig(col("hs"), numHashes), bands, rowsPerBand))
          .as(Seq("band_id", "band_key")))

    // Slim bucket-mate equi-join on (band_id, band_key): rows are 24 bytes,
    // not shingle arrays. A pair surfacing in several bands collapses to one
    // row BEFORE the (comparatively costly) exact-Jaccard verification.
    val a = banded.select(col("band_id"), col("band_key"), col("doc_id").as("id_a"))
    val b = banded.select(col("band_id"), col("band_key"), col("doc_id").as("id_b"))
    val candidates = a.join(b, Seq("band_id", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // Verify: join shingle sets back by id (both sides shuffle `sh` on
    // doc_id — identical subplans, so ReuseExchange scans/hashes it once).
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextPrep.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-duplicate candidate pairs: 64-bit SimHash per doc from
    * token hashes, banded into `bands` equal bit-bands (any shared band ⇒
    * candidate), then filtered by Hamming distance ≤ maxHamming.
    *
    * Band-count math (recall vs candidate volume): a candidate needs one
    * EXACT band match, so with flip probability p per bit and w = 64/bands
    * bits per band, P(candidate) = 1-(1-(1-p)^w)^bands. For near-dups at
    * hamming ≈ 6 (p ≈ 0.1), 4×16 bands recall only ≈ 0.56 — 8×8 bands
    * reach ≈ 0.99. Fewer/wider bands ⇒ fewer, tighter buckets (cheaper at
    * scale, lower recall); more/narrower bands ⇒ the reverse. Pigeonhole:
    * pairs with hamming < bands are ALWAYS candidates.
    *
    * Length blocking: a second join key buckets docs by distinct-token
    * count on a log_`lenRatio` grid, with the build side fanned out to both
    * neighbor buckets — every pair within `lenRatio` DISTINCT-TOKEN ratio
    * is guaranteed to meet, while wildly different-length pairs never enter
    * the join probe. Caveat: the ≥0.8 ground truth is SHINGLE-set Jaccard,
    * which bounds the shingle-set ratio (≤1.25), not the distinct-token
    * ratio — on template-heavy corpora (few distinct tokens, many distinct
    * shingles) a true pair can exceed the token-ratio guarantee and be
    * blocked; widen or effectively disable with a large `lenRatio` there.
    * On this corpus the max token ratio among true pairs is 1.09 (<1.25)
    * and the blocking cuts candidate join volume ~4×.
    *
    * Output: (id_a, id_b, hamming) for length-compatible pairs. The sketch
    * is engine-specific (xxhash64-based) so this operator is verified by
    * spec against the MinHash+exact-Jaccard pairs, not by a SQL oracle.
    */
  def simHashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 8,
      bands: Int = 8,
      lenRatio: Double = 1.25): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(lenRatio > 1.0, "lenRatio must exceed 1")
    val bandBits = 64 / bands
    val bandMask = (1L << bandBits) - 1
    // bit b of simhash = majority vote of bit b across distinct token
    // hashes (native codegen'd 64×n loop over the materialized hash array).
    // coalesce(..., lit) makes sig/len_bucket NON-NULLABLE: the band join
    // otherwise derives IsNotNull constraints on its keys, and constraint
    // pushdown re-evaluates the whole sketch pipeline (tokenize + per-token
    // hash + 64×n majority vote) inside a per-row scan filter on BOTH join
    // sides — the PushPredicateThroughNonJoin recompute trap, measured as
    // ~2× this query's entire cost.
    val sigs = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__toks", array_distinct(TextPrep.tokens(col("__text"))))
      .withColumn("sig",
        coalesce(SketchExprs.simHash64(TextPrep.baseHashes(col("__toks"))), lit(0L)))
      .withColumn("len_bucket",
        coalesce(floor(log(greatest(size(col("__toks")), lit(1)).cast("double"))
          / math.log(lenRatio)).cast("long"), lit(0L)))
      .select(col("doc_id"), col("sig"), col("len_bucket"))

    // `bands` bands of 64/bands bits; slim (doc_id, band, sig) rows join.
    val banded = sigs.select(col("doc_id"), col("sig"), col("len_bucket"),
      posexplode(array((0 until bands).map(b =>
        call_function("shiftright", col("sig"), lit(b * bandBits)).bitwiseAND(bandMask)): _*))
        .as(Seq("band_id", "band_val")))

    // The probe side round-robins across the full shuffle-partition count
    // (explicit N ⇒ AQE keeps it): documents parquet is a single split at
    // test scale, and without this the entire multi-million-row probe runs
    // on ONE task. The shuffled rows are slim (id, sig, bucket) — the cost
    // is trivial next to 32× probe parallelism.
    val nPart = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val a = banded.repartition(nPart)
      .select(col("band_id"), col("band_val"), col("len_bucket"),
        col("doc_id").as("id_a"), col("sig").as("sig_a"))
    // b fans out to {bucket-1, bucket, bucket+1}: any pair within one
    // bucket width meets exactly once per shared band.
    val b = banded.select(col("band_id"), col("band_val"),
      explode(array(col("len_bucket") - 1, col("len_bucket"), col("len_bucket") + 1))
        .as("len_bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    // Pair dedup WITHOUT a distinct: a close pair matches in ~3.5 bands on
    // this corpus, and a distinct would shuffle every one of those rows
    // (5.2M rows → 1.5M pairs at sf0.1). Instead each pair is emitted only
    // from its FIRST matching band — "no earlier band also matched" is a
    // pure bitwise predicate over (sig_a, sig_b, band_id), evaluated in the
    // join's codegen'd filter, so the duplicate rows die before any
    // exchange. The hamming filter runs there too, for the same reason.
    def bandOf(sig: Column, b: Int): Column =
      call_function("shiftright", sig, lit(b * bandBits)).bitwiseAND(bandMask)
    val earlierBandMatched = (0 until bands - 1).map { bb =>
      (lit(bb) < col("band_id")) &&
        (bandOf(col("sig_a"), bb) === bandOf(col("sig_b"), bb))
    }.reduceOption(_ || _).getOrElse(lit(false))
    a.join(b, Seq("band_id", "band_val", "len_bucket")).where(col("id_a") < col("id_b"))
      .where(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= maxHamming)
      .where(!earlierBandMatched)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
  }

  /** Exact n-gram Jaccard similarity for an explicit pair list — the
    * verification primitive on its own (J4-style blocked join at scale:
    * the pair list is the blocking structure). */
  def ngramJaccard(
      docs: DataFrame, pairs: DataFrame,
      idCol: String, textCol: String, shingleK: Int): DataFrame = {
    // Only shingle docs the pair list references (left-semi prune): the
    // verify set is typically orders of magnitude smaller than the corpus.
    val ids = pairs.select(col("id_a").as("jid"))
      .union(pairs.select(col("id_b").as("jid"))).distinct()
    val needed = docs.join(ids, col(idCol) === col("jid"), "left_semi")
    val sh = shingleSets(needed, idCol, textCol, shingleK)
      .select(col("doc_id").as("jid"), col("sh").as("jsh"))
    pairs
      .join(sh.select(col("jid").as("id_a"), col("jsh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("jid").as("id_b"), col("jsh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(TextPrep.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
  }

  /** Embedding near-duplicate pairs: exact blocked all-pairs cosine ≥
    * threshold — the O(n²) ground truth for small/blocked inputs; at scale
    * use [[embeddingNearDupLsh]] (same verify tail, LSH candidate stage).
    * Output: (id_a, id_b, cos_sim rounded). */
  def embeddingNearDup(
      embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = embeddings.select(col(idCol).as("eid"),
      col(vecCol).cast("array<double>").as("v"))
    // The streamed side round-robins over the full core count (explicit N ⇒
    // AQE keeps it): the test corpus is one parquet split, and a broadcast
    // nested-loop probe over n² pairs on a single task serializes the whole
    // operator (measured 5.3 s → 1.8 s at sf0.1 on 32 cores).
    val nPart = embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val a = e.repartition(nPart).select(col("eid").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("eid").as("id_b"), col("v").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.VectorFunctions.cosine(col("v_a"), col("v_b")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** LSH-accelerated embedding near-dup — the 100 TB path: candidates are
    * random-hyperplane bucket-mates (≥1 of `tables` tables), exact-cosine
    * verified, so every emitted pair is true-positive; recall follows the
    * table/bit parameters (more tables ⇒ higher recall, bigger candidate
    * set). Same output contract as [[embeddingNearDup]].
    *
    * Scaling: the candidate stage is Σ_buckets occupancy² — with a FIXED
    * bit width, occupancy grows with N and the stage re-quadratizes
    * (measured 20× time for 10× rows at 6 bits). `bits = -1` (default)
    * sizes the bucket space to the corpus instead: bits =
    * log2(N / 32), clamped to [4, 20], holding expected occupancy ≈ 32
    * per table so candidate pairs — and wall-clock — scale ~linearly.
    * More bits means each table's buckets are finer, so recall shifts to
    * the `tables` knob (the standard LSH tradeoff); pass explicit `bits`
    * to pin a recall operating point, or `n` when the corpus row count is
    * already known (manifest stats) — otherwise N is resolved job-free
    * from parquet footers / plan statistics
    * ([[graft.engine.TableStats.rowCountNoJob]]), never a `count()` scan
    * just to pick a parameter. */
  def embeddingNearDupLsh(
      embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 8, bits: Int = -1, dim: Int = 64,
      n: Long = -1L): DataFrame = {
    val e = embeddings.select(col(idCol).as("eid"),
      col(vecCol).cast("array<double>").as("v"))
    val useBits = Similarity.autoBits(embeddings, bits, n)
    val buckets = Similarity.lshBuckets(e, "eid", "v", tables, useBits, dim)
    val a = buckets.select(col("table_id"), col("bucket"), col("eid").as("id_a"))
    val b = buckets.select(col("table_id"), col("bucket"), col("eid").as("id_b"))
    val candidates = a.join(b, Seq("table_id", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(e.select(col("eid").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(e.select(col("eid").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.VectorFunctions.cosine(col("v_a"), col("v_b")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** End-to-end corpus near-dup removal — the operator a pipeline actually
    * calls: MinHash+LSH pair detection ([[minHashLshPairs]]) → connected
    * components ([[Clustering.connectedComponents]]) → keep exactly ONE doc
    * per cluster (the min-id representative) plus every unclustered doc.
    * Pairwise drop ("remove id_b of every pair") over-deletes on chains
    * (a~b, b~c but a≁c would drop both b and c); component-rep keep is the
    * standard closure-correct policy. One extra left join against the
    * (tiny) component list; all docs keep their full row. */
  def dropNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleK: Int = 3, numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    val pairs = minHashLshPairs(docs, idCol, textCol, threshold, shingleK,
      numHashes, bands)
    val comps = Clustering.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    docs.join(comps, Seq(idCol), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("component")
  }

  /** [[dropNearDuplicates]] with a QUALITY keep policy — D16: inside each
    * near-dup cluster keep the doc that maximizes `keepCol` (ties on min
    * id) instead of the min-id one. This is what a curation pipeline
    * actually wants: near-dup clusters usually hold one full document
    * and several truncated/boilerplate-wrapped copies, and min-id keeps
    * whichever crawled first — the quality-argmax policy keeps the best
    * copy (longest, highest quality score, newest — the caller picks the
    * column).
    *
    * Shape at scale: the window that picks winners runs ONLY over
    * clustered docs (inner join against the component list — a tiny
    * fraction of the corpus at real dup rates), never corpus-wide; the
    * unclustered majority passes through an anti join untouched. One
    * extra exchange on `component`, increment-sized. */
  def dropNearDuplicatesKeepBest(docs: DataFrame, idCol: String,
      textCol: String, keepCol: String, threshold: Double,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val pairs = minHashLshPairs(docs, idCol, textCol, threshold, shingleK,
      numHashes, bands)
    val comps = Clustering.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("node", idCol)
    val member = docs.join(comps, Seq(idCol))
    val w = Window.partitionBy(col("component"))
      .orderBy(col(keepCol).desc, col(idCol))
    val winners = member.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "component")
    docs.join(comps.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(winners)
  }

  /** Incremental exact dedup — the steady-state ingest shape: an incoming
    * batch is deduplicated against the already-curated corpus AND within
    * itself, in one pass. A row survives iff (a) its content key appears
    * nowhere in `seen` and (b) it is the min-id holder of that key inside
    * the batch. Returns `incoming` plus an `is_new` flag (callers filter
    * or count; keeping rejected rows makes the op auditable).
    *
    * Shape at scale: the seen side collapses to its distinct key column
    * before the join (one agg with map-side combine), then one
    * hash-partitioned left join on the 32-byte key and one in-partition
    * window keyed by the same column — the exchange is reused between
    * join and window, so the batch shuffles once. Bucketing the curated
    * corpus by key (`Layout.writeBucketed`) removes even that exchange
    * across repeated ingests. */
  def incrementalNew(incoming: DataFrame, seen: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val key = md5(col(textCol))
    val seenKeys = seen.select(key.as("__key")).distinct()
      .withColumn("__seen", lit(1))
    val w = Window.partitionBy(col("__key")).orderBy(col(idCol))
    incoming.withColumn("__key", key)
      .join(seenKeys, Seq("__key"), "left")
      .withColumn("is_new",
        col("__seen").isNull && row_number().over(w) === 1)
      .drop("__seen")
  }

  /** The slim segment inventory: one row per non-overlapping
    * `segmentWords`-token window of each document — (doc_id, pos, seg).
    * Same staged tokenize→grid→slice pipeline as [[Chunker.chunk]] with
    * stride == window (the tail segment may be short; `tokens` is never
    * empty, so the grid is never empty and `explode_outer` ≡ `explode`
    * — outer form keeps the optimizer from inferring a size filter that
    * would re-run the tokenizer below the staged projection).
    *
    * Null-text docs are excluded UP FRONT: without the filter,
    * explode_outer manufactures a null-pos row per null doc and md5(null)
    * pools them all into one dedup group — divergent from any sane
    * "dedup the documents that have text" semantics (and from the SQL
    * twin, which drops them). A null document has no segments. */
  private def segmentRows(docs: DataFrame, idCol: String, textCol: String,
      segmentWords: Int): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__toks", TextPrep.tokens(col("__text")))
      .select(col("doc_id"), col("__toks"),
        explode_outer(sequence(lit(0), size(col("__toks")) - 1,
          lit(segmentWords))).as("pos"))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ",
          slice(col("__toks"), col("pos") + 1, lit(segmentWords))).as("seg"))

  /** Segment-level exact dedup — the C4/RefinedWeb "paragraph dedup"
    * generalized to fixed word windows (this corpus is single-line, so the
    * newline segmenter degenerates; any segmenter that tiles the document
    * works identically). Every distinct segment keeps exactly its FIRST
    * corpus occurrence (ordered by (doc_id, pos) — deterministic, not
    * arbitrary-row); later occurrences are cut out of their documents, and
    * documents are reassembled from their surviving segments in original
    * order. Documents that lose every segment (exact duplicates of earlier
    * docs) drop out entirely.
    *
    * Shape at scale — segment TEXT never rides the dedup shuffle:
    *   1. slim inventory (md5(seg) 16 B, doc_id, pos) is what shuffles to
    *      the first-occurrence window (partitioned by the segment key,
    *      never global);
    *   2. winners collapse to one (doc_id, sorted pos list) row per doc —
    *      a second slim exchange;
    *   3. reassembly joins that back to the ORIGINAL docs table at doc
    *      granularity and re-slices the token array in place, so full text
    *      crosses exactly one exchange (the doc-id join), the same floor
    *      as any operator that must emit rewritten documents.
    *
    * Output: (doc_id, text, kept_segments, total_segments) with `text`
    * rebuilt from surviving segments. */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      segmentWords: Int): DataFrame = {
    require(segmentWords > 0, s"segmentWords must be positive: $segmentWords")
    // First occurrence = min(struct(doc_id, pos)) per segment key: an
    // aggregate with map-side partial combine, not a row_number window —
    // a ubiquitous boilerplate segment would otherwise full-sort one hot
    // partition on a single task. Keying on md5(seg) (16 bytes) instead
    // of the segment string assumes 128-bit collision-freedom — standard
    // for content-addressed dedup (C4 does the same); a collision would
    // drop one non-duplicate segment. Key on the raw seg if that ever
    // becomes unacceptable.
    val winners = segmentRows(docs, idCol, textCol, segmentWords)
      .select(md5(col("seg")).as("seg_md5"), col("doc_id"), col("pos"))
      .groupBy(col("seg_md5"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"), col("__w.pos").as("pos"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__keep"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .join(winners, Seq("doc_id"))
      .withColumn("__toks", TextPrep.tokens(col("__text")))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("__keep"),
          p => concat_ws(" ", slice(col("__toks"), p + 1, lit(segmentWords)))))
          .as("text"),
        size(col("__keep")).cast("long").as("kept_segments"),
        (floor((size(col("__toks")) - 1) / segmentWords) + 1)
          .cast("long").as("total_segments"))
  }

  /** Exact substring dedup — the sliding-window generalization of
    * [[segmentDedup]] (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022: remove every repeated substring
    * of ≥ L tokens, keeping its first corpus occurrence). Where segment
    * dedup tiles the document (stride = window, so a duplicated span
    * straddling a tile boundary survives), this slides a `windowTokens`
    * window at stride 1: every token covered by ANY duplicated window —
    * an L-gram whose first corpus occurrence (by (doc_id, pos)) is
    * elsewhere — is removed, and overlapping duplicated windows merge
    * into maximal spans for free under the coverage rule.
    *
    * Shape at scale — same floor as [[segmentDedup]], text never rides
    * the dedup shuffle:
    *   1. slim inventory (md5(window) 16 B, doc_id, pos), ~n rows per
    *      n-token doc (stride 1), shuffles on the hash;
    *   2. first occurrence per hash = min(struct(doc_id, pos)) — a
    *      map-side-combined aggregate, never a per-hash sort (a
    *      boilerplate window repeated 10⁶× combines locally); the
    *      rejoin that classifies each occurrence against its winner is
    *      an equi-join on the same hash (AQE splits the hot keys);
    *   3. duplicated-window positions collapse to one (doc_id, sorted
    *      pos array) row per affected doc — the second slim exchange —
    *      and full text crosses exactly one exchange (the doc-id
    *      reassembly join), where a per-index coverage filter re-slices
    *      the token array in place.
    *
    * The md5 keying carries the same 128-bit collision assumption as
    * [[segmentDedup]] (standard for content-addressed dedup). Null-text
    * docs are excluded up front (a null document has no windows — and no
    * tokens to keep). Docs shorter than the window have no windows and
    * pass through unchanged; docs that lose every token are emitted with
    * empty text (kept_tokens = 0), not dropped — span removal is a
    * rewrite, not a filter, and the caller decides the empty-doc policy.
    *
    * Output: (doc_id, text, kept_tokens, total_tokens). */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    val L = windowTokens
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("__toks", TextPrep.tokens(col("__text")))
    // guard: sequence(0, n-L) with n < L would COUNT DOWN (Spark infers
    // step -1), manufacturing phantom negative positions
    val wins = base
      .select(col("doc_id"), col("__toks"),
        explode(when(size(col("__toks")) >= L,
          sequence(lit(0), size(col("__toks")) - L))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ",
          slice(col("__toks"), col("pos") + 1, lit(L)))).as("__h"))
    val winners = wins
      .groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("__w"))
    val dupPos = wins.join(winners, Seq("__h"))
      .where(col("doc_id") =!= col("__w.doc_id") ||
        col("pos") =!= col("__w.pos"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("__dups"))
    base.join(dupPos, Seq("doc_id"), "left")
      .withColumn("__d", coalesce(col("__dups"), array().cast("array<int>")))
      .withColumn("__keep",
        filter(sequence(lit(0), size(col("__toks")) - 1),
          i => !exists(col("__d"), q => q <= i && i < q + L)))
      .select(col("doc_id"),
        concat_ws(" ",
          transform(col("__keep"), i => element_at(col("__toks"), i + 1)))
          .as("text"),
        size(col("__keep")).cast("long").as("kept_tokens"),
        size(col("__toks")).cast("long").as("total_tokens"))
  }
}
