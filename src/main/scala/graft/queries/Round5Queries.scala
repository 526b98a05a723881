package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.ext.Multimodal

/** Round-5 declared queries: the MP4 container-metadata surface (M2's
  * video half, previously a declared stub — now a real ISO BMFF box walk)
  * gated through the oracle with the q116 synthesize-then-recompute
  * pattern.
  */
object Round5Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Q163 (M2″, MP4 container metadata through the gate): synthesize one
    * genuine (minimal, well-formed) MP4 box tree per document id, corrupt
    * every 10th container by truncation mid-box, and run the REAL
    * `ftyp`/`moov` box-walk decoder ([[Multimodal.decodeMp4]]). Every
    * decoded property — brand, timescale, duration, track count, codec
    * fourccs in track order — is a pure function of the id, so DuckDB
    * recomputes the whole table without a parser; truncated blobs must
    * come back `decode_ok=false` with zeroed metadata (corrupt blobs are
    * data, not task failures). Narrow maps end-to-end: synthesize →
    * corrupt → decode never shuffles, and the blob never survives past
    * the decoder. */
  val q163 = GQuery("q163_mp4_metadata", (s, d) => {
    val ids = t(s, d, "documents").select(col("doc_id"))
    val mp4s = Multimodal.synthesizeMp4(s, ids, "doc_id")
    val maybeCorrupt = mp4s.withColumn("media",
      when(col("media_id") % 10 === 0, expr("substring(media, 1, 20)"))
        .otherwise(col("media")))
    Multimodal.decodeMp4(s, maybeCorrupt).toDF()
      .select(col("media_id"), col("decode_ok"), col("major_brand"),
        col("timescale"), col("duration_ms"),
        col("n_tracks").cast(LongType).as("n_tracks"), col("codecs"))
      .orderBy("media_id")
  },
    Some("""WITH c AS (SELECT doc_id,
           |    CASE (doc_id + 0) % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c0,
           |    CASE (doc_id + 1) % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c1,
           |    CASE (doc_id + 2) % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c2,
           |    doc_id % 10 = 0 AS corrupt
           |  FROM documents)
           |SELECT doc_id AS media_id,
           |  NOT corrupt AS decode_ok,
           |  CASE WHEN corrupt THEN '' ELSE 'isom' END AS major_brand,
           |  CAST(CASE WHEN corrupt THEN 0 ELSE 1000 END AS BIGINT) AS timescale,
           |  CAST(CASE WHEN corrupt THEN 0
           |       ELSE 500 + (doc_id * 37) % 90000 END AS BIGINT) AS duration_ms,
           |  CAST(CASE WHEN corrupt THEN 0 ELSE 1 + doc_id % 3 END AS BIGINT) AS n_tracks,
           |  CASE WHEN corrupt THEN ''
           |       WHEN doc_id % 3 = 0 THEN c0
           |       WHEN doc_id % 3 = 1 THEN c0 || ',' || c1
           |       ELSE c0 || ',' || c1 || ',' || c2 END AS codecs
           |FROM c ORDER BY media_id""".stripMargin))

  /** Q164 (D5′, embedding near-dup — the SCALE path, benchable): the
    * LSH-bucketed candidate stage + exact-cosine verify tail
    * ([[graft.ext.Dedup.embeddingNearDupLsh]]), the form a 100 TB corpus
    * actually runs. Gated as a q30-style CONTRACT ROW against an exact
    * all-pairs ground truth BOUNDED to the vec_id < 500 subset — at the
    * gate SF that subset IS the whole corpus (sf0.01 ships exactly 500
    * vectors), so the gate's strength is the full quadratic contract,
    * while at scale dirs the twin stays O(500²) and the timed work
    * remains the FULL-corpus LSH path (materialized through a tracked
    * persist BEFORE the subset filters — otherwise Catalyst pushes the
    * id bounds into the candidate join and the bench would time the
    * 500-vector subgraph instead of the operator; the r11–r13 scaling
    * exponents for this entry, BASELINE, were measured on exactly that
    * full-corpus plan). Contract: zero false positives on the subset
    * (anti-join recount), recall ≥ 0.5 over the subset's exact pairs
    * (the DedupSpec floor, held at the gate's auto-bits point), and
    * `n_exact` recomputed independently by DuckDB's quadratic join. */
  val q164 = GQuery("q164_embedding_neardup_lsh", (s, d) => {
    import graft.ext.{Dedup, Memo}
    val e = t(s, d, "embeddings")
    val lsh = Memo.trackTransient(
      Dedup.embeddingNearDupLsh(e, "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    lsh.count() // the scale path's full-corpus work, timed here
    val cap = 500L
    val lshSub = lsh.where(col("id_a") < cap && col("id_b") < cap)
    val exact = Dedup.embeddingNearDup(e.where(col("vec_id") < cap),
        "vec_id", "embedding", 0.4)
      .select(col("id_a"), col("id_b"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val nHits = lshSub.join(exact, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("__hits"))
    val nFp = lshSub.join(exact, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("n_false_pos"))
    nExact.crossJoin(nHits).crossJoin(nFp)
      .select(col("n_exact"), col("n_false_pos"),
        (col("__hits").cast("double") >= col("n_exact") * 0.5).as("recall_ok"))
  },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |           FROM embeddings WHERE vec_id < 500),
           |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |      FROM e a JOIN e b ON a.vec_id < b.vec_id
           |      WHERE round(list_inner_product(a.v, b.v) /
           |        (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) >= 0.4)
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(0 AS BIGINT) AS n_false_pos, true AS recall_ok FROM p""".stripMargin))

  /** Q165 (L1″, manifest-pruned tagged scan through the gate): write
    * events range-partitioned on `event_id` (8 files with disjoint id
    * ranges → tight manifest bounds), tag it, then [[graft.engine.Layout.scanAt]]
    * an id sub-range. The driver-side planner ([[graft.engine.Pruning]])
    * drops files whose bounds exclude the range BEFORE the scan — the
    * Iceberg ManifestEvaluator path — and the `pruned` column pins
    * "fewer files than the manifest" through the oracle (TRUE at every
    * sf: the probe range covers ≤2 of 8 range-partitioned files).
    * Row-level semantics are simultaneously gated: the aggregate must
    * equal DuckDB's over the SAME predicate on the raw table, so pruning
    * can only ever drop files that contribute nothing. DECIMAL-internal
    * sum (exact at 2 decimals) keeps the boundary order-insensitive. */
  val q165 = GQuery("q165_manifest_pruned_scan", (s, d) => {
    import graft.engine.{Layout, Pruning}
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"prunescan_$run"
    t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
      .repartitionByRange(8, col("event_id"))
      .write.saveAsTable(table)
    Layout.snapshot(s, table, "v1")
    val preds = Seq(Pruning.Ge("event_id", 100L), Pruning.Le("event_id", 299L))
    val (total, kept) = Layout.scanAtFileCounts(s, table, "v1", preds)
    Layout.scanAt(s, table, "v1", preds)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .withColumn("pruned", lit(kept < total))
      .orderBy("event_type")
  },
    Some("""SELECT event_type, count(*) AS n,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
           |  TRUE AS pruned
           |FROM events WHERE event_id BETWEEN 100 AND 299
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Q166 (L1‴, bloom-sidecar point lookup through the gate): the
    * needle-in-100 TB shape bounds can NEVER prune — a round-robin
    * layout leaves every file's [min,max] spanning the whole id space,
    * so a point probe keeps all 8 files on bounds alone. The snapshot
    * carries a per-file bloom sidecar ([[graft.engine.Blooms]], built in
    * one codegen'd xxhash64 pass at tag time); [[graft.engine.Layout.scanAt]]
    * consults it on the driver and hands the executors only the files
    * whose blooms claim a probe. `bloom_skipped` pins "fewer files than
    * the manifest" through the oracle (deterministic: each probe id
    * lives in exactly 1 of 8 files; at ~0.2% fp the other files miss),
    * while the row results are simultaneously gated against DuckDB over
    * the raw table — a false positive could only add a file, never a
    * row. */
  val q166 = GQuery("q166_bloom_point_lookup", (s, d) => {
    import graft.engine.{Layout, Pruning}
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"bloomq_$run"
    t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
      .repartition(8)
      .write.saveAsTable(table)
    Layout.snapshot(s, table, "v1", bloomCols = Seq("event_id"))
    val preds = Seq(Pruning.In("event_id", Seq(123L, 456L, 789L)))
    val (total, kept) = Layout.scanAtFileCounts(s, table, "v1", preds)
    Layout.scanAt(s, table, "v1", preds)
      .withColumn("bloom_skipped", lit(kept < total))
      .orderBy("event_id")
  },
    Some("""SELECT event_id, event_type, value, TRUE AS bloom_skipped
           |FROM events WHERE event_id IN (123, 456, 789)
           |ORDER BY event_id""".stripMargin))

  /** Q167 (L10′, merge-on-read DELETE through the gate): two successive
    * [[graft.engine.Layout.deleteWhereMor]] calls write POSITIONAL DELETE
    * files — (file, pos) parquet, Iceberg v2 shape — without rewriting a
    * single data file; the read subtracts them via a broadcast anti join
    * during the scan. The per-call deleted-row counts ride through the
    * gate as pinned columns, which also proves the second delete scans
    * the ALREADY-DELETED state (its count excludes rows the first call
    * removed — double-counting would show here), and the per-lang
    * aggregate over [[graft.engine.Layout.readCurrent]] must equal
    * DuckDB's over the raw table with both predicates negated. */
  val q167 = GQuery("q167_mor_delete", (s, d) => {
    import graft.engine.Layout
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"morq_$run"
    t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4)
      .write.saveAsTable(table)
    val n1 = Layout.deleteWhereMor(s, table, col("doc_id") % 7 === 0)
    val n2 = Layout.deleteWhereMor(s, table, col("lang") === "de")
    Layout.readCurrent(s, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("deleted_first", lit(n1))
      .withColumn("deleted_second", lit(n2))
      .orderBy("lang")
  },
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  (SELECT count(*) FROM documents WHERE doc_id % 7 = 0)
           |    AS deleted_first,
           |  (SELECT count(*) FROM documents
           |   WHERE lang = 'de' AND doc_id % 7 <> 0) AS deleted_second
           |FROM documents WHERE doc_id % 7 <> 0 AND lang <> 'de'
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q168 (T12, distributed BPE-merge training): learn the first 16
    * byte-pair merges of a subword vocabulary from `documents.text` —
    * the tokenizer-building op of a training-data pipeline. The trainer
    * iterates on the word-FREQUENCY table (one corpus shuffle total,
    * Zipf-bounded thereafter); each round is a map-side-combined pair
    * count + fused top-1 + codegen'd fold re-map
    * ([[graft.ext.BpeTrainer]]). The merge sequence is deterministic
    * (count desc, pair asc tie-break) but K chained argmax rounds are
    * not SQL-expressible — so the gate states the TRAIN-SIDE CONTRACT as
    * a row DuckDB can verify (the q30/q186 pattern): exactly the 16
    * requested merges landed (no early stop at gate scale), ranks are
    * contiguous with every winning count over the floor, and the trained
    * merges drive the production encoder over the full corpus with ZERO
    * round-trip failures (BPE merges only regroup characters, so token
    * concatenation must rebuild every whitespace-stripped document
    * byte-exactly). BpeTrainerSpec still pins the merge sequence
    * rank-for-rank against an independent single-node reference. */
  val q168 = GQuery("q168_bpe_train", (s, d) => {
    import graft.ext.BpeTrainer
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val merges = BpeTrainer.train(docs.select(col("text")), "text",
      numMerges = 16, minPairCount = 2)
    val mergesOk = merges.map(_.rank) == (0 until merges.size) &&
      merges.forall(_.count >= 2L)
    BpeTrainer.encodePartitioned(docs, "text", merges)
      .select((concat_ws("", col("tokens")) ===
        regexp_replace(col("text"), "\\s+", "")).as("ok"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_roundtrip_fail"))
      .select(lit(merges.size.toLong).as("n_merges"),
        lit(mergesOk).as("merges_ok"),
        col("n_docs"), col("n_roundtrip_fail"))
  },
    Some("""SELECT CAST(16 AS BIGINT) AS n_merges, true AS merges_ok,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(0 AS BIGINT) AS n_roundtrip_fail FROM documents""".stripMargin))

  /** Q169 (L10″, merge-on-read UPSERT through the gate): one
    * [[graft.engine.Layout.upsertMor]] commit carries a batch that
    * UPDATES every doc_id<50 (new lang, doubled n_chars) and INSERTS 20
    * brand-new keys — written as new data files + an equality-delete
    * file (the Flink→Iceberg CDC ingest shape), zero existing files
    * rewritten. Correct sequence-number scoping is what the oracle
    * actually checks: the upsert's own rows must survive the same
    * commit's delete of their keys (update rows land exactly once) while
    * every pre-existing version dies — any scoping error double-counts
    * or zeroes the 'upserted' group. DuckDB recomputes the post-upsert
    * state from the raw table with plain CASE/UNION. */
  val q169 = GQuery("q169_mor_upsert", (s, d) => {
    import graft.engine.Layout
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val table = s"upsq_$run"
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(4).write.saveAsTable(table)
    val updates = docs.filter(col("doc_id") < 50)
      .select(col("doc_id"), lit("upserted").as("lang"),
        (col("n_chars") * 2).as("n_chars"))
    val inserts = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        lit("brandnew").as("lang"),
        lit(7L).cast("bigint").as("n_chars"))
    Layout.upsertMor(s, table, updates.unionByName(inserts), "doc_id")
    Layout.readCurrent(s, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  },
    Some("""WITH cur AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id < 50 THEN 'upserted' ELSE lang END AS lang,
           |    CASE WHEN doc_id < 50 THEN n_chars * 2 ELSE n_chars END AS n_chars
           |  FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000, 'brandnew', 7 FROM documents WHERE doc_id < 20
           |)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM cur GROUP BY lang ORDER BY lang""".stripMargin))

  /** Q170 (N5, int8 embedding quantization through the gate): symmetric
    * per-vector quantization ([[graft.ext.Quantize.int8]]) — the 4×
    * memory/shuffle compression under every ANN stage; per-vector scales
    * cancel in cosine, so rankings survive (QuantizeSpec holds the ≥0.9
    * recall contract and the half-step reconstruction bound). The gate
    * checks the quantization ARITHMETIC exactly: `floor(x/scale + 0.5)`
    * is IEEE-exact and identically defined in both engines, so the
    * emitted integer summaries (sum, L1 mass, extremes of each quantized
    * vector) must match DuckDB bit-for-bit — no float-compare slack
    * anywhere. All codegen'd array HOFs, one narrow pass. */
  val q170 = GQuery("q170_embedding_quantize", (s, d) => {
    import graft.ext.Quantize
    val q = Quantize.int8(
      t(s, d, "embeddings").filter(col("vec_id") < 500), "embedding")
    q.select(col("vec_id"),
        round(col("scale"), 6).as("scale"),
        aggregate(col("q8"), lit(0L),
          (acc, v) => acc + v.cast("long")).as("q_sum"),
        aggregate(col("q8"), lit(0L),
          (acc, v) => acc + abs(v.cast("long"))).as("q_l1"),
        array_min(col("q8")).cast(LongType).as("q_min"),
        array_max(col("q8")).cast(LongType).as("q_max"))
      .orderBy("vec_id")
  },
    Some("""WITH q AS (
           |  SELECT vec_id,
           |    list_max(list_transform(embedding, x -> abs(x))) / 127.0 AS s,
           |    CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0
           |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
           |      ELSE list_transform(embedding,
           |        x -> CAST(floor(x / (list_max(list_transform(embedding,
           |               y -> abs(y))) / 127.0) + 0.5) AS BIGINT)) END AS q8
           |  FROM embeddings WHERE vec_id < 500)
           |SELECT vec_id, round(s, 6) AS scale,
           |  CAST(list_sum(q8) AS BIGINT) AS q_sum,
           |  CAST(list_sum(list_transform(q8, v -> abs(v))) AS BIGINT) AS q_l1,
           |  CAST(list_min(q8) AS BIGINT) AS q_min,
           |  CAST(list_max(q8) AS BIGINT) AS q_max
           |FROM q ORDER BY vec_id""".stripMargin))

  /** Q171 (D10, segment-level exact dedup): the C4/RefinedWeb paragraph
    * dedup — every distinct 12-word segment keeps only its first corpus
    * occurrence and documents are rebuilt from surviving segments
    * ([[graft.ext.Dedup.segmentDedup]]). Rebuilt text is verified by md5
    * so the oracle checks every byte of every surviving document, not
    * just the counts. Scale shape: segment text never rides the dedup
    * shuffle — a slim (md5, doc_id, pos) inventory does — and full text
    * crosses exactly one exchange (the doc-granularity reassembly join). */
  val q171 = GQuery("q171_segment_dedup", (s, d) =>
    graft.ext.Dedup.segmentDedup(t(s, d, "documents"), "doc_id", "text", 12)
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("kept_segments"), col("total_segments"))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
           |    string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
           |segs AS (SELECT doc_id, g.start AS pos,
           |    array_to_string(list_slice(w, g.start + 1,
           |      g.start + least(12, len(w) - g.start)), ' ') AS seg
           |  FROM t, LATERAL (SELECT unnest(generate_series(0, len(w) - 1, 12)) AS start) g),
           |keep AS (SELECT doc_id, pos, seg FROM segs
           |  QUALIFY row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1),
           |re AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text2,
           |    count(*) AS kept FROM keep GROUP BY doc_id)
           |SELECT r.doc_id, md5(r.text2) AS text_md5,
           |  CAST(r.kept AS BIGINT) AS kept_segments,
           |  CAST(floor((len(t.w) - 1) / 12) + 1 AS BIGINT) AS total_segments
           |FROM re r JOIN t ON r.doc_id = t.doc_id
           |ORDER BY r.doc_id""".stripMargin))

  val all: Seq[GQuery] =
    Seq(q163, q164, q165, q166, q167, q168, q169, q170, q171)
}
