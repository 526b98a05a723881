package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-15 declared queries: perceptual image hashing + image-content
  * near-dup (M6/D17/N17 — the multimodal-pipeline stage VERDICT r14
  * ranked first among what's missing), gated hash-exact through the
  * closed-form cosine-mode fixture ([[graft.ext.ImageHash
  * .synthesizePatterned]]: the q239 "DuckDB recomputes codec-free"
  * discipline pushed all the way to the hash bits). */
object Round15Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Shared oracle prelude: the fixture's closed-form hash bits.
    * bit_k(id) = [((id div 4)·37 + k·101) mod 7 < 3] XOR [k < id mod 4]
    * — the margin argument in the synthesizer's scaladoc is what makes
    * the ENGINE's decode→resample→DCT→sign pipeline provably land on
    * these bits, so the oracle never touches a codec or a DCT. */
  private val bitsCte =
    """ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 48),
      |ks AS (SELECT unnest(generate_series(0, 62)) AS k),
      |bits AS (SELECT media_id, k,
      |    ((((media_id // 4) * 37 + k * 101) % 7 < 3) <> (k < media_id % 4)) AS bit
      |  FROM ids, ks)""".stripMargin

  /** Q248 (M6, perceptual hash): 63-bit sign-rule pHash of every
    * fixture image through the REAL JDK decode path, hash-exact against
    * the closed form, plus the brightness-invariance contract the
    * operator exists for — a +1-luma re-encode of every image pHashes
    * IDENTICALLY (the dropped DC absorbs the shift; every AC sign holds
    * its ±512 margin). dHash is deliberately NOT in this contract
    * column: the cosine fixture makes some adjacent 9×8 grid cells
    * ANALYTICALLY equal, so their gradient bits sit on an FP knife edge
    * no margin argument covers — dHash's shift invariance is pinned in
    * ImageHashSpec on a gradient fixture built for it instead. */
  val q248 = GQuery("q248_phash", (s, d) => {
    import graft.ext.ImageHash
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 48)
    val h = ImageHash.hashes(s,
      ImageHash.synthesizePatterned(s, ids, "doc_id")).toDF()
    val hs = ImageHash.hashes(s,
      ImageHash.synthesizePatterned(s, ids, "doc_id", brightnessDelta = 1)).toDF()
      .select(col("media_id"), col("phash").as("phash_s"))
    h.join(hs, "media_id")
      .select(col("media_id"), col("decode_ok"), col("phash"),
        (col("phash") === col("phash_s")).as("shift_ok"))
      .orderBy("media_id")
  },
    Some(s"""WITH $bitsCte
            |SELECT media_id, true AS decode_ok,
            |  CAST(sum(CASE WHEN bit THEN 1::BIGINT << k ELSE 0::BIGINT END)
            |       AS BIGINT) AS phash,
            |  true AS shift_ok
            |FROM bits GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** Q249 (D17, image near-dup): all pairs at pHash Hamming distance
    * ≤ 7 via the banded bucket join (8 bands — pigeonhole recall 1.0
    * for d ≤ 7, never all-pairs). The fixture's group/variant
    * construction guarantees ground-truth near pairs (within-group
    * distances ≤ 3); the oracle recomputes EVERY pairwise distance from
    * the closed-form bits, so band recall, the verify tail, and the
    * distances are all hash-exact. */
  val q249 = GQuery("q249_phash_neardup", (s, d) => {
    import graft.ext.ImageHash
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 48)
    val h = ImageHash.hashes(s,
      ImageHash.synthesizePatterned(s, ids, "doc_id")).toDF()
      .where(col("decode_ok"))
    ImageHash.nearDupPairs(h, "media_id", "phash", maxDist = 7, bands = 8)
      .orderBy("id_a", "id_b")
  },
    Some(s"""WITH $bitsCte,
            |p AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
            |        CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)
            |             AS BIGINT) AS dist
            |      FROM bits a JOIN bits b
            |        ON a.k = b.k AND a.media_id < b.media_id
            |      GROUP BY 1, 2)
            |SELECT id_a, id_b, dist FROM p WHERE dist <= 7
            |ORDER BY id_a, id_b""".stripMargin))

  /** Q250 (N17, stored-bundle serve): image near-dup through the
    * durable pHash bundle — corpus ids <40 written, 40–47 APPENDED
    * through the staged-token CAS (hashing is per-row pure, so the
    * append is bit-identical to a rebuild by construction), then probe
    * images 24–47 banded against the stored (band,value)-clustered
    * table with the exact-Hamming verify tail. Memoized per (session,
    * dir): rep 1 pays build+append+load, reps 2+ price steady serving.
    * The oracle recomputes every probe×corpus distance from the
    * closed-form bits — the append path, the stored band layout, and
    * the serve join all have to agree with it to stay hash-exact. */
  val q250 = GQuery("q250_phash_bundle_search", (s, d) => {
    import graft.ext.{ImageHash, IndexStore}
    val ids = t(s, d, "documents").select(col("doc_id"))
    val b = ImageHash.cached(s.sparkContext.applicationId + ":phash:" + d) {
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/phash_${Registry.pathKey(d)}"
      IndexStore.writePhash(s, ImageHash.synthesizePatterned(s,
        ids.where(col("doc_id") < 40), "doc_id"), dir, maxDist = 7, bands = 8)
      IndexStore.appendPhash(s, ImageHash.synthesizePatterned(s,
        ids.where(col("doc_id") >= 40 && col("doc_id") < 48), "doc_id"), dir)
      IndexStore.loadPhash(s, dir)
    }
    val probes = ImageHash.synthesizePatterned(s,
      ids.where(col("doc_id") >= 24 && col("doc_id") < 48), "doc_id")
    ImageHash.searchBundle(s, b, probes)
      .orderBy("probe_id", "corpus_id")
  },
    Some(s"""WITH $bitsCte,
            |p AS (SELECT a.media_id AS probe_id, b.media_id AS corpus_id,
            |        CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)
            |             AS BIGINT) AS dist
            |      FROM bits a JOIN bits b
            |        ON a.k = b.k AND a.media_id >= 24
            |          AND b.media_id <> a.media_id
            |      GROUP BY 1, 2)
            |SELECT probe_id, corpus_id, dist FROM p WHERE dist <= 7
            |ORDER BY probe_id, corpus_id""".stripMargin))

  /** Q251 (D17′, compound-block near-dup — the scale path): the same
    * pairs as q249 through [[graft.ext.ImageHash.nearDupPairsBlocked]]
    * — 9 blocks of 7 bits, pair keys (Manku et al. WWW'07), guarantee
    * d ≤ 9−2 = 7 with 14-bit buckets where the simple band join has
    * 8-bit ones (the N²/2^width degeneration PhashProbe measures).
    * Same oracle as q249: the two candidate generators must converge
    * on the identical exact-verified pair set. */
  val q251 = GQuery("q251_phash_neardup_blocked", (s, d) => {
    import graft.ext.ImageHash
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 48)
    val h = ImageHash.hashes(s,
      ImageHash.synthesizePatterned(s, ids, "doc_id")).toDF()
      .where(col("decode_ok"))
    ImageHash.nearDupPairsBlocked(h, "media_id", "phash",
      maxDist = 7, blocks = 9, keySize = 2)
      .orderBy("id_a", "id_b")
  }, q249.oracle)

  /** Shared audio-oracle prelude: the tone fixture's closed-form
    * per-(segment, frame) peak bins. The exact-bin construction in
    * [[graft.ext.AudioFingerprint.synthesizeTones]] is what makes the
    * engine's REAL decode→DFT→argmax land on these (zero spectral
    * leakage at bin centers; own-bin magnitude² ≈ 2.3e12 vs 16-bit
    * rounding noise). */
  private val audioCte =
    """ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 48),
      |segs AS (SELECT unnest(generate_series(0, 7)) AS s),
      |frs AS (SELECT unnest(generate_series(0, 3)) AS fr),
      |f AS (SELECT media_id, s, fr,
      |    4 + ((media_id - media_id % 4) * 31 + s * 17) % 60
      |      + CASE WHEN s < media_id % 4 THEN 1 ELSE 0 END AS bin
      |  FROM ids, segs, frs)""".stripMargin

  /** Q252 (M7, audio fingerprint): the per-frame spectral-peak sequence
    * of every fixture WAV through the REAL RIFF decode + DFT path,
    * hash-exact against the closed form (rendered as one '-'-joined
    * string per file so the driver hashes a scalar column). */
  val q252 = GQuery("q252_audio_fingerprint", (s, d) => {
    import graft.ext.AudioFingerprint
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 48)
    AudioFingerprint.peaks(s,
      AudioFingerprint.synthesizeTones(s, ids, "doc_id")).toDF()
      .select(col("media_id"), col("decode_ok"),
        array_join(transform(col("peaks"), _.cast("string")), "-").as("sig"))
      .orderBy("media_id")
  },
    Some(s"""WITH $audioCte
            |SELECT media_id, true AS decode_ok,
            |  string_agg(bin::VARCHAR, '-' ORDER BY s, fr) AS sig
            |FROM f GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** Q253 (D18, audio near-dup): all pairs sharing ≥ 20 of 32 (frame,
    * peak) positions via the frame-indexed bucket join. The fixture's
    * group/variant construction (variant v raises segments 0..v−1 by
    * one bin) makes within-group pairs share exactly 4·(8−|Δv|) ≥ 20
    * frames; the oracle recomputes EVERY pair's shared count from the
    * closed-form bins, so candidate generation and the verify count
    * both gate hash-exact. */
  val q253 = GQuery("q253_audio_neardup", (s, d) => {
    import graft.ext.AudioFingerprint
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 48)
    val p = AudioFingerprint.peaks(s,
      AudioFingerprint.synthesizeTones(s, ids, "doc_id")).toDF()
      .where(col("decode_ok"))
    AudioFingerprint.nearDupPairs(p, "media_id", "peaks", minShared = 20)
      .orderBy("id_a", "id_b")
  },
    Some(s"""WITH $audioCte,
            |p AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
            |        count(*)::BIGINT AS shared
            |      FROM f a JOIN f b
            |        ON a.s = b.s AND a.fr = b.fr AND a.bin = b.bin
            |          AND a.media_id < b.media_id
            |      GROUP BY 1, 2)
            |SELECT id_a, id_b, shared FROM p WHERE shared >= 20
            |ORDER BY id_a, id_b""".stripMargin))

  /** Q254 (M8, video fingerprint): the quantized frame-luma signature
    * of every fixture AVI through the REAL MJPEG frame decode —
    * hash-exact because the fixture's frame luma is 16·(1 + (id+f) mod
    * 13) (the q239 law), whose decoded value lands within ±2.5 (the DC
    * quantizer band) of a bucket CENTER: round(luma/16) recovers the
    * closed form exactly on any decoder inside that band. */
  val q254 = GQuery("q254_video_fingerprint", (s, d) => {
    import graft.ext.Multimodal
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 60)
    Multimodal.videoFingerprint(s, Multimodal.synthesizeAvi(s, ids, "doc_id"))
      .orderBy("media_id", "frame_index")
  },
    Some("""WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 60),
           |f AS (SELECT media_id,
           |        unnest(generate_series(0, CAST(media_id % 4 AS BIGINT))) AS frame_index
           |      FROM ids)
           |SELECT media_id, frame_index,
           |  CAST(1 + (media_id + frame_index) % 13 AS BIGINT) AS qluma
           |FROM f ORDER BY media_id, frame_index""".stripMargin))

  /** Q255 (D19, video near-dup): pairs sharing ≥ 1 (frame, bucket)
    * position. Under the fixture law two videos share ANY frame iff
    * id_a ≡ id_b (mod 13), and then share ALL min(n_a, n_b) sampled
    * frames — so the pair set is the congruence classes and every
    * shared count is a closed form DuckDB restates. */
  val q255 = GQuery("q255_video_neardup", (s, d) => {
    import graft.ext.Multimodal
    val ids = t(s, d, "documents").select(col("doc_id")).where(col("doc_id") < 60)
    val fp = Multimodal.videoFingerprint(s,
      Multimodal.synthesizeAvi(s, ids, "doc_id"))
    Multimodal.videoNearDupPairs(fp, minShared = 1)
      .orderBy("id_a", "id_b")
  },
    Some("""WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 60),
           |g AS (SELECT media_id,
           |        unnest(generate_series(0, CAST(media_id % 4 AS BIGINT))) AS frame_index
           |      FROM ids),
           |f AS (SELECT media_id, frame_index,
           |        CAST(1 + (media_id + frame_index) % 13 AS BIGINT) AS qluma
           |      FROM g),
           |p AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
           |        count(*)::BIGINT AS shared
           |      FROM f a JOIN f b
           |        ON a.frame_index = b.frame_index AND a.qluma = b.qluma
           |          AND a.media_id < b.media_id
           |      GROUP BY 1, 2)
           |SELECT id_a, id_b, shared FROM p WHERE shared >= 1
           |ORDER BY id_a, id_b""".stripMargin))

  /** Q256 (N18, stored audio-fingerprint serve): audio near-dup through
    * the durable bundle — corpus <40 written, 40–47 APPENDED through
    * the staged-token CAS (fingerprinting is per-row pure: append ≡
    * rebuild by construction), probes 24–47 bucket-joined against the
    * (frame, bin)-clustered print table, shared-count verify in the
    * join's aggregate. Memoized per (session, dir); the oracle
    * recomputes every probe×corpus shared count from the closed-form
    * bins, so the append path, the stored clustering, and the serve
    * join all gate together (the q250 discipline on the audio plane). */
  val q256 = GQuery("q256_audio_bundle_search", (s, d) => {
    import graft.ext.{AudioFingerprint, IndexStore}
    val ids = t(s, d, "documents").select(col("doc_id"))
    val b = AudioFingerprint.cached(s.sparkContext.applicationId + ":audiofp:" + d) {
      val dir = sys.props("java.io.tmpdir") +
        s"/graft_idx/audiofp_${Registry.pathKey(d)}"
      IndexStore.writeAudioFp(s, AudioFingerprint.synthesizeTones(s,
        ids.where(col("doc_id") < 40), "doc_id"), dir, minShared = 20)
      IndexStore.appendAudioFp(s, AudioFingerprint.synthesizeTones(s,
        ids.where(col("doc_id") >= 40 && col("doc_id") < 48), "doc_id"), dir)
      IndexStore.loadAudioFp(s, dir)
    }
    val probes = AudioFingerprint.synthesizeTones(s,
      ids.where(col("doc_id") >= 24 && col("doc_id") < 48), "doc_id")
    AudioFingerprint.searchBundle(s, b, probes)
      .orderBy("probe_id", "corpus_id")
  },
    Some(s"""WITH $audioCte,
            |p AS (SELECT a.media_id AS probe_id, b.media_id AS corpus_id,
            |        count(*)::BIGINT AS shared
            |      FROM f a JOIN f b
            |        ON a.s = b.s AND a.fr = b.fr AND a.bin = b.bin
            |          AND a.media_id >= 24 AND b.media_id <> a.media_id
            |      GROUP BY 1, 2)
            |SELECT probe_id, corpus_id, shared FROM p WHERE shared >= 20
            |ORDER BY probe_id, corpus_id""".stripMargin))

  /** Q257 (D20, cross-modal dedup): corpus near-dup removal where
    * duplicate-ness composes TRANSITIVELY across modalities — edges =
    * text pairs (exact 3-shingle Jaccard ≥ 0.8, the q26 law) ∪ image
    * pairs (pHash Hamming ≤ 7 over the closed-form fixture, the q249
    * law) → one connected-components pass → min-id representative.
    * Docs 0–95 carry fixture images (24 groups; the fixture's 7-class
    * baseline mixer makes some groups share hashes — larger multi-group
    * components that genuinely exercise the cross-modal closure);
    * summarized per lang with an id-sum pinning the exact survivor
    * set. The oracle recomputes BOTH edge sets (exhaustive Jaccard +
    * bit-formula distances) and the recursive-CTE closure over their
    * union — the q64 discipline across two modalities. */
  val q257 = GQuery("q257_crossmodal_dedup", (s, d) => {
    import graft.ext.{CrossModalDedup, ImageHash}
    val docs = t(s, d, "documents").where(col("doc_id") < 96)
    val media = ImageHash.synthesizePatterned(s,
      docs.select(col("doc_id")), "doc_id")
      .select(col("media_id").as("doc_id"), col("media"))
    CrossModalDedup.dropNearDuplicates(s, docs, media, "doc_id", "text",
      textThreshold = 0.8, imageMaxDist = 7)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("lang")
  },
    Some(s"""WITH RECURSIVE ${PipelineQueries.duckShingles3},
            |docs AS (SELECT * FROM documents WHERE doc_id < 96),
            |tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            |       FROM s a JOIN s b ON a.doc_id < b.doc_id
            |       WHERE a.doc_id < 96 AND b.doc_id < 96
            |         AND round(len(list_intersect(a.sh, b.sh))::DOUBLE
            |               / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.8),
            |ks AS (SELECT unnest(generate_series(0, 62)) AS k),
            |bits AS (SELECT doc_id AS media_id, k,
            |    ((((doc_id // 4) * 37 + k * 101) % 7 < 3) <> (k < doc_id % 4)) AS bit
            |  FROM docs, ks),
            |ip AS (SELECT a.media_id AS id_a, b.media_id AS id_b
            |       FROM bits a JOIN bits b
            |         ON a.k = b.k AND a.media_id < b.media_id
            |       GROUP BY 1, 2
            |       HAVING sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 7),
            |pe AS (SELECT id_a, id_b FROM tp UNION SELECT id_a, id_b FROM ip),
            |e AS (SELECT id_a AS src, id_b AS dst FROM pe
            |      UNION SELECT id_b, id_a FROM pe),
            |reach AS (
            |  SELECT src AS node, src AS r FROM e
            |  UNION
            |  SELECT e.dst AS node, reach.r FROM reach JOIN e ON e.src = reach.node),
            |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
            |SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
            |FROM docs
            |WHERE doc_id NOT IN (SELECT node FROM comp)
            |   OR doc_id IN (SELECT node FROM comp WHERE node = component)
            |GROUP BY lang ORDER BY lang""".stripMargin))

  val all: Seq[GQuery] =
    Seq(q248, q249, q250, q251, q252, q253, q254, q255, q256, q257)
}
