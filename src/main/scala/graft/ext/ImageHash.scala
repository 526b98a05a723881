package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** M6/D17 — perceptual image hashing + image-content near-dup, the
  * multimodal-pipeline stage document near-dup cannot serve: two crawl
  * captures of the same picture differ in every BYTE (re-encode,
  * resize, brightness) while their perceptual hashes differ in a few
  * BITS. Reference tie: the capability surface is the Tier C
  * "dedup + multimodal columns" north star
  * (`/root/reference/README.md` positions the stack as the storage/
  * query layer such pipelines run on; the reference itself ships no
  * image stage, so this is the LLM-pipeline tier, not a port).
  *
  * Two standard hashes over the REAL JDK decode path
  * ([[Multimodal.decodeImages]]'s codec, same luma weights):
  *
  *  - '''pHash (63 bits)''': luma plane → area-average resample to
  *    32×32 → 2-D DCT-II → the top-left 8×8 coefficient block minus DC
  *    → bit k = coef > 0 (STRICT sign rule, the [[Quantize.binarySig]]
  *    discipline: zeros and negatives are 0, so the packing is exactly
  *    reproducible by any engine). Sign-of-DCT is the median-free pHash
  *    variant: dropping DC makes it brightness-invariant, and the
  *    low-frequency block makes it re-encode/resize-stable.
  *  - '''dHash (63 bits)''': luma → 9×8 area-average grid → bit
  *    (x,y) = L(x+1,y) > L(x,y), the gradient-sign hash (the final
  *    (7,7) comparison is dropped so both hashes are non-negative
  *    BIGINTs any engine can sum as Σ bit·2^k without overflow).
  *
  * Near-dup at scale is the q26 band shape transplanted from Jaccard to
  * Hamming space: split the 63-bit hash into `bands` contiguous slices,
  * bucket-join on (band index, band value), verify exact Hamming on the
  * candidates only. Pigeonhole contract: a pair at Hamming distance
  * d < bands differs in at most d < bands slices, so at least one slice
  * matches exactly — recall 1.0 for d ≤ bands−1, NEVER all-pairs. At
  * 100 TB the shuffle is `bands` fixed-width rows per image (no
  * payloads, no vectors), and the verify tail is bit_count(xor) per
  * candidate — the same two-lever shape the text MinHash path measured
  * sub-linear to gsf100.
  */
object ImageHash {

  final case class ImageHashes(
      media_id: Long, decode_ok: Boolean, phash: Long, dhash: Long)

  private val N = 32 // pHash resample edge
  private val DW = 9 // dHash grid width (8 comparisons per row)
  private val DH = 8

  /** Area-average resample of a luma plane to `ow`×`oh`: output pixel
    * (i,j) is the exact fractional-coverage mean of its source box —
    * deterministic double arithmetic, and the IDENTITY when the source
    * is already `ow`×`oh` (the gate fixture synthesizes 32×32 directly,
    * so its hash carries zero resample error). Exact-coverage area
    * averaging also makes k× pixel replication hash-IDENTICAL to the
    * original — the resize-invariance the spec pins. */
  private[graft] def areaResample(src: Array[Double], w: Int, h: Int,
      ow: Int, oh: Int): Array[Double] = {
    if (w == ow && h == oh) return src
    val out = new Array[Double](ow * oh)
    var j = 0
    while (j < oh) {
      val y0 = j.toDouble * h / oh
      val y1 = (j + 1).toDouble * h / oh
      var i = 0
      while (i < ow) {
        val x0 = i.toDouble * w / ow
        val x1 = (i + 1).toDouble * w / ow
        var sum = 0.0
        var y = math.floor(y0).toInt
        while (y < y1 && y < h) {
          val cy = math.min(y1, y + 1.0) - math.max(y0, y.toDouble)
          if (cy > 0) {
            var x = math.floor(x0).toInt
            while (x < x1 && x < w) {
              val cx = math.min(x1, x + 1.0) - math.max(x0, x.toDouble)
              if (cx > 0) sum += src(y * w + x) * cx * cy
              x += 1
            }
          }
          y += 1
        }
        out(j * ow + i) = sum / ((x1 - x0) * (y1 - y0))
        i += 1
      }
      j += 1
    }
    out
  }

  /** DCT-II basis values cos(π(2x+1)u / 2n) for the 8 lowest
    * frequencies over an n-point axis, computed once per JVM. */
  private lazy val basis32: Array[Array[Double]] =
    Array.tabulate(8, N)((u, x) => math.cos(math.Pi * (2 * x + 1) * u / (2.0 * N)))

  /** 63-bit sign-rule pHash of a 32×32 luma plane. Separable DCT: one
    * 32→8 pass per row axis then per column axis (8·32·32 + 8·8·32
    * multiply-adds — partition-local, no shuffle anywhere near this). */
  private[graft] def phashOf(luma32: Array[Double]): Long = {
    val tmp = Array.ofDim[Double](8, N) // tmp(u)(y) = Σ_x L(x,y)·B_u(x)
    var u = 0
    while (u < 8) {
      val bu = basis32(u)
      var y = 0
      while (y < N) {
        var s = 0.0
        var x = 0
        while (x < N) { s += luma32(y * N + x) * bu(x); x += 1 }
        tmp(u)(y) = s
        y += 1
      }
      u += 1
    }
    var hash = 0L
    var v = 0
    while (v < 8) {
      val bv = basis32(v)
      var uu = 0
      while (uu < 8) {
        if (v != 0 || uu != 0) {
          var s = 0.0
          var y = 0
          while (y < N) { s += tmp(uu)(y) * bv(y); y += 1 }
          val k = v * 8 + uu - 1
          if (s > 0) hash |= 1L << k
        }
        uu += 1
      }
      v += 1
    }
    hash
  }

  /** 63-bit dHash of a 9×8 luma grid: horizontal gradient signs. */
  private[ext] def dhashOf(luma98: Array[Double]): Long = {
    var hash = 0L
    var y = 0
    while (y < DH) {
      var x = 0
      while (x < DW - 1) {
        val k = y * (DW - 1) + x
        if (k < 63 && luma98(y * DW + x + 1) > luma98(y * DW + x))
          hash |= 1L << k
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Decode one blob to its luma plane: (luma, width, height), None on
    * any damage. The ONE decode path every hash consumer shares —
    * batch [[hashes]] and the streaming probe
    * ([[graft.streaming.StreamImageDup]]) must produce identical
    * hashes, so they must share this, not re-state it. */
  private[graft] def decodeLuma(bytes: Array[Byte])
      : Option[(Array[Double], Int, Int)] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val luma = new Array[Double](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            luma(y * w + x) = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((luma, w, h))
      }
    } catch { case _: Exception => None }
  }

  /** 63-bit pHash straight from encoded bytes, None when undecodable. */
  private[graft] def phashOfBytes(bytes: Array[Byte]): Option[Long] =
    decodeLuma(bytes).map { case (luma, w, h) =>
      phashOf(areaResample(luma, w, h, N, N))
    }

  /** Decode + hash every blob: REAL JDK codec, partition-local, failed
    * decodes as ok=false rows (crawl-scale corrupt blobs are data). */
  def hashes(spark: SparkSession, media: DataFrame): Dataset[ImageHashes] = {
    import spark.implicits._
    media.select("media_id", "media").as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, bytes) =>
        decodeLuma(bytes) match {
          case Some((luma, w, h)) =>
            ImageHashes(id, decode_ok = true,
              phashOf(areaResample(luma, w, h, N, N)),
              dhashOf(areaResample(luma, w, h, DW, DH)))
          case None => ImageHashes(id, decode_ok = false, 0L, 0L)
        }
    })
  }

  /** Band slices of `hash` for the bucket join: `bands` rows of
    * (band index, band value), slice b = bits [b·w, (b+1)·w) where
    * w = ⌈64/bands⌉. Plain shift/mask columns — codegen'd. */
  def bandCols(hash: org.apache.spark.sql.Column, bands: Int)
      : org.apache.spark.sql.Column = {
    val width = (64 + bands - 1) / bands
    val mask = (1L << width) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        call_function("shiftrightunsigned", hash, lit(b * width))
          .bitwiseAND(lit(mask)).as("value"))
    }: _*)
  }

  /** All pairs (id_a < id_b) at Hamming distance ≤ `maxDist` between
    * hashes — banded bucket join + exact verify, guaranteed-complete
    * for maxDist < bands (pigeonhole over the band slices). */
  def nearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, bands: Int = 8): DataFrame = {
    require(maxDist < bands,
      s"banded recall guarantee needs maxDist < bands: $maxDist >= $bands")
    val banded = hashes
      .select(col(idCol), col(hashCol),
        explode(bandCols(col(hashCol), bands)).as("b"))
      .select(col(idCol), col(hashCol),
        col("b.band").as("band"), col("b.value").as("value"))
    val a = banded.select(col(idCol).as("id_a"), col(hashCol).as("ha"),
      col("band"), col("value"))
    val b = banded.select(col(idCol).as("id_b"), col(hashCol).as("hb"),
      col("band"), col("value"))
    a.join(b, Seq("band", "value"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** All pairs at Hamming distance ≤ `maxDist` via COMPOUND block keys
    * — the banded join's scale path. The simple band join buckets on
    * one `64/bands`-bit slice, so its candidate volume grows as
    * N²/2^width once N outruns the 2^width bucket space (measured: at
    * 8-bit bands the degeneration is visible by N ≈ 10⁵). The standard
    * fix (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for Web
    * Crawling", WWW'07 — the simhash dedup paper) buckets on
    * COMBINATIONS of blocks instead: split the 63-bit hash into
    * `blocks` = 9 blocks of 7 bits and key on every `keySize`-subset.
    * Pigeonhole: d flips hit ≤ d blocks, so ≥ blocks−d stay clean, and
    * a pair is caught iff some keyed subset is fully clean —
    * guarantee maxDist ≤ blocks − keySize. keySize 2 → 14-bit buckets
    * (256× the key space) with the same d ≤ 7 contract; keySize 3 →
    * 21-bit buckets for d ≤ 6 at the next decade. Same exact-Hamming
    * verify tail; shuffle rows per image = C(blocks, keySize).
    *
    * MEASURED switch rule (PhashProbe decade table, BASELINE §Round 16;
    * per local[32] node at the fixture's real-pair density):
    *   - N ≲ 10⁵: the simple band join ([[nearDupPairs]]) suffices —
    *     8 rows/hash vs 36, both sub-5 s.
    *   - 10⁵ ≲ N: keySize 2 (this default) — 2.8 s at 2×10⁶, 136 s at
    *     8×10⁶, 756 s at 2×10⁷ (its N²/2¹⁴ term is quadratic by 2×10⁷
    *     but still completes).
    *   - keySize 3 is a CLUSTER lever, not a single-node one: its
    *     C(9,3)=84 rows/hash explode (1.7×10⁹ keyed rows at 2×10⁷)
    *     exhausted >200 GB of spill disk and DIED on one node at the
    *     same point where keySize 2 finished — choose it only where
    *     the explode distributes (≥ 10⁸ items on a multi-executor
    *     cluster, where keySize 2's collision term ~N²/2¹⁴ ≈ 6×10¹¹
    *     candidates dwarfs 84·N explode rows and per-node spill is
    *     1/executors of the total). */
  /** The ONE compound-block key builder every Manku-keyed surface
    * shares ([[nearDupPairsBlocked]] and the keyframe video join
    * [[Multimodal.videoNearDupPairsKeyframe]] — the recall-critical
    * key math must never silently diverge between them): an array of
    * C(blocks, keySize) bucket keys per hash, each a combo-tagged
    * concatenation of `keySize` exact blocks. Validity requires live
    * HERE so no caller can reach the empty-combos silent-no-candidates
    * state. */
  private[graft] def blockKeyCols(h: org.apache.spark.sql.Column,
      maxDist: Int, blocks: Int, keySize: Int): org.apache.spark.sql.Column = {
    require(blocks >= 2 && blocks <= 63,
      s"blocks must be in [2, 63], got $blocks")
    require(keySize >= 1 && keySize < blocks,
      s"keySize must be in [1, blocks), got $keySize")
    require(maxDist <= blocks - keySize,
      s"blocked recall guarantee needs maxDist <= blocks - keySize: " +
        s"$maxDist > $blocks - $keySize")
    val width = (63 + blocks - 1) / blocks
    val mask = (1L << width) - 1
    def blockVal(i: Int) =
      call_function("shiftrightunsigned", h, lit(i * width)).bitwiseAND(lit(mask))
    val combos = (0 until blocks).combinations(keySize).toSeq
    array(combos.zipWithIndex.map { case (combo, ci) =>
      combo.foldLeft(lit(ci.toLong): org.apache.spark.sql.Column)(
        (acc, i) => acc * (mask + 1) + blockVal(i))
    }: _*)
  }

  def nearDupPairsBlocked(hashes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, blocks: Int = 9, keySize: Int = 2): DataFrame = {
    val keyed = hashes
      .select(col(idCol), col(hashCol),
        explode(blockKeyCols(col(hashCol), maxDist, blocks, keySize)).as("key"))
    val a = keyed.select(col(idCol).as("id_a"), col(hashCol).as("ha"), col("key"))
    val b = keyed.select(col(idCol).as("id_b"), col(hashCol).as("hb"), col("key"))
    a.join(b, Seq("key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Near-dup pairs between a probe set and a stored corpus (the
    * serving shape): probe bands join the corpus's PRE-BANDED table —
    * clustered by (band, value) so each probe batch's candidates are
    * row-group runs — then exact Hamming on the candidates. Emits
    * (probe_id, corpus_id, dist); self-hits excluded by the caller's id
    * discipline if ids overlap. */
  def probePairs(corpusBanded: DataFrame, corpusHashes: DataFrame,
      probes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, bands: Int = 8): DataFrame = {
    require(maxDist < bands,
      s"banded recall guarantee needs maxDist < bands: $maxDist >= $bands")
    val p = probes
      .select(col(idCol).as("probe_id"), col(hashCol).as("hp"),
        explode(bandCols(col(hashCol), bands)).as("b"))
      .select(col("probe_id"), col("hp"),
        col("b.band").as("band"), col("b.value").as("value"))
    val cand = p.join(corpusBanded, Seq("band", "value"))
      .select(col("probe_id"), col("hp"), col("corpus_id")).distinct()
    cand.join(corpusHashes, "corpus_id")
      .select(col("probe_id"), col("corpus_id"),
        bit_count(col("hp").bitwiseXOR(col("ch"))).cast("long").as("dist"))
      .where(col("dist") <= maxDist && col("probe_id") =!= col("corpus_id"))
  }

  /** Gate fixture: one REAL 32×32 grayscale PNG per id whose luma plane
    * is an explicit 63-mode cosine series — so the pHash is a CLOSED
    * FORM of the id that DuckDB restates without any codec or DCT (the
    * q239 discipline, pushed all the way to hash-exactness):
    *
    *   luma(x,y) = round(128 + Σ_k s_k · 2 · B_{u_k}(x) · B_{v_k}(y))
    *
    * with (u_k, v_k) = ((k+1) mod 8, (k+1) div 8) walking the whole
    * 8×8 AC block and s_k = ±1 per the id's bit pattern
    *   bit_k(id) = [((id div 4)·37 + k·101) mod 7 < 3]  XOR  [k < id mod 4]
    * — a group/variant construction: ids in one group of 4 share a
    * baseline, variant v flips exactly bits {0..v−1}, so within-group
    * Hamming distances are |v_a − v_b| ≤ 3 and the near-dup gate has
    * ground-truth pairs.
    *
    * Why the engine's hash EQUALS the closed form (the margin
    * argument): the DCT is linear, each mode contributes exactly
    * s_k·2·16·16 = ±512 to its own coefficient and 0 to every other;
    * Σ_k |s_k·2| = 126 keeps luma in [2,254] so the codec never clamps;
    * and per-pixel rounding to the PNG byte perturbs any coefficient by
    * at most Σ|0.5·B_u(x)·B_v(y)| < 0.5·(2N/π)² ≈ 208 < 512 — the sign
    * of every AC coefficient is decided by the construction, not the
    * noise, on ANY IEEE engine. */
  def synthesizePatterned(spark: SparkSession, ids: DataFrame,
      idCol: String, brightnessDelta: Int = 0): DataFrame = {
    import spark.implicits._
    require(brightnessDelta >= -1 && brightnessDelta <= 1,
      "fixture luma spans [2,254]; |delta| > 1 would clamp and break the margin argument")
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions(_.map { id =>
      val img = new java.awt.image.BufferedImage(
        N, N, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < N) {
        var x = 0
        while (x < N) {
          var acc = 128.0 + brightnessDelta
          var k = 0
          while (k < 63) {
            val (u, v) = ((k + 1) % 8, (k + 1) / 8)
            val base = ((id / 4) * 37 + k * 101) % 7 < 3
            val s = if (base ^ (k < id % 4)) 2.0 else -2.0
            acc += s * basis32(u)(x) * basis32(v)(y)
            k += 1
          }
          val l = math.round(acc).toInt.max(0).min(255)
          img.setRGB(x, y, (l << 16) | (l << 8) | l)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }).toDF("media_id", "media")
  }

  // ------------------------------------------------- stored bundle (N17)

  /** A loaded pHash bundle: the id-sorted hash table and the
    * (band, value)-clustered band table probes prune against. */
  final case class Bundle(hashes: DataFrame, banded: DataFrame,
      maxDist: Int, bands: Int)

  private val cache = Memo.unmanaged[Bundle]

  /** Serving memo (lazy parquet reads — nothing cluster-side to
    * release; the bound caps JVM state). */
  def cached(key: String)(build: => Bundle): Bundle = cache(key)(build)

  /** Near-dup pairs between probe IMAGES and the stored corpus. */
  def searchBundle(spark: SparkSession, bundle: Bundle,
      probeMedia: DataFrame): DataFrame = {
    val probeHashes = hashes(spark, probeMedia).toDF()
      .where(col("decode_ok"))
    probePairs(bundle.banded,
      bundle.hashes.select(col("media_id").as("corpus_id"),
        col("phash").as("ch")),
      probeHashes, "media_id", "phash", bundle.maxDist, bundle.bands)
  }
}
