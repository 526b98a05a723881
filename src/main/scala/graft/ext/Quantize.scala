package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the memory side of similarity search at
  * 100 TB: a 768-dim float corpus is ~3 KB/vector; symmetric per-vector
  * int8 cuts that 4× (and the shuffle/broadcast bytes of every ANN
  * stage with it) while cosine rankings survive nearly unchanged,
  * because per-vector scales CANCEL in cosine — cos(αa, βb) = cos(a, b)
  * — so the only error is elementwise rounding.
  *
  * Everything is codegen'd array HOFs (`transform`/`zip_with`/
  * `aggregate`), no UDFs. The rounding is `floor(x/scale + 0.5)` rather
  * than `round()`: floor is exact in IEEE double and identically
  * defined everywhere, which keeps the quantized integers bit-equal
  * across engines (the DuckDB oracle recomputes them from the raw
  * floats — integer outputs, zero float-compare risk).
  */
object Quantize {

  /** Add `scale` (= max|x| / 127) and `q8` (int array in [-127, 127],
    * elementwise floor(x/scale + 0.5)) for `vecCol`. All-zero vectors
    * quantize to all-zero with scale 0 (no division). The int range is
    * closed under the rounding: x ≤ max|x| ⇒ x/scale ≤ 127 ⇒
    * floor(·+0.5) ≤ 127, and symmetrically ≥ -127. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val maxabs = array_max(transform(col(vecCol), x => abs(x)))
    df.withColumn("scale", maxabs / lit(127.0))
      .withColumn("q8", transform(col(vecCol), x =>
        when(col("scale") === 0d, lit(0))
          .otherwise(floor(x / col("scale") + lit(0.5)).cast("int"))))
  }

  /** Reconstruct floats from a quantized vector (for error audits). */
  def dequantize(q8: Column, scale: Column): Column =
    transform(q8, q => q.cast("double") * scale)

  /** Cosine over two int8 vectors — exact integer dot/norms in long
    * arithmetic (768 dims × 127² ≈ 1.2e7 per term: no overflow), one
    * double division at the end. Equals the cosine of the dequantized
    * vectors exactly (scales cancel). */
  def cosineQ8(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => (p * q).cast("long")),
        lit(0L), (acc, v) => acc + v)
    val d = dot(a, b).cast("double")
    val na = dot(a, a).cast("double")
    val nb = dot(b, b).cast("double")
    when(na === 0d || nb === 0d, lit(0d)).otherwise(d / sqrt(na * nb))
  }

  /** Brute-force cosine top-k over the QUANTIZED corpus — the N1
    * baseline shape (broadcast probes, one corpus scan, per-probe
    * windowed top-k) at a quarter of the scan bytes. Returns
    * (probe_id, id, score, rk). */
  def bruteForceTopKQ8(corpus: DataFrame, idCol: String, q8Col: String,
      probes: DataFrame, probeIdCol: String, probeQ8Col: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.crossJoin(broadcast(probes))
      .withColumn("score", cosineQ8(col(q8Col), col(probeQ8Col)))
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(probeIdCol), col(idCol), col("score"), col("rk"))
  }

  // ---- 1-bit (binary) quantization ----------------------------------
  //
  // The tier below int8: keep only each dimension's SIGN. A dim-d float
  // vector becomes ⌈d/32⌉ packed words (d=64 → 16 bytes vs 256 float
  // bytes, 16×), and the angular distance estimator is pure integer
  // work: for sign vectors, popcount(xor) counts the dimensions where
  // two vectors disagree in sign, and by the hyperplane argument
  // P[sign disagree] = θ/π per dimension — Hamming distance is a
  // d-sample estimate of the angle, the same estimator an LSH table
  // with d random hyperplanes uses, except the "hyperplanes" are the
  // coordinate axes and the signature is data-independent (append ≡
  // rebuild bit-for-bit, no frozen plane state to carry). Production
  // ANN serves exactly this shape (faiss/Lucene binary quantization):
  // Hamming shortlist over the packed table, float re-rank on the
  // shortlist only.
  //
  // Lane discipline: bits pack into 32-bit LANES carried as BIGINT
  // values. Packing 64 bits per word would shift into the signed top
  // bit, which the DuckDB twin refuses (`1::BIGINT << 63` overflows
  // there, while Spark wraps) — 32-bit lanes make every word a small
  // non-negative integer both engines compute identically, at the cost
  // of 2× the (already tiny) word count. xor/bit_count over the lanes
  // are unaffected.

  /** Sign-bit signature of `vec`: ⌈dim/32⌉ BIGINT lanes, bit i of lane
    * w set iff vec[32w+i] > 0 (strict — zeros and negatives are 0, so
    * the packing is exactly reproducible from the floats by any
    * engine). Codegen'd array HOFs, no UDF. */
  def binarySig(vec: Column, dim: Int): Column = {
    require(dim > 0, s"binarySig needs a positive dim, got $dim")
    val words = (dim + 31) / 32
    array((0 until words).map { w =>
      val n = math.min(32, dim - w * 32)
      aggregate(
        zip_with(slice(vec, w * 32 + 1, n), sequence(lit(0), lit(n - 1)),
          (x, i) => when(x > lit(0d),
            call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
        lit(0L), (acc, v) => acc.bitwiseOR(v))
    }: _*)
  }

  /** Hamming distance between two packed signatures:
    * Σ popcount(a[w] xor b[w]) — integer-only, one fused HOF pass. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)
}
