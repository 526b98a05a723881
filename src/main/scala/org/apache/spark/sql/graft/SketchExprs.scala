package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native codegen'd sketch expressions over a *materialized* base-hash
  * array (`xxhash64` per token/shingle — the only string hashing done).
  *
  * The higher-order-function formulations evaluate k×n (MinHash: 128×n)
  * or 64×n (SimHash) interpreted lambda calls per row; these generate one
  * tight primitive loop using Spark's own XXH64 long-rehash. The sketch
  * values are engine-internal (candidate generation only — emitted pairs
  * are exact-verified), so the hash-family change is behavior-neutral for
  * every oracle-checked output.
  */

/** k-permutation MinHash signature of an ARRAY<BIGINT> of base hashes:
  * sig[i] = min_j XXH64.hashLong(h_j, seed=i), Long.MaxValue when empty. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = XXH64.hashLong(h, i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $hs.numElements();
         |for (int j = 0; j < $n; j++) {
         |  long h = $hs.getLong(j);
         |  for (int i = 0; i < $k; i++) {
         |    long v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, i);
         |    if (v < $sig[i]) $sig[i] = v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of an ARRAY<BIGINT> of base hashes: bit b is set iff the
  * majority of hashes have bit b set (strict majority; ties clear). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val cnt = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (cnt(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $hs.numElements();
         |for (int j = 0; j < $n; j++) {
         |  long h = $hs.getLong(j);
         |  for (int b = 0; b < 64; b++) {
         |    if (((h >>> b) & 1L) == 1L) $cnt[b]++; else $cnt[b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int b = 0; b < 64; b++) { if ($cnt[b] > 0) $sig |= (1L << b); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band keys of an ARRAY<BIGINT> MinHash signature: bands keys, each
  * the XXH64 chain over its rowsPerBand signature values (seeded by the
  * band index so identical band contents in different bands collide only
  * by chance). */
case class LshBands(child: Expression, bands: Int, rowsPerBand: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bands"

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(sig.getLong(b * rowsPerBand + r), acc)
        r += 1
      }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      val keys = ctx.freshName("keys")
      s"""
         |long[] $keys = new long[$bands];
         |for (int b = 0; b < $bands; b++) {
         |  long acc = (long) b;
         |  for (int r = 0; r < $rowsPerBand; r++) {
         |    acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |      $sig.getLong(b * $rowsPerBand + r), acc);
         |  }
         |  $keys[b] = acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of elements of an ARRAY<BIGINT> that might be in a driver-held
  * bloom filter — the per-ROW form of a probe-then-count: one tight
  * native loop per row instead of explode → `might_contain` → re-group.
  * What makes it load-bearing: the per-row shape needs NO aggregation,
  * so a STREAMING decontamination scan stays map-only/append-mode with
  * zero state ([[graft.streaming.StreamDecontaminate]]); in batch it
  * deletes the plan's only exchange. The filter deserializes once per
  * task (referenced object), never per row. */
case class BloomHitCount(bf: Array[Byte], child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count"

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(bf)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var i = 0; var c = 0L
    val n = arr.numElements()
    while (i < n) {
      if (filter.mightContainLong(arr.getLong(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloomFilter", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0L;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($f.mightContainLong($arr.getLong($i))) ${ev.value}++;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard over two SORTED-DISTINCT ARRAY<BIGINT> fingerprint
  * sets (the [[graft.ext.MinHashIndex.IndexFp]] storage invariant): one
  * two-pointer merge walk counts the intersection with ZERO allocation —
  * `array_intersect`/`array_union` each build a hash set and materialize
  * a result array per row, which is the dominant verify cost once the
  * fetch is fingerprint-sized. |A∪B| = |A|+|B|−|A∩B| (both sides
  * duplicate-free by the storage contract), 0.0 on empty union —
  * value-identical to the `TextPrep.jaccard` composition it replaces
  * (SketchExprsSpec pins equality on random sets + edges). */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
    with Serializable {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long xv = $x.getLong($i); long yv = $y.getLong($j);
         |  if (xv == yv) { $inter++; $i++; $j++; }
         |  else if (xv < yv) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SketchExprs {
  private def e(c: Column) = ExpressionUtils.expression(c)

  /** Exact Jaccard over two sorted-distinct ARRAY<BIGINT> sets. */
  def jaccardSorted(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedJaccard(e(a), e(b)))
  def minHashSig(hashes: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(e(hashes), k))
  def simHash64(hashes: Column): Column =
    ExpressionUtils.column(SimHash64(e(hashes)))
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    ExpressionUtils.column(LshBands(e(sig), bands, rowsPerBand))

  /** Spark's own bloom-filter aggregate over a BIGINT key column (the
    * expression behind runtime row-level filtering, public SQL name
    * `bloom_filter_agg`) — one binary sketch cell per group. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        e(key),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Membership probe against a driver-held bloom filter embedded as a
    * binary literal (foldable, so `BloomFilterMightContain`'s
    * constant-or-subquery analysis rule accepts it). */
  def bloomMightContain(bf: Array[Byte], key: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bf, BinaryType),
        e(key)))

  /** Per-row bloom hit count over an ARRAY<BIGINT> of key hashes. */
  def bloomHitCount(bf: Array[Byte], hashes: Column): Column =
    ExpressionUtils.column(BloomHitCount(bf, e(hashes)))
}
