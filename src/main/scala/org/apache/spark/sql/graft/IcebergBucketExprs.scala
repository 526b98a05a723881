package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-faithful `bucket[N]` partition transform.
  *
  * The Iceberg table spec (public, iceberg.apache.org/spec/#appendix-b)
  * fixes the bucket transform as
  * `(murmur3_x86_32(serialized value) & Integer.MAX_VALUE) % N` with
  * per-type serialization: int/long/date hash the value as an 8-byte
  * little-endian LONG (so `bucket(34)` == `bucket(34L)` — types can widen
  * without reshuffling data, the spec's design goal), strings hash their
  * UTF-8 bytes. Spark's own `hash()` is also murmur3 but seed-42 over
  * Spark's internal layouts, so it does NOT reproduce Iceberg buckets —
  * hence this expression. Spec test vectors (hash(34L)=2017239379,
  * hash("iceberg")=1210000089) are pinned in IcebergBucketSpec, which is
  * what makes the written layout readable by a real Iceberg reader's
  * bucket pruning.
  */
object IcebergMurmur3 {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k: Int): Int = {
    var k1 = k * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  private def mixH1(h: Int, k1: Int): Int = {
    var h1 = h ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  private def fmix(h: Int, len: Int): Int = {
    var h1 = h ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^ (h1 >>> 16)
  }

  /** murmur3_x86_32 of the 8-byte little-endian encoding of `v`, seed 0 —
    * the Iceberg hash for int/long/date/time/timestamp values. */
  def hashLong(v: Long): Int = {
    var h1 = 0 // seed
    h1 = mixH1(h1, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  /** murmur3_x86_32 over raw bytes, seed 0 — the Iceberg hash for
    * string (UTF-8 bytes) and binary values. */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    val nBlocks = len / 4
    var h1 = 0 // seed
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      val k = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    var k1 = 0
    var tail = nBlocks * 4
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) { k1 ^= data(tail) & 0xff; h1 ^= mixK1(k1) }
    fmix(h1, len)
  }

  def hashUtf8(s: UTF8String): Int = hashBytes(s.getBytes)

  /** The spec's bucket function over an already-computed hash. */
  def bucket(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n
}

/** `bucket[n](child)` per the Iceberg spec; supports the integral family
  * (int/long/date — all hash as long) and strings. Codegen'd static
  * calls, constant-folded when the child is a literal (the probe side of
  * a bucket lookup becomes a partition-pruning constant). */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "bucket count must be positive")
  override def dataType: DataType = IntegerType
  override def prettyName: String = s"iceberg_bucket_$n"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => IcebergMurmur3.bucket(IcebergMurmur3.hashLong(input.asInstanceOf[Long]), n)
    case IntegerType | DateType =>
      IcebergMurmur3.bucket(IcebergMurmur3.hashLong(input.asInstanceOf[Int].toLong), n)
    case StringType =>
      IcebergMurmur3.bucket(IcebergMurmur3.hashUtf8(input.asInstanceOf[UTF8String]), n)
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "org.apache.spark.sql.graft.IcebergMurmur3"
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case LongType =>
        s"${ev.value} = $m.bucket($m.hashLong($v), $n);"
      case IntegerType | DateType =>
        s"${ev.value} = $m.bucket($m.hashLong((long) $v), $n);"
      case StringType =>
        s"${ev.value} = $m.bucket($m.hashUtf8($v), $n);"
      case other => throw new IllegalStateException(s"unsupported $other")
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

object IcebergBucketExprs {
  /** Column surface: `icebergBucket(col, 16)`. */
  def icebergBucket(c: Column, n: Int): Column =
    ExpressionUtils.column(IcebergBucket(ExpressionUtils.expression(c), n))
}
