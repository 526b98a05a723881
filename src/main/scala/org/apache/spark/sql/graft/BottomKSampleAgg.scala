package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Deterministic bottom-k sample aggregate — the mergeable quantile
  * sketch ([[graft.ext.SampleQuantiles]] is the user surface).
  *
  * State: the k pairs (draw, value) with the SMALLEST draws seen so far
  * (ties by value), where `draw` is a caller-supplied deterministic
  * uniform draw (the repo's portable md5 discipline — see
  * `SampleQuantiles.draw`). Because "k smallest of a multiset" is
  * order-independent, the aggregate is a pure function of the input
  * SET: map-side partials, merge order, and partitioning cannot change
  * the result — which is what lets a DuckDB oracle recompute the
  * IDENTICAL sample and makes stored sketches mergeable across
  * shards/days (union the pairs, keep the k smallest).
  *
  * Memory: the buffer never exceeds k pairs (a max-heap evicts the
  * largest), unlike `collect_list`-then-slice, whose partials are
  * unbounded — the difference between a sketch and a spill at 100 TB.
  *
  * Why a TypedImperativeAggregate: bounded per-group state with custom
  * merge is exactly what the interface exists for (Spark's own
  * ApproximatePercentile/HLL sit on it); no combination of declarative
  * aggregates bounds intermediate state at k.
  */
case class BottomKSampleAgg(
    draw: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSampleAgg.Buffer] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(draw, value)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(draw = newChildren(0), value = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("draw", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (draw.dataType != LongType)
      TypeCheckFailure(s"draw must be BIGINT, got ${draw.dataType}")
    else if (value.dataType != DoubleType)
      TypeCheckFailure(s"value must be DOUBLE, got ${value.dataType}")
    else TypeCheckSuccess
  }

  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): BottomKSampleAgg.Buffer =
    new BottomKSampleAgg.Buffer(k)

  override def update(buf: BottomKSampleAgg.Buffer,
      input: InternalRow): BottomKSampleAgg.Buffer = {
    val d = draw.eval(input)
    val v = value.eval(input)
    if (d != null && v != null)
      buf.offer(d.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: BottomKSampleAgg.Buffer,
      other: BottomKSampleAgg.Buffer): BottomKSampleAgg.Buffer = {
    other.foreach(p => buf.offer(p._1, p._2))
    buf
  }

  override def eval(buf: BottomKSampleAgg.Buffer): Any = {
    val pairs = buf.sortedPairs
    new GenericArrayData(pairs.map { case (d, v) =>
      new GenericInternalRow(Array[Any](d, v))
    })
  }

  override def serialize(buf: BottomKSampleAgg.Buffer): Array[Byte] = {
    val pairs = buf.sortedPairs
    val bb = ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    pairs.foreach { case (d, v) => bb.putLong(d); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKSampleAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new BottomKSampleAgg.Buffer(k)
    (0 until n).foreach(_ => buf.offer(bb.getLong(), bb.getDouble()))
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = newOffset)
}

object BottomKSampleAgg {

  /** Column-API entry (ExpressionUtils is private[sql], so the wrapper
    * lives here — the SketchExprs convention). `value` is cast to
    * double by the caller surface. */
  def bottomK(draw: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.classic.ExpressionUtils
    ExpressionUtils.column(
      BottomKSampleAgg(ExpressionUtils.expression(draw),
        ExpressionUtils.expression(value), k).toAggregateExpression())
  }

  /** Max-heap of (draw, value) capped at k: the root is the LARGEST
    * retained pair, evicted when a smaller one arrives. */
  final class Buffer(k: Int) {
    private val heap = scala.collection.mutable.PriorityQueue
      .empty[(Long, Double)](Ordering.Tuple2[Long, Double])

    def offer(d: Long, v: Double): Unit = {
      if (heap.size < k) heap.enqueue((d, v))
      else if (Ordering.Tuple2[Long, Double].lt((d, v), heap.head)) {
        heap.dequeue(); heap.enqueue((d, v))
      }
    }

    def foreach(f: ((Long, Double)) => Unit): Unit = heap.foreach(f)

    /** Pairs sorted ascending by (draw, value) — the deterministic
      * output order. */
    def sortedPairs: Array[(Long, Double)] = heap.toArray.sorted
  }
}
