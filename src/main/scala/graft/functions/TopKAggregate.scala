package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import java.nio.ByteBuffer
import scala.collection.mutable

/** `top_k_by(sort, payload, k)` — per-group top-k as a bounded-heap
  * aggregate.
  *
  * The window idiom (`row_number() OVER (PARTITION BY g ORDER BY s DESC)
  * <= k`) shuffles and SORTS every row of every group. This aggregate
  * keeps a k-element heap per group, participates in partial aggregation
  * (map-side combine: each task ships at most k elements per group, not
  * its whole partition), and never sorts more than k items at eval.
  * At 100 TB with hot groups that is the difference between a bounded
  * merge and a multi-terabyte sort.
  *
  * Semantics: payloads of the k largest `sort` values, ties broken by
  * smaller payload first; result array ordered (sort desc, payload asc)
  * — identical to the window idiom with the same ORDER BY, which is what
  * the DuckDB oracle of q42 checks.
  */
case class TopKOrderedAgg(
    sortExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // queue dequeues the WORST kept element: smallest sort, then largest payload
  private val evictOrd: Ordering[(Double, Long)] =
    Ordering.by { case (s, p) => (-s, p) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](evictOrd)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = sortExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null) {
      buf.enqueue((s.asInstanceOf[Double], p.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, p) => (-s, p) }
    new GenericArrayData(sorted.map(_._2).toArray)
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sortExpr, payloadExpr)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKOrderedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKOrderedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(sortExpr = newChildren(0), payloadExpr = newChildren(1))
  override def prettyName: String = "top_k_by"
}

object TopKAggregate {
  /** Column form: payloads (LongType) of the top-k rows by `sort`
    * (DoubleType) per group. */
  def topKBy(sort: Column, payload: Column, k: Int): Column =
    CatalystBridge.column(
      TopKOrderedAgg(
        CatalystBridge.expression(sort.cast("double")),
        CatalystBridge.expression(payload.cast("long")), k)
        .toAggregateExpression())
}
