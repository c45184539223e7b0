package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

import java.nio.ByteBuffer
import scala.collection.mutable

/** `kmv_distinct(value, k)` — K-Minimum-Values distinct-count sketch
  * (Bar-Yossef et al. 2002) as a mergeable bounded-state aggregate.
  *
  * Each value hashes through the portable quadratic family
  * (`(A·(x² mod P) + B·x + C) mod P`, seed range 3000 — disjoint from
  * the minhash/simhash/seed-selection ranges) into [0, P); the sketch
  * keeps only the k SMALLEST DISTINCT hashes per group. If the group
  * holds fewer than k distinct hashes the count is exact; otherwise the
  * kth-smallest hash `h_k` estimates the cardinality as
  * `(k-1) · P / h_k` (the k-th order statistic of n uniform draws sits
  * near k·P/n).
  *
  * Why this over `approx_count_distinct` (HLL, also shipped — q35):
  * KMV state is k longs — trivially mergeable (union + truncate, which
  * is exactly [[merge]]), EXACT below k, and built on the portable hash,
  * so the DuckDB oracle replays the estimate bit-for-bit (HLL's
  * engine-specific hashing can only be range-checked). Scale shape:
  * partial aggregation ships at most k longs per group per task — the
  * same bounded-merge story as [[TopKOrderedAgg]].
  *
  * Determinism: the buffer is a sorted distinct set, so update/merge
  * order never changes the kept k; the one double divide at eval is
  * correctly rounded in any IEEE engine.
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) buf += h
    else if (h < buf.last) { buf += h; if (buf.size > k) buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, KmvSketch.portableHash(v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * KmvSketch.HashP / math.max(buf.last, 1L)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  private[graft] val HashP = 1000000007L
  /** Seed 3000 keeps this family disjoint from minhash (0+), simhash
    * (1000+), and IVF seed selection (2000). Exposed so the q60 oracle
    * embeds the identical constants. */
  private[graft] val Consts: (Long, Long, Long) = graft.operators.Dedup.seedConsts(3000)

  /** JVM-side portable hash — the exact arithmetic the oracle SQL
    * replays with the doubled modulo (x may be negative). */
  private[graft] def portableHash(x: Long): Long = {
    val (a, b, c) = Consts
    val xm = ((x % HashP) + HashP) % HashP
    val x2 = (xm * xm) % HashP
    (((a * x2 + b * xm + c) % HashP) + HashP) % HashP
  }

  /** Column form: KMV estimate (DoubleType) of distinct `value`s per
    * group; exact when the group has fewer than k distinct hashes. */
  def kmvDistinct(value: Column, k: Int): Column =
    CatalystBridge.column(
      KmvDistinctAgg(CatalystBridge.expression(value.cast("long")), k)
        .toAggregateExpression())
}
