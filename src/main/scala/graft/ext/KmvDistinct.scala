package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.{DataType, LongType}

import java.nio.ByteBuffer
import scala.collection.mutable

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate (SURVEY.md §2.13 / §4 M7): the mergeable
  * sketch shape behind GA-style pre-aggregated distinct-user cubes —
  * per-partition (or per-date-partition) sketches merge exactly via
  * set-union of the k smallest hashes, so a 100 TB fleet aggregates
  * distinct users without ever shuffling raw ids twice.
  *
  * Deterministic: hashing is XxHash64 with a fixed seed, merge is a
  * set union — the estimate is identical for any partitioning of the
  * same input (asserted in SketchSpec).
  *
  * Estimator: with fewer than k distinct hashes the count is exact;
  * otherwise the classic KMV estimate (k-1) / r where r is the k-th
  * smallest hash mapped to (0,1]. Registered as `kmv_distinct` via
  * [[GraftFunctions.register]].
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 16, s"k must be >= 16, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    // evaluate the child ONCE and hash the value directly (hashing
    // via an XxHash64 expression would re-evaluate the child);
    // buffer stores sign-flipped hashes so Long ordering = unsigned
    // ordering — flip exactly once, here
    val v = child.eval(input)
    if (v != null)
      add(buf, XxHash64Function.hash(v, child.dataType, 42L) ^ Long.MinValue)
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _)) // already sign-flipped
    buf
  }

  private def add(buf: mutable.TreeSet[Long], u: Long): Unit = {
    if (buf.size < k) buf += u
    // evict only for a hash NOT already kept: a duplicate arriving
    // while full must be a no-op, else `buf += u` dedups and the
    // eviction silently shrinks the k-smallest set (undercounting)
    else if (u < buf.max && !buf.contains(u)) { buf -= buf.max; buf += u }
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // k-th smallest unsigned hash mapped to (0, 1]
      val r = (buf.max.toDouble - Long.MinValue.toDouble) /
        (Long.MaxValue.toDouble - Long.MinValue.toDouble)
      // r == 0 iff the k-th smallest unsigned hash is 0 (astronomically
      // unlikely but possible): dividing would yield Long.MaxValue.
      // Fall back to the exact lower bound we do know: k distinct seen.
      if (r <= 0.0) buf.size.toLong else math.round((k - 1) / r)
    }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}
