package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a TypedImperativeAggregate
  * (SURVEY.md §2.13 extension surface): `k` counters over a string
  * stream, returning item -> estimated count as a MapType.
  *
  * Guarantees (hold under ANY partitioning / merge order — the
  * mergeable-summaries property, PAPERS.md frequent-items line):
  *  - underestimate only: est(x) <= exact(x);
  *  - bounded error: exact(x) - est(x) <= n / (k+1) <= n / k;
  *  - superset: every item with exact(x) > n/(k+1) is in the sketch.
  *
  * The declared `heavy_hitters` query leans on exactly these: it
  * outputs the claimed items whose EXACT count clears n/k (a
  * deterministic set by the superset guarantee) plus a boolean that
  * the estimate is in bound (deterministically TRUE) — so the result
  * hash-matches an exact-count oracle even though per-partition merge
  * order varies run to run.
  *
  * 100 TB shape: the sketch is a fixed k-entry map regardless of
  * stream size; partials combine map-side and merge associatively,
  * so a heavy-hitter pass over a full crawl is one scan plus a
  * k-sized final reduce — no shuffle of raw items at all.
  */
case class MgTopK(
    child: Expression,
    k: Int = 8,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2 && k <= 65536, s"k must be in [2, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"mg_topk expects STRING, got ${t.catalogString}")
    }

  override def nullable: Boolean = false

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UnsafeRow buffer
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None =>
          if (buf.size < k) buf.update(item, 1L)
          else decrementAll(buf, 1L)
      }
    }
    buf
  }

  /** Mergeable-summaries MG merge: pointwise sum, then if over
    * capacity subtract the (k+1)-th largest count from everything and
    * drop non-positives — error bounds add, so the combined sketch
    * keeps the n/(k+1) guarantee for any merge tree. */
  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      val m = buf.values.toArray.sortBy(-_).apply(k) // (k+1)-th largest
      decrementAll(buf, m)
    }
    buf
  }

  private def decrementAll(buf: mutable.HashMap[String, Long],
      by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (item, c) =>
      if (c <= by) dead += item else buf.update(item, c - by)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic key order (the map value itself is only consumed
    // via explode + join in declared queries, but stable order keeps
    // direct displays reproducible)
    val sorted = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(
      sorted.map(e => UTF8String.fromString(e._1): Any),
      sorted.map(_._2: Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MgTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgTopK =
    copy(child = newChildren.head)
}
