package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

import java.nio.{ByteBuffer, ByteOrder}

/** Shared Bloom-filter kernel for [[BloomAgg]] (build) and
  * [[BloomMightContain]] (probe) — the runtime-filter / semi-join
  * pushdown primitive (SURVEY.md §4): build a compact filter over the
  * small side's join keys, broadcast it, and drop non-matching fact
  * rows BEFORE the shuffle join. At 100 TB this is the difference
  * between shuffling the full fact table and shuffling only the ~join
  * output.
  *
  * Layout: fixed 2^20 bits (128 KiB) with 4 probes per key — ~10
  * bits/key headroom up to ~10^5 build keys (fpp < 1%); beyond that
  * fpp degrades gracefully and the mandatory exact join behind the
  * filter keeps answers exact at any fpp. Hashing is double-hashing
  * over two SplitMix64 mixes of the key — pure integer arithmetic,
  * deterministic everywhere, and callable from generated code (the
  * probe is codegen'd via the static forwarders of this object).
  */
object BloomUtil {
  val LogBits = 20
  val NumLongs: Int = (1 << LogBits) / 64
  val NumHashes = 4

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the 4 probe bits of `v` in `bits`. */
  def add(bits: Array[Long], v: Long): Unit = {
    val h1 = mix(v + 0x9e3779b97f4a7c15L)
    val h2 = mix(v ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) >>> (64 - LogBits)).toInt
      bits(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** True iff all 4 probe bits of `v` are set in the serialized
    * filter (little-endian long array as bytes). */
  def mightContain(bloom: Array[Byte], v: Long): Boolean = {
    val h1 = mix(v + 0x9e3779b97f4a7c15L)
    val h2 = mix(v ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) >>> (64 - LogBits)).toInt
      val word = bit >>> 6
      val b = bloom(word * 8 + ((bit & 63) >>> 3))
      if (((b >> (bit & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val bits = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < bits.length) { bits(i) = bb.getLong; i += 1 }
    bits
  }
}

/** Build side: aggregate LongType join keys into a Bloom filter
  * (BinaryType). Partials merge by bitwise OR — fully associative and
  * commutative, so the build is one scan + a 128 KiB reduce no matter
  * the partitioning. Registered as `bloom_agg`. */
case class BloomAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_agg expects BIGINT, got ${t.catalogString}")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = BinaryType

  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomUtil.NumLongs)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Probe side: `bloom_contains(bloomBytes, key)` — true iff the key
  * MIGHT be in the build set (no false negatives). Codegen'd: the
  * generated code calls [[BloomUtil]]'s static forwarder directly, so
  * the probe stays inside WholeStageCodegen on the fact-scan hot
  * path. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (BINARY, BIGINT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(b: Any, v: Any): Any =
    BloomUtil.mightContain(b.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.ext.BloomUtil.mightContain($b, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
