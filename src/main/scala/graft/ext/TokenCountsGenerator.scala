package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting one (w, tf) row per DISTINCT token of a
  * string-array input — the row-local form of
  * `explode(toks) → groupBy(doc_id, w).count()`.
  *
  * Why it exists: the (doc_id, w) term-frequency rollup that opens
  * `tfidf_top` / `bm25_top` groups by a key that is complete within
  * one input row (a document's tokens live in its own token array),
  * yet the hash aggregate still exchanges every (doc_id, w) cell
  * because Catalyst cannot see the containment. Counting inside the
  * generator leaves the plan with NO data-sized exchange: the df
  * rollup that follows is dictionary-sized and map-side combined,
  * the df/N sides broadcast, and the top-k is a TakeOrdered.
  * Registered as `token_counts` via [[GraftFunctions.register]].
  */
case class TokenCountsGenerator(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def elementSchema: StructType = StructType(
    StructField("w", StringType, nullable = false) ::
      StructField("tf", LongType, nullable = false) :: Nil)

  override def collectionType: DataType = ArrayType(elementSchema)

  override val inline: Boolean = false

  override def position: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_counts expects array<string>, got ${other.catalogString}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) return Iterator.empty
    // LinkedHashMap: first-occurrence emission order keeps repeat
    // runs bit-identical (row order is plan-invisible either way)
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val w = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      counts.merge(w, 1L, (a, b) => a + b)
      i += 1
    }
    val it = counts.entrySet().iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow = {
        val e = it.next()
        InternalRow(e.getKey, e.getValue)
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenCountsGenerator = copy(child = newChild)
}
