package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator / UDTF (SURVEY.md §2.9): emits one row
  * per token n-gram of a string-array input — the extension point for
  * operators whose output cardinality is data-dependent (explode,
  * flatMap) when the built-in generators can't express the semantics.
  * Registered as `ngrams` via [[GraftFunctions.register]].
  *
  * With `distinct = true` (registered as `ngrams_distinct`) each
  * row's repeated grams are deduplicated INSIDE the generator — the
  * row-local replacement for a downstream
  * `(row_key, gram).distinct()` whose key is per-row (a doc's grams
  * live in one row, so the global exchange buys nothing a per-row
  * hash set doesn't; the long-typed sibling `ngram_hashes` was
  * measured 19.6 s cheaper at sf10 for exactly this reason — this
  * variant keeps the STRING gram for ops whose contract is exact
  * string matching, e.g. `contamination`). */
case class NGramsGenerator(child: Expression, n: Int,
    distinct: Boolean = false)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

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
          s"ngrams expects array<string>, got ${other.catalogString}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) return Iterator.empty
    val toks = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < toks.length) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      i += 1
    }
    val grams = (0 to toks.length - n).iterator.map { j =>
      val window = java.util.Arrays.copyOfRange(toks, j, j + n)
      UTF8String.concatWs(NGramsGenerator.Space,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(window): _*)
    }
    if (!distinct) grams.map(InternalRow(_))
    else {
      // LinkedHashSet: first-occurrence order keeps repeat runs
      // bit-identical (row order is plan-invisible either way)
      val seen = new java.util.LinkedHashSet[UTF8String]()
      grams.foreach(seen.add)
      val it = seen.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = InternalRow(it.next())
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramsGenerator =
    copy(child = newChild)
}

object NGramsGenerator {
  private[ext] val Space = UTF8String.fromString(" ")
}
