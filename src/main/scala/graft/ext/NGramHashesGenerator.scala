package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting one row per DISTINCT `xxhash64` of a token
  * n-gram — the row-local form of
  * `ngrams → xxhash64 → distinct-within-doc`.
  *
  * Why it exists (GramProbe, sf10): in the rare-gram pair kernel the
  * global `(doc_id, gram_hash).distinct()` was the single most
  * expensive stage — ~19.6 s of the 33 s `shingle_containment` tail —
  * yet all it deduplicates is repeats WITHIN one document, because
  * doc_id is part of the key. A document's grams live in one row, so
  * the dedup is row-local by construction: this generator evaluates
  * the token array once (the CollapseProject re-split trap —
  * SimilarityOps:161 — cannot reach inside a Generator), hashes each
  * n-gram with the same seed-42 xxhash64 as the SQL function, dedups
  * in a per-row hash set, and emits longs. Downstream the df rollup
  * map-side-combines on the 8-byte key and NO distinct exchange
  * exists at all. Registered as `ngram_hashes` via
  * [[GraftFunctions.register]].
  *
  * `withPos = true` (registered as `ngram_hash_pos`) is the
  * positional variant for span-coverage ops (`dedup_spans`): it
  * emits `(pos, g)` for EVERY span start — no dedup, because the
  * start position makes each row unique by construction — with the
  * SAME seed-42 xxhash64 over the space-joined gram, so its `g`
  * joins directly against `ngram_hashes` output. A fused generator
  * beats `posexplode(transform(sequence(...), i -> xxhash64(...)))`
  * for the same reason the dedup variant beats its HOF chain:
  * higher-order lambdas pay interpreted dispatch per element
  * (SCALE.md round 13, winnow_stats), and a Generator's input cannot
  * be re-split by CollapseProject.
  */
case class NGramHashesGenerator(child: Expression, n: Int,
    withPos: Boolean = false)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def elementSchema: StructType =
    if (withPos)
      StructType(StructField("pos", IntegerType, nullable = false) ::
        StructField("g", LongType, nullable = false) :: Nil)
    else
      StructType(StructField("g", LongType, nullable = false) :: Nil)

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
          s"ngram_hashes expects array<string>, got ${other.catalogString}")
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
    if (withPos) {
      // positional mode: one row per span start, no dedup (pos is
      // already a unique key within the row)
      val out = new Array[InternalRow](toks.length - n + 1)
      var j = 0
      while (j <= toks.length - n) {
        val window = java.util.Arrays.copyOfRange(toks, j, j + n)
        val gram = UTF8String.concatWs(NGramsGenerator.Space,
          scala.collection.immutable.ArraySeq.unsafeWrapArray(window): _*)
        out(j) = InternalRow(j, XxHash64Function.hash(gram, StringType, 42L))
        j += 1
      }
      return out.iterator
    }
    // LinkedHashSet: dedup with deterministic (first-occurrence)
    // emission order — row output order is plan-invisible but
    // determinism keeps repeated runs bit-identical
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= toks.length - n) {
      val window = java.util.Arrays.copyOfRange(toks, j, j + n)
      val gram = UTF8String.concatWs(NGramsGenerator.Space,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(window): _*)
      // same bytes, same 42 seed as the SQL xxhash64(gram) this replaces
      seen.add(XxHash64Function.hash(gram, StringType, 42L))
      j += 1
    }
    val it = seen.iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow = InternalRow(it.next().longValue())
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): NGramHashesGenerator = copy(child = newChild)
}
