package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused winnowing-fingerprint kernel (`winnow_stats(array<string>)`
  * → struct<n_grams, n_fp, fp_min, fp_xor bigint>): one pass that
  * computes exactly what `winnowing_fingerprint`'s four chained
  * higher-order-function columns compute —
  *
  *   1. per-token polynomial char hash (acc·31 + codepoint, mod 2³⁰,
  *      seed 7 — `tokHash`'s fold),
  *   2. 4-token-gram hash over those (acc·1000003 + th, mod 2³⁰,
  *      seed 7),
  *   3. sliding window-of-4 minima over the gram hashes (the winnow),
  *   4. distinct selected minima → count / min / xor-fold.
  *
  * Bit-identical to the HOF chain by construction: same fold orders,
  * same modulus, same window rule (`nw = 0 | 1 | n−3` with the final
  * windows clipped by `least(4, n−j+1)`), same empty-input fallbacks
  * (min = 0 on no grams; xor seed 0). ApiSpec's facade-equivalence
  * test locks the native kernel against the HOF original on the
  * fixture corpus.
  *
  * Why native: every stage of the HOF chain pays per-element
  * interpreted-lambda dispatch (transform→aggregate over chars, per
  * gram, per window), which StageProbe measured as 282 s of task time
  * (9.2 s wall) at sf10 — the whole op. The fused loop does the same
  * integer arithmetic in primitive locals. CodegenFallback is
  * deliberate: one virtual eval per ROW is noise next to the per-CHAR
  * lambda dispatch it replaces, and the interesting loops live inside
  * eval either way. */
case class WinnowStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Mod = 1073741824L // 2^30

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_stats expects array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_min", LongType, nullable = false),
    StructField("fp_xor", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "winnow_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    // 1. token hashes (codePoints matches ascii() over split(tk, ''):
    //    both see one value per code point for any non-surrogate text,
    //    and the full code point for surrogate pairs)
    val ths = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      if (toks.isNullAt(t)) return null
      val s = toks.getUTF8String(t).toString
      var acc = 7L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31L + cp) % Mod
        i += Character.charCount(cp)
      }
      ths(t) = acc
      t += 1
    }
    // 2. 4-gram hashes
    val nG = if (nTok >= 4) nTok - 3 else 0
    val gh = new Array[Long](nG)
    var g = 0
    while (g < nG) {
      var acc = 7L
      var j = g
      while (j < g + 4) {
        acc = (acc * 1000003L + ths(j)) % Mod
        j += 1
      }
      gh(g) = acc
      g += 1
    }
    // 3. window-of-4 minima + 4. distinct fold (xor/min/count are
    //    order-independent, so a hash set IS array_distinct here)
    val nw = if (nG == 0) 0 else if (nG <= 4) 1 else nG - 3
    val seen = new java.util.HashSet[Long]()
    var fpMin = 0L
    var fpXor = 0L
    var first = true
    var w = 0
    while (w < nw) {
      val end = math.min(w + 4, nG)
      var m = gh(w)
      var j = w + 1
      while (j < end) { if (gh(j) < m) m = gh(j); j += 1 }
      if (seen.add(m)) {
        fpXor ^= m
        if (first || m < fpMin) { fpMin = m; first = false }
      }
      w += 1
    }
    new GenericInternalRow(
      Array[Any](nG.toLong, seen.size.toLong, fpMin, fpXor))
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowStats = copy(child = newChild)
}
