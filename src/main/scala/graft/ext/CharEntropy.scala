package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Shannon character entropy of a string, in nats
  * (`char_entropy(text)` → double): −Σ (c/L)·ln(c/L) over the
  * per-code-point counts, L = code-point length. The row-local
  * replacement for `entropy_filter`'s position explode: the HOF-free
  * original generated ONE ROW PER CHARACTER (sequence(1, n_chars) +
  * substring(text, i, 1)) and shuffled (doc, char) pairs — ~100×
  * row amplification carrying the text through the Generate, 192 s
  * of sf10 task time (StageProbe r13). Here the counts live in a
  * per-row map and nothing explodes or shuffles at all.
  *
  * Determinism: the partial terms are summed in ASCENDING code-point
  * order — a fixed order, unlike the groupBy plan it replaces (whose
  * sum order was shuffle-arrival); both land on the oracle's value
  * at the op's 4 dp output rounding. Empty input returns 0.0 (the
  * declared op filters n_chars > 0 anyway). */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var len = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      len += 1
    }
    if (len == 0L) return 0.0
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / len
      acc += p * math.log(p)
    }
    -acc
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}
