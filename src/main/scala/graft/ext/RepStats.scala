package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Repetition counts of a token array in ONE linear pass
  * (`rep_stats(array<string>)` → struct<n_tokens, n_distinct, n_bg,
  * n_bg_distinct, top1 int>) — the native kernel behind `rep_ratio`.
  * The HOF formulation it replaces was QUADRATIC per doc in
  * interpreted lambdas: `transform(array_distinct(toks),
  * w -> size(filter(toks, x -> x = w)))` re-scans the token array
  * once per distinct token just to find the max frequency. Here one
  * hash-map pass yields the same counts; the ratio arithmetic
  * (round(1 − distinct/n, 6) …) stays in the SQL surface so the
  * oracle comparison is form-identical.
  *
  * Bigram distinctness matches the HOF's `array_distinct` over
  * `concat_ws(' ', t[i], t[i+1])` EXACTLY — including the
  * concat-collision semantics (("a b","c") equals ("a","b c")):
  * the set key is the joined string, as before. */
case class RepStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rep_stats expects array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_bg", IntegerType, nullable = false),
    StructField("n_bg_distinct", IntegerType, nullable = false),
    StructField("top1", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new java.util.HashMap[String, Int](n * 2)
    val words = new Array[String](n)
    var i = 0
    var top1 = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val w = toks.getUTF8String(i).toString
      words(i) = w
      val c = counts.merge(w, 1, (a, b) => a + b)
      if (c > top1) top1 = c
      i += 1
    }
    val nBg = math.max(0, n - 1)
    val bgSeen = new java.util.HashSet[String](nBg * 2)
    i = 0
    while (i < nBg) {
      bgSeen.add(words(i) + " " + words(i + 1))
      i += 1
    }
    new GenericInternalRow(
      Array[Any](n, counts.size, nBg, bgSeen.size, top1))
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepStats = copy(child = newChild)
}
