package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over float OR double arrays in any
  * combination — the mixed-type sibling of [[DotProductFloat]] for
  * the trained-index kernels, where a float corpus vector scores
  * against a Lloyd-refined DOUBLE centroid/codebook cell. Replaces
  * the `aggregate(zip_with(cast(a as array<double>), b, (x,y) -> x*y),
  * 0D, +)` tree with one fused loop and NO per-element lambda
  * dispatch; bit-identical results (each float element widens to
  * double exactly, products accumulate left-to-right — the same
  * fold the lambda tree performs), so swapping it in cannot move a
  * 4dp-rounded score. Null/length semantics mirror the lambda tree:
  * mismatched lengths or any null element yield NULL. Registered as
  * `dot_fd` via [[GraftFunctions.register]].
  *
  * Measured motivation (SCALE.md round 12): the multi-round Lloyd
  * kernels score N·k pairs per round through this dot; the lambda
  * form spends its time in HigherOrderFunction dispatch and an
  * intermediate product array, which tripled `*_trained` sf10 times
  * when training went from 1 round to 3.
  */
case class DotProductMixed(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOf(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left.dataType), elemOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_fd expects array<float|double> on both sides, got " +
          s"(${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "dot_fd"

  private lazy val leftFloat = elemOf(left.dataType).contains(FloatType)
  private lazy val rightFloat = elemOf(right.dataType).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA =
        if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB =
        if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getA * $getB;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductMixed =
    copy(left = newLeft, right = newRight)
}
