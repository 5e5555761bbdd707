package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY.md §4 M7): rewrites the hand-written
  * float-array dot-product expression tree
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               0.0D, (acc, v) -> acc + v) }}}
  *
  * into the fused native [[DotProductFloat]] — no per-element lambda
  * dispatch and no intermediate product array. The rewrite is
  * semantics-preserving in ALL cases (dot_f reproduces the lambda
  * tree's null/length behavior bit-for-bit, see DotProductFloat), so
  * it fires unconditionally on a match. Users who write the natural
  * lambda formulation get the native kernel for free — injected via
  * `spark.sql.extensions=graft.ext.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x * y (in either order) over double-casts of the two lambda vars. */
  private def isPairwiseProduct(f: Expression,
      vars: Seq[NamedExpression]): Boolean = f match {
    case m: Multiply =>
      def base(e: Expression): Option[Long] = e match {
        case c: Cast if c.dataType == DoubleType => base(c.child)
        case v: NamedLambdaVariable => Some(v.exprId.id)
        case _ => None
      }
      val ids = vars.collect { case v: NamedLambdaVariable => v.exprId.id }
      (base(m.left), base(m.right)) match {
        case (Some(a), Some(b)) => ids.toSet == Set(a, b)
        case _ => false
      }
    case _ => false
  }

  /** acc + v over exactly the two merge-lambda vars. */
  private def isPairwiseSum(f: Expression,
      vars: Seq[NamedExpression]): Boolean = f match {
    case a: Add =>
      val ids = vars.collect { case v: NamedLambdaVariable => v.exprId.id }
      (a.left, a.right) match {
        case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
          ids.toSet == Set(x.exprId.id, y.exprId.id)
        case _ => false
      }
    case _ => false
  }

  /** Exact +0.0 only: a -0.0 seed yields -0.0 on empty arrays under
    * the lambda tree but +0.0 from dot_f, so rewriting it would not
    * be bit-preserving (cooperative == cannot tell them apart). */
  private def isZero(e: Expression): Boolean = e match {
    case Literal(d: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(d) == 0L
    case c: Cast if c.dataType == DoubleType => isZero(c.child)
    case Literal(v: Int, _) => v == 0
    case Literal(v: Long, _) => v == 0L
    case _ => false
  }

  /** finish lambda is the identity on its single variable. */
  private def isIdentity(l: LambdaFunction): Boolean =
    (l.function, l.arguments) match {
      case (f: NamedLambdaVariable, Seq(a: NamedLambdaVariable)) =>
        f.exprId == a.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right, zf: LambdaFunction),
            zero,
            mf: LambdaFunction,
            finish: LambdaFunction)
          if isFloatArray(left) && isFloatArray(right) &&
            isPairwiseProduct(zf.function, zf.arguments) &&
            isZero(zero) &&
            isPairwiseSum(mf.function, mf.arguments) &&
            isIdentity(finish) =>
        DotProductFloat(left, right)
    }
}
