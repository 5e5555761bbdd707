package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Recognizes the idiomatic window top-k pattern
  *
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(keys)
  *       .orderBy(ord))).filter($"rn" <= k) }}}
  *
  * and replaces it with the [[TopKPerKey]] logical node (planned by
  * [[TopKPerKeyStrategy]] into the bounded-heap exec). Fires only when
  * the window computes EXACTLY one expression (the row_number) — extra
  * window functions (rank, lag, ...) need the real sorted window.
  * Users keep writing idiomatic Spark; the optimizer swaps in the
  * operator, the same way AQE swaps join strategies.
  *
  * MEMORY: the heap exec holds k rows per distinct key in executor
  * memory up to `spark.graft.topkRewrite.maxKeysPerPartition` keys;
  * beyond that, heaps spill to local disk as key-sorted runs and are
  * merged at emission (see [[TopKPerKeyExec]]), so a very high
  * cardinality key degrades to external merge instead of OOM. The
  * rewrite beats the window sort whenever rows-per-key >> k (the
  * top-N-per-entity shape this targets); to force the stock plan use
  * `spark.graft.topkRewrite.enabled=false` (per query via
  * `spark.conf.set`, it is read at optimization time).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.topkRewrite.enabled"

  /** rn <= k / rn < k / k >= rn / k > rn → max rank to keep.
    * Bounds-checked: out-of-Int-range longs and the Int.MinValue - 1
    * decrement must not wrap (a wrapped k would turn an always-false
    * filter into keep-everything); non-positive k falls through to
    * the stock plan via the caller's k > 0 guard. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType)
          if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
    def litMinusOne(e: Expression): Option[Int] =
      lit(e).flatMap(v => if (v == Int.MinValue) None else Some(v - 1))
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => litMinusOne(l)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => litMinusOne(l)
      case _ => None
    }
  }

  private object RowNumberWindow {
    /** Window(Seq(rn <- row_number() over (partition, order)), child) */
    def unapply(p: LogicalPlan): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      p match {
        case Window(Seq(a @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
            partitionSpec2, orderSpec2, child, _)
            if partitionSpec == partitionSpec2 && orderSpec == orderSpec2 &&
              orderSpec.nonEmpty && partitionSpec.nonEmpty =>
          // partitionSpec.nonEmpty: a GLOBAL row_number top-k has no
          // clustering keys — ClusteredDistribution(Nil) is rejected at
          // planning, and Spark's TakeOrderedAndProject already handles
          // that shape; leave it to the stock planner
          // Spark's InferWindowGroupLimit may already have inserted its
          // own group-limit below the window; strip it — TopKPerKeyExec
          // subsumes it and, unlike it, needs no sorted input
          val realChild = child match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          Some((a.toAttribute, partitionSpec, orderSpec, realChild))
        case _ => None
      }
  }

  /** Lenient kill-switch parse: only an explicit "false"/"FALSE"
    * disables the rewrite. `String.toBoolean` would throw
    * IllegalArgumentException for values like "1" or "off", failing
    * the whole query at optimization time with an error that never
    * names the offending key. */
  private def enabled: Boolean = {
    val raw = conf.getConfString(EnabledKey, "true")
    if (raw.equalsIgnoreCase("true")) true
    else if (raw.equalsIgnoreCase("false")) false
    else {
      logWarning(s"$EnabledKey='$raw' is not a boolean; keeping the " +
        "rewrite enabled (set it to 'false' to disable)")
      true
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, RowNumberWindow(rn, keys, order, child)) =>
      limitOf(cond, rn) match {
        case Some(k) if k > 0 => TopKPerKey(keys, order, k, rn, child)
        case _ => f
      }
    // same with a no-op/pruning Project between Filter and Window
    case f @ Filter(cond, p @ Project(projectList, RowNumberWindow(rn, keys, order, child)))
        if projectList.forall(_.isInstanceOf[Attribute]) &&
          projectList.exists(_.semanticEquals(rn)) =>
      limitOf(cond, rn) match {
        case Some(k) if k > 0 =>
          Project(projectList, TopKPerKey(keys, order, k, rn, child))
        case _ => f
      }
  }
}

/** Plans [[TopKPerKey]] into [[TopKPerKeyExec]]. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}
