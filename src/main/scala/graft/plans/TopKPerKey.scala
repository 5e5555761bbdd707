package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

import scala.collection.mutable

/** Whole-operator extension (SURVEY.md §4 / prompt path (c)): per-key
  * top-k as a first-class plan node.
  *
  * The idiomatic formulation — `row_number().over(partitionBy(key)
  * .orderBy(ord)) <= k` — sorts EVERY key's full row set before
  * discarding all but k rows. This operator keeps one bounded k-row
  * heap per key instead: O(n log k) per partition with k·keys rows of
  * state, no full sort, no sort spill. At 100 TB per-key row counts
  * dwarf k and the sort is the dominant cost of the window plan; the
  * heap never materializes it.
  *
  * `rankAttr` carries the emitted 1-based rank (same semantics as the
  * row_number column it replaces, given a total order).
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan)
    extends UnaryNode {

  require(k > 0, s"k must be positive, got $k")

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical per-key bounded-heap top-k. Requires clustering on the
  * keys (the planner inserts the hash exchange exactly as it would
  * for the window); inside each partition a max-heap per key holds
  * the current best k rows, and output is emitted per key in sort
  * order with the 1-based rank appended. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val childOutput = child.output
    val rankIsLong = rankAttr.dataType == LongType
    // hoist the output attributes so the task closure captures only
    // locals — referencing the `output` method inside mapPartitions
    // would capture `this` (the whole plan subtree) per task
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val ordering = RowOrdering.create(orderLocal, childOutput)
      val keyProj = GenerateUnsafeProjection.generate(keysLocal, childOutput)
      // max-heap per key: head = worst of the current best k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, null) match {
          case null =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
          case h => h
        }
        if (heap.size < kLocal) {
          heap += row.copy().asInstanceOf[UnsafeRow]
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy().asInstanceOf[UnsafeRow]
        }
      }
      // downstream operators require UnsafeRow; convert on emit
      val outProj = GenerateUnsafeProjection.generate(
        outAttrs.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      heaps.valuesIterator.flatMap { heap =>
        val rows = heap.dequeueAll.reverse // ascending sort order
        rows.iterator.zipWithIndex.map { case (r, i) =>
          val joined = new GenericInternalRow(childOutput.length + 1)
          var j = 0
          while (j < childOutput.length) {
            joined.update(j, r.get(j, childOutput(j).dataType))
            j += 1
          }
          joined.update(childOutput.length,
            if (rankIsLong) (i + 1).toLong else (i + 1))
          outProj(joined).asInstanceOf[InternalRow]
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
