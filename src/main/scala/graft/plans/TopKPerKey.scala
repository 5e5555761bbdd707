package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import org.apache.spark.{SparkEnv, TaskContext}
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

object TopKPerKeyExec {
  /** Max distinct keys whose heaps are held in memory per partition.
    * Above the threshold the heap map is spilled to local disk as a
    * key-sorted run and merged at emission time, so per-partition
    * memory is bounded at O(maxKeys · k · rowSize) no matter the key
    * cardinality (a per-row-unique key degrades to external merge
    * instead of OOM, where stock Spark's window would sort-spill). */
  val MaxKeysKey = "spark.graft.topkRewrite.maxKeysPerPartition"
  val DefaultMaxKeys: Int = 4 * 1024 * 1024
}

/** Physical per-key bounded-heap top-k. Requires clustering on the
  * keys (the planner inserts the hash exchange exactly as it would
  * for the window); inside each partition a max-heap per key holds
  * the current best k rows, and output is emitted per key in sort
  * order with the 1-based rank appended. When the number of distinct
  * keys in a partition exceeds [[TopKPerKeyExec.MaxKeysKey]], heaps
  * spill to local disk as key-sorted runs (each key's candidates
  * already reduced to ≤ k rows) and are k-way merged on emission. */
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
    // spill threshold resolved on the driver at execution time
    val maxKeys = {
      val raw = conf.getConfString(TopKPerKeyExec.MaxKeysKey,
        TopKPerKeyExec.DefaultMaxKeys.toString)
      try math.max(1, raw.trim.toInt)
      catch { case _: NumberFormatException => TopKPerKeyExec.DefaultMaxKeys }
    }
    child.execute().mapPartitions({ iter =>
      val ordering = RowOrdering.create(orderLocal, childOutput)
      val heapOrd = ordering.asInstanceOf[Ordering[UnsafeRow]]
      val keyProj = GenerateUnsafeProjection.generate(keysLocal, childOutput)
      // max-heap per key: head = worst of the current best k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      val spills = mutable.ArrayBuffer.empty[File]
      val readerStreams = mutable.ArrayBuffer.empty[DataInputStream]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        // close any reader the output iterator abandoned (e.g. under a
        // limit) before deleting — delete-on-open-fd only works on
        // POSIX and the fds would otherwise linger until task end
        readerStreams.foreach(s => try s.close() catch { case _: Exception => () })
        spills.foreach(f => { f.delete(); () })
      })
      // spill where the cluster expects spills: the first configured
      // spark.local.dir (the scratch disks sized for shuffle/spill),
      // not java.io.tmpdir (often a small root or tmpfs partition)
      val spillDir: File = {
        val base = Option(SparkEnv.get)
          .map(_.conf.get("spark.local.dir",
            System.getProperty("java.io.tmpdir")))
          .getOrElse(System.getProperty("java.io.tmpdir"))
          .split(",")(0).trim
        new File(base)
      }

      // grouping order across runs: unsigned lexicographic key bytes.
      // Equal key VALUES have equal UnsafeRow bytes (same projection
      // schema — the property hash exchanges already rely on), so any
      // consistent total order groups them; semantic order not needed.
      def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val x = (a(i) & 0xff) - (b(i) & 0xff)
          if (x != 0) return x
          i += 1
        }
        a.length - b.length
      }

      // drain the heap map to a key-sorted run on local disk:
      // [keyLen, keyBytes, nRows, (rowLen, rowBytes)*] per key
      def spillHeaps(): Unit = {
        val f = File.createTempFile("graft-topk-spill-", ".bin", spillDir)
        spills += f
        val out = new DataOutputStream(new BufferedOutputStream(
          new FileOutputStream(f), 1 << 16))
        try {
          heaps.toArray.sortWith((x, y) =>
            compareBytes(x._1.getBytes, y._1.getBytes) < 0)
            .foreach { case (key, heap) =>
              val kb = key.getBytes
              out.writeInt(kb.length)
              out.write(kb)
              val rows = heap.dequeueAll.reverse // ascending sort order
              out.writeInt(rows.length)
              rows.foreach { r =>
                val b = r.getBytes
                out.writeInt(b.length)
                out.write(b)
              }
            }
        } finally out.close()
        heaps.clear()
      }

      def spillReader(f: File, numFields: Int): Iterator[(Array[Byte], Array[UnsafeRow])] =
        new Iterator[(Array[Byte], Array[UnsafeRow])] {
          private val in = new DataInputStream(new BufferedInputStream(
            new FileInputStream(f), 1 << 16))
          readerStreams += in
          private var nextKeyLen = readLen()
          private def readLen(): Int =
            try in.readInt()
            catch { case _: EOFException => in.close(); -1 }
          override def hasNext: Boolean = nextKeyLen >= 0
          override def next(): (Array[Byte], Array[UnsafeRow]) = {
            val kb = new Array[Byte](nextKeyLen)
            in.readFully(kb)
            val n = in.readInt()
            val rows = Array.tabulate(n) { _ =>
              val len = in.readInt()
              val b = new Array[Byte](len)
              in.readFully(b)
              val r = new UnsafeRow(numFields)
              r.pointTo(b, len)
              r
            }
            nextKeyLen = readLen()
            (kb, rows)
          }
        }

      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          if (heaps.size >= maxKeys) spillHeaps()
          heap = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
          heaps.put(key.copy(), heap)
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
      def emitGroup(rows: Seq[UnsafeRow]): Iterator[InternalRow] =
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

      if (spills.isEmpty) {
        heaps.valuesIterator.flatMap(h => emitGroup(h.dequeueAll.reverse))
      } else {
        // spill the in-memory remainder so every source is a key-sorted
        // file run, then merge candidates per key (≤ k per run) through
        // a fresh bounded heap — memory O(runs · k) per emitted key
        spillHeaps()
        val numFields = childOutput.length
        val runs = spills.toIndexedSeq.map(f => spillReader(f, numFields).buffered)
        new Iterator[Seq[UnsafeRow]] {
          override def hasNext: Boolean = runs.exists(_.hasNext)
          override def next(): Seq[UnsafeRow] = {
            var minKey: Array[Byte] = null
            runs.foreach { r =>
              if (r.hasNext &&
                (minKey == null || compareBytes(r.head._1, minKey) < 0))
                minKey = r.head._1
            }
            val heap = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            runs.foreach { r =>
              while (r.hasNext && compareBytes(r.head._1, minKey) == 0) {
                r.next()._2.foreach { row =>
                  if (heap.size < kLocal) heap += row
                  else if (ordering.compare(row, heap.head) < 0) {
                    heap.dequeue()
                    heap += row
                  }
                }
              }
            }
            heap.dequeueAll.reverse
          }
        }.flatMap(emitGroup)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
