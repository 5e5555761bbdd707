package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed exact order statistics (SURVEY.md §2.10 scale note).
  *
  * `withGlobalRank` materializes each row's exact 1-based global rank
  * under a total order WITHOUT a single-partition sort: range-partition
  * on the sort key (each reducer owns a contiguous key range), sort
  * within partitions, then `zipWithIndex` — whose per-partition count
  * pass and final pass read the same materialized shuffle stage, so
  * every row gets start-offset-of-partition + local position. All
  * stages are parallel; nothing single-partition, nothing data-sized
  * on the driver (the counts array is ≤#partitions longs).
  *
  * `ntileFromRank` then reproduces SQL NTILE(k) bit-exactly as a pure
  * closed-form function of (rank, n): the first n%k buckets take
  * ceil(n/k) rows, the rest floor(n/k) — which is all NTILE is once
  * the sort order is total (unique keys). Together they replace the
  * "global ntile window" single-reducer scale-killer while still
  * hash-matching an unchanged NTILE oracle.
  */
object Ranks {

  /** Adds `rankCol` = exact global 1-based rank of each row under
    * `sortCols` (which must form a total order — include a unique
    * tie-break column). One range shuffle + per-partition sort, then
    * `zipWithIndex` assigns global offsets; no data-sized
    * single-partition stage anywhere.
    *
    * Why RDD zipWithIndex and not a __pid offsets self-join: the
    * offsets approach evaluates the range-shuffled branch TWICE (once
    * for the per-partition counts, once as the join's data side), and
    * the two evaluations may disagree on partition layout (AQE
    * coalescing + range-bound resampling are per-evaluation), silently
    * dropping rows on the inner __pid join — observed nondeterministic
    * row loss at sf1 (r6). zipWithIndex's count job and the final pass
    * both read the SAME materialized shuffle stage (DAGScheduler
    * reuses shuffle map output across jobs) with a deterministic
    * within-partition total-order sort, so offsets and data can never
    * diverge.
    *
    * Known, accepted cost: shuffle MAP output is reused across
    * zipWithIndex's two jobs but the reduce-side SORT is not, so each
    * partition sorts twice (~2.4 s wall of equi_depth_hist's 8 s at
    * sf10 — StageProbe r13). Materializing the sorted frame
    * (`localCheckpoint`) to dodge the re-sort was MEASURED WORSE:
    * it leaks ~2 GB of materialized rows per call (nothing can
    * unpersist them — the final pass is lazy, inside the caller's
    * job) and bench runs went 8.3 s → min 10.7 s with 30–36 s
    * spreads under the resulting memory pressure. The double sort is
    * the deterministic-layout price; it scales as one extra in-memory
    * sort pass, never as data motion (SCALE.md r13). */
  def withGlobalRank(df: DataFrame, rankCol: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(rankCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Exact integer division for non-negative long columns (numerator
    * below 2^52, so the double intermediate is exact). */
  private def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** SQL NTILE(k) as a closed form of (global rank, total rows):
    * the first n%k buckets hold floor(n/k)+1 rows, the remaining
    * buckets floor(n/k). Matches DuckDB/Spark NTILE bit-exactly when
    * the underlying order is total. Lazy when/otherwise keeps the
    * q=0 (n<k) case away from the divide in the second branch.
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = idiv(n, lit(k))
    val rem = n % lit(k)
    val big = rem * (q + lit(1)) // rows covered by the (q+1)-sized buckets
    when(rank <= big, idiv(rank + q, q + lit(1)))
      .otherwise(rem + idiv(rank - big + q - lit(1), q))
      .cast("int")
  }
}
