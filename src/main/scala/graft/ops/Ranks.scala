package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed exact order statistics (SURVEY.md §2.10 scale note).
  *
  * `withGlobalRank` materializes each row's exact 1-based global rank
  * under a total order WITHOUT a single-partition sort: range-partition
  * on the sort key (each reducer owns a contiguous key range), rank
  * locally with a per-partition window, then add the cumulative row
  * counts of all preceding partitions — a ≤#shuffle-partitions-row
  * offsets table broadcast back onto the data. The only global window
  * in the resulting plan runs over that offsets table, whose row count
  * is bounded by cluster configuration (32 here, ~thousands on a real
  * cluster), never by data volume.
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
    * tie-break column). One range shuffle + one per-partition window;
    * no data-sized single-partition stage anywhere in the plan.
    */
  def withGlobalRank(df: DataFrame, rankCol: String,
      sortCols: Column*): DataFrame = {
    val parted = df
      .repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val lw = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val local = parted
      .withColumn("__lrank", row_number().over(lw).cast("long"))
    // Cumulative start offset of each range partition. The global
    // window here is over ≤#shuffle-partitions rows — config-bounded,
    // not data-bounded (whitelisted in PlanShapeSpec's global-window
    // sweep for exactly that reason).
    val ow = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(ow), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__off") + col("__lrank"))
      .drop("__pid", "__lrank", "__off")
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
