package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** Scans, projections, filters, top-k (SURVEY.md §2.1, §2.2, §2.6).
  *
  * These are the ops where 100 TB efficiency is decided at the scan:
  * projections must reach the parquet reader as ReadSchema (column
  * pruning) and predicates as PushedFilters (row-group pruning) — the
  * plan-shape tests assert both. Filters are written on raw columns
  * (no wrapping casts) so Catalyst can push them.
  */
object Scans extends OpModule {

  /** Column-subset projection (GA: choosing dimensions/metrics). */
  val scanProject = Op(
    "scan_project",
    (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
    Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem"))

  /** Compound predicate: AND/OR/IN/BETWEEN (GA `filters=` operators). */
  val filterPred = Op(
    "filter_pred",
    (s, d) =>
      Tables(s, d, "orders")
        .filter(
          (col("o_orderstatus") === "O" ||
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")) &&
            col("o_totalprice").between(1000.0, 50000.0))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice")),
    Some("""
      SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      FROM orders
      WHERE (o_orderstatus = 'O'
             OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
        AND o_totalprice BETWEEN 1000.0 AND 50000.0"""))

  /** Date-range scan (GA start-date/end-date): the predicate reaches
    * parquet row-group stats; on a date-partitioned 100 TB layout this
    * is partition pruning. */
  val scanPruned = Op(
    "scan_pruned",
    (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice")), 2).as("sum_price")),
    Some("""
      SELECT l_returnflag, COUNT(*) AS n_rows,
             ROUND(SUM(l_extendedprice), 2) AS sum_price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_returnflag"""))

  /** CASE WHEN bucketing (GA channel-grouping rules). */
  val caseExpr = Op(
    "case_expr",
    (s, d) =>
      Tables(s, d, "orders")
        .withColumn("tier",
          when(col("o_totalprice") < 50000.0, "low")
            .when(col("o_totalprice") < 150000.0, "mid")
            .otherwise("high"))
        .groupBy(col("tier"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total")),
    Some("""
      SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
                  WHEN o_totalprice < 150000.0 THEN 'mid'
                  ELSE 'high' END AS tier,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS total
      FROM orders GROUP BY 1"""))

  /** Global top-k (GA sort + max-results): plans as
    * TakeOrderedAndProject — per-partition heap + driver merge, never
    * a full sort, which is exactly what survives 100 TB. */
  val topk = Op(
    "topk",
    (s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100"""))

  override def ops: Seq[Op] =
    Seq(scanProject, filterPred, scanPruned, caseExpr, topk)
}
