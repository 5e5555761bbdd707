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

  /** Z-order layout audit — the Delta/Iceberg OPTIMIZE ZORDER move,
    * as pure integer arithmetic: interleave the low 8 bits of
    * (l_partkey, l_suppkey) into a 16-bit Morton key, assign each row
    * to one of 16 equal-width zkey buckets (arithmetic on the scalar
    * max — NO global sort/ntile), and report each bucket's span in
    * both source dimensions. The per-bucket min/max ranges are the
    * file-skipping stats a 100 TB table would get from writing files
    * in zkey bucket order: both dimensions stay range-clustered, so
    * point filters on either column prune ~15/16 of the layout. */
  val zorderBucket = Op(
    "zorder_bucket",
    (s, d) => {
      // Morton spread: bit i of c lands at even position 2i (the
      // textbook interleave, written as shifts so both engines fold
      // it to the same integer arithmetic)
      val spread8 = (c: String) =>
        (0 until 8).map(i =>
          s"(((($c) >> $i) & 1) << ${2 * i})").mkString(" + ")
      val z = Tables(s, d, "lineitem")
        .withColumn("px", col("l_partkey") % 256)
        .withColumn("sx", col("l_suppkey") % 256)
        .withColumn("zkey",
          expr(spread8("px")) + expr(spread8("sx")) * 2)
      val zmax = z.agg(max(col("zkey")).as("zmax"))
      z.crossJoin(broadcast(zmax))
        .withColumn("bucket",
          least(floor(col("zkey") * 16 / (col("zmax") + 1)), lit(15L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("px")).as("p_min"), max(col("px")).as("p_max"),
          min(col("sx")).as("s_min"), max(col("sx")).as("s_max"))
    },
    Some("""
      WITH z AS (
        SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx,
               ( ((l_partkey % 256 >> 0) & 1) * 1
               + ((l_partkey % 256 >> 1) & 1) * 4
               + ((l_partkey % 256 >> 2) & 1) * 16
               + ((l_partkey % 256 >> 3) & 1) * 64
               + ((l_partkey % 256 >> 4) & 1) * 256
               + ((l_partkey % 256 >> 5) & 1) * 1024
               + ((l_partkey % 256 >> 6) & 1) * 4096
               + ((l_partkey % 256 >> 7) & 1) * 16384
               + (((l_suppkey % 256 >> 0) & 1) * 1
               +  ((l_suppkey % 256 >> 1) & 1) * 4
               +  ((l_suppkey % 256 >> 2) & 1) * 16
               +  ((l_suppkey % 256 >> 3) & 1) * 64
               +  ((l_suppkey % 256 >> 4) & 1) * 256
               +  ((l_suppkey % 256 >> 5) & 1) * 1024
               +  ((l_suppkey % 256 >> 6) & 1) * 4096
               +  ((l_suppkey % 256 >> 7) & 1) * 16384) * 2) AS zkey
        FROM lineitem),
      zm AS (SELECT MAX(zkey) AS zmax FROM z)
      SELECT LEAST(CAST(FLOOR(zkey * 16 / (zmax + 1)) AS BIGINT), 15)
               AS bucket,
             COUNT(*) AS n_rows,
             MIN(px) AS p_min, MAX(px) AS p_max,
             MIN(sx) AS s_min, MAX(sx) AS s_max
      FROM z, zm
      GROUP BY 1"""))

  /** Diversified top-k: global top 20 orders by price with at most 2
    * per customer — the "top results without one key dominating"
    * variant every report surface needs. Per-key rank (one window
    * shuffle, TopKPerKey-rewritable) → global TakeOrderedAndProject;
    * no global sort at any scale. */
  val topkDiverse = Op(
    "topk_diverse",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("rn"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, rn FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders)
      WHERE rn <= 2
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20"""))

  /** Column profiling (the ANALYZE TABLE / data-quality pass): one
    * row per profiled column with row/null/distinct counts, via a
    * stack unpivot so the table scans ONCE for all columns. Values
    * are stringified only as distinct-count keys (injective per
    * engine, never emitted), so numeric formatting differences can't
    * leak into the output. */
  val dataProfile = Op(
    "data_profile",
    (s, d) =>
      Tables(s, d, "orders")
        .select(expr("""stack(4,
            'o_orderstatus',   o_orderstatus,
            'o_orderpriority', o_orderpriority,
            'o_custkey',       CAST(o_custkey AS STRING),
            'o_totalprice',    CAST(o_totalprice AS STRING))
          AS (col_name, val)"""))
        .groupBy(col("col_name"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("val").isNull, 1L).otherwise(0L)).cast("long")
            .as("n_null"),
          countDistinct(col("val")).as("n_distinct")),
    Some("""
      WITH u AS (
        SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders)
      SELECT col_name, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             COUNT(DISTINCT val) AS n_distinct
      FROM u GROUP BY col_name"""))

  override def ops: Seq[Op] =
    Seq(scanProject, filterPred, scanPruned, caseExpr, topk, zorderBucket,
      topkDiverse, dataProfile)
}
