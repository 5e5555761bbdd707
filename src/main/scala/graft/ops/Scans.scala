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

  /** One referential-integrity relationship for `fk_orphans`:
    * child rows are counted once into a skinny (key, cnt) rollup
    * before ANY join — every subsequent stage shuffles key sets, not
    * fact rows. Orphans = keyed child rollup anti parent keys;
    * childless = parent keys anti child keys; the final crossJoins
    * glue three 1-row aggregates (bounded at any SF, plan-guard
    * whitelisted). */
  private def fkRel(name: String, child: org.apache.spark.sql.DataFrame,
      ck: String, parent: org.apache.spark.sql.DataFrame,
      pk: String): org.apache.spark.sql.DataFrame = {
    val keyed = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("cnt"))
    val pkeys = parent.select(col(pk).as("p")).distinct()
    val joined = keyed.join(pkeys, col("k") === col("p"), "left")
    val childStats = joined.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("child_rows"),
      count(lit(1)).as("child_keys"),
      coalesce(sum(when(col("p").isNull, col("cnt")).otherwise(0L)), lit(0L))
        .as("orphan_rows"),
      count(when(col("p").isNull, 1)).as("orphan_keys"))
    val parentCount = pkeys.agg(count(lit(1)).as("parent_keys"))
    val childless = pkeys.join(keyed, col("p") === col("k"), "left_anti")
      .agg(count(lit(1)).as("childless_parents"))
    childStats.crossJoin(parentCount).crossJoin(childless)
      .select(lit(name).as("relationship"), col("child_rows"),
        col("child_keys"), col("parent_keys"), col("orphan_rows"),
        col("orphan_keys"), col("childless_parents"))
  }

  /** Warehouse referential-integrity audit (the data-quality pass a
    * 100 TB lake runs nightly): for every declared FK relationship,
    * total/distinct child keys, parent keys, orphan child rows/keys
    * (child references with no parent) and childless parents. All
    * counts are exact integers; an intact warehouse reports zero
    * orphans — the value is the guarantee, same as `table_diff`.
    *
    * Scale: per relationship, one map-side-combined groupBy on the
    * child key collapses fact rows to distinct keys BEFORE the joins,
    * so the anti-joins shuffle |keys|, never |rows|; the 5 audits are
    * independent and pipeline in parallel. */
  val fkOrphans = Op(
    "fk_orphans",
    (s, d) => {
      val li = Tables(s, d, "lineitem")
      val orders = Tables(s, d, "orders")
      val customer = Tables(s, d, "customer")
      fkRel("events.user_id->customer.c_custkey",
          Tables(s, d, "events"), "user_id", customer, "c_custkey")
        .union(fkRel("lineitem.l_orderkey->orders.o_orderkey",
          li, "l_orderkey", orders, "o_orderkey"))
        .union(fkRel("lineitem.l_partkey->part.p_partkey",
          li, "l_partkey", Tables(s, d, "part"), "p_partkey"))
        .union(fkRel("lineitem.l_suppkey->supplier.s_suppkey",
          li, "l_suppkey", Tables(s, d, "supplier"), "s_suppkey"))
        .union(fkRel("orders.o_custkey->customer.c_custkey",
          orders, "o_custkey", customer, "c_custkey"))
    },
    Some("""
      WITH r1c AS (SELECT user_id AS k FROM events),
      r1p AS (SELECT DISTINCT c_custkey AS p FROM customer),
      r2c AS (SELECT l_orderkey AS k FROM lineitem),
      r2p AS (SELECT DISTINCT o_orderkey AS p FROM orders),
      r3c AS (SELECT l_partkey AS k FROM lineitem),
      r3p AS (SELECT DISTINCT p_partkey AS p FROM part),
      r4c AS (SELECT l_suppkey AS k FROM lineitem),
      r4p AS (SELECT DISTINCT s_suppkey AS p FROM supplier),
      r5c AS (SELECT o_custkey AS k FROM orders),
      r5p AS (SELECT DISTINCT c_custkey AS p FROM customer)
      SELECT 'events.user_id->customer.c_custkey' AS relationship,
             (SELECT COUNT(*) FROM r1c) AS child_rows,
             (SELECT COUNT(DISTINCT k) FROM r1c) AS child_keys,
             (SELECT COUNT(*) FROM r1p) AS parent_keys,
             (SELECT COUNT(*) FROM r1c LEFT JOIN r1p ON k = p
              WHERE p IS NULL) AS orphan_rows,
             (SELECT COUNT(DISTINCT k) FROM r1c LEFT JOIN r1p ON k = p
              WHERE p IS NULL) AS orphan_keys,
             (SELECT COUNT(*) FROM r1p LEFT JOIN
                (SELECT DISTINCT k FROM r1c) ck ON ck.k = p
              WHERE ck.k IS NULL) AS childless_parents
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders.o_orderkey',
             (SELECT COUNT(*) FROM r2c),
             (SELECT COUNT(DISTINCT k) FROM r2c),
             (SELECT COUNT(*) FROM r2p),
             (SELECT COUNT(*) FROM r2c LEFT JOIN r2p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(DISTINCT k) FROM r2c LEFT JOIN r2p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(*) FROM r2p LEFT JOIN
                (SELECT DISTINCT k FROM r2c) ck ON ck.k = p
              WHERE ck.k IS NULL)
      UNION ALL
      SELECT 'lineitem.l_partkey->part.p_partkey',
             (SELECT COUNT(*) FROM r3c),
             (SELECT COUNT(DISTINCT k) FROM r3c),
             (SELECT COUNT(*) FROM r3p),
             (SELECT COUNT(*) FROM r3c LEFT JOIN r3p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(DISTINCT k) FROM r3c LEFT JOIN r3p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(*) FROM r3p LEFT JOIN
                (SELECT DISTINCT k FROM r3c) ck ON ck.k = p
              WHERE ck.k IS NULL)
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
             (SELECT COUNT(*) FROM r4c),
             (SELECT COUNT(DISTINCT k) FROM r4c),
             (SELECT COUNT(*) FROM r4p),
             (SELECT COUNT(*) FROM r4c LEFT JOIN r4p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(DISTINCT k) FROM r4c LEFT JOIN r4p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(*) FROM r4p LEFT JOIN
                (SELECT DISTINCT k FROM r4c) ck ON ck.k = p
              WHERE ck.k IS NULL)
      UNION ALL
      SELECT 'orders.o_custkey->customer.c_custkey',
             (SELECT COUNT(*) FROM r5c),
             (SELECT COUNT(DISTINCT k) FROM r5c),
             (SELECT COUNT(*) FROM r5p),
             (SELECT COUNT(*) FROM r5c LEFT JOIN r5p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(DISTINCT k) FROM r5c LEFT JOIN r5p ON k = p
              WHERE p IS NULL),
             (SELECT COUNT(*) FROM r5p LEFT JOIN
                (SELECT DISTINCT k FROM r5c) ck ON ck.k = p
              WHERE ck.k IS NULL)"""))

  override def ops: Seq[Op] =
    Seq(scanProject, filterPred, scanPruned, caseExpr, topk, zorderBucket,
      topkDiverse, dataProfile, fkOrphans)
}
