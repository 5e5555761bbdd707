package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Set operations (SURVEY.md §2.7): GA segment algebra — union /
  * intersection / subtraction of user segments, keyed by customer.
  * Spark plans distinct-union and intersect/except as hash aggregates
  * / semi-joins on the key: one shuffle each at any scale.
  */
object Sets extends OpModule {

  private def segRich(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer").filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"))

  private def segBuilding(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))

  private val richSql = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0"
  private val bldgSql = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"

  val setUnion = Op(
    "set_union",
    (s, d) => segRich(s, d).union(segBuilding(s, d)).distinct(),
    Some(s"$richSql UNION $bldgSql"))

  val setIntersect = Op(
    "set_intersect",
    (s, d) => segRich(s, d).intersect(segBuilding(s, d)),
    Some(s"$richSql INTERSECT $bldgSql"))

  val setExcept = Op(
    "set_except",
    (s, d) => segRich(s, d).except(segBuilding(s, d)),
    Some(s"$richSql EXCEPT $bldgSql"))

  /** Multiset (ALL) variants over nation keys, which repeat per
    * customer/supplier — duplicates carry multiplicity through
    * UNION/INTERSECT/EXCEPT ALL; aggregated to per-key counts so the
    * declared output is a deterministic set. */
  private val custNk = "SELECT c_nationkey AS nk FROM customer"
  private val suppNk = "SELECT s_nationkey AS nk FROM supplier"

  private def nkCust(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer").select(col("c_nationkey").as("nk"))
  private def nkSupp(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "supplier").select(col("s_nationkey").as("nk"))

  val setUnionAll = Op(
    "set_union_all",
    (s, d) => nkCust(s, d).unionAll(nkSupp(s, d))
      .groupBy(col("nk")).agg(count(lit(1)).as("n")),
    Some(s"""
      SELECT nk, COUNT(*) AS n
      FROM ($custNk UNION ALL $suppNk) GROUP BY nk"""))

  val setIntersectAll = Op(
    "set_intersect_all",
    (s, d) => nkCust(s, d).intersectAll(nkSupp(s, d))
      .groupBy(col("nk")).agg(count(lit(1)).as("n")),
    Some(s"""
      SELECT nk, COUNT(*) AS n
      FROM ($custNk INTERSECT ALL $suppNk) GROUP BY nk"""))

  val setExceptAll = Op(
    "set_except_all",
    (s, d) => nkCust(s, d).exceptAll(nkSupp(s, d))
      .groupBy(col("nk")).agg(count(lit(1)).as("n")),
    Some(s"""
      SELECT nk, COUNT(*) AS n
      FROM ($custNk EXCEPT ALL $suppNk) GROUP BY nk"""))

  override def ops: Seq[Op] = Seq(setUnion, setIntersect, setExcept,
    setUnionAll, setIntersectAll, setExceptAll)
}
