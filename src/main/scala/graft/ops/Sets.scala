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

  override def ops: Seq[Op] = Seq(setUnion, setIntersect, setExcept)
}
