package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew utilities: salted two-phase aggregation and salted join must
  * equal their unsalted formulations exactly (deterministic salts),
  * including on a synthetically skewed key distribution.
  */
class SkewSpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  // 90% of rows share one hot key — the shape AQE skew stats flag
  private lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) i.toLong % 100 else 0L, i.toDouble)
  }.toDF("k", "v")

  test("saltedSumCount equals plain groupBy sum/count on skewed data") {
    val plain = skewed.groupBy(col("k"))
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    val salted = Skew.saltedSumCount(skewed, col("k"), col("v"),
        saltCol = col("v"), salts = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case ((k1, s1, n1), (k2, s2, n2)) =>
      assert(k1 == k2 && n1 == n2)
      assert(math.abs(s1 - s2) <= 1e-6 * math.abs(s1).max(1.0))
    }
  }

  test("saltedJoin equals plain join on lineitem x orders subset") {
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val od = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(od, li("l_orderkey") === od("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(li, od, "l_orderkey", "o_orderkey",
        saltOn = col("l_extendedprice"), salts = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(_.toString).sorted
    assert(plain.sameElements(salted))
  }

  test("salt is deterministic: same input twice -> same salted assignment") {
    val s1 = skewed.withColumn("salt", pmod(hash(col("v")), lit(16)))
      .collect().map(r => (r.getDouble(1), r.getInt(2))).toMap
    val s2 = skewed.withColumn("salt", pmod(hash(col("v")), lit(16)))
      .collect().map(r => (r.getDouble(1), r.getInt(2))).toMap
    assert(s1 == s2)
  }
}
