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

  test("AQE native skew-split fires on a skewed SMJ (OptimizeSkewedJoin)") {
    // The first thing a 100 TB operator reaches for BEFORE hand-salting:
    // Spark's own OptimizeSkewedJoin splits an oversized shuffle
    // partition into parallel sub-reads at runtime. Demonstrate it
    // firing on the classic shape — a fact table whose join key is 90%
    // one hot value — with thresholds scaled down to test-sized data
    // (at the defaults the same logic trips at 256 MB per partition).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // partition is "skewed" if > factor(5) * median AND > threshold;
      // split target = advisory size
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force SMJ: the dim side must not broadcast or there is no
      // shuffle to split
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val fact = spark.range(0, 2000000L)
        .select(
          when(col("id") % 10 === 0, pmod(col("id"), lit(1000)))
            .otherwise(lit(0L)).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 1000L)
        .select(col("id").as("k"), (col("id") * 7).as("attr"))
      // consumer must be partition-agnostic (global partial agg):
      // OptimizeSkewedJoin refuses to split when a downstream operator
      // still REQUIRES the join's hash partitioning (e.g. groupBy on
      // the join key) — splitting would break that guarantee. That
      // boundary is exactly when manual salting stays necessary.
      val agg = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("attr")).as("s"))

      // run it — AQE finalizes the physical plan only on execution
      val row = agg.collect().head
      val plan = agg.queryExecution.executedPlan.toString

      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire; plan:\n${plan.take(2000)}")
      // and the split join is still exactly correct: every fact row
      // matches one dim row; attr = 7k summed over the 200k rows with
      // id%10==0 (k = id%1000, each residue ×2000) = 7·49500·2000
      assert(row.getLong(0) == 2000000L, s"row count ${row.getLong(0)}")
      assert(row.getLong(1) == 693000000L, s"attr sum ${row.getLong(1)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("salt is deterministic: same input twice -> same salted assignment") {
    val s1 = skewed.withColumn("salt", pmod(hash(col("v")), lit(16)))
      .collect().map(r => (r.getDouble(1), r.getInt(2))).toMap
    val s2 = skewed.withColumn("salt", pmod(hash(col("v")), lit(16)))
      .collect().map(r => (r.getDouble(1), r.getInt(2))).toMap
    assert(s1 == s2)
  }
}
