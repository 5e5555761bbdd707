package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan techniques that only pay off at cluster scale, proven on the
  * local fixtures (SURVEY.md §7 "100 TB design notes"): bucketed
  * tables joining WITHOUT a shuffle exchange, and dynamic partition
  * pruning of a date-partitioned fact from a filtered dimension.
  */
class ScaleSpec extends AnyFunSuite {
  import SparkFixture._

  test("bucketed tables join with zero shuffle exchanges") {
    // default warehouse dir (./spark-warehouse); tables dropped below
    Tables(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    // tiny fixtures auto-broadcast, which would bypass the bucketed
    // sort-merge path entirely; force the join shape a 100 TB
    // fact-fact join takes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("s"))
      val rows = joined.collect()
      assert(rows.length == 5)
      val plan = joined.queryExecution.executedPlan.toString
      val finalPlan = plan.linesIterator
        .takeWhile(!_.contains("== Initial Plan ==")).mkString("\n")
      // co-located bucketed join: the JOIN itself needs no exchange;
      // only the final aggregation shuffles
      val joinSection = finalPlan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin") && !l.contains("ShuffledHashJoin"))
        .mkString("\n")
      assert(joinSection.nonEmpty, s"expected a bucketed join:\n$finalPlan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$joinSection")
      // correctness: equals the unbucketed formulation
      val unbucketed = Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice")), 2).as("s"))
        .collect().map(_.toString).sorted
      assert(rows.map(_.toString).sorted.sameElements(unbucketed))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("dynamic partition pruning fires on a partitioned fact table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables(spark, sfDir, "orders")
      .withColumn("year", year(col("o_orderdate")))
      .write.partitionBy("year").mode("overwrite")
      .parquet(s"$dir/orders_part")
    val fact = spark.read.parquet(s"$dir/orders_part")
    // dimension: a tiny year-dim filtered to one year; the fact's
    // partition filter is only known at runtime through the join
    import spark.implicits._
    // dim must be a file-backed relation: a LocalRelation filter is
    // constant-folded away before the PartitionPruning rule sees it
    Seq((1995, "old"), (1996, "mid"), (2000, "new"))
      .toDF("year", "tag").write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val joined = fact.join(dim, Seq("year"))
      .filter(col("tag") === "mid")
      .groupBy(col("year")).agg(count(lit(1)).as("n"))
    // the tiny fixture fails DPP's stats-based benefit heuristic;
    // force the decision the way a real 100 TB fact table would win it
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10000")
    // broadcast-reuse-only DPP needs the broadcast to exist before the
    // scan plans; with tiny inputs force the subquery-broadcast path
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    val rows = try joined.collect() finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "true")
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "0.5")
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "true")
    }
    assert(rows.length == 1 && rows.head.getInt(0) == 1996)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") ||
      plan.contains("DynamicPruning") ||
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("dynamicpruning")),
      s"DPP expression missing from scan:\n${plan.take(1200)}")
  }
}
