package graft

import graft.plans.{TopKPerKeyStrategy, WindowTopKRewrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom whole-operator tests: the window-top-k rewrite swaps the
  * row_number/filter idiom for the bounded-heap TopKPerKeyExec, with
  * results identical to the stock window plan, and leaves non-matching
  * window shapes alone.
  */
class TopKPlanSpec extends AnyFunSuite {
  import SparkFixture._

  private def withTopK[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ WindowTopKRewrite
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    try f
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == WindowTopKRewrite)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  private def top3PerCustomer: DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  test("rewrite plans the idiom as TopKPerKeyExec") {
    withTopK {
      val df = top3PerCustomer
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan.take(800))
      assert(!plan.contains("Window"), plan.take(800))
    }
  }

  test("results identical to the stock window plan, including ranks") {
    val stock = top3PerCustomer.collect().map(_.toString).sorted
    val custom = withTopK(top3PerCustomer.collect()).map(_.toString).sorted
    assert(custom.sameElements(stock))
    assert(stock.nonEmpty)
  }

  test("strict < and reversed comparisons are recognized") {
    withTopK {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val lt = Tables(spark, sfDir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") < 4)
      lt.collect()
      assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val rev = Tables(spark, sfDir, "orders")
        .withColumn("rn", row_number().over(w)).filter(lit(3) >= col("rn"))
      rev.collect()
      assert(rev.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(lt.count() == top3PerCustomer.count())
    }
  }

  test("multi-function windows are NOT rewritten (need the real sort)") {
    withTopK {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables(spark, sfDir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .filter(col("rn") <= 3)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window"), plan.take(800))
      assert(!plan.contains("TopKPerKey"), plan.take(800))
    }
  }

  test("declared window_rank query is unaffected (uses rank + dense_rank)") {
    val without = q("window_rank").collect().map(_.toString).sorted
    val withR = withTopK(q("window_rank").collect()).map(_.toString).sorted
    assert(without.sameElements(withR))
  }

  test("rewrite survives a column-pruning Project between filter and window") {
    withTopK {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables(spark, sfDir, "orders")
        .withColumn("rn", row_number().over(w))
        .select("o_custkey", "o_orderkey", "rn")
        .filter(col("rn") <= 2)
      val rows = df.collect()
      val perKey = rows.groupBy(_.getLong(0))
      perKey.values.foreach(g => assert(g.length <= 2))
      assert(rows.map(r => (r.getLong(0), r.getInt(2))).distinct.length == rows.length)
    }
  }

  test("spark.graft.topkRewrite.enabled=false disables the rewrite") {
    withTopK {
      spark.conf.set(WindowTopKRewrite.EnabledKey, "false")
      try {
        val df = top3PerCustomer
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("TopKPerKey"), plan.take(800))
        assert(plan.contains("Window"), plan.take(800))
      } finally spark.conf.unset(WindowTopKRewrite.EnabledKey)
      // and back on again without restarting the session
      val df2 = top3PerCustomer
      df2.collect()
      assert(df2.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    }
  }

  test("spill path: per-row-unique key under a tiny key budget matches stock plan") {
    // every o_orderkey is unique -> one heap per row, worst case for
    // the in-memory map; cap it at 64 keys so each partition spills
    // many runs and the merge path produces the output
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("o_totalprice").desc, col("o_custkey"))
    def query = Tables(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_orderkey", "o_custkey", "rn")
    val stock = query.collect().map(_.toString).sorted
    val spilled = withTopK {
      spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysKey, "64")
      try {
        val df = query
        val rows = df.collect()
        assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        rows
      } finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysKey)
    }.map(_.toString).sorted
    assert(spilled.sameElements(stock))
    assert(stock.nonEmpty)
  }

  test("spill path: repeated keys across spill epochs merge to one top-k group") {
    // low key budget + low-cardinality key: the same key's heap is
    // spilled repeatedly, so its final top-k must merge candidates
    // from every run (and ranks must stay 1..k exactly once)
    val spilled = withTopK {
      spark.conf.set(graft.plans.TopKPerKeyExec.MaxKeysKey, "1")
      try top3PerCustomer.collect()
      finally spark.conf.unset(graft.plans.TopKPerKeyExec.MaxKeysKey)
    }
    val stock = top3PerCustomer.collect()
    assert(spilled.map(_.toString).sorted.sameElements(stock.map(_.toString).sorted))
  }

  test("global (unpartitioned) row_number top-k is NOT rewritten and still runs") {
    withTopK {
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables(spark, sfDir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      val rows = df.collect() // must not crash at planning
      assert(rows.length == 5)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    }
  }
}
