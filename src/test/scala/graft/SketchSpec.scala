package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch tests: exact below k, bounded error above k, and exact
  * partitioning-invariance (the mergeability property that makes
  * pre-aggregated distinct cubes work at scale).
  */
class SketchSpec extends AnyFunSuite {
  import SparkFixture._

  test("kmv_distinct is exact when distinct count < k") {
    val ev = Tables.events(spark, sfDir)
    ev.createOrReplaceTempView("ev_kmv")
    val got = spark.sql(
      "SELECT event_type, kmv_distinct(user_id) AS n FROM ev_kmv GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"below k the sketch must be exact: $got vs $exact")
  }

  test("kmv_distinct error < 5% on a large distinct domain") {
    val li = Tables(spark, sfDir01, "lineitem")
    li.createOrReplaceTempView("li_kmv")
    val approx = spark.sql(
      "SELECT kmv_distinct(l_extendedprice, 1024) FROM li_kmv")
      .collect().head.getLong(0)
    val exact = li.select(countDistinct(col("l_extendedprice")))
      .collect().head.getLong(0)
    assert(exact > 10000, s"need a large domain, got $exact")
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("kmv_distinct is invariant under repartitioning (exact mergeability)") {
    val li = Tables(spark, sfDir01, "lineitem")
    def run(parts: Int): Long = {
      li.repartition(parts).createOrReplaceTempView("li_kmv_p")
      spark.sql("SELECT kmv_distinct(l_extendedprice, 256) FROM li_kmv_p")
        .collect().head.getLong(0)
    }
    val r1 = run(1)
    val r13 = run(13)
    val r32 = run(32)
    assert(r1 == r13 && r13 == r32,
      s"sketch must merge exactly: $r1 / $r13 / $r32")
  }

  test("kmv_distinct composes with relational ops (sketch cube)") {
    val ev = Tables.events(spark, sfDir)
    ev.withColumn("day", to_date(col("ts")))
      .createOrReplaceTempView("ev_cube")
    // per-day sketches rolled up to a total — the mergeable-cube shape
    val perDay = spark.sql(
      """SELECT day, kmv_distinct(user_id) AS users
         FROM ev_cube GROUP BY day""").collect()
    assert(perDay.nonEmpty)
    val total = spark.sql("SELECT kmv_distinct(user_id) FROM ev_cube")
      .collect().head.getLong(0)
    val exactTotal = ev.select(countDistinct(col("user_id")))
      .collect().head.getLong(0)
    assert(total == exactTotal) // 15 users at sf0.001 — far below k
    perDay.foreach(r => assert(r.getLong(1) <= total))
  }

  test("kmv_distinct survives heavy duplication (regression: dup eviction)") {
    import spark.implicits._
    // 500 distinct keys, each repeated 200 times, shuffled across
    // partitions: with k=256 < distinct count, every partition streams
    // duplicates into a full buffer — the old eviction bug shrank the
    // k-smallest set on each duplicate and undercounted badly
    val df = (0 until 100000).map(i => i % 500).toDF("k").repartition(16)
    df.createOrReplaceTempView("dup_kmv")
    val approx = spark.sql("SELECT kmv_distinct(k, 256) FROM dup_kmv")
      .collect().head.getLong(0)
    assert(math.abs(approx - 500).toDouble / 500 < 0.15,
      s"approx $approx vs exact 500")
    // and duplication must not change the estimate at all vs distinct input
    (0 until 500).toDF("k").createOrReplaceTempView("uniq_kmv")
    val uniq = spark.sql("SELECT kmv_distinct(k, 256) FROM uniq_kmv")
      .collect().head.getLong(0)
    assert(approx == uniq, s"dup input $approx != distinct input $uniq")
  }

  // ---- Misra–Gries heavy hitters (mg_topk) ----

  test("mg_topk is exact when distinct count <= k") {
    val ev = Tables.events(spark, sfDir)
    ev.createOrReplaceTempView("ev_mg")
    // 5 distinct event types through 8 counters: no decrement ever fires
    val got = spark.sql(
      "SELECT explode(mg_topk(event_type, 8)) AS (item, est) FROM ev_mg")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"below k the sketch must be exact: $got vs $exact")
  }

  test("mg_topk guarantees hold under any repartitioning") {
    import spark.implicits._
    // zipf-ish synthetic stream: item i appears 10000/(i+1) times,
    // 200 distinct items through k=16 counters
    val rows = (0 until 200).flatMap(i => Seq.fill(10000 / (i + 1))(s"i$i"))
    val n = rows.size.toLong
    val k = 16
    val exact = rows.groupBy(identity).map { case (it, xs) =>
      it -> xs.size.toLong }
    for (parts <- Seq(1, 7, 32)) {
      rows.toDF("item").repartition(parts)
        .createOrReplaceTempView("mg_stream")
      val est = spark.sql(
        s"SELECT explode(mg_topk(item, $k)) AS (item, est) FROM mg_stream")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // underestimate-only + error bound, for every claimed item
      est.foreach { case (it, e) =>
        val ex = exact(it)
        assert(e <= ex, s"[$parts parts] overestimate: $it $e > $ex")
        assert(ex - e <= n / (k + 1),
          s"[$parts parts] error too large: $it $ex-$e > ${n / (k + 1)}")
      }
      // superset guarantee: every item above n/(k+1) is claimed
      exact.filter(_._2 > n / (k + 1)).keys.foreach { it =>
        assert(est.contains(it),
          s"[$parts parts] heavy item $it missing from sketch")
      }
    }
  }
}
