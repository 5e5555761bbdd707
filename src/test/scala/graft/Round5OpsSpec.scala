package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-recomputation checks for the round-5 window/agg/
  * similarity/multimodal additions, beyond the DuckDB oracles:
  * brute-force equivalents at sf0.001/sf0.01 where the declared op
  * uses a smarter (windowed / blocked) plan.
  */
class Round5OpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("window_range_days equals the theta-self-join recomputation") {
    val base = Tables(spark, sfDir, "orders")
      .withColumn("day_no", datediff(col("o_orderdate"), lit("1995-01-01")))
      .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
        col("o_totalprice"))
    val a = base.select(col("o_custkey"), col("o_orderkey"), col("day_no"))
    val b = base.select(col("o_custkey").as("ck"),
      col("day_no").as("d2"), col("o_totalprice").as("p2"))
    val brute = a.join(b, col("o_custkey") === col("ck") &&
        col("d2").between(col("day_no") - 30, col("day_no")))
      .groupBy(col("o_custkey"), col("o_orderkey"))
      .agg(count(lit(1)).as("bn"), round(sum(col("p2")), 2).as("bs"))
    val out = q("window_range_days")
    val diff = out.join(brute, Seq("o_custkey", "o_orderkey"))
      .filter(col("n_30d") =!= col("bn") ||
        abs(col("spend_30d") - col("bs")) > 0.011)
      .count()
    assert(diff == 0)
    assert(out.count() == Tables(spark, sfDir, "orders").count())
  }

  test("rolling_median equals the sorted-frame middle element") {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val w = ord.rowsBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
    val brute = Tables(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(ord))
      .withColumn("frame", collect_list(col("o_totalprice")).over(w))
      .filter(col("rn") >= 7)
      .withColumn("med_brute",
        round(element_at(array_sort(col("frame")), 4), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("med_brute"))
    val diff = q("rolling_median").join(brute, Seq("o_custkey", "o_orderkey"))
      .filter(col("med7") =!= col("med_brute")).count()
    assert(diff == 0)
  }

  test("pareto_front rows are exactly the non-dominated set") {
    val base = Tables(spark, sfDir, "orders")
      .withColumn("cents", floor(col("o_totalprice") * 100).cast("long"))
      .withColumn("day_no", datediff(col("o_orderdate"), lit("1995-01-01")))
      .select(col("o_orderpriority"), col("o_orderkey"), col("cents"),
        col("day_no"))
    val other = base.select(col("o_orderpriority").as("p2"),
      col("cents").as("c2"), col("day_no").as("d2"))
    // dominated = some same-priority order has strictly higher cents
    // and a day >= ours (the declared op's keep-rule negation)
    val dominated = base.join(other,
        col("o_orderpriority") === col("p2") &&
          col("c2") > col("cents") && col("d2") >= col("day_no"),
        "left_semi")
      .select(col("o_orderkey"))
    val frontier = base.join(dominated, Seq("o_orderkey"), "left_anti")
    val got = q("pareto_front").select(col("o_orderkey"))
    assert(got.except(frontier.select(col("o_orderkey"))).count() == 0)
    assert(frontier.select(col("o_orderkey")).except(got).count() == 0)
  }

  test("quantile_exact quartiles are ordered and bracket the data") {
    val out = q("quantile_exact")
    assert(out.filter(col("q1") > col("q2") || col("q2") > col("q3"))
      .count() == 0)
    val bounds = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
    val bad = out.join(bounds, "l_returnflag")
      .filter(col("q1") < col("lo") - 0.01 || col("q3") > col("hi") + 0.01)
      .count()
    assert(bad == 0)
  }

  test("user_streaks reconciles with distinct active days per user") {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_days"))
    val out = q("user_streaks")
    val bad = out.join(days, "user_id")
      .filter(col("n_active_days") =!= col("n_days") ||
        col("max_streak") > col("n_active_days") ||
        col("max_streak") < 1).count()
    assert(bad == 0)
    assert(out.count() == days.count())
  }

  test("edit_dist_pairs matches brute force inside one block (sf0.01)") {
    val parts = Tables(spark, sfDir01, "part")
      .select(col("p_brand"), col("p_size"), col("p_partkey"), col("p_name"))
      .collect()
    val brute = (for {
      a <- parts; b <- parts
      if a.getString(0) == b.getString(0) && a.getInt(1) == b.getInt(1)
      if a.getLong(2) < b.getLong(2)
      d = levDist(a.getString(3), b.getString(3)) if d <= 3
    } yield (a.getLong(2), b.getLong(2), d)).toSet
    val got = q("edit_dist_pairs", sfDir01)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == brute)
  }

  test("media_dedup matches a driver-side frame recount") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
    val byHash = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    docs.foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      (0 until t.length by 64).foreach { off =>
        val chunk = t.substring(off, math.min(off + 64, t.length))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        byHash.getOrElseUpdate(h,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += id
      }
    }
    val expect = byHash.collect {
      case (h, ids) if ids.distinct.size > 1 =>
        (h, ids.size.toLong, ids.distinct.size.toLong, ids.min)
    }.toSet
    val got = q("media_dedup")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expect)
  }

  test("winsorize: bounds ordered, winsorized mean inside [p05, p95]") {
    val out = q("winsorize")
    val bad = out.filter(col("p05") > col("p95") ||
      col("mean_winsor") < col("p05") - 0.01 ||
      col("mean_winsor") > col("p95") + 0.01).count()
    assert(bad == 0)
    assert(out.count() == 3)
  }

  test("gini_concentration matches a driver-side exact recomputation") {
    val rows = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
      .collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100).toLong, r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (seg, xs) =>
      val sorted = xs.sortBy(t => (t._2, t._3)).map(_._2)
      val n = sorted.length.toLong
      val s0 = sorted.sum
      val s1 = sorted.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * BigInt(x) }.sum
      val g = 2.0 * s1.toDouble / (n * 1.0 * s0) - (n + 1.0) / n
      seg -> (n, math.rint(g * 1e6) / 1e6)
    }
    val got = q("gini_concentration").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (seg, (n, g)) =>
      assert(got(seg)._1 == n)
      assert(math.abs(got(seg)._2 - g) < 1e-9, s"$seg: ${got(seg)._2} vs $g")
    }
    // Gini of a non-degenerate positive distribution is in (0, 1)
    assert(got.values.forall(v => v._2 > 0 && v._2 < 1))
  }

  test("mix_uniform: kept counts are near-uniform across sources") {
    val out = q("mix_uniform", sfDir01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every source keeps at most its total, rates in (0, 1e6]
    assert(out.forall { case (_, n, ppm, k) =>
      k <= n && ppm > 0 && ppm <= 1000000 })
    // the smallest source keeps everything (rate 1e6)
    val minSrc = out.minBy(_._2)
    assert(minSrc._3 == 1000000 && minSrc._4 == minSrc._2)
    // kept counts concentrate near the smallest source's size: the
    // hash is uniform, so allow a generous band around min count
    val minN = out.map(_._2).min
    assert(out.forall { case (_, _, _, k) =>
      k >= minN / 2 && k <= minN * 2 })
  }

  test("share_of_total: shares sum to 1 per region, revenue reconciles") {
    val out = q("share_of_total")
    val sums = out.groupBy(col("r_name"))
      .agg(sum(col("share")).as("s"), sum(col("revenue")).as("rev"))
    assert(sums.filter(abs(col("s") - 1.0) > 1e-4).count() == 0)
    val total = sums.agg(sum(col("rev"))).first().getDouble(0)
    val direct = Tables(spark, sfDir, "orders")
      .withColumn("cents", floor(col("o_totalprice") * 100).cast("long"))
      .agg(sum(col("cents"))).first().getLong(0) / 100.0
    assert(math.abs(total - direct) < 1.0)
  }

  test("markov_transitions: probabilities normalize per source state") {
    val out = q("markov_transitions")
    val sums = out.groupBy(col("prev_type")).agg(sum(col("p")).as("s"))
    assert(sums.filter(abs(col("s") - 1.0) > 1e-4).count() == 0)
    // total transition count = events - users (each user loses one lag)
    val nTrans = out.agg(sum(col("n"))).first().getLong(0)
    val ev = Tables.events(spark, sfDir)
    val expect = ev.count() -
      ev.select(col("user_id")).distinct().count()
    assert(nTrans == expect)
  }

  test("first_touch: user totals reconcile, rates in [0,1]") {
    val out = q("first_touch")
    val nUsers = out.agg(sum(col("n_users"))).first().getLong(0)
    assert(nUsers == Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count())
    assert(out.filter(col("conv_rate") < 0 || col("conv_rate") > 1 ||
      col("n_converted") > col("n_users")).count() == 0)
  }

  test("join_asof_nearest: nearest is the min |delta| signup, tie → prev") {
    val out = q("join_asof_nearest")
    // nearest must equal prev or next, and be the closer of the two
    val bad = out.filter(
      (col("nearest_signup_us").isNotNull &&
        col("nearest_signup_us") =!= col("prev_signup_us") &&
        col("nearest_signup_us") =!= col("next_signup_us")) ||
      (col("prev_signup_us").isNotNull && col("next_signup_us").isNotNull &&
        ((col("purchase_us") - col("prev_signup_us") <=
          col("next_signup_us") - col("purchase_us")) &&
          col("nearest_signup_us") =!= col("prev_signup_us") ||
        (col("purchase_us") - col("prev_signup_us") >
          col("next_signup_us") - col("purchase_us")) &&
          col("nearest_signup_us") =!= col("next_signup_us")))).count()
    assert(bad == 0)
    // row count equals the purchase count (every purchase emitted)
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases)
    // backward side agrees with the declared join_asof
    val asof = q("join_asof").select(col("event_id"),
      col("last_signup_us").as("expect_prev"))
    assert(out.join(asof, "event_id")
      .filter(not(col("prev_signup_us") <=> col("expect_prev")))
      .count() == 0)
  }

  test("topk_diverse: no customer exceeds 2 rows; dominated by plain topk") {
    val out = q("topk_diverse")
    assert(out.count() == 20)
    assert(out.groupBy(col("o_custkey")).count()
      .filter(col("count") > 2).count() == 0)
    // diversified minimum price <= plain top-20 minimum (cap only demotes)
    val plainMin = Tables(spark, sfDir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
      .agg(min(col("o_totalprice"))).first().getDouble(0)
    val divMin = out.agg(min(col("o_totalprice"))).first().getDouble(0)
    assert(divMin <= plainMin + 1e-9)
  }

  test("value_histogram: buckets in [0,9], counts cover all events") {
    val out = q("value_histogram")
    assert(out.filter(col("bucket") < 0 || col("bucket") > 9).count() == 0)
    val total = out.agg(sum(col("n_events"))).first().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    // per-bucket observed bounds are ordered
    assert(out.filter(col("lo_v") > col("hi_v")).count() == 0)
  }

  test("conversion_lag: quartiles ordered, non-negative, count sane") {
    val r = q("conversion_lag").collect()(0)
    val (n, q1, med, q3, avg) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n > 0)
    assert(q1 >= 0 && q1 <= med && med <= q3)
    assert(avg >= 0)
    // converting users are a subset of users with any purchase
    val buyers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(n <= buyers)
  }

  test("decile_lift: 10 deciles, shares sum to 1, cum_share monotone") {
    val out = q("decile_lift").orderBy(col("decile")).collect()
    assert(out.length == 10)
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    val cum = out.map(_.getDouble(4))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(cum.last - 1.0) < 1e-6)
    // customer counts differ by at most 1 (NTILE contract)
    val ns = out.map(_.getLong(1))
    assert(ns.max - ns.min <= 1)
    // decile 1 (top spenders) has the largest share
    assert(out.head.getDouble(3) == out.map(_.getDouble(3)).max)
  }

  test("basket_pairs: support bounded by min brand order-frequency") {
    val out = q("basket_pairs").collect()
    assert(out.length == 20)
    val freq = Tables(spark, sfDir, "lineitem")
      .join(broadcast(Tables(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .groupBy(col("p_brand")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (b1, b2, s) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(b1 < b2)
      assert(s <= math.min(freq(b1), freq(b2)))
    }
  }

  test("trend_slope matches a driver-side least-squares recomputation") {
    val rows = Tables(spark, sfDir, "orders")
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long"),
        floor(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (p, xs) =>
      val n = xs.length.toDouble
      val sx = xs.map(_._2).sum.toDouble
      val sy = xs.map(_._3).sum.toDouble
      val sxy = xs.map(t => BigInt(t._2) * BigInt(t._3)).sum
      val sxx = xs.map(t => t._2 * t._2).sum.toDouble
      p -> (n * sxy.toDouble - sx * sy) / (n * sxx - sx * sx)
    }
    val got = q("trend_slope").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    expect.foreach { case (p, s) =>
      assert(math.abs(got(p) - s) < 1e-4, s"$p: ${got(p)} vs $s")
    }
  }

  test("seasonality_dow: 7 dows per type, shares normalize, counts cover") {
    val out = q("seasonality_dow")
    val sums = out.groupBy(col("event_type"))
      .agg(sum(col("share")).as("s"), sum(col("n_events")).as("n"),
        count(lit(1)).as("k"))
    assert(sums.filter(abs(col("s") - 1.0) > 1e-4).count() == 0)
    // January 2024 spans every weekday; 5 types × 7 dows
    assert(sums.filter(col("k") =!= 7).count() == 0)
    val total = sums.agg(sum(col("n"))).first().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("mad_outliers: robust stats sane, outliers fewer than z-score 5x") {
    val out = q("mad_outliers").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (n, med, mad, k) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))
      assert(mad >= 0 && med > 0)
      assert(k >= 0 && k < n / 10, s"implausible outlier count $k of $n")
    }
  }

  test("funnel_steps: monotone step counts, consistent rates") {
    val r = q("funnel_steps").collect()(0)
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3 && s3 >= 0)
    assert(math.abs(r.getDouble(5) -
      math.rint(s3 * 1e6 / s1) / 1e6) < 1e-6)
    // step-1 count equals users with a view event
    val viewers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(s1 == viewers)
  }

  test("rfm_segments: cells cover all customers, scores in 1..5") {
    val out = q("rfm_segments")
    assert(out.filter(col("r_score") < 1 || col("r_score") > 5 ||
      col("f_score") < 1 || col("f_score") > 5 ||
      col("m_score") < 1 || col("m_score") > 5).count() == 0)
    val n = out.agg(sum(col("n_customers"))).first().getLong(0)
    assert(n == Tables(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count())
  }

  test("order_lines_hist: orders and lines reconcile") {
    val out = q("order_lines_hist")
    val orders = out.agg(sum(col("n_orders"))).first().getLong(0)
    val lines = out.agg(sum(col("n_lines") * col("n_orders")))
      .first().getLong(0)
    assert(orders == Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).distinct().count())
    assert(lines == Tables(spark, sfDir, "lineitem").count())
  }

  test("source_overlap: jaccard in (0,1], symmetric-free pairs, bounded") {
    val out = q("source_overlap", sfDir01).collect()
    out.foreach { r =>
      val (s1, s2, inter, j) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))
      assert(s1 < s2)
      assert(inter > 0 && j > 0 && j <= 1)
    }
  }

  test("churn_flags: every customer labeled, gaps/dormancy consistent") {
    val out = q("churn_flags")
    assert(out.count() == Tables(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count())
    val bad = out.filter(
      col("dormant_days") < 0 ||
        (col("is_dormant") === 1) =!= (col("dormant_days") > 90) ||
        (col("n_orders") === 1 && col("longest_gap").isNotNull)).count()
    assert(bad == 0)
  }

  test("name_clusters matches union-find over the edit-distance edges") {
    val edges = q("edit_dist_pairs", sfDir01)
      .select(col("k1"), col("k2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = scala.collection.mutable.Map
      .empty[Long, Long].withDefaultValue(0L)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.foreach(n => members(find(n)) += 1)
    val expect = members.collect { case (root, n) if n > 1 => (root, n) }
      .toSet
    val got = q("name_clusters", sfDir01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("rolling_wau matches a brute-force trailing-window recount") {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("dno"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    val span = days.map(_._2)
    val expect = (span.min to span.max).map { d =>
      d -> days.filter(t => t._2 >= d - 6 && t._2 <= d)
        .map(_._1).distinct.length.toLong
    }.toMap
    val got = q("rolling_wau").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("data_profile counts agree with direct per-column aggregates") {
    val od = Tables(spark, sfDir, "orders")
    val got = q("data_profile").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got.keySet == Set("o_orderstatus", "o_orderpriority",
      "o_custkey", "o_totalprice"))
    val n = od.count()
    got.values.foreach { case (rows, nulls, _) =>
      assert(rows == n && nulls == 0)
    }
    assert(got("o_orderstatus")._3 ==
      od.select(col("o_orderstatus")).distinct().count())
    assert(got("o_custkey")._3 ==
      od.select(col("o_custkey")).distinct().count())
  }

  test("merge_upsert: action counts reconcile with the key space") {
    val out = q("merge_upsert").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("updated", "inserted", "unchanged"))
    val nCust = Tables(spark, sfDir, "customer").count()
    // merged rows = all target keys + inserted keys
    assert(out("updated") + out("unchanged") == nCust)
    assert(out("inserted") > 0)
  }

  test("table_diff: statuses partition the key space, changed = picks") {
    val out = q("table_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCust = Tables(spark, sfDir, "customer").count()
    assert(out.values.sum == nCust)
    val picked = Tables(spark, sfDir, "customer")
      .filter(expr("(c_custkey % 100000) * 2654435761 % 10 = 0")).count()
    assert(out.getOrElse("changed", 0L) == picked)
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
