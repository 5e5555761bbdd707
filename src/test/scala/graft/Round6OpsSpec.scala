package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-recomputation checks for the round-6 additions, beyond
  * the DuckDB oracles: conservation laws and brute-force equivalents
  * where the declared op uses a smarter (bucketed / windowed / exact
  * integer-split) plan.
  */
class Round6OpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("attribution_linear conserves revenue to the cent") {
    // the point of the integer split: across all campaigns (including
    // the 'direct' -1 bucket) attributed revenue must equal the total
    // purchase revenue EXACTLY — no rounding drift, no lost cents
    for (dir <- Seq(sfDir, sfDir01)) {
      val out = q("attribution_linear", dir)
      val attributed = out.agg(sum(col("revenue"))).first().getDouble(0)
      val totalCents = Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .agg(sum(floor(col("value") * 100).cast("long")))
        .first().getLong(0)
      assert(math.abs(attributed - totalCents / 100.0) < 1e-9,
        s"$dir: attributed $attributed != purchases ${totalCents / 100.0}")
    }
  }

  test("attribution_linear credits every purchase exactly once as 'direct' or split") {
    // n_credits across buckets = (#purchase-touch pairs) + (#purchases
    // with no prior touch): every purchase's cents fan out over its
    // own touch set and nothing else
    val out = q("attribution_linear")
    val nCredits = out.agg(sum(col("n_credits"))).first().getLong(0)
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("us").as("p_us"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("tu"), col("us").as("t_us"))
    val pairs = purchases.join(touches,
      col("pu") === col("tu") && col("t_us") < col("p_us")).count()
    val withTouch = purchases.join(touches,
        col("pu") === col("tu") && col("t_us") < col("p_us"), "left_semi")
      .count()
    val direct = purchases.count() - withTouch
    assert(nCredits == pairs + direct,
      s"credit rows $nCredits != $pairs pairs + $direct direct")
  }

  test("key_skew matches a direct recomputation per event type") {
    val out = q("key_skew").collect()
      .map(r => r.getString(0) -> r).toMap
    val sizes = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id")).count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.keySet == sizes.keySet)
    for ((tpe, szs) <- sizes) {
      val r = out(tpe)
      assert(r.getLong(1) == szs.length, s"$tpe n_keys")
      assert(r.getLong(2) == szs.max, s"$tpe max_sz")
      val med = // linear-interpolated p50, matching percentile/quantile_cont
        if (szs.length % 2 == 1) szs(szs.length / 2).toDouble
        else (szs(szs.length / 2 - 1) + szs(szs.length / 2)) / 2.0
      assert(r.getDouble(3) == med, s"$tpe med_sz ${r.getDouble(3)} != $med")
      assert(r.getLong(4) == szs.sum, s"$tpe total")
      assert(r.getLong(5) == szs.max * 10000L / szs.sum, s"$tpe hot_share_bp")
    }
  }

  test("bucket_join equals the plain unbucketed join+rollup") {
    val plain = Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(floor(col("o_totalprice") * 100).cast("long")) / 100.0, 2)
          .as("total_price"))
    val out = q("bucket_join")
    assert(out.count() == plain.count())
    val diff = out.join(plain, Seq("c_custkey"))
      .filter(out("n_orders") =!= plain("n_orders") ||
        out("total_price") =!= plain("total_price")).count()
    assert(diff == 0, "bucketed result diverges from plain join")
  }

  test("new_vs_returning conserves users and activity") {
    val out = q("new_vs_returning")
    val totNew = out.agg(sum(col("n_new"))).first().getLong(0)
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    // every user is new exactly once
    assert(totNew == nUsers, s"$totNew new != $nUsers users")
    val totActive = out.agg(sum(col("n_active"))).first().getLong(0)
    val userDays = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(totActive == userDays)
  }

  test("bounce_rate sessions reconcile with sessionize") {
    val out = q("bounce_rate")
    val sessions = out.agg(sum(col("n_sessions"))).first().getLong(0)
    assert(sessions == q("sessionize").count())
    val bounced = out.agg(sum(col("n_bounced"))).first().getLong(0)
    assert(bounced ==
      q("sessionize").filter(col("n_events") === 1).count())
  }

  test("orc_roundtrip loses nothing vs the source projection") {
    val src = Tables(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_retailprice"))
    assert(q("orc_roundtrip").except(src).isEmpty &&
      src.except(q("orc_roundtrip")).isEmpty)
  }
}
