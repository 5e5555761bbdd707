package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape coverage for the FlowOps module
  * (page_transitions / pagerank / scd2_track / session_concurrency).
  * Hash-correctness vs DuckDB is the driver's job; these tests pin
  * the invariants the oracle can't see (mass conservation, interval
  * tiling, sweep-vs-brute-force equality, shuffle counts).
  */
class FlowSpec extends AnyFunSuite {
  import SparkFixture._

  test("page_transitions: total transitions = hits - one per user") {
    val hits = spark.read.parquet(s"$sfDir/events.parquet")
    val nHits = hits.count()
    val nUsers = hits.select("user_id").distinct().count()
    val total = q("page_transitions").agg(sum("n_trans")).head().getLong(0)
    assert(total == nHits - nUsers) // each user's first hit has no prev
  }

  test("pagerank: ranks stay a (sub)distribution and positive") {
    val rows = q("pagerank").collect()
    assert(rows.length == 100)
    val s = rows.map(_.getDouble(1)).sum
    // dangling mass is dropped, never added: sum <= 1 + rounding slack
    assert(s > 0.5 && s <= 1.0 + 1e-6, s"rank mass $s")
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("pagerank: high-in-degree pages outrank the uniform floor") {
    val rows = q("pagerank").collect().map(r => r.getInt(0) -> r.getDouble(1))
    val floor = 0.15 / 100
    // every page has in-edges in the fixture, so all ranks exceed the
    // teleport floor strictly
    assert(rows.forall(_._2 > floor))
  }

  test("scd2_track: runs tile each user's timeline exactly") {
    val runs = q("scd2_track")
    // run r's valid_to == run r+1's valid_from (half-open tiling)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("run_id")
    val viol = runs
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("valid_to_us").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
      .count()
    assert(viol == 0)
    // exactly one open (current) run per user
    val users = runs.select("user_id").distinct().count()
    val open = runs.filter(col("is_current")).count()
    assert(open == users)
    // n_events over runs == total events
    val n = runs.agg(sum("n_events")).head().getLong(0)
    assert(n == spark.read.parquet(s"$sfDir/events.parquet").count())
  }

  test("scd2_track: adjacent runs never carry the same state") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("run_id")
    val same = q("scd2_track")
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state") === col("state")).count()
    assert(same == 0)
  }

  test("session_concurrency: sweep equals brute-force interval count") {
    // brute force at sf0.001: for each day, max over boundary instants
    // of the number of sessions covering that instant
    val sess = q("sessionize")
      .select(col("start_us"), col("end_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val peaks = q("session_concurrency").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val byDay = sess
      .flatMap { case (s0, e0) => Seq(s0, e0) }
      .groupBy(us => java.time.Instant.ofEpochSecond(us / 1000000L)
        .toString.substring(0, 10))
    for ((day, instants) <- byDay) {
      val brute = instants
        .map(t => sess.count { case (s0, e0) => s0 <= t && t <= e0 })
        .max.toLong
      assert(peaks.getOrElse(day, 0L) >= brute,
        s"$day sweep ${peaks.get(day)} < brute $brute")
    }
    // global invariant: concurrency never exceeds live sessions/users
    assert(peaks.values.max <= sess.length)
  }

  test("period_compare: halves partition the event stream exactly") {
    val rows = q("period_compare").collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == spark.read.parquet(s"$sfDir/events.parquet").count())
  }

  test("anomaly_zscore: head-of-series rows have null z, flags need |z|>2") {
    val rows = q("anomaly_zscore").collect()
    // first day per type has an empty trailing frame -> null z
    val types = rows.map(_.getString(0)).distinct
    val firstDays = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.minBy(_.getDate(1).toString) }
    assert(firstDays.forall(_.isNullAt(3)))
    assert(types.nonEmpty)
    rows.foreach { r =>
      val flagged = r.getBoolean(4)
      if (flagged) assert(!r.isNullAt(3) && math.abs(r.getDouble(3)) > 2.0)
      if (!r.isNullAt(3) && math.abs(r.getDouble(3)) > 2.0) assert(flagged)
    }
  }

  test("zorder_bucket: every bucket spans at most half of each dimension") {
    val rows = q("zorder_bucket", sfDir01).collect()
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$sfDir01/lineitem.parquet").count())
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 127,
        s"partkey span too wide in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 127,
        s"suppkey span too wide in bucket ${r.getLong(0)}")
    }
  }

  test("graph_triangles equals driver-side brute force") {
    val edges = q("page_transitions")
      .filter(col("prev_page") =!= col("page"))
      .select(least(col("prev_page"), col("page")),
        greatest(col("prev_page"), col("page")))
      .distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val brute = edges.toSeq.map { case (a, b) =>
      nbrs(a).intersect(nbrs(b)).size
    }.sum / 3L
    val got = q("graph_triangles").head().getLong(0)
    assert(got == brute, s"got $got, brute $brute")
  }

  test("scd2_track plans a single user_id exchange") {
    val df = q("scd2_track")
    df.collect()
    // AQE's toString prints "== Final Plan ==" then "== Initial Plan
    // ==" — count exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle, plan:\n${plan.take(1500)}")
  }
}
