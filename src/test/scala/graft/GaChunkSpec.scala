package graft

import graft.ga.GaQuery
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Union}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** chunkByDay — the reference client's anti-sampling rewrite surfaced
  * as API (SURVEY.md §4 [P][R]): one report compiled as a union of
  * per-day aggregates over day-bounded scans. Locks (1) result
  * equivalence with the unchunked report, (2) the plan shape — one
  * Union of exactly one aggregate branch per day, each with its day
  * bounds below the aggregate, (3) the misuse guards.
  */
class GaChunkSpec extends AnyFunSuite {
  import SparkFixture._

  private def report(chunked: Boolean) = {
    val base = GaQuery()
      .dateRange("2024-01-05", "2024-01-12")
      .segmentUsersWith(col("event_type") === "purchase")
      .dimensions("day" -> to_date(col("ts")),
        "event_type" -> col("event_type"))
      .metrics("n_events" -> count(lit(1)),
        "total_value" -> round(sum(col("value")), 2))
    (if (chunked) base.chunkByDay("day") else base).toDF(spark, sfDir)
  }

  test("chunked report equals the unchunked report") {
    val a = report(chunked = true).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    val b = report(chunked = false).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq)
  }

  test("plan is a union of one day-bounded aggregate branch per day") {
    val plan = report(chunked = true).queryExecution.optimizedPlan
    val unions = plan.collect { case u: Union => u }
    assert(unions.size == 1, s"expected one Union, got ${unions.size}")
    // 7-day range -> 7 branches
    assert(unions.head.children.size == 7,
      s"expected 7 per-day branches, got ${unions.head.children.size}")
    // every branch carries its own day bounds (pushed below the agg,
    // so each branch's scan is prunable to its day)
    val dayUs = 86400L * 1000000L
    val startUs = 19727L * dayUs // 2024-01-05 epoch-day 19727
    unions.head.children.zipWithIndex.foreach { case (branch, i) =>
      val conds = branch.collect { case f: Filter => f.condition.toString }
      val lo = startUs + i * dayUs
      val hi = lo + dayUs
      assert(conds.exists(c => c.contains(lo.toString)
          && c.contains(hi.toString)),
        s"branch $i missing [$lo,$hi) bounds; filters: $conds")
    }
  }

  test("sort, having and max-results apply globally, after the union") {
    val top = GaQuery()
      .dateRange("2024-01-05", "2024-01-12")
      .dimensions("day" -> to_date(col("ts")),
        "event_type" -> col("event_type"))
      .metrics("n_events" -> count(lit(1)))
      .having(col("n_events") > 1)
      .sortDesc("n_events")
      .maxResults(3)
      .chunkByDay("day")
      .toDF(spark, sfDir)
      .collect()
    assert(top.length == 3)
    val ns = top.map(_.getAs[Long]("n_events"))
    assert(ns.sameElements(ns.sortBy(-_)), ns.mkString(","))
    assert(ns.forall(_ > 1))
  }

  test("chunkBy week and month equal the unchunked report; branch " +
      "counts follow the calendar") {
    def rep(f: GaQuery => GaQuery) = f(GaQuery()
      .dateRange("2024-01-03", "2024-02-05")
      .dimensions("day" -> to_date(col("ts")),
        "event_type" -> col("event_type"))
      .metrics("n_events" -> count(lit(1)),
        "total_value" -> round(sum(col("value")), 2)))
      .toDF(spark, sfDir)
    val base = rep(identity).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(base.nonEmpty)
    for (g <- Seq("day", "week", "month")) {
      val got = rep(_.chunkBy("day", g)).collect()
        .map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(got == base, s"$g-chunked report diverges from unchunked")
    }
    // 33-day range (Jan 3 .. Feb 5): 33 day chunks, 5 week chunks
    // (7-day strides from the range start), 2 calendar-month chunks
    // ([Jan 3, Feb 1) and [Feb 1, Feb 5))
    def branches(g: String): Int = {
      val plan = rep(_.chunkBy("day", g)).queryExecution.optimizedPlan
      plan.collect { case u: Union => u.children.size }
        .headOption.getOrElse(1)
    }
    assert(branches("day") == 33)
    assert(branches("week") == 5)
    assert(branches("month") == 2)
    // misuse guard: unknown granularity fails at declaration time
    intercept[IllegalArgumentException] {
      GaQuery().chunkBy("day", "fortnight")
    }
  }

  test("chunkByDay without a dateRange or day dimension fails loudly") {
    val e1 = intercept[IllegalArgumentException] {
      GaQuery()
        .dimensions("day" -> to_date(col("ts")))
        .metrics("n" -> count(lit(1)))
        .chunkByDay("day")
        .toDF(spark, sfDir)
    }
    assert(e1.getMessage.contains("dateRange"))
    val e2 = intercept[IllegalArgumentException] {
      GaQuery()
        .dateRange("2024-01-05", "2024-01-12")
        .dimensions("event_type" -> col("event_type"))
        .metrics("n" -> count(lit(1)))
        .chunkByDay("day")
        .toDF(spark, sfDir)
    }
    assert(e2.getMessage.contains("no declared dimension"))
  }
}
