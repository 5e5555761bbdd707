package graft

import graft.ga.GaQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session-scope segment semantics (GA `sessions::condition::`):
  * the filter keeps whole sessions containing a matching event —
  * strictly between row-scope filtering (fewer rows) and user-scope
  * segmentation (more rows). Plus `rangeBetween` window frames
  * (declared "unit only" in SURVEY §2.5).
  */
class GaSegmentSpec extends AnyFunSuite {
  import SparkFixture._

  test("session segment equals hand-written sessionized semi-join") {
    val dsl = GaQuery()
      .segmentSessionsWith(col("event_type") === "purchase")
      .dimensions("event_type" -> col("event_type"))
      .metrics("n_events" -> count(lit(1)))
      .toDF(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val sess = Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("n", when(col("prev").isNull ||
        col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val keep = sess.filter(col("event_type") === "purchase")
      .select("user_id", "sid").distinct()
    val hand = sess.join(keep, Seq("user_id", "sid"), "left_semi")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dsl == hand)
  }

  test("session scope sits between row scope and user scope") {
    def total(q: GaQuery): Long =
      q.metrics("n" -> count(lit(1))).toDF(spark, sfDir)
        .collect().head.getLong(0)
    val rowScope = total(GaQuery().where(col("event_type") === "purchase"))
    val sessScope = total(GaQuery()
      .segmentSessionsWith(col("event_type") === "purchase"))
    val userScope = total(GaQuery()
      .segmentUsersWith(col("event_type") === "purchase"))
    assert(rowScope <= sessScope && sessScope <= userScope)
    // strict on the fixture: sessions contain non-purchase events, and
    // users have sessions with no purchase
    assert(rowScope < sessScope && sessScope < userScope)
  }

  test("rangeBetween frame: 7-day trailing revenue window") {
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .withColumn("day", datediff(col("d"), lit("1995-01-01")))
    val byRange = daily.withColumn("w7",
      sum(col("rev")).over(Window.orderBy(col("day")).rangeBetween(-6, 0)))
      .collect().map(r => r.getInt(r.fieldIndex("day")) ->
        r.getDouble(r.fieldIndex("w7"))).toMap
    // oracle: self-join formulation of the same range frame
    val rows = daily.collect()
      .map(r => r.getInt(r.fieldIndex("day")) ->
        r.getDouble(r.fieldIndex("rev")))
    for ((day, w7) <- byRange) {
      val expect = rows.filter { case (d2, _) => d2 >= day - 6 && d2 <= day }
        .map(_._2).sum
      assert(math.abs(w7 - expect) < 1e-6 * math.abs(expect).max(1.0),
        s"day $day: $w7 != $expect")
    }
    // rows-frame over days differs from range-frame when days are
    // missing; fixture has gaps at sf0.001, so assert they disagree
    // somewhere (proves rangeBetween is not rowsBetween)
    val byRows = daily.withColumn("w7",
      sum(col("rev")).over(Window.orderBy(col("day")).rowsBetween(-6, 0)))
      .collect().map(r => r.getInt(r.fieldIndex("day")) ->
        r.getDouble(r.fieldIndex("w7"))).toMap
    assert(byRange != byRows)
  }

  test("pagination: startAt/maxResults slices the sorted report") {
    def page(start1: Int, n: Int): Array[String] =
      GaQuery()
        .dimensions("event_type" -> col("event_type"),
          "day" -> to_date(col("ts")))
        .metrics("n" -> count(lit(1)))
        .sortDesc("n")
        .startAt(start1).maxResults(n)
        .toDF(spark, sfDir)
        .collect().map(_.toString)
    val all = page(1, 1000)
    assert(page(1, 10).sameElements(all.take(10)))
    assert(page(11, 10).sameElements(all.slice(10, 20)))
    assert(page(6, 5).sameElements(all.slice(5, 10)))
  }

  test("having filters metrics post-aggregation") {
    val rows = GaQuery()
      .dimensions("event_type" -> col("event_type"),
        "day" -> to_date(col("ts")))
      .metrics("n" -> count(lit(1)))
      .having(col("n") > 10)
      .toDF(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) > 10))
    val unfiltered = GaQuery()
      .dimensions("event_type" -> col("event_type"),
        "day" -> to_date(col("ts")))
      .metrics("n" -> count(lit(1)))
      .toDF(spark, sfDir).count()
    assert(rows.length < unfiltered)
  }

  test("GaMetrics named metrics: sessions metric equals declared sessionize count") {
    import graft.ga.GaMetrics
    val report = GaQuery()
      .metrics(GaMetrics.sessions, GaMetrics.users, GaMetrics.events)
      .toDF(spark, sfDir).collect().head
    assert(report.getLong(0) == q("sessionize").count())
    val ev = Tables.events(spark, sfDir)
    assert(report.getLong(1) == ev.select("user_id").distinct().count())
    assert(report.getLong(2) == ev.count())
  }

  test("GaMetrics per-dimension report with sessions") {
    import graft.ga.GaMetrics
    val perType = GaQuery()
      .dimensions("event_type" -> col("event_type"))
      .metrics(GaMetrics.events, GaMetrics.totalValue)
      .sortDesc("events")
      .toDF(spark, sfDir).collect()
    assert(perType.length == 5)
    val counts = perType.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)))
  }
}
