package graft

import graft.ga.{GaFilters, GaQuery}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GA `filters=` / `segment=` string mini-language: operator
  * semantics, `,`-over-`;` precedence, value escaping, and parity
  * between the string surface and the equivalent Column predicates.
  */
class GaFiltersSpec extends AnyFunSuite {
  import SparkFixture._

  private def evCount(pred: org.apache.spark.sql.Column): Long =
    Tables.events(spark, sfDir).filter(pred).count()

  test("every operator compiles and matches its Column equivalent") {
    val ev = Tables.events(spark, sfDir)
    val cases = Seq(
      "ga:event_type==purchase" -> (col("event_type") === "purchase"),
      "ga:event_type!=error" -> (col("event_type") =!= "error"),
      "ga:value>100" -> (col("value") > 100.0),
      "ga:value<100" -> (col("value") < 100.0),
      "ga:value>=100" -> (col("value") >= 100.0),
      "ga:value<=100" -> (col("value") <= 100.0),
      "ga:event_type=@ur" -> col("event_type").contains("ur"),
      "ga:event_type!@ur" -> !col("event_type").contains("ur"),
      "ga:event_type=~^(si|pu)" -> col("event_type").rlike("^(si|pu)"),
      "ga:event_type!~e$" -> !col("event_type").rlike("e$"))
    cases.foreach { case (s, c) =>
      val got = ev.filter(GaFilters.parse(s)).count()
      val want = ev.filter(c).count()
      assert(got == want, s"'$s': $got != $want")
      assert(want > 0 && want < ev.count(), s"'$s' is not discriminative")
    }
  }

  test("OR (,) binds tighter than AND (;)") {
    val s = "ga:event_type==signup,ga:event_type==purchase;ga:value>100"
    val expect = (col("event_type") === "signup" ||
      col("event_type") === "purchase") && col("value") > 100.0
    assert(evCount(GaFilters.parse(s)) == evCount(expect))
    // and NOT the other grouping
    val wrong = col("event_type") === "signup" ||
      (col("event_type") === "purchase" && col("value") > 100.0)
    assert(evCount(GaFilters.parse(s)) != evCount(wrong))
  }

  test("escaped separators stay inside values") {
    import spark.implicits._
    val df = Seq("a;b", "a,b", "a\\b", "plain").toDF("dim")
    def n(s: String): Long = df.filter(GaFilters.parse(s)).count()
    assert(n("ga:dim==a\\;b") == 1)   // ; escaped -> one clause
    assert(n("ga:dim==a\\,b") == 1)   // , escaped -> no OR split
    assert(n("ga:dim==a\\\\b") == 1)  // literal backslash
    assert(n("ga:dim==plain") == 1)
  }

  test("regex escape sequences pass through =~ values untouched") {
    import spark.implicits._
    val df = Seq("42", "dog", "a.b", "axb").toDF("dim")
    def n(s: String): Long = df.filter(GaFilters.parse(s)).count()
    // \d must stay a digit class, not collapse to literal 'd'
    assert(n("ga:dim=~^\\d+$") == 1)
    // \. must stay a literal dot, not match any char
    assert(n("ga:dim=~^a\\.b$") == 1)
    // only the mini-language's own metachars unescape
    assert(n("ga:dim=~^\\d+$,ga:dim==dog") == 2)
  }

  test("operator search stops at the first operator (values may contain them)") {
    import spark.implicits._
    val df = Seq("x=1", "y").toDF("dim")
    assert(df.filter(GaFilters.parse("ga:dim==x=1")).count() == 1)
    // regex value containing comparison chars
    assert(df.filter(GaFilters.parse("ga:dim=~^x=")).count() == 1)
  }

  test("malformed filters raise clear errors") {
    val noOp = intercept[IllegalArgumentException](GaFilters.parse("ga:foo"))
    assert(noOp.getMessage.contains("no operator"))
    val noName = intercept[IllegalArgumentException](GaFilters.parse("==x"))
    assert(noName.getMessage.contains("no dimension name"))
    val empty = intercept[IllegalArgumentException](GaFilters.parse("  "))
    assert(empty.getMessage.contains("empty"))
  }

  test("segment strings dispatch to the right scope") {
    val (us, _) = GaFilters.parseSegment("users::condition::ga:value>180")
    assert(us == "users")
    val (ss, _) = GaFilters.parseSegment(
      "sessions::condition::ga:event_type==purchase")
    assert(ss == "sessions")
    val bad = intercept[IllegalArgumentException](
      GaFilters.parseSegment("gaid::-3"))
    assert(bad.getMessage.contains("unsupported segment"))
  }

  test("string segment equals the Column-built segment end to end") {
    def report(g: GaQuery): Map[String, Long] =
      g.dimensions("event_type" -> col("event_type"))
        .metrics("n" -> count(lit(1)))
        .toDF(spark, sfDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaString = report(GaQuery()
      .segment("sessions::condition::ga:event_type==purchase"))
    val viaColumn = report(GaQuery()
      .segmentSessionsWith(col("event_type") === "purchase"))
    assert(viaString == viaColumn)
    val viaUserString = report(GaQuery()
      .segment("users::condition::ga:event_type==purchase"))
    val viaUserColumn = report(GaQuery()
      .segmentUsersWith(col("event_type") === "purchase"))
    assert(viaUserString == viaUserColumn)
  }

  test("numeric comparison through string literals: int-typed column") {
    // user_id is BIGINT; the string literal must compare numerically
    val ev = Tables.events(spark, sfDir)
    val got = ev.filter(GaFilters.parse("ga:user_id<10")).count()
    val want = ev.filter(col("user_id") < 10).count()
    assert(got == want && want > 0)
  }
}
