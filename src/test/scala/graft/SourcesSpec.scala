package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink parity (SURVEY.md §2.1): the reference ingests JSON
  * API payloads; we support csv/json/parquet read + write round-trips
  * with schema preservation, plus the JSON-payload column path
  * (from_json -> MapType -> explode).
  */
class SourcesSpec extends AnyFunSuite {
  import SparkFixture._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-src").toString

  test("csv round-trip preserves data with explicit schema") {
    val orig = Tables(spark, sfDir, "nation")
    val dir = tmp() + "/nation_csv"
    orig.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(orig.schema).csv(dir)
    assert(back.collect().map(_.toString).sorted
      .sameElements(orig.collect().map(_.toString).sorted))
  }

  test("json round-trip preserves data and types") {
    val orig = Tables(spark, sfDir, "region")
    val dir = tmp() + "/region_json"
    orig.write.json(dir)
    val back = spark.read.schema(orig.schema).json(dir)
    assert(back.collect().map(_.toString).sorted
      .sameElements(orig.collect().map(_.toString).sorted))
  }

  test("json source infers schema from API-payload-shaped records") {
    val dir = tmp() + "/payload"
    val payload = Seq(
      """{"profile":"p1","rows":3,"metrics":{"sessions":10,"users":7}}""",
      """{"profile":"p2","rows":5,"metrics":{"sessions":20,"users":9}}""")
    import spark.implicits._
    payload.toDF("value").coalesce(1).write.text(dir)
    val df = spark.read.json(dir)
    assert(df.schema.fieldNames.toSet == Set("profile", "rows", "metrics"))
    val sessions = df.select(col("metrics.sessions")).collect()
      .map(_.getLong(0)).sorted
    assert(sessions.sameElements(Array(10L, 20L)))
  }

  test("parquet sink round-trip: the Verify dump format reads back exactly") {
    val orig = q("pricing_agg")
    val dir = tmp() + "/pricing"
    orig.coalesce(1).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet read widens nullability; names + types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      orig.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(_.toString).sorted
      .sameElements(orig.collect().map(_.toString).sorted))
  }

  test("orc round-trip preserves data and pushes predicates") {
    val orig = Tables(spark, sfDir, "orders")
    val dir = tmp() + "/orders_orc"
    orig.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == orig.count())
    val filtered = back.filter(col("o_totalprice") > 300000.0)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"orc pushdown missing:\n${plan.take(600)}")
    assert(filtered.count() ==
      orig.filter(col("o_totalprice") > 300000.0).count())
  }

  test("props JSON column: from_json -> MapType -> explode") {
    val ev = Tables.events(spark, sfDir)
    val m = ev.withColumn("m",
      from_json(col("props"), MapType(StringType, IntegerType)))
      .select(col("event_id"), explode(col("m")).as(Seq("k", "v")))
    val rows = m.collect()
    assert(rows.length == ev.count())
    assert(rows.forall(_.getString(1) == "k"))
    // values agree with get_json_object path (the declared json_funcs op)
    val viaGet = ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("v"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r => assert(viaGet(r.getLong(0)) == r.getInt(2)))
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp() + "/orders_part"
    Tables(spark, sfDir, "orders")
      .withColumn("year", year(col("o_orderdate")))
      .write.partitionBy("year").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("year") === 1996)
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(year"),
      s"partition pruning missing:\n${plan.take(600)}")
  }
}
