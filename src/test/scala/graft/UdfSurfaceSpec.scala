package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar UDF surface (SURVEY.md §2.13): `udf()` works for
  * prototyping, with the documented caveats — it is a codegen black
  * box (no pushdown through it) which is why production paths use
  * native expressions; this spec pins the surface and the caveat.
  */
class UdfSurfaceSpec extends AnyFunSuite {
  import SparkFixture._

  test("scalar udf registers and computes") {
    val tier = udf((price: Double) =>
      if (price > 300000) "high" else if (price > 100000) "mid" else "low")
    spark.udf.register("price_tier", tier)
    val viaApi = Tables(spark, sfDir, "orders")
      .select(tier(col("o_totalprice")).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Tables(spark, sfDir, "orders").createOrReplaceTempView("orders_udf")
    val viaSql = spark.sql(
      "SELECT price_tier(o_totalprice) AS t, COUNT(*) AS c FROM orders_udf GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaApi == viaSql)
    val native = Tables(spark, sfDir, "orders")
      .select(when(col("o_totalprice") > 300000, "high")
        .when(col("o_totalprice") > 100000, "mid").otherwise("low").as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaApi == native)
  }

  test("udf blocks pushdown; the native expression does not (the caveat)") {
    val isCheap = udf((price: Double) => price < 1000.0)
    val viaUdf = Tables(spark, sfDir, "orders").filter(isCheap(col("o_totalprice")))
    viaUdf.collect()
    def pushed(plan: String): String =
      "PushedFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).mkString(";")
    val udfPushed = pushed(viaUdf.queryExecution.executedPlan.toString)
    assert(!udfPushed.contains("o_totalprice"),
      s"udf filter must not reach parquet: $udfPushed")
    val viaNative = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") < 1000.0)
    viaNative.collect()
    val nativePushed = pushed(viaNative.queryExecution.executedPlan.toString)
    assert(nativePushed.contains("o_totalprice"))
    assert(viaUdf.count() == viaNative.count())
  }
}
