package graft

import graft.ext.BloomUtil
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter build/probe tests: the no-false-negative contract
  * (what makes the prefilter semantically invisible), false-positive
  * sanity, and bitwise merge invariance under repartitioning (OR is
  * commutative — the filter is identical however partials arrive).
  */
class BloomSpec extends AnyFunSuite {
  import SparkFixture._

  private def buildBloom(parts: Int): Array[Byte] = {
    Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))
      .repartition(parts)
      .createOrReplaceTempView("bloom_keys")
    spark.sql("SELECT bloom_agg(o_orderkey) FROM bloom_keys")
      .collect().head.getAs[Array[Byte]](0)
  }

  test("bloom has no false negatives over the build keys") {
    val bloom = buildBloom(4)
    val keys = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(keys.nonEmpty)
    keys.foreach(k => assert(BloomUtil.mightContain(bloom, k),
      s"member key $k reported absent"))
  }

  test("bloom false-positive rate is sane at fixture scale") {
    val bloom = buildBloom(4)
    val members = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    // probe 100k keys far outside the build domain
    val probes = (1L to 100000L).map(_ + 1000000000L)
      .filterNot(members)
    val fp = probes.count(BloomUtil.mightContain(bloom, _))
    val rate = fp.toDouble / probes.size
    assert(rate < 0.01, s"fpp $rate too high for ~300 keys in 2^20 bits")
  }

  test("bloom bytes are invariant under repartitioning (OR-merge)") {
    val b1 = buildBloom(1)
    val b7 = buildBloom(7)
    val b32 = buildBloom(32)
    assert(java.util.Arrays.equals(b1, b7) &&
      java.util.Arrays.equals(b7, b32),
      "bitwise-OR merge must be partitioning-invariant")
  }

  test("bloom_contains probe agrees with exact semi-join") {
    val dims = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))
    val bloom = dims.agg(expr("bloom_agg(o_orderkey)").as("bf"))
    val li = Tables(spark, sfDir, "lineitem")
    val prefiltered = li.crossJoin(broadcast(bloom))
      .filter(expr("bloom_contains(bf, l_orderkey)"))
      .join(dims, col("l_orderkey") === dims("o_orderkey"), "left_semi")
      .count()
    val exact = li
      .join(dims, col("l_orderkey") === dims("o_orderkey"), "left_semi")
      .count()
    assert(prefiltered == exact,
      s"bloom prefilter changed the answer: $prefiltered vs $exact")
  }
}
