package graft

import graft.ext.RewriteDotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RewriteDotProduct optimizer rule: the lambda dot-product tree is
  * replaced by the native dot_f in the optimized plan, results are
  * identical (including null/length edge cases), and non-matching
  * trees are left untouched.
  */
class RewriteRuleSpec extends AnyFunSuite {
  import SparkFixture._

  private val lambdaDot =
    """aggregate(
         zip_with(embedding, t_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
  }

  private def scored = {
    val emb = Tables(spark, sfDir, "embeddings")
    val t = emb.filter(col("vec_id") === 0).select(col("embedding").as("t_emb"))
    emb.crossJoin(broadcast(t))
      .select(col("vec_id"), expr(lambdaDot).as("s"))
  }

  test("rule rewrites the lambda tree to dot_f in the optimized plan") {
    withRule {
      val df = scored
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_f"), optimized.take(800))
      assert(!optimized.contains("aggregate("), optimized.take(800))
    }
    // the rule is also injected session-wide via GraftExtensions, so
    // the plain session rewrites too — assert that path as well
    val plain = scored.queryExecution.optimizedPlan.toString
    assert(plain.contains("dot_f"))
  }

  test("rewritten query returns identical results") {
    val without = scored.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val withR = withRule(scored.collect())
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(without == withR)
  }

  test("null and length edge cases agree under the rewrite") {
    import spark.implicits._
    val edge = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),   // normal
      (2L, Seq(1.0f), Seq(3.0f, 4.0f)),         // length mismatch
      (3L, Seq.empty[Float], Seq.empty[Float])  // empty
    ).toDF("id", "a", "b")
    val q = "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    def run() = edge.select(col("id"), expr(q).as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val plain = run()
    val rewritten = withRule(run())
    assert(plain == rewritten)
    assert(plain(1L).contains(11.0))
    assert(plain(2L).isEmpty)    // mismatch -> null in BOTH
    assert(plain(3L).contains(0.0))
  }

  test("non-dot-product aggregates are not rewritten") {
    withRule {
      // sum of squares of ONE array — shape differs, must not match
      val df = Tables(spark, sfDir, "embeddings").select(
        expr("""aggregate(embedding, CAST(0.0 AS DOUBLE),
                  (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))""")
          .as("ss"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("dot_f"), optimized.take(500))
      df.collect().foreach(r => assert(r.getDouble(0) >= 0.0))
    }
  }
}
