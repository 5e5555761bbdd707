package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-recomputation checks for the round-8 additions, beyond
  * the DuckDB oracles: brute-force Scala recomputation on the small
  * fixture and the conservation laws each op's contract promises.
  */
class Round8OpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("entropy_filter matches a direct Scala recomputation per doc") {
    val out = q("entropy_filter").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.filter(_._2.nonEmpty).keySet)
    for ((id, text) <- docs if text.nonEmpty) {
      val n = text.length.toDouble
      val h = -text.groupBy(identity).values
        .map(g => g.length / n * math.log(g.length / n)).sum
      val hr = BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(math.abs(out(id)._1 - hr) < 1e-9, s"doc $id entropy")
      assert(out(id)._2 == (if (hr >= 2.0) 1 else 0), s"doc $id keep")
    }
  }

  test("cooccur_topk matches a brute-force window-pair count") {
    val out = q("cooccur_topk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val texts = Tables(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    for (t <- texts; toks = t.split(" ", -1); i <- toks.indices;
         k <- 1 to 3 if i + k < toks.length)
      counts((toks(i), toks(i + k))) += 1
    val expected = counts.toSeq
      .map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }
      .take(20)
    assert(out.toSeq == expected)
  }

  test("compaction_plan conserves rows and sizes files to the target") {
    val rows = q("compaction_plan").collect()
    val total = Tables(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == total, "row conservation")
    for (r <- rows) {
      val (n, bytes, files, rpf) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bytes == n * 96, s"${r.getString(0)} bytes")
      assert(files >= 1 && (files - 1) * 65536 < bytes &&
        bytes <= files * 65536, s"${r.getString(0)} file count")
      // planned layout covers every row without exceeding ceil
      assert(rpf * files >= n && (rpf - 1) * files < n,
        s"${r.getString(0)} rows/file")
    }
  }
}
