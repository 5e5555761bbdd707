package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.scalatest.funsuite.AnyFunSuite

/** Recall of the bucketed ANN paths against exact brute force — the
  * number a user needs before trusting `ann_bucket_topk`/`ivf_topk`
  * at scale (VERDICT r6 missing item 4). The declared ops fix one
  * target (vec_id=0); here the SAME bucketing/probing parameters are
  * evaluated as recall@10 averaged over a 50-query panel, plus the
  * recall-vs-probe-count curve that tells a user which probe budget
  * buys which recall.
  *
  * Measured (sf0.1 = 2k natural vectors; sf1 = 20k clone-replicated;
  * recorded in SCALE.md):
  *   sign-bucket 1-probe   0.136 @ sf0.1   (0.916 @ sf1)
  *   sign-bucket 5-probe   0.538 @ sf0.1   (Hamming<=1 multiprobe)
  *   IVF nprobe 1/2/4/8    0.432 / 0.514 / 0.650 / 0.830 @ sf0.1
  * Two structural lessons the numbers make concrete:
  * (1) single-probe 4-bit sign bucketing is a NEAR-DUP blocking key
  *     (true near-identical pairs agree on signs with high prob — cf.
  *     0.92 at sf1 where exact top-10 are the query's clones), not a
  *     general top-k structure;
  * (2) IVF recall is bought with nprobe — the scan fraction is
  *     nprobe/nlist, so 0.83 recall costs reading half the lists at
  *     nlist=16. At 100 TB one scales nlist with the data and keeps
  *     nprobe/nlist small; the curve shape is what transfers.
  * The asserted floors leave no margin for semantics changes: the
  * fixtures are deterministic, so a drop means bucketing/probing
  * logic changed.
  */
class AnnRecallSpec extends AnyFunSuite {
  import SparkFixture._

  private val K = 10
  private val NQueries = 50
  private val Nprobes = Seq(1, 2, 4, 8)

  private def dot(a: String, b: String) = expr(s"dot_f($a, $b)")

  private def signBucket(c: String, bits: Int = 4) =
    (0 until bits).map { i =>
      when(element_at(col(c), i + 1) > 0.0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** top-K (q_id, vec_id) pairs from a scored candidate set */
  private def topK(cands: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"))
  }

  private def recallOf(approx: DataFrame, exact: DataFrame): Double = {
    val hits = approx.join(exact, Seq("q_id", "vec_id")).count()
    hits.toDouble / (NQueries.toDouble * K)
  }

  /** (bucket 1-probe, bucket Hamming<=1 multiprobe, ivf by nprobe) */
  private def measure(dir: String): (Double, Double, Map[Int, Double]) = {
    graft.ext.GraftFunctions.register(spark)
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("bucket", signBucket("embedding"))
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))

    val exact = topK(emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", round(dot("embedding", "q_emb"), 4)))
      .cache()

    // same pruning as ann_bucket_topk: candidates share the query's
    // 4-bit sign bucket
    val bucketed = topK(emb.join(broadcast(queries),
        col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", round(dot("embedding", "q_emb"), 4)))

    // multiprobe: also search the 4 buckets at Hamming distance 1
    // (flip one sign bit) — 5 of 16 buckets per query
    val probeBuckets = queries.select(col("q_id"), col("q_emb"),
      explode(array((lit(0) +: (0 until 4).map(b => lit(1 << b))): _*))
        .as("flip"),
      col("q_bucket"))
      .select(col("q_id"), col("q_emb"),
        expr("q_bucket ^ flip").as("probe_bucket"))
    val multiprobe = topK(emb.join(broadcast(probeBuckets),
        col("bucket") === col("probe_bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", round(dot("embedding", "q_emb"), 4)))

    // same inverted lists as ivf_topk (nlist=16 seed centroids),
    // swept over the probe budget
    val centroids = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_score").desc, col("c_id"))
    val assigned = emb.crossJoin(broadcast(centroids))
      .withColumn("c_score", round(dot("embedding", "c_emb"), 4))
      .withColumn("c_rn", row_number().over(wAssign))
      .filter(col("c_rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id"))
      .cache()
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("c_score").desc, col("c_id"))
    val rankedProbes = queries.crossJoin(broadcast(centroids))
      .withColumn("c_score", round(dot("q_emb", "c_emb"), 4))
      .withColumn("p_rn", row_number().over(wProbe))
      .select(col("q_id"), col("c_id"), col("p_rn"))
      .cache()
    val ivfByProbe = Nprobes.map { np =>
      val probes = rankedProbes.filter(col("p_rn") <= np)
        .select(col("q_id"), col("c_id"))
      val ivf = topK(assigned.join(broadcast(probes), "c_id")
        .join(broadcast(queries.select(col("q_id"), col("q_emb"))), "q_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("score", round(dot("embedding", "q_emb"), 4)))
      np -> recallOf(ivf, exact)
    }.toMap

    val res = (recallOf(bucketed, exact), recallOf(multiprobe, exact),
      ivfByProbe)
    exact.unpersist(); assigned.unpersist(); rankedProbes.unpersist()
    res
  }

  test("recall@10 at sf0.1: floors hold, probes buy recall monotonically") {
    val (b1, bMulti, ivf) = measure("/root/testdata/sf0.1")
    val curve = Nprobes.map(np => f"$np->${ivf(np)}%.3f").mkString(" ")
    info(f"sf0.1 bucket1=$b1%.3f multi=$bMulti%.3f ivf: $curve")
    println(f"[ann-recall] sf0.1 bucket1=$b1%.4f multi=$bMulti%.4f " +
      Nprobes.map(np => f"ivf$np=${ivf(np)}%.4f").mkString(" "))
    // floors from the measured run (deterministic fixtures)
    assert(b1 >= 0.13, f"bucket 1-probe recall $b1%.3f")
    assert(bMulti >= b1, "multiprobe must not lose recall vs 1-probe")
    assert(Nprobes.sliding(2).forall(w => ivf(w(0)) <= ivf(w(1))),
      s"ivf recall must be monotone in nprobe: $curve")
    assert(ivf(2) >= 0.50, f"ivf nprobe=2 recall ${ivf(2)}%.3f")
    assert(ivf(8) >= 0.82, f"ivf nprobe=8 recall ${ivf(8)}%.3f")
  }

  test("one Lloyd round: trained centroids vs first-16 seeds, " +
      "recall@10 over the query panel (nprobe=2)") {
    graft.ext.GraftFunctions.register(spark)
    val emb = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = topK(emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", round(dot("embedding", "q_emb"), 4)))
      .cache()
    // generic IVF recall under a centroid table whose vector column
    // `centCol` may be float (seeds) or double (trained)
    def ivfRecall(cents: DataFrame, score: String => Column,
        np: Int): Double = {
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("c_score", round(score("embedding"), 4))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("c_id"), col("embedding")),
          struct(col("c_score"), -col("c_id"))).as("m"))
        .select(col("vec_id"), col("m.embedding").as("embedding"),
          col("m.c_id").as("c_id"))
      val wProbe = Window.partitionBy(col("q_id"))
        .orderBy(col("c_score").desc, col("c_id"))
      val probes = queries.crossJoin(broadcast(cents))
        .withColumn("c_score", round(score("q_emb"), 4))
        .withColumn("p_rn", row_number().over(wProbe))
        .filter(col("p_rn") <= np)
        .select(col("q_id"), col("c_id"))
      val ivf = topK(assigned.join(broadcast(probes), "c_id")
        .join(broadcast(queries), "q_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("score", round(dot("embedding", "q_emb"), 4)))
      recallOf(ivf, exact)
    }
    val seedCents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("cent"))
    val seedScore = (v: String) => expr(s"dot_f($v, cent)")
    val trainedScore = (v: String) => expr(
      s"aggregate(zip_with(cast($v as array<double>), cent," +
        " (x, y) -> x * y), 0D, (a, x) -> a + x)")
    val rSeed = ivfRecall(seedCents, seedScore, 2)
    val rSeed8 = ivfRecall(seedCents, seedScore, 8)
    // the rounds curve the declared LloydRounds cap was chosen from:
    // recall@10 per refinement round at both probe budgets
    val rounds = 1 to 5
    val byRound = rounds.map { r =>
      val cents = vec.VectorOps.lloydRefine(emb, 16, r).cache()
      val np2 = ivfRecall(cents, trainedScore, 2)
      val np8 = ivfRecall(cents, trainedScore, 8)
      cents.unpersist()
      r -> (np2, np8)
    }.toMap
    val curve2 = rounds.map(r => f"$r->${byRound(r)._1}%.3f").mkString(" ")
    val curve8 = rounds.map(r => f"$r->${byRound(r)._2}%.3f").mkString(" ")
    info(f"sf0.1 nprobe=2 seed=$rSeed%.3f rounds: $curve2")
    info(f"sf0.1 nprobe=8 seed=$rSeed8%.3f rounds: $curve8")
    println(f"[ann-recall] sf0.1 lloyd-rounds np2 seed=$rSeed%.4f " +
      curve2 + f" | np8 seed=$rSeed8%.4f " + curve8)
    exact.unpersist()
    val declared = byRound(vec.VectorOps.LloydRounds)
    // more training must not make the index materially worse than one
    // round at the declared probe budget, and never worse than the
    // untrained seeds
    assert(declared._1 >= byRound(1)._1 - 0.02,
      f"rounds=${vec.VectorOps.LloydRounds} dropped recall vs 1: $curve2")
    assert(declared._1 >= rSeed - 0.02,
      f"training dropped recall vs seeds: seed=$rSeed%.3f $curve2")
    assert(declared._2 >= declared._1, "recall must be monotone in nprobe")
  }

  test("recall@10 holds at the synthesized sf1 (10x vectors)") {
    val dir = "/tmp/sf1"
    assume(new java.io.File(dir + "/embeddings.parquet").exists(),
      "synthesized sf1 not present")
    val (b1, bMulti, ivf) = measure(dir)
    val curve = Nprobes.map(np => f"$np->${ivf(np)}%.3f").mkString(" ")
    info(f"sf1 bucket1=$b1%.3f multi=$bMulti%.3f ivf: $curve")
    println(f"[ann-recall] sf1 bucket1=$b1%.4f multi=$bMulti%.4f " +
      Nprobes.map(np => f"ivf$np=${ivf(np)}%.4f").mkString(" "))
    // clone replication puts each query's exact top-10 in its own
    // bucket/list: near-dup recall is HIGH here by construction —
    // that contrast (vs sf0.1's 0.14) is itself the documented lesson
    assert(b1 >= 0.85, f"bucket 1-probe recall $b1%.3f")
    assert(ivf(2) >= 0.85, f"ivf nprobe=2 recall ${ivf(2)}%.3f")
  }
}
