package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the CurationOps module that the DuckDB
  * oracle cannot express: packing-capacity invariants, sampling
  * determinism/subset-ness, redaction completeness, cluster-retention
  * consistency, and the broadcast plan shape of the contamination
  * join (the 100 TB-critical property: the train side must never
  * shuffle on the benchmark gram set).
  */
class CurationSpec extends AnyFunSuite {
  import SparkFixture._

  test("redact_terms leaves no denylist token in the redacted text") {
    val bad = q("redact_terms")
      .filter(col("redacted").rlike("""\b(customer|vector|key)\b"""))
      .count()
    assert(bad == 0)
    // and hit counts reconcile: n_hits = token delta between texts
    val mismatch = q("redact_terms")
      .withColumn("n_red",
        size(split(col("redacted"), " ")) -
          size(array_remove(split(col("redacted"), " "), "[REDACTED]")))
      .filter(col("n_red") =!= col("n_hits"))
      .count()
    assert(mismatch == 0)
  }

  test("rep_ratio ratios are all within [0, 1]") {
    val out = q("rep_ratio")
    val offenders = out.filter(
      col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1 ||
        col("dup_bigram_ratio") < 0 || col("dup_bigram_ratio") > 1 ||
        col("top1_ratio") <= 0 || col("top1_ratio") > 1).count()
    assert(offenders == 0)
  }

  test("sample_stratified is deterministic and a subset of the corpus") {
    val a = q("sample_stratified").collect().map(_.getLong(0)).sorted
    val b = q("sample_stratified").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "two runs sampled different docs")
    val ids = Tables(spark, sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a.forall(ids.contains), "sampled a doc_id not in the corpus")
  }

  test("pack_sequences: bins are contiguous per stratum and respect " +
    "capacity up to one straddling document") {
    val rows = q("pack_sequences").collect()
    val cap = 512
    val maxDoc = Tables(spark, sfDir, "documents")
      .select(max(size(split(col("text"), " ")))).head().getInt(0)
    rows.foreach { r =>
      val tot = r.getAs[Long]("tot_tokens")
      assert(tot <= cap + maxDoc,
        s"bin ${r.getAs[Long]("bin_id")} holds $tot tokens " +
          s"(cap $cap + max doc $maxDoc)")
    }
    // bin ids per (lang, shard) stratum are exactly 0..max with no gaps
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case (stratum, rs) =>
        val bins = rs.map(_.getAs[Long]("bin_id")).sorted
        assert(bins.sameElements(bins.indices.map(_.toLong)),
          s"$stratum bins not contiguous: ${bins.mkString(",")}")
      }
    // every doc is packed exactly once
    val packed = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(packed == nDocs)
  }

  test("dedup_keep_best: every doc is in exactly one cluster and the " +
    "kept doc has the cluster's max quality") {
    val out = q("dedup_keep_best").collect()
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(out.map(_.getAs[Long]("n_members")).sum == nDocs)
    out.foreach { r =>
      assert(r.getAs[Double]("best_quality") >= 0.0)
      assert(r.getAs[Long]("keep_id") >= r.getAs[Long]("cluster_id"),
        "cluster_id is the min member id; keep_id cannot be below it")
    }
  }

  test("contamination joins the eval gram set via broadcast " +
    "(train side never shuffled on grams)") {
    val df = q("contamination")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("domain_cap equals an independent per-source top-20 and never " +
    "exceeds the cap") {
    val docs = Tables(spark, sfDir01, "documents")
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
    val expected = docs.groupBy(_.getAs[String]("source"))
      .values.flatMap { rows =>
        rows.sortBy(r =>
          (-r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
          .take(20).map(_.getAs[Long]("doc_id")).toSeq
      }.toSet
    val df = q("domain_cap", sfDir01)
    val out = df.collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expected)
    val perSource = out.groupBy(_.getAs[String]("source")).values
    assert(perSource.forall(_.length <= 20))
    // with GraftExtensions loaded (SparkFixture session), the
    // row_number idiom plans as the bounded-heap TopKPerKeyExec
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      df.queryExecution.executedPlan.toString.take(800))
  }

  test("mix_temperature boosts small sources: quotas recompute exactly, " +
    "every source keeps at least one row, rates fall with size") {
    val rows = q("mix_temperature", sfDir01).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("quota"),
        r.getAs[Long]("rate_ppm"), r.getAs[Long]("n_kept")))
    // exact independent recompute of the integer quota arithmetic:
    // w = floor(sqrt(n)*1000), quota = max(1, floor(300*w / tot_w)),
    // rate = min(1e6, floor(quota*1e6 / n)) — the strongest property
    // that is implied for EVERY dataset, unlike pairwise rate
    // monotonicity, which integer flooring can break near quota
    // boundaries (only the unfloored rates are exactly monotone)
    def w(n: Long): Long = math.floor(math.sqrt(n.toDouble) * 1000).toLong
    val totW = rows.map { case (n, _, _, _) => w(n) }.sum
    rows.foreach { case (n, q0, rate, kept) =>
      val expQ = math.max(1L, 300L * w(n) / totW)
      assert(q0 == expQ, s"quota $q0 != recomputed $expQ for n=$n")
      assert(rate == math.min(1000000L, expQ * 1000000L / n))
      // min-quota guarantee: the floor never silently drops a source
      assert(q0 >= 1)
      assert(kept <= n)
    }
    // natural quotas fit the budget; the min-1 bump adds at most one
    // row per floored-to-zero source
    assert(rows.map(_._2).sum <= 300 + rows.length)
    // temperature scaling, asserted where flooring cannot flip it:
    // at a >= 2x size gap the sqrt-boost dominates the +-1 floor noise
    for {
      (n1, _, r1, _) <- rows; (n2, _, r2, _) <- rows
      if n1 * 2 <= n2
    } assert(r1 >= r2, s"source of $n1 docs sampled at $r1 ppm < $r2 " +
      s"ppm of a $n2-doc source")
  }

  test("shuffle_shard is a permutation: every doc appears once, " +
    "positions are dense 1..n per shard, shard matches the hash") {
    val out = q("shuffle_shard", sfDir01).collect()
    val nDocs = Tables(spark, sfDir01, "documents").count()
    assert(out.length == nDocs)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
    out.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      val pos = rows.map(_.getAs[Int]("pos")).sorted
      assert(pos.sameElements(1 to rows.length), "positions not dense")
    }
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expShard = java.lang.Math.floorMod((id % 100000L) * 2654435761L, 8L)
      assert(r.getAs[Int]("shard") == expShard)
    }
  }

  test("dedup_append: incrementally merged index equals the one-shot " +
      "full-corpus dedup, across base-batch and within-batch groups") {
    import spark.implicits._
    // ids 1..30: batch = the 10 newest (21..30). Dup groups planted
    // across the base/batch boundary (21 clones 3 -> keeper 3) and
    // entirely within the batch (22/23 share text -> keeper 22).
    val docs = ((1 to 20).map(i => (i.toLong, s"base text $i")) ++
      Seq((21L, "base text 3"), (22L, "fresh dup"), (23L, "fresh dup")) ++
      (24 to 30).map(i => (i.toLong, s"new text $i"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedup_append").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = text.CurationOps.dedupAppend.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val expect = docs.withColumn("h", md5(col("text")))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expect)
    assert(got.size == 28) // 30 docs, 2 of them clone earlier texts
    val dups = got.filter(_._3 >= 2)
    assert(dups.size == 2)
    assert(dups.exists { case (_, k, n) => k == 3L && n == 2L })
    assert(dups.exists { case (_, k, n) => k == 22L && n == 2L })
    // fixture corpus: the incremental path reproduces the one-shot
    // index there too
    val fix = q("dedup_append", sfDir01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fixExpect = Tables(spark, sfDir01, "documents")
      .withColumn("h", md5(col("text")))
      .groupBy("h")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(fix == fixExpect)
  }

  test("gopher_filter: keep is exactly the rule conjunction, every " +
      "rule discriminates, and flags reconcile with a HOF recompute") {
    val out = q("gopher_filter").cache()
    try {
      // keep = AND of the five rules, row by row
      val bad = out.filter(col("keep") =!=
        (col("r_len") && col("r_wordlen") && col("r_stop") &&
          col("r_dom") && col("r_distinct"))).count()
      assert(bad == 0)
      // the fixture thresholds are live: every rule passes AND fails
      // at least one real document (an all-pass rule tests nothing)
      for (r <- Seq("r_len", "r_wordlen", "r_stop", "r_dom",
          "r_distinct")) {
        assert(out.filter(col(r)).count() > 0, s"$r never passes")
        assert(out.filter(!col(r)).count() > 0, s"$r never fails")
      }
      assert(out.filter(col("keep")).count() > 0)
      assert(out.filter(!col("keep")).count() > 0)
      // rep_stats-derived flags reconcile with an independent HOF
      // formulation (distinct ratio + stopword count)
      val hof = Tables(spark, sfDir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          (expr("size(array_distinct(toks))").cast("double") /
            expr("size(toks)") >= 0.4).as("e_distinct"),
          (expr("size(filter(toks, x -> x = 'the' or x = 'a'))")
            .cast("double") / expr("size(toks)") >= 0.02).as("e_stop"))
      val mismatch = out.join(hof, "doc_id")
        .filter(col("r_distinct") =!= col("e_distinct") ||
          col("r_stop") =!= col("e_stop")).count()
      assert(mismatch == 0)
    } finally out.unpersist()
  }

  test("epoch_plan: weights sum to ~1, epochs inversely order with " +
      "size, and target tokens reproduce budget * weight") {
    val rows = q("epoch_plan").collect()
    assert(rows.length > 1) // one row per source
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    // τ=0.5 up-weights small sources: the smallest source must have
    // strictly more epochs than the largest
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Double]("epochs") >
      bySize.last.getAs[Double]("epochs"))
    // budget identity: Σ target_tokens ≈ 2 · Σ n_tokens
    val corpus = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val tsum = rows.map(_.getAs[Double]("target_tokens")).sum
    assert(math.abs(tsum - 2.0 * corpus) / (2.0 * corpus) < 1e-3)
    // and each row: epochs = target / own tokens (to rounding)
    rows.foreach { r =>
      val e = r.getAs[Double]("target_tokens") /
        r.getAs[Long]("n_tokens")
      assert(math.abs(e - r.getAs[Double]("epochs")) < 1e-3)
    }
  }

  test("curation_funnel: stages reconcile with the declared kernels " +
      "they reuse, and attrition is monotone") {
    val rows = q("curation_funnel").collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(rows.keySet ==
      Set("raw", "quality", "dedup_exact", "dedup_near"))
    // monotone non-increasing docs and tokens through the pipeline
    val order = Seq("raw", "quality", "dedup_exact", "dedup_near")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b)._1 <= rows(a)._1, s"$b docs grew over $a")
      assert(rows(b)._2 <= rows(a)._2, s"$b tokens grew over $a")
    }
    // raw equals the corpus totals
    val docs = Tables(spark, sfDir, "documents")
    assert(rows("raw")._1 == docs.count())
    val rawToks = docs
      .agg(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows("raw")._2 == rawToks)
    // quality stage equals gopher_filter's keep count + token sum
    val g = q("gopher_filter").filter(col("keep"))
      .agg(count(lit(1)), sum(col("n_tokens"))).head
    assert(rows("quality")._1 == g.getLong(0))
    assert(rows("quality")._2 == g.getLong(1))
    assert(rows("quality")._1 < rows("raw")._1) // the gate is live
    // near-dup drops exist at the fixture SF (planted near-dups
    // survive the quality battery)
    assert(rows("dedup_near")._1 < rows("dedup_exact")._1)
  }

  test("dedup_append degrades to a batch-only index when the corpus " +
      "is no larger than the ingest batch") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tiny_dedup").toString
    Seq((1L, "t1"), (2L, "t1"), (3L, "t2"), (4L, "t3"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = text.CurationOps.dedupAppend.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // == the one-shot md5 rollup (the op's own oracle shape)
    val want = Seq((1L, "t1"), (2L, "t1"), (3L, "t2"), (4L, "t3"))
      .toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
    assert(got.size == 3 && got.exists(_._3 == 2L))
  }

  test("dataset_card: one row per source; totals reconcile with the " +
      "corpus and gopher_filter; ratios internally consistent") {
    val rows = q("dataset_card").collect()
    val docs = Tables(spark, sfDir, "documents")
    assert(rows.length ==
      docs.select("source").distinct().count().toInt)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val rawToks = docs
      .agg(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == rawToks)
    // quality_rate aggregates to gopher_filter's corpus keep count
    val kept = q("gopher_filter").filter(col("keep")).count()
    val keptFromCard = rows.map(r =>
      math.round(r.getAs[Double]("quality_rate") *
        r.getAs[Long]("n_docs"))).sum
    assert(keptFromCard == kept)
    rows.foreach { r =>
      val mt = r.getAs[Double]("mean_tokens")
      assert(math.abs(mt - r.getAs[Long]("n_tokens").toDouble /
        r.getAs[Long]("n_docs")) < 0.005)
      val dr = r.getAs[Double]("dup_rate")
      assert(dr >= 0.0 && dr < 1.0)
      assert(r.getAs[Long]("n_langs") >= 1L)
    }
  }

  test("weighted_sample: A-Res selection is length-biased, " +
      "deterministic, and plans as TakeOrderedAndProject") {
    val sel = q("weighted_sample")
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-M must avoid a global sort:\n" + plan.take(800))
    // the scan must prune to (doc_id, n_chars): reading `text` for a
    // sample keyed on id+length would drag the corpus's dominant
    // bytes through a scan that never uses them
    val read = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(read.contains("doc_id") && read.contains("n_chars")
      && !read.contains("text"),
      s"scan not pruned to (doc_id, n_chars): $read")
    val rows = sel.collect()
    assert(rows.length == 100)
    // skey = ln(u)/w is negative everywhere (u < 1, w > 0)
    rows.foreach(r => assert(r.getAs[Double]("skey") < 0.0))
    // weighted selection is biased toward heavy (long) docs: the
    // sample's mean weight must clearly exceed the corpus mean (the
    // fixture has 500 docs with ~4x weight spread; a uniform sample's
    // mean would match the corpus mean in expectation)
    val docs = Tables(spark, sfDir, "documents")
    val corpusMean = docs.agg(avg(col("n_chars") + lit(1.0)))
      .head.getDouble(0)
    val sampleMean = rows.map(_.getAs[Double]("w")).sum / rows.length
    assert(sampleMean > corpusMean * 1.1,
      s"no length bias: sample $sampleMean vs corpus $corpusMean")
    // membership is a pure function of doc_id: a re-run is identical
    val again = q("weighted_sample").collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("gopher_ablation reconciles with gopher_filter: n_only sums " +
      "to single-rule failures, n_fail to per-rule failures") {
    val ab = q("gopher_ablation").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ab.keySet ==
      Set("len", "wordlen", "stop", "dom", "distinct"))
    val gf = q("gopher_filter")
    val ruleCol = Map("len" -> "r_len", "wordlen" -> "r_wordlen",
      "stop" -> "r_stop", "dom" -> "r_dom",
      "distinct" -> "r_distinct")
    val nFails = ruleCol.values.map(c =>
      when(col(c), 0).otherwise(1): org.apache.spark.sql.Column)
      .reduce(_ + _)
    for ((rule, c) <- ruleCol) {
      assert(ab(rule)._1 == gf.filter(!col(c)).count(),
        s"$rule n_fail")
      assert(ab(rule)._2 ==
        gf.withColumn("nf", nFails)
          .filter(!col(c) && col("nf") === 1).count(),
        s"$rule n_only")
      assert(ab(rule)._2 <= ab(rule)._1)
    }
    // marginal failures are disjoint across rules: the sum of n_only
    // equals the count of docs failing exactly one rule
    val oneRule = gf.withColumn("nf", nFails)
      .filter(col("nf") === 1).count()
    assert(ab.values.map(_._2).sum == oneRule)
  }
}
