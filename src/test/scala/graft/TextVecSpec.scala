package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LLM-pipeline operator tests (SURVEY.md §2.11, §5.2 item 4):
  * dedup properties, brute-force-vs-derived similarity equalities,
  * ANN recall against the exact reference, text-metric sanity.
  */
class TextVecSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val docs = Tables(spark, sfDir, "documents")
  private lazy val emb = Tables(spark, sfDir, "embeddings")

  test("dedup_exact: groups partition the corpus; all texts distinct at sf0.001") {
    val rows = q("dedup_exact").collect()
    assert(rows.map(_.getLong(2)).sum == docs.count())
    // FIXTURES.md: all 500 sf0.001 texts are distinct
    assert(rows.forall(_.getLong(2) == 1L))
    assert(rows.length == docs.count().toInt)
  }

  test("neardup_cluster: transitive chain A~B~C lands in one cluster") {
    // A and C share no trigram, but both chain through B: jaccard
    // (A,B) = (B,C) = 4/16 = 0.25 >= 0.2, (A,C) = 0 — only the
    // transitive closure puts all three in cluster min(doc_id)=1
    import spark.implicits._
    val w = (1 to 24).map(i => s"w$i")
    val a = w.slice(0, 12).mkString(" ")
    val b = (w.slice(6, 12) ++ w.slice(12, 18)).mkString(" ")
    val c = (w.slice(12, 18) ++ w.slice(18, 24)).mkString(" ")
    val lone = "x1 x2 x3 x4"
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cc").toString
    Seq((1L, a), (2L, b), (3L, c), (9L, lone))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.SimilarityOps.neardupCluster.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("neardup_cluster: every jaccard pair shares a cluster; labels are component minima") {
    val labels = q("neardup_cluster")
    val pairs = q("ngram_jaccard")
    val la = labels.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca"))
    val lb = labels.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb"))
    assert(pairs.join(la, "doc_a").join(lb, "doc_b")
      .filter(col("ca") =!= col("cb")).count() == 0)
    // cluster ids are members of their own cluster and are minima
    assert(labels.filter(col("cluster_id") > col("doc_id")).count() == 0)
    val reps = labels.select(col("cluster_id").as("rep")).distinct()
    assert(labels.join(reps, col("doc_id") === col("rep"), "left_semi")
      .count() == reps.count())
  }

  test("dedup_exact is idempotent: re-dedup of keepers finds no dups") {
    val keep = q("dedup_exact").select(col("keep_id").as("doc_id"))
    val kept = docs.join(keep, "doc_id")
    val again = kept.withColumn("h", md5(col("text")))
      .groupBy("h").count().filter(col("count") > 1).count()
    assert(again == 0)
  }

  test("dedup_minhash finds planted exact duplicates") {
    // plant a duplicate pair by unioning doc 0 back with a new id
    val planted = docs.union(
      docs.filter(col("doc_id") === 0)
        .withColumn("doc_id", lit(999999L)))
    planted.createOrReplaceTempView("planted_docs")
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
    val words = new Tokenizer()
      .setInputCol("text").setOutputCol("words").transform(planted)
    val feat = new HashingTF()
      .setInputCol("words").setOutputCol("features")
      .setNumFeatures(1 << 16).setBinary(true).transform(words)
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L).fit(feat)
    val pairs = model.approxSimilarityJoin(feat, feat, 0.1, "dist")
      .filter(col("datasetA.doc_id") === 0 &&
        col("datasetB.doc_id") === 999999L)
    assert(pairs.count() == 1, "exact duplicate must always hash together")
  }

  test("vector_topk matches driver-side brute force") {
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val t = vecs(0L)
    def dotD(a: Array[Float]) =
      a.zip(t).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, BigDecimal(dotD(v)).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val got = q("vector_topk").select("vec_id").collect().map(_.getLong(0))
    assert(got.sameElements(expected))
  }

  test("ann_bucket_topk results are a subset of the target bucket, scored exactly") {
    val rows = q("ann_bucket_topk").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val buckets = rows.map(_.getInt(rows.head.fieldIndex("bucket"))).toSet
    assert(buckets.size == 1, "all candidates share the target's bucket")
    // every returned pair also appears in the exact top-k *of that bucket*
    val exactScores = q("vector_topk").collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("score"))).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val s = r.getDouble(r.fieldIndex("score"))
      exactScores.get(id).foreach(es => assert(math.abs(es - s) < 1e-9))
    }
  }

  test("cosine_neardup: symmetric threshold, i<j, agrees with vector_topk scores") {
    val rows = q("cosine_neardup").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("knn_label: predictions are valid labels with >=1 vote") {
    val rows = q("knn_label").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 9)
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 5L)
    }
  }

  test("quality_score: ratios in [0,1], token counts positive") {
    val rows = q("quality_score").collect()
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("n_tokens")) > 0)
      val q = r.getDouble(r.fieldIndex("quality"))
      assert(q >= 0.0 && q <= 1.0)
      val sr = r.getDouble(r.fieldIndex("stop_ratio"))
      assert(sr >= 0.0 && sr <= 1.0)
    }
  }

  test("doc_fingerprint: deterministic and order-sensitive") {
    val a = q("doc_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = q("doc_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sorted.sameElements(b.sorted))
    // identical texts share fingerprints; at sf0.001 all texts are
    // distinct so fingerprint collisions should be rare (< 1%)
    val fps = a.map(_._2)
    assert(fps.distinct.length >= (fps.length * 0.99).toInt)
  }

  test("tfidf_top: scores non-increasing, rare tokens outrank common ones") {
    val rows = q("tfidf_top").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("ivf_topk recall vs exhaustive top-10 (deterministic on the fixture)") {
    val exact = q("vector_topk").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val ivf = q("ivf_topk").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    // deterministic data + algorithm -> fixed recall; probing 2/16
    // lists must still find at least half the true neighbors here
    assert(recall >= 0.5, s"recall $recall")
    assert(ivf.size == 10)
  }

  test("bm25_top: 20 rows, scores non-increasing and positive") {
    val rows = q("bm25_top").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0))
  }

  test("dup_span_frac: fractions in [0,1]; exact clones fully duplicated") {
    val rows = q("dup_span_frac").collect()
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length == n)
    assert(rows.forall { r =>
      val f = r.getDouble(3); f >= 0.0 && f <= 1.0 })
    // every doc in an exact-dup group of >=2 with >=8 tokens must have
    // dup_frac == 1 (all of its spans exist verbatim elsewhere)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 8)
      .withColumn("h", md5(col("text")))
    val cloned = docs.groupBy("h").count().filter(col("count") >= 2)
      .join(docs, "h").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // sf0.001 may have no exact clones; the clause is exercised at
    // sf0.01+ where dedup_exact shows dup groups
    val fr = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cloned.forall(id => fr(id) == 1.0))
    // consistency: dup_frac > 0 iff some span is duplicated
    assert(rows.forall(r => (r.getLong(2) > 0) == (r.getDouble(3) > 0)))
  }

  test("dedup_spans: coverage bounded by doc length; clones fully covered; " +
      "unique-vocab doc untouched") {
    val rows = q("dedup_spans").collect()
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length == n)
    // covered_tokens in [0, n_tokens]; a nonzero coverage is at least
    // one full 8-gram span
    assert(rows.forall { r =>
      val cov = r.getLong(2)
      cov >= 0 && cov <= r.getLong(1) && (cov == 0 || cov >= 8)
    })
    // synthetic fixture: two exact clones are 100% covered, a doc on
    // a disjoint vocabulary is 0% covered, and a half-overlap doc
    // (first 8 tokens shared with the clones, rest unique) is covered
    // on exactly its shared span
    import spark.implicits._
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val half = ((1 to 8).map(i => s"s$i") ++
      (1 to 12).map(i => s"u$i")).mkString(" ")
    val lone = (1 to 20).map(i => s"z$i").mkString(" ")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spans").toString
    Seq((1L, shared), (2L, shared), (3L, half), (9L, lone))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.SimilarityOps.dedupSpans.run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) == (20L, 20L) && out(2L) == (20L, 20L))
    assert(out(3L) == (20L, 8L)) // only the one shared 8-gram span
    assert(out(9L) == (20L, 0L))
  }

  test("minhash_append: incremental at-ingest discovery equals the " +
      "one-shot pair kernel restricted to batch-involving pairs") {
    val got = q("minhash_append").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mx = docs.agg(max(col("doc_id"))).first().getLong(0)
    val full = q("minhash_det").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter { case (a, b, _) =>
      a > mx - 50 || b > mx - 50 }
    assert(got == expected)
    // and the base-base pairs the tick must NOT re-report exist
    assert(full.exists { case (a, b, _) => a <= mx - 50 && b <= mx - 50 })
    // clustered-commit regression guard (VERDICT r17 #2): every live
    // partition of every committed version holds EXACTLY ONE file —
    // the repartition(pb) before each write is what keeps commits
    // from fanning out #tasks files per dir (the measured 18.4 s
    // sf10m floor)
    val base = s"/tmp/graft_sim_minhash_append_" +
      s"${Integer.toHexString(sfDir.hashCode)}" +
      s"_p${ProcessHandle.current().pid()}"
    for (v <- sources.Snapshots.versions(spark, base)) {
      val pf = sources.Snapshots.partitionFiles(spark, base, v)
      assert(pf.nonEmpty && pf.forall(_._2 == 1),
        s"v$v has multi-file partitions: ${pf.filter(_._2 > 1)}")
    }
  }

  test("ivfpq_topk: 10 distinct candidates from the 2 probed cells, " +
      "ADC scores non-increasing") {
    val rows = q("ivfpq_topk").collect()
    assert(rows.length == 10)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == 10 && !ids.contains(0L))
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the probed cells: top-2 centroids for vec 0 by exact dot
    val e = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val t = e(0L)
    val probed = (0L until 16L).sortBy(c =>
      (-math.rint(dot(e(c), t) * 10000) / 10000, c)).take(2).toSet
    assert(rows.forall(r => probed.contains(r.getLong(1))))
  }

  test("hard_negatives: 5 per query, labels all differ from the " +
      "query's, scores non-increasing; top-1 matches brute force") {
    val rows = q("hard_negatives").collect()
    assert(rows.length == 40)
    val lbl = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == 5)
      assert(rs.forall(_.getInt(2) != lbl(qid)))
      val sc = rs.map(_.getDouble(3)).sorted(Ordering[Double].reverse)
      assert(rs.sortBy(r => (-r.getDouble(3), r.getLong(1)))
        .map(_.getDouble(3)).sameElements(sc))
    }
    // brute-force the q_id=0 winner
    val e = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val t = e.find(_._1 == 0L).get
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val best = e.filter(_._3 != t._3)
      .map(x => (x._1, math.rint(dot(x._2, t._2) * 10000) / 10000))
      .sortBy(x => (-x._2, x._1)).head
    val got = byQ(0L).minBy(r => (-r.getDouble(3), r.getLong(1)))
    assert(got.getLong(1) == best._1)
  }

  test("bigram_logprob: every multi-token doc scored; log-probs " +
      "non-positive; held-out docs exercise the backoff") {
    val rows = q("bigram_logprob").collect()
    val multi = docs.filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length == multi)
    // probabilities are <= 1 in both branches (bc <= c1 structurally;
    // backoff mass 0.4*(c+1)/(tn+tv) < 1), so every avg log is <= 0
    assert(rows.forall(_.getDouble(2) <= 0.0))
    // the 80/20 split leaves genuinely held-out docs in the scored set
    val trainBucket = docs.withColumn("b",
      expr("pmod((doc_id % 100000) * 2654435761, 100)"))
    assert(trainBucket.filter(col("b") >= 80).count() > 0)
  }

  test("kl_source_divergence: KL is non-negative per source (Gibbs) " +
      "and token totals partition the corpus") {
    val rows = q("kl_source_divergence").collect()
    val nSources = docs.select("source").distinct().count()
    assert(rows.length == nSources)
    // Gibbs' inequality: KL(P_s || P_corpus) >= 0, = 0 only if the
    // source's unigram distribution equals the mixture's
    assert(rows.forall(_.getDouble(3) >= 0.0),
      rows.map(r => s"${r.getString(0)}:${r.getDouble(3)}").mkString(","))
    val totalToks = docs
      .select(size(split(col("text"), " ")).as("n")).agg(sum("n"))
      .head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalToks)
  }

  test("pca_topcomp: label profiles partition the corpus and the " +
      "projections are non-degenerate") {
    val rows = q("pca_topcomp").collect()
    assert(rows.map(_.getLong(1)).sum == emb.count()) // each vector once
    assert(rows.forall(_.getDouble(3) >= 0.0)) // spread = max - min
    // a real (non-zero) component separates something: at least one
    // label has nonzero spread, and label means are not all identical
    assert(rows.exists(_.getDouble(3) > 0.0), "all projections constant")
    assert(rows.map(_.getDouble(2)).distinct.length > 1 ||
      rows.length == 1, "all labels project identically — degenerate")
    // determinism: a second run returns the identical profile
    val again = q("pca_topcomp").collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("kmeans_assign: partition of the corpus into k nonempty-sum clusters") {
    val rows = q("kmeans_assign").collect()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n) // every vector exactly once
    assert(rows.length <= 8 && rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("ivf_append: frozen-centroid ingest rewrites only touched list " +
      "partitions; the merged index equals assign-all; probes prune") {
    // run the declared op (it commits v1 + v2 as side effects), then
    // audit the snapshot base it left behind
    val res = q("ivf_append").collect()
    assert(res.length == 10)
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    assert(res.forall(_.getLong(0) != maxId)) // target (newest) excluded
    assert(res.map(r => r.getLong(1)).distinct.length <= 2) // nprobe=2
    val base = s"/tmp/graft_vec_ivf_append_" +
      s"${Integer.toHexString(sfDir.hashCode)}" +
      s"_p${ProcessHandle.current().pid()}"
    // ingest write amplification: v2 wrote only the touched list
    // partitions' bytes — strictly less than the full v1 index
    val b1 = sources.Snapshots.bytesWritten(spark, base, 1L)
    val b2 = sources.Snapshots.bytesWritten(spark, base, 2L)
    assert(b2 < b1, s"ingest rewrote the whole index: v1=$b1 v2=$b2")
    // the merged index is exactly the full corpus, each vector once
    val v2 = sources.Snapshots.readAsOf(spark, base, 2L)
    val nAll = emb.count()
    assert(v2.count() == nAll)
    assert(v2.select("vec_id").distinct().count() == nAll)
    // v1 (the pre-ingest index) stays readable: exactly the base
    // corpus — everything but the 4-newest ingest batch
    val v1 = sources.Snapshots.readAsOf(spark, base, 1L)
    assert(v1.count() == nAll - 4)
    // inheritance is physical: v2's own data dir holds ONLY the
    // touched list partitions (untouched lists are manifest
    // references into v1's dir, not copies)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(base))
      .filter(_.isDirectory).map(_.getPath.getName)
    val v1Dir = dirs.find(_.startsWith("v=1-")).get
    val v2Dir = dirs.find(_.startsWith("v=2-")).get
    def listParts(d: String): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(base, d))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("list=")).toSet
    assert(listParts(v2Dir).subsetOf(listParts(v1Dir)))
    assert(listParts(v2Dir).size < listParts(v1Dir).size,
      "ingest touched every list partition — no inheritance exercised")
  }

  test("ivfpq_append: frozen-half ingest rewrites only touched list " +
      "partitions; the committed codes equal encode-all; the probe " +
      "read is partition-filtered") {
    // run the declared op (it commits v1 + v2 as side effects), then
    // audit the snapshot base it left behind
    val df = q("ivfpq_append")
    val res = df.collect()
    assert(res.length == 10)
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    assert(res.forall(_.getLong(0) != maxId)) // target (newest) excluded
    assert(res.map(_.getLong(1)).distinct.length <= 2) // nprobe=2
    // scores arrive sorted desc (vec_id tie-break)
    val scores = res.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val base = s"/tmp/graft_vec_ivfpq_append_" +
      s"${Integer.toHexString(sfDir.hashCode)}" +
      s"_p${ProcessHandle.current().pid()}"
    // ingest write amplification: v2 wrote only the touched list
    // partitions' bytes — strictly less than the full v1 index
    val b1 = sources.Snapshots.bytesWritten(spark, base, 1L)
    val b2 = sources.Snapshots.bytesWritten(spark, base, 2L)
    assert(b2 < b1, s"ingest rewrote the whole index: v1=$b1 v2=$b2")
    // the merged index covers the full corpus, each vector once, and
    // every packed long carries 8 valid nibbles (< 16^8)
    val v2 = sources.Snapshots.readAsOf(spark, base, 2L)
    val nAll = emb.count()
    assert(v2.count() == nAll)
    assert(v2.select("vec_id").distinct().count() == nAll)
    assert(v2.filter(col("ck") < 0 || col("ck") >= (1L << 32)).isEmpty)
    assert(sources.Snapshots.readAsOf(spark, base, 1L).count() == nAll - 4)
    // inheritance is physical: v2's own data dir holds ONLY touched
    // list partitions
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(base))
      .filter(_.isDirectory).map(_.getPath.getName)
    def listParts(d: String): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(base, d))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("list=")).toSet
    val v1Parts = listParts(dirs.find(_.startsWith("v=1-")).get)
    val v2Parts = listParts(dirs.find(_.startsWith("v=2-")).get)
    assert(v2Parts.subsetOf(v1Parts) && v2Parts.size < v1Parts.size,
      "ingest touched every list partition — no inheritance exercised")
    // the probe's index scans carry non-empty PartitionFilters — the
    // manifest INSET restricts listing to each version's own
    // partition dirs (listing-time pruning over the clustered layout)
    val scanLines = df.queryExecution.executedPlan.toString
      .split("\n").filter(l => l.contains("FileScan") &&
        l.contains("ivfpq_append"))
    assert(scanLines.nonEmpty)
    assert(scanLines.forall(_.contains("PartitionFilters: [cast(list")),
      s"index scan not partition-filtered:\n${scanLines.mkString("\n")}")
  }

  test("semdedup_append: at-ingest pairs equal the brute-force " +
      "frozen-centroid pair set; ingest rewrites only touched clusters") {
    val got = q("semdedup_append").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // independent driver-side brute force (500 vecs at sf0.001):
    // frozen base-derived seeds, argmax assignment with the rounded
    // score / lowest-c_id tie-break, same-cluster batch-involving
    // pairs with rounded cosine >= 0.3
    val e = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r4(x: Double): Double = math.rint(x * 10000) / 10000
    val mx = e.keys.max
    val nBase = e.size - 5
    // three-level mirror of assignFrozen on the base-derived seeds:
    // k = ceil(N_base/tau) fine, kc = max(4, ceil-cbrt(k)) coarse,
    // km = min(k, kc^2) mid; seeds own their cells at both routings
    val k = math.max(8L, math.ceil(nBase / 100.0).toLong)
    val seeds = (0L until k).map(c => c -> e(c))
    val kc = {
      var c = math.max(1L, math.cbrt(k.toDouble).round)
      while (c * c * c < k) c += 1
      while (c > 1 && (c - 1) * (c - 1) * (c - 1) >= k) c -= 1
      math.max(4L, c).toInt
    }
    val km = math.min(k, kc.toLong * kc).toInt
    val coarse = seeds.take(kc)
    val mids = seeds.take(km)
    val coarseIds = coarse.map(_._1).toSet
    val midIds = mids.map(_._1).toSet
    def cellOf(v: Array[Float]): Long =
      coarse.minBy { case (cc, cv) => (-r4(dot(v, cv)), cc) }._1
    val m2c = mids.map { case (m, mv) =>
      m -> (if (coarseIds(m)) m else cellOf(mv))
    }.toMap
    def midOf(v: Array[Float], cell: Long): Long =
      mids.filter { case (m, _) => m2c(m) == cell }
        .minBy { case (m, mv) => (-r4(dot(v, mv)), m) }._1
    val f2m = seeds.map { case (c, cv) =>
      c -> (if (midIds(c)) c else midOf(cv, cellOf(cv)))
    }.toMap
    val cluster = e.map { case (id, v) =>
      val mcell = midOf(v, cellOf(v))
      id -> seeds.filter { case (c, _) => f2m(c) == mcell }
        .minBy { case (c, cv) => (-r4(dot(v, cv)), c) }._1
    }
    val ids = e.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids
      if a < b && cluster(a) == cluster(b) && (a > mx - 5 || b > mx - 5)
      sc = r4(dot(e(a), e(b))) if sc >= 0.3
    } yield (a, b, sc)).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the fixture must actually exercise discovery
    // snapshot audit: incremental ingest rewrote strictly less than
    // the base build, the merged index holds every vector exactly
    // once, and v2's own data dir holds only touched cluster dirs
    val base = s"/tmp/graft_vec_semdedup_append_" +
      s"${Integer.toHexString(sfDir.hashCode)}" +
      s"_p${ProcessHandle.current().pid()}"
    val batchCells = ((mx - 4) to mx).map(b => cellOf(e(b))).toSet
    val baseCells = e.keys.filter(_ <= mx - 5)
      .map(id => cellOf(e(id))).toSet
    val b1 = sources.Snapshots.bytesWritten(spark, base, 1L)
    val b2 = sources.Snapshots.bytesWritten(spark, base, 2L)
    // strictly-smaller bytes only holds when the batch leaves some
    // cell untouched (kc = 4 at this SF — 5 vectors can hit all 4)
    if (batchCells.size < baseCells.size)
      assert(b2 < b1, s"ingest rewrote the whole index: v1=$b1 v2=$b2")
    val v2 = sources.Snapshots.readAsOf(spark, base, 2L)
    assert(v2.count() == e.size)
    assert(v2.select("vec_id").distinct().count() == e.size)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(base))
      .filter(_.isDirectory).map(_.getPath.getName)
    def cellParts(d: String): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(base, d))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("cc_id=")).toSet
    val v1Parts = cellParts(dirs.find(_.startsWith("v=1-")).get)
    val v2Parts = cellParts(dirs.find(_.startsWith("v=2-")).get)
    // v2's own data dir holds EXACTLY the batch's coarse cells (the
    // mirror computes them), and the base build's dirs are exactly
    // the cells with >= 1 base vector — the O(touched-cells) write
    // amplification, asserted exactly rather than by dir counts
    assert(v2Parts == batchCells.map(c => s"cc_id=$c"))
    assert(v1Parts == baseCells.map(c => s"cc_id=$c"))
    // the at-ingest probe's index scans are CELL-PRUNED at the plan
    // level: readAsOf's manifest restricts listing to the version's
    // dirs and the scan carries non-empty PartitionFilters on cc_id
    // (the ivfpq_append plan-guard precedent) — without them the
    // probe is an index sweep, not a pruned read
    val scanLines = vec.VectorOps.semdedupAppend.run(spark, sfDir)
      .queryExecution.executedPlan.toString
      .split("\n").filter(l => l.contains("FileScan") &&
        l.contains("semdedup_append"))
    assert(scanLines.nonEmpty)
    assert(scanLines.forall(_.contains("PartitionFilters: [cast(cc_id")),
      s"index scan not cell-filtered:\n${scanLines.mkString("\n")}")
  }

  test("simhash_multiprobe_counts equals the pair op grouped by " +
      "hamming distance") {
    // the count op never touches the pair set (fp-histogram closed
    // form) — this is the cross-check that the closed form counts
    // exactly what the declared pair op emits
    val pairCounts = q("simhash_multiprobe").groupBy(col("hamming"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = q("simhash_multiprobe_counts").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(0, 1, 2),
      s"expected one row per distance 0-2, got ${got.keySet}")
    for (dd <- 0 to 2)
      assert(got(dd) == pairCounts.getOrElse(dd, 0L),
        s"distance $dd: counts ${got(dd)} vs pairs " +
          s"${pairCounts.getOrElse(dd, 0L)}")
    assert(got.values.sum > 0, "fixture exercises no close pairs")
  }

  test("minhash_append degrades to a batch-only index when the " +
      "corpus is no larger than the ingest batch") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tiny_mh").toString
    val tiny = Seq((1L, "a b c d e"), (2L, "a b c d e f"),
      (3L, "x y z w"))
    tiny.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = text.SimilarityOps.minhashAppend.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // every pair is batch-involving, so the at-ingest discovery must
    // equal the one-shot pair kernel on the same docs
    val want = text.SimilarityOps
      .minhashDetPairs(tiny.toDF("doc_id", "text"), 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
    assert(got == Set((1L, 2L, 0.75)))
  }

  test("verifiedPairs' size-ratio prefilter is exact: below-bound " +
      "pairs vanish, in-bound pairs keep their full jaccard") {
    import spark.implicits._
    // distinct-trigram counts: d1 = 8 (10 tokens), d2 = 8 (shares 6
    // grams with d1 -> j = 6/10 = 0.6), d3 = 3 (5 tokens, ratio vs
    // d1 = 3/8 = 0.375 — CANNOT clear 0.6 and must be prefiltered;
    // its true jaccard vs d1 is 0 anyway, so the assertion is on
    // PRESENCE, which only the prefilter controls at minJaccard=0)
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h x y"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    def run(t: Double): Map[(Long, Long), Double] =
      text.SimilarityOps.verifiedPairs(cand, docs, t)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          r.getAs[Double]("jaccard")).toMap
    // unfiltered: both candidate pairs verified, exact jaccards
    val all = run(0.0)
    assert(all == Map((1L, 2L) -> 0.6, (1L, 3L) -> 0.0))
    // armed at 0.6: the (1,3) pair is bound out BEFORE intersection
    // (3/8 < 0.6 − 0.00005); the surviving pair's jaccard is
    // untouched by the prefilter
    assert(run(0.6) == Map((1L, 2L) -> 0.6))
    // the half-ulp slack: a threshold just ABOVE a pair's exact
    // size ratio still keeps it when round(j, 4) could reach the
    // threshold — here ratio = 1.0 ≥ anything, so 0.6001 keeps
    // (1,2) in the VERIFIED set (callers then threshold it away)
    assert(run(0.6001).contains((1L, 2L)))
  }

  test("semdedup_append and ivf_append fail loudly, not via the " +
      "empty-commit guard, when no base corpus exists") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tiny_vec").toString
    (0L until 3L).map(i => (i, Array.fill(64)(0.1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e1 = intercept[IllegalArgumentException](
      vec.VectorOps.semdedupAppend.run(spark, dir).collect())
    assert(e1.getMessage.contains("base corpus"))
    val e2 = intercept[IllegalArgumentException](
      vec.VectorOps.ivfAppend.run(spark, dir).collect())
    assert(e2.getMessage.contains("base corpus"))
  }

  test("ann_recall: one row per sampled query, recall in [0,1], and " +
      "q0 reconciles with the declared ivf_topk/vector_topk pair") {
    val rows = q("ann_recall").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == (0L until 8L).toSet)
    rows.values.foreach { case (h, r) =>
      assert(h >= 0L && h <= 10L)
      assert(math.abs(r - h / 10.0) < 1e-9)
    }
    // q0 IS vector_topk's target and ivf_topk's probe setup: its
    // n_hit must equal the overlap of the two declared outputs
    val exact0 = q("vector_topk").select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val ivf0 = q("ivf_topk").select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(rows(0L)._1 == exact0.intersect(ivf0).size.toLong)
    // probing 2/16 cells on the fixture keeps mean recall useful
    val mean = rows.values.map(_._2).sum / rows.size
    assert(mean >= 0.5, s"mean recall $mean")
  }

  test("oov_rate: totals reconcile with the corpus; rates live and " +
      "consistent with a driver-side top-16 vocab") {
    val rows = q("oov_rate").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val toks = docs.select(explode(split(col("text"), " ")).as("w"))
      .collect().map(_.getString(0))
    assert(rows.values.map(_._1).sum == toks.length.toLong)
    // driver-side vocab: top-16 by (count desc, token asc), floor 5
    val vocab = toks.groupBy(identity).view.mapValues(_.length).toSeq
      .filter(_._2 >= 5)
      .sortBy { case (w, c) => (-c, w) }.take(16).map(_._1).toSet
    val expOov = toks.count(w => !vocab.contains(w)).toLong
    assert(rows.values.map(_._2).sum == expOov)
    rows.values.foreach { case (n, oov, r) =>
      assert(oov >= 0L && oov <= n)
      assert(math.abs(r - oov.toDouble / n) < 1e-4 + 1e-9)
      assert(r > 0.0 && r < 1.0) // the budget cut is live per source
    }
  }
}
