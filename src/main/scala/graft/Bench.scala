package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Headline queries benched at sf0.1, mirroring BASELINE.md's 11-query
    * table (pricing_agg..vector_topk). The full 49-query inventory runs in
    * Verify at sf0.01; the quadratic ops (knn_label, cosine_neardup) are
    * correctness-only and excluded from the timed set by design.
    */
  val headline: Seq[String] = Seq(
    "pricing_agg", "join_bcast_star", "join_inner", "window_rank", "topk",
    "agg_distinct", "join_anti", "date_funcs", "json_funcs", "sessionize",
    "vector_topk")

  /** The linear-plan LLM-pipeline set, timed when
    * SPARK_GRAFT_BENCH_SET=pipeline (secondary evidence, not the
    * driver's headline contract — BASELINE.md has no rows for these).
    * Quadratic/correctness-only ops (knn_label, cosine_neardup,
    * dedup_minhash, ngram_jaccard, simhash_*, neardup_cluster,
    * minhash_det, dedup_keep_best) stay excluded by design. */
  val pipeline: Seq[String] = Seq(
    "dedup_exact", "token_count", "quality_score", "rep_ratio",
    "redact_terms", "sample_stratified", "sample_budget", "split_hash",
    "pack_sequences", "doc_fingerprint", "lang_id", "vocab_build",
    "tfidf_top", "contamination", "contamination_bloom", "heavy_hitters",
    "bloom_semi", "cdc_latest", "resample_daily", "embed_quantize",
    "ann_bucket_topk", "ivf_topk", "kmeans_assign", "bm25_top",
    "dup_span_frac", "chunk_docs", "pmi_bigrams", "unigram_logprob",
    "mix_uniform", "media_dedup", "media_decode", "edit_dist_pairs")

  /** The GA-composite / flow / journey / warehouse families, timed when
    * SPARK_GRAFT_BENCH_SET=ga (VERDICT r6 missing item 1: these 145 ops
    * had no per-round timing artifact). 34 representative keys spanning
    * every family: sessionize-chain composites, funnel/cohort/attribution,
    * time-series, graph, and the merge/diff/audit warehouse ops. The
    * remaining keys in those families share the same plan shapes
    * (clustered window exchange → bounded rollup) as these. */
  val ga: Seq[String] = Seq(
    "ga_report", "ga_sessions", "session_metrics", "funnel_seq",
    "funnel_steps", "cohort_retention", "cdc_latest", "scd2_track",
    "session_concurrency", "anomaly_zscore", "user_streaks",
    "markov_transitions", "first_touch", "conversion_lag", "trend_slope",
    "seasonality_dow", "rfm_segments", "decile_lift", "churn_flags",
    "rolling_wau", "new_vs_returning", "bounce_rate", "attribution_linear",
    "attribution_time_decay", "session_paths", "inter_event_hist",
    "merge_upsert", "merge_partitioned", "table_diff", "fk_orphans",
    "equi_depth_hist", "key_skew", "page_transitions", "pagerank")

  /** The round-8 additions, timed when SPARK_GRAFT_BENCH_SET=r8:
    * the new curation/vector/journey ops. `semdedup` is
    * quadratic-within-cluster by design (bounded by cluster size —
    * see SCALE.md) and stays in the set deliberately so its growth
    * is measured, not assumed. */
  val r8: Seq[String] = Seq(
    "entropy_filter", "cooccur_topk", "compaction_plan",
    "attribution_position", "cart_abandonment", "semdedup", "pq_topk",
    "dsir_weights", "bpe_encode", "markov_removal", "cohort_ltv",
    "ab_lift", "shingle_containment", "winnowing_fingerprint",
    "ewma_smooth", "zipf_fit", "dau_mau")

  /** The round-11 additions, timed when SPARK_GRAFT_BENCH_SET=r11:
    * snapshot lifecycle (commit/read/diff/compact — timings include
    * the setup commits by design: the write path IS the op),
    * the chunked GA report, the curation additions, and the
    * Lloyd-trained ANN variants. */
  val r11: Seq[String] = Seq(
    "snapshot_read", "snapshot_diff", "snapshot_compact", "ga_chunked",
    "domain_cap", "mix_temperature", "shuffle_shard",
    "ivf_topk_trained", "pq_topk_trained")

  /** The round-12 additions, timed when SPARK_GRAFT_BENCH_SET=r12:
    * the incremental snapshot merge and the z-order writer (both
    * timings include their setup commits by design — the write path
    * IS the op). */
  val r12: Seq[String] = Seq("snapshot_merge", "zorder_write")

  /** The round-13 additions, timed when SPARK_GRAFT_BENCH_SET=r13:
    * partition-scoped compaction (timing includes its three setup
    * commits by design — the write path IS the op) and the two new
    * corpus-statistics ops. */
  val r13: Seq[String] =
    Seq("compact_partitions", "bigram_logprob", "kl_source_divergence")

  /** The round-14 additions, timed when SPARK_GRAFT_BENCH_SET=r14
    * (`dedup_append`'s timing includes its two snapshot commits by
    * design — the write path IS the op). */
  val r14: Seq[String] =
    Seq("dedup_spans", "ivfpq_topk", "hard_negatives", "dedup_append",
      "interval_overlaps", "perplexity_mix", "minhash_append",
      "gopher_filter", "epoch_plan", "semdedup_append",
      "curation_funnel", "ann_recall", "dataset_card", "oov_rate")

  /** The round-15 additions, timed when SPARK_GRAFT_BENCH_SET=r15
    * (`ivfpq_append`'s timing includes its two snapshot commits by
    * design — the write path IS the op; `ann_recall_suite` includes
    * the Lloyd training of its trained-IVF path). */
  val r15: Seq[String] = Seq("ivfpq_append", "ann_recall_suite",
    "ccnet_buckets", "weighted_sample", "gopher_ablation")

  /** The round-17 addition, timed when SPARK_GRAFT_BENCH_SET=r17:
    * the two-stage IVF×PQ query (ADC shortlist + exact rerank of
    * 100 raw rows — the rerank adds one broadcast point-lookup join
    * over `ivfpq_topk`'s plan). */
  val r17: Seq[String] = Seq("ivfpq_rerank_topk")

  /** Bench protocol: timings are only comparable on the pinned 8 GB
    * driver heap (the identical binary moves ~1.5 s between 8 GB and
    * 64+ GB at local[32] sf0.1 — GC geometry, not code; SCALE.md
    * protocol note). `heap_gb` rounds maxMemory to the NEAREST GiB
    * because Serial/Parallel GC exclude a survivor space from
    * maxMemory, so an 8 GB `-Xmx` floor-divides to 7 (ADVICE r16).
    * In-protocol acceptance is NOT the rounded value (nearest-GiB
    * stamped -Xmx7700m/-Xmx8400m as in-protocol — ADVICE r17): only
    * the survivor-space-exclusion band below an exact 8 GiB `-Xmx`
    * qualifies, i.e. maxMemory ∈ [7.4 GiB, 8.0 GiB], and the raw
    * byte count is stamped into the JSON so any mislabel is
    * auditable. */
  private def heapGb: Long =
    (Runtime.getRuntime.maxMemory + (1L << 29)) >> 30

  /** In-protocol = the JVM was LAUNCHED with an exact 8 GiB -Xmx
    * (read from the input arguments, not inferred from maxMemory:
    * under G1 a -Xmx7700m launch reports maxMemory ~7.52 GiB, lands
    * inside the old [7.4, 8.0] GiB acceptance band, and would be
    * mislabeled in-protocol — ADVICE r18). Any -Xmx spelling of
    * exactly 2^33 bytes qualifies (8g/8192m/8388608k/8589934592);
    * maxMemory stays stamped as `heap_bytes` for the audit trail.
    * No -Xmx at all (ergonomic default heap) is off-protocol. */
  private def heapInProtocol: Boolean = {
    import scala.jdk.CollectionConverters._
    val xmx = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(_.startsWith("-Xmx")).lastOption
    xmx.exists { a =>
      val v = a.stripPrefix("-Xmx").toLowerCase
      val d = v.takeWhile(_.isDigit)
      val mult = v.drop(d.length) match {
        case "g" => Some(1L << 30)
        case "m" => Some(1L << 20)
        case "k" => Some(1L << 10)
        case ""  => Some(1L)
        case _   => None
      }
      d.nonEmpty && mult.exists(m =>
        scala.util.Try(d.toLong).toOption.exists(_ * m == 8L << 30))
    }
  }

  /** When launched off-protocol (any heap but 8 GB), re-exec this
    * main once under `-Xmx8g` — same JVM module flags, same
    * classpath, same env — so the artifact of record is always an
    * in-protocol measurement no matter how the caller sized the
    * heap (r16's headline shipped at 89 GB and read as a ~1 s
    * regression). Returns None when the child ran and printed its
    * JSON line (already relayed); Some(reason) when the re-exec
    * could not produce one (e.g. an sbt layered-classloader launch
    * where java.class.path lacks the project classes) — the caller
    * then measures inline and self-labels `off_protocol`. */
  private def reexecAt8g(args: Array[String]): Option[String] = {
    import scala.jdk.CollectionConverters._
    try {
      val jvm = java.nio.file.Paths
        .get(System.getProperty("java.home"), "bin", "java").toString
      // forward EVERY inherited JVM flag except the heap sizing being
      // overridden (ADVICE r17: dropping GC choice / -XX / -Xss flags
      // silently changed the child's JVM configuration)
      val inherited = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala
        .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
      val cmd = (Seq(jvm) ++ inherited ++ Seq("-Xmx8g", "-cp",
        System.getProperty("java.class.path"), "graft.Bench") ++
        args).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("GRAFT_BENCH_NO_REEXEC", "1")
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val code = p.waitFor()
      if (code == 0 && out.contains("\"metric\"")) {
        print(out); None
      } else Some(s"re-exec exit=$code jsonSeen=" +
        out.contains("\"metric\""))
    } catch { case e: Exception => Some(e.toString) }
  }

  def main(args: Array[String]): Unit = {
    // enforce the heap protocol BEFORE any Spark work: an
    // off-protocol launch re-execs at 8 GB (fallback: measure here
    // and stamp off_protocol so the artifact is self-labeling)
    var offProtocol = false
    if (!heapInProtocol && !sys.env.contains("GRAFT_BENCH_NO_REEXEC")) {
      reexecAt8g(args) match {
        case None => return // child measured in-protocol and printed
        case Some(reason) =>
          offProtocol = true
          System.err.println(s"Bench: OFF-PROTOCOL heap ${heapGb}g " +
            s"(pinned 8g) and re-exec failed ($reason) — timings " +
            "are not comparable to BASELINE/SCALE rows")
      }
    } else if (!heapInProtocol) {
      offProtocol = true
      System.err.println(s"Bench: OFF-PROTOCOL heap ${heapGb}g " +
        "(pinned 8g; re-exec suppressed) — timings are not " +
        "comparable to BASELINE/SCALE rows")
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // native extensions (dot_f/ngrams/kmv_distinct + the dot-product
      // and window-top-k rewrite rules) active in the main path
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      // events.ts is Parquet TIMESTAMP(NANOS); Spark 4 needs this to
      // read it at all (FIXTURES.md:85-91).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every headline query once at the bench SF so JIT +
    // whole-stage-codegen compilation and parquet footer caches are
    // paid outside timing (BASELINE.md timed a warm PySpark session;
    // cold JVM first-runs are 3-6x slower purely from C2/codegen, and
    // warming at a smaller SF doesn't help because AQE picks different
    // physical plans there). Steady-state throughput is the number
    // that extrapolates to the 100 TB target.
    val set = sys.env.get("SPARK_GRAFT_BENCH_SET") match {
      case Some("pipeline") => pipeline
      case Some("ga")       => ga
      case Some("r8")       => r8
      case Some("r11")      => r11
      case Some("r12")      => r12
      case Some("r13")      => r13
      case Some("r14")      => r14
      case Some("r15")      => r15
      case Some("r17")      => r17
      // ad-hoc targeted timing, e.g. "custom:pagerank,page_transitions"
      case Some(s) if s.startsWith("custom:") =>
        s.stripPrefix("custom:").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
      case _                => headline
    }
    val queries = SparkEntry.queries
    // Sink choice (SPARK_GRAFT_BENCH_SINK): `count` (default) keeps
    // methodology parity with BASELINE.md, whose PySpark baseline
    // consumed results the same way — apples-to-apples for the 2x
    // headline gate. `noop` forces EVERY output column to compute
    // (count() prunes aggregate values and final-projection compute —
    // edit_dist_pairs measured 11.5 s counted vs 173 s real at sf10,
    // SCALE.md r13) — the honest sink for per-op scale evidence.
    val consume: org.apache.spark.sql.DataFrame => Unit =
      sys.env.get("SPARK_GRAFT_BENCH_SINK") match {
        case Some("noop") =>
          df => df.write.format("noop").mode("overwrite").save()
        case _ => df => { df.count(); () }
      }
    set.filter(queries.contains).foreach { name =>
      try consume(queries(name)(spark, sfDir))
      catch { case _: Throwable => () }
    }
    // min-of-3 within the warm session: a single-shot time cannot
    // distinguish a plan regression from machine-load noise (r4→r5
    // moved 22% on identical code); the min is the steady-state
    // number, and the per-query spread (max-min) quantifies how much
    // of any round-over-round delta is noise
    val results = set.filter(queries.contains).map { name =>
      val fn = queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { consume(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        // a failed query must not masquerade as a fast one: report -1
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> times
    }
    def f(v: Double): String = "%.4f".format(v)
    val best = results.map { case (k, ts) =>
      k -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = best.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, ts) =>
      s"\"" + k + "\":" + (if (ts.exists(_ < 0)) "-1.0"
        else f(ts.max - ts.min))
    }.mkString("{", ",", "}")
    // the -1.0 failure sentinel must not shrink (improve) the headline
    // total: any failure makes the total non-comparable against the
    // BASELINE 2x gate, so report -1 rather than a partial (smaller,
    // better-looking) sum
    val failed = best.count(_._2 < 0)
    val total =
      if (failed > 0) -1.0 else best.map(_._2).sum
    // heap geometry moves the headline ~1.5 s (8 GB vs 64 GB measured
    // on the identical r15 binary — SCALE.md protocol note), so the
    // artifact records it: a future heap change shows up in the JSON
    // instead of reading as a code regression. off_protocol flags the
    // (rare) fallback path where the 8 GB re-exec could not run.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"spreads":$spreads,"runs":3,"failed":$failed,"heap_gb":$heapGb,"heap_bytes":${Runtime.getRuntime.maxMemory},"off_protocol":$offProtocol,"sf":"$sfDir"}""")
    spark.stop()
  }
}
