package graft

import graft.api.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Locks the facade ↔ inventory mapping (VERDICT r8 item 8): every
  * declared op key in SparkEntry.queries must be classified below —
  * either covered by a parameterized facade transform (whose
  * reference is compile-checked, so a rename breaks the build) or
  * assigned to a named non-facade surface with a documented reason.
  * A round-N addition that is not classified here fails the suite,
  * so no new operator can silently skip the facade decision.
  */
class FacadeCoverageSpec extends AnyFunSuite {

  /** Compile-checked facade references: if a facade method is renamed
    * or removed, this map stops compiling and its ops go unmapped. */
  private val facadeRefs: Map[String, Any] = Map(
    "sessionize" -> (Graft.sessionize _),
    "asofJoin" -> (Graft.asofJoin _),
    "cohortRetention" -> (Graft.cohortRetention _),
    "dedupExact" -> (Graft.dedupExact _),
    "neardupCluster" -> (Graft.neardupCluster _),
    "vectorTopK" -> (Graft.vectorTopK _),
    "qualityScore" -> (Graft.qualityScore _),
    "ngrams" -> (Graft.ngrams _),
    "heavyHitters" -> (Graft.heavyHitters _),
    "bloomSemiJoin" -> (Graft.bloomSemiJoin _),
    "resampleDaily" -> (Graft.resampleDaily _),
    "cdcLatest" -> (Graft.cdcLatest _),
    "quantizeInt8" -> (Graft.quantizeInt8 _),
    "pageRank" -> (Graft.pageRank _),
    "scd2" -> (Graft.scd2 _),
    "chunkDocs" -> (Graft.chunkDocs _),
    "pmiBigrams" -> (Graft.pmiBigrams _),
    "unigramLogprob" -> (Graft.unigramLogprob _),
    "editDistPairs" -> (Graft.editDistPairs _),
    "basketPairs" -> (Graft.basketPairs _),
    "histogram" -> (Graft.histogram _),
    "decileLift" -> (Graft.decileLift _),
    "userStreaks" -> (Graft.userStreaks _),
    "peakConcurrency" -> (Graft.peakConcurrency _),
    "entropyFilter" -> (Graft.entropyFilter _),
    "cooccurTopK" -> (Graft.cooccurTopK _),
    "importanceWeights" -> (Graft.importanceWeights _),
    "semdedup" -> (Graft.semdedup _),
    "abLift" -> (Graft.abLift _),
    "containmentPairs" -> (Graft.containmentPairs _),
    "ewmaSmooth" -> (Graft.ewmaSmooth _),
    "dauMau" -> (Graft.dauMau _),
    "zipfFit" -> (Graft.zipfFit _),
    "winnowFingerprints" -> (Graft.winnowFingerprints _),
    // round 9
    "funnel" -> (Graft.funnel _),
    "attribution" -> (Graft.attribution _),
    "markovTransitions" -> (Graft.markovTransitions _),
    "markovRemoval" -> (Graft.markovRemoval _),
    "splitHash" -> (Graft.splitHash _),
    "minhashPairs" -> (Graft.minhashPairs _),
    "winsorize" -> (Graft.winsorize _),
    "bpeMerges" -> (Graft.bpeMerges _),
    // round 11
    "domainCap" -> (Graft.domainCap _),
    "mixTemperature" -> (Graft.mixTemperature _),
    "shuffleShards" -> (Graft.shuffleShards _))

  /** facade name -> the declared ops it generalizes (the op pins the
    * facade to fixed parameters; ApiSpec asserts the equivalences). */
  private val facadeCoverage: Map[String, Seq[String]] = Map(
    "sessionize" -> Seq("sessionize", "session_window", "ga_sessions",
      "session_metrics", "session_paths"),
    "asofJoin" -> Seq("join_asof", "join_asof_nearest", "range_join_time"),
    "cohortRetention" -> Seq("cohort_retention", "cohort_ltv",
      "churn_flags"),
    "dedupExact" -> Seq("dedup_exact"),
    "neardupCluster" -> Seq("neardup_cluster", "name_clusters",
      "dedup_keep_best"),
    "vectorTopK" -> Seq("vector_topk", "knn_label", "ann_bucket_topk",
      "ivf_topk", "kmeans_assign"),
    "qualityScore" -> Seq("quality_score", "text_stats", "token_count",
      "rep_ratio", "dup_span_frac", "lang_id", "redact_terms"),
    "ngrams" -> Seq("explode_tokens", "ngram_top", "vocab_build",
      "tfidf_top", "bm25_top"),
    "heavyHitters" -> Seq("heavy_hitters"),
    // membership-filter family: ngram explode + (broadcast | bloom)
    // probe — bloomSemiJoin is the parameterized kernel
    "bloomSemiJoin" -> Seq("bloom_semi", "contamination",
      "contamination_bloom"),
    "resampleDaily" -> Seq("resample_daily", "window_tumbling",
      "window_sliding"),
    "cdcLatest" -> Seq("cdc_latest", "merge_upsert", "table_diff"),
    "quantizeInt8" -> Seq("embed_quantize", "pq_topk"),
    "pageRank" -> Seq("pagerank", "graph_triangles"),
    "scd2" -> Seq("scd2_track"),
    "chunkDocs" -> Seq("chunk_docs", "pack_sequences"),
    "pmiBigrams" -> Seq("pmi_bigrams"),
    "unigramLogprob" -> Seq("unigram_logprob"),
    "editDistPairs" -> Seq("edit_dist_pairs"),
    "basketPairs" -> Seq("basket_pairs"),
    "histogram" -> Seq("value_histogram", "equi_depth_hist",
      "order_lines_hist", "inter_event_hist"),
    "decileLift" -> Seq("decile_lift", "rfm_segments"),
    "userStreaks" -> Seq("user_streaks"),
    "peakConcurrency" -> Seq("session_concurrency"),
    "entropyFilter" -> Seq("entropy_filter"),
    "cooccurTopK" -> Seq("cooccur_topk"),
    "importanceWeights" -> Seq("dsir_weights"),
    "semdedup" -> Seq("semdedup", "cosine_neardup"),
    "abLift" -> Seq("ab_lift"),
    "containmentPairs" -> Seq("shingle_containment", "source_overlap"),
    "ewmaSmooth" -> Seq("ewma_smooth", "trend_slope", "seasonality_dow",
      "anomaly_zscore", "period_compare"),
    "dauMau" -> Seq("dau_mau", "rolling_wau"),
    "zipfFit" -> Seq("zipf_fit"),
    "winnowFingerprints" -> Seq("winnowing_fingerprint",
      "doc_fingerprint"),
    "funnel" -> Seq("funnel_steps"),
    "attribution" -> Seq("attribution_linear", "attribution_position",
      "attribution_time_decay"),
    "markovTransitions" -> Seq("markov_transitions", "page_transitions"),
    "markovRemoval" -> Seq("markov_removal"),
    "splitHash" -> Seq("split_hash", "sample_stratified",
      "sample_budget", "mix_uniform"),
    "minhashPairs" -> Seq("minhash_det"),
    "winsorize" -> Seq("winsorize", "mad_outliers"),
    "bpeMerges" -> Seq("bpe_merges", "bpe_encode"),
    "domainCap" -> Seq("domain_cap"),
    "mixTemperature" -> Seq("mix_temperature"),
    "shuffleShards" -> Seq("shuffle_shard"))

  /** Same problem family as a facade transform, but NOT
    * equivalence-tested against it — the facade shares the kernel or
    * plan shape, not the output contract (e.g. `conversion_lag`
    * reports lag quantiles where `attribution` reports credited
    * revenue; simhash is a different fingerprint family than
    * minhash). Kept out of facadeCoverage so the lock only claims
    * what ApiSpec actually asserts (r9 ADVICE item 5). */
  private val facadeRelated: Map[String, Seq[String]] = Map(
    "funnel" -> Seq("funnel_seq", "cart_abandonment"),
    "attribution" -> Seq("first_touch", "conversion_lag"),
    // LM-scoring ladder: bigram stupid-backoff shares the
    // unigram facade's kernel shape (count tables + broadcast join),
    // not its output contract (r13)
    // oov_rate shares the count-table + broadcast-vocab join shape
    // (vocab_build's ranked cut consumed as a coverage diagnostic)
    // (r14)
    "unigramLogprob" -> Seq("bigram_logprob", "oov_rate"),
    // distribution-divergence curation diagnostics: same
    // count-table-vs-corpus shape as the DSIR importance weights,
    // different statistic (per-source KL, not per-doc weights) (r13);
    // weighted_sample is the family's SELECTION step — A-Res
    // weighted sampling without replacement over a weight column,
    // the importance-RESAMPLING half of DSIR (r15)
    "importanceWeights" -> Seq("kl_source_divergence",
      "weighted_sample"),
    // minhash_append is the facade family's PERSISTED band index with
    // incremental ingest (the dedup_append/ivf_append lifecycle) (r14)
    // simhash_multiprobe_counts is the multiprobe pair op's
    // count-shaped companion (fp-histogram closed form) (r18)
    "minhashPairs" -> Seq("dedup_minhash", "ngram_jaccard",
      "simhash_pairs", "simhash_multiprobe",
      "simhash_multiprobe_counts", "minhash_append"),
    // Lloyd-trained index variants: same query surface as the facade,
    // different (trained) codebook/centroid construction — related,
    // not parameter-pinned equivalents (r11); ivf_append is the
    // PERSISTED index lifecycle (snapshot-committed lists + frozen-
    // centroid incremental ingest) over the same probe query (r12)
    // pca_topcomp is the family's dimensionality-reduction half —
    // same broadcast-component/scored-pass kernel shape (r13)
    // hard_negatives is the labeled-mining twin of the brute-force
    // top-k (same scoring kernel, cross-label contract) (r14)
    // ann_recall grades the IVF probe path against the facade's
    // exact-top-k contract — the index-quality eval as a data
    // product (r14)
    // ann_recall_suite widens that gate to all four query paths x
    // nprobe — the index-selection table a deployment reads (r15)
    "vectorTopK" -> Seq("ivf_topk_trained", "ivf_append", "pca_topcomp",
      "hard_negatives", "ann_recall", "ann_recall_suite"),
    // ivfpq_topk composes the PQ facade family's codes/ADC kernel
    // with the IVF coarse quantizer (r14); ivfpq_append is that
    // composition PERSISTED — the snapshot codes index with
    // frozen-half incremental ingest and a partition-pruned probe
    // (the dedup_append/ivf_append lifecycle) (r15)
    "quantizeInt8" -> Seq("pq_topk_trained", "ivfpq_topk",
      "ivfpq_append", "ivfpq_rerank_topk"),
    // dedup_spans resolves dup_span_frac's duplicated spans into
    // their token-coverage union — same gram kernel, span-removal
    // contract (r14); gopher_filter is the facade's score as a
    // per-rule pass/fail battery (same row-local signal kernel,
    // attribution contract) (r14)
    // curation_funnel composes the battery with the exact/near-dup
    // kernels into the stage-attrition report a curation run
    // publishes (r14)
    // dataset_card is the per-source release summary over the same
    // battery signals (quality pass rate, exact-dup rate) (r14)
    // gopher_ablation is the battery's per-rule marginal-attrition
    // diagnostic (same qualitySignals kernel, n_only attribution)
    // (r15)
    "qualityScore" -> Seq("dedup_spans", "gopher_filter",
      "curation_funnel", "dataset_card", "gopher_ablation"),
    // dedup_append is the facade's hash-dedup contract as a PERSISTED
    // incrementally-merged snapshot index (the ivf_append lifecycle
    // pattern) (r14)
    "dedupExact" -> Seq("dedup_append"),
    // interval_overlaps is the time-join family's overlap-count form
    // (rank/prefix-sum decomposition, not a row-matching contract)
    // (r14)
    "asofJoin" -> Seq("interval_overlaps"),
    // semdedup_append is the facade family's PERSISTED cluster index
    // with incremental ingest (the dedup_append/minhash_append/
    // ivf_append lifecycle, semantic member) (r14)
    "semdedup" -> Seq("semdedup_append"),
    // perplexity_mix is the mixing family's quality-bucketed form
    // (rank quartiles over the unigram-LM score, per-bucket Knuth
    // keep rates) (r14); epoch_plan is the same τ-exponent weighting
    // emitted as the per-source repeat PLAN instead of sampled rows
    // (r14); ccnet_buckets is the per-LANGUAGE form — each doc
    // scored by its own language's LM, exact per-lang terciles via
    // the global-rank-minus-offset kernel (r15)
    "mixTemperature" -> Seq("perplexity_mix", "epoch_plan",
      "ccnet_buckets"))

  /** The GA report DSL (Graft.query(): dimensions/metrics/filters/
    * segments/sort/paging) — these ops pin the DSL to GA-v3 report
    * shapes; GaQuerySpec asserts the DSL equivalences. */
  private val gaQueryDsl = Seq("ga_report", "ga_filters", "ga_chunked",
    "page_topk", "bounce_rate", "new_vs_returning")

  /** Covered by registered native extension functions / rules
    * (graft.ext: GraftFunctions, TopKPerKey rewrite) — the extension
    * IS the parameterized surface (ExtensionsSpec/TopKPlanSpec). */
  private val extSurface = Seq("udaf_geomean", "kmv_bound", "topk_per_key")

  /** Covered by the typed multimodal kernel (MultimodalOps.mediaTable/
    * ppmTable/decodeFeatures/pool/sampleFrames — parameterized,
    * Dataset-typed; MultimodalSpec). */
  private val multimodalKernel = Seq("media_meta", "media_stats",
    "media_dedup", "media_decode", "media_resize", "media_frames",
    "media_features")
  // compile-checked kernel references
  private val multimodalRefs: Seq[Any] = Seq(
    graft.multimodal.MultimodalOps.mediaTable _,
    graft.multimodal.MultimodalOps.decodeFeatures _,
    graft.multimodal.MultimodalOps.pool _,
    graft.multimodal.MultimodalOps.sampleFrames _)

  /** Native DataFrame/SQL surface demos: the parameterized form IS
    * the public Spark API the library builds on (scans, joins, aggs,
    * windows, sets, scalar functions, pivots) — wrapping them in a
    * facade would shadow the API one-to-one. */
  private val coreDataFrame = Seq(
    // scans / filters / top-k / diagnostics
    "scan_project", "filter_pred", "case_expr", "topk", "topk_diverse",
    "data_profile", "fk_orphans", "key_skew", "gini_concentration",
    // join surface (incl. the salting/skew demos)
    "join_inner", "join_left", "join_semi", "join_anti", "join_full",
    "join_theta", "join_bcast_star", "join_salted", "above_avg",
    // agg surface (incl. native sketches)
    "pricing_agg", "agg_stats", "agg_distinct", "agg_rollup",
    "agg_cube", "agg_grouping_sets", "agg_strings", "agg_salted",
    "agg_hll", "agg_quantile_sketch", "hll_bound", "quantile_bound",
    "quantile_exact",
    // window surface
    "window_rank", "window_analytic", "window_frame", "window_dist",
    "window_range_days", "rolling_median", "share_of_total",
    "pareto_front",
    // set ops, scalar functions, pivot/unpivot
    "set_union", "set_union_all", "set_intersect", "set_intersect_all",
    "set_except", "set_except_all",
    "string_funcs", "regexp_funcs", "date_funcs", "math_funcs",
    "json_funcs", "array_basic", "map_funcs",
    "pivot_lang", "unpivot_metrics")

  /** Storage-layout surface: spark.read/write + layout ops (formats,
    * partitioned sinks, bucketing, compaction planning, DPP). */
  private val coreStorage = Seq("csv_roundtrip", "json_roundtrip",
    "orc_roundtrip", "sink_partitioned", "merge_partitioned",
    "bucket_join", "compaction_plan", "dpp_join", "scan_pruned",
    "zorder_bucket", "zorder_write", "snapshot_read", "snapshot_diff",
    "snapshot_compact", "snapshot_merge", "compact_partitions")

  test("every facade family names a compile-checked facade reference") {
    val missing =
      (facadeCoverage.keySet ++ facadeRelated.keySet) -- facadeRefs.keySet
    assert(missing.isEmpty, s"facade families without a reference: $missing")
    assert(multimodalRefs.nonEmpty)
  }

  test("every declared op is classified exactly once") {
    val buckets: Seq[(String, Seq[String])] =
      facadeCoverage.toSeq.map { case (f, ks) => (s"facade:$f", ks) } ++
        facadeRelated.toSeq.map { case (f, ks) =>
          (s"facade-related:$f", ks)
        } ++
        Seq("ga-query-dsl" -> gaQueryDsl,
          "ext-surface" -> extSurface,
          "multimodal-kernel" -> multimodalKernel,
          "core-dataframe" -> coreDataFrame,
          "core-storage" -> coreStorage)
    val all = buckets.flatMap { case (b, ks) => ks.map(_ -> b) }
    val dupes = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"ops classified more than once: ${dupes.keys.toSeq.sorted}")
    val declared = SparkEntry.queries.keySet
    val classified = all.map(_._1).toSet
    val unclassified = declared -- classified
    assert(unclassified.isEmpty,
      "declared ops with no facade classification (add the op to a " +
        s"family here or add a facade): ${unclassified.toSeq.sorted}")
    val stale = classified -- declared
    assert(stale.isEmpty,
      s"classified keys that are no longer declared: ${stale.toSeq.sorted}")
  }
}
