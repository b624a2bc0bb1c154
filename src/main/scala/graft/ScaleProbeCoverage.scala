package graft

/** The 24×-probe coverage ledger — r10 VERDICT #7 ("diff the probe list
  * against SparkEntry.queries") made mechanical.
  *
  * Every driver query key maps to the [[ScaleProbe]] label(s) that carry
  * its 24× number: its own probe, or the probe(s) whose measured plan
  * DOMINATES it (same exchanges over the same replicated feed, plus
  * stages the covered key doesn't have), with a one-line reason. An
  * EMPTY probe list declares that no corpus-scaling axis exists and the
  * note says why (fixture-shaped intake only).
  *
  * ScaleProbeCoverageSpec pins three invariants: totality (every
  * SparkEntry key mapped, no stale entries), referential integrity
  * (every referenced label is a real `time(...)`/`dirKey(...)` call in
  * ScaleProbe.scala, re-parsed from source so the sets cannot drift),
  * and justification (empty probe lists carry a reason).
  */
object ScaleProbeCoverage {

  /** All `time("…")` / `dirKey("…")` labels in ScaleProbe.scala — the
    * spec re-derives this set from the source and diffs it. */
  val probeKeys: Set[String] = Set(
    "activity_streaks", "asof_join_nearest", "attribution_shapley",
    "basket_pairs", "bfs_hops", "score_calibrate", "forecast_snaive",
    "time_in_state", "stream_forecast_snaive", "dup_spans",
    "stream_dup_spans",
    "changepoint_cusum", "acf_lags", "top_paths", "kcore_parts",
    "stream_top_paths",
    "ann_brute", "ann_graph_build", "ann_graph_build_scaledlists",
    "ann_graph_query40", "ann_ivf_stats", "ann_lsh", "ann_pq_topk",
    "communities_lpa", "record_linkage", "sssp_cost",
    "attribution_linear", "bloom_semi_join", "bucketed_join",
    "bm25_search", "bpe_encode", "bpe_resume",
    "bpe_vocab", "cc_stars_hub", "cdc_compact", "cdc_compact_rewrite",
    "chunk_documents",
    "cluster_sample", "compact_plan", "compact_rewrite", "corpus_mixture",
    "csv_roundtrip",
    "decontaminate", "decontaminate_containment", "decontaminate_fuzzy",
    "decontaminate_simhash", "dedup_clusters", "dedup_compare_sampled",
    "dedup_edit_distance", "dpp_prune",
    "dedup_exact", "dedup_incremental", "dedup_index_admit",
    "dedup_prefix_zipf", "dedup_inverted_zipf",
    "dedup_index_build", "dedup_index_fragment_x16", "dedup_index_probe",
    "dedup_index_probe_fragmented", "dedup_index_probe_postadmit",
    "dedup_index_probe_vacuumed", "dedup_index_vacuum", "dedup_keep_best",
    "dedup_minhash_lsh", "dedup_simhash", "diverse_topk_multi",
    "domain_caps", "dsir_select", "embed_pca", "embedding_quantize",
    "epoch_plan", "etl_receipts", "etl_webhook_json", "events_cube",
    "export_shards", "footer_prune3", "footer_prune3_hilbert",
    "fourgram_logprob", "funnel_retention", "hilbert3_layout",
    "hilbert4_layout", "hybrid_ivfpq_build", "hybrid_search_brute",
    "hybrid_search_probe", "ivf_build", "ivf_query40", "ivfpq_admit",
    "ivfpq_build", "ivfpq_query40", "ivfpq_refine_query40",
    "json_roundtrip",
    "kmeans_clusters", "kn_logprob", "layout_compare", "layout_compare3",
    "line_dedup", "linreg_trend", "lrs_per_doc", "mixture_temperature",
    "multimodal_containment",
    "multimodal_frames", "norm_dedup", "orc_roundtrip",
    "partition_evolution", "pack_sequences",
    "pack_sequences_bpe", "prepare_pretrain", "q5_multijoin",
    "quality_classifier", "quality_drift", "quality_ensemble",
    "range_join", "resample_ffill", "rfm_segments",
    "salted_join", "scd2_anomaly_mv",
    "schema_evolution", "semantic_dedup", "simhash_index_build",
    "skyline_2d", "snapshot_read", "suffix_array", "suffix_lcp",
    "fd_profile", "zipf_slope",
    "stream_linreg_trend", "stream_skyline",
    "simhash_index_probe", "stream_admission_chain", "stream_attribution",
    "stream_attribution_shapley", "stream_basket_pairs",
    "stream_cdc_compact", "stream_cluster_assign", "stream_decontaminate",
    "stream_dedup", "stream_dedup_ttl", "stream_embed_pca",
    "stream_entropy_gate",
    "stream_events", "stream_funnel", "stream_hh_topk", "stream_join",
    "stream_kn_score", "stream_line_dedup", "stream_nb_score",
    "stream_pack_bestfit", "stream_quality_drift",
    "stream_quality_ensemble", "stream_rfm", "stream_scd2",
    "stream_sessions",
    "stream_sessions_native", "stream_sessions_tws", "stream_topk",
    "stream_transitions",
    "stream_unigram_encode", "stream_upsert", "stream_weighted_sample",
    "substring_dedup", "substring_dedup_sa", "dup_spans_sa",
    "sa_index_build", "sa_index_probe",
    "ann_lsh_stats", "stream_ann_lsh_stats",
    "table_integrity", "text_entropy",
    "text_repetition", "tfidf_topterms", "triangle_count",
    "trigram_logprob",
    "uncertainty_sample", "unigram_encode", "unigram_logprob",
    "user_ltv",
    "vocab_fertility", "vocab_growth", "wordpiece_encode",
    "zorder3_layout", "zorder_prune", "zorder_write")

  /** Keys whose probe label IS the key. */
  private val sameName: Seq[String] = Seq(
    "activity_streaks", "asof_join_nearest", "attribution_shapley",
    "basket_pairs", "bfs_hops", "score_calibrate", "forecast_snaive",
    "time_in_state", "stream_forecast_snaive", "dup_spans",
    "stream_dup_spans",
    "changepoint_cusum", "acf_lags", "top_paths", "kcore_parts",
    "stream_top_paths",
    "ann_ivf_stats", "ann_pq_topk", "attribution_linear",
    "bloom_semi_join", "bucketed_join", "bm25_search",
    "bpe_encode", "bpe_vocab", "cdc_compact", "cdc_compact_rewrite",
    "chunk_documents",
    "cluster_sample", "compact_plan", "compact_rewrite", "corpus_mixture",
    "csv_roundtrip",
    "decontaminate", "decontaminate_containment", "decontaminate_fuzzy",
    "decontaminate_simhash", "dedup_clusters", "dedup_compare_sampled",
    "dedup_edit_distance", "dpp_prune",
    "dedup_exact", "dedup_incremental", "dedup_index_admit",
    "dedup_index_probe", "dedup_index_vacuum", "dedup_keep_best",
    "dedup_minhash_lsh", "dedup_simhash", "diverse_topk_multi",
    "domain_caps", "dsir_select", "embed_pca", "embedding_quantize",
    "epoch_plan", "etl_receipts", "etl_webhook_json", "events_cube",
    "export_shards", "footer_prune3", "footer_prune3_hilbert",
    "fourgram_logprob", "hilbert3_layout", "hilbert4_layout",
    "hybrid_search_probe", "json_roundtrip", "kmeans_clusters",
    "kn_logprob",
    "layout_compare", "layout_compare3", "line_dedup", "lrs_per_doc",
    "mixture_temperature", "multimodal_containment", "multimodal_frames",
    "norm_dedup", "orc_roundtrip", "partition_evolution",
    "pack_sequences", "pack_sequences_bpe",
    "communities_lpa",
    "prepare_pretrain", "q5_multijoin", "quality_classifier",
    "quality_drift", "quality_ensemble", "range_join", "record_linkage",
    "resample_ffill", "rfm_segments", "sssp_cost",
    "salted_join", "schema_evolution", "semantic_dedup",
    "simhash_index_probe", "skyline_2d", "snapshot_read",
    "suffix_array", "suffix_lcp", "fd_profile",
    "linreg_trend", "zipf_slope", "stream_linreg_trend", "stream_skyline",
    "stream_admission_chain", "stream_attribution",
    "stream_attribution_shapley", "stream_basket_pairs",
    "stream_cdc_compact", "stream_cluster_assign", "stream_decontaminate",
    "stream_dedup", "stream_dedup_ttl", "stream_embed_pca",
    "stream_entropy_gate",
    "stream_events", "stream_funnel", "stream_hh_topk", "stream_join",
    "stream_kn_score", "stream_line_dedup", "stream_nb_score",
    "stream_pack_bestfit", "stream_quality_drift",
    "stream_quality_ensemble", "stream_rfm", "stream_scd2",
    "stream_sessions",
    "stream_sessions_native", "stream_sessions_tws", "stream_topk",
    "stream_transitions",
    "stream_unigram_encode", "stream_upsert", "stream_weighted_sample",
    "substring_dedup", "substring_dedup_sa", "dup_spans_sa",
    "ann_lsh_stats", "stream_ann_lsh_stats",
    "table_integrity", "text_entropy",
    "text_repetition", "tfidf_topterms", "triangle_count",
    "trigram_logprob",
    "uncertainty_sample", "unigram_encode", "unigram_logprob",
    "user_ltv",
    "vocab_fertility", "vocab_growth", "wordpiece_encode",
    "zorder3_layout", "zorder_prune")

  /** query key → (probes carrying its 24× number, reason). */
  val coverage: Map[String, (Seq[String], String)] =
    sameName.map(k => k -> (Seq(k), "own probe")).toMap ++ Map(
      // --- ANN: key ↔ probe label spelling differences ---------------------
      "ann_brute_topk" -> (Seq("ann_brute"), "own probe (label differs)"),
      "ann_lsh_topk" -> (Seq("ann_lsh"), "own probe (label differs)"),
      "ann_ivf_topk" -> (Seq("ivf_build", "ivf_query40"),
        "build + nProbe-pruned query probed separately"),
      "ann_graph_topk" -> (Seq("ann_graph_build", "ann_graph_build_scaledlists",
        "ann_graph_query40"),
        "kNN-graph build (fixed + corpus-scaled lists) + beam search probed separately"),
      "ann_graph_probe" -> (Seq("ann_graph_build", "ann_graph_query40"),
        "stored-index probe = the same build + search halves; the degree-M re-cut is dominated by the build's edge cut over the same pairs"),
      "ann_ivfpq_topk" -> (Seq("ivfpq_build", "ivfpq_query40"),
        "build + ADC query probed separately"),
      "ann_ivfpq_refine" -> (Seq("ivfpq_refine_query40"),
        "own probe (label differs)"),
      "hybrid_search" -> (Seq("hybrid_search_brute"),
        "own probe (label differs; the probe variant also probed)"),
      // --- OLAP aggregations: dominated by the CUBE's Expand×4 agg ---------
      "q1_agg" -> (Seq("events_cube"), "one partial-agg exchange over a " +
        "fact scan; the probed CUBE runs the same agg under a 4x Expand"),
      "distinct_agg" -> (Seq("events_cube"),
        "two-phase partial agg, scan-bound — dominated by the CUBE"),
      "grouping_sets" -> (Seq("events_cube"),
        "ROLLUP is a subset of the probed CUBE's grouping lattice"),
      "pivot_events" -> (Seq("events_cube"),
        "conditional agg over the same replicated events scan"),
      "unpivot_wide" -> (Seq("events_cube"),
        "map-side Expand + agg — the CUBE's Expand shape"),
      "events_windowed" -> (Seq("events_cube"),
        "date_trunc agg over the same replicated events scan"),
      "events_sliding" -> (Seq("events_cube"),
        "slide-factor Expand + distinct agg — the CUBE's Expand shape"),
      "json_extract" -> (Seq("events_cube"), "from_json is a codegen map " +
        "over the same events scan; the agg after is O(keys)"),
      "table_profile" -> (Seq("events_cube"),
        "ONE scan with Expand-per-column exact distincts — the CUBE shape"),
      "value_histogram" -> (Seq("events_cube"), "1-row stats broadcast + " +
        "bucket agg — scan-bound, no shape beyond the probed aggs"),
      "distinct_incremental" -> (Seq("events_cube"), "HLL partial-agg " +
        "merges, each bounded-state and scan-dominated"),
      "window_topk" -> (Seq("events_cube"), "the (day,key) agg is the " +
        "cost; the top-k window runs on the O(days x types) aggregate"),
      // --- joins: dominated by the probed star / range / salted joins ------
      "q3_topk" -> (Seq("q5_multijoin"), "broadcast dims + one fact join " +
        "— a strict subset of the probed 6-way star"),
      "semi_anti_join" -> (Seq("q5_multijoin"),
        "left_semi/anti on the star's own keys — lighter than the inner"),
      "interval_overlap" -> (Seq("range_join"),
        "the probed bucketized interval equi-join plus a session agg"),
      "table_diff" -> (Seq("cdc_compact", "q5_multijoin"), "two " +
        "co-partitioned key exchanges over digest-shrunk snapshots — the " +
        "probed key-agg + join shapes"),
      // --- window-carry family: the scd2 chain runs lag+sum+lead over the
      //     same user-key exchange at 24× ---------------------------------
      "window_rank" -> (Seq("scd2_anomaly_mv"),
        "one group-key window exchange — the probed scd2 chain's shape"),
      "window_running" -> (Seq("scd2_anomaly_mv"),
        "one group-key frame window — same exchange shape"),
      "rolling_features" -> (Seq("scd2_anomaly_mv"),
        "one user-key range-frame window — same exchange shape"),
      "asof_join" -> (Seq("scd2_anomaly_mv"),
        "union + last-non-null carry is one user-key window"),
      "interval_coverage" -> (Seq("scd2_anomaly_mv"),
        "one user-key exchange: running-max + island agg — same chain"),
      "events_sessionize" -> (Seq("stream_sessions", "scd2_anomaly_mv"),
        "the stateful twin sessionizes the same replicated feed at 24x; " +
        "the batch spelling is one user-key window"),
      "event_transitions" -> (Seq("stream_transitions", "scd2_anomaly_mv"),
        "the streaming twin emits one edge per event over the same feed; " +
        "the batch lag window is the scd2 chain's shape"),
      "scd2_track" -> (Seq("scd2_anomaly_mv"), "own probe (shared label)"),
      "anomaly_robust" -> (Seq("scd2_anomaly_mv"),
        "own probe (shared label; production exact=false path)"),
      "mv_incremental" -> (Seq("scd2_anomaly_mv"),
        "own probe (shared label; mvMergeOn over split halves)"),
      "funnel" -> (Seq("funnel_retention"), "own probe (shared label)"),
      "retention" -> (Seq("funnel_retention"), "own probe (shared label)"),
      "attribution" -> (Seq("attribution_linear"), "last-touch is one " +
        "user-key carry window; the probed linear model adds the pair " +
        "join ON TOP — strictly dominates"),
      "attribution_time_decay" -> (Seq("attribution_linear"),
        "B72's probed plan exactly (same RangeJoin pairs, same " +
        "purchase-key window, same rollup) — the weight is one more " +
        "per-pair scalar"),
      "quantiles" -> (Seq("scd2_anomaly_mv"), "the probed anomaly board " +
        "runs approx_percentile t-digest aggregation at 24x"),
      "quantile_sketch" -> (Seq("scd2_anomaly_mv"),
        "same bounded-state sketch aggregation"),
      "ppl_band_select" -> (Seq("kn_logprob"), "the scorer IS the probed " +
        "KN plan; thresholds are one bounded 2-value percentile agg " +
        "(t-digest on the deploy path) and banding is a pure map"),
      "stream_substring_scrub" -> (Seq("substring_dedup",
        "stream_line_dedup"), "the frozen census trains offline; the " +
        "per-batch scrub is the probed C44 window census join (linear, " +
        "no pair join) riding the B67-probed parquet-sink drain — its " +
        "own 24x dirKey would trip the +1e8 seeding vs replica-shift " +
        "id-aliasing trap the ledger documents for dedup_compare"),
      "substring_scrub" -> (Seq("substring_dedup"), "the same window-df " +
        "census + 1:df join as the probed C44 (linear, no pair join); " +
        "the scrub adds a doc-keyed start-collect agg and pure array " +
        "algebra per row"),
      "stream_ppl_band" -> (Seq("stream_kn_score", "kn_logprob"),
        "the probed streaming KN scorer plus a literal-threshold banding " +
        "map; the frozen thresholds are two offline scalars"),
      "upsert_latest" -> (Seq("cdc_compact", "stream_upsert"),
        "the probed compaction IS the same one-key max-struct agg; the " +
        "streaming twin probed too"),
      "pagerank_nations" -> (Seq("triangle_count"), "iterates on the " +
        "FIXED 25-node nation graph; the only corpus-scaling stage is " +
        "the edge aggregation, probed in the graph joins"),
      // --- ETL: map stages over the shared staging etl_receipts builds -----
      "etl_clean" -> (Seq("etl_receipts"), "pure null-safe map over the " +
        "SAME shared invoice staging the probed key materializes + aggs"),
      "etl_category" -> (Seq("etl_receipts"), "when-tree map, same staging"),
      "etl_uom" -> (Seq("etl_receipts"), "when-tree map, same staging"),
      "etl_quantity" -> (Seq("etl_receipts"),
        "arithmetic when-tree map, same staging"),
      "etl_upc_sku" -> (Seq("etl_receipts"),
        "coalesce/lpad map, same staging"),
      "etl_prices" -> (Seq("etl_receipts"),
        "conditional concat map, same staging"),
      "etl_dates" -> (Seq("etl_receipts"), "to_date map, same staging"),
      "etl_document_id" -> (Seq("etl_receipts"),
        "hash-concat map, same staging"),
      "etl_receipts_nested" -> (Seq("etl_webhook_json"), "the probed " +
        "webhook render CONTAINS the nested receipt assembly"),
      "csv_intake" -> (Seq(), "fixture-shaped: reads the canned vendor-" +
        "CSV bytes, not the star — no corpus axis (bounded limit(100), " +
        "Intake.scala)"),
      "intake_listing" -> (Seq(), "fixture-shaped: O(files) catalog " +
        "listing of the canned intake dir — no corpus axis"),
      // --- tokenizers / LM / text maps -------------------------------------
      "bigram_logprob" -> (Seq("trigram_logprob"),
        "same plan family one n-gram order lower"),
      "bpe_roundtrip" -> (Seq("bpe_encode"),
        "decode is a map over encode's own output"),
      "wordpiece_vocab" -> (Seq("wordpiece_encode"), "vocab mining folds " +
        "the driver-bounded histogram; the probed encode pass carries " +
        "the corpus-scaling stage"),
      "unigram_vocab" -> (Seq("unigram_encode"),
        "EM trains on the word histogram — encode carries the scan"),
      "tokenizer_compare" -> (
        Seq("bpe_encode", "unigram_encode", "wordpiece_encode"),
        "the board unions the three probed encode passes' stats"),
      "phrase_merge" -> (Seq("bpe_vocab"), "phrase mining = the same " +
        "df-histogram aggregation; the fold is a codegen map"),
      "phrase_merge_rounds" -> (Seq("bpe_vocab", "bpe_resume"),
        "iterated mining rounds = the probed BPE round loop"),
      "ngram_topk" -> (Seq("bpe_vocab"),
        "one shingle-histogram partial agg + TakeOrdered"),
      "token_freq" -> (Seq("bpe_vocab"), "one token-histogram partial agg"),
      "token_pmi" -> (Seq("bpe_vocab"), "df + O(K^2)-bounded pair agg " +
        "over the same token-histogram shuffles"),
      "vocab_oov" -> (Seq("unigram_encode"),
        "driver-literal vocab; scoring is the probed kernel map"),
      "text_langid" -> (Seq("text_entropy", "text_repetition"),
        "pure codegen map over the same replicated text scan"),
      "text_readability" -> (Seq("text_entropy", "text_repetition"),
        "pure regexp-count map over the same text scan"),
      "langid_agreement" -> (Seq("text_entropy", "text_repetition"),
        "C10's scoring map over the same text scan; everything after is " +
        "O(langs^2) board rollups"),
      "stream_changepoint" -> (Seq("stream_forecast_snaive"),
        "the SAME append-mode day-window eviction machine (shared " +
        "dailyRevenueDrain); only the O(groups x days) read tail differs"),
      "stream_acf" -> (Seq("stream_forecast_snaive"),
        "the SAME shared dailyRevenueDrain machine; only the O(groups x " +
        "days) read tail differs"),
      "benford_audit" -> (Seq("linreg_trend"),
        "one lineitem map stage + an O(9) partial agg — strictly lighter " +
        "than the probed daily rollup + stats chain over the same feed"),
      "seasonal_detrend" -> (Seq("changepoint_cusum"),
        "the SAME daily rollup + one group-key window over the O(groups " +
        "x days) board — the probed CUSUM chain's shape"),
      "stream_benford" -> (Seq("stream_linreg_trend"),
        "same lineitem feed; the stateless per-batch digit partial is " +
        "strictly lighter than the probed day-window machine"),
      "stream_triangle" -> (Seq("triangle_count", "stream_join"),
        "per batch the arriving rows run the probed graph-join shape " +
        "into an O(nations²)-bounded canonical-edge partial agg; the " +
        "strong cut + wedge join ride the FIXED 25-node board " +
        "(triangle_count's own coverage argument)"),
      "winnow_df_census" -> (Seq("dedup_minhash_lsh", "substring_dedup"),
        "ONE O(hashes) df rollup over the same ~2/(w+1)-dense " +
        "selected-hash table winnow_overlap joins on — strictly lighter " +
        "than the probed overlap shapes"),
      "stream_pagerank" -> (Seq("triangle_count", "stream_join"),
        "per batch the arriving rows run the probed graph-join shape " +
        "into an O(nations²)-bounded partial agg; the rank iteration " +
        "rides the FIXED 25-node board (pagerank_nations' own coverage " +
        "argument)"),
      "distinct_theta_ops" -> (Seq("events_cube"),
        "one (segment, hash) distinct partial agg + the k-BOUNDED TopK " +
        "agg over the same events scan — B37's probed partial-agg shape " +
        "with hard-capped state; the pair algebra rides the " +
        "O(segments·k) sketch board, never the corpus"),
      "ccf_leadlag" -> (Seq("acf_lags"),
        "the SAME daily rollup + exact-sum estimator shape; CCF's " +
        "pair join is date-keyed over the O(series × days) board where " +
        "ACF's is index-keyed — board-sized either way"),
      "stream_ccf" -> (Seq("acf_lags", "stream_forecast_snaive"),
        "the SAME dailyRevenueDrain machine the snaive probe measures " +
        "(B106's twin rides it too); only the board-sized read tail " +
        "differs"),
      "ab_ttest" -> (Seq("events_cube"),
        "one (type, arm) partial-agg exchange over the same replicated " +
        "events feed the cube probes with MORE grouping sets; the t/df " +
        "math is board-sized"),
      "stream_ab_ttest" -> (Seq("events_cube", "stream_events"),
        "per batch the same single partial agg; merge + t math are " +
        "board-sized at read"),
      "stream_communities" -> (Seq("communities_lpa", "stream_basket_pairs"),
        "B113's identical settled-basket pair machine (shared spelling) " +
        "+ B130's probed at-read LPA over the merged support board"),
      "stream_sssp" -> (Seq("sssp_cost", "stream_join"),
        "per batch ONE lineitem⋈static-orders join + the (c,s,ok) " +
        "distinct partial; the weight rollup + relax loop is B128's " +
        "probed at-read plan over the merged links"),
      "linkage_golden" -> (Seq("record_linkage"),
        "the same blocking+scoring plan plus two board-sized class " +
        "rollups (bounded heap + count) re-joined onto the master side"),
      "stream_record_linkage" -> (Seq("record_linkage", "stream_join"),
        "per batch the SAME blocking+scoring joins over a batch-local " +
        "import view against the frozen A side — the batch plan is " +
        "B126's own, the drain harness is stream_join's"),
      "stream_retention" -> (Seq("funnel_retention", "stream_events"),
        "per batch ONE distinct partial agg shrinks arrivals to (user, " +
        "week) rows; the read board is B20's probed plan over the " +
        "merged grid — strictly lighter than the probed raw-event feed"),
      "stream_user_ltv" -> (Seq("user_ltv", "stream_events"),
        "per batch ONE (user, week) partial agg; the read tail is the " +
        "probed B90 cohort join + rollup over the merged grid, which " +
        "is strictly smaller than the probed event feed"),
      "stream_interval_coverage" -> (Seq("scd2_anomaly_mv",
        "stream_events"),
        "per batch B36's one-exchange island sweep (the probed " +
        "user-key window-carry shape) over the arrivals only; the read " +
        "re-sweep runs the same shape over O(islands) <= O(events)"),
      "stream_theta_ops" -> (Seq("events_cube", "stream_events"),
        "per batch B122's own probed shape (distinct partial agg + the " +
        "k-BOUNDED TopK agg) over arrivals only; the read fold re-slices " +
        "O(segments·k·batches) stored sketch rows, never the corpus"),
      "stream_activity_streaks" -> (Seq("activity_streaks",
        "stream_events"),
        "per batch ONE distinct partial agg shrinks arrivals to (user, " +
        "day) rows; the read tail is the probed B79 single-exchange " +
        "island chain over the merged day grid"),
      "stream_kcore" -> (Seq("stream_basket_pairs", "kcore_parts"),
        "the SAME settled-basket machine and pair partials as the " +
        "probed B94 drain (minus its item/basket boards); the read " +
        "tail is the support cut + the probed kcore peel over the " +
        "O(frequent pairs) board"),
      "skew_audit" -> (Seq("fd_profile"),
        "the SAME per-candidate census pattern (key partial agg + 1-row " +
        "rollup, unioned) the probed FD board runs with an exact " +
        "count-distinct ON TOP"),
      "rate_wilson" -> (Seq("q5_multijoin"),
        "one distinct + semi join on the star's own keys + an " +
        "O(nations) rollup — a strict subset of the probed star"),
      "substring_dedup_sa" -> (Seq("substring_dedup_sa", "sa_index_build",
        "sa_index_probe"),
        "own probe measures the BUILD price (the doubling chain); the " +
        "r14 persisted index splits build from the steady-state probe " +
        "the driver key now runs (sa_index_build / sa_index_probe)"),
      "dup_spans_sa" -> (Seq("dup_spans_sa", "sa_index_build",
        "sa_index_probe"),
        "same split: the chain is the build price, the driver key " +
        "probes the stored index"),
      "dedup_jaccard_prefix" -> (Seq("dedup_prefix_zipf",
        "dedup_inverted_zipf", "dedup_minhash_lsh"),
        "own probe on the df-skewed boilerplate shape the filter exists " +
        "for, head-to-head vs C4's inverted join (the r14 crossover " +
        "ask): prefix 9.2 s vs inverted 142.8 s at 55k docs with max " +
        "df 26k (7.8e8 inverted candidate rows vs 29k prefix pairs), " +
        "IDENTICAL 5000-row output; on MILD skew the inverted join " +
        "still wins (6.2 s vs 9.0 s) — the crossover is hot-key " +
        "fanout, now bounded on both sides"),
      "leakage_safe_split" -> (Seq("dedup_clusters", "cluster_sample"),
        "C17's probed cluster build + a pure hash-map assignment over " +
        "the (doc, cluster) frame — the split adds zero exchanges to " +
        "the probed CC"),
      "stream_winnow" -> (Seq("dedup_minhash_lsh", "stream_line_dedup"),
        "per batch the arrivals' map-side winnow selection (one doc-key " +
        "window, strictly lighter than the probed stream census); the " +
        "read join is C111's capped band-bucket shape"),
      "winnow_fingerprint" -> (Seq("substring_dedup", "text_repetition"),
        "one gram explode + ONE doc-key window + doc-key rollups — " +
        "strictly lighter than the probed window census over the same " +
        "corpus (which shuffles the gram strings; winnow shuffles one " +
        "BIGINT per position)"),
      "winnow_spans" -> (Seq("dedup_minhash_lsh", "dup_spans"),
        "the capped C111 pair board + fingerprint-sparse position " +
        "joins + the probed island-merge window shape — every frame " +
        "≈2/(w+1) of the gram stream the probed census scans"),
      "winnow_overlap" -> (Seq("dedup_minhash_lsh", "substring_dedup"),
        "the probed band-bucket self-join shape over the ~2/(w+1)-dense " +
        "selected-hash table, with the df cap bounding per-key fanout " +
        "like the band buckets"),
      "text_quality" -> (Seq("text_entropy", "text_repetition"),
        "pure codegen map over the same text scan"),
      "text_tokens" -> (Seq("text_entropy", "text_repetition"),
        "pure codegen map over the same text scan"),
      "text_pii_scrub" -> (Seq("text_entropy", "text_repetition"),
        "regexp map over the same text scan"),
      "doc_fingerprint" -> (Seq("text_entropy", "text_repetition"),
        "rolling-hash map over the same text scan"),
      "text_compress_ratio" -> (Seq("text_entropy", "text_repetition"),
        "per-row codec map over the same text scan"),
      "quality_filter_chain" -> (Seq("prepare_pretrain", "quality_drift"),
        "qualityFlagsOn is the probed gate stage of both"),
      "curate_pipeline" -> (Seq("prepare_pretrain"), "the probed " +
        "composition: gates + content-hash dedup + survivor join + pack"),
      // --- dedup / eval -----------------------------------------------------
      "dedup_compare" -> (Seq("dedup_compare_sampled"), "the board at 24x " +
        "runs the sampled deploy path; the exact C4 join is the " +
        "documented quadratic (350.7 s at 24x, r10) sampleDenomB bounds"),
      "dedup_ngram_jaccard" -> (Seq("dedup_compare_sampled"),
        "same C4 census; exact pair join quadratic by design at gate"),
      "dedup_clusters_stars" -> (Seq("cc_stars_hub"),
        "own probe (adversarial hub+chain topology)"),
      "dedup_embedding" -> (Seq("ann_brute", "semantic_dedup"),
        "brute cosine pair join = the probed broadcast cross-join; the " +
        "deploy path is the probed cluster-bounded banding"),
      "embed_stats" -> (Seq("embed_pca"),
        "per-dim moment aggregation — one Gram-style probed pass"),
      "near_dup_eval" -> (Seq("decontaminate_fuzzy", "dedup_minhash_lsh"),
        "detector side = probed band join; the exact-truth audit is " +
        "gate-diagnostic by design (sampled slice at deploy)"),
      "mine_pairs" -> (Seq("dedup_minhash_lsh", "decontaminate_fuzzy"),
        "band join + per-pair verify joins, both probed"),
      "diverse_topk" -> (Seq("diverse_topk_multi"),
        "single-query case of the probed multi board"),
      "sample_split" -> (Seq("text_entropy"),
        "hash-deterministic map split — scan-bound, no extra exchange"),
      "stratified_sample" -> (Seq("domain_caps"),
        "per-stratum rank window over the probed source-keyed exchange"),
      "weighted_sample" -> (Seq("stream_weighted_sample"),
        "the probed streaming twin's k-bounded heap; batch = TakeOrdered"),
      "pack_bestfit" -> (Seq("stream_pack_bestfit", "pack_sequences"),
        "the probed streaming best-fit + the probed batch packer"),
      // --- multimodal -------------------------------------------------------
      "multimodal_meta" -> (Seq("multimodal_frames"),
        "metadata derivation is the probed decode map minus the frame loop"),
      "multimodal_dedup" -> (Seq("multimodal_containment",
        "multimodal_frames"), "pHash band equi-join over the decode-" +
        "derived sketches; the probed decode + broadcast join dominate"),
      "multimodal_similar" -> (Seq("multimodal_containment", "ann_brute"),
        "feature cosine pairs = the probed bounded cross-join shape"),
      "phash_index_probe" -> (Seq("dedup_index_probe",
        "multimodal_containment"), "same persisted band-index probe " +
        "shape as the probed dedup index, over the O(media) sketches"),
      // --- streaming keys whose core is probed under another label ---------
      "stream_index_probe" -> (Seq("dedup_index_build", "dedup_index_probe",
        "stream_admission_chain"), "the gate key is the probed build + " +
        "probe run per batch; the admission chain probes the composed join"),
      "stream_mv" -> (Seq("scd2_anomaly_mv", "stream_topk"),
        "mvDailyAggOn probed in the scd2 board; streaming agg state " +
        "shape = the probed (day,key) counters"),
      "stream_phash_probe" -> (Seq("multimodal_containment",
        "dedup_index_probe"), "per-batch persisted-index band probe over " +
        "the O(media) sketch table"),
      "stream_quality_gate" -> (Seq("stream_quality_drift",
        "prepare_pretrain"), "same qualityFlagsOn map per batch; state " +
        "is O(reasons)"),
      "stream_quantile_sketch" -> (Seq("stream_quality_drift"),
        "bounded sketch-state streaming agg of the same shape"),
      "stream_schema_evolution" -> (Seq("schema_evolution"),
        "the probed two-era mergeSchema census through a bounded drain"),
      // --- layout: 2-D keys dominated by the probed 3-D/4-D family ---------
      "footer_prune" -> (Seq("footer_prune3"),
        "the 2-D audit is the probed 3-D plan minus one key column"),
      "footer_prune_hilbert" -> (Seq("footer_prune3_hilbert"),
        "2-D variant of the probed 3-D hilbert audit"),
      "hilbert_layout" -> (Seq("hilbert3_layout", "hilbert4_layout"),
        "d=2 walk of the same codegen expression family; 3-D/4-D probed"),
      "hilbert_prune" -> (Seq("zorder_prune", "footer_prune3_hilbert"),
        "same O(files) footer audit with the hilbert key"),
      "zorder_layout" -> (Seq("zorder_write", "zorder3_layout"),
        "the probed 64-file z-ordered write + the probed 3-D layout"))
}
