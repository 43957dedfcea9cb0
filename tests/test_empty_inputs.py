"""Robustness: representative queries over EMPTY tables (same schemas,
zero rows) must plan and execute to empty results, not crash — the
behavior a pipeline needs when a partition/day has no data."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from local_stream_stack_spark.catalog import TABLES, load_table
from local_stream_stack_spark.queries import QUERIES

# one per operator family; excludes model-training ops (PQ/IVF need a
# non-empty sample by contract) and streaming e2e (own harness)
REPRESENTATIVE = [
    "q1_pricing_summary",        # scan+agg
    "q3_shipping_priority",      # join+topk
    "join_outer_full",           # outer join
    "window_ranking",            # windows
    "grouping_sets_revenue",     # expand
    "latest_per_key",            # compaction
    "asof_join_events",          # as-of union+window
    "interval_join_peak_windows",# binned interval join
    "dedup_exact",               # dedup
    "dedup_ngram_jaccard",       # inverted index join
    "dedup_components",          # iterative graph
    "chunk_documents",           # row expansion
    "pack_documents",            # global window cumsum
    "text_stats",                # regex battery
    "funnel_stages",             # staged funnels (1 row of zeros/nulls)
    "percentile_stats",          # 3-pass quantiles
    # round-5 families
    "kmeans_embeddings",         # iterative clustering (empty seeds)
    "kmv_distinct_rollup",       # sketch window + rollup
    "cms_heavy_hitters",         # sketch grid
    "zorder_layout_events",      # bitwise layout agg
    "zonemap_pruning_stats",     # layout stats (2 summary rows)
    "compaction_bin_packing",    # per-partition prefix sums
    "skew_diagnostics",          # top-k + broadcast summary
    "token_estimate_bpe",        # regex battery + ratio agg
    "multimodal_features",       # mapInPandas (empty Arrow batches)
    "multimodal_frame_sample",   # row-expanding mapInPandas
    "embedding_matryoshka_mass", # array folds + ratio agg
    "pipe_syntax_revenue",       # SQL pipe syntax
    "sql_udf_netprice",          # SQL-defined UDF
    "triangle_count",            # 3-way self join (1 row of zeros)
    # round-6 families
    "multimodal_png_decode",     # real-codec mapInPandas
    "bpe_train_merges",          # iterative training (no pairs)
    "bpe_vocab_counts",          # encode over empty vocab
    "dedup_repeated_ngram_spans",  # gram inverted index
    "perplexity_bigram_interp",  # bigram LM (no bigram events)
    "sim_ivfpq_topk",            # composed ANN (empty seeds/books)
    # round-6 post-close families
    "quality_filter_gopher",     # array HOF battery
    "regression_by_nation",      # decimal moment sums
    "kmv_overlap_daily",         # sketch pair union
    "dedup_substring_spans",     # positional gram join + islands
    "session_paths_top",         # sessionize + leads
    "chisq_lang_source",         # contingency windows
    "source_mixing_weights",     # sqrt temperature weights
    "doc_novelty_scores",        # first-occurrence join
    "attribution_last_touch",    # as-of + rollup
    "embedding_quantize_pct",    # percentile calibration
    "conversion_lag_quantiles",  # as-of + 3-pass quantiles
    "boilerplate_ngrams",        # gram df top-k
    "stats_profile_orders",      # per-column profile passes
    "vocab_coverage",            # scalar coverage row
    "daily_count_anomalies",     # moment-sum z-scores
    "hourly_value_quantiles",    # keyed 3-pass quantiles
    "referential_integrity_audit",  # anti-join checks (3 zero rows)
    "kmv_rolling_wau",           # rolling sketch union
    "copurchase_bfs_hops",       # frontier BFS (no seed)
    "schema_evolution_roundtrip",  # mergeSchema write/read
    "orders_monthly_yoy",        # month-series lags
    "basket_lift_pairs",         # basket self-join
    "lang_id_confusion",         # classifier cells
    "value_histogram_log2",      # log2 buckets
    "customer_decile_transitions",  # ntile mobility
    "dedup_cluster_sizes",       # components histogram
    "dedup_prefix_clusters",     # prefix-hash groupBy
    "customer_rfm_scores",       # triple ntile cells
    "supplier_pareto_abc",       # cumulative-share classes
    "revenue_gini_lorenz",       # lorenz deciles + gini scalar
    "benford_first_digit",       # digit histogram
    "corr_matrix_lineitem",      # moment-sum correlations
    "active_streaks",            # gaps-and-islands distribution
    "dedup_token_sort",          # vocab-set fingerprint groupBy
    "minhash_calibration",       # estimator calibration bins
    "zipf_token_fit",            # vocab rank window + moment fit
    "join_explosion_audit",      # per-key pair prediction top-k
    # round-7 families
    "orders_backlog_aging",      # age buckets vs scalar max date
    "event_transition_matrix",   # lead() bigram cells
    "session_entropy_per_user",  # per-session plog2p sums
    "hhi_market_concentration",  # share-of-total squares
    "weekday_activity_profile",  # isodow pivot cells
    "embedding_dim_variance_audit",  # per-dim moment sums
    "ship_lag_quantiles",        # date-diff 3-pass quantiles
    "dedup_rate_by_source",      # per-source LSH near-dup rate
    "multimodal_wav_decode",     # real WAV codec mapInPandas
    "multimodal_video_frames",   # real AVI codec row expansion
    "sim_recall_calibration",    # composed ANN recall join
    "pii_scrub_stats",           # regex scrub battery
    "embedding_pca_power",       # iterative power method (typed empty)
    "copurchase_pagerank",       # distributed iterative graph ranks
    # round-7 second batch
    "vocab_coverage_curve",      # top-k cumsum vs threshold join
    "blocklist_filter_stats",    # regex blocklist BNLJ + rates
    "dedup_canonical_pick",      # family windows + keep-best pick
    "k_anonymity_audit",         # QI class sizes vs thresholds
    "table_fingerprint_orders",  # xor-fold row checksums
    "asof_join_nearest",         # bidirectional asof union+windows
    "bootstrap_mean_ci",         # hash-replica resample CI
    "autocorr_daily_counts",     # integer ACF moment sums
    "user_adoption_curve",       # first-seen collapse + day cumsum
    "cusum_changepoint_revenue", # scaled-cusum window + top-1 pick
    "welch_t_sources",           # per-source vs rest moment t
    "minhash_band_sweep",        # three band groupings, one sig pass
    "source_overlap_matrix",     # LSH pairs by source pair
    "seasonal_naive_backtest",   # day-7 self-join scorer
    "markov_next_event_accuracy",# hash-fold train/test argmax
    "knn_label_purity",          # exact 5-NN label purity + MRR
    "bounce_rate_by_entry",      # sessionized entry-type depth stats
    "right_to_be_forgotten_audit",  # purge-impact broadcast audit
    "purchase_hazard_curve",     # censored discrete-time hazard
    "ab_test_analysis",          # hash arms + two-proportion z
    "dau_mau_stickiness",        # two-grain distinct engagement ratio
    # round-8 additions (the rank/ntile rewrites above — RFM, Pareto,
    # Gini, decile transitions, monthly YoY — stay covered by their
    # existing entries and now exercise with_global_rank on empty)
    "multimodal_jpeg_decode",    # real JPEG codec mapInPandas
    "quality_classifier_train",  # logreg trainer (zero-weight empty)
    "quality_classifier_score",  # integer-boundary scoring
    "quality_classifier_pr_curve",  # thresholded confusion counts
    "embedding_sim_histogram",   # stride-pair cosine buckets
    "tokens_retained_after_dedup",  # dedup ROI by source
    "vocab_novelty_by_source",   # first-source novel types
    "stratified_sample_exact",   # per-stratum md5-rank sample
    "jl_distortion_audit",       # literal-plane array folds (1 row)
    "group_split_leakage_audit", # user-hash split + leak check
    "cohort_retention_matrix",   # first-week collapse + week cells
    "qq_plot_price",             # rank-selected exact deciles
    "ewma_daily_revenue",        # ordered array fold (bounded days)
    "embedding_centroid_separation",  # label-vs-global centroid cos
    "dedup_simhash_hamming",     # chunk-bucket candidates + bit_count
    "snapshot_diff_orders",      # full-outer key diff + hash compare
    "dataset_card_summary",      # one-row corpus card (NULL shares)
    "events_anomaly_mad",        # rank-selected median/MAD screen
    # round-9 additions
    "curation_pipeline_yaml",    # YAML-driven curation e2e
    "multimodal_gif_decode",     # real GIF codec mapInPandas
    "skyline_price_size",        # Pareto frontier (grid + anti theta)
    "weighted_median_price_by_flag",  # weighted rank cumsum pick
    "mann_whitney_priority",     # doubled-rank U test (1 row)
    "fuzzy_join_symspell",       # deletion-neighborhood fuzzy join
    "wilson_ci_urgent_rate",     # per-segment Wilson bounds
    "spearman_qty_price",        # doubled-rank correlation (1 row)
    "theil_sen_daily_revenue",   # pairwise-slope median
    "quality_classifier_reliability",  # decile calibration bins
    "pettitt_changepoint_daily", # rank changepoint (0 rows empty)
    "bm25_topk_docs",            # lexical retrieval top-20
    "mutual_info_lang_source",   # PMI cells
    "copurchase_kcore",          # peeling profile (9 zero rows)
    "cross_entropy_source_pairs",  # source-pair LM matrix
    "ks_test_urgent_price",      # cross-multiplied KS sup gap
    "psi_price_drift_by_segment",  # log2-bin PSI vs rest
    "fuzzy_entity_clusters",     # symspell pairs -> components
    "wasserstein_price_urgent",  # CDF-gap integral
    "anova_f_segments",          # k-group F (0 rows empty)
    "conformal_forecast_intervals",  # split-conformal coverage
    # round-10 additions
    "friedman_test_segments",    # complete-block doubled ranks (0 rows)
    "levene_brown_forsythe_segments",  # median-deviation F (0 rows)
    "hodges_lehmann_urgent_shift",  # pairwise-diff median (NULL row)
    "kendall_tau_daily",         # concordance pair counts (NULL row)
    "seasonal_decomposition_weekday",  # 7-day MA seasonal (0 rows)
    "qld_topk_docs",             # Dirichlet LM retrieval
    "rrf_fusion_topk",           # hybrid rank fusion
    "kruskal_wallis_priority",   # k-group doubled-rank H (NULL row)
    "runs_test_daily_revenue",   # adjacent-rank run count (NULL row)
    "cohens_d_urgent_price",     # moment-sum effect size (NULL row)
    "cramers_v_lang_source",     # integer-chi2 effect size (NULL row)
    "js_divergence_sources",     # vocab-grid symmetric drift
    "hits_hubs_authorities",     # bipartite mutual-reinforcement ranks
    "adamic_adar_link_prediction",  # wedge-join common neighbors
    "rm3_expanded_retrieval",    # two-pass feedback retrieval
    "multimodal_qoi_decode",     # real QOI codec mapInPandas
    "multimodal_ico_decode",     # real ICO container mapInPandas
    "flesch_readability_by_source",  # regex readability battery
    "mojibake_encoding_audit",   # encoding-damage regex counters
    "char_entropy_quality",      # bounded char-expansion entropy
    "holt_linear_daily_revenue", # two-state integer fold (0 rows)
    "customer_jaccard_similarity",  # part-inverted-index pair join
    "mmr_diversified_topk",      # parameter-sized greedy rerank
    # round-11 additions
    "stream_bm25_compacted",     # maintained index + generation fold
    "stream_ingest_dedup_compacted",  # dedup store survives the fold
    "stream_join_enriched_incremental",  # two-sided join delta view
    "stream_aggregate_view_compacted",  # additive view across the fold
    "mann_kendall_trend_daily",  # pairwise trend + Sen slope (NULL row)
    "durbin_watson_daily_revenue",  # adjacent-residual ratio (NULL row)
    "ljung_box_daily_revenue",   # lag-window portmanteau (NULL row)
    "cochran_q_daily",           # binary blocked test (NULL row)
    "page_trend_test_segments",  # ordered Friedman (0 rows empty)
    "bloom_filter_fp_audit",     # portable bloom build + probe
    "tfidf_cosine_topk",         # vector-space retrieval top-20
    "clustering_coefficient_nodes",  # per-node triangle density
    "multimodal_tga_decode",     # real TGA codec mapInPandas
    "multimodal_pcx_decode",     # real PCX codec mapInPandas
    "stream_ingest_neardup_compacted",  # neardup store across the fold
    "jonckheere_terpstra_priority",  # ordered k-group trend (NULL row)
    "pl2_topk_docs",             # DFR retrieval top-20
    "label_propagation_communities",  # sync LPA communities
    "multimodal_midi_decode",    # real SMF codec mapInPandas
    "stream_ivf_index_incremental",  # maintained ANN index + fold
    "multimodal_au_g711_decode",  # real AU/G.711 codec mapInPandas
    "multimodal_pnm_decode",     # real netpbm codec mapInPandas
    "stream_kmv_compacted",      # KMV sketch across the fold
    # round-12 families
    "sign_test_daily_revenue",   # consecutive-day pair stats
    "grubbs_outlier_daily",      # argmax-deviation stats
    "moods_median_priority",     # value-histogram median + chi2
    "bartlett_test_priority",    # per-group variance logs
    "kendall_w_nation_months",   # concordance rank sums
    "fleiss_kappa_daily_raters", # rater-panel agreement
    "benjamini_hochberg_nations",# FDR over per-nation tests
    "dph_topk_docs",             # parameter-free DFR ranker
    "lateral_topk_suppliers",    # correlated LATERAL subquery
    "token_budget_truncation",   # per-lang budget cumsum
    "multimodal_tiff_decode",    # real TIFF codec mapInPandas
    "multimodal_mp3_meta",       # MP3 frame-header walk mapInPandas
    "multimodal_flac_meta",      # FLAC block-chain walk mapInPandas
    "decontaminate_semantic",    # cross-split LSH + cosine verify
    "active_streaks_doubling",   # log2 self-join chain doubling
    "mcnemar_paired_flags",      # paired-binary discordance counts
    "jarque_bera_daily_revenue", # moment-based normality gate
    "kuiper_test_urgent_price",  # two-sided ECDF gap statistic
    "dixon_q_daily_revenue",     # gap-to-range outlier ratios
    "anderson_darling_daily_revenue",  # tail-weighted normality
    "group_by_all_revenue",      # GROUP BY ALL / ORDER BY ALL surface
    "bitmap_zone_intersection",  # per-zone bigint mask AND
    "proximity_boost_topk",      # positional-index pair distances
    "term_burstiness_top",       # per-term VMR moment sums
    "cramer_von_mises_urgent_price",  # integrated ECDF gap
    "periodogram_daily_revenue", # cos/sin projections per period
    "markov_entropy_rate",       # conditional entropy of transitions
    "pacf_daily_revenue",        # lag-join partial autocorrelation
    "decision_stump_train",      # histogram Gini split search
    "welch_anova_priority",      # heteroscedastic k-sample F
    "recursive_cte_day_streaks", # WITH RECURSIVE iteration
    "keywords_per_doc_tfidf",    # per-doc ranked extraction
    "theil_u_lang_source",       # entropy/MI cell sums
    "ansari_bradley_urgent",     # both-ends rank dispersion
    "cronbach_alpha_nation_months",  # item-reliability moments
    "copurchase_ktruss",         # iterative triangle peeling
    "mode_qty_by_flag",          # histogram-derived mode
    "sentence_split_stats",      # regex segmentation stats
    # NOTE: Spark emits NO rows for GROUPING SETS over empty input
    # (DuckDB follows the standard and emits the () grand-total row);
    # pinned at Spark's behavior — the divergence exists only on
    # zero-row input, which the non-empty oracle tables never hit
    "grouping_id_revenue",       # GROUPING() markers over sets
    "quantile_normalize_doclen", # rank-to-order-statistic remap
    "brunner_munzel_urgent",     # pooled-vs-within rank placements
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    d = tempfile.mkdtemp(prefix="empty-sf-")
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# global aggregates legitimately emit summary rows over zero input
# rows (empty-count semantics), not an empty result
EXPECT_SUMMARY_ROWS = {
    "funnel_stages": 1,        # aggregate row of empty counts
    "triangle_count": 1,       # (n_triangles=0, n_edges=0)
    "kmv_distinct_rollup": 1,  # the 'ALL' rollup row (k_used=0)
    "zonemap_pruning_stats": 2,  # one summary row per layout
    "vocab_coverage": 1,         # scalar coverage row (NULL ratios)
    "referential_integrity_audit": 3,  # three checks, zero violations
    "corr_matrix_lineitem": 6,   # six pair rows with NULL corr
    "vocab_coverage_curve": 7,   # one row per threshold (zero coverage)
    "minhash_band_sweep": 3,     # one summary row per band config
    "right_to_be_forgotten_audit": 2,  # one summary row per table
    "ab_test_analysis": 1,       # single wide summary row (NULL arms)
    "quality_classifier_train": 5,  # one zero-weight row per feature
    "jl_distortion_audit": 1,    # single summary row (zero pairs)
    "dataset_card_summary": 1,   # one zero-count row, NULL shares
    "mann_whitney_priority": 1,  # single stats row (NULL z)
    "spearman_qty_price": 1,     # single stats row (NULL rho)
    "copurchase_kcore": 9,       # one profile row per round
    "ks_test_urgent_price": 1,   # single stats row (NULL D)
    "conformal_forecast_intervals": 1,  # single summary row
    "hodges_lehmann_urgent_shift": 1,  # single stats row (NULL shift)
    "kendall_tau_daily": 1,      # single stats row (NULL tau)
    "kruskal_wallis_priority": 1,  # single stats row (NULL H)
    "runs_test_daily_revenue": 1,  # single stats row (NULL z)
    "cohens_d_urgent_price": 1,  # single stats row (NULL d)
    "cramers_v_lang_source": 1,  # single stats row (NULL V)
    "mann_kendall_trend_daily": 1,   # single stats row (NULL z/slope)
    "durbin_watson_daily_revenue": 1,  # single stats row (NULL dw)
    "ljung_box_daily_revenue": 1,    # single stats row (NULL q)
    "cochran_q_daily": 1,            # single stats row (NULL q)
    "page_trend_test_segments": 1,   # single stats row (NULL z)
    "bloom_filter_fp_audit": 1,      # single audit row (0 members)
    "jonckheere_terpstra_priority": 1,  # single stats row (NULL z)
    "stream_kmv_compacted": 1,       # single sketch row (k_used 0)
    "sign_test_daily_revenue": 1,    # single stats row (NULL z)
    "moods_median_priority": 1,      # single stats row (k=0, NULLs)
    "bartlett_test_priority": 1,     # single stats row (k=0)
    "kendall_w_nation_months": 1,    # single stats row (NULL W)
    "fleiss_kappa_daily_raters": 1,  # single stats row (NULL kappa)
    "ansari_bradley_urgent": 1,      # single stats row (NULL z)
    "theil_u_lang_source": 1,        # single stats row (NULL U)
    "copurchase_ktruss": 6,          # one profile row per round
    "brunner_munzel_urgent": 1,      # single stats row (NULL w)
    "mcnemar_paired_flags": 1,       # single stats row (NULL chi2)
    "jarque_bera_daily_revenue": 1,  # single stats row (NULLs)
    "kuiper_test_urgent_price": 1,   # single stats row (NULL v)
    "dixon_q_daily_revenue": 1,      # single stats row (NULLs)
    "anderson_darling_daily_revenue": 1,  # single stats row (NULL a2)
    "bitmap_zone_intersection": 1,   # single audit row of zero counts
    "cramer_von_mises_urgent_price": 1,  # single stats row (NULL t)
    "markov_entropy_rate": 1,        # single stats row (NULL h)
    "pacf_daily_revenue": 1,         # single stats row (NULLs)
    "welch_anova_priority": 1,       # single stats row (k=0, NULLs)
}


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    rows = QUERIES[name].fn(spark, empty_sf_dir).collect()
    assert len(rows) == EXPECT_SUMMARY_ROWS.get(name, 0)
