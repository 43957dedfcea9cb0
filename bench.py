"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line (kept under ~1.9 KB — the driver captures
only the LAST 2,000 chars of stdout, which silently truncated round 6's
3.2 KB line into an unparseable tail; VERDICT r6 "What's wrong" #1):
  {"metric": "total_headline_query_sec", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": s, ...}, "sf": 0.1,
   "n_queries": 240, "worst5_vs_gate": {...}}

The full per-query map (headline + extended + tier-3 sweep + streaming
batch detail) is written to BENCH_DETAIL.json next to this file
($SPARK_GRAFT_BENCH_DETAIL overrides the path). Tier 3 measures every
registered query the first two tiers omit, once each (not best-of-N),
so no registered plan regresses invisibly; skip with
SPARK_GRAFT_BENCH_TIER3=0.

Execution uses the noop sink — the full plan runs (scan, shuffle,
aggregate) without driver-side collection, which is the honest
cluster-shaped measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_stream_stack_spark.queries import QUERIES  # noqa: E402
from local_stream_stack_spark.session import get_spark  # noqa: E402
from local_stream_stack_spark.streaming.metrics import MetricsListener  # noqa: E402

# Entries that execute a live micro-batch pipeline inside the query
# fn (every registered ``stream_*`` name). Their wall time is dominated
# by AvailableNow spin-up + state finalization (harness cost), which
# pollutes the 2x gate's signal (VERDICT r5 #5) — so alongside wall
# time the JSON reports the engine-side per-batch processing time from
# the StreamingQueryListener (plan cost: what a long-lived cluster
# pipeline actually pays per epoch). Gate semantics unchanged: the
# headline total stays wall.
def _is_streaming(name: str) -> bool:
    return name.startswith("stream_")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q7_nation_volume",
    "q10_returned_revenue",
    "q18_large_orders",
    "q2_top_supplier_per_part",
    "q13_order_count_dist",
    "q21_waiting_suppliers",
    "percentile_stats",
    "exact_quantile_distributed",
    "grouping_sets_revenue",
    "hash_agg_stats",
    "topk_per_group",
    "window_ranking",
    "window_frames",
    "latest_per_key",
    "asof_join_events",
    "sessionize_events",
    "tumbling_window_agg",
    "stream_tumbling_counts",
    "pivot_returnflag",
    "explode_token_counts",
    "array_hof_order_lines",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sim_bruteforce_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "multimodal_features",
    "text_stats",
    "lang_id",
    "curation_pipeline",
    "corpus_stats_by_lang",
]

# Training-tier queries added in rounds 3-4: measured with the same
# protocol and reported in the same JSON line under
# "queries_extended", but NOT in the headline total — the 2x gate was
# recorded on the 37-query set above and must stay comparable.
EXTENDED = [
    "shuffle_deterministic",
    "tfidf_top_terms",
    "semantic_dedup_components",
    "semantic_dedup_lsh_components",
    "stream_ingest_dedup",
    "perplexity_unigram",
    "dedup_containment",
    "embedding_quantize_int8",
    "quantile_by_value_qty",
    # round-5 additions. The two live streaming additions
    # (stream_interval_join_outer, stream_windowed_rollup_chain) are
    # correctness-gated but NOT measured here: their wall-clock is
    # dominated by micro-batch harness startup + watermark
    # finalization batches (~22 s / ~11 s per invocation at sf0.1),
    # which best-of-3 would triple for no plan-cost signal.
    "kmeans_embeddings",
    "sim_pq_topk",
    "kmv_distinct_rollup",
    "zonemap_pruning_stats",
    # round-6 additions
    "multimodal_png_decode",
    "bpe_train_merges",
    "bpe_vocab_counts",
    "dedup_repeated_ngram_spans",
    "perplexity_bigram_interp",
    "sim_ivfpq_topk",
    "sessionize_events_chunked",
    "event_gap_quantiles_chunked",
    # round-6 post-close additions
    "quality_filter_gopher",
    "regression_by_nation",
    "kmv_overlap_daily",
    "dedup_substring_spans",
    "session_paths_top",
    "chisq_lang_source",
    "source_mixing_weights",
    "doc_novelty_scores",
    "attribution_last_touch",
    "embedding_quantize_pct",
    "conversion_lag_quantiles",
    "boilerplate_ngrams",
    "stats_profile_orders",
    "vocab_coverage",
    "daily_count_anomalies",
    "hourly_value_quantiles",
    "referential_integrity_audit",
    "kmv_rolling_wau",
    "copurchase_bfs_hops",
    "schema_evolution_roundtrip",
    "orders_monthly_yoy",
    "basket_lift_pairs",
    "lang_id_confusion",
    "value_histogram_log2",
    "customer_decile_transitions",
    "dedup_cluster_sizes",
    "dedup_prefix_clusters",
    "customer_rfm_scores",
    "supplier_pareto_abc",
    "revenue_gini_lorenz",
    "benford_first_digit",
    "corr_matrix_lineitem",
    "active_streaks",
    "dedup_token_sort",
    "minhash_calibration",
    "zipf_token_fit",
    "join_explosion_audit",
    # round-7 additions
    "orders_backlog_aging",
    "event_transition_matrix",
    "session_entropy_per_user",
    "hhi_market_concentration",
    "weekday_activity_profile",
    "embedding_dim_variance_audit",
    "ship_lag_quantiles",
    "dedup_rate_by_source",
    "multimodal_wav_decode",
    "multimodal_video_frames",
    "sim_recall_calibration",
    "pii_scrub_stats",
    "embedding_pca_power",
    "copurchase_pagerank",
    # round-7 second batch
    "asof_join_nearest",
    "bootstrap_mean_ci",
    "vocab_coverage_curve",
    "blocklist_filter_stats",
    "dedup_canonical_pick",
    "k_anonymity_audit",
    "table_fingerprint_orders",
    "autocorr_daily_counts",
    "user_adoption_curve",
    "cusum_changepoint_revenue",
    "welch_t_sources",
    "minhash_band_sweep",
    # round-7 post-close batch
    "source_overlap_matrix",
    "seasonal_naive_backtest",
    "markov_next_event_accuracy",
    "knn_label_purity",
    "bounce_rate_by_entry",
    "right_to_be_forgotten_audit",
    "purchase_hazard_curve",
    "ab_test_analysis",
    "dau_mau_stickiness",
    # round-8 additions
    "multimodal_jpeg_decode",
    "quality_classifier_train",
    "quality_classifier_score",
    "quality_classifier_pr_curve",
    "embedding_sim_histogram",
    "tokens_retained_after_dedup",
    "vocab_novelty_by_source",
    "stratified_sample_exact",
    "jl_distortion_audit",
    "group_split_leakage_audit",
    "cohort_retention_matrix",
    "qq_plot_price",
    "ewma_daily_revenue",
    "embedding_centroid_separation",
    "dedup_simhash_hamming",
    "snapshot_diff_orders",
    "dataset_card_summary",
    "events_anomaly_mad",
    # round-9 additions
    "multimodal_gif_decode",
    "curation_pipeline_yaml",
    "skyline_price_size",
    "weighted_median_price_by_flag",
    "mann_whitney_priority",
    "stream_curation_yaml",
    "fuzzy_join_symspell",
    "wilson_ci_urgent_rate",
    "spearman_qty_price",
    "theil_sen_daily_revenue",
    "sim_lsh_multiprobe_topk",
    "quality_classifier_reliability",
    "pettitt_changepoint_daily",
    "bm25_topk_docs",
    "mutual_info_lang_source",
    "copurchase_kcore",
    "cross_entropy_source_pairs",
    "ks_test_urgent_price",
    "psi_price_drift_by_segment",
    "fuzzy_entity_clusters",
    "wasserstein_price_urgent",
    "stream_psi_monitor",
    "anova_f_segments",
    "conformal_forecast_intervals",
    # round-10 additions (the lighter maintained-view entries land in
    # the tier-3 sweep automatically)
    "stream_ingest_neardup_tws",
    "stream_bm25_incremental",
    "stream_scd2_dimension",
    "friedman_test_segments",
    "levene_brown_forsythe_segments",
    "hodges_lehmann_urgent_shift",
    "kendall_tau_daily",
    "seasonal_decomposition_weekday",
    "qld_topk_docs",
    "rrf_fusion_topk",
    "multimodal_bmp_decode",
]


# v2.0 recorded gate (BASELINE.md round 5, best-of-5, sf0.1): used only
# to surface the worst per-query ratios in the compact stdout line so
# the driver sees regressions without the full map.
GATE = {
    "array_hof_order_lines": 0.337, "asof_join_events": 0.751,
    "corpus_stats_by_lang": 0.694, "curation_pipeline": 1.328,
    "dedup_embedding_cosine": 1.203, "dedup_exact": 0.243,
    "dedup_minhash_lsh": 1.884, "exact_quantile_distributed": 1.517,
    "explode_token_counts": 0.214, "grouping_sets_revenue": 0.983,
    "hash_agg_stats": 0.642, "lang_id": 0.492, "latest_per_key": 0.459,
    "multimodal_features": 0.485, "percentile_stats": 1.901,
    "pivot_returnflag": 0.497, "q10_returned_revenue": 0.760,
    "q13_order_count_dist": 0.513, "q18_large_orders": 1.396,
    "q1_pricing_summary": 1.055, "q21_waiting_suppliers": 0.872,
    "q2_top_supplier_per_part": 1.242, "q3_shipping_priority": 0.930,
    "q4_order_priority": 0.764, "q5_local_supplier_volume": 1.372,
    "q6_forecast_revenue": 0.274, "q7_nation_volume": 0.987,
    "sessionize_events": 0.794, "sim_bruteforce_topk": 0.659,
    "sim_ivf_topk": 0.941, "sim_lsh_topk": 0.925,
    "stream_tumbling_counts": 2.096, "text_stats": 0.776,
    "topk_per_group": 0.559, "tumbling_window_agg": 0.362,
    "window_frames": 0.510, "window_ranking": 0.518,
}


# v3.0 recorded gate (BASELINE.md round 9, best-of-5, quiet host,
# sf0.1): per-query anchors over headline AND extended tiers. Worst
# ratios surface in the stdout line as worst5_vs_gate_v3. Regenerate
# ONLY from a quiet-host best-of-5 run:
#   python tools/record_gate_v3.py   (reads BENCH_DETAIL.json)
# BEGIN GATE_V3 (auto-generated)
GATE_V3: dict[str, float] = {
    "ab_test_analysis": 0.322,
    "active_streaks": 0.462,
    "array_hof_order_lines": 0.377,
    "asof_join_events": 0.618,
    "asof_join_nearest": 0.834,
    "attribution_last_touch": 0.912,
    "autocorr_daily_counts": 0.609,
    "basket_lift_pairs": 1.614,
    "benford_first_digit": 0.303,
    "blocklist_filter_stats": 0.722,
    "bm25_topk_docs": 0.965,
    "boilerplate_ngrams": 1.205,
    "bootstrap_mean_ci": 1.178,
    "bounce_rate_by_entry": 0.536,
    "bpe_train_merges": 2.115,
    "bpe_vocab_counts": 1.908,
    "chisq_lang_source": 0.518,
    "cohort_retention_matrix": 0.416,
    "conversion_lag_quantiles": 2.805,
    "copurchase_bfs_hops": 2.791,
    "copurchase_kcore": 2.398,
    "copurchase_pagerank": 1.044,
    "corpus_stats_by_lang": 0.708,
    "corr_matrix_lineitem": 1.340,
    "cross_entropy_source_pairs": 0.596,
    "curation_pipeline": 1.563,
    "curation_pipeline_yaml": 1.622,
    "customer_decile_transitions": 1.729,
    "customer_rfm_scores": 3.153,
    "cusum_changepoint_revenue": 0.929,
    "daily_count_anomalies": 0.366,
    "dataset_card_summary": 0.638,
    "dau_mau_stickiness": 0.380,
    "dedup_canonical_pick": 0.482,
    "dedup_cluster_sizes": 5.160,
    "dedup_containment": 2.712,
    "dedup_embedding_cosine": 0.793,
    "dedup_exact": 0.288,
    "dedup_minhash_lsh": 2.117,
    "dedup_prefix_clusters": 0.322,
    "dedup_rate_by_source": 1.891,
    "dedup_repeated_ngram_spans": 2.507,
    "dedup_simhash_hamming": 3.862,
    "dedup_substring_spans": 2.791,
    "dedup_token_sort": 0.397,
    "doc_novelty_scores": 1.845,
    "embedding_centroid_separation": 0.487,
    "embedding_dim_variance_audit": 0.357,
    "embedding_pca_power": 0.929,
    "embedding_quantize_int8": 0.594,
    "embedding_quantize_pct": 1.995,
    "embedding_sim_histogram": 0.577,
    "event_gap_quantiles_chunked": 3.542,
    "event_transition_matrix": 0.569,
    "events_anomaly_mad": 1.916,
    "ewma_daily_revenue": 0.407,
    "exact_quantile_distributed": 1.674,
    "explode_token_counts": 0.238,
    "fuzzy_entity_clusters": 1.357,
    "fuzzy_join_symspell": 0.469,
    "group_split_leakage_audit": 0.611,
    "grouping_sets_revenue": 1.012,
    "hash_agg_stats": 0.516,
    "hhi_market_concentration": 0.693,
    "hourly_value_quantiles": 1.404,
    "jl_distortion_audit": 0.668,
    "join_explosion_audit": 0.624,
    "k_anonymity_audit": 0.535,
    "kmeans_embeddings": 1.474,
    "kmv_distinct_rollup": 0.851,
    "kmv_overlap_daily": 1.080,
    "kmv_rolling_wau": 0.796,
    "knn_label_purity": 2.512,
    "ks_test_urgent_price": 1.209,
    "lang_id": 0.529,
    "lang_id_confusion": 0.575,
    "latest_per_key": 0.349,
    "mann_whitney_priority": 0.900,
    "markov_next_event_accuracy": 0.851,
    "minhash_band_sweep": 4.224,
    "minhash_calibration": 5.428,
    "multimodal_features": 0.614,
    "multimodal_gif_decode": 0.980,
    "multimodal_jpeg_decode": 1.621,
    "multimodal_png_decode": 2.155,
    "multimodal_video_frames": 3.729,
    "multimodal_wav_decode": 1.201,
    "mutual_info_lang_source": 0.492,
    "orders_backlog_aging": 0.350,
    "orders_monthly_yoy": 0.926,
    "percentile_stats": 1.979,
    "perplexity_bigram_interp": 1.732,
    "perplexity_unigram": 0.664,
    "pettitt_changepoint_daily": 2.214,
    "pii_scrub_stats": 0.585,
    "pivot_returnflag": 0.543,
    "psi_price_drift_by_segment": 0.914,
    "purchase_hazard_curve": 0.695,
    "q10_returned_revenue": 0.832,
    "q13_order_count_dist": 0.487,
    "q18_large_orders": 1.387,
    "q1_pricing_summary": 0.984,
    "q21_waiting_suppliers": 0.871,
    "q2_top_supplier_per_part": 1.392,
    "q3_shipping_priority": 0.768,
    "q4_order_priority": 0.808,
    "q5_local_supplier_volume": 1.347,
    "q6_forecast_revenue": 0.247,
    "q7_nation_volume": 1.077,
    "qq_plot_price": 1.476,
    "quality_classifier_pr_curve": 1.832,
    "quality_classifier_reliability": 1.490,
    "quality_classifier_score": 1.459,
    "quality_classifier_train": 2.094,
    "quality_filter_gopher": 1.173,
    "quantile_by_value_qty": 0.920,
    "referential_integrity_audit": 0.749,
    "regression_by_nation": 1.588,
    "revenue_gini_lorenz": 1.655,
    "right_to_be_forgotten_audit": 0.370,
    "schema_evolution_roundtrip": 0.578,
    "seasonal_naive_backtest": 0.385,
    "semantic_dedup_components": 3.563,
    "semantic_dedup_lsh_components": 4.922,
    "session_entropy_per_user": 0.467,
    "session_paths_top": 0.528,
    "sessionize_events": 0.768,
    "sessionize_events_chunked": 1.079,
    "ship_lag_quantiles": 0.987,
    "shuffle_deterministic": 0.957,
    "sim_bruteforce_topk": 0.656,
    "sim_ivf_topk": 0.978,
    "sim_ivfpq_topk": 5.908,
    "sim_lsh_multiprobe_topk": 0.958,
    "sim_lsh_topk": 0.943,
    "sim_pq_topk": 3.782,
    "sim_recall_calibration": 5.997,
    "skyline_price_size": 0.351,
    "snapshot_diff_orders": 0.621,
    "source_mixing_weights": 0.402,
    "source_overlap_matrix": 1.927,
    "spearman_qty_price": 2.577,
    "stats_profile_orders": 1.292,
    "stratified_sample_exact": 0.242,
    "stream_curation_yaml": 2.205,
    "stream_ingest_dedup": 1.883,
    "stream_psi_monitor": 2.359,
    "stream_tumbling_counts": 2.150,
    "supplier_pareto_abc": 0.968,
    "table_fingerprint_orders": 0.512,
    "text_stats": 0.857,
    "tfidf_top_terms": 0.649,
    "theil_sen_daily_revenue": 7.417,
    "tokens_retained_after_dedup": 0.413,
    "topk_per_group": 0.379,
    "tumbling_window_agg": 0.363,
    "user_adoption_curve": 0.709,
    "value_histogram_log2": 0.231,
    "vocab_coverage": 0.335,
    "vocab_coverage_curve": 1.052,
    "vocab_novelty_by_source": 0.478,
    "wasserstein_price_urgent": 1.523,
    "weekday_activity_profile": 0.248,
    "weighted_median_price_by_flag": 2.086,
    "welch_t_sources": 0.276,
    "wilson_ci_urgent_rate": 0.373,
    "window_frames": 0.457,
    "window_ranking": 0.458,
    "zipf_token_fit": 0.881,
    "zonemap_pruning_stats": 0.502,
}
# END GATE_V3


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="bench")

    # warm the JVM/catalog and the Python/Arrow worker pool so the
    # first measured query isn't paying one-time session/worker spawn
    # (workers are reused across queries; steady-state is what a
    # long-lived cluster sees)
    QUERIES["q6_forecast_revenue"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Best-of-N per query (default 3; SPARK_GRAFT_BENCH_RUNS overrides
    # for baseline re-recordings): single-JVM local runs on a shared
    # host see up to ~1.5x run-to-run noise (GC, page cache, host
    # contention); the min is the steady-state cost of the plan, which
    # is the number that scales to a warm cluster.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # effectively unbounded: the default maxlen=1000 deque evicts from
    # the head once total progress events exceed the cap, shifting the
    # [n_seen:] slice and mis-attributing batch durations (ADVICE r6)
    listener = MetricsListener(max_events=1_000_000)
    spark.streams.addListener(listener)
    streaming_detail: dict[str, dict] = {}

    def run_set(names: list[str], runs: int = n_runs) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            spec = QUERIES.get(name)
            if spec is None:
                continue
            best = None
            best_batches: list[int] = []
            for _ in range(runs):
                n_seen = len(listener.snapshot())
                t0 = time.time()
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                if _is_streaming(name):
                    # progress events are delivered on the listener
                    # bus asynchronously AFTER the query stops — poll
                    # briefly until the event count stabilizes
                    stable_since, prev = time.time(), -1
                    while time.time() - stable_since < 0.5:
                        cur = len(listener.snapshot())
                        if cur != prev:
                            prev, stable_since = cur, time.time()
                        time.sleep(0.05)
                if best is None or dt < best:
                    best = dt
                    best_batches = [
                        e["batch_duration_ms"]
                        for e in listener.snapshot()[n_seen:]
                    ]
            timings[name] = round(best, 3)
            if _is_streaming(name) and best_batches:
                streaming_detail[name] = {
                    "wall_sec": timings[name],
                    "batches": len(best_batches),
                    "batch_ms_sum": sum(best_batches),
                    "plan_sec": round(sum(best_batches) / 1000.0, 3),
                }
        return timings

    # Optional subset restriction for harness regression tests (e.g.
    # assert one-line stdout with a streaming entry in the set without
    # paying for the full catalog): comma-separated query names.
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    only_set = {s for s in only.split(",") if s} if only else None

    def pick(names: list[str]) -> list[str]:
        return [n for n in names if only_set is None or n in only_set]

    timings = run_set(pick(HEADLINE))
    extended = run_set(pick(EXTENDED))
    # Tier-3 sweep (VERDICT r9 #3): every registered query not in the
    # headline/extended tiers — mostly micro-relational batch entries
    # plus the live stream_* set — measured ONCE (not best-of-N) so no
    # registered query's plan regresses invisibly. Skippable for
    # wall-clock via SPARK_GRAFT_BENCH_TIER3=0.
    tier3_names = [
        n for n in QUERIES if n not in set(HEADLINE) | set(EXTENDED)
    ]
    tier3: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_TIER3", "1") != "0":
        tier3 = run_set(pick(tier3_names), runs=1)
    total = round(sum(timings.values()), 3)

    ratios = {
        name: round(t / GATE[name], 2)
        for name, t in timings.items()
        if name in GATE
    }
    worst5 = dict(
        sorted(ratios.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    # v3.0 gate (BASELINE.md round 9): per-query anchors across ALL
    # tiers — the headline set keeps the v2.0 gate for driver
    # continuity; this one protects every measured entry (the LLM tier
    # floated gateless through rounds 3-8, VERDICT r8 missing #1)
    all_times = {**timings, **extended, **tier3}
    ratios_v3 = {
        name: round(t / GATE_V3[name], 2)
        for name, t in all_times.items()
        if name in GATE_V3 and GATE_V3[name] > 0
    }
    # Noise floor (VERDICT r9 #2): sub-second queries on a hot driver
    # host read 4-7x their quiet anchors from fixed overhead alone
    # (every one re-measured at anchor on a quiet host in r9), while
    # genuine plan regressions move absolute seconds. Surface only
    # entries where BOTH the ratio exceeds the gate threshold AND the
    # absolute delta exceeds the floor; the full ratio map still lands
    # in BENCH_DETAIL.json for forensics.
    v3_abs_floor_sec = 0.75
    breaches_v3 = {
        name: r
        for name, r in ratios_v3.items()
        if r > 1.0 and all_times[name] - GATE_V3[name] >= v3_abs_floor_sec
    }
    worst5_v3 = dict(
        sorted(breaches_v3.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    detail = {
        "metric": "total_headline_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_extended": extended,
        "queries_tier3": tier3,
        "queries_streaming_detail": streaming_detail,
        "vs_gate_ratios": ratios,
        "vs_gate_v3_ratios": ratios_v3,
        "sf": sf,
    }
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    compact = {
        "metric": "total_headline_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings) + len(extended) + len(tier3),
        "worst5_vs_gate": worst5,
        "worst5_vs_gate_v3": worst5_v3,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # driver keeps only the last 2,000 stdout chars
        compact["queries"] = worst5 and {
            k: timings[k] for k in worst5 if k in timings
        }
        compact["queries_truncated_to_worst5"] = True
        line = json.dumps(compact, separators=(",", ":"))

    # Quiesce BEFORE the single stdout JSON line (VERDICT r9 wrong #1):
    # an async py4j stack trace (streaming-stop / job-group-cancel race
    # inside the JVM) landing AFTER the line would clobber the driver's
    # 2,000-char stdout tail and void the round's bench parse. Stop any
    # straggler streams, drop the listener, shut the JVM down, drain
    # its stdout/stderr echo threads, then print and hard-exit so no
    # atexit/finalizer output can follow.
    try:
        for q in spark.streams.active:
            q.stop()
        spark.streams.removeListener(listener)
    except Exception:
        pass
    spark.stop()
    time.sleep(1.0)
    sys.stdout.flush()
    sys.stderr.flush()
    print(line, flush=True)
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
