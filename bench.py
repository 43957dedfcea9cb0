"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "total_headline_query_sec", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": s, ...}, "sf": 0.1}

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
# fn. Their wall time is dominated by AvailableNow spin-up + state
# finalization (harness cost), which pollutes the 2x gate's signal
# (VERDICT r5 #5) — so alongside wall time the JSON reports the
# engine-side per-batch processing time from the StreamingQueryListener
# (plan cost: what a long-lived cluster pipeline actually pays per
# epoch). Gate semantics unchanged: the headline total stays wall.
STREAMING = {"stream_tumbling_counts", "stream_ingest_dedup"}

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
]


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

    listener = MetricsListener()
    spark.streams.addListener(listener)
    streaming_detail: dict[str, dict] = {}

    def run_set(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            spec = QUERIES.get(name)
            if spec is None:
                continue
            best = None
            best_batches: list[int] = []
            for _ in range(n_runs):
                n_seen = len(listener.snapshot())
                t0 = time.time()
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                if name in STREAMING:
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
            if name in STREAMING and best_batches:
                streaming_detail[name] = {
                    "wall_sec": timings[name],
                    "batches": len(best_batches),
                    "batch_ms_sum": sum(best_batches),
                    "plan_sec": round(sum(best_batches) / 1000.0, 3),
                }
        return timings

    timings = run_set(HEADLINE)
    extended = run_set(EXTENDED)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_extended": extended,
                "queries_streaming_detail": streaming_detail,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
