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


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    rows = QUERIES[name].fn(spark, empty_sf_dir).collect()
    if name == "funnel_stages":
        assert len(rows) == 1  # aggregate row of empty counts
    else:
        assert rows == []
