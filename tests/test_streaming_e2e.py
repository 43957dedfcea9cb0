"""End-to-end streaming queries must equal their batch twins.

The oracle gate already cross-checks these against DuckDB; here we pin
the stronger in-engine property that the micro-batch execution of a
plan produces exactly the batch result on a bounded replay.
"""

from __future__ import annotations

from local_stream_stack_spark.queries.streaming_e2e import (
    stream_dedup_keys,
    stream_latest_per_key,
    stream_tumbling_counts,
)
from local_stream_stack_spark.queries.events_ops import (
    latest_per_key_q,
    tumbling_window_agg,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    got = stream_tumbling_counts(spark, sf_dir)
    want = tumbling_window_agg(spark, sf_dir)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_stream_dedup_keys_distinct(spark, sf_dir):
    from local_stream_stack_spark.catalog import load_table

    got = _rows(stream_dedup_keys(spark, sf_dir))
    want = _rows(
        load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    )
    assert got == want


def test_stream_latest_per_key_equals_batch(spark, sf_dir):
    got = stream_latest_per_key(spark, sf_dir)
    want = latest_per_key_q(spark, sf_dir)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_stream_queries_rerunnable(spark, sf_dir):
    # memory-sink names are sequenced: a second invocation in the same
    # session must not collide with the first run's query name
    assert stream_dedup_keys(spark, sf_dir).count() > 0
