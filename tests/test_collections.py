"""Smoke + shape tests for collection-typed operators
(queries/collections_funcs.py); value parity is oracle-gated."""

from __future__ import annotations

import pytest

from local_stream_stack_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

NAMES = [
    "pivot_returnflag",
    "unpivot_part_measures",
    "explode_token_counts",
    "map_explode_customer",
    "array_hof_order_lines",
]


@pytest.mark.parametrize("name", NAMES)
def test_runs_and_returns_rows(spark, name):
    df = QUERIES[name].fn(spark, SF)
    assert df.collect()


def test_pivot_columns_are_flags(spark):
    df = QUERIES["pivot_returnflag"].fn(spark, SF)
    assert df.columns == ["l_linestatus", "A", "N", "R"]


def test_unpivot_two_rows_per_part(spark):
    rows = QUERIES["unpivot_part_measures"].fn(spark, SF).collect()
    parts = {r["p_partkey"] for r in rows}
    assert len(rows) == 2 * len(parts)


def test_array_hof_semantics(spark):
    rows = QUERIES["array_hof_order_lines"].fn(spark, SF).collect()
    for r in rows[:50]:
        assert r["n_big"] <= r["n_lines"]
        assert r["total_qty"] >= r["min_qty"] >= 0
