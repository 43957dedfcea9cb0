"""Tests for the UDF/UDAF/UDTF extension surface (operators/udx.py);
value parity is oracle-gated, these pin semantics and edge cases."""

from __future__ import annotations

from local_stream_stack_spark.operators.udx import (
    TokenizeUdtf,
    register_udtfs,
    trimmed_stats_per_user,
)
from local_stream_stack_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_trimmed_mean_small_groups(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 90.0), (2, 5.0)],
        "user_id long, value double",
    )
    rows = {r.user_id: r for r in trimmed_stats_per_user(df).collect()}
    # user 1: trim 10 and 90 -> mean of [20]
    assert rows[1].trimmed_mean == 20.0
    assert rows[1].sum_cents == 12000
    # group of 1: plain mean
    assert rows[2].trimmed_mean == 5.0


def test_udtf_null_and_empty(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "   ")], "doc_id int, text string"
    ).createOrReplaceTempView("__udtf_t")
    rows = spark.sql(
        "SELECT d.doc_id, t.token FROM __udtf_t d, LATERAL tokenize(d.text) t"
    ).collect()
    # null and whitespace-only rows produce no tokens (LATERAL drops them)
    assert {(r.doc_id, r.token) for r in rows} == {(1, "a"), (1, "b")}


def test_sql_api_matches_dataframe_api(spark):
    sql_rows = QUERIES["sql_api_revenue"].fn(spark, SF).collect()
    assert len(sql_rows) > 0
    assert sql_rows == sorted(sql_rows, key=lambda r: r.n_name)


def test_udaf_runs_at_sf(spark):
    rows = QUERIES["udaf_trimmed_stats"].fn(spark, SF).collect()
    assert rows and all(r.n_events >= 1 for r in rows)
