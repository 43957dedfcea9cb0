"""Tests for join strategy helpers (operators/joins.py): salting must
be semantically invisible, and bucketed co-located joins must skip
the exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_stream_stack_spark.operators.joins import salted_join, write_bucketed

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    plain = li.join(o, ["l_orderkey"], "inner")
    salted = salted_join(li, o, on=["l_orderkey"], how="inner", salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_keeps_unmatched_left(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    plain = li.join(o, ["l_orderkey"], "left")
    salted = salted_join(li, o, on=["l_orderkey"], how="left", salt=4)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_rejects_right_and_full(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(li, o, on=["l_orderkey"], how=how)


def test_salt_column_not_leaked(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    out = salted_join(li, o, on=["l_orderkey"], salt=4)
    assert "__salt" not in out.columns


def test_bucketed_join_skips_exchange(spark):
    """Two tables bucketed+sorted on the same key must sort-merge-join
    with no Exchange (the shuffle was paid at write time)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "t_li_bucketed", "l_orderkey", buckets=4)
    write_bucketed(o, "t_o_bucketed", "o_orderkey", buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_li_bucketed").join(
            spark.table("t_o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")
    assert n == li.count()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_salted_join_tolerates_map_columns_and_salt_name(spark):
    """Salt derivation must skip unhashable (map) columns, and a
    pre-existing __salt column must survive untouched."""
    left = spark.createDataFrame(
        [(1, {"a": "x"}, 99), (2, {"b": "y"}, 98), (2, {"c": "z"}, 97)],
        "k int, m map<string,string>, __salt int",
    )
    right = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    out = salted_join(left, right, on=["k"], salt=4)
    rows = sorted(out.collect(), key=lambda r: (r.k, r["__salt"]))
    assert [(r.k, r.name, r["__salt"]) for r in rows] == [
        (1, "one", 99),
        (2, "two", 97),
        (2, "two", 98),
    ]
    assert dict(rows[0].m) == {"a": "x"}
