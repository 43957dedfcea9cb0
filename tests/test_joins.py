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


@pytest.mark.soak
def test_binned_interval_join_equals_inequality_join(spark):
    """Binned equi-join must return exactly the pairs the plain
    interval predicate returns, including points on interval
    boundaries, bin-edge stradlers, and multi-interval overlap."""
    from datetime import datetime

    from local_stream_stack_spark.operators.joins import binned_interval_join

    def ts(h, m=0, s=0):
        return datetime(2024, 1, 1, h, m, s)

    points = spark.createDataFrame(
        [(i, ts(9 + i // 60, i % 60)) for i in range(0, 240, 7)],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, ts(9, 30), ts(10, 30)),   # straddles the 10:00 bin edge
            (2, ts(10, 0), ts(10, 0)),    # degenerate single-instant
            (3, ts(9, 45), ts(11, 15)),   # overlaps interval 1
        ],
        "iid int, lo timestamp, hi timestamp",
    )
    got = {
        (r.pid, r.iid)
        for r in binned_interval_join(
            points, intervals, "ts", "lo", "hi", bin_width_s=3600
        ).collect()
    }
    expected = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (points.ts >= intervals.lo) & (points.ts <= intervals.hi),
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_binned_interval_join_plans_hash_join(spark):
    """The whole point: an equi hash join on the bin, never a
    nested-loop/cartesian plan, even with the broadcast threshold off."""
    from datetime import datetime

    from local_stream_stack_spark.operators.joins import binned_interval_join

    points = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9))], "pid int, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 8), datetime(2024, 1, 1, 10))],
        "iid int, lo timestamp, hi timestamp",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = binned_interval_join(points, intervals, "ts", "lo", "hi")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
