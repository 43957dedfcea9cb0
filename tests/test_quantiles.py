"""exact_quantile must equal Spark's exact percentile aggregate."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from local_stream_stack_spark.operators.quantiles import exact_quantile


def _check(spark, rows, q, bins=64):
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r.k: r.out
        for r in exact_quantile(df, "v", q, ["k"], bins=bins, out_col="out").collect()
    }
    want = {
        r.k: r.p
        for r in df.groupBy("k")
        .agg(F.expr(f"percentile(v, {q})").alias("p"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12, abs_tol=1e-12), (
            k,
            got[k],
            want[k],
        )


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_random_groups(spark, q):
    rng = random.Random(7)
    rows = [
        (k, rng.uniform(-100, 100))
        for k in ("a", "b", "c")
        for _ in range(rng.randrange(1, 200))
    ]
    _check(spark, rows, q)


def test_skewed_single_value_bin(spark):
    # 95% identical values: the heavy bin must still resolve exactly
    rows = [("a", 5.0)] * 95 + [("a", float(i)) for i in range(5)]
    _check(spark, rows, 0.5, bins=8)


def test_single_row_and_constant_groups(spark):
    rows = [("one", 3.25), ("const", 2.0), ("const", 2.0), ("const", 2.0)]
    for q in (0.0, 0.3, 1.0):
        _check(spark, rows, q)


def test_integerish_ties_across_bins(spark):
    rows = [("a", float(v)) for v in [1, 1, 1, 2, 2, 3, 3, 3, 3, 10]]
    for q in (0.1, 0.5, 0.75):
        _check(spark, rows, q, bins=4)


def test_multi_quantile_shared_pipeline(spark):
    from local_stream_stack_spark.operators.quantiles import exact_quantiles

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 7.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r.k: (r.p10, r.p50, r.p99)
        for r in exact_quantiles(
            df, "v", [0.1, 0.5, 0.99], ["k"], bins=8,
            out_cols=["p10", "p50", "p99"],
        ).collect()
    }
    want = {
        r.k: (r.a, r.b, r.c)
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile(v, 0.1)").alias("a"),
            F.expr("percentile(v, 0.5)").alias("b"),
            F.expr("percentile(v, 0.99)").alias("c"),
        )
        .collect()
    }
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert math.isclose(g, w, rel_tol=1e-12, abs_tol=1e-12), (k, got[k], want[k])


def test_by_value_matches_bin_refinement(spark):
    """The one-scan value-histogram form and the 3-pass bin-refinement
    form must agree exactly on a bounded-distinct column."""
    import random

    from local_stream_stack_spark.operators.quantiles import (
        exact_quantiles_by_value,
        exact_quantiles_multi,
    )

    rng = random.Random(7)
    rows = [(f"k{i % 3}", float(rng.randint(1, 50))) for i in range(999)]
    df = spark.createDataFrame(rows, "k string, v double")
    qs = [0.1, 0.5, 0.9]
    a = {
        r.k: (r.q1, r.q2, r.q3)
        for r in exact_quantiles_by_value(
            df, {"v": qs}, ["k"], out_cols={"v": ["q1", "q2", "q3"]}
        ).collect()
    }
    b = {
        r.k: (r.q1, r.q2, r.q3)
        for r in exact_quantiles_multi(
            df, {"v": qs}, ["k"], out_cols={"v": ["q1", "q2", "q3"]}
        ).collect()
    }
    assert set(a) == set(b) == {"k0", "k1", "k2"}
    for k in a:
        for x, y in zip(a[k], b[k]):
            assert abs(x - y) < 1e-9, (k, a[k], b[k])
