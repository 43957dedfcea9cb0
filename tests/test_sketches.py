"""Count-min sketch guarantees: overestimate-only, eps*N error bound,
and exact mergeability of counter grids."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_stream_stack_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)

DEPTH, WIDTH = 4, 256


def _truth(df):
    return {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }


def test_cms_never_underestimates_and_bounds_error(spark):
    # zipf-ish synthetic stream: key k appears ~ 2000/k times
    rows = [(k,) for k in range(1, 80) for _ in range(2000 // k)]
    df = spark.createDataFrame(rows, "k long")
    n_total = len(rows)
    sketch = cms_build(df, "k", DEPTH, WIDTH)
    est = {
        r.k: r.est
        for r in cms_estimate(
            sketch, df.select("k").distinct(), "k", DEPTH, WIDTH
        ).collect()
    }
    truth = _truth(df)
    import math

    eps_bound = math.e / WIDTH * n_total
    for k, true_n in truth.items():
        assert est[k] >= true_n, k  # CMS can only overestimate
        assert est[k] - true_n <= eps_bound, k


def test_cms_grid_is_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(50_000)], "k long")
    sketch = cms_build(df, "k", DEPTH, WIDTH)
    assert sketch.count() <= DEPTH * WIDTH


def test_cms_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(i % 17,) for i in range(3000)], "k long")
    b = spark.createDataFrame([(i % 23,) for i in range(2000)], "k long")
    merged = cms_merge(
        cms_build(a, "k", DEPTH, WIDTH), cms_build(b, "k", DEPTH, WIDTH)
    )
    direct = cms_build(a.unionAll(b), "k", DEPTH, WIDTH)
    m = {(r.d, r.w): r.cnt for r in merged.collect()}
    d = {(r.d, r.w): r.cnt for r in direct.collect()}
    assert m == d


def test_cms_estimate_missing_key_is_small(spark):
    df = spark.createDataFrame([(1,)] * 1000, "k long")
    sketch = cms_build(df, "k", DEPTH, WIDTH)
    ghost = spark.createDataFrame([(999_999,)], "k long")
    est = cms_estimate(sketch, ghost, "k", DEPTH, WIDTH).first().est
    # a key never inserted can only collide; with one hot key the min
    # counter is 0 unless all 4 probes collide with it
    assert est in (0, 1000)


def test_kmv_error_bound_and_exact_small_groups(spark):
    """KMV std error ~ 1/sqrt(k); pin a generous 4-sigma bound at
    k=64 (50%), and exactness when distinct count < k."""
    from local_stream_stack_spark.operators.sketches import (
        kmv_estimate_cols,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [(("big", i) if i < 5000 else ("small", i)) for i in range(5040)],
        "g string, k long",
    )
    kept = kmv_sketch(df, "k", ["g"], k=64)
    out = {
        r.g: r.est_distinct
        for r in kept.groupBy("g").agg(*kmv_estimate_cols(64)).collect()
    }
    assert out["small"] == 40  # < k distinct -> exact
    assert abs(out["big"] - 5000) / 5000 < 0.5


def test_kmv_merge_equals_sketch_of_union(spark):
    """Rolling up per-group sketches must equal sketching the union
    directly — exactly, hash for hash."""
    from local_stream_stack_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [("a", i) for i in range(2000)] + [("b", i) for i in range(1500, 3500)],
        "g string, k long",
    )
    merged = sorted(
        r.h for r in kmv_merge(kmv_sketch(df, "k", ["g"], k=64), k=64).collect()
    )
    direct = sorted(
        r.h
        for r in kmv_sketch(
            df.select(F.lit("all").alias("g"), "k"), "k", ["g"], k=64
        ).collect()
    )
    assert merged == direct


def test_kmv_sketch_rows_bounded(spark):
    from local_stream_stack_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(30_000)], "g string, k long"
    )
    kept = kmv_sketch(df, "k", ["g"], k=64)
    assert kept.count() == 3 * 64
    assert kept.groupBy("g").count().agg(F.max("count")).first()[0] == 64


def test_kmv_overlap_estimates_within_error_bound(spark):
    """Day-over-day overlap estimates from sketches must land within
    the KMV error envelope of the EXACT overlaps on the harness data."""
    from local_stream_stack_spark.queries.events_ops import kmv_overlap_daily

    sf_dir = "/root/testdata/sf0.01"
    got = {r.day: r for r in kmv_overlap_daily(spark, sf_dir).collect()}
    assert got, "no day pairs produced"

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    a, b = e.alias("a"), e.alias("b")
    exact = {
        r.day: r.n
        for r in a.join(
            b, F.expr("b.d = a.d + INTERVAL 1 DAY") & (a.user_id == b.user_id)
        )
        .groupBy(F.col("a.d").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # k=64 KMV: relative error ~1/sqrt(k-2) ~ 13% per estimate; the
    # inclusion-exclusion combines three, so allow a 3x envelope.
    for day, row in got.items():
        want = exact[day]
        assert abs(row.est_overlap - want) <= max(10, 0.40 * want), (
            day,
            row.est_overlap,
            want,
        )
        assert 0 <= row.est_new <= row.est_dau_next


def test_kmv_rolling_wau_window_semantics(spark, tmp_path):
    """A user active only on day 1 stays in the WAU window through
    day 7 and falls out on day 8; sub-saturated windows are exact."""
    import datetime as dt

    import pandas as pd

    rows = []
    eid = 0
    # 10 distinct users on day 1, then 1 distinct user daily after
    for day in range(1, 10):
        users = range(10) if day == 1 else [100 + day]
        for u in users:
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, day, 9, 0, 0),
                         u, "view", 1.0, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from local_stream_stack_spark.queries.events_ops import kmv_rolling_wau

    got = {r.day.isoformat(): r for r in
           kmv_rolling_wau(spark, str(d)).collect()}
    # day 7 window covers days 1..7: 10 + 6 singles = 16 (exact, <64)
    assert got["2024-01-07"].est_wau == 16
    assert got["2024-01-07"].n_days_in_window == 7
    # day 8 window covers days 2..8: the day-1 cohort is gone
    assert got["2024-01-08"].est_wau == 7
    # early ramp: day 1 window is day 1 alone
    assert got["2024-01-01"].est_wau == 10
    assert got["2024-01-01"].n_days_in_window == 1
