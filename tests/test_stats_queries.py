"""Python-reference checks for the round-7 statistics family: each
query's math is recomputed independently (pandas / hashlib / plain
ints) on small seeded corpora — the same defense the audit-batch
goldens give Gini/Benford, extended to ACF, CUSUM, survival hazard,
A/B z, bounce sessionization, seasonal-naive backtest, and DAU/MAU."""

import datetime as dt
import hashlib
import math
import random

import pandas as pd


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "events.parquet", coerce_timestamps="us")
    return str(d)


def _seeded_events(n_days=40, users=6, seed=11):
    rng = random.Random(seed)
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for day in range(n_days):
        for _ in range(rng.randrange(1, 9)):
            eid += 1
            rows.append((
                eid,
                base + dt.timedelta(days=day, minutes=rng.randrange(1380)),
                rng.randrange(1, users + 1),
                rng.choice(["view", "click", "purchase", "signup"]),
                round(rng.uniform(0.5, 99.5), 2),
                "{}",
            ))
    return rows


def test_autocorr_matches_integer_reference(spark, tmp_path):
    rows = _seeded_events()
    sf = _write_events(tmp_path, rows)
    from local_stream_stack_spark.queries.events_ops import (
        autocorr_daily_counts,
    )

    got = {r.lag: r for r in autocorr_daily_counts(spark, sf).collect()}

    daily = {}
    for _, ts, *_ in rows:
        daily[ts.date()] = daily.get(ts.date(), 0) + 1
    n = len(daily)
    s = sum(daily.values())
    q = sum(v * v for v in daily.values())
    den = n * n * q - n * s * s
    for k in range(1, 8):
        pairs = [
            (daily[d], daily[d - dt.timedelta(days=k)])
            for d in daily
            if d - dt.timedelta(days=k) in daily
        ]
        c = len(pairs)
        axy = sum(a * b for a, b in pairs)
        sh = sum(a for a, _ in pairs)
        st = sum(b for _, b in pairs)
        num = n * n * axy - n * s * sh - n * s * st + c * s * s
        r = got[k]
        assert (r.n_pairs, r.acf_num, r.acf_den) == (c, num, den)
        assert math.isclose(r.acf, num / den, rel_tol=1e-12)


def test_hazard_curve_golden_censoring(spark, tmp_path):
    """Three signups: converts day 0; converts day 2; never converts
    and is censored on day 1 (the horizon) — risk sets must shrink by
    BOTH conversion and censoring."""
    t = lambda d, h=0: dt.datetime(2024, 5, 1 + d, 1 + h)
    rows = [
        (1, t(0), 1, "signup", 1.0, "{}"),
        (2, t(0, 2), 1, "purchase", 5.0, "{}"),   # converts day 0
        (3, t(0), 2, "signup", 1.0, "{}"),
        (4, t(2, 2), 2, "purchase", 5.0, "{}"),   # converts day 2
        (5, t(1), 3, "signup", 1.0, "{}"),        # horizon = day 2+2h
    ]
    sf = _write_events(tmp_path, rows)
    from local_stream_stack_spark.queries.events_ops import (
        purchase_hazard_curve,
    )

    got = {r.days_since_signup: r for r in
           purchase_hazard_curve(spark, sf).collect()}
    # day 0: all 3 at risk, user1 converts
    assert (got[0].n_at_risk, got[0].n_converted) == (3, 1)
    # day 1: users 2 and 3 at risk (u3's horizon-delta is ~1.04 days)
    assert (got[1].n_at_risk, got[1].n_converted) == (2, 0)
    # day 2: u3 censored (dcens = 1 < 2): only u2 at risk, converts
    assert (got[2].n_at_risk, got[2].n_converted) == (1, 1)
    assert got[2].hazard_e6 == 1000000
    assert got[13].n_at_risk == 0
    assert got[2].cum_conversion_e6 == 666666  # 2 of 3, floored


def test_ab_test_matches_closed_form(spark, tmp_path):
    rows = _seeded_events(users=40, seed=23)
    sf = _write_events(tmp_path, rows)
    from local_stream_stack_spark.queries.events_ops import ab_test_analysis

    r = ab_test_analysis(spark, sf).collect()[0]

    arm = lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 2
    users = {}
    for _, _, u, typ, val, _ in rows:
        a = users.setdefault(u, {"conv": 0, "cents": 0})
        if typ == "purchase":
            a["conv"] = 1
            a["cents"] += round(val * 100)
    n = {0: 0, 1: 0}; c = {0: 0, 1: 0}
    for u, st in users.items():
        n[arm(u)] += 1
        c[arm(u)] += st["conv"]
    assert (r.n_users_a, r.n_users_b) == (n[0], n[1])
    assert (r.n_conv_a, r.n_conv_b) == (c[0], c[1])
    p = (c[0] + c[1]) / (n[0] + n[1])
    z = (c[0] / n[0] - c[1] / n[1]) / math.sqrt(
        p * (1 - p) * (1 / n[0] + 1 / n[1])
    )
    assert math.isclose(r.z_conversion, z, rel_tol=1e-12)


def test_bounce_rate_matches_pandas_sessionizer(spark, tmp_path):
    rows = _seeded_events(seed=37)
    sf = _write_events(tmp_path, rows)
    from local_stream_stack_spark.queries.events_ops import (
        bounce_rate_by_entry,
    )

    got = {r.entry_type: (r.n_sessions, r.n_bounces, r.n_events)
           for r in bounce_rate_by_entry(spark, sf).collect()}

    df = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]).sort_values(["user_id", "ts", "event_id"])
    ref = {}
    for _, grp in df.groupby("user_id"):
        entry, depth, prev = None, 0, None
        for _, row in grp.iterrows():
            if prev is None or (row.ts - prev) > dt.timedelta(minutes=30):
                if entry is not None:
                    s = ref.setdefault(entry, [0, 0, 0])
                    s[0] += 1; s[1] += depth == 1; s[2] += depth
                entry, depth = row.event_type, 1
            else:
                depth += 1
            prev = row.ts
        s = ref.setdefault(entry, [0, 0, 0])
        s[0] += 1; s[1] += depth == 1; s[2] += depth
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_seasonal_naive_matches_pandas(spark, tmp_path):
    rows = _seeded_events(seed=41)
    sf = _write_events(tmp_path, rows)
    from local_stream_stack_spark.queries.events_ops import (
        seasonal_naive_backtest,
    )

    got = {r.event_type: (r.n_days_scored, r.total_abs_err)
           for r in seasonal_naive_backtest(spark, sf).collect()}

    daily = {}
    for _, ts, _, typ, *_ in rows:
        daily[(typ, ts.date())] = daily.get((typ, ts.date()), 0) + 1
    ref = {}
    for (typ, day), actual in daily.items():
        f = daily.get((typ, day - dt.timedelta(days=7)))
        if f is not None:
            s = ref.setdefault(typ, [0, 0])
            s[0] += 1; s[1] += abs(actual - f)
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_cusum_matches_python_reference(spark, tmp_path):
    """Daily revenue with a deliberate level shift mid-series — the
    peak |CUSUM| day must be the boundary the reference finds."""
    rows = []
    for day in range(30):
        price = 10.0 if day < 15 else 30.0
        rows.append((
            day + 1, day + 1, "O", price,
            dt.datetime(2024, 1, 1 + day), "1-URGENT",
        ))
    df = pd.DataFrame(rows, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ])
    d = tmp_path / "wh"; d.mkdir(exist_ok=True)
    df.to_parquet(d / "orders.parquet", coerce_timestamps="us")
    from local_stream_stack_spark.queries.relational_ext import (
        cusum_changepoint_revenue,
    )

    r = cusum_changepoint_revenue(spark, str(d)).collect()[0]
    x = [1000] * 15 + [3000] * 15
    n, s = len(x), sum(x)
    cs, peak_day, peak = 0, None, 0
    for i, xi in enumerate(x):
        cs += n * xi - s
        if abs(cs) > abs(peak):
            peak, peak_day = cs, i
    assert r.changepoint_day == dt.date(2024, 1, 1 + peak_day)
    assert r.cusum_peak == peak
    assert r.n_days == n


def test_stickiness_matches_pandas(spark, tmp_path):
    rows = _seeded_events(n_days=25, seed=53)
    sf = _write_events(tmp_path, rows)
    from local_stream_stack_spark.queries.events_ops import (
        dau_mau_stickiness,
    )

    got = {r.month: (r.n_active_days, r.sum_dau, r.mau)
           for r in dau_mau_stickiness(spark, sf).collect()}

    per_day, per_month = {}, {}
    for _, ts, u, *_ in rows:
        per_day.setdefault((ts.strftime("%Y-%m"), ts.date()), set()).add(u)
        per_month.setdefault(ts.strftime("%Y-%m"), set()).add(u)
    ref = {}
    for (m, _day), us in per_day.items():
        s = ref.setdefault(m, [0, 0, len(per_month[m])])
        s[0] += 1; s[1] += len(us)
    assert got == {k: tuple(v) for k, v in ref.items()}
