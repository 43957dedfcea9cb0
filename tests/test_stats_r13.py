"""Goldens for the round-13 stats batch: McNemar, Jarque-Bera,
Kuiper, Dixon's Q, Anderson-Darling — each against a hand-computed or
sequential-python reference on tiny fixtures (the sf tables only
exercise one regime per statistic; these cover the branch structure
and the closed forms)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd


def _orders(tmp_path, rows, sub="wh"):
    d = tmp_path / sub
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        rows,
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    ).astype({"o_orderdate": "datetime64[us]"}).to_parquet(
        d / "orders.parquet"
    )
    return str(d)


def _lineitem(tmp_path, rows):
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        rows, columns=["l_orderkey", "l_returnflag", "l_discount"]
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


def test_mcnemar_hand_counts(spark, tmp_path):
    """b=3 discordant (R, low-discount), c=1 discordant (kept, deep)
    -> chi2 = (|3-1|-1)^2 / 4 = 0.25."""
    rows = (
        [(i, "R", 0.00) for i in range(3)]        # b cells
        + [(10, "N", 0.06)]                       # c cell
        + [(20, "R", 0.06), (21, "N", 0.00)]      # concordant
    )
    sf = _lineitem(tmp_path, rows)
    from local_stream_stack_spark.queries.relational_ext import (
        mcnemar_paired_flags,
    )

    row = mcnemar_paired_flags(spark, sf).collect()[0]
    assert (row.n, row.b, row.c) == (6, 3, 1)
    assert row.chi2_e6 == 250_000


def test_mcnemar_no_discordance_is_null(spark, tmp_path):
    sf = _lineitem(tmp_path, [(1, "R", 0.06), (2, "N", 0.00)])
    from local_stream_stack_spark.queries.relational_ext import (
        mcnemar_paired_flags,
    )

    row = mcnemar_paired_flags(spark, sf).collect()[0]
    assert (row.b, row.c) == (0, 0)
    assert row.chi2_e6 is None


def _daily_orders(tmp_path, day_revenues, sub="wh"):
    """One order per (day, revenue) pair; revenues in dollars."""
    rows = []
    ok = 0
    base = dt.datetime(2024, 1, 1)
    for i, rev in enumerate(day_revenues):
        ok += 1
        rows.append((ok, 1, rev, base + dt.timedelta(days=i), "1-URGENT"))
    return _orders(tmp_path, rows, sub=sub)


def _jb_reference(xs_cents):
    n = len(xs_cents)
    mean = sum(xs_cents) / n
    u = [(x - mean) / 1e8 for x in xs_cents]
    s2 = sum(math.floor(v * v * 1e6 + 0.5) for v in u) / n / 1e6
    s3 = sum(math.floor(v ** 3 * 1e6 + 0.5) for v in u) / n / 1e6
    s4 = sum(math.floor(v ** 4 * 1e6 + 0.5) for v in u) / n / 1e6
    skew = s3 / s2 ** 1.5
    kurt = s4 / s2 ** 2
    jb = n / 6.0 * (skew ** 2 + (kurt - 3.0) ** 2 / 4.0)
    return skew, kurt, jb


def test_jarque_bera_python_reference(spark, tmp_path):
    revs = [1000.0, 2000.0, 1500.0, 8000.0, 1200.0, 1800.0, 2200.0]
    sf = _daily_orders(tmp_path, revs)
    from local_stream_stack_spark.queries.relational_ext import (
        jarque_bera_daily_revenue,
    )

    row = jarque_bera_daily_revenue(spark, sf).collect()[0]
    skew, kurt, jb = _jb_reference([round(r * 100) for r in revs])
    assert row.n == 7
    assert abs(row.skew_e6 / 1e6 - skew) < 2e-6
    assert abs(row.kurt_e6 / 1e6 - kurt) < 2e-6
    assert abs(row.jb_e6 / 1e6 - jb) < 2e-6


def test_jarque_bera_constant_series_is_null(spark, tmp_path):
    sf = _daily_orders(tmp_path, [500.0] * 5)
    from local_stream_stack_spark.queries.relational_ext import (
        jarque_bera_daily_revenue,
    )

    row = jarque_bera_daily_revenue(spark, sf).collect()[0]
    assert row.n == 5
    assert row.skew_e6 is None and row.jb_e6 is None


def test_kuiper_equals_sum_of_one_sided_gaps(spark, tmp_path):
    """Urgent = {10, 20}, other = {15, 25}: D+ = sup(F1-F2) = 1/2 at
    x=10 and 20, D- = sup(F2-F1) = 0 ... hand ECDF: at 10: F1=.5,F2=0;
    at 15: F1=.5,F2=.5; at 20: F1=1,F2=.5; at 25: 1,1 -> D+=.5, D-=0,
    V=0.5."""
    rows = [
        (1, 1, 10.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, 20.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (3, 1, 15.0, dt.datetime(2024, 1, 1), "3-MEDIUM"),
        (4, 1, 25.0, dt.datetime(2024, 1, 1), "3-MEDIUM"),
    ]
    sf = _orders(tmp_path, rows)
    from local_stream_stack_spark.queries.relational_ext import (
        kuiper_test_urgent_price,
    )

    row = kuiper_test_urgent_price(spark, sf).collect()[0]
    assert (row.n1, row.n2) == (2, 2)
    assert row.d_plus == 2 and row.d_minus == 0
    assert row.v_e6 == 500_000


def test_kuiper_split_tails_beats_ks(spark, tmp_path):
    """A distribution pair with differences split across both tails:
    V must equal D+ + D- and exceed the KS sup gap."""
    rows = []
    ok = 0
    for p in (5.0, 30.0):          # urgent mass at the two tails
        ok += 1
        rows.append((ok, 1, p, dt.datetime(2024, 1, 1), "1-URGENT"))
    for p in (15.0, 20.0):         # others in the middle
        ok += 1
        rows.append((ok, 1, p, dt.datetime(2024, 1, 1), "3-MEDIUM"))
    sf = _orders(tmp_path, rows)
    from local_stream_stack_spark.queries.relational_ext import (
        kuiper_test_urgent_price,
    )

    row = kuiper_test_urgent_price(spark, sf).collect()[0]
    # ECDFs: at 5 F1=.5 F2=0; at 15 .5/.5; at 20 .5/1; at 30 1/1
    assert row.d_plus == 2 and row.d_minus == 2
    assert row.v_e6 == 1_000_000  # V = 1.0, while KS D = 0.5


def test_dixon_q_hand_values(spark, tmp_path):
    """Series 100, 110, 120, 130, 200: range 100, low gap 10 -> 0.10,
    high gap 70 -> 0.70."""
    revs = [100.0, 110.0, 120.0, 130.0, 200.0]
    sf = _daily_orders(tmp_path, revs)
    from local_stream_stack_spark.queries.relational_ext import (
        dixon_q_daily_revenue,
    )

    row = dixon_q_daily_revenue(spark, sf).collect()[0]
    assert row.n == 5
    assert row.q_low_e6 == 100_000
    assert row.q_high_e6 == 700_000


def test_dixon_q_constant_series_is_null(spark, tmp_path):
    sf = _daily_orders(tmp_path, [42.0] * 4)
    from local_stream_stack_spark.queries.relational_ext import (
        dixon_q_daily_revenue,
    )

    row = dixon_q_daily_revenue(spark, sf).collect()[0]
    assert row.q_low_e6 is None and row.q_high_e6 is None


def _phi(z):
    t = math.sqrt(1.0 - math.exp(-2.0 * z * z / math.pi))
    return 0.5 * (1.0 + t) if z >= 0 else 0.5 * (1.0 - t)


def _ad_reference(xs_cents):
    n = len(xs_cents)
    mean = sum(xs_cents) / n
    var = (
        sum(x * x for x in xs_cents) - sum(xs_cents) ** 2 / n
    ) / (n - 1)
    sd = math.sqrt(var)
    # distinct-value form with per-value e6 floors, as registered
    from collections import Counter

    cnt = Counter(xs_cents)
    s = 0
    f = 0
    for v in sorted(cnt):
        c = cnt[v]
        f += c
        z = (v - mean) / sd
        phi = max(_phi(z), 1e-300)
        one_m = max(_phi(-z), 1e-300)
        term = (
            c * (2 * f - c) * math.log(phi)
            + c * (2 * n - 2 * f + c) * math.log(one_m)
        )
        s += math.floor(term * 1e6 + 0.5)
    return -n - s / 1e6 / n


def test_anderson_darling_python_reference(spark, tmp_path):
    revs = [10.0, 12.0, 11.0, 14.0, 13.0, 45.0, 12.5, 11.5]
    sf = _daily_orders(tmp_path, revs)
    from local_stream_stack_spark.queries.relational_ext import (
        anderson_darling_daily_revenue,
    )

    row = anderson_darling_daily_revenue(spark, sf).collect()[0]
    want = _ad_reference([round(r * 100) for r in revs])
    assert row.n == 8
    assert abs(row.a2_e6 / 1e6 - want) < 2e-6
    # the planted far outlier (45 vs ~12) must push A2 well above the
    # 1% critical value (~1.09) — the tail sensitivity the test is for
    assert row.a2_e6 > 1_090_000


def test_anderson_darling_near_normal_is_small(spark, tmp_path):
    # symmetric, near-normal layout -> A2 far below the 10% critical
    revs = [10.0, 11.0, 11.5, 12.0, 12.0, 12.5, 13.0, 14.0]
    sf = _daily_orders(tmp_path, revs)
    from local_stream_stack_spark.queries.relational_ext import (
        anderson_darling_daily_revenue,
    )

    row = anderson_darling_daily_revenue(spark, sf).collect()[0]
    want = _ad_reference([round(r * 100) for r in revs])
    assert abs(row.a2_e6 / 1e6 - want) < 2e-6
    assert row.a2_e6 < 631_000  # 10% critical value ~0.631


def test_cramer_von_mises_python_reference(spark, tmp_path):
    """ECDF-form reference: T = sum over pooled obs of
    c*(f1*n2-f2*n1)^2 / (n1*n2*N^2)."""
    urgent = [10.0, 11.0, 30.0, 31.0]
    other = [20.0, 21.0, 22.0, 20.0]
    rows = []
    ok = 0
    for p in urgent:
        ok += 1
        rows.append((ok, 1, p, dt.datetime(2024, 1, 1), "1-URGENT"))
    for p in other:
        ok += 1
        rows.append((ok, 1, p, dt.datetime(2024, 1, 1), "3-MEDIUM"))
    sf = _orders(tmp_path, rows)
    from local_stream_stack_spark.queries.relational_ext import (
        cramer_von_mises_urgent_price,
    )

    row = cramer_von_mises_urgent_price(spark, sf).collect()[0]
    # python reference over distinct cents
    from collections import Counter

    c1 = Counter(round(p * 100) for p in urgent)
    c2 = Counter(round(p * 100) for p in other)
    n1, n2 = len(urgent), len(other)
    f1 = f2 = 0
    num = 0
    for v in sorted(set(c1) | set(c2)):
        f1 += c1.get(v, 0)
        f2 += c2.get(v, 0)
        num += (c1.get(v, 0) + c2.get(v, 0)) * (f1 * n2 - f2 * n1) ** 2
    want = num / (n1 * n2 * (n1 + n2) ** 2)
    assert (row.n1, row.n2) == (4, 4)
    assert abs(row.t_e6 / 1e6 - want) < 2e-6
    # split-tail alternative scores high while a same-sample pair is 0
    assert row.t_e6 > 0


def test_cramer_von_mises_identical_samples_is_zero(spark, tmp_path):
    rows = []
    ok = 0
    for prio in ("1-URGENT", "3-MEDIUM"):
        for p in (10.0, 20.0, 30.0):
            ok += 1
            rows.append((ok, 1, p, dt.datetime(2024, 1, 1), prio))
    sf = _orders(tmp_path, rows)
    from local_stream_stack_spark.queries.relational_ext import (
        cramer_von_mises_urgent_price,
    )

    row = cramer_von_mises_urgent_price(spark, sf).collect()[0]
    assert row.t_e6 == 0  # ECDFs coincide at every pooled value


def test_periodogram_pure_weekly_signal(spark, tmp_path):
    """A pure 7-day cosine (in units of 1e8 cents) concentrates power
    at period 7; periods 14/30 stay near the noise floor."""
    revs = []
    for t in range(70):
        revs.append(50_000_000.0 + 30_000_000.0 * math.cos(
            2 * math.pi * t / 7))
    sf = _daily_orders(tmp_path, [r / 100.0 for r in revs])
    from local_stream_stack_spark.queries.relational_ext import (
        periodogram_daily_revenue,
    )

    rows = {r.period: r for r in
            periodogram_daily_revenue(spark, sf).collect()}
    assert set(rows) == {7, 14, 30}
    assert rows[7].power_e6 > 50 * max(
        rows[14].power_e6, rows[30].power_e6
    )


def _events_table(tmp_path, seqs):
    """seqs: per-user list of event types, 1s apart."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for uid, types in enumerate(seqs):
        for i, t in enumerate(types):
            eid += 1
            rows.append((eid, uid, base + dt.timedelta(seconds=i), t, 1.0))
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    ).astype({"ts": "datetime64[us]"}).to_parquet(d / "events.parquet")
    return str(d)


def test_markov_entropy_deterministic_chain_is_zero(spark, tmp_path):
    sf = _events_table(tmp_path, [["a", "b", "a", "b", "a", "b"]] * 3)
    from local_stream_stack_spark.queries.events_ops import (
        markov_entropy_rate,
    )

    row = markov_entropy_rate(spark, sf).collect()[0]
    assert row.h_rate_e6 == 0  # every transition is certain


def test_markov_entropy_uniform_two_state_is_ln2(spark, tmp_path):
    # the cycle a,a,b,b,a contains each of the four transitions once,
    # so both rows of the chain are uniform -> H = ln 2
    seqs = [["a", "a", "b", "b", "a"]] * 2
    sf = _events_table(tmp_path, seqs)
    from local_stream_stack_spark.queries.events_ops import (
        markov_entropy_rate,
    )

    row = markov_entropy_rate(spark, sf).collect()[0]
    assert abs(row.h_rate_e6 / 1e6 - math.log(2)) < 2e-6


def _pacf_reference(xs_cents):
    n = len(xs_cents)
    mean = sum(xs_cents) / n
    u = [(x - mean) / 1e8 for x in xs_cents]
    s0 = sum(math.floor(v * v * 1e6 + 0.5) for v in u)
    s1 = sum(
        math.floor(u[i] * u[i + 1] * 1e6 + 0.5) for i in range(n - 1)
    )
    s2 = sum(
        math.floor(u[i] * u[i + 2] * 1e6 + 0.5) for i in range(n - 2)
    )
    r1, r2 = s1 / s0, s2 / s0
    return r1, r2, (r2 - r1 * r1) / (1 - r1 * r1)


def test_pacf_python_reference_and_ar1_shape(spark, tmp_path):
    # an AR(1)-like geometric decay: r2 ~ r1^2, so phi22 ~ 0
    revs = [1000.0 * (0.6 ** t) + 500.0 for t in range(24)]
    sf = _daily_orders(tmp_path, revs)
    from local_stream_stack_spark.queries.relational_ext import (
        pacf_daily_revenue,
    )

    row = pacf_daily_revenue(spark, sf).collect()[0]
    r1, r2, p2 = _pacf_reference([round(r * 100) for r in revs])
    assert row.n == 24
    assert abs(row.r1_e6 / 1e6 - r1) < 2e-6
    assert abs(row.r2_e6 / 1e6 - r2) < 2e-6
    assert abs(row.pacf2_e6 / 1e6 - p2) < 2e-6


def test_pacf_constant_series_is_null(spark, tmp_path):
    sf = _daily_orders(tmp_path, [100.0] * 6)
    from local_stream_stack_spark.queries.relational_ext import (
        pacf_daily_revenue,
    )

    row = pacf_daily_revenue(spark, sf).collect()[0]
    assert row.r1_e6 is None and row.pacf2_e6 is None


def _stump_lineitem(tmp_path, rows):
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        rows,
        columns=["l_orderkey", "l_quantity", "l_discount",
                 "l_returnflag"],
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


def test_decision_stump_finds_the_perfect_split(spark, tmp_path):
    """Label is exactly qty <= 10; discount is uninformative. The
    stump must pick (quantity, 10) with gain = parent Gini (children
    are pure)."""
    rows = []
    for i in range(20):
        qty = 5 if i < 10 else 20
        rows.append((i, float(qty), 0.05 * (i % 2), "R" if qty <= 10 else "N"))
    sf = _stump_lineitem(tmp_path, rows)
    from local_stream_stack_spark.queries.relational_ext import (
        decision_stump_train,
    )

    row = decision_stump_train(spark, sf).collect()[0]
    assert row.feature == "quantity"
    assert row.threshold == 5  # the left-pure boundary value
    assert (row.n_left, row.n_right) == (10, 10)
    assert (row.pos_left, row.pos_right) == (10, 0)
    # parent p = 0.5 -> Gini 0.5; pure children -> gain = 0.5
    assert row.gain_e9 == 500_000_000


def test_welch_anova_python_reference(spark, tmp_path):
    groups = {
        "1-URGENT": [10.0, 12.0, 11.0, 13.0],
        "2-HIGH": [20.0, 25.0, 22.0, 30.0, 24.0],
        "3-MEDIUM": [15.0, 15.5, 16.0],
    }
    rows = []
    ok = 0
    for prio, vals in groups.items():
        for v in vals:
            ok += 1
            rows.append((ok, 1, v, dt.datetime(2024, 1, 1), prio))
    sf = _orders(tmp_path, rows)
    from local_stream_stack_spark.queries.relational_ext import (
        welch_anova_priority,
    )

    row = welch_anova_priority(spark, sf).collect()[0]
    # sequential python reference (same fold order: sorted by prio)
    stats = []
    for prio in sorted(groups):
        xs = [round(v * 100) for v in groups[prio]]
        n = len(xs)
        m = sum(xs) / n
        s2 = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        stats.append((n, m, s2))
    w = sum(n / s2 for n, m, s2 in stats)
    wm = sum(n / s2 * m for n, m, s2 in stats)
    num = sum(n / s2 * (m - wm / w) ** 2 for n, m, s2 in stats)
    h = sum((1 - (n / s2) / w) ** 2 / (n - 1) for n, m, s2 in stats)
    k = len(stats)
    f = (num / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1.0) * h)
    df2 = (k * k - 1.0) / (3 * h)
    assert row.k == 3
    assert abs(row.f_e6 / 1e6 - f) < 2e-6
    assert abs(row.df2_e6 / 1e6 - df2) < 2e-6
