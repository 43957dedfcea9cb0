"""Hypothesis properties for the concentration/audit queries, checked
against independent pure-Python references on randomized inputs —
the oracle-gate strategy over a wider input space."""

from __future__ import annotations

import pytest

import datetime as dt
import shutil
import tempfile
from collections import Counter

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _orders_dir(revenues_cents):
    d = tempfile.mkdtemp(prefix="prop-orders-")
    rows = [
        (i, i, "O", c / 100.0, dt.datetime(2024, 1, 1), "1-URGENT")
        for i, c in enumerate(revenues_cents, start=1)
    ]
    pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    ).to_parquet(d + "/orders.parquet", coerce_timestamps="us")
    return d


@settings(**_SETTINGS)
@given(
    cents=st.lists(st.integers(1, 10_000_00), min_size=1, max_size=40)
)
@pytest.mark.soak
def test_gini_matches_python_reference(spark, cents):
    """gini_e6 equals the textbook 2*sum(i*x)-(n+1)*sum(x) over
    n*sum(x) formula (truncated to e6) on sorted values, and the
    Lorenz shares are monotone ending at exactly 1e6."""
    from local_stream_stack_spark.queries.relational_ext import (
        revenue_gini_lorenz,
    )

    d = _orders_dir(cents)
    try:
        rows = revenue_gini_lorenz(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    xs = sorted(cents)
    n, s = len(xs), sum(xs)
    s1 = sum(i * x for i, x in enumerate(xs, start=1))
    want = (1_000_000 * (2 * s1 - (n + 1) * s)) // (n * s)
    assert all(r.gini_e6 == want for r in rows)
    shares = [r.cum_share_e6 for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1_000_000
    assert rows[-1].cum_rev_cents == s


@settings(**_SETTINGS)
@given(
    cents=st.lists(st.integers(1, 99_999_99), min_size=1, max_size=60)
)
def test_benford_counts_match_python(spark, cents):
    from local_stream_stack_spark.queries.relational_ext import (
        benford_first_digit,
    )

    d = _orders_dir(cents)
    try:
        rows = benford_first_digit(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    want = Counter(int(str(c)[0]) for c in cents)
    got = {r.digit: r.n_orders for r in rows}
    assert got == dict(want)
    tot = len(cents)
    for r in rows:
        assert r.observed_e6 == r.n_orders * 1_000_000 // tot
        assert r.delta_e6 == r.observed_e6 - r.benford_e6


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 25)),
        min_size=1,
        max_size=60,
    )
)
def test_streaks_match_python(spark, pairs):
    """Distribution of per-user longest consecutive-day runs matches
    a direct Python scan over the distinct (user, day) set."""
    from local_stream_stack_spark.queries.events_ops import (
        active_streaks,
    )

    d = tempfile.mkdtemp(prefix="prop-events-")
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=3),
         u, "view", 1.0, "{}")
        for i, (u, day) in enumerate(pairs)
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    ).to_parquet(d + "/events.parquet", coerce_timestamps="us")
    try:
        got = {
            r.longest_streak: (r.n_users, r.total_active_days)
            for r in active_streaks(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    by_user: dict[int, set[int]] = {}
    for u, day in pairs:
        by_user.setdefault(u, set()).add(day)
    want: dict[int, list[int]] = {}
    for u, days in by_user.items():
        ds = sorted(days)
        longest = run = 1
        for a, b in zip(ds, ds[1:]):
            run = run + 1 if b == a + 1 else 1
            longest = max(longest, run)
        want.setdefault(longest, []).append(len(ds))
    assert got == {
        k: (len(v), sum(v)) for k, v in want.items()
    }


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=30,
    )
)
def test_token_sort_families_match_python(spark, texts):
    """Family sizes per sorted-vocabulary key match a Python
    reference; singleton vocabularies are excluded."""
    from local_stream_stack_spark.queries.llm import dedup_token_sort

    d = tempfile.mkdtemp(prefix="prop-docs-")
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(d + "/documents.parquet")
    try:
        got = {
            (r.n_docs, r.n_distinct_texts, r.keeper_doc)
            for r in dedup_token_sort(spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    fams: dict[tuple, list] = {}
    for i, t in enumerate(texts):
        key = tuple(sorted(set(t.split())))
        fams.setdefault(key, []).append((i, t))
    want = {
        (len(v), len({t for _, t in v}), min(i for i, _ in v))
        for v in fams.values()
        if len(v) >= 2
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "ff", "gg"]),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=25,
    )
)
def test_zipf_buckets_match_python(spark, texts):
    """Per-rank-bucket token counts and mass match a pure-Python
    rank assignment with the same (freq desc, token asc) tie-break;
    slope matches the closed-form least squares over the exact log2
    pairs."""
    from local_stream_stack_spark.queries.llm import zipf_token_fit

    d = tempfile.mkdtemp(prefix="prop-zipf-")
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(d + "/documents.parquet")
    try:
        rows = zipf_token_fit(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)

    freq = Counter(tok for t in texts for tok in t.split())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    pairs = [
        ((r).bit_length() - 1, n.bit_length() - 1)
        for r, (_, n) in enumerate(ranked, start=1)
    ]
    want: dict[int, list[int]] = {}
    for (xb, _), (_, n) in zip(pairs, ranked):
        want.setdefault(xb, []).append(n)
    assert [(r.rank_bucket, r.n_tokens, r.bucket_freq) for r in rows] == [
        (xb, len(v), sum(v)) for xb, v in sorted(want.items())
    ]
    nt = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    den = nt * sxx - sx * sx
    for r in rows:
        if den == 0:
            assert r.zipf_slope is None
        else:
            assert abs(r.zipf_slope - (nt * sxy - sx * sy) / den) < 1e-12


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(1, 30), min_size=1, max_size=20)
)
def test_join_explosion_matches_python(spark, counts):
    """Top-10 predicted pair counts and shares match the n*(n-1)/2
    arithmetic over per-key line counts."""
    from local_stream_stack_spark.queries.training_ops import (
        join_explosion_audit,
    )

    d = tempfile.mkdtemp(prefix="prop-expl-")
    rows = []
    k = 0
    for okey, n in enumerate(counts, start=1):
        for ln in range(n):
            k += 1
            rows.append((okey, 1, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         dt.datetime(2024, 1, 1)))
    pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ]).to_parquet(d + "/lineitem.parquet", coerce_timestamps="us")
    try:
        got = [(r.key, r.n_rows, r.predicted_pairs, r.pair_share_e6,
                r.corpus_pairs, r.n_keys)
               for r in join_explosion_audit(spark, d).collect()]
    finally:
        shutil.rmtree(d, ignore_errors=True)

    total = sum(n * (n - 1) // 2 for n in counts)
    ranked = sorted(
        enumerate(counts, start=1), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    want = [
        (key, n, n * (n - 1) // 2,
         (n * (n - 1) * 500_000) // total if total else None,
         total, len(counts))
        for key, n in ranked
    ]
    if total == 0:
        # all-singleton corpus: shares are NULL (0/0 guard)
        assert [(g[0], g[1], g[2], g[4], g[5]) for g in got] == [
            (w[0], w[1], w[2], w[4], w[5]) for w in want
        ]
    else:
        assert got == want


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 5000),  # quantity cents
            st.integers(1, 5000),  # price cents
            st.integers(0, 10),    # discount cents
            st.integers(0, 8),     # tax cents
        ),
        min_size=2,
        max_size=40,
    )
)
def test_corr_matrix_matches_python(spark, rows):
    """All six correlations match the closed-form moment formula
    computed in exact Python integers (degenerate variance -> None
    on both sides)."""
    from local_stream_stack_spark.queries.relational_ext import (
        corr_matrix_lineitem,
    )

    d = tempfile.mkdtemp(prefix="prop-corr-")
    li = [
        (k, 1, 1, 1, q / 100.0, p / 100.0, dc / 100.0, tx / 100.0,
         "N", "O", dt.datetime(2024, 1, 1))
        for k, (q, p, dc, tx) in enumerate(rows)
    ]
    pd.DataFrame(li, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ]).to_parquet(d + "/lineitem.parquet", coerce_timestamps="us")
    try:
        got = {(r.col_x, r.col_y): r.corr_e6
               for r in corr_matrix_lineitem(spark, d).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)

    import math

    cols = {
        "quantity": [q for q, _, _, _ in rows],
        "extendedprice": [p for _, p, _, _ in rows],
        "discount": [dc for _, _, dc, _ in rows],
        "tax": [tx for _, _, _, tx in rows],
    }
    n = len(rows)
    for (cx, cy), corr in got.items():
        xs, ys = cols[cx], cols[cy]
        num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        dx = n * sum(x * x for x in xs) - sum(xs) ** 2
        dy = n * sum(y * y for y in ys) - sum(ys) ** 2
        if dx == 0 or dy == 0:
            assert corr is None, (cx, cy, corr)
        else:
            want = num / (math.sqrt(dx) * math.sqrt(dy))
            assert abs(corr - round(want * 1e6)) <= 1, (cx, cy, corr, want)


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
            ),
            min_size=4,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=15,
    )
)
def test_minhash_calibration_invariants(spark, texts):
    """Structural invariants on any corpus: est_e4 lands inside its
    bin, exact intersections never exceed unions, and bins are
    unique/sorted."""
    from local_stream_stack_spark.queries.llm import minhash_calibration

    d = tempfile.mkdtemp(prefix="prop-cal-")
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(d + "/documents.parquet")
    try:
        rows = minhash_calibration(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)

    bins = [r.est_bin for r in rows]
    assert bins == sorted(set(bins))
    for r in rows:
        assert 0 <= r.est_bin <= 10
        # est_e4 is the bin's mean agreement: inside [bin, bin+1)*1000
        # except the exact-32/32 pairs-only bin, which hits 10000
        assert r.est_bin * 1000 <= r.est_e4 <= (r.est_bin + 1) * 1000
        assert 0 <= r.sum_inter <= r.sum_union
        assert r.n_pairs >= 1
