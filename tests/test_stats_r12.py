"""Goldens for the round-12 agreement/dispersion/reliability batch:
Kendall's W, Fleiss' kappa, Benjamini-Hochberg, Ansari-Bradley,
Cronbach's alpha, Theil's U — each against a hand-computed or
sequential-python reference on tiny fixtures."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd


def _write(tmp_path, name, df):
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    for c in df.columns:
        if df[c].dtype == "datetime64[ns]":
            df[c] = df[c].astype("datetime64[us]")
    df.to_parquet(d / f"{name}.parquet")
    return str(d)


def _orders_customers(tmp_path, orders_rows, cust_rows, nation_rows):
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    pd.DataFrame(
        orders_rows,
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
                 "o_orderpriority"],
    ).astype({"o_orderdate": "datetime64[us]"}).to_parquet(
        d / "orders.parquet"
    )
    pd.DataFrame(
        cust_rows, columns=["c_custkey", "c_nationkey"]
    ).to_parquet(d / "customer.parquet")
    pd.DataFrame(
        nation_rows, columns=["n_nationkey", "n_name"]
    ).to_parquet(d / "nation.parquet")
    return str(d)


def test_kendall_w_perfect_agreement(spark, tmp_path):
    """Two judges ranking three months identically -> W = 1."""
    day = dt.datetime(2024, 1, 1)
    orders = []
    ok = 0
    # nation 0 and nation 1 both rank months 1<2<3 by revenue
    for nk, cust in ((0, 1), (1, 2)):
        for month, price in ((1, 10.0), (2, 20.0), (3, 30.0)):
            ok += 1
            orders.append(
                (ok, cust, price, dt.datetime(2024, month, 1), "1-URGENT")
            )
    sf = _orders_customers(
        tmp_path, orders, [(1, 0), (2, 1)], [(0, "A"), (1, "B")]
    )
    from local_stream_stack_spark.queries.relational_ext import (
        kendall_w_nation_months,
    )

    row = kendall_w_nation_months(spark, sf).collect()[0]
    assert (row.m, row.n) == (2, 3)
    assert row.tj == 0
    assert row.w_e6 == 1_000_000, row


def test_kendall_w_perfect_disagreement_two_judges(spark, tmp_path):
    """Two judges with exactly reversed rankings -> W = 0 for m=2."""
    orders = []
    ok = 0
    for nk, cust, prices in (
        (0, 1, ((1, 10.0), (2, 20.0), (3, 30.0))),
        (1, 2, ((1, 30.0), (2, 20.0), (3, 10.0))),
    ):
        for month, price in prices:
            ok += 1
            orders.append(
                (ok, cust, price, dt.datetime(2024, month, 1), "1-URGENT")
            )
    sf = _orders_customers(
        tmp_path, orders, [(1, 0), (2, 1)], [(0, "A"), (1, "B")]
    )
    from local_stream_stack_spark.queries.relational_ext import (
        kendall_w_nation_months,
    )

    row = kendall_w_nation_months(spark, sf).collect()[0]
    assert row.w_e6 == 0, row


def test_fleiss_kappa_full_agreement(spark, tmp_path):
    """Every rater in every panel picks the same category -> the
    kappa numerator and denominator are both 1-P̄e -> kappa = 1."""
    orders = []
    ok = 0
    for day in (1, 2, 3):
        cat = ["1-URGENT", "2-HIGH", "3-MEDIUM"][day - 1]
        for _ in range(5):
            ok += 1
            orders.append(
                (ok, 1, 10.0, dt.datetime(2024, 1, day), cat)
            )
    sf = _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            orders,
            columns=["o_orderkey", "o_custkey", "o_totalprice",
                     "o_orderdate", "o_orderpriority"],
        ),
    )
    from local_stream_stack_spark.queries.relational_ext import (
        fleiss_kappa_daily_raters,
    )

    row = fleiss_kappa_daily_raters(spark, sf).collect()[0]
    assert row.n_subjects == 3 and row.m_raters == 5
    assert row.pbar_e6 == 1_000_000
    assert row.kappa_e6 == 1_000_000, row


def test_fleiss_kappa_python_reference(spark, tmp_path):
    """Mixed panels against the sequential Fleiss computation."""
    cats = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    panels = {
        1: [0, 0, 1, 1, 2],
        2: [1, 1, 1, 2, 2],
        3: [0, 2, 2, 2, 2],
        4: [0, 1, 0, 1, 0],
    }
    orders = []
    ok = 0
    for day, picks in panels.items():
        for p in picks:
            ok += 1
            orders.append(
                (ok, 1, 10.0, dt.datetime(2024, 1, day), cats[p])
            )
    sf = _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            orders,
            columns=["o_orderkey", "o_custkey", "o_totalprice",
                     "o_orderdate", "o_orderpriority"],
        ),
    )
    from local_stream_stack_spark.queries.relational_ext import (
        fleiss_kappa_daily_raters,
    )

    row = fleiss_kappa_daily_raters(spark, sf).collect()[0]
    n, m = len(panels), 5
    sq = sum(
        sum(picks.count(c) ** 2 for c in set(picks))
        for picks in panels.values()
    )
    cj2 = sum(
        sum(p.count(ci) for p in panels.values()) ** 2
        for ci in range(3)
    )
    pbar = (sq - n * m) / (n * m * (m - 1))
    pe = cj2 / (float(n) * 5.0 * float(n) * 5.0)
    kappa = (pbar - pe) / (1 - pe)
    assert row.n_subjects == n
    assert row.pbar_e6 == math.floor(pbar * 1e6 + 0.5)
    assert row.pe_e6 == math.floor(pe * 1e6 + 0.5)
    assert row.kappa_e6 == math.floor(kappa * 1e6 + 0.5), row


def test_benjamini_hochberg_rejects_only_shifted_nation(spark, tmp_path):
    """One nation's orders sit far above the global mean; BH at
    q=0.10 should reject it and keep the null nations."""
    orders = []
    ok = 0
    # nations 0..4: 40 orders each at ~100.00, nation 5 at 1000.00
    for nk in range(6):
        price = 1000.0 if nk == 5 else 100.0
        for i in range(40):
            ok += 1
            # small deterministic wiggle so variance is nonzero
            orders.append(
                (
                    ok,
                    nk + 1,
                    price + (i % 5) * 0.25,
                    dt.datetime(2024, 1, 1 + (i % 28)),
                    "1-URGENT",
                )
            )
    sf = _orders_customers(
        tmp_path,
        orders,
        [(nk + 1, nk) for nk in range(6)],
        [(nk, f"N{nk}") for nk in range(6)],
    )
    from local_stream_stack_spark.queries.relational_ext import (
        benjamini_hochberg_nations,
    )

    rows = benjamini_hochberg_nations(spark, sf).collect()
    by_nation = {r.nation: r for r in rows}
    # the shifted nation has by far the most extreme z -> rank 1,
    # rejected
    assert by_nation["N5"].rejected is True
    assert by_nation["N5"].rnk == 1
    assert by_nation["N5"].z_e6 > 0
    # the five identical null nations (which sit BELOW the
    # outlier-dragged global mean, so they carry identical negative
    # z's) must get identical p's and identical decisions
    null_rows = [r for r in rows if r.nation != "N5"]
    assert len({r.p_e9 for r in null_rows}) == 1
    assert len({r.rejected for r in null_rows}) == 1
    # BH rejections are always a prefix of the p-ascending ranking
    d = max((r.rnk for r in rows if r.rejected), default=0)
    for r in rows:
        assert r.rejected == (r.rnk <= d)
    # ranks are a permutation of 1..m ordered by ascending p
    ordered = sorted(rows, key=lambda r: r.rnk)
    assert [r.rnk for r in ordered] == list(range(1, len(rows) + 1))
    assert all(
        a.p_e9 <= b.p_e9 for a, b in zip(ordered, ordered[1:])
    )


def test_cronbach_alpha_perfectly_consistent_items(spark, tmp_path):
    """Items that are exact copies across subjects: Σvar_i = k·v,
    var_total = k²·v -> alpha = k/(k-1)·(1 - 1/k) = 1."""
    orders = []
    ok = 0
    for subj, (cust, base) in enumerate([(1, 10.0), (2, 20.0), (3, 40.0)]):
        for month in (1, 2, 3, 4):
            ok += 1
            orders.append(
                (ok, cust, base, dt.datetime(2024, month, 5), "1-URGENT")
            )
    sf = _orders_customers(
        tmp_path,
        orders,
        [(1, 0), (2, 1), (3, 2)],
        [(0, "A"), (1, "B"), (2, "C")],
    )
    from local_stream_stack_spark.queries.relational_ext import (
        cronbach_alpha_nation_months,
    )

    row = cronbach_alpha_nation_months(spark, sf).collect()[0]
    assert (row.k_items, row.n_subjects) == (4, 3)
    assert row.alpha_e6 == 1_000_000, row


def test_ansari_bradley_python_reference(spark, tmp_path):
    """A-B statistic and z against a sequential python scorer with
    mid-rank tie averaging (floored to e6 exactly as the query)."""
    urgent = [100, 200, 300, 400]          # tight around the middle
    rest = [1, 2, 500, 600, 300]           # spread to the ends + a tie
    orders = []
    ok = 0
    for c in urgent:
        ok += 1
        orders.append(
            (ok, 1, c / 100.0, dt.datetime(2024, 1, 1), "1-URGENT")
        )
    for c in rest:
        ok += 1
        orders.append(
            (ok, 1, c / 100.0, dt.datetime(2024, 1, 1), "2-HIGH")
        )
    sf = _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            orders,
            columns=["o_orderkey", "o_custkey", "o_totalprice",
                     "o_orderdate", "o_orderpriority"],
        ),
    )
    from local_stream_stack_spark.queries.relational_ext import (
        ansari_bradley_urgent,
    )

    row = ansari_bradley_urgent(spark, sf).collect()[0]

    allv = sorted(urgent + rest)
    n = len(allv)
    # per distinct value: exact average Ansari score over its ranks,
    # floored to e6
    import collections

    cnt = collections.Counter(urgent + rest)
    cnt1 = collections.Counter(urgent)
    ab_e6 = 0
    pos = 0
    for v in sorted(cnt):
        c = cnt[v]
        ranks = range(pos + 1, pos + c + 1)
        s = sum(min(i, n + 1 - i) for i in ranks)
        score_e6 = math.floor(2 * s / (2.0 * c) * 1e6 + 0.5)
        ab_e6 += cnt1.get(v, 0) * score_e6
        pos += c
    assert row.n1 == len(urgent) and row.n2 == len(rest)
    assert row.ab_e6 == ab_e6, (row.ab_e6, ab_e6)
    n1 = len(urgent)
    if n % 2 == 0:
        mean = n1 * (n + 2.0) / 4.0
        var = n1 * (n - n1) * (n + 2.0) * (n - 2.0) / (48.0 * (n - 1.0))
    else:
        mean = n1 * (n + 1.0) ** 2 / (4.0 * n)
        var = (
            n1 * (n - n1) * (n + 1.0) * (3.0 + n * float(n))
            / (48.0 * n * float(n))
        )
    z = math.floor((ab_e6 / 1e6 - mean) / math.sqrt(var) * 1e6 + 0.5)
    assert row.z_e6 == z, (row.z_e6, z)


def test_theil_u_deterministic_and_independent(spark, tmp_path):
    """lang fully determined by source -> U = 1; lang independent of
    source -> U = 0 (cell contributions cancel exactly)."""
    docs = []
    for i in range(40):
        # deterministic: source s0 -> en, s1 -> fr
        src = f"s{i % 2}"
        docs.append((i, "en" if src == "s0" else "fr", src, "x"))
    d = tmp_path / "wh1"
    d.mkdir()
    pd.DataFrame(
        docs, columns=["doc_id", "lang", "source", "text"]
    ).to_parquet(d / "documents.parquet")
    from local_stream_stack_spark.queries.llm import theil_u_lang_source

    row = theil_u_lang_source(spark, str(d)).collect()[0]
    assert row.u_e6 == 1_000_000, row

    docs2 = []
    for i in range(40):
        # independent: every (lang, source) cell equal
        docs2.append(
            (i, ["en", "fr"][i % 2], f"s{(i // 2) % 2}", "x")
        )
    d2 = tmp_path / "wh2"
    d2.mkdir()
    pd.DataFrame(
        docs2, columns=["doc_id", "lang", "source", "text"]
    ).to_parquet(d2 / "documents.parquet")
    row2 = theil_u_lang_source(spark, str(d2)).collect()[0]
    assert row2.mi_e9 == 0 and row2.u_e6 == 0, row2


def test_keywords_per_doc_rare_term_wins(spark, tmp_path):
    """A term unique to one doc outscores corpus-wide terms there."""
    docs = [
        (1, "en", "s", "common common zebra"),
        (2, "en", "s", "common common common"),
        (3, "en", "s", "common shared shared"),
    ]
    d = tmp_path / "wh"
    d.mkdir()
    pd.DataFrame(
        docs, columns=["doc_id", "lang", "source", "text"]
    ).to_parquet(d / "documents.parquet")
    from local_stream_stack_spark.queries.llm import keywords_per_doc_tfidf

    rows = keywords_per_doc_tfidf(spark, str(d)).collect()
    top1 = {r.doc_id: r.tok for r in rows if r.rnk == 1}
    assert top1[1] == "zebra"
    assert top1[3] == "shared"
    # 'common' appears in every doc -> idf = ln(1) = 0 everywhere
    assert all(
        r.score_e6 == 0 for r in rows if r.tok == "common"
    )
