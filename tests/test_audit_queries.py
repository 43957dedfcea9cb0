"""Goldens for the concentration/audit/calibration query batch:
Lorenz-Gini, Benford, correlation matrix, activity streaks,
vocabulary-set dedup, and MinHash estimator calibration."""

import datetime as dt

import pandas as pd


def _write_orders(tmp_path, rows):
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "orders.parquet", coerce_timestamps="us")
    return str(d)


def test_revenue_gini_lorenz_two_customers(spark, tmp_path):
    """Revenues 1.00 vs 9.00: gini = (2*19 - 3*10) / (2*10) = 0.4;
    NTILE(10) over two rows fills buckets 1 and 2 only."""
    sf = _write_orders(
        tmp_path,
        [
            (1, 1, "O", 1.00, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 2, "O", 9.00, dt.datetime(2024, 1, 2), "1-URGENT"),
        ],
    )
    from local_stream_stack_spark.queries.relational_ext import (
        revenue_gini_lorenz,
    )

    rows = revenue_gini_lorenz(spark, sf).collect()
    assert [(r.decile, r.cum_rev_cents, r.cum_share_e6, r.gini_e6)
            for r in rows] == [
        (1, 100, 100000, 400000),
        (2, 1000, 1000000, 400000),
    ]


def test_revenue_gini_equal_revenues_zero(spark, tmp_path):
    """Perfect equality -> gini exactly 0."""
    sf = _write_orders(
        tmp_path,
        [
            (i, i, "O", 5.00, dt.datetime(2024, 1, 1), "1-URGENT")
            for i in range(1, 5)
        ],
    )
    from local_stream_stack_spark.queries.relational_ext import (
        revenue_gini_lorenz,
    )

    rows = revenue_gini_lorenz(spark, sf).collect()
    assert all(r.gini_e6 == 0 for r in rows)
    assert rows[-1].cum_share_e6 == 1000000


def test_benford_first_digit_counts(spark, tmp_path):
    """Digits come from exact cent renderings; shares are truncating
    e6 divisions against the same Benford literals."""
    sf = _write_orders(
        tmp_path,
        [
            (1, 1, "O", 1.00, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 1, "O", 19.99, dt.datetime(2024, 1, 1), "1-URGENT"),
            (3, 1, "O", 2.00, dt.datetime(2024, 1, 1), "1-URGENT"),
            (4, 1, "O", 0.05, dt.datetime(2024, 1, 1), "1-URGENT"),
        ],
    )
    from local_stream_stack_spark.queries.relational_ext import (
        benford_first_digit,
    )

    got = {
        r.digit: (r.n_orders, r.observed_e6, r.benford_e6, r.delta_e6)
        for r in benford_first_digit(spark, sf).collect()
    }
    assert got == {
        1: (2, 500000, 301030, 198970),
        2: (1, 250000, 176091, 73909),
        5: (1, 250000, 79181, 170819),
    }


def test_corr_matrix_perfect_and_degenerate(spark, tmp_path):
    """quantity == discount -> corr exactly 1.0; price = -quantity
    trend -> -1.0; constant tax -> NULL (zero variance guard)."""
    rows = []
    for k, (q, p) in enumerate([(1.0, 3.0), (2.0, 2.0), (3.0, 1.0)]):
        rows.append((k, 1, 1, 1, q, p, q, 0.05, "N", "O",
                     dt.datetime(2024, 1, 1)))
    li = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"])
    d = tmp_path / "wh"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    from local_stream_stack_spark.queries.relational_ext import (
        corr_matrix_lineitem,
    )

    got = {(r.col_x, r.col_y): r.corr_e6
           for r in corr_matrix_lineitem(spark, str(d)).collect()}
    # corr is rounded once to e6 BIGINT (ADVICE r6: the raw-double
    # form hash-differed in the last ulp across engines).
    assert got[("quantity", "discount")] == 1_000_000
    assert got[("quantity", "extendedprice")] == -1_000_000
    assert got[("quantity", "tax")] is None
    assert got[("discount", "tax")] is None
    assert len(got) == 6


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "events.parquet", coerce_timestamps="us")
    return str(d)


def test_active_streaks_islands(spark, tmp_path):
    """User 1 active on days 1,2,3 and 5 -> longest 3 of 4 active
    days; user 2 active once; duplicate events per day collapse."""
    mk = dt.datetime
    sf = _write_events(
        tmp_path,
        [
            (1, mk(2024, 1, 1, 9), 1, "view", 1.0, "{}"),
            (2, mk(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
            (3, mk(2024, 1, 2, 9), 1, "view", 1.0, "{}"),
            (4, mk(2024, 1, 3, 9), 1, "view", 1.0, "{}"),
            (5, mk(2024, 1, 5, 9), 1, "view", 1.0, "{}"),
            (6, mk(2024, 1, 2, 9), 2, "view", 1.0, "{}"),
        ],
    )
    from local_stream_stack_spark.queries.events_ops import (
        active_streaks,
    )

    got = {r.longest_streak: (r.n_users, r.sample_user,
                              r.total_active_days)
           for r in active_streaks(spark, sf).collect()}
    assert got == {1: (1, 2, 1), 3: (1, 1, 4)}


def _write_docs(tmp_path, texts):
    df = pd.DataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tmp_path / "wh"
    d.mkdir(exist_ok=True)
    df.to_parquet(d / "documents.parquet")
    return str(d)


def test_dedup_token_sort_vocab_families(spark, tmp_path):
    """Same vocabulary set groups permutations and repetition
    variants; n_distinct_texts separates verbatim repeats."""
    sf = _write_docs(
        tmp_path,
        ["a b c", "c b a a", "a b c", "x y"],
    )
    from local_stream_stack_spark.queries.llm import dedup_token_sort

    rows = dedup_token_sort(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_docs, r.n_distinct_texts, r.keeper_doc) == (3, 2, 0)


def test_minhash_calibration_identical_pair(spark, tmp_path):
    """Two identical documents: all 32 signature rows agree
    (est_bin 10, est_e4 10000) and exact Jaccard is 1."""
    text = "the quick brown fox jumps over the lazy dog again"
    sf = _write_docs(tmp_path, [text, text, "completely different words here now"])
    from local_stream_stack_spark.queries.llm import minhash_calibration

    rows = minhash_calibration(spark, sf).collect()
    assert [(r.est_bin, r.n_pairs, r.est_e4, r.micro_jaccard)
            for r in rows] == [(10, 1, 10000, 1.0)]
    assert rows[0].sum_inter == rows[0].sum_union


def test_zipf_token_fit_tiny_corpus(spark, tmp_path):
    """freqs a:4 b:2 c:1 -> ranks 1,2,3; log2 buckets (0,2),(1,1),
    (1,0); slope = (3*1 - 2*3) / (3*2 - 4) = -1.5."""
    sf = _write_docs(tmp_path, ["a a a a b b c"])
    from local_stream_stack_spark.queries.llm import zipf_token_fit

    rows = zipf_token_fit(spark, sf).collect()
    assert [(r.rank_bucket, r.n_tokens, r.bucket_freq) for r in rows] == [
        (0, 1, 4),
        (1, 2, 3),
    ]
    assert all(r.zipf_slope == -1.5 for r in rows)


def test_join_explosion_audit_pair_math(spark, tmp_path):
    """Orders with 3 and 2 lines predict 3 and 1 pairs; shares are
    exact e6 integer divisions of the corpus total (4 pairs)."""
    rows = []
    k = 0
    for okey, nlines in [(10, 3), (20, 2)]:
        for ln in range(nlines):
            k += 1
            rows.append((okey, 1, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         dt.datetime(2024, 1, 1)))
    li = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"])
    d = tmp_path / "wh"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    from local_stream_stack_spark.queries.training_ops import (
        join_explosion_audit,
    )

    got = [(r.key, r.n_rows, r.predicted_pairs, r.pair_share_e6,
            r.corpus_pairs) for r in join_explosion_audit(
                spark, str(d)).collect()]
    assert got == [(10, 3, 3, 750000, 4), (20, 2, 1, 250000, 4)]


def test_revenue_gini_all_zero_revenue_is_null(spark, tmp_path):
    """Zero total revenue mass -> NULL shares and NULL gini (NULLIF
    guard), never an ANSI divide-by-zero."""
    sf = _write_orders(
        tmp_path,
        [(i, i, "O", 0.00, dt.datetime(2024, 1, 1), "1-URGENT")
         for i in range(1, 4)],
    )
    from local_stream_stack_spark.queries.relational_ext import (
        revenue_gini_lorenz,
    )

    rows = revenue_gini_lorenz(spark, sf).collect()
    assert rows, "deciles still enumerate"
    assert all(r.cum_share_e6 is None and r.gini_e6 is None
               for r in rows)
