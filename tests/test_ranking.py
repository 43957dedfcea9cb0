"""BM25 ranking, per-source char-budget cap, z-score outliers —
golden tests on tiny hand-built frames (the sf0.01 oracle parity run
covers the full-table versions)."""

from __future__ import annotations

import math

from local_stream_stack_spark.queries.llm import bm25_rank, source_char_budget
from local_stream_stack_spark.queries.events_ops import zscore_outliers

SF = "/root/testdata/sf0.001"


def test_bm25_scores_match_reference_formula(spark):
    """Recompute BM25 for the top hit with plain Python and compare."""
    out = bm25_rank(spark, SF).collect()
    assert 0 < len(out) <= 20
    # scores sorted non-increasing, ties broken by doc_id ascending
    scores = [r.bm25_e4 / 1e4 for r in out]
    assert scores == sorted(scores, reverse=True)

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    toks = {r.doc_id: r.text.lower().strip().split() for r in docs}
    toks = {k: [t for t in v if t] for k, v in toks.items()}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    terms = ["spark", "hash", "window"]
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}

    def bm25(doc_id):
        dl = len(toks[doc_id])
        s = 0.0
        for t in terms:
            tf = toks[doc_id].count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return round(s, 4)

    top = out[0]
    assert abs(bm25(top.doc_id) - top.bm25_e4 / 1e4) < 1e-3


def test_source_char_budget_enforced(spark):
    out = source_char_budget(spark, SF).collect()
    assert out, "budget cap returned no rows"
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for rows in by_source.values():
        # cumulative sums monotone and within budget
        assert all(r.cum_chars <= 20000 for r in rows)
        cums = [r.cum_chars for r in rows]
        assert cums == sorted(cums)
        # cum_chars is a true prefix-sum of n_chars in admission order
        run = 0
        for r in rows:
            run += r.n_chars
            assert r.cum_chars == run


def test_source_char_budget_deterministic(spark):
    a = [tuple(r) for r in source_char_budget(spark, SF).collect()]
    b = [tuple(r) for r in source_char_budget(spark, SF).collect()]
    assert a == b


def test_zscore_outliers_are_extreme(spark):
    out = zscore_outliers(spark, SF).collect()
    assert len(out) == 20
    azs = [float(r.az) for r in out]
    assert azs == sorted(azs, reverse=True)
    # the flagged events really are the tails: every score beats the
    # per-type typical deviation (z >= 1 by construction of a top-20
    # over thousands of rows)
    assert azs[-1] >= 1.0
