"""dedup_repeated_ngram_spans semantics on a hand-built corpus where
the covered-position sets are computable by eye: shared 8-gram spans
mark their positions in BOTH docs; unique text contributes nothing;
short docs (< 8 tokens) produce no grams."""

from __future__ import annotations

from local_stream_stack_spark.queries import QUERIES


def test_repeated_span_coverage(spark, tmp_path):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 toks
    rows = [
        # doc 0 and 1 share the 8-token run at different offsets
        (0, f"{shared} unique0 tail0 end0"),
        (1, f"lead1 start1 {shared} tail1"),
        # doc 2: entirely unique, long enough for grams
        (2, "one two three four five six seven eight nine ten"),
        # doc 3: too short for any 8-gram
        (3, "tiny doc"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in QUERIES["dedup_repeated_ngram_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {0, 1, 2, 3}
    # docs 0/1: exactly the 8 shared positions are covered
    assert out[0]["n_tokens"] == 11 and out[0]["n_dup_positions"] == 8
    assert out[1]["n_tokens"] == 11 and out[1]["n_dup_positions"] == 8
    assert out[0]["dup_frac_e6"] == 8 * 1000000 // 11
    # unique and short docs: zero coverage
    assert out[2]["n_dup_positions"] == 0
    assert out[3]["n_dup_positions"] == 0 and out[3]["n_tokens"] == 2


def test_crossdoc_substring_spans_golden(spark, tmp_path):
    """A planted 20-token shared run is reported with its exact span;
    scattered single-gram overlaps stay below the 15-token floor; a
    gram present in >8 docs is df-capped out of the join."""
    import pandas as pd

    shared = " ".join(f"s{i}" for i in range(20))
    filler_a = " ".join(f"a{i}" for i in range(10))
    filler_b = " ".join(f"b{i}" for i in range(10))
    hot = " ".join(f"h{i}" for i in range(8))
    docs = [
        (1, f"{filler_a} {shared}"),
        (2, f"{shared} {filler_b}"),
        # 10 docs all containing the same 8-gram -> df=10 > 8, capped
        *[(10 + i, f"{hot} x{i} y{i} z{i} w{i} v{i} u{i} t{i}") for i in range(10)],
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "src"
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.training_ops import (
        dedup_substring_spans,
    )

    rows = dedup_substring_spans(spark, str(d)).collect()
    got = {(r.doc_a, r.doc_b): r for r in rows}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    # 20 shared tokens -> 13 matching 8-grams on one diagonal
    assert r.max_span_tokens == 20
    assert r.n_match_grams == 13
    assert r.n_spans == 1


def test_doc_novelty_ordering_semantics(spark, tmp_path):
    """Novelty is measured against STRICTLY EARLIER docs: a verbatim
    restatement scores 0, a half-new doc scores ~0.5, the first doc
    always scores 1, and sub-8-token docs carry a NULL score."""
    import pandas as pd

    a = " ".join(f"a{i}" for i in range(20))
    new_half = " ".join(f"n{i}" for i in range(13))
    docs = [
        (1, a),
        (2, a),                      # verbatim repeat -> novelty 0
        (3, f"{a} {new_half}"),      # tail introduces new grams
        (4, "too short here"),       # < 8 tokens -> no grams
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "src"
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.training_ops import (
        doc_novelty_scores,
    )

    got = {r.doc_id: r for r in doc_novelty_scores(spark, str(d)).collect()}
    assert got[1].novelty_e4 == 10_000 and got[1].n_grams == 13
    assert got[2].novelty_e4 == 0
    # doc 3: 33 tokens -> 26 grams; the 13 grams fully inside the
    # copied prefix are old, the 13 spanning/after the seam are new
    assert got[3].n_grams == 26 and got[3].n_novel == 13
    assert got[3].novelty_e4 == 5_000
    assert got[4].n_grams == 0 and got[4].novelty_e4 is None


def test_boilerplate_ngrams_reports_hot_grams(spark, tmp_path):
    """A template sentence shared by 10 of 12 docs tops the report
    with its literal text and exact df share."""
    import pandas as pd

    template = " ".join(f"t{i}" for i in range(8))
    docs = [(i, f"{template} unique{i} filler{i} x{i} y{i}") for i in range(10)]
    docs += [(100, "lone doc " + " ".join(f"a{i}" for i in range(10))),
             (101, "other doc " + " ".join(f"b{i}" for i in range(10)))]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "src"
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.training_ops import (
        boilerplate_ngrams,
    )

    rows = boilerplate_ngrams(spark, str(d)).collect()
    assert rows, "template gram not reported"
    top = rows[0]
    assert top.gram == template
    assert top.doc_freq == 10
    assert top.df_share_e4 == round(10_000 * 10 / 12)
