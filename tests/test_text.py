"""Text-analysis operators: golden values on crafted strings."""

from __future__ import annotations

from local_stream_stack_spark.operators.text import (
    fingerprint,
    lang_id_scores,
    with_text_stats,
)


def test_text_stats_golden(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, 42 times!"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in with_text_stats(df).collect()}
    r1 = rows[1]
    assert r1.n_chars_calc == 22
    assert r1.n_tokens == 4
    # "Hello" "world" "," "42" "times" "!" -> 6 wordlike segments
    assert r1.n_wordlike == 6
    assert abs(r1.alpha_ratio - 15 / 22) < 1e-12
    assert abs(r1.digit_ratio - 2 / 22) < 1e-12
    assert rows[2].n_tokens == 0
    assert rows[3].n_tokens == 0
    assert 0.0 <= r1.quality_score <= 1.0


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is on the mat"),
            (2, "el perro es una mascota de la casa"),
            (3, "le chat est dans les jardins une fois"),
            (4, "der hund ist nicht in die schule und"),
            (5, "0101 9988 7766"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.predicted_lang for r in lang_id_scores(df).collect()}
    assert out == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in fingerprint(df).collect()}
    assert rows[1].md5_raw != rows[2].md5_raw
    assert rows[1].md5_norm == rows[2].md5_norm  # case+whitespace normalized
    assert rows[1].hash64 == rows[2].hash64
    assert rows[3].md5_norm != rows[1].md5_norm


def test_chunk_text_windows_and_overlap(spark):
    from local_stream_stack_spark.operators.text import chunk_text

    df = spark.createDataFrame(
        [(1, "a" * 380), (2, "xy"), (3, "")], "id bigint, text string"
    )
    out = chunk_text(df, id_col="id", chunk_size=200, stride=150).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    # 380 chars -> starts 1, 151, 301
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.chunk_start, r.chunk_len) for r in c1] == [
        (0, 1, 200),
        (1, 151, 200),
        (2, 301, 80),
    ]
    # consecutive chunks overlap by chunk_size - stride = 50 chars
    assert c1[0].chunk_text[150:] == c1[1].chunk_text[:50]
    assert [(r.chunk_idx, r.chunk_text) for r in by_doc[2]] == [(0, "xy")]
    assert [(r.chunk_idx, r.chunk_text) for r in by_doc[3]] == [(0, "")]


def test_repetition_ratio_flags_looped_text(spark):
    from local_stream_stack_spark.operators.text import with_repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam ham eggs " * 10),       # 3-gram loop -> high ratio
            (2, "one two three four five"),   # all distinct -> 0.0
            (3, "too short"),                 # < 3 words -> 0 grams
        ],
        "id bigint, text string",
    )
    rows = {r.id: r for r in with_repetition_stats(df).collect()}
    assert rows[1].repetition_ratio > 0.85
    assert rows[2].repetition_ratio == 0.0
    assert rows[2].n_ngrams == 3
    assert rows[3].n_ngrams == 0 and rows[3].repetition_ratio == 0.0


def test_clean_text_strips_and_counts(spark):
    from local_stream_stack_spark.operators.text import clean_text

    df = spark.createDataFrame(
        [
            (1, 'hi <b>bold</b> go to https://x.io/a?b=1 mail a.b@c.org end'),
            (2, "plain prose only"),
            (3, "<div><p>nested</p></div>"),
        ],
        "id bigint, text string",
    )
    rows = {r.id: r for r in clean_text(df).collect()}
    assert (rows[1].n_html, rows[1].n_urls, rows[1].n_emails) == (2, 1, 1)
    assert rows[1].clean == "hi bold go to mail end"
    assert (rows[2].n_html, rows[2].n_urls, rows[2].n_emails) == (0, 0, 0)
    assert rows[2].clean == "plain prose only"
    assert rows[3].n_html == 4 and rows[3].clean == "nested"


def test_quality_flags_gopher_rules(spark):
    from local_stream_stack_spark.operators.text import quality_flags

    good = "the quick brown fox jumps over a lazy dog and then " * 3
    repeated = "the " + "spam " * 40 + "of it"
    no_stop = "alpha beta gamma delta " * 10
    df = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, repeated.strip()),
            (3, no_stop.strip()),
            (4, ""),
            (5, "short doc only"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_flags(df).collect()}

    r1 = rows[1]
    assert (
        r1.ok_word_count,
        r1.ok_mean_word_len,
        r1.ok_alpha_words,
        r1.ok_stopwords,
        r1.keep,
    ) == (1, 1, 1, 1, r1.ok_repetition)
    # "the" appears 6x in 33 words -> under the 20% cap
    assert r1.ok_repetition == 1 and r1.keep == 1

    r2 = rows[2]
    assert r2.ok_repetition == 0 and r2.keep == 0  # 40/43 "spam"

    r3 = rows[3]
    assert r3.ok_stopwords == 0 and r3.keep == 0

    r4 = rows[4]
    assert r4.n_words == 0
    assert r4.ok_word_count == 0 and r4.keep == 0
    # vacuous integer rules hold on the empty token array
    assert r4.ok_mean_word_len == 1 and r4.ok_repetition == 1

    r5 = rows[5]
    assert r5.ok_word_count == 0 and r5.keep == 0


def test_chisq_lang_source_zero_under_independence(spark, tmp_path):
    """A perfectly independent contingency table yields chi2 == 0;
    a planted dependent table yields the hand-computed statistic."""
    import pandas as pd

    # independent: every (lang, source) cell = 5 docs
    rows = []
    i = 0
    for lang in ["en", "de"]:
        for src in ["s1", "s2"]:
            for _ in range(5):
                rows.append((i, f"doc {i}", lang, src, 10))
                i += 1
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tmp_path / "ind"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.llm import chisq_lang_source

    res = chisq_lang_source(spark, str(d)).collect()
    assert all(r.chi2_e6_total == 0 for r in res)
    assert res[0].dof == 1
    assert all(r.exp_e6 == 5_000_000 for r in res)

    # dependent 2x2: [[8, 2], [2, 8]] -> chi2 = 20*(64-4)^2/(10*10*10*10)
    rows = []
    i = 0
    for lang, src, n in [("en", "s1", 8), ("en", "s2", 2),
                         ("de", "s1", 2), ("de", "s2", 8)]:
        for _ in range(n):
            rows.append((i, f"doc {i}", lang, src, 10))
            i += 1
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d2 = tmp_path / "dep"
    d2.mkdir()
    pdf.to_parquet(d2 / "documents.parquet")
    res2 = chisq_lang_source(spark, str(d2)).collect()
    # chi2 = sum over 4 cells of (O*N - R*C)^2/(R*C*N) with N=20,
    # R=C=10: each cell (|O*20-100|)^2/(10*10*20) = 60^2/2000 = 1.8
    assert res2[0].chi2_e6_total == 4 * 1_800_000


def test_source_mixing_weights_properties(spark, tmp_path):
    """Temperature tau=1/2 flattens: the small source's weight share
    exceeds its token share, the big one's is below; weights sum to
    ~1; uniform sources get uniform weights and repetition 1."""
    import pandas as pd

    rows = []
    i = 0
    for src, n in [("big", 90), ("small", 10)]:
        for _ in range(n):
            rows.append((i, "tok " * 10, "en", src, 40))
            i += 1
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.llm import source_mixing_weights

    got = {r.source: r for r in source_mixing_weights(spark, str(d)).collect()}
    # token shares 0.9/0.1 -> sqrt-normalized shares 0.75/0.25
    assert abs(got["big"].weight_e6 - 750_000) < 100
    assert abs(got["small"].weight_e6 - 250_000) < 100
    assert got["big"].weight_e6 + got["small"].weight_e6 in (999_999, 1_000_000, 1_000_001)
    assert got["big"].repetition_e4 < 10_000 < got["small"].repetition_e4
    assert abs(got["small"].repetition_e4 - 25_000) < 10


def test_vocab_coverage_small_vocab_and_hapax(spark, tmp_path):
    import pandas as pd

    docs = [
        (1, "a a a b b c"),   # a:3 b:2 c:1
        (2, "a b unique"),    # unique is hapax; c also hapax
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.llm import vocab_coverage

    r = vocab_coverage(spark, str(d)).collect()[0]
    assert r.n_types == 4 and r.n_occurrences == 9
    assert r.n_hapax_types == 2
    assert r.top1000_occurrences == 9 and r.coverage_e4 == 10_000


def test_sentence_split_stats_zero_sentence_lang_is_null(spark, tmp_path):
    """ADVICE r12: a language whose documents contain no [.!?]
    terminators has SUM(n_sents)=0 — chars_per_sent_e6 must be NULL
    (guarded division), never Long.MAX via Spark's saturating CAST of
    Infinity."""
    import pandas as pd

    pdf = pd.DataFrame(
        [
            # all-terminator text: the split yields only blank spans,
            # so n_sents = 0 (unterminated prose would count as ONE
            # trailing sentence, not zero)
            (0, "?!.!!", "xx", "s1", 5),
            (1, "...", "xx", "s1", 3),
            (2, "One. Two. Three.", "en", "s1", 16),
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tmp_path / "nosent"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.llm import sentence_split_stats

    rows = {r.lang: r for r in sentence_split_stats(spark, str(d)).collect()}
    assert rows["xx"].sents_total == 0
    assert rows["xx"].chars_per_sent_e6 is None
    assert rows["en"].sents_total == 3
    # 16 chars / 3 sentences (split keeps trailing-space spans trimmed)
    assert rows["en"].chars_per_sent_e6 is not None
