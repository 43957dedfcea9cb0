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
