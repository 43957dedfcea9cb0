"""Distributed BPE trainer (operators/bpe.py) invariants.

The load-bearing claim is that the space-doubling string replace
implements EXACTLY the greedy left-to-right non-overlapping pair
merge of reference token-list BPE — pinned here against an
independent Python fold, including the self-overlap cases ('a a a')
where a naive global replace diverges. Training output shape,
determinism, and the encode path are pinned on top.
"""

from __future__ import annotations

import pytest

from local_stream_stack_spark.operators.bpe import (
    apply_bpe_expr,
    merges_df,
    train_bpe,
    word_counts,
)


def ref_merge_tokens(tokens: list[str], p1: str, p2: str) -> list[str]:
    """Reference greedy left-to-right merge (Sennrich-style walk)."""
    out = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == p1 and tokens[i + 1] == p2:
            out.append(p1 + p2)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def doubling_merge_string(sym: str, p1: str, p2: str) -> str:
    """The operator's string-arithmetic merge, stdlib transcription."""
    doubled = sym.replace(" ", "  ")
    merged = doubled.replace(f" {p1}  {p2} ", f" {p1}{p2} ")
    return merged.replace("  ", " ")


@pytest.mark.parametrize(
    "tokens,p1,p2",
    [
        (["a", "b", "c"], "a", "b"),
        (["a", "a", "a"], "a", "a"),  # overlap: must give [aa, a]
        (["a", "a", "a", "a"], "a", "a"),  # [aa, aa]
        (["ab", "ab", "ab"], "ab", "ab"),
        (["x"], "a", "b"),
        (["a", "b", "a", "b", "a"], "a", "b"),
        (["aa", "a", "aa"], "aa", "a"),
        (["a", "aa", "a"], "a", "aa"),
    ],
)
def test_doubling_equals_reference_fold(tokens, p1, p2):
    sym = " " + " ".join(tokens) + " "
    got = doubling_merge_string(sym, p1, p2)
    want = " " + " ".join(ref_merge_tokens(tokens, p1, p2)) + " "
    assert got == want


def test_doubling_equals_reference_fold_randomized():
    import itertools
    import random

    rng = random.Random(11)
    alphabet = ["a", "b", "ab", "ba", "aa"]
    for _ in range(300):
        tokens = [rng.choice(alphabet) for _ in range(rng.randrange(1, 8))]
        for p1, p2 in itertools.product(alphabet, repeat=2):
            sym = " " + " ".join(tokens) + " "
            got = doubling_merge_string(sym, p1, p2)
            want = " " + " ".join(ref_merge_tokens(tokens, p1, p2)) + " "
            assert got == want, (tokens, p1, p2)


def test_train_bpe_learns_expected_merges(spark):
    # 'abab' x 9 + 'ab' x 4: first merge must be (a, b) with count
    # 9*2 + 4 = 22; second (ab, ab) from the 9 'abab' words
    df = spark.createDataFrame(
        [("abab " * 9 + "ab " * 4,)], "text string"
    )
    words = word_counts(df, "text")
    merges = train_bpe(words, n_merges=2)
    assert merges[0] == ("a", "b", 22)
    assert merges[1] == ("ab", "ab", 9)


def test_train_bpe_deterministic_ties(spark):
    # equal counts: tie must break lexicographically on (p1, p2)
    df = spark.createDataFrame([("xy zw xy zw",)], "text string")
    words = word_counts(df, "text")
    merges = train_bpe(words, n_merges=1)
    assert merges[0] == ("x", "y", 2)  # ('x','y') < ('z','w')


def test_train_bpe_empty_and_exhausted(spark):
    df = spark.createDataFrame([("",)], "text string")
    assert train_bpe(word_counts(df, "text"), n_merges=3) == []
    # single-char vocabulary: no adjacent pairs -> early stop
    df1 = spark.createDataFrame([("a b c a",)], "text string")
    assert train_bpe(word_counts(df1, "text"), n_merges=3) == []


def test_apply_bpe_encode_path(spark):
    import pyspark.sql.functions as F

    merges = [("a", "b", 0), ("ab", "c", 0)]
    df = spark.createDataFrame(
        [("abc",), ("cab",), ("aabc",)], "word string"
    )
    out = {
        r["word"]: r["toks"]
        for r in df.select(
            "word", F.expr(apply_bpe_expr("word", merges)).alias("toks")
        ).collect()
    }
    assert out["abc"] == ["abc"]  # a+b -> ab, ab+c -> abc
    assert out["cab"] == ["c", "ab"]
    assert out["aabc"] == ["a", "abc"]


def test_merges_df_schema(spark):
    mdf = merges_df(spark, [("a", "b", 5)])
    assert [f.name for f in mdf.schema.fields] == [
        "step",
        "p1",
        "p2",
        "pair_count",
    ]
    assert mdf.collect()[0]["pair_count"] == 5
