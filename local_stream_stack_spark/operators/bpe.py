"""Distributed BPE (byte-pair-encoding) tokenizer training — the
missing piece between the corpus-statistics tier (token counts, PMI,
TF-IDF) and model training: learn the merge table itself from the
corpus, Spark-first.

The classic scale insight (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm):
BPE iterates over the WORD-COUNT table, not the corpus. One
corpus-scale tokenize+count pass (map-side combined, one shuffle)
reduces 100 TB of text to a vocabulary-sized (word, count) table;
every merge step after that touches only that bounded table:

  per step: one partial-aggregated shuffle over the pair vocabulary
  (count adjacent symbol pairs weighted by word count), one bounded
  TakeOrdered collect of the single best pair (the same driver-side
  carry contract as operators/clustering.py), and a scan-side literal
  string replace applying the merge.

Symbols ride in a SPACE-DELIMITED STRING (' c h a r s '), and a merge
(p1, p2) applies with the space-doubling trick:

    collapse(replace(double(sym), ' p1  p2 ', ' p1p2 '))

where double = replace(' ','  ') and collapse = replace('  ',' ').
Doubling makes adjacent pair occurrences share NO characters, so a
plain global replace implements exactly the greedy left-to-right
non-overlapping merge of token-list BPE ('a a a' merges to 'aa a',
never 'a aa'; proven in tests/test_bpe.py against a reference fold) —
and because it is plain string arithmetic, a SQL oracle replays the
whole training bit-for-bit with no regex lookarounds (RE2/DuckDB has
none) and no list-fold builtins.

No reference analog (SURVEY.md §2B north-star rows — the reference
delegates all computation to Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Merge = tuple[str, str, int]  # (p1, p2, weighted pair count)


def word_counts(
    df: DataFrame, text_col: str, vocab_cap: int = 1500
) -> DataFrame:
    """(word, cnt) for the ``vocab_cap`` most frequent [a-z]+ words
    (ties broken by word — deterministic TakeOrdered, never a global
    sort). The cap bounds every downstream merge step; it is the
    documented corpus-relative bound (log it at the query layer), and
    standard practice — rare-word tails contribute ~nothing to merge
    counts but dominate table width."""
    return (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(vocab_cap)
    )


def _sym_base_expr(word_col: str) -> str:
    """SQL: ' c h a r s ' — chars space-joined with sentinel spaces."""
    return (
        f"concat(' ', array_join(regexp_extract_all({word_col}, '.', 0),"
        " ' '), ' ')"
    )


def _apply_merge_sql(sym_sql: str, p1: str, p2: str) -> str:
    """SQL applying one merge via the space-doubling trick. p1/p2 are
    [a-z]+ fragments (no quoting hazards by construction)."""
    doubled = f"replace({sym_sql}, ' ', '  ')"
    merged = f"replace({doubled}, ' {p1}  {p2} ', ' {p1}{p2} ')"
    return f"replace({merged}, '  ', ' ')"


def _pair_counts(words: DataFrame, sym_sql: str) -> DataFrame:
    """Adjacent-pair counts weighted by word count: split the symbol
    string, enumerate (l[i], l[i+1]) scan-side, one partial-aggregated
    shuffle bounded by the pair vocabulary."""
    return (
        words.select(
            F.col("cnt"),
            F.expr(f"split(trim({sym_sql}), ' ')").alias("l"),
        )
        .select(
            F.col("cnt"),
            F.explode(
                # guard: Spark's sequence(1, 0) DESCENDS (unlike
                # DuckDB's empty generate_series), so single-symbol
                # words need an explicit empty-pairs branch
                F.expr(
                    "CASE WHEN size(l) < 2 THEN"
                    " CAST(array() AS array<struct<p1:string,p2:string>>) ELSE"
                    " transform(sequence(1, size(l) - 1), i -> struct("
                    "element_at(l, i) AS p1, element_at(l, i + 1) AS p2))"
                    " END"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.p1").alias("p1"), F.col("p.p2").alias("p2"))
        .agg(F.sum("cnt").alias("total"))
    )


def train_bpe(
    words: DataFrame, n_merges: int, materialize_input: bool = True
) -> list[Merge]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) frame.

    Driver-side state is only the merge list itself (each step
    collects exactly ONE row via TakeOrdered — the bounded-collect
    contract); all counting is distributed. Ties break by
    (count DESC, p1 ASC, p2 ASC) — a total order both engines share
    on ASCII. Stops early if no pair remains."""
    if materialize_input:
        words = words.localCheckpoint(eager=True)
    merges: list[Merge] = []
    sym_sql = _sym_base_expr("word")
    for _ in range(n_merges):
        best = (
            _pair_counts(words, sym_sql)
            .orderBy(F.desc("total"), "p1", "p2")
            .limit(1)
            .collect()
        )
        if not best:
            break
        p1, p2, total = best[0]["p1"], best[0]["p2"], int(best[0]["total"])
        merges.append((p1, p2, total))
        sym_sql = _apply_merge_sql(sym_sql, p1, p2)
    return merges


def merges_df(spark, merges: list[Merge]) -> DataFrame:
    """(step, p1, p2, pair_count) local relation from a merge list."""
    rows = [
        (i, p1, p2, int(total)) for i, (p1, p2, total) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "step int, p1 string, p2 string, pair_count bigint"
    )


def apply_bpe_expr(word_col: str, merges: list[Merge]) -> str:
    """SQL expression tokenizing ``word_col`` with a learned merge
    list: the same literal replace chain used in training, applied
    scan-side (JVM codegen, zero Python) — the 100 TB encode path."""
    sym_sql = _sym_base_expr(word_col)
    for p1, p2, _ in merges:
        sym_sql = _apply_merge_sql(sym_sql, p1, p2)
    return f"split(trim({sym_sql}), ' ')"
