"""Dedup operator tests on synthetic near/exact duplicates (the
driver's documents table has no dups, so behavior is pinned here)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from local_stream_stack_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun"
)
NEAR = BASE.replace("afternoon", "evening")  # one-word change
OTHER = (
    "completely unrelated text about distributed query engines and "
    "columnar storage formats for large analytical workloads"
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)],
        "doc_id long, text string",
    )


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), content_cols=["text"], id_col="doc_id")
    rows = {r.doc_id: r.n_copies for r in out.collect()}
    assert rows == {1: 2, 3: 1, 4: 1}  # doc 2 collapsed into doc 1


def test_minhash_lsh_finds_near_dups(spark):
    sigs = minhash_signatures(
        _docs(spark), id_col="doc_id", text_col="text", n_hashes=32
    )
    # identical docs -> identical signatures
    sig_map = {r.doc_id: tuple(r.sig) for r in sigs.collect()}
    assert sig_map[1] == sig_map[2]
    assert len(sig_map[1]) == 32
    # near-dup pair agrees on most components; unrelated pair doesn't
    agree_near = sum(a == b for a, b in zip(sig_map[1], sig_map[3]))
    agree_other = sum(a == b for a, b in zip(sig_map[1], sig_map[4]))
    assert agree_near > 20
    assert agree_other < 8

    cands = minhash_lsh_candidates(sigs, id_col="doc_id", bands=8, rows_per_band=4)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_deterministic_across_runs(spark):
    a = minhash_signatures(_docs(spark), "doc_id", "text", n_hashes=16).collect()
    b = minhash_signatures(_docs(spark), "doc_id", "text", n_hashes=16).collect()
    assert {r.doc_id: tuple(r.sig) for r in a} == {r.doc_id: tuple(r.sig) for r in b}


def test_simhash_hamming(spark):
    out = {r.doc_id: r.simhash for r in simhash64(_docs(spark), "doc_id", "text").collect()}
    assert out[1] == out[2]

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(out[1], out[3]) <= 12  # near-dup: small distance
    assert hamming(out[1], out[4]) > 12  # unrelated: large distance


def test_ngram_jaccard_exact_values(spark):
    out = ngram_jaccard_pairs(
        _docs(spark), id_col="doc_id", text_col="text", n=3, min_jaccard=0.0
    )
    rows = {(r.id_a, r.id_b): r for r in out.collect()}
    # identical docs: jaccard exactly 1
    assert rows[(1, 2)].jaccard == 1.0

    # verify against a python-computed golden for the near pair
    def grams(s):
        return {s[i : i + 3] for i in range(len(s) - 2)}

    a, b = grams(BASE), grams(NEAR)
    expected = len(a & b) / len(a | b)
    assert abs(rows[(1, 3)].jaccard - expected) < 1e-12
    assert rows[(1, 3)].common == len(a & b)


def test_ngram_jaccard_max_df_bounds_hot_gram_join(spark):
    """A boilerplate gram shared by every doc must not reach the
    self-join when max_df is set: the hot-gram anti-join caps the
    pair-join input, and jaccard is re-defined over surviving grams
    (post-prune counts) — mirroring dedup_containment's corpus cap."""
    # 20 docs that share ONLY the hot boilerplate prefix; two true
    # near-dups that also share distinctive content
    boiler = "xyzxyzxyz"
    rows = [(i, boiler + f"unique-{i:04d}-payload") for i in range(20)]
    rows += [(100, boiler + "shared-needle-content"),
             (101, boiler + "shared-needle-contest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, min_jaccard=0.0, max_df=5
    )
    got = {(r.id_a, r.id_b): r for r in capped.collect()}

    def grams(s):
        return {s[i:i + 3] for i in range(len(s) - 2)}

    # post-prune golden: drop grams with df > 5 across the corpus,
    # then enumerate surviving pairs and their jaccard in Python
    from collections import Counter

    df_count = Counter()
    all_g = {i: grams(t) for i, t in rows}
    for g in all_g.values():
        df_count.update(g)
    kept = {i: {g for g in gs if df_count[g] <= 5}
            for i, gs in all_g.items()}
    ids = sorted(kept)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            i, j = ids[x], ids[y]
            inter = kept[i] & kept[j]
            if inter:
                want[(i, j)] = len(inter) / len(kept[i] | kept[j])
    assert set(got) == set(want)
    # boilerplate-only pairs are GONE: far fewer than all 231 pairs
    assert len(got) < 22 * 21 // 2
    assert (100, 101) in got
    for k, r in got.items():
        assert abs(r.jaccard - want[k]) < 1e-12, k
    assert got[(100, 101)].n_a == len(kept[100])

    # unchanged default: exact semantics still include the hot grams
    exact = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, min_jaccard=0.0
    )
    n_pairs = exact.count()
    assert n_pairs == 22 * 21 // 2  # every pair shares the boilerplate


def test_word_shingles(spark):
    from local_stream_stack_spark.operators.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "  x   y  "), (3, "one"), (4, "")],
        "id long, text string",
    )
    out = {
        r.id: sorted(r.sh)
        for r in df.select("id", word_shingles("text", 3).alias("sh")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # only 2 tokens, k=3
    assert out[3] == []
    assert out[4] == []


def test_minhash_word_mode_near_dups(spark):
    sigs = minhash_signatures(
        _docs(spark), "doc_id", "text", n_hashes=32, shingle_k=3, shingle="word"
    )
    sig_map = {r.doc_id: tuple(r.sig) for r in sigs.collect()}
    assert sig_map[1] == sig_map[2]  # identical docs
    agree_near = sum(a == b for a, b in zip(sig_map[1], sig_map[3]))
    agree_other = sum(a == b for a, b in zip(sig_map[1], sig_map[4]))
    assert agree_near > agree_other


def test_exact_dedup_multi_column(spark):
    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc")], "id long, a string, b string"
    )
    out = exact_dedup(df, content_cols=["a", "b"], id_col="id")
    # unit separator keeps ("ab","c") != ("a","bc")
    assert out.count() == 2


def test_connected_components_transitive_chain(spark):
    """A-B-C-D chain is ONE component labeled by its min id; isolated
    pair keeps its own label; directionality and duplicates ignored."""
    from local_stream_stack_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 3), (10, 11), (11, 10)],
        "src bigint, dst bigint",
    )
    got = {
        (r.node, r.component) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_converges_on_long_path(spark):
    """A 12-node path needs multiple propagation rounds (diameter 11);
    min label must still reach the far end."""
    from local_stream_stack_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src bigint, dst bigint"
    )
    got = dict(
        (r.node, r.component) for r in connected_components(edges).collect()
    )
    assert got == {i: 1 for i in range(1, 13)}


@pytest.mark.soak
def test_twostar_components_match_minlabel(spark):
    """Large-star/small-star contraction must produce the identical
    (node, component) mapping as min-label propagation on all three
    adversarial shapes: a long path (diameter stress — the case the
    two-star variant exists for), disjoint cliques (near-dup shape),
    and a seeded random multigraph."""
    import random

    from local_stream_stack_spark.operators.graph import (
        connected_components,
        connected_components_twostar,
    )

    def both(pairs):
        edges = spark.createDataFrame(pairs, "src long, dst long")
        a = {
            (r.node, r.component)
            for r in connected_components(edges).collect()
        }
        b = {
            (r.node, r.component)
            for r in connected_components_twostar(edges).collect()
        }
        return a, b

    # long path 0-1-2-...-24 (all one component, min 0)
    a, b = both([(i, i + 1) for i in range(24)])
    assert a == b and {c for _, c in b} == {0}

    # two disjoint cliques {0..4}, {10..13}
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique += [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    a, b = both(clique)
    assert a == b and {c for _, c in b} == {0, 10}

    # seeded random multigraph with self-loops and duplicates
    rng = random.Random(7)
    pairs = [
        (rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(60)
    ]
    pairs = [p for p in pairs if p[0] != p[1]] or [(0, 1)]
    a, b = both(pairs)
    assert a == b


def test_hot_gram_cap_absolute_ceiling():
    """Round-7 100x fix pin: the jaccard consumers' max_df cap must
    keep its ABSOLUTE ceiling — a relative-only cap lets one
    just-below-cap gram emit (n/100)^2 pairs (the char-gram join that
    hung the 100x run). Reverting the ceiling breaks this test."""
    from local_stream_stack_spark.operators.dedup import hot_gram_cap

    assert hot_gram_cap(0) == 8
    assert hot_gram_cap(500) == 8      # floor at small corpora
    assert hot_gram_cap(5_000) == 50   # relative region
    assert hot_gram_cap(6_400) == 64   # ceiling reached
    # the load-bearing property: cap is CONSTANT past the ceiling,
    # so per-gram pair emission is O(C(64,2)) at ANY corpus size
    for n in (10**5, 10**7, 10**9, 10**12):
        assert hot_gram_cap(n) == 64


def test_hot_gram_cap_bounds_same_gram_corpus(spark):
    """A synthetic corpus where every doc shares one boilerplate gram:
    with the consumer's cap the hot gram is dropped pre-join, so the
    pair join emits only genuinely-overlapping pairs, not C(n,2)."""
    from local_stream_stack_spark.operators.dedup import (
        hot_gram_cap,
        ngram_jaccard_pairs,
    )

    n_docs = 300
    # 'XYZ' (one 3-gram) in every doc; unique tail per doc except 3
    # planted near-dup pairs that share long unique tails
    rows = []
    for i in range(n_docs):
        tail = f"unique-{i:05d}-" + "".join(
            chr(97 + (i * 7 + j) % 26) for j in range(12)
        )
        rows.append((i, "XYZ " + tail))
    rows += [(1000 + i, rows[i][1] + "!") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cap = hot_gram_cap(len(rows))  # = 8 here; hot gram df=303 >> cap
    pairs = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, min_jaccard=0.5, max_df=cap
    ).collect()
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in pairs}
    assert got == {(0, 1000), (1, 1001), (2, 1002)}


def test_minhash_band_keys_rowwise_matches_groupby_form(spark):
    """The stateless per-row band-key formulation (streaming-plan-safe)
    must produce the IDENTICAL (id, band, bh) relation as the portable
    groupBy form — same md5 base hash, permutation family, and
    '|'-joined keys — with sentinel rows exactly where the groupBy
    form has no rows (docs below the shingle width)."""
    from local_stream_stack_spark.operators.dedup import (
        minhash_band_keys,
        minhash_band_keys_rowwise,
        minhash_signatures_portable,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely different words live in this document here"),
        (4, "two words"),      # below shingle width -> sentinel
        (5, ""),               # empty -> sentinel
        (6, None),             # null -> sentinel
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    want = {
        (r.doc_id, r.band, r.bh)
        for r in minhash_band_keys(
            minhash_signatures_portable(
                df, "doc_id", "text", n_hashes=32, shingle_k=3,
                shingle="word",
            ),
            "doc_id",
            bands=8,
            rows_per_band=4,
            portable_keys=True,
        ).collect()
    }
    got_rows = minhash_band_keys_rowwise(
        df, "doc_id", "text", n_hashes=32, shingle_k=3, shingle="word",
        bands=8, rows_per_band=4,
    ).collect()
    got_real = {
        (r.doc_id, r.band, r.bh) for r in got_rows if r.band >= 0
    }
    got_sentinel = {r.doc_id for r in got_rows if r.band == -1}
    assert got_real == want
    assert got_sentinel == {4, 5, 6}
    # sentinel keys are unique per doc (can never collide)
    sk = [r.bh for r in got_rows if r.band == -1]
    assert len(sk) == len(set(sk))


def test_minhash_band_keys_rowwise_carries_columns(spark):
    """carry_cols rides extra columns through unchanged (the streaming
    ingest path carries order_col this way)."""
    from local_stream_stack_spark.operators.dedup import (
        minhash_band_keys_rowwise,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", 42)],
        "doc_id long, text string, ord long",
    )
    out = minhash_band_keys_rowwise(
        df, "doc_id", "text", carry_cols=("ord",)
    ).collect()
    assert len(out) == 8 and all(r.ord == 42 for r in out)
