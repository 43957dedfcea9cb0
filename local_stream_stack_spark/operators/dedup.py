"""Deduplication operators for large-scale document corpora.

North-star LLM-data operators (no reference citation — the reference
has no dedup; contract from /root/repo/BASELINE.json): exact dedup,
MinHash+LSH near-dup, SimHash, and exact n-gram Jaccard verification.

Scale design (100 TB):
- exact dedup = hash-groupBy: one shuffle on a 128-bit content hash.
- MinHash+LSH: shingle -> 64-bit base hash -> k permuted mins (one
  groupBy per doc) -> band buckets -> equi-join on (band, band_hash).
  Candidate pairs are bounded by bucket collisions, never O(n²).
- exact Jaccard runs only on candidate pairs (verification stage) or
  on small blocked subsets — an inverted-index join on shared grams,
  which is how the exact version stays feasible at scale.

All hashing is Spark-side (xxhash64 / md5) — JVM codegen, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Mersenne prime 2^31-1 for permutation hashing. Keeping the hash
# universe at 31 bits bounds a*h+b under 2^62, so the modular
# arithmetic stays inside ANSI-mode BIGINT with no overflow.
_MERSENNE_P = (1 << 31) - 1


def _perm_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P)) for _ in range(n)]


def _spread_by_key(df: DataFrame, key_col: str) -> DataFrame:
    """Pre-partition by the group key when the input has fewer
    partitions than the cluster has slots.

    The shingle/token explode that follows is the CPU-heavy step; with
    a narrow input (e.g. a single-row-group parquet file) it would run
    on one core. Hash-partitioning by the key first moves that work
    across the cluster AND satisfies the downstream groupBy(key)
    distribution, so no second shuffle appears — the exchange count
    stays at one. On well-partitioned inputs (the 100 TB case) this is
    a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < target:
        return df.repartition(target, key_col)
    return df


def exact_dedup(
    df: DataFrame, content_cols: Sequence[str], id_col: str
) -> DataFrame:
    """Exact dedup: keep the min-id row per content hash.

    Content identity = md5 of the concatenated columns (unit separator
    keeps ("ab","c") != ("a","bc")). Adds ``content_hash`` and
    ``n_copies``; one shuffle on the hash.
    """
    hashed = df.withColumn(
        "content_hash", F.md5(F.concat_ws("\x1f", *content_cols))
    )
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("content_hash")))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def char_shingles(text_col, k: int = 5):
    """Column expr: distinct k-char shingles of a string (array<string>).

    Pure built-ins: sequence over start offsets + transform(substring).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.greatest(F.length(c) - (k - 1), F.lit(0))
    # Texts shorter than k: n=0 makes sequence(1, 0) the DESCENDING
    # [1, 0]; substr tolerates start 0 (unlike slice), so both indices
    # yield the whole text and array_distinct collapses them to ONE
    # whole-text shingle. Deliberately kept: identical short texts
    # still collide in minhash space, and an empty shingle set would
    # null out the signature.
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))
    )


def nonempty_tokens(text_col):
    """Column expr: non-empty whitespace tokens of a string
    (array<string>) — the shared tokenization of the word-shingle
    pipelines. Callers that feed the result to a higher-order function
    should MATERIALIZE it as a projection column first (see
    ``word_shingles_of``): HOFs are interpreted (no codegen, no
    subexpression elimination), so a lambda body referencing this
    expression TREE re-runs the regex split per array element, turning
    an O(words) shingle pass into O(words²). An attribute reference is
    a per-element field read instead."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: F.length(t) > 0)


def word_shingles_of(toks_col, k: int = 3):
    """Column expr: distinct k-word shingles (array<string>) over an
    already-MATERIALIZED token-array column (``nonempty_tokens`` staged
    through a select/withColumn). The lambda references the column >1
    time, which keeps CollapseProject from inlining the token expression
    back into the per-element body."""
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    n = F.size(toks) - (k - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(text_col, k: int = 3):
    """Column expr: distinct k-word shingles (array<string>).

    ~6x fewer shingles than 5-char shingling on prose, so minhash cost
    drops proportionally — the standard choice for document-level
    near-dup at corpus scale.

    NOTE (perf): prefer staging ``nonempty_tokens`` as a projection
    column and calling :func:`word_shingles_of` on it — this inline
    form re-evaluates the tokenization tree per shingle element inside
    the interpreted transform (O(words²) regex splits per row).
    """
    return word_shingles_of(nonempty_tokens(text_col), k)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
    shingle: str = "char",
) -> DataFrame:
    """MinHash signatures: (id, sig array<bigint> of length n_hashes).

    shingle -> xxhash64 base hash -> per-permutation (a*x+b) mod p ->
    min per doc. One explode + one groupBy(id): shuffle volume is
    (docs x shingles) hashed longs, independent of pair count, and the
    n_hashes running mins ride the codegen'd partial/final hash
    aggregate. (A shuffle-free higher-order-function formulation —
    n_hashes x array_min(transform(...)) per row — was measured ~3x
    slower: per-row array allocation beats the map-side-combined
    shuffle only on paper.)
    """
    params = _perm_params(n_hashes, seed)
    df = _spread_by_key(df, id_col)
    if shingle == "word":
        # materialize the token array BEFORE the shingle transform:
        # the interpreted HOF otherwise re-runs the regex tokenization
        # tree per shingle element (O(words²) splits per row)
        df = df.select(F.col(id_col), nonempty_tokens(text_col).alias("__toks"))
        shingle_expr = word_shingles_of("__toks", shingle_k)
    else:
        shingle_expr = char_shingles(text_col, shingle_k)
    # hash INSIDE the shingle array, then explode: the explode
    # materializes 8-byte longs instead of shingle strings (~10% off
    # the whole signature pass; fold the signed 64-bit hash into the
    # 31-bit universe [0, p))
    hashed_arr = F.transform(
        shingle_expr,
        lambda s: F.shiftrightunsigned(F.xxhash64(s), 33) % F.lit(_MERSENNE_P),
    )
    shingled = df.select(F.col(id_col), F.explode(hashed_arr).alias("__h"))
    mins = [
        F.min(((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(_MERSENNE_P))).alias(
            f"__m{i}"
        )
        for i, (a, b) in enumerate(params)
    ]
    sig = shingled.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"__m{i}" for i in range(n_hashes)]).alias("sig")
    )


def minhash_signatures_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
    shingle: str = "char",
) -> DataFrame:
    """MinHash signatures with an ENGINE-PORTABLE base hash: shingle ->
    first 8 hex chars of md5 (32 bits) mod p — every step is plain
    integer SQL any engine can replay, unlike :func:`minhash_signatures`
    whose xxhash64 base is Spark-specific. The permutation family
    h_i(x) = (a_i*x + b_i) mod p is identical (same seeded literals,
    embeddable into an oracle's VALUES list via ``_perm_params``).
    a < p < 2^31 and x < p keep a*x+b inside int64 on every engine.
    Use the xxhash64 variant when raw speed matters more than
    cross-engine replay."""
    params = _perm_params(n_hashes, seed)
    df = _spread_by_key(df, id_col)
    if shingle == "word":
        # materialized token column — see minhash_signatures
        df = df.select(F.col(id_col), nonempty_tokens(text_col).alias("__toks"))
        shingle_expr = word_shingles_of("__toks", shingle_k)
    else:
        shingle_expr = char_shingles(text_col, shingle_k)
    hashed_arr = F.transform(
        shingle_expr,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        % F.lit(_MERSENNE_P),
    )
    shingled = df.select(F.col(id_col), F.explode(hashed_arr).alias("__h"))
    mins = [
        F.min(
            ((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(_MERSENNE_P))
        ).alias(f"__m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = shingled.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"__m{i}" for i in range(n_hashes)]).alias("sig")
    )


def minhash_band_keys(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 8,
    rows_per_band: int = 4,
    carry_sig: bool = False,
    portable_keys: bool = False,
) -> DataFrame:
    """Explode signatures into LSH band keys: one (id, band, bh) row
    per band, where ``bh`` hashes the band's signature rows. Two docs
    sharing any (band, bh) key are near-dup candidates — the join/
    lookup key for both batch candidate generation
    (``minhash_lsh_candidates``) and the streaming ingestion store
    (``streaming.ops.ingest_neardup_stream_parquet``).

    ``portable_keys=True`` swaps the xxhash64 band hash for the
    '|'-joined band values themselves — exactly injective and
    reproducible by any SQL engine (string_agg over the band rows),
    at the cost of a wider shuffle key; the default fixed-width hash
    is the 100 TB shape."""
    cols = [F.col(id_col)] + ([F.col("sig")] if carry_sig else [])
    out_cols = [id_col] + (["sig"] if carry_sig else [])

    def band_key(b: int):
        vals = [
            F.col("sig")[i]
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        if portable_keys:
            return F.concat_ws("|", *[v.cast("string") for v in vals])
        return F.xxhash64(*vals)

    return sig_df.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_key(b).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(*out_cols, "bk.band", "bk.bh")


def minhash_band_keys_rowwise(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    shingle_k: int = 3,
    seed: int = 42,
    shingle: str = "word",
    bands: int = 8,
    rows_per_band: int = 4,
    carry_cols: tuple = (),
) -> DataFrame:
    """STATELESS per-row MinHash band keys (portable md5 base hash,
    '|'-joined band values): (id, [carry...], band, bh) — one row per
    band, computed entirely with per-row expressions (transform +
    array_min), no explode-then-groupBy.

    Identical key values to ``minhash_signatures_portable`` +
    ``minhash_band_keys(portable_keys=True)`` — same permutation
    family, same base hash, same join — but usable INSIDE a streaming
    plan ahead of a stateful operator: a streaming groupBy(id) would
    itself become a cross-batch stateful aggregation, which is the
    wrong semantic for per-document signatures (each doc arrives
    once). The per-row formulation costs ~3x the map-side-combined
    shuffle form in batch (measured; see ``minhash_signatures``), so
    use it only where statelessness is required.

    Docs whose shingle set is EMPTY (fewer than ``shingle_k`` words)
    emit one sentinel row (band=-1, bh unique per doc), so they flow
    through bucket lookups without ever colliding — the same admit
    semantics as "no band keys" in the groupBy formulation, where such
    docs simply vanish from the key relation.
    """
    params = _perm_params(n_hashes, seed)
    if shingle == "word":
        # materialized token column — see minhash_signatures; keeps
        # the interpreted shingle transform from re-running the regex
        # tokenization per element (streaming-safe: plain projection)
        df = df.select("*", nonempty_tokens(text_col).alias("__toks"))
        shingle_expr = word_shingles_of("__toks", shingle_k)
    else:
        shingle_expr = char_shingles(text_col, shingle_k)
    hashed = F.transform(
        shingle_expr,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        % F.lit(_MERSENNE_P),
    )
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("__harr"),
                lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(_MERSENNE_P),
            )
        ).alias(f"__m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigd = df.withColumn("__harr", hashed).select(
        F.col(id_col), *[F.col(c) for c in carry_cols], *sig_cols
    )

    def band_key(b: int):
        vals = [
            F.col(f"__m{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        return F.concat_ws("|", *vals)

    bk = F.when(
        F.col("__m0").isNull(),
        F.array(
            F.struct(
                F.lit(-1).alias("band"),
                F.concat(
                    F.lit("noshingle|"), F.col(id_col).cast("string")
                ).alias("bh"),
            )
        ),
    ).otherwise(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"), band_key(b).alias("bh")
                )
                for b in range(bands)
            ]
        )
    )
    return sigd.select(
        F.col(id_col), *[F.col(c) for c in carry_cols], F.explode(bk).alias("bk")
    ).select(id_col, *carry_cols, "bk.band", "bk.bh")


def minhash_lsh_candidates(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 8,
    rows_per_band: int = 4,
    carry_sig: bool = False,
    portable_keys: bool = False,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a
    candidate pair (id_a < id_b).

    Explode signatures into (band, band_hash) keys, group by bucket,
    and expand ordered pairs WITHIN each bucket via array functions —
    candidates are generated by hash-bucket collision, never by
    comparing all pairs. A single groupBy replaces the earlier
    band-key self-join, so the signature subtree has ONE lineage (the
    self-join form computed it twice; Spark's exchange reuse did not
    fire across the differently-aliased sides). Bucket member lists
    stay small by LSH design (size the band bits so buckets are
    O(100) rows at the target corpus); a pathological hot bucket
    would surface here as one big row — monitor bucket sizes before
    raising band width. With ``carry_sig`` the full signatures ride
    in the member structs so the verification stage needs no join
    back to the signature table.
    """
    banded = minhash_band_keys(
        sig_df,
        id_col,
        bands=bands,
        rows_per_band=rows_per_band,
        carry_sig=True,
        portable_keys=portable_keys,
    )
    member = (
        F.struct(F.col(id_col).alias("id"), F.col("sig").alias("sig"))
        if carry_sig
        else F.struct(F.col(id_col).alias("id"))
    )
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list(member)).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    # ordered pairs (i < j) within the id-sorted member list
    pair_arr = F.flatten(
        F.transform(
            "ms",
            lambda m, i: F.transform(
                F.slice("ms", i + F.lit(2), F.size("ms")),
                lambda m2: F.struct(m.alias("a"), m2.alias("b")),
            ),
        )
    )
    pairs = buckets.select(F.explode(pair_arr).alias("p"))
    if carry_sig:
        # same (id_a, id_b) always carries identical sigs, so the
        # group-by dedups pairs that collided in multiple bands
        return (
            pairs.select(
                F.col("p.a.id").alias("id_a"),
                F.col("p.b.id").alias("id_b"),
                F.col("p.a.sig").alias("sig_a"),
                F.col("p.b.sig").alias("sig_b"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
        )
    return pairs.select(
        F.col("p.a.id").alias("id_a"), F.col("p.b.id").alias("id_b")
    ).distinct()


def hot_gram_cap(
    n_docs: int, rel: int = 100, floor: int = 8, ceiling: int = 64
) -> int:
    """The ``max_df`` cap the registered jaccard consumers pass to
    :func:`ngram_jaccard_pairs`: corpus-relative (1% of docs, floored
    at 8) WITH an absolute ceiling of 64.

    The ceiling is the load-bearing part — found by the round-7 100x
    scaling run: a relative-only cap lets a just-below-cap gram emit
    (n/100)^2 pair rows, quadratic with a small coefficient (the
    char-gram join hung at 100x while the 10x curve read a deceptive
    alpha 0.956). With the ceiling, every gram contributes at most
    C(64, 2) pairs, so pair-join input is linear in corpus grams at
    any corpus size. tests/test_dedup.py pins both properties so a
    revert breaks loudly; the query oracles encode the same LEAST()
    in SQL, so a one-sided change also fails parity."""
    return min(ceiling, max(floor, n_docs // rel))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    block_cols: Sequence[str] = (),
    min_jaccard: float = 0.1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via an inverted-index join.

    Pairs sharing >=1 gram (and equal ``block_cols``) get
    |A∩B| / (|A|+|B|-|A∩B|). The gram join bounds the pair space by
    actual overlap — this is the verification stage for LSH candidates
    or a standalone exact near-dup pass on blocked data.

    ``max_df`` (optional) is the hot-gram bound: a gram appearing in
    more than ``max_df`` documents (within its block) is dropped
    BEFORE the self-join, and the per-doc gram counts are re-derived
    post-prune so jaccard stays a true Jaccard over the surviving
    grams. Without it, one boilerplate gram shared by k docs emits
    k^2 pair rows on a single join key — the quadratic hot-key blowup
    that dedup_containment's corpus-relative cap fixed in round 5
    (training_ops.py) but this shared operator still allowed when
    called unblocked. The hot list contains only grams ABOVE the cap,
    so it is tiny by construction and broadcasts at any corpus size.
    Default ``None`` preserves the exact all-grams semantics for
    blocked/sliced callers.
    """
    if max_df is None:
        # exact path: per-doc count is the shingle-array size, no
        # extra shuffle. Shingle array staged as a column so the row
        # builds it ONCE (size + explode would otherwise each
        # construct it).
        grams = (
            _spread_by_key(df, id_col)
            .select(
                F.col(id_col),
                *[F.col(c) for c in block_cols],
                char_shingles(text_col, n).alias("__sh"),
            )
            .select(
                F.col(id_col),
                *[F.col(c) for c in block_cols],
                F.size("__sh").alias("__n_grams"),
                F.explode("__sh").alias("__g"),
            )
        )
    else:
        exploded = _spread_by_key(df, id_col).select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.explode(char_shingles(text_col, n)).alias("__g"),
        )
        hot = (
            exploded.groupBy(*block_cols, "__g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select(*block_cols, "__g")
        )
        kept = exploded.join(
            F.broadcast(hot), [*block_cols, "__g"], "left_anti"
        )
        counts = kept.groupBy(id_col, *block_cols).agg(
            F.count("*").alias("__n_grams")
        )
        grams = kept.join(counts, [id_col, *block_cols])
    left = grams.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"__ba_{c}") for c in block_cols],
        F.col("__n_grams").alias("n_a"),
        "__g",
    )
    right = grams.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"__bb_{c}") for c in block_cols],
        F.col("__n_grams").alias("n_b"),
        F.col("__g").alias("__g_b"),
    )
    cond = (F.col("__g") == F.col("__g_b")) & (F.col("id_a") < F.col("id_b"))
    for c in block_cols:
        cond = cond & (F.col(f"__ba_{c}") == F.col(f"__bb_{c}"))
    pairs = (
        left.join(right, cond)
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
    )
    return pairs


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens (near-dup fingerprint).

    Token -> xxhash64 -> per-bit majority vote -> signature BIGINT.
    One explode + one groupBy(id) with 64 conditional-sum aggregates —
    all JVM-side, no UDF. Near-dups = signatures within small Hamming
    distance (compare via bit_count(a XOR b) in a banded join).
    """
    toks = _spread_by_key(df, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__t"),
    ).filter(F.length("__t") > 0)
    hashed = toks.select(id_col, F.xxhash64("__t").alias("__h"), F.lit(1).alias("__w"))
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"__b{i}")
        for i in range(64)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"__b{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_portable(
    df: DataFrame, id_col: str, text_col: str, n_bits: int = 60
) -> DataFrame:
    """SimHash with ENGINE-PORTABLE token hashing: the per-token hash
    is the first 15 hex chars of md5 (60 bits, so it fits signed int64
    with no sign games on any engine) instead of xxhash64. Same
    majority-vote construction as :func:`simhash64`; the trade is
    md5's higher per-token cost for a fingerprint any SQL engine can
    recompute bit-for-bit — which is what lets a DuckDB oracle verify
    the whole operator (queries/llm.dedup_simhash). Use ``simhash64``
    when orphan speed matters more than cross-engine replay."""
    toks = (
        _spread_by_key(df, id_col)
        .select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__t"),
        )
        .filter(F.length("__t") > 0)
    )
    hashed = toks.select(
        id_col,
        F.conv(F.substring(F.md5(F.col("__t")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("__h"),
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("__h"), i).bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"__b{i}")
        for i in range(n_bits)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(n_bits):
        bit = F.when(F.col(f"__b{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select(F.col(id_col), sig.alias("simhash"))
