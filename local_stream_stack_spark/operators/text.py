"""Text-analysis operators for training-data pipelines.

North-star operators over the ``documents`` table: token counting,
quality scoring (length / punctuation / character-class ratios),
n-gram-heuristic language ID, and document fingerprinting. All pure
``pyspark.sql.functions`` — regex + arithmetic stay inside whole-stage
codegen; no Python in the hot path, so these run at scan speed on any
corpus size.

Regex patterns use explicit ASCII classes ([A-Za-z], [0-9]) so Java
(Spark) and RE2 (DuckDB oracle) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword markers for the n-gram heuristic.
# Word-boundary-ish patterns that Java regex and RE2 treat identically.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "los", "es", "una"],
    "fr": ["le", "les", "est", "une", "dans"],
    "de": ["der", "die", "und", "ist", "nicht"],
}


def token_count(text: Column) -> Column:
    """Whitespace tokens (0 for empty/blank strings)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r" +"))
    )


def wordlike_count(text: Column) -> Column:
    """BPE-ish segment count: letter runs, digit runs, single symbols."""
    return F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add token/char-class statistics and a composite quality score.

    quality_score in [0,1]: rewards alpha-dominated text with moderate
    token length, penalizes digit/punct-heavy strings — the standard
    cheap pre-filter shape for LLM corpus cleaning.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    # fixed single-char classes: count via translate (one char-map
    # pass) instead of regexp_count (regex engine per char) — same
    # integer counts, measured markedly cheaper on the corpus scan
    _alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    n_alpha = n_chars - F.length(F.translate(t, _alpha, ""))
    n_digit = n_chars - F.length(F.translate(t, "0123456789", ""))
    n_space = n_chars - F.length(F.translate(t, " ", ""))
    n_punct = n_chars - F.length(F.translate(t, ".,;:!?'\"()[]{}-", ""))
    n_tok = token_count(t)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("n_wordlike", wordlike_count(t))
        .withColumn("alpha_ratio", n_alpha.cast("double") / safe_chars)
        .withColumn("digit_ratio", n_digit.cast("double") / safe_chars)
        .withColumn("punct_ratio", n_punct.cast("double") / safe_chars)
        .withColumn("space_ratio", n_space.cast("double") / safe_chars)
        .withColumn(
            "avg_token_len",
            F.when(n_tok > 0, (n_chars - n_space).cast("double") / n_tok.cast("double")),
        )
        .withColumn(
            "quality_score",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.least(
                        F.lit(1.0),
                        F.col("alpha_ratio")
                        - F.col("digit_ratio")
                        - F.col("punct_ratio") * 0.5,
                    ),
                ),
                6,
            ),
        )
    )


def lang_marker_score(text: Column, lang: str) -> Column:
    """Count of language-marker stopwords (space-delimited) in text."""
    words = LANG_MARKERS[lang]
    pat = "(^| )(" + "|".join(words) + ")( |$)"
    return F.regexp_count(F.lower(text), F.lit(pat))


def lang_id_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker scores, 'und' if all 0.

    Ties break by fixed priority (en > es > fr > de) so the prediction
    is deterministic. Latin-script languages only — the 'zh' rows score
    0 everywhere and classify as 'und', which the oracle reproduces.
    """
    t = F.col(text_col)
    scored = df
    for lang in LANG_MARKERS:
        scored = scored.withColumn(f"score_{lang}", lang_marker_score(t, lang))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = fixed priority
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.withColumn("predicted_lang", pred)


def clean_text(
    df: DataFrame, text_col: str = "text", out_col: str = "clean"
) -> DataFrame:
    """Corpus-cleaning scrub: strip HTML tags, URLs, and email
    addresses, collapse the leftover whitespace, and count what was
    removed (the audit columns a curation report needs).

    Patterns use constructs Java regex and RE2 interpret identically
    (no backrefs/lookarounds), so a DuckDB oracle can mirror the exact
    transform. Pure codegen regexp_replace/regexp_count — scan-shaped.
    """
    t = F.col(text_col)
    pat_html = r"<[^>]*>"
    pat_url = r"https?://[^ ]+"
    pat_email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    cleaned = t
    for pat in (pat_html, pat_url, pat_email):
        cleaned = F.regexp_replace(cleaned, pat, " ")
    cleaned = F.trim(F.regexp_replace(cleaned, r" +", " "))
    return (
        df.withColumn("n_html", F.regexp_count(t, F.lit(pat_html)))
        .withColumn("n_urls", F.regexp_count(t, F.lit(pat_url)))
        .withColumn("n_emails", F.regexp_count(t, F.lit(pat_email)))
        .withColumn(out_col, cleaned)
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Sliding-window document chunking (the context-window prep step of
    a training pipeline): one row per chunk of ``chunk_size`` chars
    starting every ``stride`` chars (overlap = chunk_size - stride).

    Pure codegen: sequence + explode + substr — a row-expanding
    projection with NO shuffle; output cardinality is
    ceil(len/stride) per doc, decided executor-side. chunk_idx derives
    from chunk_start arithmetically so it is engine-independent.
    Empty docs emit one empty chunk (chunk_start=1) — callers filter
    if unwanted.
    """
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(t), F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col), t.alias("__t"), F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            F.expr(f"CAST((chunk_start - 1) DIV {stride} AS INT)").alias(
                "chunk_idx"
            ),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.expr(f"substr(__t, chunk_start, {chunk_size})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("bigint"))
    )


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Word n-gram repetition ratio — the standard boilerplate/spam
    signal (a doc whose 3-grams are mostly duplicates is template or
    looped text).

    repetition_ratio = 1 - distinct_ngrams/total_ngrams, 0.0 for docs
    with < n words. Array higher-order functions only (transform over a
    sequence + array_distinct), scan-shaped, no Python and no shuffle.

    The word and gram arrays are STAGED as projection columns: HOFs are
    interpreted (no subexpression elimination), so inlining the split
    tree into the gram lambda re-runs the regex split per gram element,
    and inlining the gram tree into each of the three consumers
    (n_ngrams / n_distinct / ratio) multiplies that again — measured
    ~25x slower than this staged form at sf0.1. Multiple references to
    each staged column keep CollapseProject from inlining them back.
    """
    t = F.col(text_col)
    words = F.col("__rr_w")
    n_words = F.size(words)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(words, i + F.lit(j)) for j in range(n)]
    )
    grams = F.when(
        n_words >= n,
        F.transform(F.sequence(F.lit(0), n_words - n), gram),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(F.col("__rr_g")).cast("bigint")
    n_distinct = F.size(F.array_distinct(F.col("__rr_g"))).cast("bigint")
    ratio = F.when(
        F.col("n_ngrams") > 0,
        F.round(
            F.lit(1.0)
            - F.col("n_distinct_ngrams").cast("double")
            / F.col("n_ngrams").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("__rr_w", F.split(F.trim(t), r"\s+"))
        .withColumn("__rr_g", grams)
        .withColumn("n_ngrams", n_grams)
        .withColumn("n_distinct_ngrams", n_distinct)
        .withColumn("repetition_ratio", ratio)
        .drop("__rr_w", "__rr_g")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: raw md5, normalized md5 (lower + collapsed
    whitespace), and a 64-bit hash of the normalized form."""
    t = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return (
        df.withColumn("md5_raw", F.md5(t))
        .withColumn("md5_norm", F.md5(norm))
        .withColumn("hash64", F.xxhash64(norm))
    )


# Stopword list for the Gopher-style document filter: must stay in
# sync with the oracle SQL literal in queries/llm.py.
QUALITY_STOPWORDS: list[str] = ["the", "a", "and", "of", "is", "to", "in", "it"]


def quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality flags (Rae et al. 2021, "Scaling
    Language Models" §A1.1 quality heuristics), integer-exact.

    Every rule is an INTEGER comparison (ratio thresholds become
    cross-multiplications), so the flags are bit-stable across engines
    and summation orders. All five signals are computed scan-side with
    array HOFs — one pass, zero shuffles, zero Python; the repetition
    signal (top word frequency) folds a sorted-run max over the
    token array instead of an explode + groupBy, so the operator
    stays a narrow map at any corpus size.

    Rules (thresholds tuned to discriminate on the word-soup corpus;
    the published Gopher bounds are noted inline):
      ok_word_count    25 <= n_words <= 1000   (Gopher: 50..100k)
      ok_mean_word_len 3 <= mean <= 10 chars   (Gopher: 3..10)
      ok_alpha_words   >= 80% of words contain a letter (Gopher: 80%)
      ok_stopwords     >= 2 stopword hits      (Gopher: >= 2 of a list)
      ok_repetition    top word <= 20% of words (Gopher: top-2-gram cap)
    """
    toks = f"filter(split(trim({text_col}), ' +'), x -> x != '')"
    stop_lit = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    run_max = f"""
      aggregate(
        array_sort({toks}),
        named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
        (acc, x) -> named_struct(
          'prev', x,
          'run', IF(acc.prev <=> x, acc.run + 1, 1),
          'best', GREATEST(acc.best, IF(acc.prev <=> x, acc.run + 1, 1))),
        acc -> acc.best)
    """
    return (
        df.withColumn("__toks", F.expr(toks))
        .withColumn("n_words", F.size("__toks"))
        .withColumn(
            "__wc",
            F.expr("aggregate(__toks, 0, (acc, x) -> acc + length(x))"),
        )
        .withColumn(
            "__aw", F.expr("size(filter(__toks, x -> x rlike '[A-Za-z]'))")
        )
        .withColumn(
            "__sh",
            F.expr(f"size(filter(__toks, x -> lower(x) IN ({stop_lit})))"),
        )
        .withColumn("__mx", F.expr(run_max))
        .withColumn(
            "ok_word_count",
            F.col("n_words").between(25, 1000).cast("int"),
        )
        .withColumn(
            "ok_mean_word_len",
            (
                (F.col("__wc") >= 3 * F.col("n_words"))
                & (F.col("__wc") <= 10 * F.col("n_words"))
            ).cast("int"),
        )
        .withColumn(
            "ok_alpha_words",
            (5 * F.col("__aw") >= 4 * F.col("n_words")).cast("int"),
        )
        .withColumn("ok_stopwords", (F.col("__sh") >= 2).cast("int"))
        .withColumn(
            "ok_repetition",
            (5 * F.col("__mx") <= F.col("n_words")).cast("int"),
        )
        .withColumn(
            "keep",
            (
                F.col("ok_word_count")
                * F.col("ok_mean_word_len")
                * F.col("ok_alpha_words")
                * F.col("ok_stopwords")
                * F.col("ok_repetition")
            ).cast("int"),
        )
        .drop("__toks", "__wc", "__aw", "__sh", "__mx")
    )


# PII patterns, deliberately lookaround-free so the SAME pattern text
# runs under Java regex (Spark) and RE2 (DuckDB) with identical
# semantics — the cross-engine subset both engines implement alike.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,2}-\d{3}-\d{3}-\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact PII spans (emails, phone numbers, IPv4
    addresses) — the curation scrub every training-data pipeline runs
    before anything ships.

    Adds ``n_<kind>`` REDACTION counts per kind, ``redacted`` (each
    span replaced by ``<KIND>``), and ``pii_chars_removed`` (original
    length minus redacted length plus the replacement-token lengths —
    i.e. exactly the PII characters dropped). Each kind is counted on
    the text already redacted by the PRECEDING kinds, mirroring the
    replacement order — so a span consumed by an earlier pattern
    (e.g. an ipv4-looking domain inside an email) is neither
    double-counted nor counted without a matching redaction, and
    ``pii_chars_removed`` is exact by construction (ADVICE r7 #3).
    Pure built-in ``regexp_extract_all``/``regexp_replace``:
    JVM-side, scan-shaped, no shuffle — at 100 TB this is a map-only
    pass. Order matters: emails are redacted before IPv4 so a dotted
    domain can't be re-matched as an address."""
    c = F.col(text_col)
    out = df
    staged = c
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(
                F.regexp_extract_all(staged, F.lit(pat), F.lit(0))
            ).cast("int"),
        )
        staged = F.regexp_replace(staged, pat, f"<{kind.upper()}>")
    out = out.withColumn("redacted", staged)
    removed = (
        F.length(c)
        - F.length(F.col("redacted"))
        + sum(
            F.col(f"n_{k}") * (len(k) + 2) for k in PII_PATTERNS
        )
    )
    return out.withColumn(
        "pii_chars_removed", removed.cast("bigint")
    )
