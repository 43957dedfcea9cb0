"""Count-min sketch over DataFrames — the frequency member of the
mergeable-summary family (HLL cardinality: `hll_sketch_rollup`;
GK quantiles: `approx_percentile_qty`; PQ codebooks: `sim_pq_topk`;
bloom membership: `operators/joins.bloom_semi_join`).

A CMS is a depth x width counter grid: each key increments one
counter per row (column = seeded xxhash64 mod width), and a key's
estimate is the MIN of its depth counters — an overestimate bounded
by eps = e/width with probability 1 - (1/e)^depth. Everything here
is built from DataFrame primitives:

- the sketch itself is a DataFrame of at most depth*width rows
  (sparse: all-zero counters are simply absent), produced by one
  explode + one groupBy — shuffle volume is bounded by the GRID, not
  the data, no matter how many rows stream through;
- merging sketches of two datasets is an element-wise counter sum
  (union + groupBy) — the property that lets per-day / per-partition
  sketches roll up without rescanning raw data;
- point estimates broadcast the (tiny) grid and take the min over
  the key's depth probes.

The reference has no sketch analog (its aggregate surface is
delegated to Spark — SURVEY.md §2B); this module exists for the
100 TB curation path where exact per-key counts are a hot-key
shuffle but approximate heavy hitters are a grid-bounded one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _probes(
    key: F.Column, depth: int, width: int, portable: bool = False
) -> F.Column:
    """Array of (d, w) probe positions for a key.

    ``portable=True`` swaps xxhash64 for the suite's portable hash
    (first 8 hex chars of md5 of ``key|row``, 32 bits, mod width) so
    the whole sketch is replayable bit-for-bit by any SQL engine —
    the same scheme as ``dedup.minhash_signatures_portable``. Default
    stays xxhash64 (cheaper JVM codegen) for non-oracle use.
    """
    if portable:

        def w_of(i: int) -> F.Column:
            h = F.md5(
                F.concat_ws("|", key.cast("string"), F.lit(str(i)))
            )
            return F.pmod(
                F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
                F.lit(width),
            )

    else:

        def w_of(i: int) -> F.Column:
            return F.pmod(F.xxhash64(key, F.lit(i)), F.lit(width))

    return F.array(
        *[
            F.struct(F.lit(i).alias("d"), w_of(i).alias("w"))
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Sketch a column: returns (d, w, cnt) with <= depth*width rows."""
    probes = df.select(
        F.explode(_probes(F.col(key_col), depth, width, portable)).alias("p")
    )
    return probes.groupBy(
        F.col("p.d").alias("d"), F.col("p.w").alias("w")
    ).agg(F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise sum of counter grids — sketch(A) + sketch(B) ==
    sketch(A union-all B), exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Point-estimate each distinct key in ``keys``: adds an ``est``
    column (min over the key's depth counters; missing counter = 0).
    The sketch side is grid-bounded, so it broadcasts."""
    probes = keys.select(
        key_col,
        F.explode(_probes(F.col(key_col), depth, width, portable)).alias("p"),
    ).select(key_col, F.col("p.d").alias("d"), F.col("p.w").alias("w"))
    return (
        probes.join(F.broadcast(sketch), ["d", "w"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def portable_hash32(key: F.Column) -> F.Column:
    """Uniform 32-bit hash in [1, 2^32] any SQL engine can replay:
    first 8 hex chars of md5 of the key's string form, plus one (so a
    zero hash can never divide-by-zero an estimator)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        + 1
    )


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """K-minimum-values cardinality sketch per group: the k smallest
    distinct portable hashes of ``key_col`` — (group..., h) with at
    most k rows per group.

    The per-group cut is a rank-<=k filter the optimizer executes as
    WindowGroupLimit (per-partition heaps BEFORE the shuffle — the
    same bounded-postings shape as ``inverted_index``), so state per
    group is O(k) no matter how many keys stream through. Hash
    collisions collapse via distinct BEFORE ranking, which also makes
    the rank ordering total (h is unique within a group)."""
    hashed = (
        df.select(*group_cols, portable_hash32(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge per-group sketches into ONE global sketch: k smallest of
    the distinct union — sketch(A ∪ B) exactly, the property that lets
    per-day / per-partition sketches roll up without rescanning raw
    data. Distributed top-k (TakeOrderedAndProject), no global
    window."""
    return sketches.select("h").distinct().orderBy("h").limit(k)


def kmv_estimate_cols(k: int) -> tuple[F.Column, F.Column, F.Column]:
    """(k_used, kth_hash, est_distinct) aggregate columns over a
    sketch's ``h`` rows: if the sketch kept fewer than k hashes it
    holds EVERY distinct key (estimate is exact); otherwise the
    standard KMV estimator (k-1) * 2^32 / h_(k)."""
    k_used = F.count("*").cast("int").alias("k_used")
    kth = F.max("h").cast("bigint").alias("kth_hash")
    est = (
        F.when(F.count("*") < k, F.count("*").cast("bigint"))
        .otherwise(
            F.round(
                F.lit(float((k - 1) * 4294967296)) / F.max("h")
            ).cast("bigint")
        )
        .alias("est_distinct")
    )
    return k_used, kth, est
