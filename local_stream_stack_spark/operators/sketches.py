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
