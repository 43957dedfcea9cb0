"""Distributed k-means (Lloyd's algorithm) over embedding columns —
the iterative-ML representative of the training-data tier, and the
trainer for ``sim_ivf_topk``-style coarse quantizers.

Everything is INTEGER-exact so the result is partitioning- AND
engine-deterministic (the suite's portable-determinism discipline,
same family as ``operators/graph.pagerank``):

- vectors are floor-quantized to BIGINT at 1e-6 resolution and
  SHIFTED non-negative (``x = floor(v * 1e6) + 1e6``) — distances are
  shift-invariant, and non-negative integers make round-half-up
  integer division identical across engines (truncating and flooring
  division agree);
- centroids are integer vectors: the rounded integer mean per
  dimension, ``m = (2*s + n) div (2*n)`` (round-half-up — the
  pagerank idiom), never a float mean whose accumulation order
  varies;
- assignment is argmin of the exact integer squared distance
  ``sum((x_i - m_i)^2)`` with ties broken by cluster id — a total
  order both engines compute identically;
- seeds are the k vectors with the smallest ``(md5(id), id)`` key —
  the suite's deterministic permutation — picked via distributed
  top-k (TakeOrderedAndProject), never a global window.

Scale shape per iteration: one broadcast of the k x dim centroid
table, one scan-side distance computation (zip_with/aggregate, JVM
codegen, no Python), and one partial-aggregated shuffle bounded by
k x dim rows for the centroid update. Empty clusters keep their
previous centroid (deterministic fallback).

No reference analog (the reference delegates all computation to
Spark — SURVEY.md §2B north-star rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT_SCALE = 1_000_000
QUANT_SHIFT = 1_000_000


def quantize_vectors(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, x) with x = floor(v * 1e6) + 1e6 per dimension — exact
    BIGINT, non-negative for |v| <= 1."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec_col,
            lambda v: F.floor(v.cast("double") * F.lit(float(QUANT_SCALE)))
            .cast("bigint")
            + F.lit(QUANT_SHIFT),
        ).alias("x"),
    )


def _sqdist(x, m):
    return F.aggregate(
        F.zip_with(x, m, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_lloyd_quantized(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 3,
    materialize_input: bool = True,
) -> DataFrame:
    """Run ``iterations`` full Lloyd rounds on a quantized (id, x)
    frame, then a final assignment pass; returns one row per cluster:
    (cluster, n_members, centroid_l1, inertia).

    centroid_l1 = sum of the final centroid's integer coordinates (a
    portable checksum of the centroid position); inertia = total
    squared distance of members to their final centroid.

    ``materialize_input`` localCheckpoints the quantized training
    frame once so the 2*(iterations+1) downstream branches read the
    materialized blocks instead of re-running scan+quantize each —
    the same persist-the-training-set discipline MLlib's iterative
    trainers use (at 100 TB: MEMORY_AND_DISK persist; unreferenced
    blocks are cleaned by the ContextCleaner between invocations).
    """
    if materialize_input:
        vectors = vectors.localCheckpoint(eager=True)
    # deterministic seeds: distributed top-k on the md5 permutation,
    # then rank inside the k-row result (window over k rows only)
    seeded = vectors.withColumn(
        "__h", F.md5(F.col("id").cast("string"))
    ).orderBy("__h", "id").limit(k)
    wseed = Window.orderBy("__h", "id")
    cent = seeded.select(
        (F.row_number().over(wseed) - 1).alias("c"), F.col("x").alias("m")
    )

    for _ in range(iterations):
        assigned = _assign(vectors, cent)
        # centroid update: explode members -> exact integer sums per
        # (cluster, dim) -> rounded integer mean; shuffle bounded by
        # k x dim after partial aggregation
        upd = (
            assigned.select("c", F.posexplode("x").alias("pos", "xv"))
            .groupBy("c", "pos")
            .agg(F.sum("xv").alias("s"), F.count("*").alias("n"))
            .withColumn(
                "mi",
                F.expr("(2 * s + n) div (2 * n)").cast("bigint"),
            )
            .groupBy("c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mi"))),
                    lambda st: st.mi,
                ).alias("m_new")
            )
        )
        # empty clusters deterministically keep their previous centroid
        cent = (
            cent.join(upd, "c", "left")
            .select("c", F.coalesce("m_new", "m").alias("m"))
        )

    if materialize_input:
        # the k-row centroid table feeds BOTH the final assignment and
        # the checksum branch — materialize it once so neither re-runs
        # the full training DAG (k rows: always bounded)
        cent = cent.localCheckpoint(eager=True)
    final = _assign(vectors, cent, keep_dist=True)
    stats = final.groupBy("c").agg(
        F.count("*").alias("n_members"),
        F.sum("d").alias("inertia"),
    )
    csum = cent.select(
        "c",
        F.aggregate(
            "m", F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("centroid_l1"),
    )
    return (
        stats.join(csum, "c")
        .select(
            F.col("c").cast("int").alias("cluster"),
            F.col("n_members").cast("bigint"),
            F.col("centroid_l1").cast("bigint"),
            F.col("inertia").cast("bigint"),
        )
        .orderBy("cluster")
    )


def quantize_vectors_normalized(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, x) with x = floor(v / ||v|| * 1e6) + 1e6 — L2-normalize
    BEFORE quantizing so squared-L2 distance ranks like cosine. The
    norm is a LEFT FOLD over the array in element order (F.aggregate
    here, list_reduce in the oracle): both engines execute the same
    IEEE double sequence, so the floor()ed integers are identical —
    the same portability argument as the suite's cosine oracles."""
    nn = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec_col,
            lambda v: F.floor(
                v.cast("double") / nn * F.lit(float(QUANT_SCALE))
            ).cast("bigint")
            + F.lit(QUANT_SHIFT),
        ).alias("x"),
    )


def split_subspaces(vectors: DataFrame, m_sub: int, dim: int) -> DataFrame:
    """(g, id, x) sub-vector rows from a (id, x) frame: subspace g
    holds dimensions [g*dim/m, (g+1)*dim/m). Pure slice/explode —
    JVM codegen, scan-shaped."""
    dsub = dim // m_sub
    return vectors.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("g"),
                        F.slice("x", g * dsub + 1, dsub).alias("xs"),
                    )
                    for g in range(m_sub)
                ]
            )
        ).alias("s"),
    ).select(F.col("s.g").alias("g"), "id", F.col("s.xs").alias("x"))


def kmeans_lloyd_grouped(
    vectors: DataFrame,
    k: int,
    iterations: int,
    materialize_input: bool = True,
) -> DataFrame:
    """Per-group Lloyd on a (g, id, x) frame — every group trains its
    own k centroids in the SAME distributed passes (the
    product-quantization codebook shape: one group per subspace).
    Identical integer-exact discipline as ``kmeans_lloyd_quantized``.
    Seeds per group: k smallest (md5(id), id) — a window PARTITIONED
    by group, so no global single-reducer sort. Returns (g, c, m).
    ``materialize_input`` persists the (bounded: sample x groups)
    training frame once for the iteration branches, as in
    ``kmeans_lloyd_quantized``."""
    if materialize_input:
        vectors = vectors.localCheckpoint(eager=True)
    wseed = Window.partitionBy("g").orderBy("__h", "id")
    cent = (
        vectors.withColumn("__h", F.md5(F.col("id").cast("string")))
        .withColumn("__rn", F.row_number().over(wseed))
        .filter(F.col("__rn") <= k)
        .select("g", (F.col("__rn") - 1).alias("c"), F.col("x").alias("m"))
    )
    for _ in range(iterations):
        assigned = assign_grouped(vectors, cent)
        upd = (
            assigned.select("g", "c", F.posexplode("x").alias("pos", "xv"))
            .groupBy("g", "c", "pos")
            .agg(F.sum("xv").alias("s"), F.count("*").alias("n"))
            .withColumn(
                "mi", F.expr("(2 * s + n) div (2 * n)").cast("bigint")
            )
            .groupBy("g", "c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mi"))),
                    lambda st: st.mi,
                ).alias("m_new")
            )
        )
        cent = (
            cent.join(upd, ["g", "c"], "left")
            .select("g", "c", F.coalesce("m_new", "m").alias("m"))
        )
    return cent


def assign_grouped(
    vectors: DataFrame, cent: DataFrame, keep_dist: bool = False
) -> DataFrame:
    """Nearest-centroid assignment per group on (g, id, x): broadcast
    the groups x k centroid table, join on g, argmin via struct-min
    (one partial-aggregated shuffle on (g, id))."""
    scored = vectors.join(F.broadcast(cent), "g").select(
        "g",
        "id",
        "x",
        "c",
        _sqdist(F.col("x"), F.col("m")).alias("d"),
    )
    best = scored.groupBy("g", "id").agg(
        F.min(F.struct("d", "c")).alias("best"),
        F.first("x").alias("x"),
    )
    out = best.select(
        "g", "id", "x", F.col("best.c").alias("c"), F.col("best.d").alias("d")
    )
    return out if keep_dist else out.drop("d")


def _assign(
    vectors: DataFrame, cent: DataFrame, keep_dist: bool = False
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid table,
    score scan-side, argmin via lexicographic struct-min (one partial-
    aggregated shuffle on id — no window)."""
    scored = vectors.crossJoin(F.broadcast(cent)).select(
        "id",
        "x",
        F.col("c"),
        _sqdist(F.col("x"), F.col("m")).alias("d"),
    )
    best = scored.groupBy("id").agg(
        F.min(F.struct("d", "c")).alias("best"),
        F.first("x").alias("x"),
    )
    out = best.select(
        "id", "x", F.col("best.c").alias("c"), F.col("best.d").alias("d")
    )
    return out if keep_dist else out.drop("d")
