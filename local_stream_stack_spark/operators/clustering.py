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

Iteration protocol (the MLlib discipline, fused for minimum stage
count — VERDICT r5 #3): centroids live DRIVER-SIDE between rounds as
plain integer lists — a BOUNDED collect of k x dim values (<= a few
KB; the contracted exception to the no-driver-loops rule, identical
to MLlib KMeans collecting centers each iteration) — and re-enter the
plan as LITERAL arrays. Each Lloyd round is then ONE job over the
materialized training set: scan-side argmin against the literal
centroids (array_min over k structs — zero join, zero extra shuffle),
posexplode, and a single partial-aggregated shuffle bounded by
k x dim rows for the centroid update. The old formulation's
per-iteration crossJoin + groupBy(id) shuffle + lineage-deep centroid
DataFrames (~30 scheduler stages on tiny data) are gone; at 100 TB
the per-round cost is the one scan + one bounded shuffle.

No reference analog (the reference delegates all computation to
Spark — SURVEY.md §2B north-star rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT_SCALE = 1_000_000
QUANT_SHIFT = 1_000_000

Centroid = tuple[int, list[int]]


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


def _books_array_sql(cents: list[Centroid]) -> str:
    """SQL literal ``array<struct<c:int,m:array<bigint>>>`` for one
    codebook. Built as TEXT and parsed JVM-side in ONE F.expr call:
    composing the same tree column-by-column costs thousands of py4j
    round-trips and explodes the analyzer tree (measured 3x slowdown
    on the PQ path); as a single literal it constant-folds once."""
    entries = ", ".join(
        f"named_struct('c', {int(c)}, 'm', array("
        + ", ".join(f"{int(v)}L" for v in m)
        + "))"
        for c, m in cents
    )
    return f"array({entries})"


_SQDIST_SQL = (
    "aggregate(zip_with({x}, {m}, (a, b) -> (a - b) * (a - b)),"
    " 0L, (acc, v) -> acc + v)"
)


def _argmin_struct(xcol_name: str, cents: list[Centroid]):
    """struct(d, c) of the nearest literal centroid — array_min over
    the per-entry distance structs is the same lexicographic
    (distance, cluster-id) total order as min(struct(d, c)),
    evaluated entirely scan-side against one folded literal."""
    d = _SQDIST_SQL.format(x=xcol_name, m="cb.m")
    return F.expr(
        f"array_min(transform({_books_array_sql(cents)},"
        f" cb -> named_struct('d', {d}, 'c', cb.c)))"
    )


def _merge_update(
    cents: list[Centroid], upd_rows
) -> list[Centroid]:
    """Fold collected (c, pos, mi) update rows into the driver-side
    centroid list; clusters with no members deterministically keep
    their previous centroid."""
    new: dict[int, dict[int, int]] = {}
    for r in upd_rows:
        new.setdefault(r["c"], {})[r["pos"]] = r["mi"]
    out: list[Centroid] = []
    for c, m in cents:
        if c in new:
            out.append((c, [int(new[c][p]) for p in range(len(m))]))
        else:
            out.append((c, m))
    return out


def kmeans_lloyd_centroids(
    vectors: DataFrame,
    k: int,
    iterations: int,
    materialize_input: bool = True,
) -> list[Centroid]:
    """The trained centroid list itself (driver-side, k x dim
    bounded) — the coarse-quantizer form consumed by IVF/IVF-PQ cell
    assignment. Same fused protocol as ``kmeans_lloyd_quantized``
    (which wraps this and adds the stats pass)."""
    if materialize_input:
        vectors = vectors.localCheckpoint(eager=True)
    seed_rows = (
        vectors.withColumn("__h", F.md5(F.col("id").cast("string")))
        .orderBy("__h", "id")
        .limit(k)
        .select("__h", "id", "x")
        .collect()
    )
    seed_rows.sort(key=lambda r: (r["__h"], r["id"]))
    cents: list[Centroid] = [
        (i, [int(v) for v in r["x"]]) for i, r in enumerate(seed_rows)
    ]
    for _ in range(iterations):
        if not cents:
            break
        best = _argmin_struct("x", cents)
        upd_rows = (
            vectors.select(best["c"].alias("c"), "x")
            .select("c", F.posexplode("x").alias("pos", "xv"))
            .groupBy("c", "pos")
            .agg(F.sum("xv").alias("s"), F.count("*").alias("n"))
            .select(
                "c",
                "pos",
                F.expr("(2 * s + n) div (2 * n)").cast("bigint").alias("mi"),
            )
            .collect()
        )
        cents = _merge_update(cents, upd_rows)
    return cents


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
    frame once so every Lloyd round reads materialized blocks instead
    of re-running scan+quantize (at 100 TB: MEMORY_AND_DISK persist;
    unreferenced blocks are cleaned by the ContextCleaner between
    invocations). Each round is ONE bounded-shuffle job with the
    current centroids inlined as literals — see the module docstring
    for the driver-side-centroid contract."""
    if materialize_input:
        vectors = vectors.localCheckpoint(eager=True)
    cents = kmeans_lloyd_centroids(
        vectors, k, iterations, materialize_input=False
    )
    if not cents:
        # empty corpus: no seeds, no clusters — typed empty result
        # (an empty literal codebook would not even analyze)
        return vectors.sparkSession.createDataFrame(
            [],
            "cluster int, n_members bigint, centroid_l1 bigint,"
            " inertia bigint",
        )

    best = _argmin_struct("x", cents)
    stats = (
        vectors.select(best["c"].alias("c"), best["d"].alias("d"))
        .groupBy("c")
        .agg(F.count("*").alias("n_members"), F.sum("d").alias("inertia"))
    )
    csum = vectors.sparkSession.createDataFrame(
        [(int(c), int(sum(m))) for c, m in cents],
        "c int, centroid_l1 bigint",
    )
    return (
        stats.join(F.broadcast(csum), "c")
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


GroupedBooks = dict[int, list[Centroid]]


def _argmin_struct_grouped(
    xcol_name: str, gcol_name: str, books: GroupedBooks
):
    """struct(d, c) of the nearest centroid of THIS ROW'S group: ONE
    literal ``map<int, array<struct<c,m>>>`` codebook, element_at on
    the row's group, then the same transform/array_min argmin —
    entirely scan-side, one parsed expression regardless of group
    count."""
    entries = ", ".join(
        f"{int(g)}, {_books_array_sql(books[g])}" for g in sorted(books)
    )
    d = _SQDIST_SQL.format(x=xcol_name, m="cb.m")
    return F.expr(
        f"array_min(transform(element_at(map({entries}), {gcol_name}),"
        f" cb -> named_struct('d', {d}, 'c', cb.c)))"
    )


def kmeans_lloyd_grouped_books(
    vectors: DataFrame,
    k: int,
    iterations: int,
    materialize_input: bool = True,
) -> GroupedBooks:
    """Per-group Lloyd on a (g, id, x) frame, fused like
    ``kmeans_lloyd_quantized``: every group trains its own k centroids
    in the SAME distributed passes (the product-quantization codebook
    shape: one group per subspace), with the groups x k x dim codebook
    carried driver-side between rounds (bounded collect) and inlined
    as literals. Seeds per group: k smallest (md5(id), id) — a window
    PARTITIONED by group, so no global single-reducer sort. Returns
    {g: [(c, m), ...]}."""
    if materialize_input:
        vectors = vectors.localCheckpoint(eager=True)
    wseed = Window.partitionBy("g").orderBy("__h", "id")
    seed_rows = (
        vectors.withColumn("__h", F.md5(F.col("id").cast("string")))
        .withColumn("__rn", F.row_number().over(wseed))
        .filter(F.col("__rn") <= k)
        .select("g", (F.col("__rn") - 1).alias("c"), "x")
        .collect()
    )
    books: GroupedBooks = {}
    for r in sorted(seed_rows, key=lambda r: (r["g"], r["c"])):
        books.setdefault(int(r["g"]), []).append(
            (int(r["c"]), [int(v) for v in r["x"]])
        )
    if not books:
        return books

    for _ in range(iterations):
        best = _argmin_struct_grouped("x", "g", books)
        # two-step select — see kmeans_lloyd_quantized
        upd_rows = (
            vectors.select("g", best["c"].alias("c"), "x")
            .select("g", "c", F.posexplode("x").alias("pos", "xv"))
            .groupBy("g", "c", "pos")
            .agg(F.sum("xv").alias("s"), F.count("*").alias("n"))
            .select(
                "g",
                "c",
                "pos",
                F.expr("(2 * s + n) div (2 * n)").cast("bigint").alias("mi"),
            )
            .collect()
        )
        new: dict[tuple[int, int], dict[int, int]] = {}
        for r in upd_rows:
            new.setdefault((int(r["g"]), int(r["c"])), {})[r["pos"]] = r["mi"]
        books = {
            g: [
                (
                    c,
                    [
                        int(new[(g, c)][p])
                        for p in range(len(m))
                    ]
                    if (g, c) in new
                    else m,
                )
                for c, m in cents
            ]
            for g, cents in books.items()
        }
    return books


def books_to_df(spark, books: GroupedBooks) -> DataFrame:
    """(g, c, m) local-relation DataFrame from a driver-side codebook
    — broadcastable for free (no job, no checkpoint)."""
    rows = [
        (int(g), int(c), [int(v) for v in m])
        for g, cents in sorted(books.items())
        for c, m in cents
    ]
    return spark.createDataFrame(rows, "g int, c int, m array<bigint>")


def kmeans_lloyd_grouped(
    vectors: DataFrame,
    k: int,
    iterations: int,
    materialize_input: bool = True,
) -> DataFrame:
    """DataFrame form of ``kmeans_lloyd_grouped_books``: returns the
    (g, c, m) codebook as a local relation."""
    books = kmeans_lloyd_grouped_books(
        vectors, k, iterations, materialize_input=materialize_input
    )
    return books_to_df(vectors.sparkSession, books)


def assign_grouped_literal(
    vectors: DataFrame, books: GroupedBooks, keep_dist: bool = False
) -> DataFrame:
    """Nearest-centroid assignment per group on (g, id, x) against a
    driver-side codebook: pure scan-side expression — zero join, zero
    shuffle (the PQ encode step at 100 TB is a single pass)."""
    if not books:
        out = vectors.select(
            "g",
            "id",
            "x",
            F.lit(None).cast("int").alias("c"),
            F.lit(None).cast("bigint").alias("d"),
        ).filter(F.lit(False))
        return out if keep_dist else out.drop("d")
    best = _argmin_struct_grouped("x", "g", books)
    out = vectors.select(
        "g", "id", "x", best["c"].alias("c"), best["d"].alias("d")
    )
    return out if keep_dist else out.drop("d")


def assign_grouped(
    vectors: DataFrame, cent: DataFrame, keep_dist: bool = False
) -> DataFrame:
    """Nearest-centroid assignment per group on (g, id, x) against a
    (g, c, m) centroid DATAFRAME: broadcast join on g, argmin via
    struct-min (one partial-aggregated shuffle on (g, id)). Kept for
    codebooks that already live in a DataFrame; prefer
    ``assign_grouped_literal`` when the codebook is driver-side."""
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
