"""Connected components over pair/edge frames — the clustering step of
near-dup deduplication.

Candidate generators (``minhash_lsh_candidates``, ``ngram_jaccard_pairs``,
``cosine_allpairs_threshold_blocked``) emit PAIRS; an actual dedup pass
needs CLUSTERS (keep one canonical doc per transitively-connected
group: A~B, B~C => {A,B,C} even if A!~C). The reference has no graph
operator at all; this is the standard iterative min-label propagation
expressed in DataFrame ops (the Pregel/GraphX pattern without GraphX,
which PySpark does not ship).

Scale notes (100 TB):
- each iteration is ONE shuffle keyed on node id (edges join labels,
  then a min-aggregate); no driver materialization — the convergence
  probe is a LIMIT 1 existence count.
- iteration count = component diameter. Near-dup graphs are
  near-cliques (diameter 2-4), so the loop runs ~3 times in practice;
  ``max_iter`` bounds adversarial chains. For planet-scale
  high-diameter graphs the alternating large-star/small-star variant
  (Kiveris et al., "Connected Components in MapReduce") halves rounds —
  same per-round plan shape as here.
- ``localCheckpoint`` truncates lineage each round so the plan does not
  grow with iterations (a classic iterative-DataFrame failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component is the MINIMUM node id transitively reachable — a
    deterministic, engine-independent cluster representative.

    Isolated nodes (no edges) are the identity component and are not
    emitted; union the node table in afterwards if needed.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("s").alias("n"))
        .distinct()
        .withColumn("c", F.col("n"))
        .localCheckpoint(eager=True)
    )
    # Convergence check: min-label propagation only ever DECREASES a
    # node's label and never changes the node set, so for NUMERIC ids
    # Σc strictly decreases iff any label changed this round. Tracking
    # the exact decimal sum replaces the former per-round
    # join-and-compare against the previous labels (one extra shuffle
    # join per round) with a single aggregate over the already-
    # checkpointed table — same decision, one cheap job (guide §2.4;
    # DECIMAL(38,0) cannot overflow: |nodes| * max id fits 38 digits
    # for any BIGINT ids). Non-numeric ids (string entity keys) keep
    # the exact join-based comparison — no numeric monotone summary
    # exists for lexicographic minima.
    numeric_ids = dict(labels.dtypes)["c"] in (
        "tinyint", "smallint", "int", "bigint",
    )

    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.expr("CAST(c AS DECIMAL(38,0))")).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_sum(labels) if numeric_ids else None
    for _ in range(max_iter):
        nbr = und.join(labels, und["s"] == labels["n"]).select(
            F.col("d").alias("n"), F.col("c")
        )
        new = (
            labels.union(nbr)
            .groupBy("n")
            .agg(F.min("c").alias("c"))
            .localCheckpoint(eager=True)
        )
        if numeric_ids:
            new_sum = _label_sum(new)
            labels = new
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        else:
            changed = (
                new.alias("a")
                .join(labels.alias("b"), "n")
                .filter(F.col("a.c") != F.col("b.c"))
                .limit(1)
                .count()
            )
            labels = new
            if changed == 0:
                break
    return labels.select(F.col("n").alias("node"), F.col("c").alias("component"))


def connected_components_twostar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the HIGH-DIAMETER scale path that SCALE.md's graph
    section names: min-label propagation (:func:`connected_components`)
    needs one round per unit of component diameter, while star
    contraction converges in O(log^2 n) rounds on chains and other
    long-diameter graphs.

    Same output contract as :func:`connected_components`: (node,
    component) with component = the minimum transitively-reachable
    node id; isolated nodes are not emitted. Near-dup graphs are
    near-cliques (diameter 2-4), where min-label's one-shuffle rounds
    win — so that stays the default and this is the documented
    alternative for adversarial/chain-shaped graphs, pinned equivalent
    in tests/test_graph_ops.py on both shapes.

    Per round: TWO groupBys keyed on node id (large-star hooks every
    neighbor larger than the center to the center's minimum neighbor;
    small-star re-hooks the rest), edge multiplicity deduped, lineage
    truncated per round via localCheckpoint. State is the evolving
    edge list itself — one row per edge, no labels table.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # remember every node that ever had an edge: star contraction can
    # end with singleton star centers, but members must still report
    original = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _star(cur: DataFrame, large: bool) -> DataFrame:
        # neighborhood per center, both directions
        und = cur.union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = und.groupBy("u").agg(F.min("v").alias("mn"))
        nb = und.join(m, "u").select(
            "u", "v", F.least("mn", F.col("u")).alias("m")
        )
        if large:
            # hook strictly larger neighbors to the neighborhood min
            hooked = nb.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            # hook strictly smaller neighbors AND the center itself
            hooked = nb.filter(F.col("v") < F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            ).union(
                m.select(
                    F.col("u"),
                    F.least("mn", F.col("u")).alias("v"),
                )
            )
        return (
            hooked.filter(F.col("u") != F.col("v")).distinct()
        )

    cur = e
    for _ in range(max_iter):
        after_large = _star(cur, large=True).localCheckpoint(eager=True)
        after_small = _star(after_large, large=False).localCheckpoint(
            eager=True
        )
        # converged when the round was a no-op on the edge set (the
        # star forest is small-star's fixpoint)
        delta = (
            after_small.exceptAll(cur)
            .union(cur.exceptAll(after_small))
            .limit(1)
            .count()
        )
        cur = after_small
        if delta == 0:
            break
    # cur is a star forest: (member, center). Members map to their
    # center; centers (and nodes whose component collapsed onto them)
    # map to themselves.
    members = cur.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    )
    centers = original.join(
        members.select(F.col("node").alias("n2")),
        original["node"] == F.col("n2"),
        "left_anti",
    ).select("node", F.col("node").alias("component"))
    return members.union(centers)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    scale: int = 12,
) -> DataFrame:
    """PageRank by power iteration with INTEGER-exact accumulation:
    ranks are scaled BIGINTs (``rank_e12`` = rank x 10^scale) and every
    division rounds half-up via pure integer arithmetic
    (``(2a + b) div (2b)``), so iteration results are bit-identical on
    any engine, partitioning, and rerun — float sums in shuffle order
    would drift in the last ulp and compound across iterations, and
    even decimal division orders rounding engine-specifically.
    ``damping`` must be a multiple of 0.01 (it becomes the integer
    percentage in the exact update rule).

    Per iteration: each node splits its rank over its out-edges and the
    damped contributions sum per destination — one shuffle on the
    destination key; dangling nodes' mass redistributes uniformly (the
    standard correction) via a 1-row aggregate that broadcasts back.

    Scale: state is one (node, rank) row per node; contributions are
    one row per edge per iteration — the same exchange a single
    aggregation over the edge list costs. ``iterations`` bounds
    wall-clock; convergence for ranking purposes typically needs ~10.
    Returns (node, rank DECIMAL, rank_e12 BIGINT) with ranks summing
    to ~1; a SQL oracle can replay the identical fixed-point update
    (see queries/training_ops.pagerank_copurchase).
    """
    M = 10**scale
    dampN = round(damping * 100)
    if abs(dampN / 100 - damping) > 1e-12:
        raise ValueError("damping must be a multiple of 0.01")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    nodes = (
        e.select(F.col("s").alias("n"))
        .union(e.select(F.col("d").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    # round-half-up(M / n) and round-half-up((100-dampN)*M / (100n)),
    # exact in Python ints; positive operands so div == floor
    init_e = (2 * M + n_nodes) // (2 * n_nodes)
    base_e = (2 * (100 - dampN) * M + 100 * n_nodes) // (200 * n_nodes)
    deg = e.groupBy("s").agg(F.count("*").alias("deg")).withColumnRenamed("s", "n")
    out_edges = e.withColumnRenamed("s", "n")
    ranks = nodes.withColumn("rank_e12", F.lit(init_e).cast("bigint"))
    for _ in range(iterations):
        with_deg = ranks.join(deg, "n", "left")
        contrib = (
            with_deg.filter(F.col("deg").isNotNull())
            .join(out_edges, "n")
            .select(
                F.col("d").alias("n"),
                F.expr("(2 * rank_e12 + deg) div (2 * deg)").alias("c"),
            )
        )
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank_e12"), F.lit(0)).alias("dm"))
            .select(
                F.expr(
                    f"(2 * dm + {n_nodes}) div (2 * {n_nodes})"
                ).alias("dshare")
            )
        )
        summed = contrib.groupBy("n").agg(F.sum("c").alias("cs"))
        ranks = (
            nodes.join(summed, "n", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "n",
                F.expr(
                    f"{base_e} + (2 * {dampN} * (coalesce(cs, 0) + dshare)"
                    f" + 100) div 200"
                )
                .cast("bigint")
                .alias("rank_e12"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("n").alias("node"),
        (F.col("rank_e12").cast(f"decimal(28,{scale})") / F.lit(M))
        .cast(f"decimal(28,{scale})")
        .alias("rank"),
        "rank_e12",
    )


def bfs_hops(
    edges: DataFrame,
    seed_df: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, hop) breadth-first distances from the seed set over an
    UNDIRECTED reading of ``edges``, up to ``max_hops``.

    Classic frontier expansion: each round joins the current frontier
    to the (symmetrized) edge list and anti-joins everything already
    visited - one bounded shuffle per hop, never materializing paths.
    ``seed_df`` must have one column named ``node`` (hop 0).
    Unreached nodes are absent (infinite distance)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()
    visited = seed_df.select(
        F.col("node"), F.lit(0).alias("hop")
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier, sym.s == frontier.node)
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(hop).alias("hop"))
        )
        frontier = nxt
    return visited
