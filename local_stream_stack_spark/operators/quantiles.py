"""Distributed EXACT quantiles that scale.

Spark's exact ``percentile`` aggregate buffers every value of a group
in one reducer (ObjectHashAggregate) — with few groups that is a
parallelism collapse and an OOM at 100 TB. ``approx_percentile``
fixes the scale problem but changes the answer. This operator keeps
the exact answer with bounded memory:

1. pass 0 — per-key (min, max, count): plain codegen aggregate.
2. pass 1 — per-(key, bin) counts over a fixed number of equi-width
   bins; a running sum over the tiny (keys x bins) table locates the
   bin holding each target rank (lo = floor(h), hi = ceil(h) for
   h = (n-1) * q, the same positions quantile_cont interpolates).
3. pass 2 — re-scan filtered to rows in target bins (a broadcast
   semi-join against the per-key bin bounds), rank the survivors per
   key, pick the rank rows, interpolate.

ALL requested (column, quantile) pairs share the three passes: the
value columns are unpivoted executor-side into (column-index, value)
rows, so extents and bin counts for every column ride one scan, the
rank set is the per-column union over its quantiles, and the final
aggregate selects every (v_lo, v_hi) pair in one go.

Every shuffle moves either codegen aggregate state or ~count/bins
surviving rows per key — never the full column. Uniform-ish data
leaves n/bins rows per key for pass 2; pathological single-value bins
degrade to the in-bin subset only (and a single-valued key short-
circuits via min == max). Cost: 3 column-pruned scans — for any number
of columns and quantiles — which at scale beats one scan that ships
100 TB into a handful of reducers.

On ``localCheckpoint`` pins (used here for the tiny state tables and
by callers for expensive inputs): a pin stores partitions in executor
block storage and truncates lineage, so on a multi-executor cluster
an executor loss after the pin fails the job instead of recomputing —
the price of never re-executing the pinned subtree. Everything pinned
in this module is state-table-sized (keys x bins rows at most), so
the storage footprint is negligible; see queries/llm.py for the
measured pin-vs-repartition trade at the large pin sites.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles_multi(
    df: DataFrame,
    value_qs: Mapping[str, Sequence[float]],
    keys: Sequence[str],
    bins: int = 4096,
    out_cols: Mapping[str, Sequence[str]] | None = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """Exact (interpolating, quantile_cont-style) quantiles per key for
    SEVERAL value columns at once, all sharing one three-pass pipeline.

    ``value_qs`` maps each value column to its requested quantiles;
    ``out_cols`` maps each column to its output names (defaults to
    ``{col}_q{q}``). Returns one row per key group with every output
    column.

    ``broadcast_state`` hints the per-key extent/bin tables (one row
    per key group per value column) into broadcast joins — right for
    few-to-millions of groups. With genuinely high-cardinality keys
    (broadcast memory ∝ group count) pass False: the joins fall back
    to shuffle joins and AQE picks the strategy from runtime sizes.
    """
    cols = list(value_qs)
    if not cols:
        raise ValueError("at least one value column required")
    qs_per: dict[str, list[float]] = {}
    for c in cols:
        qs = [float(q) for q in value_qs[c]]
        if not qs:
            raise ValueError(f"at least one quantile required for {c!r}")
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantiles must be in [0, 1], got {q}")
        qs_per[c] = qs
    if out_cols is None:
        out_named = {c: [f"{c}_q{q}" for q in qs_per[c]] for c in cols}
    else:
        out_named = {c: list(out_cols[c]) for c in cols}
        for c in cols:
            if len(out_named[c]) != len(qs_per[c]):
                raise ValueError(f"out_cols must match qs in length for {c!r}")
    keys = list(keys)

    # slots: every column participates in L rank slots; shorter lists
    # repeat their last quantile (recomputes one rank — no extra pass)
    n_slots = max(len(v) for v in qs_per.values())
    padded = {c: v + [v[-1]] * (n_slots - len(v)) for c, v in qs_per.items()}

    # unpivot the value columns executor-side: (keys..., __ci, __v)
    vals = df.select(
        *keys,
        F.posexplode(
            F.array(*[F.col(c).cast("double") for c in cols])
        ).alias("__ci", "__v"),
    ).filter(F.col("__v").isNotNull())
    k2 = keys + ["__ci"]

    def q_lit(i: int):
        # slot i's quantile for this row's column index
        return F.element_at(
            F.array(*[F.lit(padded[c][i]) for c in cols]), F.col("__ci") + 1
        )

    # pass 0: group extents + target positions h_i = (n-1)*q_i.
    # All slot columns land in ONE select — a withColumn per slot
    # re-runs the analyzer over a growing projection each time, which
    # dominates plan-build latency once slots x 3 columns pile up.
    ext = vals.groupBy(*k2).agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.count("*").alias("__n"),
    )
    slot_cols = []
    for i in range(n_slots):
        h = (F.col("__n") - 1) * q_lit(i)
        slot_cols += [
            h.alias(f"__h{i}"),
            F.floor(h).cast("bigint").alias(f"__rlo{i}"),
            F.ceil(h).cast("bigint").alias(f"__rhi{i}"),
        ]
    ext = ext.select(
        "*",
        *slot_cols,
        ((F.col("__hi") - F.col("__lo")) / F.lit(float(bins))).alias("__w"),
    )

    bin_of = F.when(
        F.col("__w") > 0,
        F.least(
            F.floor((F.col("__v") - F.col("__lo")) / F.col("__w")).cast("bigint"),
            F.lit(bins - 1),
        ),
    ).otherwise(F.lit(0))

    def maybe_bc(sdf: DataFrame) -> DataFrame:
        return F.broadcast(sdf) if broadcast_state else sdf

    # pass 1: per-(key, col, bin) counts; running count locates rank
    # bins. ext is aggregate output (one row per key x col).
    with_ext = vals.join(maybe_bc(ext), k2)
    bin_counts = (
        with_ext.withColumn("__bin", bin_of)
        .groupBy(*k2, "__bin")
        .agg(F.count("*").alias("__bc"))
    )
    wcum = (
        Window.partitionBy(*k2)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bin_counts.withColumn("__cum", F.sum("__bc").over(wcum)).withColumn(
        "__below", F.col("__cum") - F.col("__bc")
    )
    # bins containing any target rank r: __below <= r < __cum (0-indexed)
    rank_cols = [c for i in range(n_slots) for c in (f"__rlo{i}", f"__rhi{i}")]
    hit = None
    for rc in rank_cols:
        cond = (F.col("__below") <= F.col(rc)) & (F.col(rc) < F.col("__cum"))
        hit = cond if hit is None else (hit | cond)
    target_bins = (
        cum.join(maybe_bc(ext.select(*k2, *rank_cols)), k2)
        .filter(hit)
        .select(*k2, "__bin", "__below")
    )

    # pass 2: rank only the rows inside target bins (tiny by design);
    # with_ext already carries the __h/__rlo/__rhi columns
    survivors = with_ext.withColumn("__bin", bin_of).join(
        maybe_bc(target_bins), k2 + ["__bin"]
    )
    wrank = Window.partitionBy(*k2, "__bin").orderBy("__v")
    ranked = survivors.withColumn(
        "__r", F.col("__below") + F.row_number().over(wrank) - 1
    )
    keep = None
    for rc in rank_cols:
        cond = F.col("__r") == F.col(rc)
        keep = cond if keep is None else (keep | cond)
    aggs = []
    for i in range(n_slots):
        aggs.append(
            F.min(F.when(F.col("__r") == F.col(f"__rlo{i}"), F.col("__v"))).alias(
                f"__vlo{i}"
            )
        )
        aggs.append(
            F.min(F.when(F.col("__r") == F.col(f"__rhi{i}"), F.col("__v"))).alias(
                f"__vhi{i}"
            )
        )
        aggs.append(F.first(f"__h{i}").alias(f"__hh{i}"))
    picked = ranked.filter(keep).groupBy(*k2).agg(*aggs)
    out_exprs = []
    for i in range(n_slots):
        frac = F.col(f"__hh{i}") - F.floor(f"__hh{i}")
        out_exprs.append(
            (
                F.col(f"__vlo{i}")
                + frac * (F.col(f"__vhi{i}") - F.col(f"__vlo{i}"))
            ).alias(f"__o{i}")
        )
    picked = picked.select("*", *out_exprs)
    # fold the (key, col) rows back to one row per key (tiny table)
    finals = [
        F.max(F.when(F.col("__ci") == ci, F.col(f"__o{i}"))).alias(
            out_named[c][i]
        )
        for ci, c in enumerate(cols)
        for i in range(len(qs_per[c]))
    ]
    return picked.groupBy(*keys).agg(*finals)


def with_global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
    keys: Sequence[str] = (),
    out_rank: str = "rn",
    cumsum: Mapping[str, str] | None = None,
    acc_type: str = "DECIMAL(38,2)",
    descending: bool = False,
    bins: int = 1024,
    total_col: str | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Global (or per-``keys``) ROW_NUMBER — and optionally running
    SUMs — without the single-reducer sort of an unpartitioned window.

    ``Window.orderBy(...)`` with no partition ships every row to ONE
    task; even over a "bounded" per-entity aggregate that is the
    scale ceiling (10^9 customers = one sorting reducer). This
    operator keeps the exact rank with bounded parallelism, reusing
    the bin-refinement idea of :func:`exact_quantiles_multi`:

    1. pass 0 — (min, max, count) of the numeric order proxy
       (``order_col`` cast to double, negated when ``descending``):
       one codegen aggregate, broadcast back.
    2. pass 1 — per-bin counts (+ per-bin exact sums for each ``cumsum``
       column) over ``bins`` equi-width bins; the EXCLUSIVE running
       totals over the tiny per-key bin table are computed inside ONE
       collected array row per key (sort_array + aggregate — never an
       unpartitioned window), then broadcast back.
    3. pass 2 — within-bin ``row_number``/running sums over a window
       PARTITIONED BY (keys, bin); the global value is
       ``below_bin_total + within_bin_value``.

    The rank order is (``order_col`` asc/desc, ``tiebreak_cols`` asc)
    and must be a TOTAL order (pass a unique tiebreak); order values
    must be non-null. ``cumsum`` maps source columns to output names;
    sums accumulate in ``acc_type`` (exact decimals — pick a type that
    cannot overflow). ``total_col`` additionally exposes the per-key
    row count (the n of NTILE). Degenerate all-equal proxies collapse
    to one bin — the same documented bound as exact_quantiles.
    """
    keys = list(keys)
    ties = list(tiebreak_cols)
    sums = dict(cumsum or {})
    in_cols = df.columns

    # binning proxy: ANY monotonic numeric mapping works (the exact
    # order inside each bin uses the original column), so temporal
    # types map through epoch numbers rather than failing the cast
    dtype = dict(df.dtypes).get(order_col, "")
    if dtype == "date":
        p = F.unix_date(F.col(order_col)).cast("double")
    elif dtype.startswith("timestamp"):
        p = F.unix_micros(F.col(order_col).cast("timestamp")).cast(
            "double"
        )
    else:
        p = F.col(order_col).cast("double")
    if descending:
        p = -p
    work = df.withColumn("__wgr_p", p)
    # The three passes below (extent agg, per-bin counts, final
    # bin-partitioned window) each re-execute ``work``'s lineage.
    # ``materialize=True`` localCheckpoints it once so DERIVED inputs
    # (pair joins, aggregates) compute a single time; leave False for
    # raw scan projections, where a column-pruned parquet re-scan is
    # cheaper than writing the rows out (measured in round 5 for
    # percentile_stats). Guide §3.3/§5 (materialize intermediates).
    if materialize:
        work = work.localCheckpoint(eager=True)

    ext_aggs = [
        F.min("__wgr_p").alias("__wgr_lo"),
        F.max("__wgr_p").alias("__wgr_hi"),
        F.count("*").alias("__wgr_n"),
    ]
    ext = work.groupBy(*keys).agg(*ext_aggs) if keys else work.agg(*ext_aggs)
    ext = ext.withColumn(
        "__wgr_w", (F.col("__wgr_hi") - F.col("__wgr_lo")) / F.lit(float(bins))
    )
    binned = (
        work.join(F.broadcast(ext), keys)
        if keys
        else work.crossJoin(F.broadcast(ext))
    ).withColumn(
        "__wgr_bin",
        F.when(
            F.col("__wgr_w") > 0,
            F.least(
                F.floor(
                    (F.col("__wgr_p") - F.col("__wgr_lo")) / F.col("__wgr_w")
                ).cast("bigint"),
                F.lit(bins - 1),
            ),
        ).otherwise(F.lit(0)),
    )

    per_bin_aggs = [F.count("*").alias("__wgr_bc")]
    for i, src in enumerate(sums):
        per_bin_aggs.append(
            F.sum(F.expr(f"CAST({src} AS {acc_type})")).alias(f"__bs{i}")
        )
    per_bin = binned.groupBy(*keys, "__wgr_bin").agg(*per_bin_aggs)

    # exclusive running totals over the <=bins rows per key, inside one
    # array (sort_array orders by the leading struct field = __wgr_bin)
    fields = ["__wgr_bin", "__wgr_bc"] + [f"__bs{i}" for i in range(len(sums))]
    coll = F.sort_array(F.collect_list(F.struct(*fields))).alias("__wgr_arr")
    arr = per_bin.groupBy(*keys).agg(coll) if keys else per_bin.agg(coll)
    lacc = acc_type.lower()
    out_t = (
        "struct<bin:bigint,below:bigint"
        + "".join(f",bs{i}:{lacc}" for i in range(len(sums)))
        + ">"
    )
    zero = (
        "named_struct('rc', CAST(0 AS BIGINT)"
        + "".join(
            f", 'rs{i}', CAST(0 AS {acc_type})" for i in range(len(sums))
        )
        + f", 'out', CAST(array() AS array<{out_t}>))"
    )
    step = (
        "named_struct('rc', a.rc + x.__wgr_bc"
        + "".join(
            f", 'rs{i}', CAST(a.rs{i} + x.__bs{i} AS {acc_type})"
            for i in range(len(sums))
        )
        + ", 'out', array_append(a.out, named_struct("
        "'bin', x.__wgr_bin, 'below', a.rc"
        + "".join(f", 'bs{i}', a.rs{i}" for i in range(len(sums)))
        + ")))"
    )
    below = arr.select(
        *keys,
        F.explode(
            F.expr(f"aggregate(__wgr_arr, {zero}, (a, x) -> {step}, a -> a.out)")
        ).alias("__wgr_b"),
    ).select(
        *keys,
        F.col("__wgr_b.bin").alias("__wgr_bin"),
        F.col("__wgr_b.below").alias("__wgr_below"),
        *[F.col(f"__wgr_b.bs{i}").alias(f"__below_s{i}") for i in range(len(sums))],
    )

    joined = binned.join(F.broadcast(below), keys + ["__wgr_bin"])
    order_exprs = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ] + [F.col(t).asc() for t in ties]
    w = Window.partitionBy(*keys, "__wgr_bin").orderBy(*order_exprs)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = joined.withColumn(
        out_rank, (F.col("__wgr_below") + F.row_number().over(w)).cast("bigint")
    )
    for i, (src, name) in enumerate(sums.items()):
        out = out.withColumn(
            name,
            F.col(f"__below_s{i}")
            + F.sum(F.expr(f"CAST({src} AS {acc_type})")).over(wsum),
        )
    keep = in_cols + [out_rank] + list(sums.values())
    if total_col:
        out = out.withColumn(total_col, F.col("__wgr_n"))
        keep.append(total_col)
    return out.select(*keep)


def ntile_expr(rank_col: str, n_col: str, k: int):
    """NTILE(k) bucket from a 1-based global rank and the group size —
    the closed form of the SQL-standard tiling (first n % k buckets
    get one extra row). Pure BIGINT arithmetic, lazily guarded so the
    q == 0 (n < k) division never evaluates; pairs with
    :func:`with_global_rank` to replace an unpartitioned NTILE window
    with distributed math."""
    q = f"({n_col} div {k})"
    rem = f"({n_col} % {k})"
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {rem} * ({q} + 1)"
        f" THEN ({rank_col} + {q}) div ({q} + 1)"
        f" ELSE {rem} + ({rank_col} - {rem} * ({q} + 1) + {q} - 1) div {q}"
        f" END AS INT)"
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    keys: Sequence[str],
    bins: int = 4096,
    out_cols: Sequence[str] | None = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """Exact quantiles per key for ONE value column (see
    ``exact_quantiles_multi`` for the shared multi-column form)."""
    qs = list(qs)
    return exact_quantiles_multi(
        df,
        {value_col: qs},
        keys,
        bins=bins,
        out_cols={value_col: list(out_cols) if out_cols else [f"q{q}" for q in qs]},
        broadcast_state=broadcast_state,
    )


def exact_quantile(
    df: DataFrame,
    value_col: str,
    q: float,
    keys: Sequence[str],
    bins: int = 4096,
    out_col: str | None = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """Single-quantile convenience wrapper over ``exact_quantiles``."""
    return exact_quantiles(
        df,
        value_col,
        [q],
        keys,
        bins=bins,
        out_cols=[out_col or f"q{q}"],
        broadcast_state=broadcast_state,
    )


def exact_quantiles_by_value(
    df: DataFrame,
    value_qs: Mapping[str, Sequence[float]],
    keys: Sequence[str],
    out_cols: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Exact quantile_cont-style quantiles via a VALUE HISTOGRAM —
    the one-scan alternative to ``exact_quantiles_multi`` for columns
    with BOUNDED DISTINCT VALUES (integer quantities, fixed-point
    money, enums).

    One scan: unpivot the value columns, count rows per
    (key, column, value) — partial-aggregated scan-side, so the
    shuffle carries at most |keys| x |distinct values| count rows no
    matter how many input rows (that bound is what makes this the
    preferred form at 100 TB when it applies). A running-count window
    over the tiny histogram locates the bracketing ranks
    h = (n-1) * q exactly as quantile_cont interpolates.

    For genuinely continuous doubles (distinct ~ n) use
    ``exact_quantiles_multi``'s 3-pass bin refinement instead — a
    histogram with n buckets would just be the hot-key buffer again.
    """
    cols = list(value_qs)
    if not cols:
        raise ValueError("at least one value column required")
    qs_per = {c: [float(q) for q in value_qs[c]] for c in cols}
    for c, qs in qs_per.items():
        if not qs:
            raise ValueError(f"at least one quantile required for {c!r}")
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantiles must be in [0, 1], got {q}")
    if out_cols is None:
        out_named = {c: [f"{c}_q{q}" for q in qs_per[c]] for c in cols}
    else:
        out_named = {c: list(out_cols[c]) for c in cols}
        for c in cols:
            if len(out_named[c]) != len(qs_per[c]):
                raise ValueError(f"out_cols must match qs in length for {c!r}")
    keys = list(keys)
    k2 = keys + ["__ci"]

    vals = df.select(
        *keys,
        F.posexplode(
            F.array(*[F.col(c).cast("double") for c in cols])
        ).alias("__ci", "__v"),
    ).filter(F.col("__v").isNotNull())
    hist = vals.groupBy(*k2, "__v").agg(F.count("*").alias("__c"))
    wcum = (
        Window.partitionBy(*k2)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*k2)
    hist = (
        hist.withColumn("__cum", F.sum("__c").over(wcum))
        .withColumn("__below", F.col("__cum") - F.col("__c"))
        .withColumn("__n", F.sum("__c").over(wall))
    )
    # value __v covers 0-indexed ranks [__below, __cum); pick the
    # values bracketing h = (n-1)*q for every requested slot
    n_slots = max(len(v) for v in qs_per.values())
    padded = {c: v + [v[-1]] * (n_slots - len(v)) for c, v in qs_per.items()}

    def q_lit(i: int):
        return F.element_at(
            F.array(*[F.lit(padded[c][i]) for c in cols]), F.col("__ci") + 1
        )

    aggs = []
    for i in range(n_slots):
        h = (F.col("__n") - 1) * q_lit(i)
        rlo = F.floor(h).cast("bigint")
        rhi = F.ceil(h).cast("bigint")
        covers_lo = (F.col("__below") <= rlo) & (rlo < F.col("__cum"))
        covers_hi = (F.col("__below") <= rhi) & (rhi < F.col("__cum"))
        aggs.append(F.min(F.when(covers_lo, F.col("__v"))).alias(f"__vlo{i}"))
        aggs.append(F.min(F.when(covers_hi, F.col("__v"))).alias(f"__vhi{i}"))
        aggs.append(F.first(h).alias(f"__hh{i}"))
    picked = hist.groupBy(*k2).agg(*aggs)
    out_exprs = []
    for i in range(n_slots):
        frac = F.col(f"__hh{i}") - F.floor(f"__hh{i}")
        out_exprs.append(
            (
                F.col(f"__vlo{i}")
                + frac * (F.col(f"__vhi{i}") - F.col(f"__vlo{i}"))
            ).alias(f"__o{i}")
        )
    picked = picked.select("*", *out_exprs)
    finals = [
        F.max(F.when(F.col("__ci") == ci, F.col(f"__o{i}"))).alias(
            out_named[c][i]
        )
        for ci, c in enumerate(cols)
        for i in range(len(qs_per[c]))
    ]
    return picked.groupBy(*keys).agg(*finals)


def values_at_global_ranks(
    df: DataFrame,
    order_col: str,
    ranks_df: DataFrame,
    rank_cols: Sequence[str],
    out_cols: Sequence[str],
    bins: int = 4096,
    keys: Sequence[str] = (),
    weight_col: str | None = None,
    ext_df: DataFrame | None = None,
    pin_result: bool = True,
) -> DataFrame:
    """Exact ORDER STATISTICS without ranking every row: the value of
    ``order_col`` at each requested 1-indexed rank (global, or per
    ``keys`` group), where the ranks themselves are data-dependent
    (columns of ``ranks_df`` — ONE row globally, or one row per key
    group carrying the key columns — e.g. median positions derived
    from a count).

    ``with_global_rank`` assigns a rank to EVERY row, which costs a
    full shuffle of the input into bin partitions plus a per-bin sort
    — wasted work when only a few order statistics are consumed (a
    median, nine deciles). This operator refines instead (the
    ``exact_quantiles_multi`` idea applied to rank selection):

    1. pass 0 — per-key (min, max) of the double proxy: codegen
       aggregate, broadcast back.
    2. pass 1 — per-(key, bin) counts over ``bins`` equi-width bins:
       partial aggregation means the shuffle carries at most ``bins``
       rows per key per map task; the exclusive running counts over
       the <=bins rows per key are folded inside ONE collected array
       row (sort_array + aggregate — never an unpartitioned window),
       and the bins containing any requested rank are selected by a
       broadcast join against ``ranks_df``.
    3. pass 2 — only rows INSIDE target bins survive the filter (a
       broadcast join on (key, bin), so non-target rows never
       shuffle); they collapse to a per-value histogram, and the
       value at rank ``r`` is picked by an array fold over the in-bin
       histogram at offset ``r - below``.

    With ``weight_col`` (integer, non-negative), "rank" generalizes
    to a cumulative-WEIGHT threshold: the result for threshold ``t``
    is the smallest value whose inclusive running weight (in value
    order) reaches ``t`` — the lower weighted-median convention when
    ``t = (total + 1) div 2``. Plain ranks are the weight==1 case.

    With ``ext_df``, pass 0 is skipped entirely: the caller supplies
    the bin range as a relation with columns ``keys + [__vgr_lo,
    __vgr_hi]`` (both DOUBLE; one row globally, or one per key group).
    This is the lever when ``df`` is an expensive derived stream whose
    extremes have a CLOSED FORM over a cheap base relation — e.g. the
    min/max pairwise slope over day-ordered points is attained by an
    ADJACENT pair (any chord slope is a day-gap-weighted average of
    the adjacent slopes under it, so it lies between their extremes),
    and the min/max pairwise difference x - y is max(x)-min(y) /
    min(x)-max(y) — so one pass over the tiny base table replaces a
    full execution of the pair stream. Correctness does NOT depend on
    the bounds being the exact extremes: bin indices are computed by
    the same expression on both remaining passes (indices below 0 or
    above ``bins-1`` stay consistent), so any finite bounds with
    ``hi >= lo`` yield exact results — tight bounds only keep the
    bins balanced. NULL bounds (empty input) reproduce the empty-
    input behavior of the computed pass 0.

    Every pass re-executes ``df``'s lineage (pin upstream relations
    that are expensive to regenerate); no pass shuffles more than the
    target-bin subset, no window is unpartitioned, nothing is
    collected to the driver. Returns, per ``ranks_df`` row, every
    ``ranks_df`` column plus, for each (rank, out) pair, the value at
    that rank — NULL when the rank is outside [1, n] (out-of-range /
    empty-input ranks yield NULL, never an error; with ``keys``, key
    groups absent from ``df`` yield no row). Degenerate all-equal
    inputs collapse to one bin whose per-value histogram is a single
    row — the same documented bound as ``exact_quantiles``. Order
    values must be non-null and non-NaN; rank columns must be
    BIGINT-compatible.
    """
    rank_cols = list(rank_cols)
    out_cols = list(out_cols)
    keys = list(keys)
    if len(rank_cols) != len(out_cols):
        raise ValueError("rank_cols and out_cols must match in length")
    if not rank_cols:
        raise ValueError("at least one rank required")
    vtype = dict(df.dtypes).get(order_col)
    if vtype is None:
        raise ValueError(f"unknown order column {order_col!r}")
    wexpr = (
        F.expr(f"CAST({weight_col} AS BIGINT)")
        if weight_col
        else F.lit(1).cast("bigint")
    )

    work = df.withColumn("__vgr_p", F.col(order_col).cast("double"))
    ext_aggs = [
        F.min("__vgr_p").alias("__vgr_lo"),
        F.max("__vgr_p").alias("__vgr_hi"),
    ]
    # The tiny state tables (ext: one row per key; tgt: one row per
    # target bin per key) are PINNED eagerly on the COMPUTED-ext path:
    # ext is referenced inside every ``binned`` consumer and tgt's
    # subtree embeds the whole pass-1 plan, so without the pins pass 2
    # re-executes pass 1 (and every pass re-executes pass 0) — the
    # lazy nesting multiplied the input lineage ~4x (measured r13:
    # mann_kendall 13.7 s with lazy state vs 2.5 s pinned). The pinned
    # rows are bounded by keys x bins, never by input size (guide §5).
    #
    # With a caller-supplied ``ext_df`` (CHEAP lineage by contract),
    # that multiplier is gone — re-deriving ext inside each consumer
    # costs a tiny fold, not a pass over ``df`` — so the ext and tgt
    # pins are SKIPPED: every pin is a sequential driver job at the
    # local scheduling floor, and dropping them folds pass 1 into the
    # final action as a broadcast subtree (measured r14: the pin chain,
    # not the pair passes, dominated the pair-median family).
    pin_state = ext_df is None
    ext_base = (
        ext_df.select(*keys, "__vgr_lo", "__vgr_hi")
        if ext_df is not None
        else (
            work.groupBy(*keys).agg(*ext_aggs)
            if keys
            else work.agg(*ext_aggs)
        )
    )
    ext = ext_base.withColumn(
        "__vgr_w",
        (F.col("__vgr_hi") - F.col("__vgr_lo")) / F.lit(float(bins)),
    )
    if pin_state:
        ext = ext.localCheckpoint(eager=True)
    joined = (
        work.join(F.broadcast(ext), keys)
        if keys
        else work.crossJoin(F.broadcast(ext))
    )
    binned = joined.withColumn(
        "__vgr_bin",
        F.when(
            F.col("__vgr_w") > 0,
            F.least(
                F.floor(
                    (F.col("__vgr_p") - F.col("__vgr_lo")) / F.col("__vgr_w")
                ).cast("bigint"),
                F.lit(bins - 1),
            ),
        ).otherwise(F.lit(0)),
    )
    per_bin = binned.groupBy(*keys, "__vgr_bin").agg(
        F.sum(wexpr).alias("__vgr_bc")
    )
    coll = F.sort_array(
        F.collect_list(F.struct("__vgr_bin", "__vgr_bc"))
    ).alias("__vgr_arr")
    arr = per_bin.groupBy(*keys).agg(coll) if keys else per_bin.agg(coll)
    out_t = "struct<bin:bigint,below:bigint,bc:bigint>"
    zero = (
        "named_struct('rc', CAST(0 AS BIGINT),"
        f" 'out', CAST(array() AS array<{out_t}>))"
    )
    step = (
        "named_struct('rc', a.rc + x.__vgr_bc,"
        " 'out', array_append(a.out, named_struct("
        "'bin', x.__vgr_bin, 'below', a.rc, 'bc', x.__vgr_bc)))"
    )
    below = arr.select(
        *keys,
        F.explode(
            F.expr(
                f"aggregate(__vgr_arr, {zero}, (a, x) -> {step}, a -> a.out)"
            )
        ).alias("__vgr_b"),
    ).select(
        *keys,
        F.col("__vgr_b.bin").alias("__tb_bin"),
        F.col("__vgr_b.below").alias("__tb_below"),
        F.col("__vgr_b.bc").alias("__tb_bc"),
    )
    hit = None
    for rc in rank_cols:
        cond = (F.col("__tb_below") < F.col(rc)) & (
            F.col(rc) <= F.col("__tb_below") + F.col("__tb_bc")
        )
        hit = cond if hit is None else (hit | cond)
    tgt = (
        (
            below.join(F.broadcast(ranks_df), keys)
            if keys
            else below.crossJoin(F.broadcast(ranks_df))
        )
        .filter(hit)
        .select(*keys, "__tb_bin", "__tb_below", "__tb_bc")
    )
    if pin_state:
        tgt = tgt.localCheckpoint(eager=True)
    surv = binned.join(
        F.broadcast(tgt.withColumnRenamed("__tb_bin", "__vgr_bin")),
        keys + ["__vgr_bin"],
    ).groupBy(
        *keys,
        "__vgr_bin",
        "__tb_below",
        "__tb_bc",
        F.col(order_col).alias("__vgr_v"),
    ).agg(F.sum(wexpr).alias("__vgr_cnt"))
    per_tbin = surv.groupBy(
        *keys, "__vgr_bin", "__tb_below", "__tb_bc"
    ).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__vgr_v").alias("v"),
                    F.col("__vgr_cnt").alias("cnt"),
                )
            )
        ).alias("__vgr_a")
    )
    coll_bins = F.collect_list(
        F.struct(
            F.col("__tb_below").alias("below"),
            F.col("__tb_bc").alias("bc"),
            F.col("__vgr_a").alias("a"),
        )
    ).alias("__vgr_bins")
    one = (
        per_tbin.groupBy(*keys).agg(coll_bins)
        if keys
        else per_tbin.agg(coll_bins)
    )
    res = (
        one.join(F.broadcast(ranks_df), keys)
        if keys
        else one.crossJoin(F.broadcast(ranks_df))
    )
    for rc, oc in zip(rank_cols, out_cols):
        tcol = f"__vgr_t_{oc}"
        res = res.withColumn(
            tcol,
            F.expr(
                "try_element_at(filter(__vgr_bins,"
                f" e -> e.below < {rc} AND {rc} <= e.below + e.bc), 1)"
            ),
        )
        res = res.withColumn(
            oc,
            F.expr(
                f"aggregate({tcol}.a,"
                " named_struct('cum', CAST(0 AS BIGINT),"
                f" 'v', CAST(NULL AS {vtype})),"
                " (a, x) -> named_struct('cum', a.cum + x.cnt,"
                " 'v', CASE WHEN a.v IS NULL"
                f" AND a.cum + x.cnt >= {rc} - {tcol}.below"
                " THEN x.v ELSE a.v END),"
                " a -> a.v)"
            ),
        )
    # the result is one row per ranks_df row — pinned by default so
    # callers that feed it to several consumers (a median broadcast
    # into a scoring pass AND a final summary) never re-execute the
    # passes; single-consumer callers pass ``pin_result=False`` to
    # fold everything into their final action (one driver job fewer)
    out = res.select(*ranks_df.columns, *out_cols)
    return out.localCheckpoint(eager=True) if pin_result else out
