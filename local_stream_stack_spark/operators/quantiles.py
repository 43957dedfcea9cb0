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
   key, pick the two rank rows, interpolate.

Every shuffle moves either codegen aggregate state or ~count/bins
surviving rows per key — never the full column. Uniform-ish data
leaves n/bins rows per key for pass 2; pathological single-value bins
degrade to the in-bin subset only (and a single-valued key short-
circuits via min == max). Cost: 3 column-pruned scans, which at scale
beats one scan that ships 100 TB into a handful of reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantile(
    df: DataFrame,
    value_col: str,
    q: float,
    keys: Sequence[str],
    bins: int = 4096,
    out_col: str | None = None,
) -> DataFrame:
    """Exact (interpolating, quantile_cont-style) q-quantile per key.

    Returns one row per key group: ``keys..., out_col``.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    out_col = out_col or f"q{q}"
    keys = list(keys)
    v = F.col(value_col).cast("double")
    vals = df.select(*keys, v.alias("__v")).filter(F.col("__v").isNotNull())

    # pass 0: group extents
    ext = vals.groupBy(*keys).agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.count("*").alias("__n"),
    )
    # target positions h = (n-1)*q -> ranks r_lo = floor(h), r_hi = ceil(h)
    ext = (
        ext.withColumn("__h", (F.col("__n") - 1) * F.lit(float(q)))
        .withColumn("__r_lo", F.floor("__h").cast("bigint"))
        .withColumn("__r_hi", F.ceil("__h").cast("bigint"))
        .withColumn(
            "__w", (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
        )
    )

    bin_of = F.when(F.col("__w") > 0, F.least(
        F.floor((F.col("__v") - F.col("__lo")) / F.col("__w")).cast("bigint"),
        F.lit(bins - 1),
    )).otherwise(F.lit(0))

    # pass 1: per-(key, bin) counts; running count locates rank bins.
    # ext is aggregate output (one row per key) -> broadcast join.
    with_ext = vals.join(F.broadcast(ext), keys)
    bin_counts = (
        with_ext.withColumn("__bin", bin_of)
        .groupBy(*keys, "__bin")
        .agg(F.count("*").alias("__bc"))
    )
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bin_counts.withColumn("__cum", F.sum("__bc").over(wcum)).withColumn(
        "__below", F.col("__cum") - F.col("__bc")
    )
    # bins containing rank r: __below <= r < __cum  (ranks 0-indexed)
    target_bins = (
        cum.join(F.broadcast(ext.select(*keys, "__r_lo", "__r_hi")), keys)
        .filter(
            ((F.col("__below") <= F.col("__r_lo")) & (F.col("__r_lo") < F.col("__cum")))
            | ((F.col("__below") <= F.col("__r_hi")) & (F.col("__r_hi") < F.col("__cum")))
        )
        .select(*keys, "__bin", "__below")
    )

    # pass 2: rank only the rows inside target bins (tiny by design)
    survivors = (
        with_ext.withColumn("__bin", bin_of)
        .join(F.broadcast(target_bins), keys + ["__bin"])
    )
    wrank = Window.partitionBy(*keys, "__bin").orderBy("__v")
    ranked = survivors.withColumn(
        "__r", F.col("__below") + F.row_number().over(wrank) - 1
    )
    # with_ext already carries __r_lo/__r_hi/__h from the extent join
    picked = (
        ranked.filter((F.col("__r") == F.col("__r_lo")) | (F.col("__r") == F.col("__r_hi")))
        .groupBy(*keys)
        .agg(
            F.min(F.when(F.col("__r") == F.col("__r_lo"), F.col("__v"))).alias("__v_lo"),
            F.min(F.when(F.col("__r") == F.col("__r_hi"), F.col("__v"))).alias("__v_hi"),
            F.first("__h").alias("__h2"),
        )
        .withColumn("__frac", F.col("__h2") - F.floor("__h2"))
        .withColumn(
            out_col,
            F.col("__v_lo") + F.col("__frac") * (F.col("__v_hi") - F.col("__v_lo")),
        )
    )
    # single-valued / single-row keys: quantile is the value itself
    # (covered by the general path too since r_lo == r_hi == 0, but
    # the w == 0 branch keeps all rows in bin 0 regardless of value)
    return picked.select(*keys, out_col)
