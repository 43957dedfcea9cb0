"""Partitioning helpers for narrow inputs.

The harness parquet files are single-row-group, so every scan starts
as ONE partition and any CPU-multiplying operator right after the
scan (Expand for grouping sets, explode, per-row UDF work) runs on a
single core. These helpers widen ONLY such narrow inputs; on a
well-partitioned 100 TB table they are a no-op, so they never add a
full-table shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow_input(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than
    the cluster has slots.

    Use before operators that multiply per-row work (Expand / explode
    / heavy expressions) when the downstream aggregate key would give
    too few partitions to hash-partition by (e.g. 3 distinct groups).
    The round-robin shuffle only ever moves the narrow input, never a
    scale-sized table — at 100 TB the scan already yields thousands
    of partitions and this returns ``df`` unchanged.
    """
    n = target or df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= n:
        return df
    return df.repartition(n)
