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


def compact_to_layout(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_file_rows: int | None = None,
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Rewrite a table into a managed layout: directory-partitioned by
    ``partition_by``, ~``target_file_rows`` rows per file, optionally
    sorted within files for data skipping.

    This is the compaction/maintenance job a 100 TB table needs
    periodically: streaming appends and fine-grained upserts leave
    thousands of small files whose open/footer overhead dominates
    scans; a layout rewrite amortizes to one shuffle. Rows route to
    writers by partition value so each output partition is written by
    few tasks (no small-file explosion from every task holding every
    partition); the within-file sort feeds parquet min/max stats so
    point/range predicates skip whole files.
    """
    out = df
    n_rows = None
    if target_file_rows:
        n_rows = df.count()
        n_files = max(1, -(-n_rows // target_file_rows))
        if partition_by:
            out = out.repartition(n_files, *partition_by)
        else:
            out = out.repartition(n_files)
    elif partition_by:
        out = out.repartition(*partition_by)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
