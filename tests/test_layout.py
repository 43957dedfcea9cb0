"""Layout operators: Z-order locality + bin-packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_stream_stack_spark.queries.layout_ops import (
    compaction_bin_packing,
    zorder_layout_events,
)

SF = "/root/testdata/sf0.01"


def test_zorder_files_are_tight_in_both_dims(spark):
    """The point of Z-order: per-file min/max spans stay small in BOTH
    dimensions, while a single-key sort leaves the other dimension's
    span at full range. Compare against the user-sorted layout built
    from the same rows."""
    out = zorder_layout_events(spark, SF).collect()
    assert len(out) > 10
    n_total = sum(r.n_rows for r in out)
    # weighted mean span per row in the time dimension under Z-order
    z_tb_span = sum((r.tb_max - r.tb_min) * r.n_rows for r in out) / n_total
    # baseline: sort by user only, cut into the same number of
    # equal-count files -> tb span per file ~ full range
    from local_stream_stack_spark.utils.ts import epoch_s

    e = spark.read.parquet(f"{SF}/events.parquet")
    tb = (F.floor(epoch_s("ts") / 60).cast("bigint") % 256).alias("tb")
    u = (F.col("user_id") % 256).alias("u")
    from pyspark.sql.window import Window

    ranked = e.select(u, tb).withColumn(
        "rn", F.row_number().over(Window.orderBy("u", "tb"))
    )
    n_files = len(out)
    base = (
        ranked.groupBy(
            ((F.col("rn") - 1) * n_files / n_total).cast("bigint").alias("f")
        )
        .agg(
            F.count("*").alias("n"),
            (F.max("tb") - F.min("tb")).alias("span"),
        )
        .collect()
    )
    base_tb_span = sum(r.span * r.n for r in base) / n_total
    assert z_tb_span < 0.5 * base_tb_span, (z_tb_span, base_tb_span)


def test_bin_packing_invariants(spark):
    """Bins respect the target up to one file's overhang (greedy
    prefix cut): every bin except a source's last holds >= target
    chars only if a single file overflows it; total chars and file
    counts are preserved."""
    out = compaction_bin_packing(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    total_chars = d.agg(F.sum("n_chars")).collect()[0][0]
    n_docs = d.count()
    assert sum(r.n_files for r in out) == n_docs
    assert sum(r.total_chars for r in out) == total_chars
    # bins are dense per source starting at 0
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.bin)
    for src, bins in by_src.items():
        assert sorted(bins) == list(range(len(bins))), (src, bins)


def test_zorder_interleave_roundtrip(spark):
    """The Morton code must be exactly invertible: deinterleaving the
    Z-value recovers both bucketed dimensions for every point of an
    exhaustive 32x32 grid (low 5 bits) plus the 8-bit corners."""
    from local_stream_stack_spark.operators.layout import zorder_value

    pts = [(u, t) for u in range(32) for t in range(32)]
    pts += [(u, t) for u in (0, 1, 127, 128, 255) for t in (0, 1, 127, 128, 255)]
    df = spark.createDataFrame(pts, "u long, t long")
    rows = df.select(
        "u", "t", zorder_value([F.col("u"), F.col("t")], bits=8).alias("z")
    ).collect()

    def deinterleave(z: int, d: int, n: int = 2, bits: int = 8) -> int:
        return sum(((z >> (b * n + d)) & 1) << b for b in range(bits))

    for r in rows:
        assert deinterleave(r.z, 0) == r.u, (r.u, r.t, r.z)
        assert deinterleave(r.z, 1) == r.t, (r.u, r.t, r.z)
    # distinct points -> distinct codes (bijectivity on the domain)
    assert len({r.z for r in rows}) == len(set(pts))
