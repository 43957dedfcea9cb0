"""Layout management: narrow-input spreading and compaction rewrite."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from local_stream_stack_spark.operators.partitioning import (
    compact_to_layout,
    spread_narrow_input,
)


def test_spread_narrow_input_widens_single_partition(spark):
    df = spark.range(1000).coalesce(1)
    assert spread_narrow_input(df).rdd.getNumPartitions() > 1
    wide = spark.range(1000).repartition(64)
    assert spread_narrow_input(wide).rdd.getNumPartitions() == 64


def test_compact_to_layout_bounds_files_and_partitions(spark, tmp_path):
    """Many small appends compact into a partitioned layout with a
    bounded file count per partition and losslessly identical rows."""
    src = f"{tmp_path}/src"
    for i in range(8):  # 8 small appends -> many small files
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"),
            (F.col("id") % 4).alias("part"),
            (F.col("id") * 2.0).alias("v"),
        ).coalesce(1).write.mode("append").parquet(src)
    df = spark.read.parquet(src)
    n_src_files = len(glob.glob(f"{src}/*.parquet"))
    assert n_src_files >= 8

    out = f"{tmp_path}/out"
    compact_to_layout(
        df,
        out,
        partition_by=["part"],
        target_file_rows=500,
        sort_within=["id"],
    )
    part_dirs = sorted(os.path.basename(p) for p in glob.glob(f"{out}/part=*"))
    assert part_dirs == ["part=0", "part=1", "part=2", "part=3"]
    n_out_files = len(glob.glob(f"{out}/part=*/*.parquet"))
    assert n_out_files <= 8  # 800 rows / 500 per file -> ~2 tasks x 4 dirs
    back = spark.read.parquet(out)
    assert back.count() == 800
    assert back.groupBy().sum("v").collect()[0][0] == df.groupBy().sum("v").collect()[0][0]
    # within-file sort -> parquet min/max stats make id predicates selective
    got = {r.id for r in back.filter(F.col("id") < 10).collect()}
    assert got == set(range(10))
