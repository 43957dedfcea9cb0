"""Maintained-view read cost vs epoch count, before and after
generation compaction (VERDICT r10 tasks #2/#7).

Builds BM25-index and near-dup stores with N ∈ {1, 10, 50, 100} epoch
delta directories (batch-simulated with the exact on-disk layout the
streaming maintainers write — the probe measures the READ path, which
is identical), times the standing reads best-of-2, then compacts to
one generation and times them again. Expected: pre-compaction read
cost grows with epoch count (file listing + per-dir fold fan-in);
post-compaction cost is flat regardless of how many epochs were
folded.

Usage: python tools/epoch_read_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from local_stream_stack_spark.catalog import load_table  # noqa: E402
from local_stream_stack_spark.session import get_spark  # noqa: E402
from local_stream_stack_spark.streaming.compaction import (  # noqa: E402
    compact_bm25_index,
    compact_neardup_store,
)
from local_stream_stack_spark.streaming.ops import (  # noqa: E402
    read_bm25_index_topk,
    read_neardup_store,
)


def build_bm25_store(spark, docs, store: str, n_epochs: int) -> None:
    for e in range(n_epochs):
        batch = docs.filter(F.col("doc_id") % n_epochs == e)
        tok = batch.select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("tok"),
        )
        postings = (
            tok.groupBy("doc_id", "tok")
            .agg(F.count("*").cast("bigint").alias("tf"))
            .localCheckpoint(eager=True)
        )
        postings.coalesce(1).write.parquet(
            f"{store}/postings/__epoch={e}"
        )
        doclen = (
            postings.groupBy("doc_id")
            .agg(F.sum("tf").cast("bigint").alias("len"))
            .localCheckpoint(eager=True)
        )
        doclen.coalesce(1).write.parquet(f"{store}/doclen/__epoch={e}")
        postings.groupBy("tok").agg(
            F.count("*").cast("bigint").alias("df_delta")
        ).coalesce(1).write.parquet(f"{store}/termdf/__epoch={e}")
        doclen.agg(
            F.count("*").cast("bigint").alias("n_docs_delta"),
            F.sum("len").cast("bigint").alias("len_sum_delta"),
        ).na.fill(0).coalesce(1).write.parquet(
            f"{store}/corpus/__epoch={e}"
        )


def build_neardup_store(spark, docs, store: str, n_epochs: int) -> None:
    from local_stream_stack_spark.operators.dedup import (
        minhash_band_keys,
        minhash_signatures_portable,
    )

    for e in range(n_epochs):
        batch = docs.filter(F.col("doc_id") % n_epochs == e)
        batch.coalesce(1).write.parquet(f"{store}/rows/__epoch={e}")
        sigs = minhash_signatures_portable(
            batch, id_col="doc_id", text_col="text", n_hashes=32,
            shingle_k=3, shingle="word",
        )
        minhash_band_keys(
            sigs, "doc_id", bands=8, rows_per_band=4, portable_keys=True
        ).select("doc_id", "band", "bh").coalesce(1).write.parquet(
            f"{store}/keys/__epoch={e}"
        )


def best_of_2(fn) -> float:
    times = []
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    return min(times)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).localCheckpoint(eager=True)
    base = tempfile.mkdtemp(prefix="epoch-probe-")
    print(f"# sf_dir={sf_dir} n_docs={docs.count()}")
    print("store,n_epochs,pre_compact_s,post_compact_s")
    try:
        for n in (1, 10, 50, 100):
            bstore = f"{base}/bm25-{n}"
            build_bm25_store(spark, docs, bstore, n)
            pre = best_of_2(
                lambda: read_bm25_index_topk(spark, bstore, k=20).collect()
            )
            compact_bm25_index(spark, bstore, n_buckets=16)
            post = best_of_2(
                lambda: read_bm25_index_topk(spark, bstore, k=20).collect()
            )
            print(f"bm25_topk,{n},{pre:.3f},{post:.3f}", flush=True)

            nstore = f"{base}/nd-{n}"
            build_neardup_store(spark, docs, nstore, n)
            pre = best_of_2(
                lambda: read_neardup_store(spark, nstore).count()
            )
            compact_neardup_store(spark, nstore, n_buckets=16)
            post = best_of_2(
                lambda: read_neardup_store(spark, nstore).count()
            )
            print(f"neardup_rows,{n},{pre:.3f},{post:.3f}", flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
