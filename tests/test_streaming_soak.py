"""Pipeline-level streaming soak with crash injection (VERDICT r5 #7).

Unit tests elsewhere pin store replay per operator; this runs the FULL
flow — YAML config -> streaming file source -> processor chain ->
parquet-MERGE compaction sink — across several input epochs, kills the
query MID-EPOCH (stop() right after new data lands, without awaiting),
restarts from the same checkpoint, and pins exactly-once of the
compacted view: after recovery every key holds exactly its
highest-seq record, no duplicates, no lost keys, tombstones honored.

The crash point is inherently racy (the batch may be unprocessed,
in-flight, or committed when stop() lands) — which is the point: ANY
interleaving must converge to the same view because replayed epochs
re-merge idempotently (streaming/ops.py latest_per_key_stream_parquet).
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

# soak tier (opt-in, `-m soak`): multi-minute lifecycle proof; default-tier coverage of the operator itself lives in the oracle parity gate and the faster unit tests
pytestmark = pytest.mark.soak
from pyspark.sql import functions as F

from local_stream_stack_spark.pipeline import Pipeline
from local_stream_stack_spark.schemas import get_schema, register_schema
from local_stream_stack_spark.streaming.ops import (
    latest_per_key_stream_parquet,
    read_compacted_view,
)

KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

N_KEYS = 20


def _epoch_rows(epoch: int):
    """Each epoch updates every key with a strictly higher seq; a few
    keys get tombstoned (value < 0) in epoch 3 and resurrected in 4."""
    rows = []
    for k in range(N_KEYS):
        seq = epoch * 100 + k
        val = float(epoch * 1000 + k)
        if epoch == 3 and k % 7 == 0:
            val = -1.0  # tombstone marker
        rows.append((k, seq, val))
    return rows



def test_yaml_pipeline_soak_crash_replay(spark, tmpdir):
    in_dir = f"{tmpdir}/in"
    view = f"{tmpdir}/view"
    cp = f"{tmpdir}/cp"
    try:
        get_schema("soak_kv")
    except KeyError:
        register_schema("soak_kv", KV_SCHEMA)
    cfg = {
        "name": "soak-compaction-stream",
        "source": {
            "type": "parquet",
            "path": in_dir,
            "streaming": True,
            "schema": "soak_kv",
        },
        "processors": [
            {"name": "filter", "params": {"predicate": "key >= 0"}},
            {
                "name": "with_column",
                "params": {"name": "value2", "expr": "value * 2"},
            },
        ],
        # sink attached below: the compaction sink is a foreachBatch
        # writer we start from the composed pipeline dataframe
        "sink": {"type": "noop"},
    }

    def start():
        df = Pipeline(spark, cfg).dataframe()
        return latest_per_key_stream_parquet(
            df,
            keys=["key"],
            order_col="seq",
            target_path=view,
            checkpoint_location=cp,
            tombstone_predicate="value < 0",
            n_buckets=8,
        )

    def feed(epoch: int):
        spark.createDataFrame(_epoch_rows(epoch), KV_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    # epochs 0-1: clean processing
    feed(0)
    q = start()
    q.processAllAvailable()
    feed(1)
    q.processAllAvailable()

    # epoch 2: CRASH mid-epoch — data lands, stop() without awaiting
    feed(2)
    q.stop()

    # restart from the same checkpoint; epochs 3 (tombstones) and 4
    q = start()
    q.processAllAvailable()
    feed(3)
    q.processAllAvailable()

    # second crash, this time before the restart even sees epoch 4
    q.stop()
    feed(4)
    q = start()
    q.processAllAvailable()
    q.stop()

    out = read_compacted_view(spark, view).collect()
    # exactly-once: one row per key, each at its final (epoch-4) state
    assert len(out) == N_KEYS
    by_key = {r["key"]: r for r in out}
    assert set(by_key) == set(range(N_KEYS))
    for k, r in by_key.items():
        assert r["seq"] == 400 + k, (k, r)
        assert r["value"] == float(4000 + k)
        assert r["value2"] == 2.0 * (4000 + k)



def test_yaml_pipeline_soak_tombstone_when_final(spark, tmpdir):
    """Same flow, but the LAST write tombstones some keys: the view
    must drop exactly those keys after crash-recovery replay."""
    in_dir = f"{tmpdir}/in2"
    view = f"{tmpdir}/view2"
    cp = f"{tmpdir}/cp2"
    try:
        get_schema("soak_kv")
    except KeyError:
        register_schema("soak_kv", KV_SCHEMA)
    cfg = {
        "name": "soak-compaction-tombstone",
        "source": {
            "type": "parquet",
            "path": in_dir,
            "streaming": True,
            "schema": "soak_kv",
        },
        "processors": [],
        "sink": {"type": "noop"},
    }

    def start():
        df = Pipeline(spark, cfg).dataframe()
        return latest_per_key_stream_parquet(
            df,
            keys=["key"],
            order_col="seq",
            target_path=view,
            checkpoint_location=cp,
            tombstone_predicate="value < 0",
            n_buckets=4,
        )

    spark.createDataFrame(_epoch_rows(0), KV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = start()
    q.processAllAvailable()

    # final epoch tombstones keys % 3 == 0, then immediate crash
    rows = [
        (k, 900 + k, -1.0 if k % 3 == 0 else float(900 + k))
        for k in range(N_KEYS)
    ]
    spark.createDataFrame(rows, KV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q.stop()

    q = start()
    q.processAllAvailable()
    q.stop()

    out = {r["key"]: r for r in read_compacted_view(spark, view).collect()}
    live = {k for k in range(N_KEYS) if k % 3 != 0}
    assert set(out) == live
    for k in live:
        assert out[k]["seq"] == 900 + k


def test_torn_write_invisible_until_manifest_commit(spark, tmpdir):
    """The atomic-commit window (VERDICT r6 #5): files from a crashed
    epoch that never reached its manifest rename must be INVISIBLE to
    readers, and a checkpoint replay must converge over them.

    Simulates the torn write deterministically: after a committed
    state, plant a bogus epoch tree (wrong rows, valid parquet) under
    data/ WITHOUT a manifest — the exact on-disk state of a crash
    between the data write and the manifest rename."""
    in_dir = f"{tmpdir}/in3"
    view = f"{tmpdir}/view3"
    cp = f"{tmpdir}/cp3"
    try:
        get_schema("soak_kv")
    except KeyError:
        register_schema("soak_kv", KV_SCHEMA)
    cfg = {
        "name": "soak-torn-write",
        "source": {
            "type": "parquet",
            "path": in_dir,
            "streaming": True,
            "schema": "soak_kv",
        },
        "processors": [],
        "sink": {"type": "noop"},
    }

    def start():
        df = Pipeline(spark, cfg).dataframe()
        return latest_per_key_stream_parquet(
            df,
            keys=["key"],
            order_col="seq",
            target_path=view,
            checkpoint_location=cp,
            n_buckets=4,
        )

    spark.createDataFrame(_epoch_rows(0), KV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = start()
    q.processAllAvailable()
    q.stop()
    committed = {
        (r["key"], r["seq"]) for r in read_compacted_view(spark, view).collect()
    }
    assert committed == {(k, k) for k in range(N_KEYS)}

    # torn write: a huge-epoch tree with GARBAGE rows, no manifest
    bogus = [(k, 10_000_000 + k, -999.0) for k in range(N_KEYS)]
    (
        spark.createDataFrame(bogus, KV_SCHEMA)
        .withColumn("__deleted", F.lit(False))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{view}/data/__epoch=999/__bucket=0")
    )

    # reader: unmanifested files are invisible
    after = {
        (r["key"], r["seq"]) for r in read_compacted_view(spark, view).collect()
    }
    assert after == committed

    # writer replay: the next epochs merge against COMMITTED state
    # only and converge to the true view
    spark.createDataFrame(_epoch_rows(1), KV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = start()
    q.processAllAvailable()
    q.stop()
    final = {r["key"]: r["seq"] for r in read_compacted_view(spark, view).collect()}
    assert final == {k: 100 + k for k in range(N_KEYS)}


def test_replay_after_manifest_commit_survives_gc(spark, tmpdir):
    """ADVICE r7 #1: crash AFTER epoch N's manifest rename but BEFORE
    the checkpoint commits batch N. On restart Spark replays batch N,
    whose pre-state read resolves buckets to epochs < N — so the dirs
    epoch N superseded must still exist. GC is deferred by one epoch
    for exactly this window; this test forces the replay
    deterministically by deleting the newest checkpoint commit marker
    (Spark then re-runs the batch from the offsets log) and pins that
    recovery converges instead of wedging on path-not-found."""
    import glob as _glob
    import os

    in_dir = f"{tmpdir}/in4"
    view = f"{tmpdir}/view4"
    cp = f"{tmpdir}/cp4"
    try:
        get_schema("soak_kv")
    except KeyError:
        register_schema("soak_kv", KV_SCHEMA)
    cfg = {
        "name": "soak-replay-gc",
        "source": {
            "type": "parquet",
            "path": in_dir,
            "streaming": True,
            "schema": "soak_kv",
        },
        "processors": [],
        "sink": {"type": "noop"},
    }

    def start():
        df = Pipeline(spark, cfg).dataframe()
        return latest_per_key_stream_parquet(
            df,
            keys=["key"],
            order_col="seq",
            target_path=view,
            checkpoint_location=cp,
            tombstone_predicate="value < 0",
            n_buckets=4,
        )

    def feed(epoch: int):
        spark.createDataFrame(_epoch_rows(epoch), KV_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    # three clean epochs so GC has real superseded dirs to consider
    feed(0)
    q = start()
    q.processAllAvailable()
    feed(1)
    q.processAllAvailable()
    feed(2)
    q.processAllAvailable()
    q.stop()

    # deferred-GC invariant: for every committed bucket, the dir of
    # the LATEST epoch strictly below the top one (= a replay of the
    # top epoch's pre-state) must still exist on disk
    import json as _json

    manifests = {}
    for p in _glob.glob(f"{view}/_manifests/*.json"):
        name = os.path.basename(p)
        if not name[:-5].isdigit():
            continue
        m = _json.load(open(p))
        manifests[int(m["epoch"])] = m["buckets"]
    top = max(manifests)
    assert top >= 2
    pre = {}
    for e, bl in manifests.items():
        if e >= top:
            continue
        for b in bl:
            pre[b] = max(pre.get(b, -1), e)
    for b, e in pre.items():
        assert os.path.isdir(f"{view}/data/__epoch={e}/__bucket={b}"), (
            f"pre-state dir for bucket {b} (epoch {e}) was GC'd — "
            f"an epoch-{top} replay would wedge"
        )

    # force the replay: drop the newest checkpoint commit marker
    commits = sorted(
        (f for f in os.listdir(f"{cp}/commits") if f.isdigit()), key=int
    )
    os.remove(f"{cp}/commits/{commits[-1]}")
    # the local ChecksumFs keeps a .crc sidecar; a stale one fails the
    # re-commit rename with a misleading "concurrent queries" error
    crc = f"{cp}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)

    q = start()
    q.processAllAvailable()  # replays the batch; must NOT wedge
    q.stop()

    out = {r["key"]: r for r in read_compacted_view(spark, view).collect()}
    assert set(out) == set(range(N_KEYS))
    for k, r in out.items():
        assert r["seq"] == 200 + k, (k, r)


def test_leftover_temp_manifest_is_not_a_commit(spark, tmpdir):
    """ADVICE r7 #2: a crash between temp-create and rename leaves a
    dot-prefixed temp in _manifests/. Hadoop globStatus does NOT hide
    dotfiles, so the reader must filter strictly to <epoch>.json —
    neither a well-formed leftover (phantom commit) nor a torn one
    (JSONDecodeError forever) may affect readers or writers."""
    import os

    in_dir = f"{tmpdir}/in5"
    view = f"{tmpdir}/view5"
    cp = f"{tmpdir}/cp5"
    try:
        get_schema("soak_kv")
    except KeyError:
        register_schema("soak_kv", KV_SCHEMA)
    cfg = {
        "name": "soak-temp-manifest",
        "source": {
            "type": "parquet",
            "path": in_dir,
            "streaming": True,
            "schema": "soak_kv",
        },
        "processors": [],
        "sink": {"type": "noop"},
    }

    def start():
        df = Pipeline(spark, cfg).dataframe()
        return latest_per_key_stream_parquet(
            df,
            keys=["key"],
            order_col="seq",
            target_path=view,
            checkpoint_location=cp,
            n_buckets=4,
        )

    spark.createDataFrame(_epoch_rows(0), KV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = start()
    q.processAllAvailable()
    q.stop()
    committed = {
        (r["key"], r["seq"]) for r in read_compacted_view(spark, view).collect()
    }
    assert committed == {(k, k) for k in range(N_KEYS)}

    # plant both failure shapes, using the OLD temp naming (*.json so
    # an unfiltered glob would match them)
    with open(f"{view}/_manifests/.tmp-999.json", "w") as f:
        f.write('{"epoch": 999, "buckets": [0, 1, 2, 3]}')  # phantom
    with open(f"{view}/_manifests/.tmp-998.json", "w") as f:
        f.write('{"epo')  # torn write

    # reader unaffected (a phantom epoch-999 commit would resolve all
    # buckets to nonexistent paths; a torn one would raise)
    after = {
        (r["key"], r["seq"]) for r in read_compacted_view(spark, view).collect()
    }
    assert after == committed

    # writer unaffected: next epoch merges against true state
    spark.createDataFrame(_epoch_rows(1), KV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = start()
    q.processAllAvailable()
    q.stop()
    final = {
        r["key"]: r["seq"] for r in read_compacted_view(spark, view).collect()
    }
    assert final == {k: 100 + k for k in range(N_KEYS)}
