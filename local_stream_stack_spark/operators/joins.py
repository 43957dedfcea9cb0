"""Join strategy helpers beyond Catalyst's defaults: salting for
skewed keys and bucketed (pre-shuffled) co-located joins.

SURVEY.md §2B plans all join KINDS on Spark built-ins (the reference
implements no joins at all — no `join` call anywhere in
`pyspark_stream/`); this module adds the two *physical* strategies a
100 TB deployment needs when AQE alone is not enough:

- ``salted_join``: explicit key salting. AQE's skew-join splits
  oversized partitions of a sort-merge join, but it cannot help when
  one logical key's rows must still meet one reducer (e.g. a hot
  entity id joining a replicable dimension). Salting spreads ONE hot
  key across ``salt`` reducers by replicating the small side.
- ``write_bucketed`` / bucketed reads: pre-shuffle both fact tables
  into the same bucket layout so repeated joins on the bucket key
  skip the exchange entirely — the classic fact-fact co-location
  strategy when the same join runs per-batch/per-day.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from local_stream_stack_spark.utils.ts import epoch_us

_SALTABLE = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}


def _hashable(dt: T.DataType) -> bool:
    """xxhash64 accepts atomic/array/struct inputs but fails analysis
    on maps (and containers holding maps)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side's keys salted across ``salt``
    sub-keys and the right side replicated ``salt``-fold.

    Semantics are identical to ``left.join(right, on, how)`` for
    inner/left/left_semi joins (each left row joins exactly one
    replica of each matching right row). Right/full/anti joins are
    rejected: replication would duplicate unmatched right rows.

    The salt is derived from a hash of the whole left row (not
    rand()), so retried tasks produce identical output — required
    for deterministic results and speculative execution.

    Scale: use when one/few left keys dominate (hot user, null-ish
    default key) and the right side is too big to broadcast but small
    enough to replicate ``salt``×. Shuffle volume: left unchanged,
    right × salt. AQE skew-join handles the symmetric big-big case;
    this handles the replicable-right case it cannot.
    """
    if how not in _SALTABLE:
        raise ValueError(
            f"salted_join supports {sorted(_SALTABLE)}; got how={how!r}"
        )
    if salt < 2:
        return left.join(right, list(on), how)
    on = list(on)
    # hash only hashable columns (maps fail xxhash64 analysis); a
    # row with none left still joins correctly, just unspread
    hash_cols = [
        F.col(f.name) for f in left.schema.fields if _hashable(f.dataType)
    ]
    salt_col = (
        F.pmod(F.xxhash64(*hash_cols), F.lit(salt)).cast("int")
        if hash_cols
        else F.lit(0)
    )
    # uniquified temp name so a pre-existing __salt column survives
    salt_name = "__salt"
    taken = set(left.columns) | set(right.columns)
    while salt_name in taken:
        salt_name = "_" + salt_name
    l2 = left.withColumn(salt_name, salt_col)
    r2 = right.withColumn(
        salt_name, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = l2.join(r2, on + [salt_name], how)
    return joined.drop(salt_name)


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_width_s: int = 3600,
) -> DataFrame:
    """Inner join of timestamped ``points`` to containing ``intervals``
    (``lo <= ts <= hi``) as an EQUI-join on time bins.

    Without an equi key, Catalyst plans an interval predicate as a
    broadcast-nested-loop (or cartesian) join — O(|points| x
    |intervals|) comparisons. Binning restores a hash join: each point
    maps to bin floor(epoch/width); each interval explodes to its
    covering bins (span/width + 1 rows); the join is equi on ``__bin``
    with the interval predicate as a residual filter.

    A qualifying (point, interval) pair co-locates in EXACTLY ONE bin —
    the point's — so the output needs no dedup. Replication factor on
    the interval side is span/width + 1: pick ``bin_width_s`` near the
    typical interval span so it stays ~2. Shuffle: points once on
    ``__bin``, intervals x replication — the 100 TB shape as long as
    interval count x replication stays joinable (and a small interval
    side broadcasts, making the whole thing one scan).
    """
    w_us = int(bin_width_s) * 1_000_000
    p = points.withColumn(
        "__bin", F.floor(epoch_us(F.col(ts_col)) / w_us).cast("bigint")
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(epoch_us(F.col(lo_col)) / w_us).cast("bigint"),
                F.floor(epoch_us(F.col(hi_col)) / w_us).cast("bigint"),
            )
        ),
    )
    return (
        p.join(i, "__bin")
        .filter(
            (F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: Sequence[str] | str,
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Both sides of a repeated fact-fact join written with the SAME
    (key, buckets) layout join with NO exchange and (if sorted) NO
    sort — the shuffle is paid once at write time instead of on
    every query. Bucket count should be sized so one bucket of the
    larger table fits an executor core's working set at the target
    scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-split).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join reduction: prune the fact side BEFORE
    its join shuffle using a compact bitmap of the dimension's keys.

    Catalyst injects runtime bloom filters only for some shapes
    (`spark.sql.optimizer.runtime.bloomFilter.*`); this is the
    explicit, always-available version of the same idea. The build
    side aggregates the dim keys into an ``m_bits``-wide bitmap —
    k=3 positions per key via seeded xxhash64, OR-merged per 64-bit
    word — so the driver collects at most ``m_bits/64`` rows (8 KiB
    of longs at the default m=65536) REGARDLESS of data scale; the
    bitmap then rides into every fact task as a literal array tested
    in whole-stage codegen. Rows failing any of the k bit probes
    cannot be in the dim (no false negatives), so the follow-up exact
    left-semi join sees only survivors: at 100 TB the win is shuffle
    volume — a selective dim prunes the fact exchange by the bloom's
    pass rate, at the cost of one tiny extra aggregation.

    The trailing exact semi join makes the result exact (bloom false
    positives are filtered there), which is what lets the whole
    operator sit under a plain ``IN (subquery)`` SQL oracle.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    keys = dim_keys.select(F.col(dim_key).alias("__k")).distinct()
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("__k"), F.lit(i)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()  # bounded: <= m_bits/64 rows, independent of |dim|
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[int(r["w"])] = r["bits"]

    probe = fact.withColumn("__bm", F.lit(bitmap))
    for i in range(k):
        probe = probe.withColumn(
            f"__p{i}",
            F.pmod(F.xxhash64(F.col(fact_key), F.lit(i)), F.lit(m_bits)),
        )
    tests = " AND ".join(
        f"(shiftright(element_at(__bm, CAST(__p{i} / 64 AS INT) + 1),"
        f" CAST(__p{i} % 64 AS INT)) & 1) = 1"
        for i in range(k)
    )
    pruned = probe.filter(F.expr(tests)).drop(
        "__bm", *[f"__p{i}" for i in range(k)]
    )
    return pruned.join(
        keys.withColumnRenamed("__k", fact_key), on=fact_key, how="left_semi"
    )
