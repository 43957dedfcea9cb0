"""Bloom semi-join reduction and the time-hierarchy rollup cascade."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_stream_stack_spark.operators.joins import bloom_semi_join
from local_stream_stack_spark.queries.events_ops import rollup_time_hierarchy

SF = "/root/testdata/sf0.001"


def test_bloom_semi_join_equals_plain_semi(spark):
    """Exactness: bloom prefilter + exact semi == plain left_semi."""
    fact = spark.createDataFrame(
        [(i, i % 97) for i in range(2000)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(j,) for j in range(0, 97, 5)], "dk long")
    got = bloom_semi_join(fact, dim, fact_key="k", dim_key="dk")
    expect = fact.join(
        dim.withColumnRenamed("dk", "k"), on="k", how="left_semi"
    )
    assert sorted(r.row_id for r in got.collect()) == sorted(
        r.row_id for r in expect.collect()
    )


def test_bloom_has_no_false_negatives_tiny_filter(spark):
    """Even an under-sized (collision-heavy) bitmap must never drop a
    true member — only the pass-rate degrades."""
    fact = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    dim = spark.createDataFrame([(i,) for i in range(0, 5000, 7)], "dk long")
    got = bloom_semi_join(fact, dim, fact_key="k", dim_key="dk", m_bits=256, k=2)
    assert got.count() == dim.count()


def test_bloom_rejects_bad_m_bits(spark):
    import pytest

    fact = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_semi_join(fact, fact, fact_key="k", dim_key="k", m_bits=100)


def test_rollup_tiers_are_consistent(spark):
    """Each coarser tier must total exactly its finer tier (counts and
    sums), and minute buckets must nest inside their hour/day."""
    out = rollup_time_hierarchy(spark, SF).collect()
    tiers: dict[str, list] = {"minute": [], "hour": [], "day": []}
    for r in out:
        tiers[r.granularity].append(r)
    assert tiers["minute"] and tiers["hour"] and tiers["day"]

    def total(rows):
        return sum(r.n_events for r in rows), round(
            sum(r.sum_value for r in rows), 2
        )

    assert total(tiers["minute"]) == total(tiers["hour"]) == total(tiers["day"])

    hours = {r.bucket_s: r for r in tiers["hour"]}
    from collections import defaultdict

    per_hour = defaultdict(int)
    for r in tiers["minute"]:
        per_hour[r.bucket_s // 3600 * 3600] += r.n_events
    assert per_hour == {b: r.n_events for b, r in hours.items()}


def test_rollup_buckets_aligned(spark):
    out = rollup_time_hierarchy(spark, SF)
    bad = out.filter(
        ((F.col("granularity") == "hour") & (F.col("bucket_s") % 3600 != 0))
        | ((F.col("granularity") == "day") & (F.col("bucket_s") % 86400 != 0))
        | ((F.col("granularity") == "minute") & (F.col("bucket_s") % 60 != 0))
    )
    assert bad.count() == 0
