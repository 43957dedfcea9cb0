"""Smoke + plan-hygiene tests for the remaining TPC-H shapes
(queries/tpch_rest.py). Value correctness is covered by the DuckDB
oracle gate; here we assert executability at sf0.001, stable schemas,
and the plan properties the 100 TB design relies on."""

from __future__ import annotations

import pytest

from local_stream_stack_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

TPCH_REST = [
    "q2_top_supplier_per_part",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_order_count_dist",
    "q15_top_supplier",
    "q16_supplier_count",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
]


@pytest.mark.parametrize("name", TPCH_REST)
def test_runs_and_returns_rows(spark, name):
    df = QUERIES[name].fn(spark, SF)
    rows = df.collect()
    assert df.columns  # stable, non-empty schema
    # sf0.001 has only 10 suppliers across 25 nations, so the
    # nation-filtered supplier queries can legitimately be empty here
    # (they are non-empty at the sf0.01 oracle gate)
    if name not in (
        "q11_important_parts",
        "q20_dominant_suppliers",
        "q21_waiting_suppliers",
    ):
        assert rows


def test_q13_keeps_zero_order_customers(spark):
    """The LEFT join must keep customers whose orders were all
    filtered out — their count bucket is part of the distribution."""
    df = QUERIES["q13_order_count_dist"].fn(spark, SF)
    counts = {r["c_count"]: r["custdist"] for r in df.collect()}
    total = sum(counts.values())
    ncust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert total == ncust


def test_q15_max_is_unique_or_tied(spark):
    df = QUERIES["q15_top_supplier"].fn(spark, SF)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r["total_revenue"] for r in rows}) == 1


def test_q16_anti_join_in_plan(spark):
    plan = (
        QUERIES["q16_supplier_count"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan


def test_q21_single_lineitem_scan_window_form(spark):
    """The exists/not-exists pair is decorrelated to one l_orderkey
    window — lineitem must appear exactly once in the physical plan
    (the semi+anti form scanned it three times)."""
    plan = (
        QUERIES["q21_waiting_suppliers"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_q2_no_cartesian(spark):
    plan = (
        QUERIES["q2_top_supplier_per_part"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_hll_sketch_rollup_error_bound(spark, sf_dir):
    """Sketch-union estimates must land within 1% of exact distinct
    counts, and re-aggregating sketches must equal building them at
    the coarse grain directly (the mergeability contract)."""
    from pyspark.sql import functions as F

    from local_stream_stack_spark.catalog import load_table
    from local_stream_stack_spark.queries import QUERIES

    est = {
        r.l_returnflag: r.approx_distinct_orders
        for r in QUERIES["hll_sketch_rollup"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.ex
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("ex"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, e in est.items():
        assert abs(e - exact[flag]) / exact[flag] < 0.01, (flag, e, exact[flag])
    direct = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("l_orderkey", F.lit(14))
            ).alias("d")
        )
        .collect()
    }
    assert est == direct


def test_approx_distinct_parts_split_form_matches_fused(spark, sf_dir):
    """r13 restructure pin: the two-subtree form (separate HLL agg +
    two-level exact distinct, joined on flag) must return the same
    rows as the former fused multi-distinct aggregate — the HLL
    estimate is duplicate/order-insensitive, the exact side is the
    same set."""
    from pyspark.sql import functions as F

    from local_stream_stack_spark.catalog import load_table
    from local_stream_stack_spark.queries import QUERIES

    got = {
        r.l_returnflag: (r.approx_parts, r.exact_parts)
        for r in QUERIES["approx_distinct_parts"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    fused = {
        r.l_returnflag: (r.a, r.e)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("a"),
            F.countDistinct("l_partkey").alias("e"),
        )
        .collect()
    }
    assert got == fused
