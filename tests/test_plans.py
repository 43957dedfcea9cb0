"""Plan-hygiene assertions: the optimizations we rely on at 100 TB
must be visible in the physical plan (SURVEY.md §4: verify via
explain in tests)."""

from __future__ import annotations

import pytest

from local_stream_stack_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (
        QUERIES[name]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q6_filter_pushdown(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q6_column_pruning(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    # ReadSchema must not include columns the query never touches
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema and "l_partkey" not in read_schema


def test_broadcast_join_used_for_dims(spark):
    plan = _plan(spark, "join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_strategies(spark):
    plan = _plan(spark, "join_semi")
    assert "LeftSemi" in plan
    plan = _plan(spark, "join_anti")
    assert "LeftAnti" in plan


def test_q1_partial_aggregation(spark):
    """Partial (map-side) aggregation before the shuffle: two
    HashAggregate levels around one Exchange."""
    plan = _plan(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_active(spark):
    # AQE prints codegen stages only in the final (post-execution) plan
    df = QUERIES["q1_pricing_summary"].fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert "*(" in plan


def test_no_cartesian_in_range_join(spark):
    plan = _plan(spark, "range_join_views_before_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
