"""exact_quantile must equal Spark's exact percentile aggregate."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from local_stream_stack_spark.operators.quantiles import exact_quantile


def _check(spark, rows, q, bins=64):
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r.k: r.out
        for r in exact_quantile(df, "v", q, ["k"], bins=bins, out_col="out").collect()
    }
    want = {
        r.k: r.p
        for r in df.groupBy("k")
        .agg(F.expr(f"percentile(v, {q})").alias("p"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12, abs_tol=1e-12), (
            k,
            got[k],
            want[k],
        )


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_random_groups(spark, q):
    rng = random.Random(7)
    rows = [
        (k, rng.uniform(-100, 100))
        for k in ("a", "b", "c")
        for _ in range(rng.randrange(1, 200))
    ]
    _check(spark, rows, q)


def test_skewed_single_value_bin(spark):
    # 95% identical values: the heavy bin must still resolve exactly
    rows = [("a", 5.0)] * 95 + [("a", float(i)) for i in range(5)]
    _check(spark, rows, 0.5, bins=8)


def test_single_row_and_constant_groups(spark):
    rows = [("one", 3.25), ("const", 2.0), ("const", 2.0), ("const", 2.0)]
    for q in (0.0, 0.3, 1.0):
        _check(spark, rows, q)


def test_integerish_ties_across_bins(spark):
    rows = [("a", float(v)) for v in [1, 1, 1, 2, 2, 3, 3, 3, 3, 10]]
    for q in (0.1, 0.5, 0.75):
        _check(spark, rows, q, bins=4)


def test_multi_quantile_shared_pipeline(spark):
    from local_stream_stack_spark.operators.quantiles import exact_quantiles

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 7.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r.k: (r.p10, r.p50, r.p99)
        for r in exact_quantiles(
            df, "v", [0.1, 0.5, 0.99], ["k"], bins=8,
            out_cols=["p10", "p50", "p99"],
        ).collect()
    }
    want = {
        r.k: (r.a, r.b, r.c)
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile(v, 0.1)").alias("a"),
            F.expr("percentile(v, 0.5)").alias("b"),
            F.expr("percentile(v, 0.99)").alias("c"),
        )
        .collect()
    }
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert math.isclose(g, w, rel_tol=1e-12, abs_tol=1e-12), (k, got[k], want[k])


def test_by_value_matches_bin_refinement(spark):
    """The one-scan value-histogram form and the 3-pass bin-refinement
    form must agree exactly on a bounded-distinct column."""
    import random

    from local_stream_stack_spark.operators.quantiles import (
        exact_quantiles_by_value,
        exact_quantiles_multi,
    )

    rng = random.Random(7)
    rows = [(f"k{i % 3}", float(rng.randint(1, 50))) for i in range(999)]
    df = spark.createDataFrame(rows, "k string, v double")
    qs = [0.1, 0.5, 0.9]
    a = {
        r.k: (r.q1, r.q2, r.q3)
        for r in exact_quantiles_by_value(
            df, {"v": qs}, ["k"], out_cols={"v": ["q1", "q2", "q3"]}
        ).collect()
    }
    b = {
        r.k: (r.q1, r.q2, r.q3)
        for r in exact_quantiles_multi(
            df, {"v": qs}, ["k"], out_cols={"v": ["q1", "q2", "q3"]}
        ).collect()
    }
    assert set(a) == set(b) == {"k0", "k1", "k2"}
    for k in a:
        for x, y in zip(a[k], b[k]):
            assert abs(x - y) < 1e-9, (k, a[k], b[k])


def test_regression_by_nation_matches_numpy(spark, tmp_path):
    """The decimal-moment closed form must agree with numpy's least
    squares / correlation on a crafted mini-warehouse."""
    import numpy as np
    import pandas as pd

    rng = random.Random(7)
    rows = []
    for i in range(300):
        q = rng.randint(1, 50)
        price = round(q * 1010.10 + rng.uniform(-500, 500), 2)
        rows.append((i, i % 4 + 1, 1, q * 1.0, price, 0.0, 0.0, "N", "O"))
    li = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus",
        ],
    )
    li["l_linenumber"] = 1
    li["l_shipdate"] = pd.Timestamp("2020-01-01")
    sup = pd.DataFrame({"s_suppkey": [1], "s_nationkey": [0],
                        "s_name": ["s"], "s_acctbal": [0.0]})
    nat = pd.DataFrame({"n_nationkey": [0], "n_name": ["ZENITH"],
                        "n_regionkey": [0]})
    d = tmp_path / "wh"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet")
    sup.to_parquet(d / "supplier.parquet")
    nat.to_parquet(d / "nation.parquet")

    from local_stream_stack_spark.queries.relational_ext import (
        regression_by_nation,
    )

    row = regression_by_nation(spark, str(d)).collect()[0]
    x = li["l_quantity"].to_numpy()
    y = li["l_extendedprice"].to_numpy()
    slope_np, intercept_np = np.polyfit(x, y, 1)
    corr_np = np.corrcoef(x, y)[0, 1]
    assert row.n_lineitems == 300
    # outputs are single-rounded scaled BIGINTs; tolerance = half a
    # rounding grain plus numpy's own float noise
    assert math.isclose(
        row.slope_e6 / 1e6, slope_np, rel_tol=1e-9, abs_tol=1e-6
    )
    assert math.isclose(
        row.intercept_e2 / 1e2, intercept_np, rel_tol=1e-6, abs_tol=0.01
    )
    assert math.isclose(
        row.corr_e6 / 1e6, corr_np, rel_tol=1e-9, abs_tol=1e-6
    )


def test_percentile_quantization_beats_minmax_under_outliers(spark, tmp_path):
    """One outlier coordinate stretches the min-max int8 range and
    ruins every vector's reconstruction in that dimension; the
    [p01, p99] calibration clips it and keeps corpus-median MSE low."""
    import pandas as pd

    rng = random.Random(11)
    vecs = [[round(rng.uniform(0, 1), 4) for _ in range(4)] for _ in range(100)]
    vecs[7][0] = 1000.0  # the outlier
    pdf = pd.DataFrame(
        {"vec_id": range(100), "embedding": vecs, "label": [0] * 100}
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet")

    from local_stream_stack_spark.queries.training_ops import (
        embedding_quantize_int8,
        embedding_quantize_pct,
    )

    minmax = {r.vec_id: r.mse_e12 for r in
              embedding_quantize_int8(spark, str(d)).collect()}
    pct = {r.vec_id: r for r in
           embedding_quantize_pct(spark, str(d)).collect()}

    med_minmax = sorted(minmax.values())[50]
    med_pct = sorted(r.mse_e12 for r in pct.values())[50]
    assert med_pct < med_minmax / 100
    assert pct[7].n_clipped >= 1
    assert sum(r.n_clipped for r in pct.values()) <= 2 * 4  # ~1% x 2 tails


def test_stats_profile_nulls_mode_and_tiebreak(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [7, 7, 9, 9],  # modal tie -> '7' < '9'
            "o_orderstatus": ["O", "F", None, "O"],
            "o_totalprice": [10.5, 20.0, 20.0, None],
            "o_orderdate": [dt.datetime(2024, 1, 1)] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "orders.parquet", coerce_timestamps="us")

    from local_stream_stack_spark.queries.relational_ext import (
        stats_profile_orders,
    )

    got = {r.column_name: r for r in
           stats_profile_orders(spark, str(d)).collect()}
    st = got["o_orderstatus"]
    assert (st.n_nulls, st.n_distinct, st.top_value, st.top_count) == (
        1, 2, "O", 2,
    )
    ck = got["o_custkey"]
    assert ck.top_value == "7" and ck.top_count == 2  # lexicographic tie
    tp = got["o_totalprice"]
    assert tp.n_nulls == 1
    assert tp.min_num_e2 == 1050 and tp.max_num_e2 == 2000
    assert got["o_orderdate"].n_distinct == 1


def test_referential_integrity_audit_counts_orphans(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [10, 10, 99],  # 99 missing from customer
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [1.0] * 3,
            "o_orderdate": [dt.datetime(2024, 1, 1)] * 3,
            "o_orderpriority": ["1"] * 3,
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 77],  # 77 orphan; orders 2,3 childless
            "l_partkey": [1] * 3,
            "l_suppkey": [1] * 3,
            "l_linenumber": [1, 2, 1],
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [1.0] * 3,
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [dt.datetime(2024, 1, 2)] * 3,
        }
    )
    cust = pd.DataFrame(
        {"c_custkey": [10], "c_name": ["c"], "c_nationkey": [0],
         "c_acctbal": [0.0]}
    )
    d = tmp_path / "wh"
    d.mkdir()
    orders.to_parquet(d / "orders.parquet", coerce_timestamps="us")
    li.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")
    cust.to_parquet(d / "customer.parquet")

    from local_stream_stack_spark.queries.relational_ext import (
        referential_integrity_audit,
    )

    got = {r.check_name: (r.n_violations, r.n_total)
           for r in referential_integrity_audit(spark, str(d)).collect()}
    assert got == {
        "childless_orders": (2, 3),
        "orphan_lineitems": (1, 3),
        "orphan_orders_custkey": (1, 3),
    }


def test_orders_monthly_yoy_growth_math(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    rows = []
    k = 0
    # Jan-2023 100.00, Feb-2023 200.00, Jan-2024 150.00
    for (y, m, total) in [(2023, 1, 100.0), (2023, 2, 200.0),
                          (2024, 1, 150.0)]:
        k += 1
        rows.append((k, 1, "O", total, dt.datetime(y, m, 15), "1"))
    pdf = pd.DataFrame(rows, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"])
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "orders.parquet", coerce_timestamps="us")

    from local_stream_stack_spark.queries.relational_ext import (
        orders_monthly_yoy,
    )

    got = {(r.yr, r.mo): r for r in orders_monthly_yoy(spark, str(d)).collect()}
    assert got[(2023, 1)].mom_growth_e4 is None
    assert got[(2023, 2)].mom_growth_e4 == 10_000      # +100%
    # LAG(12) over a 3-row series is NULL (sparse months don't fake a YoY)
    assert got[(2024, 1)].yoy_growth_e4 is None
    assert got[(2024, 1)].mom_growth_e4 == -2_500      # 200 -> 150


def test_basket_lift_identifies_planted_pair(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    rows = []
    # parts 100&200 co-occur in 5 baskets; parts 1..10 scattered
    for o in range(5):
        rows += [(o, 100, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                  dt.datetime(2024, 1, 1)),
                 (o, 200, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
                  dt.datetime(2024, 1, 1))]
    for o in range(5, 25):
        rows.append((o, o % 10, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     dt.datetime(2024, 1, 1)))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"])
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    from local_stream_stack_spark.queries.training_ops import (
        basket_lift_pairs,
    )

    rows_out = basket_lift_pairs(spark, str(d)).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r.part_a, r.part_b, r.supp_ab) == (100, 200, 5)
    assert r.confidence_e4 == 10_000           # 200 always follows 100
    assert r.lift_e4 == 50_000                 # 5*25/(5*5) = 5.0


def test_supplier_pareto_abc_boundaries(spark, tmp_path):
    """Revenue 80/15/5 across three suppliers -> exactly one A, one
    B, one C with the exclusive-prefix boundary rule."""
    import datetime as dt

    import pandas as pd

    rows = []
    k = 0
    for supp, rev in [(1, 80.0), (2, 15.0), (3, 5.0)]:
        k += 1
        rows.append((k, 1, supp, 1, 1.0, rev, 0.0, 0.0, "N", "O",
                     dt.datetime(2024, 1, 1)))
    li = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"])
    d = tmp_path / "wh"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    from local_stream_stack_spark.queries.relational_ext import (
        supplier_pareto_abc,
    )

    got = {r.abc_class: r.n_suppliers for r in
           supplier_pareto_abc(spark, str(d)).collect()}
    # supplier 1: prefix 0 < 80% -> A; supplier 2: prefix 80 not <
    # 80% but < 95% -> B; supplier 3: prefix 95 -> C
    assert got == {"A": 1, "B": 1, "C": 1}


def test_customer_rfm_extremes(spark, tmp_path):
    """The best customer (most recent, most frequent, biggest spend)
    lands in (5,5,5); the worst in (1,1,1)."""
    import datetime as dt

    import pandas as pd

    rows = []
    k = 0
    for cust in range(1, 11):
        # customer i orders i times, last order on day i, spend 10*i
        for j in range(cust):
            k += 1
            rows.append((k, cust, "O", 10.0, dt.datetime(2024, 1, cust),
                         "1"))
    pdf = pd.DataFrame(rows, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"])
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "orders.parquet", coerce_timestamps="us")

    from local_stream_stack_spark.queries.relational_ext import (
        customer_rfm_scores,
    )

    got = {(r.r, r.f, r.m): r for r in
           customer_rfm_scores(spark, str(d)).collect()}
    # NTILE(5) over 10 customers -> 2 per quintile
    assert got[(5, 5, 5)].min_custkey == 9
    assert got[(5, 5, 5)].n_customers == 2
    assert got[(1, 1, 1)].min_custkey == 1


def test_with_global_rank_matches_window(spark):
    """with_global_rank must reproduce an unpartitioned window's
    row_number and running sum exactly — global/keyed, asc/desc,
    heavy-tie and constant-value (single-bin degenerate) inputs."""
    from pyspark.sql.window import Window

    from local_stream_stack_spark.operators.quantiles import (
        with_global_rank,
    )

    rng = random.Random(11)
    rows = [
        (i % 4, rng.choice([0, 1, 2, 5, 5, 5, 50]), f"k{i:04d}",
         rng.randint(1, 9))
        for i in range(400)
    ] + [(9, 7, f"c{i:03d}", 1) for i in range(50)]  # constant key 9
    df = spark.createDataFrame(rows, "grp int, v int, tk string, pay int")

    out = {
        r.tk: (r.rn, int(r.cum), r.n)
        for r in with_global_rank(
            df, "v", ["tk"], out_rank="rn", total_col="n",
            cumsum={"pay": "cum"}, acc_type="DECIMAL(38,0)", bins=16,
        ).collect()
    }
    w = Window.orderBy("v", "tk")
    exp = {
        r.tk: (r.rn, int(r.cum), 450)
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum(F.col("pay").cast("decimal(38,0)")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .collect()
    }
    assert out == exp

    keyed = {
        r.tk: r.rn
        for r in with_global_rank(
            df, "v", ["tk"], keys=["grp"], out_rank="rn",
            descending=True, bins=16,
        ).collect()
    }
    w2 = Window.partitionBy("grp").orderBy(F.desc("v"), F.asc("tk"))
    exp2 = {
        r.tk: r.rn
        for r in df.withColumn("rn", F.row_number().over(w2)).collect()
    }
    assert keyed == exp2

    empty = spark.createDataFrame([], "grp int, v int, tk string, pay int")
    assert (
        with_global_rank(
            empty, "v", ["tk"], cumsum={"pay": "c"}, total_col="n"
        ).count()
        == 0
    )


def test_ntile_expr_matches_ntile(spark):
    """NTILE's closed form over a distributed rank must equal
    F.ntile for every k shape: k | n, k ∤ n, k = n, k > n, k = 1."""
    from pyspark.sql.window import Window

    from local_stream_stack_spark.operators.quantiles import (
        ntile_expr,
        with_global_rank,
    )

    rng = random.Random(3)
    rows = [(rng.randint(0, 30), f"t{i:03d}") for i in range(97)]
    df = spark.createDataFrame(rows, "v int, tk string")
    ranked = with_global_rank(
        df, "v", ["tk"], out_rank="rn", total_col="n", bins=8
    )
    for k in (1, 2, 5, 10, 96, 97, 150):
        got = {
            r.tk: r.b
            for r in ranked.withColumn(
                "b", ntile_expr("rn", "n", k)
            ).collect()
        }
        exp = {
            r.tk: r.b
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy("v", "tk"))
            ).collect()
        }
        assert got == exp, k


def test_with_global_rank_plan_has_no_unpartitioned_window(spark):
    """The whole point of the operator: no WindowExec without a
    PARTITION BY anywhere in its physical plan."""
    sys_path = __import__("sys").path
    import os

    sys_path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    from audit_plans import has_unpartitioned_window

    from local_stream_stack_spark.operators.quantiles import (
        with_global_rank,
    )

    df = spark.range(100).selectExpr(
        "CAST(id % 13 AS INT) AS v", "CAST(id AS STRING) AS tk",
        "CAST(id % 3 AS INT) AS pay"
    )
    plan = (
        with_global_rank(df, "v", ["tk"], cumsum={"pay": "c"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan  # the partitioned within-bin windows
    assert not has_unpartitioned_window(plan)


def test_values_at_global_ranks_matches_sort(spark):
    """values_at_global_ranks must return the exact order statistic at
    each requested 1-indexed rank — duplicates, all-equal single-bin
    degenerate, extreme-outlier bin skew, doubles, empty input, and
    out-of-range ranks (NULL, never an error) — and must do it under
    ANSI mode (try_element_at on the empty target-bin filter)."""
    from local_stream_stack_spark.operators.quantiles import (
        values_at_global_ranks,
    )

    def check(vals, ranks, typ="bigint", bins=16):
        df = spark.createDataFrame([(v,) for v in vals], f"v {typ}")
        rdf = spark.range(1).select(
            *[
                F.lit(r).cast("bigint").alias(f"r{i}")
                for i, r in enumerate(ranks)
            ]
        )
        rows = values_at_global_ranks(
            df,
            "v",
            rdf,
            [f"r{i}" for i in range(len(ranks))],
            [f"o{i}" for i in range(len(ranks))],
            bins=bins,
        ).collect()
        assert len(rows) == 1
        s = sorted(vals)
        for i, r in enumerate(ranks):
            exp = s[r - 1] if 1 <= r <= len(s) else None
            assert rows[0][f"o{i}"] == exp, (r, rows[0][f"o{i}"], exp)

    rng = random.Random(7)
    check([rng.randint(-50, 50) for _ in range(1000)],
          [1, 500, 501, 1000, 0, 1001])
    check([7] * 100, [1, 50, 100])       # all-equal: one bin
    check([], [1])                        # empty input: NULL
    check([0] * 999 + [10 ** 12], [1, 500, 999, 1000])  # outlier skew
    check([rng.gauss(0.0, 1.0) for _ in range(2000)],
          [1, 1000, 1001, 2000], typ="double", bins=64)
    check([42], [1])
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        check([rng.randint(-5, 5) for _ in range(200)],
              [1, 100, 101, 200, 0, 201], bins=8)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_values_at_global_ranks_plan_has_no_unpartitioned_window(spark):
    """The rank-select plan must contain no window at all and no
    single-partition Exchange over the input relation."""
    from local_stream_stack_spark.operators.quantiles import (
        values_at_global_ranks,
    )

    df = spark.range(10000).select((F.col("id") % 97).alias("v"))
    rdf = spark.range(1).select(F.lit(5000).cast("bigint").alias("r"))
    out = values_at_global_ranks(df, "v", rdf, ["r"], ["o"], bins=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_values_at_global_ranks_keyed_and_weighted(spark):
    """Per-key rank selection must match a per-key sort, and the
    weighted form must return the smallest value whose inclusive
    running weight reaches the threshold (lower weighted median)."""
    from local_stream_stack_spark.operators.quantiles import (
        values_at_global_ranks,
    )

    rng = random.Random(13)
    rows = [
        (k, rng.randint(-100, 100), rng.randint(1, 9))
        for k in ("a", "b", "c")
        for _ in range(rng.choice([50, 137, 400]))
    ]
    df = spark.createDataFrame(rows, "k string, v bigint, w bigint")

    # keyed (unweighted): median + max per key
    import collections
    per_key = collections.defaultdict(list)
    for k, v, w in rows:
        per_key[k].append((v, w))
    cnt = {k: len(vs) for k, vs in per_key.items()}
    rdf = spark.createDataFrame(
        [(k, (cnt[k] + 1) // 2, cnt[k]) for k in per_key],
        "k string, r1 bigint, r2 bigint",
    )
    got = {
        r.k: (r.o1, r.o2)
        for r in values_at_global_ranks(
            df, "v", rdf, ["r1", "r2"], ["o1", "o2"], bins=16, keys=["k"]
        ).collect()
    }
    for k, vs in per_key.items():
        s = sorted(v for v, _ in vs)
        assert got[k] == (s[(len(s) + 1) // 2 - 1], s[-1]), k

    # keyed + weighted: lower weighted median per key
    tot = {k: sum(w for _, w in vs) for k, vs in per_key.items()}
    rdf_w = spark.createDataFrame(
        [(k, (tot[k] + 1) // 2) for k in per_key], "k string, t bigint"
    )
    got_w = {
        r.k: r.o
        for r in values_at_global_ranks(
            df, "v", rdf_w, ["t"], ["o"], bins=16, keys=["k"],
            weight_col="w",
        ).collect()
    }
    for k, vs in per_key.items():
        cum, want = 0, None
        for v, w in sorted(vs):
            cum += w
            if 2 * cum >= tot[k]:
                want = v
                break
        assert got_w[k] == want, (k, got_w[k], want)
