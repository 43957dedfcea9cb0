"""observe()-based expectations: in-flight violation counters must
match the standalone one-pass report, and cost no extra action."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_stream_stack_spark.operators.quality import (
    expectations_report,
    observe_expectations,
)


def test_observed_metrics_match_report(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 0.0), (4, 2.5), (None, 1.0)],
        "id int, price double",
    )
    rules = {
        "price_positive": F.col("price") <= 0,
        "id_not_null": F.col("id").isNull(),
    }
    observed, obs = observe_expectations(df, "dq", rules)
    n_out = observed.count()  # the action the pipeline runs anyway
    got = obs.get
    assert n_out == 5 and got["n_rows"] == 5
    report = {
        r.rule: r.n_violations
        for r in expectations_report(df, rules).collect()
    }
    assert got["price_positive"] == report["price_positive"] == 2
    assert got["id_not_null"] == report["id_not_null"] == 1
