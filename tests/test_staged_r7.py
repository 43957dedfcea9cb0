"""Oracle parity for the eight round-7 batch queries — the exact
Spark-vs-DuckDB compare the driver gate runs, executed in pytest.
These were implemented in round 6 behind a staging map (the driver
window was full), registered in round 7, and moved verbatim to their
home modules in round 8; this test now reads them straight from the
registry so the pytest-level parity gate survives the move."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")
from check_parity import TABLES, compare  # noqa: E402

from local_stream_stack_spark.queries import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.01"

R7_BATCH = [
    "orders_backlog_aging",
    "event_transition_matrix",
    "session_entropy_per_user",
    "hhi_market_concentration",
    "weekday_activity_profile",
    "embedding_dim_variance_audit",
    "ship_lag_quantiles",
    "dedup_rate_by_source",
]


@pytest.mark.parametrize("name", R7_BATCH)
def test_r7_batch_query_is_exact_vs_oracle(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert spark_rows, f"{name} returned no rows at sf0.01"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    rel = con.sql(spec.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    issues, exact, close = compare(
        spark_rows, spark_cols, duck_rows, duck_cols
    )
    assert exact, f"{name}: {issues[:5]}"
