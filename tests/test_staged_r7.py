"""Oracle parity for the round-7 STAGED queries — the exact
Spark-vs-DuckDB compare the driver gate runs, executed in pytest so
the staged queries are proven EXACT before they ever register."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")
from check_parity import TABLES, compare  # noqa: E402

from local_stream_stack_spark.queries.staged_r7 import STAGED  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_is_exact_vs_oracle(spark, name):
    fn, oracle = STAGED[name]
    sdf = fn(spark, SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert spark_rows, f"{name} returned no rows at sf0.01"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    rel = con.sql(oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    issues, exact, close = compare(
        spark_rows, spark_cols, duck_rows, duck_cols
    )
    assert exact, f"{name}: {issues[:5]}"
