"""Every registered oracle must be executable DuckDB SQL.

Runs the full oracle catalog against EMPTY views of the driver's
tables (~5 s total): catches SQL syntax drift, dialect regressions,
and binder errors in any future oracle edit without needing the
Spark side at all. Value parity is the driver's/check_parity's job;
this is the cheap always-on syntax net."""

from __future__ import annotations

import duckdb
import pytest

from local_stream_stack_spark.catalog import TABLES
from local_stream_stack_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM '{SF_DIR}/{t}.parquet' LIMIT 0"
        )
    return c


def test_every_oracle_executes_on_empty_tables(con):
    failures = []
    for name, spec in QUERIES.items():
        if not spec.oracle:
            continue
        try:
            con.sql(spec.oracle).fetchall()
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {e}")
    assert not failures, "\n".join(failures)
