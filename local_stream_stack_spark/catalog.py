"""Table catalog for the driver-generated synthetic datasets.

Tables (one parquet each, see /root/repo/TESTDATA.md): the TPC-H-ish
star schema ``region nation customer supplier part orders lineitem``
plus ``events`` (stream-shaped, maps onto the reference's
USER_EVENT_SCHEMA at `schema_manager.py:19-24`), ``documents`` and
``embeddings`` for the LLM-data operators.

Design note for 100 TB: the loader is a thin wrapper over
``spark.read.parquet`` so Catalyst keeps full pushdown/pruning; we never
cache or materialize here. On a real lake these paths would be
partitioned table roots and everything below still holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")



def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one catalog table.

    The ``events`` table stores TIMESTAMP(NANOS) parquet, which Spark 4
    rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos as long
    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to a
    microsecond TIMESTAMP — the same truncation DuckDB applies when it
    maps ns parquet to its us TIMESTAMP, so oracle comparisons agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    # The conf only changes how TIMESTAMP(NANOS) columns are decoded
    # (as long), so setting it up front is safe for every other table
    # and avoids a throwaway failed read just to probe the footer.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if df.schema["ts"].dataType.typeName() == "long":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register catalog tables as temp views so SQL-form operators work."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
