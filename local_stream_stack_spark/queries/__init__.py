"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered with
an optional DuckDB oracle SQL string. The driver contract
(`/root/repo/__spark_entry__.py`) exposes this registry via
``queries()`` / ``oracle_sql()``.

Import side effects populate the registry.
"""

from local_stream_stack_spark.queries.registry import (
    QUERIES,
    get_queries,
    get_oracles,
    query,
)
from local_stream_stack_spark.queries import relational  # noqa: F401
from local_stream_stack_spark.queries import relational_ext  # noqa: F401
from local_stream_stack_spark.queries import tpch_rest  # noqa: F401
from local_stream_stack_spark.queries import collections_funcs  # noqa: F401
from local_stream_stack_spark.queries import extensions  # noqa: F401
from local_stream_stack_spark.queries import windows  # noqa: F401
from local_stream_stack_spark.queries import events_ops  # noqa: F401
from local_stream_stack_spark.queries import llm  # noqa: F401
from local_stream_stack_spark.queries import streaming_e2e  # noqa: F401
from local_stream_stack_spark.queries import training_ops  # noqa: F401
from local_stream_stack_spark.queries import layout_ops  # noqa: F401

__all__ = ["QUERIES", "get_queries", "get_oracles", "query"]
