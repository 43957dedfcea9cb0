"""Schema registry parity tests (`schema_manager.py:44-90` semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from local_stream_stack_spark.schemas import (
    DETAILED_PRODUCT_SCHEMA,
    USER_EVENT_SCHEMA,
    apply_json_schema,
    get_schema,
    list_schemas,
    register_schema,
)


def test_builtin_schemas_registered():
    assert {"simple_message", "user_event", "detailed_product"} <= set(list_schemas())
    assert get_schema("user_event") is USER_EVENT_SCHEMA
    assert len(DETAILED_PRODUCT_SCHEMA.fields) == 10


def test_register_guards():
    s = T.StructType([T.StructField("a", T.StringType())])
    register_schema("t_guard", s)
    with pytest.raises(ValueError, match="already registered"):
        register_schema("t_guard", s)
    register_schema("t_guard", s, overwrite=True)  # ok
    with pytest.raises(TypeError, match="StructType"):
        register_schema("bad", "not a schema")  # type: ignore[arg-type]
    with pytest.raises(KeyError, match="not registered"):
        get_schema("missing_schema")


def test_apply_json_schema(spark):
    df = spark.createDataFrame(
        [
            ("k1", '{"user_id": 7, "event_type": "click", "timestamp": 1704067200, "payload": "{}"}'),
            ("k2", "not json at all"),
        ],
        "key string, value string",
    )
    out = apply_json_schema(df, "user_event", payload_col="value")
    rows = {r.key: r for r in out.collect()}
    assert rows["k1"].user_id == 7 and rows["k1"].event_type == "click"
    assert rows["k2"].user_id is None  # malformed -> nulls (PERMISSIVE)
    assert set(out.columns) == {"key", "user_id", "event_type", "timestamp", "payload"}
