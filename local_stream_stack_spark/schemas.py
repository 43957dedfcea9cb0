"""Named schema registry (reference parity: `schema_manager.py:10-90`).

StructTypes registered under string names; lookup raises KeyError on
miss, registration guards overwrite (ValueError) and type
(TypeError) exactly as the reference does. We close the reference's
gap — it registers schemas but never applies them
(`streaming_pipeline.py:10` import is commented out) — with
``apply_json_schema``: project a JSON payload column through a
registered schema via ``from_json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_REGISTRY: dict[str, T.StructType] = {}

# Reference example schemas (shape parity with `schema_manager.py:14-41`).
SIMPLE_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

USER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.IntegerType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),  # unix ts convention
        T.StructField("payload", T.StringType(), True),  # JSON string
    ]
)

DETAILED_PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("stock_quantity", T.IntegerType(), False),
        T.StructField("is_active", T.BooleanType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField(
            "supplier_info",
            T.StructType(
                [
                    T.StructField("supplier_id", T.StringType(), True),
                    T.StructField("supplier_name", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("last_updated", T.TimestampType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def register_schema(name: str, schema: T.StructType, overwrite: bool = False) -> None:
    """Register a StructType under a name.

    Raises TypeError for non-StructType, ValueError on overwrite
    without ``overwrite=True`` (reference `schema_manager.py:44-68`).
    """
    if not isinstance(schema, T.StructType):
        raise TypeError(
            f"schema must be a StructType, got {type(schema).__name__}"
        )
    if name in _REGISTRY and not overwrite:
        raise ValueError(
            f"schema {name!r} already registered; pass overwrite=True to replace"
        )
    _REGISTRY[name] = schema


def get_schema(name: str) -> T.StructType:
    """Look up a registered schema (reference `schema_manager.py:71-84`)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"schema {name!r} not registered; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def list_schemas() -> list[str]:
    return sorted(_REGISTRY)


def apply_json_schema(
    df: DataFrame, schema_name: str, payload_col: str = "value", keep_payload: bool = False
) -> DataFrame:
    """Parse a JSON string/binary column through a registered schema
    and flatten its fields to top level — the projection step the
    reference leaves as a gap. Malformed rows yield nulls (PERMISSIVE),
    which downstream quality filters can drop.
    """
    schema = get_schema(schema_name)
    parsed = df.withColumn(
        "__parsed", F.from_json(F.col(payload_col).cast("string"), schema)
    )
    out_cols = [c for c in df.columns if keep_payload or c != payload_col]
    return parsed.select(*out_cols, "__parsed.*")


# Auto-register the reference example schemas (reference
# `schema_manager.py:88-90` does the same at import time).
for _name, _schema in (
    ("simple_message", SIMPLE_MESSAGE_SCHEMA),
    ("user_event", USER_EVENT_SCHEMA),
    ("detailed_product", DETAILED_PRODUCT_SCHEMA),
):
    if _name not in _REGISTRY:
        register_schema(_name, _schema)
