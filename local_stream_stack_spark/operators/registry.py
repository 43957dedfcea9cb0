"""Named transform registry: the engine's processor-plugin mechanism.

The reference loads processor classes by dotted path via importlib
(`streaming_pipeline.py:103-143`) with YAML params becoming instance
attributes (`base_processor.py:33-35`). We keep that capability (dotted
paths still resolve) but prefer an explicit registry of named factory
functions — safer (no arbitrary import execution from config typos)
and testable.

A transform factory is ``(**params) -> (DataFrame -> DataFrame)``. The
returned callable must be pure plan composition (lazy); the pipeline
folds transforms in order and never materializes between them, so
Catalyst optimizes across transform boundaries
(reference behavior preserved: `streaming_pipeline.py:193-203`).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]
_TRANSFORMS: dict[str, Callable[..., Transform]] = {}


def register_transform(name: str, overwrite: bool = False):
    """Decorator: register a transform factory under ``name``."""

    def deco(factory: Callable[..., Transform]):
        if name in _TRANSFORMS and not overwrite:
            raise ValueError(f"transform {name!r} already registered")
        _TRANSFORMS[name] = factory
        return factory

    return deco


def list_transforms() -> list[str]:
    return sorted(_TRANSFORMS)


def resolve_transform(name: str, params: dict) -> Transform:
    """Registry name -> transform; dotted path -> class/function with
    reference-compatible semantics (instantiated with params, used via
    ``.process`` if present)."""
    if name in _TRANSFORMS:
        return _TRANSFORMS[name](**params)
    if "." in name:
        module_name, _, attr = name.rpartition(".")
        try:
            mod = importlib.import_module(module_name)
            obj = getattr(mod, attr)
        except (ImportError, AttributeError) as ex:
            raise ValueError(f"cannot load transform {name!r}: {ex}") from ex
        if isinstance(obj, type):
            inst = obj(**params) if params else obj()
            process = getattr(inst, "process", None)
            if process is None:
                raise ValueError(
                    f"transform class {name!r} has no .process method"
                )
            return process
        if params:
            return obj(**params)
        return obj
    raise ValueError(
        f"unknown transform {name!r}; registered: {list_transforms()}"
    )


# --- built-in transforms (reference processors, re-expressed) ---------


@register_transform("identity")
def _identity() -> Transform:
    """No-op pass-through (reference NoOpProcessor,
    `base_processor.py:63-84`)."""
    return lambda df: df


@register_transform("cast_kafka_strings")
def _cast_kafka_strings(columns: tuple[str, ...] = ("key", "value")) -> Transform:
    """CAST binary Kafka key/value to string (reference A5:
    `sample_stream_job.py:73`, `custom_processors.py:44-49`)."""

    def fn(df: DataFrame) -> DataFrame:
        out = df
        for c in columns:
            if c in df.columns:
                out = out.withColumn(c, F.col(c).cast("string"))
        return out

    return fn


@register_transform("uppercase_value")
def _uppercase_value(column: str = "value", project: bool = True) -> Transform:
    """Uppercase a string column, optionally projecting to
    (key, value) — reference SimpleTransformProcessor
    (`custom_processors.py:21-59`: core expr :49, projection :52-57,
    missing-column guard :35-38)."""

    def fn(df: DataFrame) -> DataFrame:
        if column not in df.columns:
            raise ValueError(
                f"uppercase_value: column {column!r} not in frame "
                f"(columns: {df.columns})"
            )
        out = df.withColumn(column, F.upper(F.col(column).cast("string")))
        if project:
            keep = [c for c in ("key", column) if c in out.columns]
            out = out.select(*keep)
        return out

    return fn


@register_transform("select")
def _select(columns: list[str]) -> Transform:
    return lambda df: df.select(*columns)


@register_transform("filter")
def _filter(predicate: str) -> Transform:
    """SQL predicate filter, e.g. ``value IS NOT NULL`` (tombstone
    drop, `sample_kafka_process.sh:206-215`)."""
    return lambda df: df.filter(predicate)


@register_transform("sql_expr")
def _sql_expr(exprs: list[str]) -> Transform:
    """selectExpr projection (computed columns / casts)."""
    return lambda df: df.selectExpr(*exprs)


@register_transform("with_column")
def _with_column(name: str, expr: str) -> Transform:
    return lambda df: df.withColumn(name, F.expr(expr))


@register_transform("parse_json")
def _parse_json(schema_name: str, payload_col: str = "value") -> Transform:
    """Project a JSON payload through a registered schema — closes the
    reference's registered-but-unapplied schema gap
    (`streaming_pipeline.py:10`)."""
    from local_stream_stack_spark.schemas import apply_json_schema

    return lambda df: apply_json_schema(df, schema_name, payload_col)


@register_transform("to_kafka_frame")
def _to_kafka_frame(key_expr: str | None = None, value_expr: str = "to_json(struct(*))") -> Transform:
    """Serialize rows into the (key, value) shape the Kafka sink
    requires (reference serialization note `kafka_connector.py:240-244`)."""

    def fn(df: DataFrame) -> DataFrame:
        cols = [F.expr(value_expr).cast("string").alias("value")]
        if key_expr:
            cols.insert(0, F.expr(key_expr).cast("string").alias("key"))
        return df.select(*cols)

    return fn


@register_transform("watermark")
def _watermark(column: str, delay: str) -> Transform:
    return lambda df: df.withWatermark(column, delay)


@register_transform("drop_duplicates")
def _drop_duplicates(columns: list[str] | None = None, within_watermark: bool = False) -> Transform:
    def fn(df: DataFrame) -> DataFrame:
        if within_watermark:
            return df.dropDuplicatesWithinWatermark(columns)
        return df.dropDuplicates(columns) if columns else df.dropDuplicates()

    return fn


@register_transform("repartition")
def _repartition(num_partitions: int, columns: list[str] | None = None) -> Transform:
    def fn(df: DataFrame) -> DataFrame:
        if columns:
            return df.repartition(num_partitions, *columns)
        return df.repartition(num_partitions)

    return fn


@register_transform("aggregate")
def _aggregate(group_by: list[str], aggs: list[str]) -> Transform:
    """Grouped aggregation from SQL aggregate expressions, e.g.
    ``["count(*) AS n", "sum(cents) AS total"]`` — gives YAML
    pipelines the groupBy/agg stage the reference leaves to custom
    processor classes."""

    def fn(df: DataFrame) -> DataFrame:
        return df.groupBy(*group_by).agg(*[F.expr(e) for e in aggs])

    return fn


@register_transform("join_static")
def _join_static(
    path: str,
    on: list[str] | str,
    how: str = "inner",
    format: str = "parquet",
    broadcast: bool = True,
    select: list[str] | None = None,
) -> Transform:
    """Enrich the flow against a static dimension read from ``path`` —
    the lookup-join stage (stream-static join when the pipeline is
    streaming; plain dim join in batch). ``broadcast`` hints the dim
    side, the right default for dimensions that fit an executor."""

    def fn(df: DataFrame) -> DataFrame:
        dim = df.sparkSession.read.format(format).load(path)
        if select:
            dim = dim.select(*select)
        if broadcast:
            dim = F.broadcast(dim)
        return df.join(dim, on, how)

    return fn


# --- curation-stage transforms (round 9): the LLM-tier operators the
# YAML pipeline composes end-to-end (quality gate -> exact dedup ->
# near-dup -> sample -> dataset card).  Each wraps an engine operator
# so a config file reaches the same code path as the programmatic
# queries — the reference's processor-plugin idea
# (`streaming_pipeline.py:103-143`) applied to the curation surface.


@register_transform("text_stats")
def _text_stats(text_col: str = "text") -> Transform:
    """Token/char-class statistics + composite quality score
    (``operators/text.with_text_stats``)."""
    from local_stream_stack_spark.operators.text import with_text_stats

    return lambda df: with_text_stats(df, text_col)


@register_transform("lang_id")
def _lang_id(text_col: str = "text") -> Transform:
    """Heuristic marker-stopword language ID
    (``operators/text.lang_id_scores``)."""
    from local_stream_stack_spark.operators.text import lang_id_scores

    return lambda df: lang_id_scores(df, text_col)


@register_transform("dedup_keep_first")
def _dedup_keep_first(
    key_expr: str,
    order_col: str,
    copies_col: str | None = None,
    key_col: str = "__dedup_key",
) -> Transform:
    """Keep one representative row per ``key_expr`` value — the
    smallest ``order_col`` wins (deterministic).  ``copies_col``
    optionally records the family size BEFORE collapsing, so a
    downstream dataset card can report how much the stage removed.

    One shuffle on the key (a partitioned window — never global), the
    same single-exchange shape as ``operators/dedup.exact_dedup``;
    ``key_expr`` decides exact (normalized-content hash) vs near-dup
    (token-sort fingerprint, SimHash bucket, ...) semantics."""

    def fn(df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        keyed = df.withColumn(key_col, F.expr(key_expr))
        w = Window.partitionBy(key_col).orderBy(F.asc(order_col))
        out = keyed.withColumn("__rn", F.row_number().over(w))
        if copies_col:
            out = out.withColumn(
                copies_col,
                F.count("*").over(Window.partitionBy(key_col)),
            )
        return out.filter(F.col("__rn") == 1).drop("__rn", key_col)

    return fn
