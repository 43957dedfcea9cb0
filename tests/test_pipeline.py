"""Pipeline build/run semantics (reference StreamingPipeline parity:
build/run split, transform fold, None-abort, dynamic loading)."""

from __future__ import annotations

import pytest

from local_stream_stack_spark.config import (
    ConfigError,
    parse_pipeline_config,
)
from local_stream_stack_spark.operators.registry import (
    list_transforms,
    register_transform,
    resolve_transform,
)
from local_stream_stack_spark.pipeline import Pipeline


def _batch_cfg(sf_dir: str, processors, sink=None):
    return {
        "name": "test-pipe",
        "source": {
            "type": "parquet",
            "path": f"{sf_dir}/documents.parquet",
            "streaming": False,
        },
        "processors": processors,
        "sink": sink or {"type": "memory", "query_name": "pipe_out"},
    }


def test_config_validation_errors():
    with pytest.raises(ConfigError, match="source"):
        parse_pipeline_config({"sink": {"type": "console"}})
    with pytest.raises(ConfigError, match="type"):
        parse_pipeline_config({"source": {}, "sink": {"type": "console"}})
    with pytest.raises(ConfigError, match="processor #0"):
        parse_pipeline_config(
            {
                "source": {"type": "rate"},
                "processors": [{"params": {}}],
                "sink": {"type": "console"},
            }
        )


def test_batch_pipeline_end_to_end(spark, sf_dir):
    """Parquet source -> filter -> uppercase (reference golden
    transform) -> memory sink, in batch replay mode."""
    pipe = Pipeline(
        spark,
        _batch_cfg(
            sf_dir,
            [
                {"name": "filter", "params": {"predicate": "lang = 'en'"}},
                {"name": "with_column", "params": {"name": "value", "expr": "text"}},
                {"name": "uppercase_value", "params": {"project": False}},
            ],
        ),
    )
    pipe.build()
    pipe.run()
    out = spark.table("pipe_out")
    rows = out.select("lang", "value").collect()
    assert rows and all(r.lang == "en" for r in rows)
    assert all(r.value == r.value.upper() for r in rows)


def test_uppercase_golden(spark):
    """Reference golden fixture (`custom_processors.py:71-93`)."""
    df = spark.createDataFrame(
        [("key1", "hello world"), ("key2", "test message"), ("key3", "PySpark Stream")],
        "key string, value string",
    )
    fn = resolve_transform("uppercase_value", {})
    got = {(r.key, r.value) for r in fn(df).collect()}
    assert got == {
        ("key1", "HELLO WORLD"),
        ("key2", "TEST MESSAGE"),
        ("key3", "PYSPARK STREAM"),
    }


def test_uppercase_missing_column_guard(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="'value' not in frame"):
        resolve_transform("uppercase_value", {})(df)


def test_transform_none_abort(spark, sf_dir):
    @register_transform("broken_none", overwrite=True)
    def _broken():
        return lambda df: None

    pipe = Pipeline(spark, _batch_cfg(sf_dir, [{"name": "broken_none"}]))
    with pytest.raises(RuntimeError, match="returned None"):
        pipe.run()


def test_dotted_path_loading(spark, sf_dir):
    """Dynamic loading parity (`streaming_pipeline.py:122-123`): a
    dotted module path resolves to a transform."""
    fn = resolve_transform(
        "tests.helpers_dynamic.AddTagProcessor", {"tag": "x1"}
    )
    df = spark.createDataFrame([("a",)], "value string")
    assert fn(df).columns == ["value", "tag"]
    assert fn(df).first().tag == "x1"


def test_unknown_transform_rejected():
    with pytest.raises(ValueError, match="unknown transform"):
        resolve_transform("definitely_missing", {})
    assert "uppercase_value" in list_transforms()


def test_lazy_composition_single_plan(spark, sf_dir):
    """The composed pipeline is ONE lazy plan: the filter from a later
    transform reaches the parquet scan (predicate pushdown across
    transform boundaries — reference behavior `streaming_pipeline.py:193-203`)."""
    pipe = Pipeline(
        spark,
        _batch_cfg(
            sf_dir,
            [
                {"name": "select", "params": {"columns": ["doc_id", "lang"]}},
                {"name": "filter", "params": {"predicate": "lang = 'de'"}},
            ],
        ),
    )
    plan = pipe.dataframe()._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan


def test_pipeline_aggregate_and_join_static_stages(spark, tmp_path):
    """The aggregate and join_static registry stages compose in a
    config-driven chain and produce the hand-written plan's result."""
    from pyspark.sql import functions as F

    from local_stream_stack_spark.pipeline import Pipeline

    src = f"{tmp_path}/facts"
    dim_path = f"{tmp_path}/dim"
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(src)
    spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(5)], "k long, grp string"
    ).write.parquet(dim_path)
    cfg = {
        "name": "agg-join",
        "source": {"type": "parquet", "path": src, "streaming": False},
        "processors": [
            {
                "name": "join_static",
                "params": {"path": dim_path, "on": ["k"], "select": ["k", "grp"]},
            },
            {
                "name": "aggregate",
                "params": {
                    "group_by": ["grp"],
                    "aggs": ["COUNT(*) AS n", "SUM(v) AS total"],
                },
            },
        ],
        "sink": {"type": "noop"},
    }
    got = {
        (r.grp, r.n, r.total)
        for r in Pipeline(spark, cfg).dataframe().collect()
    }
    facts = spark.read.parquet(src)
    dim = spark.read.parquet(dim_path)
    want = {
        (r.grp, r.n, r.total)
        for r in facts.join(dim, "k")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want
