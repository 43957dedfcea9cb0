"""File source format coverage (SURVEY.md §2B scans row: parquet/
CSV/JSON batch + file streaming): round-trips through FileSource."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from local_stream_stack_spark.sources.files import FileSource

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

ROWS = [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.25)]


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="src-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_batch_roundtrip(spark, tmpdir, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = f"{tmpdir}/{fmt}"
    writer = df.write.format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    opts = {"header": "true"} if fmt == "csv" else {}
    src = FileSource(path=path, format=fmt, schema=SCHEMA, options=opts)
    back = src.read_batch(spark)
    assert back.schema == SCHEMA
    assert sorted((r.k, r.name, r.score) for r in back.collect()) == sorted(ROWS)


def test_unsupported_format_rejected():
    with pytest.raises(ValueError):
        FileSource(path="/tmp/x", format="avro")


def test_json_stream_source(spark, tmpdir):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = f"{tmpdir}/jsonstream"
    df.coalesce(1).write.format("json").save(path)
    src = FileSource(path=path, format="json", schema=SCHEMA)
    stream = src.read_stream(spark)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("json_src")
        .option("checkpointLocation", f"{tmpdir}/cp")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.table("json_src").count() == 3


def test_stream_requires_schema(tmpdir):
    src = FileSource(path=tmpdir, format="json")
    with pytest.raises(ValueError):
        src.read_stream(None)


def test_python_datasource_shards_and_determinism(spark):
    """The custom Python DataSource must plan one input partition per
    requested shard (parallel scan, no driver generation) and produce
    identical rows on re-read (seedless determinism)."""
    from local_stream_stack_spark.sources.pyds import register

    register(spark)

    def read():
        return (
            spark.read.format("lss_synthetic")
            .option("n_rows", "1000")
            .option("n_parts", "4")
            .load()
        )

    assert read().rdd.getNumPartitions() == 4
    a = sorted(tuple(r) for r in read().collect())
    b = sorted(tuple(r) for r in read().collect())
    assert a == b and len(a) == 1000
    # cells are the documented pure function of id
    assert all(k == (i * 2654435761) % 4294967296 for i, _, k in a)
    # shards partition the id space exactly (no dup/gap across workers)
    assert [i for i, _, _ in a] == list(range(1000))


def test_schema_evolution_merge_read(spark, tmp_path):
    """mergeSchema reconciles old (2-col) and new (3-col) files:
    old rows surface the added column as NULL; a plain read without
    mergeSchema can miss the added column entirely."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a"] * 4,
            "lang": ["en", "en", "de", "de"],
            "source": ["s1", "s2", "s1", "s2"],
            "n_chars": [1] * 4,
        }
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from local_stream_stack_spark.queries.training_ops import (
        schema_evolution_roundtrip,
    )

    got = {r.lang: r for r in
           schema_evolution_roundtrip(spark, str(d)).collect()}
    assert got["en"].n_docs == 2
    assert got["en"].n_missing_source == 1   # doc 0 written old-style
    assert got["en"].n_sources_seen == 1     # doc 1 carries s2
    assert got["de"].n_missing_source == 1
