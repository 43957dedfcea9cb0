"""Sinks beyond Kafka: console (reference A4,
`sample_stream_job.py:75-80`), memory (test sink), parquet files,
foreachBatch (exactly-once custom sinks), and noop (plan-only runs).
The reference's writer whitelist is kafka-only
(`streaming_pipeline.py:85-91`); these close the gap.

Each sink handles BOTH batch and streaming frames: ``write(df)``
dispatches on ``df.isStreaming`` so pipelines run identically in
replay (batch) and live (streaming) mode.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


def _apply_trigger(writer, trigger: dict[str, Any] | None):
    if trigger:
        return writer.trigger(**trigger)
    return writer


@dataclass
class ConsoleSink:
    output_mode: str = "append"
    truncate: bool = False
    num_rows: int = 20
    trigger: dict[str, Any] | None = None

    def write(self, df: DataFrame, query_name: str | None = None):
        if df.isStreaming:
            writer = (
                df.writeStream.outputMode(self.output_mode)
                .format("console")
                .option("truncate", str(self.truncate).lower())
                .option("numRows", str(self.num_rows))
            )
            if query_name:
                writer = writer.queryName(query_name)
            return _apply_trigger(writer, self.trigger).start()
        df.show(self.num_rows, truncate=self.truncate)
        return None


@dataclass
class MemorySink:
    """In-memory table sink for tests; query results via
    ``spark.table(query_name)``."""

    output_mode: str = "append"
    trigger: dict[str, Any] | None = None

    def write(self, df: DataFrame, query_name: str | None = None):
        if not query_name:
            raise ValueError("memory sink requires a query name")
        if df.isStreaming:
            writer = (
                df.writeStream.outputMode(self.output_mode)
                .format("memory")
                .queryName(query_name)
            )
            return _apply_trigger(writer, self.trigger).start()
        df.createOrReplaceTempView(query_name)
        return None


@dataclass
class ParquetSink:
    path: str
    checkpoint_location: str | None = None
    partition_by: list[str] = field(default_factory=list)
    mode: str = "append"  # batch write mode
    trigger: dict[str, Any] | None = None

    def write(self, df: DataFrame, query_name: str | None = None):
        if df.isStreaming:
            if not self.checkpoint_location:
                raise ValueError(
                    "streaming parquet sink requires checkpoint_location"
                )
            writer = (
                df.writeStream.format("parquet")
                .option("path", self.path)
                .option("checkpointLocation", self.checkpoint_location)
            )
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            if query_name:
                writer = writer.queryName(query_name)
            return _apply_trigger(writer, self.trigger).start()
        writer = df.write.mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)
        return None


@dataclass
class ForeachBatchSink:
    """Custom per-micro-batch sink: ``fn(batch_df, epoch_id)``.

    The exactly-once escape hatch — upserts, latest-per-key
    materialization, multi-sink fan-out all build on this.
    """

    fn: Callable[[DataFrame, int], None]
    checkpoint_location: str | None = None
    output_mode: str = "update"
    trigger: dict[str, Any] | None = None

    def write(self, df: DataFrame, query_name: str | None = None):
        if df.isStreaming:
            writer = df.writeStream.outputMode(self.output_mode).foreachBatch(self.fn)
            if self.checkpoint_location:
                writer = writer.option(
                    "checkpointLocation", self.checkpoint_location
                )
            if query_name:
                writer = writer.queryName(query_name)
            return _apply_trigger(writer, self.trigger).start()
        self.fn(df, -1)
        return None


@dataclass
class NoopSink:
    """Executes the plan, discards rows (benchmark / smoke sink)."""

    trigger: dict[str, Any] | None = None
    checkpoint_location: str | None = None

    def write(self, df: DataFrame, query_name: str | None = None):
        if df.isStreaming:
            writer = df.writeStream.format("noop")
            if self.checkpoint_location:
                writer = writer.option("checkpointLocation", self.checkpoint_location)
            if query_name:
                writer = writer.queryName(query_name)
            return _apply_trigger(writer, self.trigger).start()
        df.write.format("noop").mode("overwrite").save()
        return None
