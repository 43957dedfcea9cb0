"""Declarative pipeline: config -> source -> transform chain -> sink.

Re-expresses the reference's StreamingPipeline
(`/root/reference/pyspark_stream/pipeline/streaming_pipeline.py:13-238`)
Spark-first, with two deliberate upgrades:

1. **Batch/stream symmetry.** The same pipeline config runs as a
   streaming query or a bounded batch replay (``streaming: false``),
   because every transform is a lazy ``DataFrame -> DataFrame``; the
   reference is streaming-only with a kafka-only source/sink whitelist
   (`streaming_pipeline.py:65-71`, `:85-91`).
2. **Explicit registry over importlib.** Named transforms come from
   `operators/registry.py`; dotted paths still work for parity with
   the reference's dynamic loading (`streaming_pipeline.py:122-123`).

Preserved semantics:
- staged ``build()`` then ``run()`` so config errors surface before
  execution (`streaming_pipeline.py:145-170`)
- ordered fold of transforms over the source frame; a transform
  returning ``None`` aborts the pipeline (`streaming_pipeline.py:195-200`)
- everything stays one lazy plan until the sink starts — Catalyst
  optimizes across transform boundaries (`streaming_pipeline.py:193-203`)
- ``stop()`` halts this pipeline's active query; ``stop_all`` mirrors
  the reference's stop-all-active (`streaming_pipeline.py:229-236`)
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from local_stream_stack_spark.config import (
    ConfigError,
    PipelineConfig,
    load_pipeline_config,
    parse_pipeline_config,
)
from local_stream_stack_spark.operators.registry import Transform, resolve_transform
from local_stream_stack_spark.schemas import get_schema
from local_stream_stack_spark.sources.files import FileSource, RateSource
from local_stream_stack_spark.sources.kafka import (
    KafkaReader,
    KafkaSecurityConfig,
    KafkaWriter,
)
from local_stream_stack_spark.sources.sinks import (
    ConsoleSink,
    MemorySink,
    NoopSink,
    ParquetSink,
)

logger = logging.getLogger(__name__)


def _security_from_options(options: dict[str, Any]) -> KafkaSecurityConfig:
    sec = options.get("security", {}) or {}
    return KafkaSecurityConfig(
        protocol=sec.get("protocol", "PLAINTEXT"),
        sasl_mechanism=sec.get("sasl_mechanism", "SCRAM-SHA-512"),
        username=sec.get("username"),
        password_env=sec.get("password_env"),
        truststore_location=sec.get("truststore_location"),
        truststore_password_env=sec.get("truststore_password_env"),
        keystore_location=sec.get("keystore_location"),
        keystore_password_env=sec.get("keystore_password_env"),
        ssl_endpoint_identification_algorithm=sec.get(
            "ssl_endpoint_identification_algorithm"
        ),
    )


class Pipeline:
    """One configured source -> transforms -> sink flow."""

    def __init__(self, spark: SparkSession, config: PipelineConfig | dict | str):
        self.spark = spark
        if isinstance(config, str):
            config = load_pipeline_config(config)
        elif isinstance(config, dict):
            config = parse_pipeline_config(config)
        self.config: PipelineConfig = config
        self._reader = None
        self._transforms: list[tuple[str, Transform]] = []
        self._sink = None
        self._query = None
        self._built = False

    # -- build ---------------------------------------------------------

    def build(self) -> "Pipeline":
        """Validate config and construct reader/transforms/sink
        (reference `build()`, `streaming_pipeline.py:145-170`)."""
        self._reader = self._create_reader()
        self._transforms = [
            (p.name, resolve_transform(p.name, p.params))
            for p in self.config.processors
        ]
        self._sink = self._create_sink()
        self._built = True
        logger.info(
            "pipeline %s built: source=%s transforms=%s sink=%s",
            self.config.name,
            self.config.source.type,
            [n for n, _ in self._transforms],
            self.config.sink.type,
        )
        return self

    def _create_reader(self):
        src = self.config.source
        if src.type == "kafka":
            opts = src.options
            return KafkaReader(
                bootstrap_servers=opts.get("bootstrap_servers", ""),
                topic=opts.get("topic", ""),
                security=_security_from_options(opts),
                starting_offsets=opts.get("starting_offsets", "latest"),
                extra_options=opts.get("extra_options", {}) or {},
            )
        if src.type in ("parquet", "json", "csv", "orc"):
            schema = get_schema(src.schema) if src.schema else None
            if src.path is None:
                raise ConfigError(f"{src.type} source requires 'path'")
            return FileSource(
                path=src.path,
                format=src.type,
                schema=schema,
                options={k: str(v) for k, v in src.options.items()},
            )
        if src.type == "rate":
            return RateSource(
                rows_per_second=int(src.options.get("rows_per_second", 100))
            )
        raise ConfigError(f"unsupported source type {src.type!r}")

    def _create_sink(self):
        sk = self.config.sink
        if sk.type == "kafka":
            opts = sk.options
            return KafkaWriter(
                bootstrap_servers=opts.get("bootstrap_servers", ""),
                topic=opts.get("topic", ""),
                checkpoint_location=sk.checkpoint_location or "",
                security=_security_from_options(opts),
                extra_options=opts.get("extra_options", {}) or {},
            )
        if sk.type == "console":
            return ConsoleSink(output_mode=sk.output_mode, trigger=sk.trigger)
        if sk.type == "memory":
            return MemorySink(output_mode=sk.output_mode, trigger=sk.trigger)
        if sk.type == "parquet":
            if sk.path is None:
                raise ConfigError("parquet sink requires 'path'")
            return ParquetSink(
                path=sk.path,
                checkpoint_location=sk.checkpoint_location,
                partition_by=list(sk.options.get("partition_by", []) or []),
                trigger=sk.trigger,
            )
        if sk.type == "noop":
            return NoopSink(
                trigger=sk.trigger, checkpoint_location=sk.checkpoint_location
            )
        raise ConfigError(f"unsupported sink type {sk.type!r}")

    # -- run -----------------------------------------------------------

    def dataframe(self) -> DataFrame:
        """Compose the full lazy plan (source + transform fold) without
        executing — the reference's pre-``write_stream`` state
        (`streaming_pipeline.py:186-203`). A transform returning None
        aborts (reference `:198-200`)."""
        if not self._built:
            self.build()
        src = self.config.source
        if src.streaming:
            df = self._reader.read_stream(self.spark)
        else:
            if not hasattr(self._reader, "read_batch"):
                raise ConfigError(
                    f"source type {src.type!r} has no batch mode"
                )
            df = self._reader.read_batch(self.spark)
        for name, fn in self._transforms:
            out = fn(df)
            if out is None:
                raise RuntimeError(
                    f"transform {name!r} returned None; aborting pipeline "
                    f"{self.config.name!r}"
                )
            df = out
        return df

    def run(self, await_termination: bool = False, timeout: float | None = None):
        """Execute: start the streaming query or run the batch write
        (reference `run()`, `streaming_pipeline.py:173-219`)."""
        df = self.dataframe()
        query_name = self.config.sink.query_name or self.config.name
        if isinstance(self._sink, KafkaWriter):
            self._query = self._sink.write_stream(df, query_name=query_name)
        else:
            self._query = self._sink.write(df, query_name=query_name)
        if self._query is not None and await_termination:
            if timeout is not None:
                self._query.awaitTermination(timeout)
            else:
                self._query.awaitTermination()
        return self._query

    def stop(self) -> None:
        if self._query is not None and getattr(self._query, "isActive", False):
            self._query.stop()
            self._query = None

    @staticmethod
    def stop_all(spark: SparkSession) -> int:
        """Stop every active streaming query on the session
        (reference `stop()`, `streaming_pipeline.py:229-236`)."""
        n = 0
        for q in spark.streams.active:
            q.stop()
            n += 1
        return n
