"""Sources and sinks: Kafka (with security option parity), files,
rate, memory — batch and streaming forms of each where Spark supports
them (SURVEY.md §2B scans/sources/sinks)."""

from local_stream_stack_spark.sources.kafka import (
    KafkaSecurityConfig,
    KafkaReader,
    KafkaWriter,
    build_security_options,
)
from local_stream_stack_spark.sources.files import FileSource, RateSource
from local_stream_stack_spark.sources.pyds import (
    DeterministicEventsSource,
    register as register_python_datasource,
)
from local_stream_stack_spark.sources.sinks import (
    ConsoleSink,
    MemorySink,
    ParquetSink,
    ForeachBatchSink,
    NoopSink,
)

__all__ = [
    "DeterministicEventsSource",
    "register_python_datasource",
    "KafkaSecurityConfig",
    "KafkaReader",
    "KafkaWriter",
    "build_security_options",
    "FileSource",
    "RateSource",
    "ConsoleSink",
    "MemorySink",
    "ParquetSink",
    "ForeachBatchSink",
    "NoopSink",
]
