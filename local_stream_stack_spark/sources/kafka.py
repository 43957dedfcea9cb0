"""Kafka source/sink with the reference's security semantics.

Behavior parity with `/root/reference/pyspark_stream/connectors/
kafka_connector.py` (studied, not copied):

- security protocols PLAINTEXT / SASL_PLAINTEXT / SASL_SSL / SSL with
  SCRAM-SHA-256/512 and PLAIN JAAS configs, passwords resolved from
  environment variables, truststore/keystore and endpoint-id algorithm
  options (`kafka_connector.py:56-148`)
- reader: subscribe to one topic, ``startingOffsets`` (default
  ``latest``), returns the raw Kafka-schema DataFrame
  (`kafka_connector.py:168-189`); batch mode supports
  ``endingOffsets`` for bounded replay (`sample_kafka_process.sh:145-161`)
- writer: requires an output topic and checkpoint location, expects a
  ``value`` column (optional ``key``), optional query name
  (`kafka_connector.py:204-254`)

There is no Kafka broker in the dev environment, so option-map
construction is the unit-tested surface (the reference does the same:
its ``__main__`` asserts option maps, `kafka_connector.py:393-441`).
The read/write methods are thin `readStream`/`writeStream` wrappers
that a cluster with brokers exercises unchanged.

Scale note: one Spark partition per Kafka partition; parallelism at
100 TB/day comes from topic partitioning, plus ``minPartitions`` to
oversplit hot partitions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class KafkaConfigError(ValueError):
    """Invalid Kafka connector configuration."""


@dataclass
class KafkaSecurityConfig:
    """Declarative security settings -> ``kafka.*`` option map."""

    protocol: str = "PLAINTEXT"  # PLAINTEXT | SASL_PLAINTEXT | SASL_SSL | SSL
    sasl_mechanism: str = "SCRAM-SHA-512"  # or SCRAM-SHA-256 | PLAIN
    username: str | None = None
    password_env: str | None = None  # env var holding the password
    truststore_location: str | None = None
    truststore_password_env: str | None = None
    keystore_location: str | None = None
    keystore_password_env: str | None = None
    ssl_endpoint_identification_algorithm: str | None = None  # "" disables

    def resolve_password(self, env_name: str | None) -> str:
        if not env_name:
            raise KafkaConfigError("password env var name not configured")
        val = os.environ.get(env_name)
        if val is None:
            raise KafkaConfigError(f"environment variable {env_name!r} is not set")
        return val


_SUPPORTED_PROTOCOLS = ("PLAINTEXT", "SASL_PLAINTEXT", "SASL_SSL", "SSL")
_SUPPORTED_MECHANISMS = ("SCRAM-SHA-256", "SCRAM-SHA-512", "PLAIN")


def build_security_options(sec: KafkaSecurityConfig) -> dict[str, str]:
    """Security config -> ``kafka.*`` reader/writer options.

    Mirrors the decision table of `kafka_connector.py:56-148`:
    PLAINTEXT adds nothing; SASL_* adds mechanism + JAAS (Scram or
    Plain login module per mechanism); *_SSL/SSL adds trust/keystore
    and endpoint-identification options when configured.
    """
    if sec.protocol not in _SUPPORTED_PROTOCOLS:
        raise KafkaConfigError(
            f"unsupported security protocol {sec.protocol!r}; "
            f"supported: {_SUPPORTED_PROTOCOLS}"
        )
    opts: dict[str, str] = {}
    if sec.protocol == "PLAINTEXT":
        return opts
    opts["kafka.security.protocol"] = sec.protocol

    if sec.protocol in ("SASL_PLAINTEXT", "SASL_SSL"):
        if sec.sasl_mechanism not in _SUPPORTED_MECHANISMS:
            raise KafkaConfigError(
                f"unsupported SASL mechanism {sec.sasl_mechanism!r}; "
                f"supported: {_SUPPORTED_MECHANISMS}"
            )
        if not sec.username:
            raise KafkaConfigError("SASL requires a username")
        password = sec.resolve_password(sec.password_env)
        login_module = (
            "org.apache.kafka.common.security.plain.PlainLoginModule"
            if sec.sasl_mechanism == "PLAIN"
            else "org.apache.kafka.common.security.scram.ScramLoginModule"
        )
        opts["kafka.sasl.mechanism"] = sec.sasl_mechanism
        opts["kafka.sasl.jaas.config"] = (
            f'{login_module} required username="{sec.username}" '
            f'password="{password}";'
        )

    if sec.protocol in ("SASL_SSL", "SSL"):
        if sec.truststore_location:
            opts["kafka.ssl.truststore.location"] = sec.truststore_location
            if sec.truststore_password_env:
                opts["kafka.ssl.truststore.password"] = sec.resolve_password(
                    sec.truststore_password_env
                )
        if sec.keystore_location:
            opts["kafka.ssl.keystore.location"] = sec.keystore_location
            if sec.keystore_password_env:
                opts["kafka.ssl.keystore.password"] = sec.resolve_password(
                    sec.keystore_password_env
                )
        if sec.ssl_endpoint_identification_algorithm is not None:
            opts["kafka.ssl.endpoint.identification.algorithm"] = (
                sec.ssl_endpoint_identification_algorithm
            )
    return opts


@dataclass
class KafkaReader:
    """Kafka source (stream + bounded batch)."""

    bootstrap_servers: str
    topic: str
    security: KafkaSecurityConfig = field(default_factory=KafkaSecurityConfig)
    starting_offsets: str = "latest"
    extra_options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.bootstrap_servers:
            raise KafkaConfigError("bootstrap_servers is required")
        if not self.topic:
            raise KafkaConfigError("input topic is required")

    def options(self, batch: bool = False, ending_offsets: str | None = None) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": (
                "earliest" if batch and self.starting_offsets == "latest" else self.starting_offsets
            ),
            **build_security_options(self.security),
            **self.extra_options,
        }
        if batch and ending_offsets:
            opts["endingOffsets"] = ending_offsets
        return opts

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """Streaming scan (reference `read_stream`, `kafka_connector.py:168-189`)."""
        return (
            spark.readStream.format("kafka").options(**self.options()).load()
        )

    def read_batch(
        self, spark: SparkSession, ending_offsets: str | None = None
    ) -> DataFrame:
        """Bounded replay (reference batch probe `sample_stream_job.py:19-32`
        + drain-from-offset semantics `sample_kafka_process.sh:145-161`)."""
        return (
            spark.read.format("kafka")
            .options(**self.options(batch=True, ending_offsets=ending_offsets))
            .load()
        )


@dataclass
class KafkaWriter:
    """Kafka sink: requires topic + checkpoint; expects a ``value``
    column (optional ``key``), as the reference enforces
    (`kafka_connector.py:204-254`, value contract `:234-244`)."""

    bootstrap_servers: str
    topic: str
    checkpoint_location: str
    security: KafkaSecurityConfig = field(default_factory=KafkaSecurityConfig)
    extra_options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.bootstrap_servers:
            raise KafkaConfigError("bootstrap_servers is required")
        if not self.topic:
            raise KafkaConfigError("output topic is required")
        if not self.checkpoint_location:
            raise KafkaConfigError(
                "checkpoint_location is required for the Kafka sink"
            )

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
            "checkpointLocation": self.checkpoint_location,
            **build_security_options(self.security),
            **self.extra_options,
        }

    @staticmethod
    def validate_frame(df: DataFrame) -> None:
        if "value" not in df.columns:
            raise KafkaConfigError(
                "Kafka sink requires a 'value' column "
                f"(got columns: {df.columns})"
            )

    def write_stream(self, df: DataFrame, query_name: str | None = None):
        self.validate_frame(df)
        writer = df.writeStream.format("kafka").options(**self.options())
        if query_name:
            writer = writer.queryName(query_name)
        return writer.start()
