"""Kafka connector option-map tests.

No broker in this environment, so — exactly like the reference's own
inline asserts (`kafka_connector.py:393-441`) — the tested surface is
the option map the connectors would hand to Spark.
"""

from __future__ import annotations

import pytest

from local_stream_stack_spark.sources.kafka import (
    KafkaConfigError,
    KafkaReader,
    KafkaSecurityConfig,
    KafkaWriter,
    build_security_options,
)


def test_plaintext_adds_no_security_options():
    assert build_security_options(KafkaSecurityConfig()) == {}


def test_sasl_ssl_scram512(monkeypatch):
    monkeypatch.setenv("KAFKA_ADMIN_PASSWORD", "s3cret")
    sec = KafkaSecurityConfig(
        protocol="SASL_SSL",
        sasl_mechanism="SCRAM-SHA-512",
        username="admin",
        password_env="KAFKA_ADMIN_PASSWORD",
        truststore_location="/tls/trust.p12",
        truststore_password_env="KAFKA_ADMIN_PASSWORD",
        ssl_endpoint_identification_algorithm="",
    )
    opts = build_security_options(sec)
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    jaas = opts["kafka.sasl.jaas.config"]
    assert "ScramLoginModule required" in jaas
    assert 'username="admin"' in jaas and 'password="s3cret"' in jaas
    assert opts["kafka.ssl.truststore.location"] == "/tls/trust.p12"
    assert opts["kafka.ssl.truststore.password"] == "s3cret"
    assert opts["kafka.ssl.endpoint.identification.algorithm"] == ""


def test_sasl_plain_uses_plain_login_module(monkeypatch):
    monkeypatch.setenv("KPW", "pw")
    opts = build_security_options(
        KafkaSecurityConfig(
            protocol="SASL_PLAINTEXT",
            sasl_mechanism="PLAIN",
            username="u",
            password_env="KPW",
        )
    )
    assert "PlainLoginModule required" in opts["kafka.sasl.jaas.config"]
    assert "kafka.ssl.truststore.location" not in opts


def test_missing_password_env_raises(monkeypatch):
    monkeypatch.delenv("NOPE", raising=False)
    with pytest.raises(KafkaConfigError, match="NOPE"):
        build_security_options(
            KafkaSecurityConfig(
                protocol="SASL_PLAINTEXT", username="u", password_env="NOPE"
            )
        )


def test_unsupported_protocol_rejected():
    with pytest.raises(KafkaConfigError, match="unsupported security protocol"):
        build_security_options(KafkaSecurityConfig(protocol="KERBEROS"))


def test_reader_validation_and_options():
    with pytest.raises(KafkaConfigError, match="topic"):
        KafkaReader(bootstrap_servers="b:9092", topic="")
    r = KafkaReader(bootstrap_servers="b:9092", topic="t-in")
    opts = r.options()
    assert opts["subscribe"] == "t-in"
    assert opts["startingOffsets"] == "latest"
    # batch mode defaults to a bounded earliest..end replay
    bopts = r.options(batch=True, ending_offsets="latest")
    assert bopts["startingOffsets"] == "earliest"
    assert bopts["endingOffsets"] == "latest"


def test_writer_requires_checkpoint_and_value_column(spark):
    with pytest.raises(KafkaConfigError, match="checkpoint"):
        KafkaWriter(bootstrap_servers="b:9092", topic="t", checkpoint_location="")
    w = KafkaWriter(
        bootstrap_servers="b:9092", topic="t-out", checkpoint_location="/tmp/cp"
    )
    assert w.options()["topic"] == "t-out"
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(KafkaConfigError, match="value"):
        w.validate_frame(df)
    w.validate_frame(df.selectExpr("CAST(x AS STRING) AS value"))
