"""Multimodal column plumbing: binary payloads + mapInPandas feature
extraction (decode itself is a deterministic stub — codecs not in
this container)."""

from __future__ import annotations

import hashlib

import pytest

from local_stream_stack_spark.operators.multimodal import (
    attach_binary_payload,
    decode_stub,
    extract_features,
)


def test_attach_and_extract(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    mm = attach_binary_payload(docs, text_col="text", id_col="doc_id")
    assert [f.dataType.simpleString() for f in mm.schema.fields] == [
        "bigint",
        "binary",
        "map<string,string>",
    ]
    feats = extract_features(mm)
    rows = feats.collect()
    assert len(rows) == 20
    originals = {r.doc_id: r.text for r in docs.collect()}
    for r in rows:
        raw = originals[r.id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.checksum == hashlib.md5(raw).hexdigest()
        assert r.modality == "image"
        assert r.width > 0 and r.height > 0 and r.duration_ms == 0


def test_decode_stub_unknown_modality():
    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "hologram")


def test_feature_extraction_is_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    mm = attach_binary_payload(docs, text_col="text", id_col="doc_id")
    a = {r.id: (r.checksum, r.width, r.height) for r in extract_features(mm).collect()}
    b = {r.id: (r.checksum, r.width, r.height) for r in extract_features(mm).collect()}
    assert a == b
