"""AU / G.711 codec pins: the µ-law and A-law expansions against
known reference values, compress→expand round-trips, header framing
with annotations, PCM16 path, and guards."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.au import (
    alaw_expand,
    decode_au,
    encode_au,
    mulaw_compress,
    mulaw_expand,
)


def test_mulaw_reference_values():
    # canonical G.711 pins: 0xFF -> 0 (quiet), 0x7F -> -0? sign path,
    # 0x00 -> most-negative segment
    assert mulaw_expand(0xFF) == 0
    assert mulaw_expand(0x7F) == 0
    assert mulaw_expand(0x00) == -32124
    assert mulaw_expand(0x80) == 32124
    # a mid byte, hand-computed: byte 0x9A -> u=0x65: sign 0,
    # exp 6, mant 5 -> ((5*8+132)<<6)-132 = 10876
    assert mulaw_expand(0x9A) == 10876


def test_alaw_reference_values():
    # A-law: byte 0x55 -> a=0x00 -> exp 0, mant 0 -> +8? sign bit 0
    # means NEGATIVE magnitude per our sign convention (a&0x80 clear)
    assert alaw_expand(0xD5) == 8      # a=0x80: sign set -> positive 8
    assert alaw_expand(0x55) == -8
    # byte 0x2A -> a=0x7F: exp 7, mant 15 -> ((15<<4)+0x108)<<6 = 32256
    assert alaw_expand(0x2A) == -32256
    assert alaw_expand(0xAA) == 32256


def test_mulaw_compress_expand_roundtrip_monotone():
    # compress->expand must be idempotent on the quantized grid and
    # monotone in the input
    prev = None
    for s in range(-32124, 32125, 387):
        b = mulaw_compress(s)
        e = mulaw_expand(b)
        # value-level fixed point (±0 share magnitude 0 across the
        # 0x7F/0xFF byte pair, so byte equality is too strict there)
        assert mulaw_expand(mulaw_compress(e)) == e
        if prev is not None:
            assert e >= prev
        prev = e


def test_au_header_annotation_and_pcm16():
    pcm = [0, 1000, -1000, 32767, -32768]
    body = struct.pack(">5h", *pcm)
    data = encode_au(body, encoding=3, sample_rate=16000,
                     channels=2, annotation=b"meta\x00\x00")
    out = decode_au(data)
    assert out["encoding"] == 3 and out["sample_rate"] == 16000
    assert out["channels"] == 2 and out["n_samples"] == 5
    assert out["pcm_sum"] == sum(pcm)
    assert out["pcm_min"] == -32768 and out["pcm_max"] == 32767


def test_au_mulaw_body_stats():
    body = bytes(range(256))
    out = decode_au(encode_au(body, encoding=1))
    assert out["n_samples"] == 256
    # µ-law is symmetric: bytes 0..127 are the negatives of 128..255
    assert out["pcm_sum"] == 0
    assert out["pcm_min"] == -32124 and out["pcm_max"] == 32124
    assert out["abs_sum"] == 2 * sum(
        mulaw_expand(b) for b in range(128, 256)
    )


def test_guards():
    with pytest.raises(ValueError):
        decode_au(b"nope")
    with pytest.raises(ValueError):
        decode_au(encode_au(b"\x00\x01\x02", encoding=9))  # unknown enc
    # declared size larger than body
    hdr = b".snd" + struct.pack(">IIIII", 24, 99, 1, 8000, 1)
    with pytest.raises(ValueError):
        decode_au(hdr + b"\x00\x01")
    # odd PCM16 body
    with pytest.raises(ValueError):
        decode_au(encode_au(b"\x00\x01\x02", encoding=3))
