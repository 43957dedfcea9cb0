"""FLAC container metadata codec pins (operators/flac.py): the
decoder is checked against HAND-ASSEMBLED spec streams (struct-packed
block chain, independent of our encoder), plus encoder roundtrips,
the 20/3/5/36-bit STREAMINFO packing, VORBIS_COMMENT framing, torn
streams, and the audio-decode capability boundary."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.flac import (
    decode_flac_audio,
    decode_flac_meta,
    encode_flac_meta,
)


def _hand_streaminfo(sr, ch, bps, total, block=1024):
    body = bytearray()
    body += struct.pack(">H", block) + struct.pack(">H", block)
    body += b"\x00\x00\x00" * 2
    packed = (
        (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    )
    body += struct.pack(">Q", packed)
    body += bytes(16)
    return bytes(body)


def test_hand_assembled_streaminfo():
    si = _hand_streaminfo(44100, 2, 16, 441000)
    raw = b"fLaC" + bytes([0x80, 0, 0, 34]) + si + b"\xAA" * 100
    m = decode_flac_meta(raw)
    assert m["valid"] == 1
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["bits_per_sample"] == 16
    assert m["total_samples"] == 441000
    assert m["duration_us"] == 10_000_000  # exactly 10 s
    assert m["block_size"] == 1024
    assert m["n_blocks"] == 1
    assert m["meta_bytes"] == 4 + 4 + 34
    assert m["audio_bytes"] == 100


def test_hand_assembled_block_chain_with_padding_and_comments():
    si = _hand_streaminfo(48000, 1, 24, 96000)
    vendor = b"x"
    vc = (
        struct.pack("<I", len(vendor)) + vendor
        + struct.pack("<I", 3)
        + b"".join(
            struct.pack("<I", 3) + b"a=b" for _ in range(3)
        )
    )
    raw = (
        b"fLaC"
        + bytes([0x00, 0, 0, 34]) + si
        + bytes([0x04, 0, 0, len(vc)]) + vc
        + bytes([0x81, 0, 0, 17]) + bytes(17)   # last: padding
        + b"\x55" * 9
    )
    m = decode_flac_meta(raw)
    assert m["valid"] == 1
    assert m["n_blocks"] == 3
    assert m["vorbis_comments"] == 3
    assert m["padding_bytes"] == 17
    assert m["channels"] == 1 and m["bits_per_sample"] == 24
    assert m["duration_us"] == 2_000_000
    assert m["audio_bytes"] == 9


def test_36bit_total_samples_and_20bit_rate_boundaries():
    total = (1 << 36) - 1
    sr = (1 << 20) - 1
    si = _hand_streaminfo(sr, 8, 32, total)
    raw = b"fLaC" + bytes([0x80, 0, 0, 34]) + si
    m = decode_flac_meta(raw)
    assert m["total_samples"] == total
    assert m["sample_rate"] == sr
    assert m["channels"] == 8 and m["bits_per_sample"] == 32


def test_bad_magic_and_torn_chain_rejected():
    assert decode_flac_meta(b"OggS" + bytes(64))["valid"] == 0
    si = _hand_streaminfo(44100, 2, 16, 1000)
    torn = b"fLaC" + bytes([0x80, 0, 0, 34]) + si[:20]  # truncated body
    assert decode_flac_meta(torn)["valid"] == 0
    assert decode_flac_meta(b"")["valid"] == 0


def test_encoder_roundtrip():
    raw = encode_flac_meta(
        32000, 2, 16, 320000, block_size=2048, padding=33,
        vorbis_comments=5, audio_bytes=77,
    )
    m = decode_flac_meta(raw)
    assert m["valid"] == 1
    assert m["sample_rate"] == 32000
    assert m["total_samples"] == 320000
    assert m["duration_us"] == 10_000_000
    assert m["block_size"] == 2048
    assert m["n_blocks"] == 3
    assert m["padding_bytes"] == 33
    assert m["vorbis_comments"] == 5
    assert m["audio_bytes"] == 77
    assert m["n_bytes"] == m["meta_bytes"] + 77


def test_audio_decode_is_a_capability_boundary():
    with pytest.raises(NotImplementedError):
        decode_flac_audio(b"fLaC")
