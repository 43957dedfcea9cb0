"""Stdlib PNG codec (operators/png.py) — spec-vector and round-trip
pins. The round-trip alone could hide a symmetric misunderstanding
(encoder and decoder sharing the same wrong filter math cancels out),
so the suite also checks the Paeth predictor against an independent
transcription of the RFC 2083 §6.6 pseudocode, decodes a HAND-BUILT
filter-0 PNG whose bytes are constructed in-test from the spec, and
verifies real-dims extraction through the multimodal feature path."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from local_stream_stack_spark.operators.png import (
    PNG_MAGIC,
    decode_image,
    decode_png,
    encode_png,
)


def ref_paeth(a, b, c):
    # independent transcription of RFC 2083 6.6 pseudocode
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        Pr = a
    elif pb <= pc:
        Pr = b
    else:
        Pr = c
    return Pr


def test_paeth_matches_spec_reference():
    from local_stream_stack_spark.operators.png import _paeth

    for a in range(0, 256, 17):
        for b in range(0, 256, 19):
            for c in range(0, 256, 23):
                assert _paeth(a, b, c) == ref_paeth(a, b, c)


def _spec_png_filter0(width, height, pixels):
    """Build a grayscale PNG by hand per the spec: filter byte 0 on
    every scanline, single IDAT — no encoder code reused."""
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_handbuilt_spec_png():
    px = bytes((x * 3 + y * 5) % 256 for y in range(4) for x in range(6))
    w, h, ch, out = decode_png(_spec_png_filter0(6, 4, px))
    assert (w, h, ch) == (6, 4, 1)
    assert bytes(out) == px


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_all_filters(channels):
    # height >= 5 so the encoder's y % 5 cycle hits every filter type
    rng = random.Random(channels)
    w, h = 9, 7
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    ww, hh, ch, out = decode_png(encode_png(w, h, px, channels))
    assert (ww, hh, ch) == (w, h, channels)
    assert bytes(out) == px


def test_multi_idat_chunks():
    px = bytes(range(0, 48))
    data = encode_png(8, 6, px, 1)
    # split the single IDAT into two chunks byte-for-byte
    i = data.index(b"IDAT") - 4
    (ln,) = struct.unpack(">I", data[i : i + 4])
    body = data[i + 8 : i + 8 + ln]
    tail = data[i + 12 + ln :]
    half = ln // 2

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    split = (
        data[:i]
        + chunk(b"IDAT", body[:half])
        + chunk(b"IDAT", body[half:])
        + tail
    )
    w, h, ch, out = decode_png(split)
    assert (w, h, ch, bytes(out)) == (8, 6, 1, px)


def test_rejects_non_png_and_interlace():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png at all")
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # interlace=1
    data = (
        PNG_MAGIC
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError):
        decode_png(data)


def test_decode_image_stats():
    px = bytes([10, 20, 30, 40, 50, 60])
    d = decode_image(encode_png(3, 2, px, 1))
    assert d == {
        "width": 3,
        "height": 2,
        "channels": 1,
        "px_sum": 210,
        "px_min": 10,
        "px_max": 60,
    }


def test_extract_features_real_png_dims(spark):
    """The multimodal feature path must report REAL dimensions for PNG
    payloads (stub dims for PNG bytes would differ: stub width is
    16 + codepoint-sum % 64 of mojibake, not 5)."""
    from local_stream_stack_spark.operators.multimodal import extract_features

    payload = encode_png(5, 3, bytes(range(15)), 1)
    df = spark.createDataFrame(
        [(1, bytearray(payload), {"modality": "image"})],
        "id bigint, payload binary, meta map<string,string>",
    )
    row = extract_features(df).collect()[0]
    assert (row["width"], row["height"]) == (5, 3)
    assert row["n_bytes"] == len(payload)


# -- property pins (hypothesis) ---------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=21),
    h=st.integers(min_value=1, max_value=17),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_property(w, h, ch, seed):
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    ww, hh, cc, out = decode_png(encode_png(w, h, px, ch))
    assert (ww, hh, cc) == (w, h, ch)
    assert bytes(out) == px
