"""Baseline-TIFF codec pins (operators/tiff.py): roundtrips in both
byte orders, multi-strip assembly, a hand-assembled spec stream (so
the decoder is checked against the FORMAT, not our encoder), and the
capability boundaries."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.tiff import (
    decode_tiff,
    encode_tiff_gray8,
    encode_tiff_rgb8,
)


def _gray(w, h):
    return bytes((7 * x + 3 * y) % 256 for y in range(h) for x in range(w))


def _rgb(w, h):
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x + y) % 256, (2 * x) % 256, (5 * y + 1) % 256)
    )


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rps", [None, 1, 2])
def test_gray_roundtrip(big_endian, rps):
    w, h = 5, 4
    px = _gray(w, h)
    d = decode_tiff(
        encode_tiff_gray8(w, h, px, big_endian=big_endian, rows_per_strip=rps)
    )
    assert (d["width"], d["height"], d["spp"]) == (w, h, 1)
    assert d["n_px"] == w * h
    assert d["r_sum"] == sum(px)
    assert d["s_min"] == min(px) and d["s_max"] == max(px)
    if rps == 1:
        assert d["n_strips"] == h


@pytest.mark.parametrize("big_endian", [False, True])
def test_rgb_roundtrip_multistrip(big_endian):
    w, h = 4, 5
    px = _rgb(w, h)
    d = decode_tiff(
        encode_tiff_rgb8(w, h, px, big_endian=big_endian, rows_per_strip=2)
    )
    assert (d["width"], d["height"], d["spp"]) == (w, h, 3)
    assert d["n_strips"] == 3  # ceil(5/2)
    assert d["r_sum"] == sum(px[0::3])
    assert d["g_sum"] == sum(px[1::3])
    assert d["b_sum"] == sum(px[2::3])


def test_hand_assembled_little_endian_stream():
    """2x2 gray image assembled byte-by-byte from the TIFF 6.0 spec:
    header, one strip BEFORE the IFD, inline SHORT/LONG values."""
    pixels = bytes([10, 20, 30, 40])
    # header: II, 42, IFD at byte 12 (8 header + 4 pixel bytes)
    out = bytearray(b"II" + struct.pack("<HI", 42, 12))
    out += pixels
    entries = [
        (256, 3, 1, struct.pack("<HH", 2, 0)),       # width SHORT inline
        (257, 4, 1, struct.pack("<I", 2)),           # height LONG inline
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 1, struct.pack("<I", 8)),           # strip at byte 8
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 4, 1, struct.pack("<I", 2)),
        (279, 4, 1, struct.pack("<I", 4)),
    ]
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)
    d = decode_tiff(bytes(out))
    assert (d["width"], d["height"], d["n_px"]) == (2, 2, 4)
    assert d["r_sum"] == 100
    assert (d["s_min"], d["s_max"]) == (10, 40)


def test_capability_boundaries():
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + b"\x00" * 10)
    with pytest.raises(ValueError):
        decode_tiff(b"II" + struct.pack("<HI", 41, 8))
    # LZW compression is a real boundary -> NotImplementedError
    good = bytearray(encode_tiff_gray8(2, 2, bytes(4)))
    # flip the Compression entry's value (tag 259) to 5 (LZW)
    idx = good.find(struct.pack("<HHI", 259, 3, 1))
    assert idx > 0
    good[idx + 8: idx + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(good))


def test_truncated_strip_rejected():
    enc = bytearray(encode_tiff_gray8(3, 3, _gray(3, 3)))
    # corrupt the strip byte count (tag 279) to overrun the file
    idx = enc.find(struct.pack("<HHI", 279, 4, 1))
    assert idx > 0
    enc[idx + 8: idx + 12] = struct.pack("<I", 10_000)
    with pytest.raises(ValueError):
        decode_tiff(bytes(enc))
