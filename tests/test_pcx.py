"""PCX codec pins: hand-assembled RLE streams (decoder vs the SPEC),
encoder round-trips for both layouts, and format guards."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.pcx import (
    decode_pcx,
    encode_pcx8,
    encode_pcx24,
)


def _hdr(w, h, planes, bpl):
    return struct.pack(
        "<BBBBHHHHHH48sBBHH58s",
        0x0A, 5, 1, 8, 0, 0, w - 1, h - 1, 72, 72,
        b"\x00" * 48, 0, planes, bpl, 1, b"\x00" * 58,
    )


def _vga(seed=0):
    return bytes(
        ((i * 3 + c * 7 + seed) % 256)
        for i in range(256)
        for c in range(3)
    )


def test_decode_hand_assembled_8bit_rle():
    # 3x2, bpl=4 (padded): rows of indices [1,1,1] and [2,0,2]
    pal = _vga()
    body = bytes(
        (0xC0 | 3, 1, 0xC0 | 1, 0,          # row 0: run 3x1 + pad 0
         2, 0, 2, 0)                        # row 1: literals + pad
    )
    data = _hdr(3, 2, 1, 4) + body + bytes((0x0C,)) + pal
    out = decode_pcx(data)
    assert out["n_px"] == 6
    want = []
    for idx in (1, 1, 1, 2, 0, 2):
        want += list(pal[idx * 3 : idx * 3 + 3]) + [255]
    assert out["pixels"] == bytes(want)


def test_decode_hand_assembled_24bit_planes():
    # 2x1, bpl=2: one scan line = R plane, G plane, B plane
    body = bytes((10, 11, 20, 21, 30, 31))
    data = _hdr(2, 1, 3, 2) + body
    out = decode_pcx(data)
    assert out["pixels"] == bytes((10, 20, 30, 255, 11, 21, 31, 255))


def test_decode_run_header_as_literal_guard():
    # a literal byte >= 0xC0 must be RLE-escaped; a run of 1 encodes it
    pal = _vga()
    body = bytes((0xC0 | 1, 0xC5, 0xC0 | 1, 0))  # index 0xC5 + pad
    data = _hdr(1, 1, 1, 2) + body + bytes((0x0C,)) + pal
    out = decode_pcx(data)
    assert out["pixels"][:3] == pal[0xC5 * 3 : 0xC5 * 3 + 3]


def test_roundtrip_8bit_and_24bit():
    w, h = 7, 5
    pal = _vga(seed=9)
    idx = bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
    out = decode_pcx(encode_pcx8(w, h, idx, pal))
    want = bytearray()
    for v in idx:
        want += pal[v * 3 : v * 3 + 3] + b"\xff"
    assert out["pixels"] == bytes(want)

    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 9 + y) % 256, (x + y * 13) % 256, (200 + x) % 256)
    )
    out = decode_pcx(encode_pcx24(w, h, rgb))
    got = bytes(
        out["pixels"][i] for i in range(len(out["pixels"])) if i % 4 != 3
    )
    assert got == rgb


def test_rle_compresses_runs():
    w, h = 30, 4
    idx = bytes(7 for _ in range(w * h))
    enc = encode_pcx8(w, h, idx, _vga())
    assert len(enc) < 128 + w * h + 769


def test_guards():
    with pytest.raises(ValueError):
        decode_pcx(b"nope")
    # missing VGA palette on an 8-bit stream
    with pytest.raises(ValueError):
        decode_pcx(_hdr(1, 1, 1, 2) + bytes((0, 0)))
    # truncated RLE body
    with pytest.raises(ValueError):
        decode_pcx(_hdr(4, 1, 3, 4) + bytes((0xC0 | 2, 5)))
    # run crossing the padded scan-line boundary
    pal = _vga()
    with pytest.raises(ValueError):
        decode_pcx(
            _hdr(1, 2, 1, 2) + bytes((0xC0 | 5, 1)) + bytes((0x0C,)) + pal
        )
