"""QOI codec pins: hand-assembled byte streams for every op (so the
decoder is checked against the SPEC, not just against our encoder),
encoder round-trips, and format guards."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.qoi import (
    decode_qoi,
    encode_qoi,
)


def _hdr(w, h, ch=4):
    return b"qoif" + struct.pack(">IIBB", w, h, ch, 0)


_END = b"\x00" * 7 + b"\x01"


def test_decode_hand_assembled_rgb_and_run():
    # 4x1: literal RGB (10,20,30), then RUN of 3
    data = _hdr(4, 1) + bytes((0xFE, 10, 20, 30)) + bytes((0xC0 | 2,)) + _END
    out = decode_qoi(data)
    assert out["n_px"] == 4
    assert out["pixels"] == bytes((10, 20, 30, 255)) * 4
    assert out["r_sum"] == 40 and out["g_sum"] == 80 and out["b_sum"] == 120


def test_decode_hand_assembled_diff_wraps():
    # pixel1 = RGB(0,0,0) literal; pixel2 = DIFF(-2,-2,-2) -> wraps to 254
    data = (
        _hdr(2, 1)
        + bytes((0xFE, 0, 0, 0))
        + bytes((0x40 | (0 << 4) | (0 << 2) | 0,))
        + _END
    )
    out = decode_qoi(data)
    assert out["pixels"][4:8] == bytes((254, 254, 254, 255))


def test_decode_hand_assembled_luma():
    # pixel1 = RGB(100,100,100); pixel2 = LUMA dg=+10, dr-dg=-3, db-dg=+5
    data = (
        _hdr(2, 1)
        + bytes((0xFE, 100, 100, 100))
        + bytes((0x80 | (10 + 32), ((-3 + 8) << 4) | (5 + 8)))
        + _END
    )
    out = decode_qoi(data)
    assert out["pixels"][4:8] == bytes((107, 110, 115, 255))


def test_decode_hand_assembled_index_reuse():
    # p1 = RGB(1,2,3); p2 = RGB(200,201,202); p3 = INDEX back to p1
    h1 = (1 * 3 + 2 * 5 + 3 * 7 + 255 * 11) % 64
    data = (
        _hdr(3, 1)
        + bytes((0xFE, 1, 2, 3))
        + bytes((0xFE, 200, 201, 202))
        + bytes((0x00 | h1,))
        + _END
    )
    out = decode_qoi(data)
    assert out["pixels"][8:12] == bytes((1, 2, 3, 255))


def test_decode_hand_assembled_rgba():
    data = _hdr(1, 1) + bytes((0xFF, 9, 8, 7, 128)) + _END
    out = decode_qoi(data)
    assert out["pixels"] == bytes((9, 8, 7, 128))
    assert out["a_sum"] == 128


def test_roundtrip_patterned_rgb():
    w, h = 13, 7  # runs, diffs, luma jumps, literals all occur
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (
            (5 + 2 * (x // 2) + 3 * y) % 256,
            (5 + 2 * (x // 2) + 3 * y + x % 3) % 256,
            (7 * y + 3) % 256,
        )
    )
    enc = encode_qoi(w, h, rgb, channels=3)
    out = decode_qoi(enc)
    assert out["width"] == w and out["height"] == h
    got_rgb = bytes(
        out["pixels"][i] for i in range(len(out["pixels"])) if i % 4 != 3
    )
    assert got_rgb == rgb


def test_roundtrip_rgba_and_long_runs():
    w, h = 70, 2  # forces a 62-run split + RGBA alpha path
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes((40, 50, 60, 255 if x < 65 else 17))
    enc = encode_qoi(w, h, bytes(px), channels=4)
    out = decode_qoi(enc)
    assert out["pixels"] == bytes(px)


def test_roundtrip_uses_compact_ops():
    # a run-heavy image must compress well below literal encoding
    w, h = 32, 32
    rgb = bytes((1, 2, 3)) * (w * h)
    enc = encode_qoi(w, h, rgb, channels=3)
    assert len(enc) < w * h  # literals would be 4096+ bytes


def test_guards():
    with pytest.raises(ValueError):
        decode_qoi(b"nope")
    with pytest.raises(ValueError):
        decode_qoi(_hdr(1, 1) + bytes((0xFE, 1, 2, 3)) + b"\x00" * 8)
    with pytest.raises(ValueError):
        encode_qoi(2, 2, b"\x00" * 5, channels=3)
    # truncated body: header claims 2 px, stream provides 1
    with pytest.raises(ValueError):
        decode_qoi(_hdr(2, 1) + bytes((0xFE, 1, 2, 3)) + _END)


def test_truncated_operands_raise_not_decode_end_marker():
    # ADVICE r10: multi-byte operands must not read into the 8-byte
    # end marker. A trailing bare OP_RGB tag would otherwise decode
    # the marker's zeros as pixel (0,0,0,255).
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(_hdr(1, 1) + bytes((0xFE,)) + _END)
    # OP_RGB with only 2 of 3 operand bytes present
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(_hdr(1, 1) + bytes((0xFE, 1, 2)) + _END)
    # bare OP_RGBA tag
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(_hdr(1, 1) + bytes((0xFF,)) + _END)
    # OP_LUMA missing its second byte
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(_hdr(2, 1) + bytes((0xFE, 1, 2, 3, 0x80 | 42)) + _END)
    # trailing garbage after the last pixel must raise, not pass
    with pytest.raises(ValueError, match="trailing"):
        decode_qoi(_hdr(1, 1) + bytes((0xFE, 1, 2, 3, 0x55)) + _END)
