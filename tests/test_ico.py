"""ICO container codec pins: directory parsing, PNG and 32-bit DIB
members, AND-mask transparency, 0-means-256 sizing, and guards."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.ico import (
    _decode_dib_member,
    decode_ico,
    encode_ico,
)
from local_stream_stack_spark.operators.png import encode_png


def _rgba(w, h, f):
    return bytes(
        v for y in range(h) for x in range(w) for v in f(x, y)
    )


def test_roundtrip_png_and_dib_members():
    m1 = {
        "width": 5,
        "height": 4,
        "kind": "png",
        "rgba": _rgba(5, 4, lambda x, y: (x * 10, y * 20, 7, 255)),
    }
    m2 = {
        "width": 6,
        "height": 3,
        "kind": "dib",
        "rgba": _rgba(
            6, 3, lambda x, y: (x, y, x + y, 0 if (x + y) % 5 == 0 else 200)
        ),
    }
    out = decode_ico(encode_ico([m1, m2]))
    assert out["n_members"] == 2
    assert out["members"][0]["kind"] == "png"
    assert out["members"][1]["kind"] == "dib"
    assert out["members"][0]["rgba"] == m1["rgba"]
    assert out["members"][1]["rgba"] == m2["rgba"]
    assert out["n_px"] == 5 * 4 + 6 * 3


def test_dib_and_mask_forces_transparent():
    # encoder sets mask bits only for a==0; hand-set an extra mask bit
    # and confirm the decoder zeroes that pixel's alpha
    m = {
        "width": 9,  # stride padding: (9+7)//8 = 2 bytes -> pad 2
        "height": 2,
        "kind": "dib",
        "rgba": _rgba(9, 2, lambda x, y: (1, 2, 3, 255)),
    }
    ico = bytearray(encode_ico([m]))
    # member blob starts after ICONDIR(6) + 1 entry(16) = 22; DIB
    # header is 40 bytes; XOR bitmap is 9*4*2 = 72 bytes; first mask
    # row covers storage row 0 = image row 1 (bottom-up)
    mask_off = 22 + 40 + 72
    ico[mask_off] |= 0x80  # pixel x=0 of image row y=1
    out = decode_ico(bytes(ico))
    rgba = out["members"][0]["rgba"]
    assert rgba[(1 * 9 + 0) * 4 + 3] == 0      # masked pixel
    assert rgba[(0 * 9 + 0) * 4 + 3] == 255    # untouched pixel


def test_256_encoded_as_zero():
    m = {
        "width": 256,
        "height": 1,
        "kind": "dib",
        "rgba": _rgba(256, 1, lambda x, y: (x % 256, 0, 0, 255)),
    }
    ico = encode_ico([m])
    assert ico[6] == 0 and ico[7] == 1  # bWidth=0 means 256
    out = decode_ico(ico)
    assert out["members"][0]["width"] == 256


def test_grayscale_and_rgb_png_members_expand_to_rgba():
    gray = encode_png(3, 2, bytes(range(6)), channels=1)
    rgb = encode_png(2, 2, bytes(range(12)), channels=3)
    hdr = struct.pack("<HHH", 0, 1, 2)
    e1 = struct.pack("<BBBBHHII", 3, 2, 0, 0, 1, 32, len(gray), 6 + 32)
    e2 = struct.pack(
        "<BBBBHHII", 2, 2, 0, 0, 1, 32, len(rgb), 6 + 32 + len(gray)
    )
    out = decode_ico(hdr + e1 + e2 + gray + rgb)
    m1, m2 = out["members"]
    assert m1["rgba"][:4] == bytes((0, 0, 0, 255))
    assert m1["rgba"][4:8] == bytes((1, 1, 1, 255))
    assert m2["rgba"][:4] == bytes((0, 1, 2, 255))


def test_guards():
    with pytest.raises(ValueError):
        decode_ico(b"\x00\x00\x02\x00\x01\x00")  # type 2 = cursor
    with pytest.raises(ValueError):
        decode_ico(b"xx")
    # 24-bit DIB member -> explicit format guard
    info = struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, 0, 0, 0, 0, 0)
    hdr = struct.pack("<HHH", 0, 1, 1)
    ent = struct.pack("<BBBBHHII", 1, 1, 0, 0, 1, 24, len(info) + 8, 22)
    with pytest.raises(NotImplementedError):
        decode_ico(hdr + ent + info + b"\x00" * 8)
    # dims mismatch between ICONDIR and the member
    m = {
        "width": 4,
        "height": 4,
        "kind": "dib",
        "rgba": _rgba(4, 4, lambda x, y: (0, 0, 0, 255)),
    }
    ico = bytearray(encode_ico([m]))
    ico[6] = 5  # claim width 5
    with pytest.raises(ValueError):
        decode_ico(bytes(ico))


def test_decode_dib_member_guards():
    with pytest.raises(ValueError):
        _decode_dib_member(b"short")
    # odd (non-doubled) height
    info = struct.pack("<IiiHHIIiiII", 40, 1, 3, 1, 32, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        _decode_dib_member(info + b"\x00" * 64)
