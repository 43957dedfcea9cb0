"""TGA codec pins: hand-assembled byte streams for every supported
shape (so the decoder is checked against the SPEC, not just against
our encoder), encoder round-trips, and format guards."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.tga import (
    decode_tga,
    encode_tga24,
    encode_tga_rle24,
)


def _hdr(img_type, w, h, depth=24, desc=0, cmap=(0, 0, 0, 0)):
    cmap_type, first, length, bits = cmap
    return struct.pack(
        "<BBBHHBHHHHBB",
        0, cmap_type, img_type, first, length, bits, 0, 0, w, h,
        depth, desc,
    )


def test_decode_hand_assembled_type2_bottom_origin():
    # 2x2 bottom-origin: file rows are (bottom row first), BGR
    # wanted top-down RGB rows: [(1,2,3),(4,5,6)] / [(7,8,9),(10,11,12)]
    data = _hdr(2, 2, 2) + bytes(
        (9, 8, 7, 12, 11, 10,   # bottom row (y=1)
         3, 2, 1, 6, 5, 4)      # top row (y=0)
    )
    out = decode_tga(data)
    assert out["n_px"] == 4
    assert out["pixels"] == bytes(
        (1, 2, 3, 255, 4, 5, 6, 255, 7, 8, 9, 255, 10, 11, 12, 255)
    )


def test_decode_hand_assembled_type2_top_origin_and_alpha():
    # 1x2 top-origin 32-bit: BGRA in file order
    data = _hdr(2, 1, 2, depth=32, desc=0x20) + bytes(
        (3, 2, 1, 40, 6, 5, 4, 80)
    )
    out = decode_tga(data)
    assert out["pixels"] == bytes((1, 2, 3, 40, 4, 5, 6, 80))
    assert out["a_sum"] == 120


def test_decode_hand_assembled_rle_packets():
    # 4x1 top-origin type 10: RLE packet of 3 x (r=5,g=6,b=7) then a
    # raw packet of 1 x (1,2,3)
    data = _hdr(10, 4, 1, desc=0x20) + bytes(
        (0x80 | 2, 7, 6, 5, 0x00, 3, 2, 1)
    )
    out = decode_tga(data)
    assert out["pixels"] == bytes(
        (5, 6, 7, 255) * 3 + (1, 2, 3, 255)
    )


def test_decode_hand_assembled_color_mapped_type1():
    # 3x1 top-origin 8-bit indices into a 24-bit map with first=2
    cmap_bytes = bytes((30, 20, 10, 60, 50, 40))  # entries 2 and 3 (BGR)
    data = (
        _hdr(1, 3, 1, depth=8, desc=0x20, cmap=(1, 2, 2, 24))
        + cmap_bytes
        + bytes((2, 3, 2))
    )
    out = decode_tga(data)
    assert out["pixels"] == bytes(
        (10, 20, 30, 255, 40, 50, 60, 255, 10, 20, 30, 255)
    )


def test_roundtrip_type2_and_rle_both_origins():
    w, h = 9, 5
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((3 * x + 7 * y) % 256, (5 * x) % 256, (11 * y + 2) % 256)
    )
    for top in (False, True):
        for enc in (encode_tga24, encode_tga_rle24):
            out = decode_tga(enc(w, h, rgb, top_origin=top))
            got = bytes(
                out["pixels"][i]
                for i in range(len(out["pixels"]))
                if i % 4 != 3
            )
            assert got == rgb, (enc.__name__, top)


def test_rle_compresses_runs():
    w, h = 32, 4
    rgb = bytes((9, 8, 7)) * (w * h)
    enc = encode_tga_rle24(w, h, rgb)
    assert len(enc) < 18 + w * h  # literals would be 3*128 per row


def test_guards():
    with pytest.raises(ValueError):
        decode_tga(b"short")
    with pytest.raises(ValueError):
        decode_tga(_hdr(3, 1, 1))  # grayscale unsupported
    # truncated pixel data
    with pytest.raises(ValueError):
        decode_tga(_hdr(2, 2, 1) + bytes((1, 2, 3)))
    # RLE overrun past image end
    with pytest.raises(ValueError):
        decode_tga(_hdr(10, 2, 1, desc=0x20) + bytes((0x80 | 3, 1, 1, 1)))
    # palette index out of range
    with pytest.raises(ValueError):
        decode_tga(
            _hdr(1, 1, 1, depth=8, desc=0x20, cmap=(1, 0, 1, 24))
            + bytes((0, 0, 0))
            + bytes((5,))
        )
