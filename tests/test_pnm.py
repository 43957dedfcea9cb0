"""netpbm codec pins: hand-assembled streams for the tokenizer
(comments mid-header and mid-body, ragged whitespace, P1 run-together
bits), packed P4 rows, 16-bit P5/P6 maxval scaling, round-trips for
all six kinds, and guards."""

from __future__ import annotations

import pytest

from local_stream_stack_spark.operators.pnm import (
    decode_pnm,
    encode_pnm,
)


def test_decode_hand_assembled_p2_with_comments():
    data = b"P2 # c1\n # c2\n 3 1\n# c3\n255\n0 128 # tail\n 255\n"
    out = decode_pnm(data)
    assert (out["width"], out["height"], out["maxval"]) == (3, 1, 255)
    assert out["pixels"][0::4] == bytes((0, 128, 255))


def test_decode_hand_assembled_p1_run_together_bits():
    data = b"P1\n4 2\n1010\n0111\n"
    out = decode_pnm(data)
    # 1 = black (0), 0 = white (255)
    assert out["pixels"][0::4] == bytes(
        (0, 255, 0, 255, 255, 0, 0, 0)
    )


def test_decode_hand_assembled_p4_packed_rows():
    # 10x1: bits 1100000001 -> bytes 0xC0, 0x40 (second byte pads)
    data = b"P4\n10 1\n" + bytes((0xC0, 0x40))
    out = decode_pnm(data)
    assert out["pixels"][0::4] == bytes(
        (0, 0, 255, 255, 255, 255, 255, 255, 255, 0)
    )


def test_decode_hand_assembled_p6_16bit_maxval():
    # 1x1 RGB maxval 1000: samples 0, 500, 1000 -> 0, 128, 255
    data = b"P6\n1 1\n1000\n" + bytes((0, 0, 0x01, 0xF4, 0x03, 0xE8))
    out = decode_pnm(data)
    assert out["pixels"] == bytes((0, 128, 255, 255))


def test_roundtrip_all_kinds():
    w, h = 5, 3
    bits = [(x + y) % 2 for y in range(h) for x in range(w)]
    grays = [(7 * x + 11 * y) % 256 for y in range(h) for x in range(w)]
    rgb = [
        v
        for y in range(h)
        for x in range(w)
        for v in ((3 * x) % 256, (5 * y) % 256, (x * y + 9) % 256)
    ]
    for kind, samples, maxval in (
        ("P1", bits, 1),
        ("P4", bits, 1),
        ("P2", grays, 255),
        ("P5", grays, 255),
        ("P3", rgb, 255),
        ("P6", rgb, 255),
    ):
        out = decode_pnm(encode_pnm(kind, w, h, samples, maxval))
        assert out["n_px"] == w * h, kind
        if kind in ("P1", "P4"):
            want = bytes(0 if b else 255 for b in bits)
            assert out["pixels"][0::4] == want, kind
        elif kind in ("P2", "P5"):
            assert out["pixels"][0::4] == bytes(grays), kind
        else:
            assert [
                out["pixels"][i]
                for i in range(len(out["pixels"]))
                if i % 4 != 3
            ] == rgb, kind


def test_roundtrip_16bit_scaling_exact():
    w, h = 4, 2
    maxval = 4095
    grays = [(x * 911 + y * 2048) % (maxval + 1) for y in range(h) for x in range(w)]
    out = decode_pnm(encode_pnm("P5", w, h, grays, maxval))
    want = bytes((v * 255 + maxval // 2) // maxval for v in grays)
    assert out["pixels"][0::4] == want


def test_guards():
    with pytest.raises(ValueError):
        decode_pnm(b"P7\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_pnm(b"P2\n2 1\n255\n10")  # truncated samples
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n2 1\n255\n\x00")  # truncated binary body
    with pytest.raises(ValueError):
        decode_pnm(b"P2\n1 1\n10\n99\n")  # sample exceeds maxval
    with pytest.raises(ValueError):
        decode_pnm(b"P2\n1 x\n255\n0\n")  # non-integer header token
