"""Baseline-JPEG codec pins (operators/jpeg.py) — the test depth
test_png.py set with its Paeth spec transcription: canonical Huffman
construction against the T.81 Annex K tables, the IDCT against an
independent float reference, exactness of constant-block streams,
bounded error on random images, and explicit format guards."""

from __future__ import annotations

import numpy as np
import pytest

from local_stream_stack_spark.operators.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    canonical_codes,
    decode_image_jpeg,
    decode_jpeg,
    encode_jpeg,
    fdct2,
    idct2,
)


def test_canonical_huffman_matches_annex_k():
    """T.81 Annex K.3.1: the luminance DC table's canonical codes are
    fully determined by BITS/HUFFVAL; spot-pin the documented
    assignments (category 0 -> '00' (2 bits), category 1 -> '010',
    ..., category 11 -> 9 bits of 1s except LSB run)."""
    codes = canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[2] == (0b011, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)
    # prefix-free: no code is a prefix of a longer one
    items = sorted(codes.values(), key=lambda cl: cl[1])
    for i, (c1, l1) in enumerate(items):
        for c2, l2 in items[i + 1 :]:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1
    # AC table: EOB (0x00) and ZRL (0xF0) must exist
    ac = canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    assert ac[0x00] == (0b1010, 4)  # Annex K.3.2 EOB
    assert ac[0xF0] == (0b11111111001, 11)  # Annex K.3.2 ZRL


def test_idct_matches_float_reference():
    """A.3.3 IDCT: f(y,x) = 1/4 sum_u sum_v C(u)C(v) F(v_row=u?)...
    — pinned against the direct double-loop reference with rows =
    vertical frequency (the natural order the zigzag table implies)."""
    rng = np.random.RandomState(7)

    def ref_idct(F):
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):  # vertical frequency (rows)
                    for v in range(8):  # horizontal frequency (cols)
                        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                        cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                        s += (
                            cu * cv * F[u, v]
                            * np.cos((2 * y + 1) * u * np.pi / 16)
                            * np.cos((2 * x + 1) * v * np.pi / 16)
                        )
                out[y, x] = s / 4
        return out

    for _ in range(3):
        F = rng.randint(-200, 200, (8, 8)).astype(float)
        assert np.abs(idct2(F) - ref_idct(F)).max() < 1e-9
    # transform pair: idct(fdct(x)) == x to float precision
    X = rng.randint(0, 256, (8, 8)).astype(float)
    assert np.abs(idct2(fdct2(X)) - X).max() < 1e-9
    # DC scaling: a flat block of v has DC = 8*v and zero ACs
    flat = np.full((8, 8), 37.0)
    F = fdct2(flat)
    assert abs(F[0, 0] - 8 * 37) < 1e-9
    assert np.abs(F).sum() - abs(F[0, 0]) < 1e-9


def test_constant_block_streams_are_exact():
    """All-ones quant + constant 8x8 blocks => every AC is zero and
    the DC path is integral, so decode reproduces the pixels
    bit-for-bit — the property the oracle query relies on."""
    w, h = 24, 16
    px = bytes(
        (9 * 31 + (x // 8) * 7 + (y // 8) * 13) % 251
        for y in range(h)
        for x in range(w)
    )
    dec_w, dec_h, planes = decode_jpeg(encode_jpeg(w, h, [px]))
    assert (dec_w, dec_h) == (w, h)
    assert np.array_equal(
        planes[0], np.frombuffer(px, np.uint8).reshape(h, w)
    )


def test_420_color_constant_mcu_exact_and_stats():
    w, h = 48, 32
    Y = bytes(
        (5 * 31 + (x // 8) * 7 + (y // 8) * 13) % 251
        for y in range(h)
        for x in range(w)
    )
    Cb = bytes(
        (5 * 17 + (x // 16) * 5 + (y // 16) * 3) % 230 + 10
        for y in range(h)
        for x in range(w)
    )
    Cr = bytes(
        (5 * 23 + (x // 16) * 11 + (y // 16) * 19) % 240
        for y in range(h)
        for x in range(w)
    )
    data = encode_jpeg(w, h, [Y, Cb, Cr], subsampling="420")
    feats = decode_image_jpeg(data)
    assert (feats["width"], feats["height"], feats["channels"]) == (w, h, 3)
    for name, src in (("y", Y), ("cb", Cb), ("cr", Cr)):
        a = np.frombuffer(src, np.int64 if False else np.uint8).astype(int)
        assert feats[f"{name}_sum"] == int(a.sum()), name
    assert feats["y_min"] == min(Y) and feats["y_max"] == max(Y)


def test_random_roundtrip_bounded_error():
    """General path (nonzero ACs, ZRL runs, every Huffman size class
    reachable): with all-ones quant tables the only loss is the
    float DCT round-trip rounding, so |decoded - source| <= 2."""
    rng = np.random.RandomState(42)
    for w, h in ((24, 16), (8, 8)):
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        _, _, planes = decode_jpeg(encode_jpeg(w, h, [img.tobytes()]))
        err = np.abs(planes[0].astype(int) - img.astype(int)).max()
        assert err <= 2, err
    # smooth gradient (small ACs, long zero runs -> EOB/ZRL coverage)
    grad = np.fromfunction(
        lambda y, x: (x * 3 + y * 5) % 256, (16, 24)
    ).astype(np.uint8)
    _, _, planes = decode_jpeg(encode_jpeg(24, 16, [grad.tobytes()]))
    assert np.abs(planes[0].astype(int) - grad.astype(int)).max() <= 2


def test_format_guards():
    data = bytearray(encode_jpeg(16, 16, [bytes(256)]))
    # progressive: flip SOF0 (0xFFC0) to SOF2 (0xFFC2)
    i = bytes(data).find(b"\xff\xc0")
    prog = bytes(data[:i]) + b"\xff\xc2" + bytes(data[i + 2 :])
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError, match="payload"):
        decode_image_jpeg(b"\x89PNG\r\n\x1a\n")
    # truncation before SOS
    with pytest.raises((ValueError, IndexError, Exception)):
        decode_jpeg(bytes(data[:20]))
