"""BMP codec pins: 24-bit round-trip (padding + BGR + bottom-up),
RLE8 round-trip, and hand-crafted RLE8 streams exercising the escape
codes the encoder never emits (delta jumps, absolute mode with word
padding) plus top-down 24-bit storage."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.bmp import (
    _FILE_HDR,
    _INFO_HDR,
    BI_RGB,
    BI_RLE8,
    decode_bmp,
    decode_image_bmp,
    encode_bmp24,
    encode_bmp_rle8,
)


def _rgb_image(w, h, fn):
    return bytes(v for y in range(h) for x in range(w) for v in fn(x, y))


def test_bmp24_roundtrip_with_padding():
    # w=3 -> 9-byte rows padded to 12: exercises the stride
    w, h = 3, 4
    rgb = _rgb_image(w, h, lambda x, y: ((x * 50) % 256, (y * 60) % 256, (x + y) % 256))
    img = decode_bmp(encode_bmp24(w, h, rgb))
    assert (img["width"], img["height"], img["bpp"]) == (w, h, 24)
    flat = bytes(v for row in img["pixels"] for px in row for v in px)
    assert flat == rgb


def test_bmp24_roundtrip_no_padding():
    w, h = 4, 2  # 12-byte rows, no padding
    rgb = _rgb_image(w, h, lambda x, y: (x, y, 255 - x))
    img = decode_bmp(encode_bmp24(w, h, rgb))
    flat = bytes(v for row in img["pixels"] for px in row for v in px)
    assert flat == rgb


def test_bmp24_top_down_negative_height():
    # hand-build a top-down (negative height) 24-bit BMP: rows stored
    # in display order, decoder must NOT reverse them
    w, h = 2, 2
    # display: top row = red,green ; bottom row = blue,white
    rows_disk = bytes(
        (0, 0, 255, 0, 255, 0, 0, 0)  # BGR red, green + 2 pad bytes
    ) + bytes((255, 0, 0, 255, 255, 255, 0, 0))
    offset = _FILE_HDR.size + _INFO_HDR.size
    info = _INFO_HDR.pack(
        _INFO_HDR.size, w, -h, 1, 24, BI_RGB, len(rows_disk), 0, 0, 0, 0
    )
    data = _FILE_HDR.pack(b"BM", offset + len(rows_disk), 0, 0, offset) + info + rows_disk
    img = decode_bmp(data)
    assert img["pixels"][0] == [(255, 0, 0), (0, 255, 0)]
    assert img["pixels"][1] == [(0, 0, 255), (255, 255, 255)]


def test_rle8_roundtrip():
    w, h = 7, 5
    pal = bytes(v for i in range(16) for v in ((i * 13) % 256, (i * 29) % 256, (i * 7 + 3) % 256))
    idx = bytes((x * 3 + y * 5) % 16 for y in range(h) for x in range(w))
    img = decode_bmp(encode_bmp_rle8(w, h, idx, pal))
    assert (img["width"], img["height"], img["bpp"]) == (w, h, 8)
    for y in range(h):
        for x in range(w):
            i = (x * 3 + y * 5) % 16
            assert img["pixels"][y][x] == (
                (i * 13) % 256, (i * 29) % 256, (i * 7 + 3) % 256
            )


def _rle8_bmp(w, h, stream, n_colors=4):
    pal_rgb = bytes(v for i in range(n_colors) for v in (i * 10, i * 20, i * 30))
    pal = b"".join(
        bytes((pal_rgb[3 * i + 2], pal_rgb[3 * i + 1], pal_rgb[3 * i], 0))
        for i in range(n_colors)
    )
    offset = _FILE_HDR.size + _INFO_HDR.size + len(pal)
    info = _INFO_HDR.pack(
        _INFO_HDR.size, w, h, 1, 8, BI_RLE8, len(stream), 0, 0, n_colors, 0
    )
    return _FILE_HDR.pack(b"BM", offset + len(stream), 0, 0, offset) + info + pal + stream


def test_rle8_absolute_mode_word_padding():
    # bottom row: absolute run of 5 literals (odd -> 1 pad byte), then
    # EOL; top row: encoded run; EOF
    w, h = 5, 2
    stream = bytes(
        [0x00, 0x05, 1, 2, 3, 0, 1, 0x00,  # absolute x5 + pad
         0x00, 0x00,                        # end of line
         0x05, 0x02,                        # run of 5 value 2
         0x00, 0x01]                        # end of bitmap
    )
    img = decode_bmp(_rle8_bmp(w, h, stream))
    # storage is bottom-up: first painted row is the BOTTOM one
    assert [px[0] // 10 for px in img["pixels"][1]] == [1, 2, 3, 0, 1]
    assert [px[0] // 10 for px in img["pixels"][0]] == [2, 2, 2, 2, 2]


def test_rle8_delta_jump_leaves_skipped_pixels_zero():
    w, h = 4, 2
    stream = bytes(
        [0x02, 0x03,              # two pixels of 3 at bottom row
         0x00, 0x02, 0x01, 0x01,  # delta: right 1, up 1 -> x=3, y=1
         0x01, 0x01,              # one pixel of 1 at (3, top row)
         0x00, 0x01]              # end of bitmap
    )
    img = decode_bmp(_rle8_bmp(w, h, stream))
    assert [px[0] // 10 for px in img["pixels"][1]] == [3, 3, 0, 0]
    assert [px[0] // 10 for px in img["pixels"][0]] == [0, 0, 0, 1]


def test_decode_image_bmp_stats():
    w, h = 3, 2
    rgb = _rgb_image(w, h, lambda x, y: (10 * x, 5, 7))
    feats = decode_image_bmp(encode_bmp24(w, h, rgb))
    assert feats["n_px"] == 6
    assert feats["r_sum"] == 2 * (0 + 10 + 20)
    assert feats["g_sum"] == 30 and feats["b_sum"] == 42
    assert feats["r_min"] == 0 and feats["r_max"] == 20


def test_unsupported_raises():
    w, h = 2, 2
    data = bytearray(encode_bmp24(w, h, bytes(12)))
    # flip bpp to 16 in the info header
    struct.pack_into("<H", data, _FILE_HDR.size + 14, 16)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(data))
