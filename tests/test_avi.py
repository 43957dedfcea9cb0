"""Unit tests for the stdlib uncompressed-AVI codec (operators/avi.py)
— the real-bytes video slice of the multimodal path."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.avi import (
    decode_avi,
    decode_video,
    encode_avi,
)


def _frames(did: int):
    w, h, nf = 9 + did % 6, 5 + did % 4, 2 + did % 3
    return w, h, [
        bytes(
            (did * 7 + f * 31 + y * 13 + x * 5 + c * 3) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        for f in range(nf)
    ]


@pytest.mark.parametrize("did", range(12))
def test_roundtrip_varied_dims_and_strides(did):
    """Widths 9..14 cover every stride-padding remainder (w*3 % 4)."""
    w, h, frames = _frames(did)
    w2, h2, fps, dec = decode_avi(encode_avi(w, h, frames, fps=10))
    assert (w2, h2, fps) == (w, h, 10)
    assert dec == frames


def test_decode_video_stats():
    w, h, frames = _frames(3)
    v = decode_video(encode_avi(w, h, frames, fps=10))
    assert v["width"] == w and v["height"] == h
    assert v["n_frames"] == len(frames)
    assert v["duration_ms"] == len(frames) * 100
    f0 = frames[0]
    st = v["frames"][0]
    assert st["px_sum"] == sum(f0)
    assert st["px_weighted"] == sum(
        (i // 3 + 1) * (i % 3 + 1) * x for i, x in enumerate(f0)
    )


def test_top_down_negative_height():
    """Real encoders may write top-down DIBs (negative biHeight); the
    parser must honor the sign instead of double-flipping."""
    w, h, frames = _frames(1)
    enc = bytearray(encode_avi(w, h, frames, fps=10))
    # locate strf body: 40-byte BITMAPINFOHEADER; biHeight at +8
    i = bytes(enc).find(b"strf")
    assert i > 0
    body = i + 8
    (bw,) = struct.unpack("<i", enc[body + 4 : body + 8])
    assert bw == w
    enc[body + 8 : body + 12] = struct.pack("<i", -h)
    # frames were written bottom-up; a top-down reader sees each
    # frame vertically flipped
    _, h2, _, dec = decode_avi(bytes(enc))
    assert h2 == h
    stride = w * 3

    def flip(f):
        rows = [f[y * stride : (y + 1) * stride] for y in range(h)]
        return b"".join(reversed(rows))

    assert dec == [flip(f) for f in frames]


def test_rejects_non_avi_and_compressed():
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVEnot a video")
    w, h, frames = _frames(0)
    enc = bytearray(encode_avi(w, h, frames))
    i = bytes(enc).find(b"strf")
    body = i + 8
    enc[body + 16 : body + 20] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(enc))


def test_skips_unknown_chunks():
    """Real AVIs carry idx1/JUNK chunks; the walker must skip them."""
    w, h, frames = _frames(2)
    enc = bytearray(encode_avi(w, h, frames))
    junk = b"JUNK" + struct.pack("<I", 7) + b"paddingX"[:7] + b"\x00"
    out = bytes(enc[:12]) + junk + bytes(enc[12:])
    assert decode_avi(out)[3] == frames
