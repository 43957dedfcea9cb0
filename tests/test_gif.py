"""GIF codec pins: engine LZW vs an INDEPENDENT reference decoder
(classic avail/codemask, bit-at-a-time formulation — a different
implementation shape than the engine's table-of-strings decoder),
plus a real-world golden stream produced by ordinary GIF encoders
(the canonical 1x1 transparent GIF), format guards, and sub-block /
dictionary-reset edges."""

from __future__ import annotations

import base64
import random

import pytest

from local_stream_stack_spark.operators.gif import (
    decode_gif,
    decode_image_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def ref_lzw_decode(data: bytes, mcs: int) -> bytes:
    """Independent LZW reference: prefix/suffix tables + per-bit
    reads, width bump at ``avail == 2^codesize`` after assignment."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    prefix: dict[int, int] = {}
    suffix: dict[int, int] = {}
    bitpos = 0

    def getcode(w: int) -> int | None:
        nonlocal bitpos
        v = 0
        for i in range(w):
            if bitpos >> 3 >= len(data):
                return None
            v |= ((data[bitpos >> 3] >> (bitpos & 7)) & 1) << i
            bitpos += 1
        return v

    def expand(code: int) -> bytes:
        s = bytearray()
        while code >= clear:
            s.append(suffix[code])
            code = prefix[code]
        s.append(code)
        return bytes(reversed(s))

    out = bytearray()
    avail, codesize = end + 1, mcs + 1
    old: int | None = None
    while True:
        c = getcode(codesize)
        if c is None or c == end:
            break
        if c == clear:
            avail, codesize, old = end + 1, mcs + 1, None
            prefix.clear()
            suffix.clear()
            continue
        if old is None:
            out += expand(c)
            old = c
            continue
        if c < avail:
            s = expand(c)
        elif c == avail:
            s = expand(old)
            s = s + s[:1]
        else:
            raise ValueError("bad code")
        out += s
        if avail < 4096:
            prefix[avail] = old
            suffix[avail] = s[0]
            avail += 1
            if avail == (1 << codesize) and codesize < 12:
                codesize += 1
        old = c
    return bytes(out)


@pytest.mark.parametrize("mcs,n", [(2, 5), (2, 400), (3, 3000), (4, 9000), (8, 20000)])
def test_lzw_roundtrip_and_reference(mcs, n):
    rng = random.Random(mcs * 1000 + n)
    idx = bytes(rng.randrange(1 << mcs) for _ in range(n))
    enc = lzw_encode(idx, mcs)
    assert bytes(lzw_decode(enc, mcs)) == idx
    assert ref_lzw_decode(enc, mcs) == idx  # independent formulation


def test_lzw_runs_force_dictionary_growth():
    # long runs build deep dictionary chains fast (KwKwK territory)
    idx = (b"\x01" * 5000) + bytes(i % 4 for i in range(5000))
    enc = lzw_encode(idx, 2)
    assert bytes(lzw_decode(enc, 2)) == idx
    assert ref_lzw_decode(enc, 2) == idx
    assert len(enc) < len(idx)  # actually compresses


def test_golden_real_world_1x1_gif():
    # produced by standard encoders everywhere on the web — validates
    # marker layout + LZW bit packing against the ecosystem, not
    # against this repo's own encoder
    data = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, pal, frames = decode_gif(data)
    assert (w, h) == (1, 1)
    assert len(pal) == 6  # 2-entry GCT
    left, top, fw, fh, idx, fpal = frames[0]
    assert (left, top, fw, fh) == (0, 0, 1, 1)
    assert list(idx) == [0]
    assert fpal[:3] == b"\x00\x00\x00"


def test_encode_decode_multiframe_with_offsets():
    pal = bytes(b for i in range(8) for b in (i * 30 % 256, i * 2, i * 7))
    fr = [
        (0, 0, 10, 6, bytes((x * 3 + y) % 8 for y in range(6) for x in range(10))),
        (2, 1, 4, 4, bytes((x + y) % 8 for y in range(4) for x in range(4))),
    ]
    w, h, gct, frames = decode_gif(encode_gif(64, 48, fr, pal))
    assert (w, h) == (64, 48)
    assert gct == pal
    assert [(f[0], f[1], f[2], f[3]) for f in frames] == [
        (0, 0, 10, 6),
        (2, 1, 4, 4),
    ]
    assert bytes(frames[0][4]) == fr[0][4]
    assert bytes(frames[1][4]) == fr[1][4]


def test_sub_block_boundary_large_frame():
    # compressed stream well over 255 bytes -> many sub-blocks
    rng = random.Random(7)
    idx = bytes(rng.randrange(16) for _ in range(120 * 80))
    pal = bytes(range(48))  # 16 entries
    data = encode_gif(120, 80, [(0, 0, 120, 80, idx)], pal)
    _, _, _, frames = decode_gif(data)
    assert bytes(frames[0][4]) == idx


def test_decode_image_gif_stats():
    pal = bytes(b for i in range(4) for b in (i * 10, i * 20, i * 30))
    idx = bytes([0, 1, 2, 3, 3, 2])
    feats = decode_image_gif(encode_gif(3, 2, [(0, 0, 3, 2, idx)], pal))
    assert feats["n_frames"] == 1
    assert feats["n_px"] == 6
    assert feats["r_sum"] == sum(pal[3 * i] for i in idx)
    assert feats["g_min"] == 0 and feats["b_max"] == 90


def test_format_guards():
    with pytest.raises(ValueError, match="bad signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(1, 1, [(0, 0, 1, 1, b"\x00")], b"\x00" * 9)  # 3 entries
    # interlace flag set on a hand-tweaked frame
    pal = bytes(6)
    data = bytearray(encode_gif(1, 1, [(0, 0, 1, 1, b"\x00")], pal))
    # image descriptor packed byte is 9 bytes after the 0x2C tag
    tag = data.index(0x2C)
    data[tag + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(data))
