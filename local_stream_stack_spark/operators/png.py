"""Minimal stdlib-only PNG codec (zlib + struct): the REAL-bytes slice
of the multimodal decode path (VERDICT r5 #6).

The container has no PIL/libav, but PNG needs neither: a PNG is
IHDR/IDAT/IEND chunks, a zlib stream, and five per-scanline byte
filters (None/Sub/Up/Average/Paeth — RFC 2083 §6). This module
implements:

- ``decode_png(data)`` — parse chunks, inflate, UNFILTER, return
  (width, height, channels, bytearray of recovered samples). Supports
  bit depth 8 with color types 0 (gray), 2 (RGB), 6 (RGBA), multiple
  IDAT chunks, and rejects interlaced images explicitly.
- ``encode_png(width, height, pixels, channels)`` — writer used to
  build fixtures executor-side; cycles the filter type per scanline
  (y % 5) so a decode round-trip exercises every unfilter branch.
- ``decode_image(payload)`` — the swap-in for the multimodal codec
  interface: sniffs the PNG magic and returns real (width, height,
  pixel stats); raises on non-PNG bytes so callers fall back to the
  clearly-marked stub (which now remains only for audio/video and
  non-PNG images).

Everything is executor-side (called from mapInPandas batches); the
driver never touches payloads. The arithmetic oracle pattern: fixtures
are generated from closed-form pixel formulas, so a DuckDB oracle can
verify the DECODED stats without any PNG knowledge — if any unfilter
branch is wrong, the pixel sums mismatch.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, RFC 2083 §6.6 reference algorithm."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """(width, height, channels, samples) — samples are the recovered
    image bytes row-major, ``channels`` interleaved per pixel."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth} (only 8)")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"color type {color_type}")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or channels is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated size {len(raw)} != expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                a = out[o + i - channels] if i >= channels else 0
                out[o + i] = (line[i] + a) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                b = out[prev_start + i] if y > 0 else 0
                out[o + i] = (line[i] + b) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = out[o + i - channels] if i >= channels else 0
                b = out[prev_start + i] if y > 0 else 0
                out[o + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = out[o + i - channels] if i >= channels else 0
                b = out[prev_start + i] if y > 0 else 0
                c = out[prev_start + i - channels] if (y > 0 and i >= channels) else 0
                out[o + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f} on row {y}")
        prev_start = o
    return width, height, channels, out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, pixels: bytes, channels: int = 1
) -> bytes:
    """Write a PNG from raw interleaved samples. Cycles the scanline
    filter type (y % 5) so decoding a round-trip exercises ALL five
    unfilter branches — a decoder bug cannot hide behind filter-0
    fixtures."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
        f = y % 5
        raw.append(f)
        if f == 0:
            raw.extend(line)
        elif f == 1:
            raw.extend(
                (line[i] - (line[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            raw.extend((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            raw.extend(
                (
                    line[i]
                    - (
                        ((line[i - channels] if i >= channels else 0) + prev[i])
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raw.extend(
                (
                    line[i]
                    - _paeth(
                        line[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> dict:
    """REAL image decode for the multimodal feature path: PNG in,
    dict of (width, height, channels, px_sum, px_min, px_max) out.
    Raises ValueError on non-PNG bytes — callers fall back to the
    marked stub for modalities this container cannot decode."""
    width, height, channels, samples = decode_png(payload)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "px_sum": sum(samples),
        "px_min": min(samples) if samples else 0,
        "px_max": max(samples) if samples else 0,
    }
