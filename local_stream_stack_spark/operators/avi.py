"""Minimal stdlib-only AVI codec for UNCOMPRESSED video (struct): the
real-bytes VIDEO slice of the multimodal decode path — PNG closed
images (round 6), WAV closed audio (round 7), this closes video for
the one video format that needs no codec library.

An uncompressed AVI is a RIFF container (same chunk grammar as WAV):
``RIFF('AVI ')`` holding a ``LIST hdrl`` (an ``avih`` main header +
one ``LIST strl`` per stream with ``strh``/``strf``) and a ``LIST
movi`` whose ``00db`` chunks each carry one raw DIB frame. The DIB
payload is the honest complexity worth testing — BGR byte order,
BOTTOM-UP row layout, and 4-byte row-stride padding (the same class
of layout traps as PNG's scanline filters). This module implements:

- ``encode_avi(width, height, frames)`` — writer used to build
  fixtures executor-side: frames are logical top-down RGB byte
  strings (3 bytes/pixel, row-major); the writer emits spec-correct
  bottom-up padded BGR DIBs with a BITMAPINFOHEADER ``strf``.
- ``decode_avi(data)`` — parse the RIFF tree (walking LIST bodies,
  honoring odd-length chunk padding), validate
  ``biCompression == 0 (BI_RGB)`` / 24-bit, undo stride + row order +
  channel order, and return (width, height, fps, list of logical
  top-down RGB frames). Rejects compressed streams explicitly.
- ``decode_video(payload)`` — the swap-in for the multimodal codec
  interface: sniffs ``RIFF``/``AVI `` magic and returns real
  (width, height, n_frames, duration_ms, per-frame pixel stats);
  raises on non-AVI bytes so callers fall back to the clearly-marked
  stub (which now remains only for compressed/foreign media bytes).

Same arithmetic-oracle pattern as ``operators/png.py``: fixtures use
closed-form pixel formulas, so a DuckDB oracle verifies the DECODED
per-frame stats with no AVI knowledge — a wrong stride, row flip, or
BGR/RGB swap breaks the position-weighted checksum.
"""

from __future__ import annotations

import struct

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_TYPE = b"AVI "

_BI_RGB = 0


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 10,
) -> bytes:
    """Uncompressed 24-bit AVI from logical top-down RGB frames."""
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame size != width*height*3")
    stride = (width * 3 + 3) & ~3
    dibs = []
    for f in frames:
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(width):
                off = (y * width + x) * 3
                r, g, b = f[off], f[off + 1], f[off + 2]
                row += bytes((b, g, r))  # BGR on disk
            row += b"\x00" * (stride - width * 3)
            rows.append(bytes(row))
        dibs.append(b"".join(rows))
    frame_bytes = stride * height
    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, frame_bytes * fps, 0, 0x10, len(frames), 0, 1,
        frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
            frame_bytes, 0, 0, 0,
        ) + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, _BI_RGB, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", d) for d in dibs))
    body = AVI_MAGIC_TYPE + hdrl + movi
    return AVI_MAGIC_RIFF + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) honoring RIFF padding."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, length
        pos += 8 + length + (length & 1)


def decode_avi(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """(width, height, fps, logical top-down RGB frames)."""
    if data[:4] != AVI_MAGIC_RIFF or data[8:12] != AVI_MAGIC_TYPE:
        raise ValueError("not an AVI: bad RIFF/AVI signature")
    width = height = None
    bit_count = compression = None
    usec_per_frame = None
    dibs: list[bytes] = []

    def walk_list(pos: int, end: int) -> None:
        nonlocal width, height, bit_count, compression, usec_per_frame
        for fourcc, start, length in _walk_chunks(data, pos, end):
            body_end = start + length
            if fourcc == b"LIST":
                walk_list(start + 4, body_end)  # skip list type tag
            elif fourcc == b"avih":
                (usec_per_frame,) = struct.unpack(
                    "<I", data[start : start + 4]
                )
            elif fourcc == b"strf":
                (_, width, height, _, bit_count, compression) = (
                    struct.unpack("<IiiHHI", data[start : start + 20])
                )
            elif fourcc in (b"00db", b"00dc"):
                dibs.append(data[start:body_end])

    walk_list(12, len(data))
    if width is None or not dibs:
        raise ValueError("missing strf or frame chunks")
    if compression != _BI_RGB or bit_count != 24:
        raise NotImplementedError(
            f"compression {compression}/bpp {bit_count}"
            " (only BI_RGB 24-bit)"
        )
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    frames = []
    # vectorized layout reconstruction (guide §4.2): strip stride
    # padding, flip bottom-up row order, swap BGR->RGB — pure numpy
    # slicing over the DIB buffer, byte-identical to the former
    # per-pixel loop (pinned against hand-built frames in tests)
    import numpy as np

    for dib in dibs:
        if len(dib) < stride * height:
            raise ValueError("truncated frame")
        rows = np.frombuffer(dib, dtype=np.uint8)[
            : stride * height
        ].reshape(height, stride)[:, : width * 3]
        if not top_down:
            rows = rows[::-1]
        rgb = rows.reshape(height, width, 3)[:, :, ::-1]
        frames.append(rgb.tobytes())
    fps = 1_000_000 // usec_per_frame if usec_per_frame else 0
    return width, height, fps, frames


def decode_video(payload: bytes) -> dict:
    """Multimodal codec interface: REAL stats from uncompressed AVI.

    Per-frame stats are over the logical top-down RGB bytes;
    ``px_weighted`` is a position-and-channel-weighted checksum
    (sum((pixel_index + 1) * (channel + 1) * value)) that any row
    flip, stride slip, or BGR/RGB swap perturbs — the SQL-replayable
    proof the layout reconstruction is right."""
    import numpy as np

    width, height, fps, frames = decode_avi(payload)
    stats = []
    for f in frames:
        # int64 numpy folds — exact integers, identical to the former
        # per-byte generator (guide §4.2)
        a = np.frombuffer(f, dtype=np.uint8).astype(np.int64)
        i = np.arange(a.size, dtype=np.int64)
        stats.append(
            {
                "px_sum": int(a.sum()),
                "px_min": int(a.min()),
                "px_max": int(a.max()),
                "px_weighted": int(
                    ((i // 3 + 1) * (i % 3 + 1) * a).sum()
                ),
            }
        )
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": len(frames),
        "duration_ms": len(frames) * 1000 // fps if fps else 0,
        "frames": stats,
    }
