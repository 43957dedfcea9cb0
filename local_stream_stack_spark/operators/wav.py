"""Minimal stdlib-only WAV/PCM codec (struct): the REAL-bytes audio
slice of the multimodal decode path (VERDICT r6 #6 — PNG closed the
image face in round 6; this closes audio the same way).

The container has no libav/soundfile, but PCM WAV needs neither: a
WAV file is a RIFF container with a ``fmt `` chunk (format tag,
channels, sample rate, bit depth) and a ``data`` chunk of interleaved
little-endian samples. This module implements:

- ``decode_wav(data)`` — parse the RIFF chunks, validate PCM, return
  (sample_rate, channels, bit_depth, samples) where ``samples`` is the
  flat interleaved list of signed ints. Supports bit depths 16 and 8
  (8-bit WAV is unsigned, rebased to signed like every audio stack
  does), skips unknown chunks (LIST/INFO/cue) including odd-length
  chunk padding per RIFF, and rejects non-PCM format tags explicitly.
- ``encode_wav(sample_rate, channels, samples, bit_depth)`` — writer
  used to build fixtures executor-side, so a decode round-trip
  exercises header layout, interleave order, and both sample widths.
- ``decode_audio(payload)`` — the swap-in for the multimodal codec
  interface: sniffs the RIFF/WAVE magic and returns real
  (sample_rate, channels, n_frames, duration_ms, amplitude stats);
  raises on non-WAV bytes so callers fall back to the clearly-marked
  stub (which now remains only for video and non-WAV audio bytes).

Everything is executor-side (called from mapInPandas batches); the
driver never touches payloads. Same arithmetic-oracle pattern as
``operators/png.py``: fixtures use closed-form sample formulas, so a
DuckDB oracle verifies the DECODED stats with no WAV knowledge — a
wrong stride, endianness, or rebase breaks the amplitude sums.
"""

from __future__ import annotations

import struct

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"

_WIDTHS = {8: 1, 16: 2}


def encode_wav(
    sample_rate: int,
    channels: int,
    samples: list[int],
    bit_depth: int = 16,
) -> bytes:
    """PCM WAV bytes from a flat interleaved signed-int sample list
    (frame-major: [f0c0, f0c1, f1c0, ...]). 8-bit samples are signed
    [-128, 127] here and stored unsigned per the WAV spec."""
    if bit_depth not in _WIDTHS:
        raise NotImplementedError(f"bit depth {bit_depth} (only 8/16)")
    if len(samples) % channels != 0:
        raise ValueError("sample count not a multiple of channels")
    width = _WIDTHS[bit_depth]
    if bit_depth == 8:
        body = bytes((s + 128) & 0xFF for s in samples)
    else:
        body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * width
    block_align = channels * width
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align,
        bit_depth,
    )
    data_pad = b"\x00" if len(body) % 2 else b""
    riff_body = (
        WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body + data_pad
    )
    return RIFF_MAGIC + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, channels, bit_depth, flat interleaved signed
    samples) recovered from PCM WAV bytes."""
    if data[:4] != RIFF_MAGIC or data[8:12] != WAVE_MAGIC:
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    sample_rate = channels = bit_depth = None
    body = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # RIFF pads odd chunks
        if ctype == b"fmt ":
            fmt_tag, channels, sample_rate, _, _, bit_depth = (
                struct.unpack("<HHIIHH", chunk[:16])
            )
            if fmt_tag != 1:
                raise NotImplementedError(
                    f"format tag {fmt_tag} (only PCM=1)"
                )
            if bit_depth not in _WIDTHS:
                raise NotImplementedError(
                    f"bit depth {bit_depth} (only 8/16)"
                )
        elif ctype == b"data":
            body = chunk
    if sample_rate is None or body is None:
        raise ValueError("missing fmt or data chunk")
    if bit_depth == 8:
        samples = [b - 128 for b in body]
    else:
        n = len(body) // 2
        samples = list(struct.unpack(f"<{n}h", body[: 2 * n]))
    return sample_rate, channels, bit_depth, samples


def decode_audio(payload: bytes) -> dict:
    """Multimodal codec interface: REAL stats from WAV bytes.

    duration_ms uses integer floor division (n_frames * 1000 //
    rate) so the value is exactly replayable in SQL; amplitude stats
    are over the flat interleaved samples (all channels)."""
    rate, channels, bit_depth, samples = decode_wav(payload)
    n_frames = len(samples) // max(channels, 1)
    return {
        "sample_rate": rate,
        "channels": channels,
        "bit_depth": bit_depth,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate if rate else 0,
        "amp_sum": sum(samples),
        "amp_min": min(samples) if samples else 0,
        "amp_max": max(samples) if samples else 0,
    }
