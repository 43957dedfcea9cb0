"""Real Sun/NeXT AU audio codec — stdlib-only, the companded-audio
member of the multimodal tier (WAV covers linear PCM; AU covers the
G.711 µ-law / A-law COMPANDING path every telephony corpus ships:
decoding is a genuine non-linear integer expansion, not a byte copy).

Supported on decode: the ``.snd`` header (big-endian, variable data
offset with annotation), encoding 1 (8-bit µ-law), 27 (8-bit A-law),
and 3 (16-bit linear PCM big-endian). The µ-law/A-law expansions are
the standard G.711 integer formulas — pure integer arithmetic, so a
SQL oracle can replay them bit-for-bit (which is exactly what
``multimodal_au_mulaw_decode`` does).
"""

from __future__ import annotations

import struct

_MAGIC = b".snd"


def mulaw_expand(byte: int) -> int:
    """G.711 µ-law byte -> linear PCM sample (13-bit magnitude)."""
    u = ~byte & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = ((mantissa << 3) + 0x84 << exponent) - 0x84
    return -magnitude if sign else magnitude


def alaw_expand(byte: int) -> int:
    """G.711 A-law byte -> linear PCM sample."""
    a = byte ^ 0x55
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    if exponent == 0:
        magnitude = (mantissa << 4) + 8
    else:
        magnitude = ((mantissa << 4) + 0x108) << (exponent - 1)
    # ITU A-law: the (XOR-folded) sign bit SET means positive —
    # opposite of µ-law's complemented sign
    return magnitude if sign else -magnitude


def mulaw_compress(sample: int) -> int:
    """G.711 µ-law encoder (sign-magnitude, bias 0x84, 8 segments)."""
    sign = 0x80 if sample < 0 else 0
    magnitude = min((-sample if sample < 0 else sample) + 0x84, 0x7FFF)
    exponent = 7
    mask = 0x4000
    while exponent > 0 and not magnitude & mask:
        exponent -= 1
        mask >>= 1
    mantissa = (magnitude >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def encode_au(
    body: bytes | list[int],
    encoding: int,
    sample_rate: int = 8000,
    channels: int = 1,
    annotation: bytes = b"",
) -> bytes:
    """Wrap an already-encoded body (µ-law/A-law bytes, or PCM16 BE
    bytes) in an AU header; the annotation field exercises variable
    data offsets."""
    payload = bytes(body)
    offset = 24 + len(annotation)
    return (
        _MAGIC
        + struct.pack(
            ">IIIII", offset, len(payload), encoding, sample_rate, channels
        )
        + annotation
        + payload
    )


def decode_au(data: bytes) -> dict:
    """Decode an AU stream to {encoding, sample_rate, channels,
    n_samples, pcm_sum, pcm_min, pcm_max, abs_sum}."""
    if len(data) < 24 or data[:4] != _MAGIC:
        raise ValueError("not an AU stream")
    offset, size, encoding, rate, channels = struct.unpack(
        ">IIIII", data[4:24]
    )
    if offset < 24:
        raise ValueError("bad AU data offset")
    if offset > len(data):
        raise ValueError("truncated AU annotation")
    body = data[offset:]
    if size != 0xFFFFFFFF:
        if size > len(body):
            raise ValueError("truncated AU body")
        body = body[:size]
    if encoding == 1:
        pcm = [mulaw_expand(b) for b in body]
    elif encoding == 27:
        pcm = [alaw_expand(b) for b in body]
    elif encoding == 3:
        if len(body) % 2:
            raise ValueError("odd PCM16 body length")
        pcm = list(
            struct.unpack(f">{len(body) // 2}h", body)
        )
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    return {
        "encoding": encoding,
        "sample_rate": rate,
        "channels": channels,
        "n_samples": len(pcm),
        "pcm_sum": sum(pcm),
        "pcm_min": min(pcm) if pcm else 0,
        "pcm_max": max(pcm) if pcm else 0,
        "abs_sum": sum(abs(v) for v in pcm),
    }
