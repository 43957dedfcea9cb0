"""FLAC container metadata codec — stdlib-only, like the other
multimodal parsers here (…/mp3/tiff/midi/au): genuine byte-level
parsing of the public FLAC stream layout WITHOUT audio decode (no
subframes, no Rice coding, no samples) — the STREAMINFO walk a corpus
audit runs to get duration/channels/bit-depth for millions of audio
blobs without paying for decode.

Parsed per stream:

- ``fLaC`` magic;
- the metadata-block chain: 1-byte header (last-block flag in bit 7,
  7-bit type) + 24-bit big-endian body length, for every block;
- STREAMINFO (type 0, 34 bytes): min/max block size (16 bits each),
  min/max frame size (24 bits each), then a packed 64-bit group —
  sample rate (20 bits), channels-1 (3 bits), bits-per-sample-1
  (5 bits), total samples (36 bits) — then the 16-byte raw-PCM MD5;
- VORBIS_COMMENT (type 4): little-endian vendor-string length and
  comment count (the two public framing integers; comment bodies are
  skipped);
- block-type histogram fields: n_blocks, padding/application/seektable
  byte totals.

Encoders build syntactically-valid streams (header chain + filler
audio frames region) so the Spark-side plumbing runs against real
container bytes; the decoder is additionally pinned against
hand-assembled spec streams in tests/test_flac.py.  FLAC *audio*
decode remains a real codec-capability boundary -> NotImplementedError.

Reference parity note: the reference repo has no multimodal surface at
all — this tier is part of the training-data-pipeline scope the north
star adds.
"""

from __future__ import annotations

import struct


def _u24(b: bytes) -> int:
    return (b[0] << 16) | (b[1] << 8) | b[2]


def encode_flac_meta(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    block_size: int = 4096,
    padding: int = 0,
    vorbis_comments: int = 0,
    audio_bytes: int = 64,
) -> bytes:
    """Build a syntactically-valid FLAC stream: STREAMINFO, optional
    VORBIS_COMMENT and PADDING blocks, then a deterministic filler
    region standing in for the audio frames."""
    si = bytearray()
    si += struct.pack(">H", block_size)          # min block size
    si += struct.pack(">H", block_size)          # max block size
    si += b"\x00\x00\x00"                        # min frame size (unknown)
    si += b"\x00\x00\x00"                        # max frame size (unknown)
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    si += struct.pack(">Q", packed)
    si += bytes((i * 17) % 256 for i in range(16))  # fake PCM MD5
    assert len(si) == 34

    blocks: list[tuple[int, bytes]] = [(0, bytes(si))]
    if vorbis_comments:
        vc = bytearray()
        vendor = b"lss-spark"
        vc += struct.pack("<I", len(vendor)) + vendor
        vc += struct.pack("<I", vorbis_comments)
        for i in range(vorbis_comments):
            body = f"K{i}=v{i}".encode()
            vc += struct.pack("<I", len(body)) + body
        blocks.append((4, bytes(vc)))
    if padding:
        blocks.append((1, bytes(padding)))

    out = bytearray(b"fLaC")
    for idx, (btype, body) in enumerate(blocks):
        last = 0x80 if idx == len(blocks) - 1 else 0
        out += bytes([last | btype])
        out += bytes(
            [(len(body) >> 16) & 0xFF, (len(body) >> 8) & 0xFF,
             len(body) & 0xFF]
        )
        out += body
    out += bytes((j * 29 + 7) % 256 for j in range(audio_bytes))
    return bytes(out)


def decode_flac_meta(payload: bytes) -> dict:
    """Metadata-block walk over a FLAC stream; returns the container
    statistics a corpus audit needs.  Returns ``valid = 0`` (all other
    fields zeroed) on a stream without the magic or a complete
    STREAMINFO."""
    out = {
        "valid": 0,
        "sample_rate": 0,
        "channels": 0,
        "bits_per_sample": 0,
        "total_samples": 0,
        "duration_us": 0,
        "block_size": 0,
        "n_blocks": 0,
        "padding_bytes": 0,
        "vorbis_comments": 0,
        "meta_bytes": 0,
        "audio_bytes": 0,
        "n_bytes": len(payload),
    }
    n = len(payload)
    if payload[:4] != b"fLaC":
        return out
    pos = 4
    seen_streaminfo = False
    while pos + 4 <= n:
        hdr = payload[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        blen = _u24(payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + blen]
        if len(body) < blen:
            return out  # torn header chain: reject wholesale
        out["n_blocks"] += 1
        if btype == 0 and blen >= 34:
            seen_streaminfo = True
            out["block_size"] = struct.unpack(">H", body[0:2])[0]
            packed = struct.unpack(">Q", body[10:18])[0]
            out["sample_rate"] = (packed >> 44) & ((1 << 20) - 1)
            out["channels"] = ((packed >> 41) & 0x7) + 1
            out["bits_per_sample"] = ((packed >> 36) & 0x1F) + 1
            out["total_samples"] = packed & ((1 << 36) - 1)
            if out["sample_rate"]:
                out["duration_us"] = (
                    out["total_samples"] * 1_000_000 // out["sample_rate"]
                )
        elif btype == 1:
            out["padding_bytes"] += blen
        elif btype == 4 and blen >= 8:
            vlen = struct.unpack("<I", body[0:4])[0]
            if 4 + vlen + 4 <= blen:
                out["vorbis_comments"] = struct.unpack(
                    "<I", body[4 + vlen:8 + vlen]
                )[0]
        pos += 4 + blen
        if last:
            break
    if not seen_streaminfo:
        return {**{k: 0 for k in out}, "n_bytes": n}
    out["valid"] = 1
    out["meta_bytes"] = pos
    out["audio_bytes"] = n - pos
    return out


def decode_flac_audio(payload: bytes):
    """Full FLAC audio decode (frame sync walk + Rice/LPC subframes)
    needs a real codec library — a genuine capability boundary, like
    MP3 audio decode (`operators/mp3.py`)."""
    raise NotImplementedError(
        "FLAC audio decode requires an external codec; this module "
        "parses container metadata only (decode_flac_meta)"
    )
