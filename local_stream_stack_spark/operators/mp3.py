"""MP3 (MPEG-1/2 Audio Layer III) frame-header metadata codec —
stdlib-only, like the other multimodal parsers here (png/jpeg/gif/wav/
avi/bmp/qoi/ico/tga/pcx/pnm/midi/au/tiff): genuine byte-level parsing
of the public MPEG audio frame-header format, WITHOUT audio decode (no
Huffman tables, no IMDCT, no samples) — exactly the metadata walk a
training-data pipeline runs to get duration/bitrate/VBR statistics for
millions of audio blobs without paying for decode.

Parsed per stream:

- optional ID3v2 tag prefix (``ID3`` magic, version, flags, 28-bit
  syncsafe size; footer flag adds 10 bytes) — skipped, size reported;
- every MPEG audio frame: 11-bit sync, version (1 / 2 / 2.5), layer
  (III only here), bitrate index (public kbps tables), sample-rate
  index, padding bit, channel mode.  Layer III frame length in bytes
  is ``144000*kbps // hz + padding`` for MPEG-1 and ``72000*kbps //
  hz + padding`` for MPEG-2/2.5 (576 samples per frame instead of
  1152);
- a ``Xing``/``Info`` VBR header in the FIRST frame (it sits after
  the side info, whose size depends on version + mono/stereo:
  MPEG-1 32/17 bytes, MPEG-2 17/9), with its optional frame-count /
  byte-count fields, and the fixed-offset ``VBRI`` variant;
- resync: garbage between frames is scanned past byte-by-byte (the
  same recovery every player does on torn streams); a final truncated
  frame (header claims more bytes than remain) is NOT counted.

Encoders build syntactically-valid CBR and VBR streams (frame headers
+ deterministic filler payload — no audio claim) so the Spark-side
plumbing runs against real container bytes; the decoder is
additionally pinned against hand-assembled spec streams in
tests/test_mp3.py so it is checked against the FORMAT, not just
against our encoder.  MP3 *audio* decode (Huffman + IMDCT) remains a
real codec-capability boundary -> NotImplementedError.

Reference parity note: the reference repo has no multimodal surface at
all — this tier is part of the training-data-pipeline scope the north
star adds (multimodal columns as opaque binaries + real metadata
decode).
"""

from __future__ import annotations

import struct

# Layer III bitrate tables, kbps, index 1..14 (0 = "free", 15 = bad)
_BITRATES_V1_L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_BITRATES_V2_L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
# sample-rate tables by version bits (00=2.5, 10=2, 11=1), index 0..2
_SAMPLE_RATES = {
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],   # MPEG-2.5
}
# samples per Layer III frame
_SAMPLES = {3: 1152, 2: 576, 0: 576}
# side-info bytes after the 4-byte header (+2 CRC when protected):
# {version: (stereo-ish, mono)}
_SIDE_INFO = {3: (32, 17), 2: (17, 9), 0: (17, 9)}


def _syncsafe(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _read_syncsafe(b: bytes) -> int:
    return (
        ((b[0] & 0x7F) << 21)
        | ((b[1] & 0x7F) << 14)
        | ((b[2] & 0x7F) << 7)
        | (b[3] & 0x7F)
    )


def frame_length(version_bits: int, kbps: int, hz: int, padding: int) -> int:
    """Layer III frame size in bytes (public formula: floor of
    bytes-per-frame at this bitrate plus the padding slot)."""
    per = 144000 if version_bits == 3 else 72000
    return per * kbps // hz + padding


def _pack_header(
    version_bits: int,
    bitrate_idx: int,
    samplerate_idx: int,
    padding: int,
    mono: bool,
) -> bytes:
    b1 = 0xFF
    b2 = 0xE0 | (version_bits << 3) | (0b01 << 1) | 0x1  # layer III, no CRC
    b3 = (bitrate_idx << 4) | (samplerate_idx << 2) | (padding << 1)
    b4 = (0b11 if mono else 0b00) << 6
    return bytes([b1, b2, b3, b4])


def encode_mp3(
    bitrate_indexes: list[int],
    samplerate_idx: int = 0,
    version_bits: int = 3,
    paddings: list[int] | None = None,
    mono: bool = False,
    id3_size: int = 0,
    xing: bool = False,
) -> bytes:
    """Build a syntactically-valid Layer III stream: one frame per
    bitrate index, deterministic filler payload, optional ID3v2 prefix
    and Xing frame-count header in frame 0."""
    hz = _SAMPLE_RATES[version_bits][samplerate_idx]
    table = _BITRATES_V1_L3 if version_bits == 3 else _BITRATES_V2_L3
    pads = paddings or [0] * len(bitrate_indexes)
    out = bytearray()
    if id3_size:
        out += b"ID3" + bytes([4, 0, 0]) + _syncsafe(id3_size)
        out += bytes((i * 7) % 256 for i in range(id3_size))
    for i, (bidx, pad) in enumerate(zip(bitrate_indexes, pads)):
        flen = frame_length(version_bits, table[bidx], hz, pad)
        frame = bytearray(
            _pack_header(version_bits, bidx, samplerate_idx, pad, mono)
        )
        body = bytearray(
            ((i + 1) * 31 + j * 13) % 199 for j in range(flen - 4)
        )
        if xing and i == 0:
            off = _SIDE_INFO[version_bits][1 if mono else 0]
            body[:off] = bytes(off)
            body[off:off + 12] = (
                b"Xing"
                + struct.pack(">I", 0x1)  # flags: frames present
                + struct.pack(">I", len(bitrate_indexes))
            )
        frame += body
        out += frame
    return bytes(out)


def decode_mp3_meta(payload: bytes) -> dict:
    """Frame-header walk over an MP3 stream; returns the metadata a
    corpus audit needs.  Never raises on torn input — unparseable
    bytes are skipped (resync), truncated trailing frames dropped."""
    n = len(payload)
    pos = 0
    id3_bytes = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = _read_syncsafe(payload[6:10])
        footer = 10 if (payload[5] & 0x10) else 0
        id3_bytes = 10 + size + footer
        pos = min(id3_bytes, n)
    frames = 0
    junk = 0
    duration_us = 0  # sum over frames of samples*1e6 // hz (integer)
    hz_seen: set[int] = set()
    kbps_min = kbps_max = None
    kbps_sum = 0
    distinct_kbps: set[int] = set()
    has_xing = False
    xing_frames = None
    first = True
    while pos + 4 <= n:
        b0, b1, b2, b3 = payload[pos:pos + 4]
        version_bits = (b1 >> 3) & 0b11
        layer_bits = (b1 >> 1) & 0b11
        bidx = (b2 >> 4) & 0xF
        sidx = (b2 >> 2) & 0b11
        ok = (
            b0 == 0xFF
            and (b1 & 0xE0) == 0xE0
            and version_bits != 1  # reserved
            and layer_bits == 0b01  # Layer III only
            and 1 <= bidx <= 14
            and sidx != 3
        )
        if not ok:
            pos += 1
            junk += 1
            continue
        hz = _SAMPLE_RATES[version_bits][sidx]
        table = _BITRATES_V1_L3 if version_bits == 3 else _BITRATES_V2_L3
        kbps = table[bidx]
        pad = (b2 >> 1) & 0x1
        flen = frame_length(version_bits, kbps, hz, pad)
        if pos + flen > n:
            break  # truncated trailing frame: not counted
        if first:
            mono = ((b3 >> 6) & 0b11) == 0b11
            protected = (b1 & 0x1) == 0
            off = (
                pos + 4 + (2 if protected else 0)
                + _SIDE_INFO[version_bits][1 if mono else 0]
            )
            tag = payload[off:off + 4]
            if tag in (b"Xing", b"Info"):
                has_xing = True
                flags = struct.unpack(">I", payload[off + 4:off + 8])[0]
                if flags & 0x1:
                    xing_frames = struct.unpack(
                        ">I", payload[off + 8:off + 12]
                    )[0]
            elif payload[pos + 36:pos + 40] == b"VBRI":
                has_xing = True
                xing_frames = struct.unpack(
                    ">I", payload[pos + 50:pos + 54]
                )[0]
            first = False
        frames += 1
        # per-frame integer floor so a SQL oracle can reproduce the
        # exact value as SUM(samples * 1e6 // hz) over the frame set
        duration_us += _SAMPLES[version_bits] * 1_000_000 // hz
        hz_seen.add(hz)
        kbps_sum += kbps
        distinct_kbps.add(kbps)
        kbps_min = kbps if kbps_min is None else min(kbps_min, kbps)
        kbps_max = kbps if kbps_max is None else max(kbps_max, kbps)
        pos += flen
    hz0 = min(hz_seen) if hz_seen else 0
    return {
        "n_frames": frames,
        "sample_rate": hz0,
        "duration_us": duration_us,
        "kbps_min": kbps_min or 0,
        "kbps_max": kbps_max or 0,
        "kbps_sum": kbps_sum,
        "is_vbr": 1 if (len(distinct_kbps) > 1 or has_xing) else 0,
        "has_xing": 1 if has_xing else 0,
        "xing_frames": xing_frames if xing_frames is not None else -1,
        "id3_bytes": id3_bytes,
        "junk_bytes": junk,
        "n_bytes": n,
    }


def decode_mp3_audio(payload: bytes):
    """Full MP3 audio decode (Huffman + IMDCT + synthesis filterbank)
    needs a real codec library — a genuine capability boundary in this
    container, like progressive JPEG (`operators/jpeg.py`) and
    compressed TIFF (`operators/tiff.py`)."""
    raise NotImplementedError(
        "MP3 audio decode requires an external codec; this module "
        "parses frame-header metadata only (decode_mp3_meta)"
    )
