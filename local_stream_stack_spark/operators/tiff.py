"""Real baseline-TIFF codec — stdlib-only, like the other multimodal
codecs here (png/jpeg/gif/wav/avi/bmp/qoi/ico/tga/pcx/pnm): genuine
byte-level parsing of the TIFF 6.0 baseline container so the
Spark-side multimodal plumbing runs against REAL image bytes.

Supported on decode: classic TIFF (II little-endian and MM
big-endian), first IFD, uncompressed (Compression=1) 8-bit grayscale
(PhotometricInterpretation 0/1, SamplesPerPixel 1) and RGB
(Photometric 2, SamplesPerPixel 3), chunky planar config, any
RowsPerStrip split (multi-strip assembly is the part of the format
worth exercising — it is how TIFF readers stream large images without
loading the whole raster). Inline-vs-offset IFD values (count*size <=
4 packs into the entry) are handled for SHORT and LONG types.
Compressed variants (LZW/PackBits/JPEG-in-TIFF) are a real
codec-capability boundary -> NotImplementedError.

Encoders cover gray8 and rgb8 in both byte orders with configurable
rows-per-strip; the decoder is additionally pinned against
hand-assembled spec streams in tests/test_tiff.py so it is checked
against the FORMAT, not just against our encoder.

Reference parity note: the reference repo has no multimodal surface at
all — this tier is part of the training-data-pipeline scope the north
star adds (multimodal columns as opaque binaries + real decode).
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def _pack_entries(
    endian: str,
    entries: list[tuple[int, int, list[int]]],
    ifd_offset: int,
) -> tuple[bytes, bytes]:
    """Serialize IFD entries; values that don't fit inline land in an
    external area placed directly AFTER the IFD block."""
    n = len(entries)
    ext_base = ifd_offset + 2 + n * 12 + 4
    ext = bytearray()
    body = bytearray(struct.pack(endian + "H", n))
    fmt = {1: "B", 3: "H", 4: "I"}
    for tag, typ, values in sorted(entries):
        size = _TYPE_SIZES[typ] * len(values)
        body += struct.pack(endian + "HHI", tag, typ, len(values))
        if size <= 4:
            packed = b"".join(
                struct.pack(endian + fmt[typ], v) for v in values
            )
            body += packed + b"\x00" * (4 - size)
        else:
            body += struct.pack(endian + "I", ext_base + len(ext))
            for v in values:
                ext += struct.pack(endian + fmt[typ], v)
    body += struct.pack(endian + "I", 0)  # next-IFD pointer
    return bytes(body), bytes(ext)


def _encode(
    width: int,
    height: int,
    samples: bytes,
    spp: int,
    photometric: int,
    big_endian: bool,
    rows_per_strip: int | None,
) -> bytes:
    if len(samples) != width * height * spp:
        raise ValueError("sample length != width*height*spp")
    endian = ">" if big_endian else "<"
    rps = min(rows_per_strip or height, height) or 1
    row_bytes = width * spp
    strips = [
        samples[y * row_bytes: min(y + rps, height) * row_bytes]
        for y in range(0, height, rps)
    ]
    header = struct.pack(
        endian + "2sHI", b"MM" if big_endian else b"II", 42, 0
    )
    data_off = len(header)
    offsets, counts, pos = [], [], data_off
    for s in strips:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s)
    ifd_offset = pos
    entries = [
        (256, 4, [width]),            # ImageWidth
        (257, 4, [height]),           # ImageLength
        (258, 3, [8] * spp),          # BitsPerSample
        (259, 3, [1]),                # Compression: none
        (262, 3, [photometric]),      # PhotometricInterpretation
        (273, 4, offsets),            # StripOffsets
        (277, 3, [spp]),              # SamplesPerPixel
        (278, 4, [rps]),              # RowsPerStrip
        (279, 4, counts),             # StripByteCounts
        (284, 3, [1]),                # PlanarConfiguration: chunky
    ]
    body, ext = _pack_entries(endian, entries, ifd_offset)
    out = bytearray(header)
    out[4:8] = struct.pack(endian + "I", ifd_offset)
    for s in strips:
        out += s
    out += body + ext
    return bytes(out)


def encode_tiff_gray8(
    width: int,
    height: int,
    pixels: bytes,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Baseline uncompressed 8-bit grayscale TIFF (BlackIsZero)."""
    return _encode(
        width, height, pixels, 1, 1, big_endian, rows_per_strip
    )


def encode_tiff_rgb8(
    width: int,
    height: int,
    rgb: bytes,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Baseline uncompressed 8-bit-per-sample RGB TIFF (chunky)."""
    return _encode(width, height, rgb, 3, 2, big_endian, rows_per_strip)


def _read_values(data: bytes, endian: str, typ: int, count: int, raw: bytes):
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise ValueError(f"unsupported IFD value type {typ}")
    size = _TYPE_SIZES[typ] * count
    if size <= 4:
        buf = raw[:size]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        buf = data[off: off + size]
        if len(buf) != size:
            raise ValueError("IFD value area out of bounds")
    return list(struct.unpack(endian + fmt * count, buf))


def decode_tiff(data: bytes) -> dict:
    """Decode a baseline TIFF; returns width/height/spp/n_px, exact
    per-channel integer sums (r/g/b — gray maps all three to the one
    channel), and global sample min/max."""
    if len(data) < 8:
        raise ValueError("short TIFF header")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(endian + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    if ifd_off + 2 > len(data):
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack(
        endian + "H", data[ifd_off: ifd_off + 2]
    )
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack(
            endian + "HHI", data[base: base + 8]
        )
        tags[tag] = _read_values(
            data, endian, typ, count, data[base + 8: base + 12]
        )
    try:
        width = tags[256][0]
        height = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise ValueError(f"missing required TIFF tag {e}")
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise NotImplementedError(
            f"TIFF compression {compression} not supported"
            " (baseline uncompressed only)"
        )
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8] * spp)
    if any(b != 8 for b in bps) or spp not in (1, 3):
        raise NotImplementedError(
            "only 8-bit gray (spp=1) / RGB (spp=3) supported"
        )
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    raster = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = data[off: off + cnt]
        if len(strip) != cnt:
            raise ValueError("strip out of bounds")
        raster += strip
    if len(raster) != width * height * spp:
        raise ValueError("raster size != width*height*spp")
    sums = [0] * spp
    for i, v in enumerate(raster):
        sums[i % spp] += v
    mn = min(raster) if raster else 0
    mx = max(raster) if raster else 0
    if spp == 1:
        r_sum = g_sum = b_sum = sums[0]
    else:
        r_sum, g_sum, b_sum = sums
    return {
        "width": width,
        "height": height,
        "spp": spp,
        "n_strips": len(offsets),
        "n_px": width * height,
        "r_sum": r_sum,
        "g_sum": g_sum,
        "b_sum": b_sum,
        "s_min": mn,
        "s_max": mx,
    }
