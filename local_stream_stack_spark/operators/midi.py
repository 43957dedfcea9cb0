"""Real Standard MIDI File (SMF) codec — stdlib-only, the audio-event
member of the multimodal tier (WAV covers PCM samples; MIDI covers the
symbolic event stream: variable-length-quantity deltas, running
status, channel messages, meta events).

Supported on decode: format 0/1 files, any number of MTrk chunks,
VLQ delta times, RUNNING STATUS (a data byte where a status byte is
expected reuses the previous channel status — the part naive parsers
get wrong), note-on/note-off (note-on with velocity 0 counts as
note-off per the spec), the other channel messages (skipped with the
correct operand widths), meta events (tempo captured; end-of-track
enforced), and SysEx (length-skipped). The encoder emits format-1
files and deliberately uses running status for consecutive same-status
events so the decoder's hard path is exercised by every round-trip.
"""

from __future__ import annotations

import struct


def _vlq(value: int) -> bytes:
    if value < 0:
        raise ValueError("negative VLQ")
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(out))


def encode_midi(
    tracks: list[list[tuple[int, int, int, int]]],
    division: int = 480,
    tempo_us: int = 500000,
) -> bytes:
    """Encode a format-1 SMF. Each track is a list of
    ``(delta, pitch, velocity, off_delta)`` notes: note-on after
    ``delta`` ticks, matching note-off after ``off_delta`` more.
    Consecutive note-ons share a running status byte."""
    chunks = bytearray(
        b"MThd" + struct.pack(">IHHH", 6, 1, len(tracks) + 1, division)
    )
    # conductor track: tempo + end-of-track
    cond = (
        b"\x00\xff\x51\x03"
        + struct.pack(">I", tempo_us)[1:]
        + b"\x00\xff\x2f\x00"
    )
    chunks += b"MTrk" + struct.pack(">I", len(cond)) + cond
    for notes in tracks:
        body = bytearray()
        running = None
        for delta, pitch, vel, off_delta in notes:
            body += _vlq(delta)
            if running != 0x90:
                body.append(0x90)
                running = 0x90
            body += bytes((pitch & 0x7F, max(1, vel & 0x7F)))
            body += _vlq(off_delta)
            # note-on velocity 0 == note-off, still running status
            body += bytes((pitch & 0x7F, 0))
        body += b"\x00\xff\x2f\x00"
        chunks += b"MTrk" + struct.pack(">I", len(body)) + body
    return bytes(chunks)


_CHANNEL_OPERANDS = {
    0x80: 2, 0x90: 2, 0xA0: 2, 0xB0: 2, 0xC0: 1, 0xD0: 1, 0xE0: 2,
}


def decode_midi(data: bytes) -> dict:
    """Decode an SMF stream to {format, n_tracks, division, n_events,
    n_notes, pitch_sum, velocity_sum, ticks_max, tempo_us}."""
    if len(data) < 14 or data[:4] != b"MThd":
        raise ValueError("not an SMF stream")
    hlen, fmt, ntrks, division = struct.unpack(">IHHH", data[4:14])
    if hlen != 6:
        raise ValueError(f"bad MThd length {hlen}")
    if fmt not in (0, 1):
        raise ValueError(f"unsupported SMF format {fmt}")
    i = 14
    n_events = n_notes = pitch_sum = velocity_sum = 0
    ticks_max = 0
    tempo_us = 500000
    tracks_seen = 0

    def read_vlq(pos: int, end: int) -> tuple[int, int]:
        value = 0
        for _ in range(4):
            if pos >= end:
                raise ValueError("truncated VLQ")
            b = data[pos]
            pos += 1
            value = (value << 7) | (b & 0x7F)
            if not b & 0x80:
                return value, pos
        raise ValueError("VLQ longer than 4 bytes")

    while tracks_seen < ntrks:
        if i + 8 > len(data):
            raise ValueError("truncated track header")
        if data[i : i + 4] != b"MTrk":
            raise ValueError("missing MTrk chunk")
        tlen = struct.unpack(">I", data[i + 4 : i + 8])[0]
        pos = i + 8
        end = pos + tlen
        if end > len(data):
            raise ValueError("truncated track body")
        ticks = 0
        running: int | None = None
        ended = False
        while pos < end:
            delta, pos = read_vlq(pos, end)
            ticks += delta
            if pos >= end:
                raise ValueError("truncated event")
            b = data[pos]
            if b >= 0x80:
                status = b
                pos += 1
            else:
                if running is None:
                    raise ValueError("data byte with no running status")
                status = running
            if status == 0xFF:
                if pos >= end:
                    raise ValueError("truncated meta event")
                mtype = data[pos]
                pos += 1
                mlen, pos = read_vlq(pos, end)
                if pos + mlen > end:
                    raise ValueError("truncated meta payload")
                if mtype == 0x51 and mlen == 3:
                    tempo_us = int.from_bytes(data[pos : pos + 3], "big")
                payload_end = pos + mlen
                pos = payload_end
                n_events += 1
                running = None
                if mtype == 0x2F:
                    ended = True
                    break
            elif status in (0xF0, 0xF7):
                slen, pos = read_vlq(pos, end)
                if pos + slen > end:
                    raise ValueError("truncated sysex")
                pos += slen
                n_events += 1
                running = None
            else:
                kind = status & 0xF0
                width = _CHANNEL_OPERANDS.get(kind)
                if width is None:
                    raise ValueError(f"bad status byte {status:#x}")
                if pos + width > end:
                    raise ValueError("truncated channel event")
                d1 = data[pos]
                d2 = data[pos + 1] if width == 2 else 0
                pos += width
                running = status
                n_events += 1
                if kind == 0x90 and d2 > 0:
                    n_notes += 1
                    pitch_sum += d1
                    velocity_sum += d2
        if not ended:
            raise ValueError("track missing end-of-track meta")
        ticks_max = max(ticks_max, ticks)
        i = end
        tracks_seen += 1
    return {
        "format": fmt,
        "n_tracks": ntrks,
        "division": division,
        "n_events": n_events,
        "n_notes": n_notes,
        "pitch_sum": pitch_sum,
        "velocity_sum": velocity_sum,
        "ticks_max": ticks_max,
        "tempo_us": tempo_us,
    }
