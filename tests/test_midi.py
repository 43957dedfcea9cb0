"""SMF (MIDI) codec pins: hand-assembled byte streams for VLQ edges,
running status, vel-0 note-off, tempo meta; encoder round-trips;
format guards."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.midi import (
    decode_midi,
    encode_midi,
)


def _hdr(ntrks, division=480, fmt=1):
    return b"MThd" + struct.pack(">IHHH", 6, fmt, ntrks, division)


def _trk(body):
    return b"MTrk" + struct.pack(">I", len(body)) + body


def test_decode_hand_assembled_vlq_and_running_status():
    # delta 0x81 0x48 = 200 ticks; two notes under ONE status byte
    body = (
        b"\x81\x48"          # VLQ 200
        + b"\x90\x3c\x40"    # note-on C4 vel 64
        + b"\x00\x3e\x50"    # RUNNING STATUS note-on D4 vel 80
        + b"\x10\x3c\x00"    # running: vel 0 == note-OFF (not a note)
        + b"\x00\xff\x2f\x00"
    )
    out = decode_midi(_hdr(1) + _trk(body))
    assert out["n_notes"] == 2
    assert out["pitch_sum"] == 0x3C + 0x3E
    assert out["velocity_sum"] == 0x40 + 0x50
    assert out["ticks_max"] == 200 + 0 + 0x10
    assert out["n_events"] == 4  # 3 channel + end-of-track


def test_decode_tempo_meta_and_multi_track_ticks():
    t1 = (
        b"\x00\xff\x51\x03\x07\xa1\x20"  # tempo 500000
        + b"\x00\xff\x2f\x00"
    )
    t2 = (
        b"\x82\x00"              # VLQ 256
        + b"\x91\x45\x30"
        + b"\x40\x45\x00"
        + b"\x00\xff\x2f\x00"
    )
    out = decode_midi(_hdr(2) + _trk(t1) + _trk(t2))
    assert out["tempo_us"] == 500000
    assert out["ticks_max"] == 256 + 0x40
    assert out["n_tracks"] == 2


def test_roundtrip_with_running_status_encoder():
    tracks = [
        [(10 + i, 40 + i * 3, 30 + i, 20 + i) for i in range(6)],
        [(5, 60, 90, 15), (0, 61, 91, 480)],
    ]
    out = decode_midi(encode_midi(tracks, division=96, tempo_us=350000))
    assert out["format"] == 1 and out["n_tracks"] == 3
    assert out["division"] == 96 and out["tempo_us"] == 350000
    assert out["n_notes"] == 8
    assert out["pitch_sum"] == sum(p for t in tracks for _, p, _, _ in t)
    assert out["velocity_sum"] == sum(
        max(1, v & 0x7F) for t in tracks for _, _, v, _ in t
    )
    assert out["ticks_max"] == max(
        sum(d + od for d, _, _, od in t) for t in tracks
    )


def test_guards():
    with pytest.raises(ValueError):
        decode_midi(b"nope")
    # missing MTrk
    with pytest.raises(ValueError):
        decode_midi(_hdr(1) + b"XXXX\x00\x00\x00\x00")
    # data byte with no running status
    with pytest.raises(ValueError):
        decode_midi(_hdr(1) + _trk(b"\x00\x3c\x40\x00\xff\x2f\x00"))
    # track without end-of-track
    with pytest.raises(ValueError):
        decode_midi(_hdr(1) + _trk(b"\x00\x90\x3c\x40"))
    # truncated VLQ / overlong VLQ
    with pytest.raises(ValueError):
        decode_midi(_hdr(1) + _trk(b"\x81"))
    with pytest.raises(ValueError):
        decode_midi(_hdr(1) + _trk(b"\x81\x81\x81\x81\x81\x00"))
