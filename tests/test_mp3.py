"""MP3 frame-header metadata codec pins (operators/mp3.py): the
decoder is checked against HAND-ASSEMBLED spec streams (public MPEG
frame-header layout packed with struct, not our encoder), plus
encoder roundtrips, ID3v2 skipping, Xing/VBRI detection, resync over
junk, truncated-tail handling, and the audio-decode capability
boundary."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.mp3 import (
    decode_mp3_audio,
    decode_mp3_meta,
    encode_mp3,
    frame_length,
)


def _hand_frame(kbps_idx, sr_idx, pad=0, version=3, mono=False, fill=0xAA):
    """A Layer III frame packed straight from the public header spec:
    sync(11) version(2) layer(2) prot(1) | bitrate(4) samplerate(2)
    pad(1) priv(1) | mode(2) ...  — independent of encode_mp3."""
    b1 = 0xFF
    b2 = 0xE0 | (version << 3) | (0b01 << 1) | 1
    b3 = (kbps_idx << 4) | (sr_idx << 2) | (pad << 1)
    b4 = (0xC0 if mono else 0x00)
    table_v1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320]
    table_v2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                96, 112, 128, 144, 160]
    rates = {3: [44100, 48000, 32000],
             2: [22050, 24000, 16000],
             0: [11025, 12000, 8000]}[version]
    kbps = (table_v1 if version == 3 else table_v2)[kbps_idx]
    per = 144000 if version == 3 else 72000
    flen = per * kbps // rates[sr_idx] + pad
    return bytes([b1, b2, b3, b4]) + bytes([fill]) * (flen - 4)


def test_hand_assembled_cbr_stream():
    # two 128 kbps 44100 Hz stereo MPEG-1 frames, second padded
    raw = _hand_frame(9, 0) + _hand_frame(9, 0, pad=1)
    m = decode_mp3_meta(raw)
    assert m["n_frames"] == 2
    assert m["sample_rate"] == 44100
    assert (m["kbps_min"], m["kbps_max"]) == (128, 128)
    # spec frame lengths: 417 and 418 bytes
    assert m["n_bytes"] == 417 + 418
    assert m["duration_us"] == 2 * (1152 * 1_000_000 // 44100)
    assert m["is_vbr"] == 0 and m["has_xing"] == 0
    assert m["junk_bytes"] == 0


def test_hand_assembled_mpeg2_mono():
    # MPEG-2 Layer III: 576 samples/frame, 72000 multiplier, mono
    raw = _hand_frame(5, 2, version=2, mono=True) * 3
    m = decode_mp3_meta(raw)
    assert m["n_frames"] == 3
    assert m["sample_rate"] == 16000
    assert m["kbps_min"] == 40
    # 72000*40//16000 = 180 bytes per frame
    assert m["n_bytes"] == 3 * 180
    assert m["duration_us"] == 3 * (576 * 1_000_000 // 16000)


def test_hand_assembled_id3v2_skip():
    # ID3v2.4 header: 'ID3', ver 4.0, flags 0, syncsafe size 200
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes(
        [(200 >> 21) & 0x7F, (200 >> 14) & 0x7F,
         (200 >> 7) & 0x7F, 200 & 0x7F]
    ) + bytes(200)
    raw = id3 + _hand_frame(9, 0)
    m = decode_mp3_meta(raw)
    assert m["id3_bytes"] == 210
    assert m["n_frames"] == 1
    assert m["junk_bytes"] == 0  # the tag was skipped, not scanned


def test_hand_assembled_xing_header():
    # Xing sits after 32 side-info bytes (MPEG-1 stereo, no CRC):
    # frame[4+32 : 4+32+12] = 'Xing' + flags(frames) + frame count
    frame = bytearray(_hand_frame(9, 0, fill=0))
    off = 4 + 32
    frame[off:off + 12] = b"Xing" + struct.pack(">I", 1) + struct.pack(
        ">I", 777
    )
    m = decode_mp3_meta(bytes(frame))
    assert m["has_xing"] == 1
    assert m["xing_frames"] == 777
    assert m["is_vbr"] == 1  # Xing marks VBR even with one bitrate


def test_hand_assembled_vbri_header():
    # VBRI sits at fixed offset 32 after the header (i.e. byte 36);
    # its frame-count field is 14 bytes into the VBRI block
    frame = bytearray(_hand_frame(9, 0, fill=0))
    frame[36:40] = b"VBRI"
    frame[50:54] = struct.pack(">I", 55)
    m = decode_mp3_meta(bytes(frame))
    assert m["has_xing"] == 1
    assert m["xing_frames"] == 55


def test_resync_over_junk_and_truncated_tail():
    f = _hand_frame(9, 0)
    raw = b"\x00\x01\x02\x03" + f + b"\xff\x00" + f + f[:100]
    m = decode_mp3_meta(raw)
    assert m["n_frames"] == 2  # truncated tail not counted
    assert m["junk_bytes"] == 6


def test_junk_only_stream_is_empty_not_crash():
    m = decode_mp3_meta(bytes(range(200)))
    assert m["n_frames"] == 0
    assert m["duration_us"] == 0
    assert m["sample_rate"] == 0
    assert m["kbps_min"] == 0 and m["kbps_max"] == 0


def test_encoder_roundtrip_matches_spec_arithmetic():
    idxs = [3, 7, 12, 5, 9]
    pads = [1, 0, 1, 0, 1]
    raw = encode_mp3(idxs, samplerate_idx=1, paddings=pads, id3_size=17,
                     xing=True)
    m = decode_mp3_meta(raw)
    table = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
             160, 192, 224, 256, 320]
    kbps = [table[i] for i in idxs]
    assert m["n_frames"] == 5
    assert m["sample_rate"] == 48000
    assert m["kbps_sum"] == sum(kbps)
    assert (m["kbps_min"], m["kbps_max"]) == (min(kbps), max(kbps))
    assert m["n_bytes"] == 27 + sum(
        frame_length(3, k, 48000, p) for k, p in zip(kbps, pads)
    )
    assert m["xing_frames"] == 5
    assert m["is_vbr"] == 1 and m["id3_bytes"] == 27


def test_audio_decode_is_a_capability_boundary():
    with pytest.raises(NotImplementedError):
        decode_mp3_audio(b"\xff\xfb\x90\x00")
