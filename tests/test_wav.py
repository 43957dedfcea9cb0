"""Unit tests for the stdlib WAV/PCM codec (operators/wav.py) — the
real-bytes audio slice of the multimodal path."""

from __future__ import annotations

import struct

import pytest

from local_stream_stack_spark.operators.wav import (
    decode_audio,
    decode_wav,
    encode_wav,
)


def _wave(did: int):
    channels = 1 + did % 2
    rate = 8000 if did % 3 == 0 else 16000
    bd = 8 if did % 5 == 0 else 16
    m, h = (251, 125) if bd == 8 else (4093, 2046)
    n = 120 + did % 83
    samples = [
        (did * 37 + i * 17 + c * 29) % m - h
        for i in range(n)
        for c in range(channels)
    ]
    return rate, channels, bd, samples


@pytest.mark.parametrize("did", range(16))
def test_roundtrip_all_width_channel_combos(did):
    rate, channels, bd, samples = _wave(did)
    rate2, ch2, bd2, dec = decode_wav(encode_wav(rate, channels, samples, bd))
    assert (rate2, ch2, bd2) == (rate, channels, bd)
    assert dec == samples


def test_decode_audio_stats():
    rate, channels, bd, samples = _wave(7)
    a = decode_audio(encode_wav(rate, channels, samples, bd))
    n = len(samples) // channels
    assert a["n_frames"] == n
    assert a["duration_ms"] == n * 1000 // rate
    assert a["amp_sum"] == sum(samples)
    assert a["amp_min"] == min(samples)
    assert a["amp_max"] == max(samples)


def test_skips_unknown_chunks_and_odd_padding():
    """Real WAV files carry LIST/INFO chunks; the parser must skip
    them (including the RIFF odd-length pad byte) and still find
    fmt/data."""
    rate, channels, bd, samples = _wave(1)
    enc = bytearray(encode_wav(rate, channels, samples, bd))
    # splice an odd-length junk chunk right after 'WAVE'
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    enc2 = bytes(enc[:12]) + junk + bytes(enc[12:])
    assert decode_wav(enc2)[3] == samples


def test_rejects_non_wav_and_non_pcm():
    with pytest.raises(ValueError):
        decode_wav(b"\x89PNG\r\n\x1a\nnot a wav")
    enc = bytearray(encode_wav(8000, 1, [0, 1, 2], 16))
    # flip the PCM format tag (first 2 bytes of fmt body at offset 20)
    enc[20:22] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(enc))


def test_eight_bit_is_unsigned_on_disk():
    enc = encode_wav(8000, 1, [-128, 0, 127], 8)
    # data chunk body: 0x00, 0x80, 0xFF
    assert enc.endswith(b"\x00\x80\xff\x00")  # + pad byte (3 is odd)
    assert decode_wav(enc)[3] == [-128, 0, 127]
