"""FLAC codec tests: lossless roundtrips through every subframe type
the encoder emits, CRC verification, stereo decorrelation decode, and
the multimodal audio routing."""

from __future__ import annotations

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.flaccodec import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_encode,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def test_roundtrip_waveforms_lossless():
    t = np.arange(9000) / 16000.0
    cases = {
        "sine": (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16),
        "ramp": np.linspace(-30000, 30000, 7000).astype(np.int16),
        "const": np.full(300, -123, np.int16),
        "noise": np.random.default_rng(5).integers(
            -30000, 30000, 5000).astype(np.int16),
        "tiny": np.array([1, -1, 0, 32767, -32768], np.int16),
    }
    for name, pcm in cases.items():
        out, sr = decode_flac(encode_flac(pcm, 16000))
        assert sr == 16000
        assert (out[:, 0] == pcm).all(), name


def test_roundtrip_stereo_and_rates():
    t = np.arange(5000) / 44100.0
    st = np.stack(
        [(np.sin(2 * np.pi * 440 * t) * 9000).astype(np.int16),
         (np.sin(2 * np.pi * 220 * t) * 7000).astype(np.int16)], 1)
    out, sr = decode_flac(encode_flac(st, 44100))
    assert sr == 44100 and (out == st).all()


def test_compression_on_tonal_signal():
    t = np.arange(32768) / 16000.0
    pcm = (np.sin(2 * np.pi * 200 * t) * 15000).astype(np.int16)
    blob = encode_flac(pcm, 16000)
    assert len(blob) < 0.8 * pcm.nbytes  # fixed predictors actually help


def test_crc_detects_corruption():
    pcm = np.arange(-500, 500, dtype=np.int16)
    blob = bytearray(encode_flac(pcm, 8000))
    blob[-1] ^= 0xFF  # corrupt the final frame's CRC-16 trailer
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob))
    blob = bytearray(encode_flac(pcm, 8000))
    blob[-30] ^= 0x40  # flip a payload bit: CRC or desync, never silence
    with pytest.raises(ValueError, match="CRC|truncated|sync"):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFnotflac")


def test_utf8_frame_numbers():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20):
        enc = _utf8_encode(v)
        br = _BitReader(enc)
        assert _utf8_number(br) == v, v


def test_crc_polynomials_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005, zero-initialized
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_bitio_roundtrip():
    bw = _BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (1, 1), (0xABCD, 16)]
    for v, n in vals:
        bw.write(v, n)
    bw.align()
    br = _BitReader(bw.to_bytes())
    for v, n in vals:
        assert br.read(n) == v


def test_decode_audio_routing():
    from pdf2pdfocr_ray.ops.multimodal import decode_audio
    from pdf2pdfocr_ray.functions.wavcodec import encode_wav

    t = np.arange(4000) / 16000.0
    pcm = 0.4 * np.sin(2 * np.pi * 330 * t)
    wav_s, r1 = decode_audio(encode_wav(pcm, 16000))
    pcm16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int16)
    flac_s, r2 = decode_audio(
        __import__("pdf2pdfocr_ray.functions.flaccodec",
                   fromlist=["encode_flac"]).encode_flac(pcm16, 16000))
    assert r1 == r2 == 16000
    # identical PCM through either container decodes to identical floats
    np.testing.assert_allclose(wav_s[:, 0], flac_s[:, 0], atol=0)
    with pytest.raises(ValueError, match="unknown audio"):
        decode_audio(b"\x00\x01\x02\x03garbage")
