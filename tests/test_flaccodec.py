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


def _stream_with_frame(frame_body_bits, n_samples, channels=1,
                       rate=8000) -> bytes:
    """Wrap hand-written subframe bits in a valid frame + STREAMINFO."""
    import struct

    from pdf2pdfocr_ray.functions.flaccodec import _crc8, _crc16

    hdr = _BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)
    hdr.write(7, 4)       # 16-bit blocksize at end of header
    hdr.write(0, 4)       # rate from STREAMINFO
    hdr.write(channels - 1, 4)
    hdr.write(4, 3)       # 16-bit samples
    hdr.write(0, 1)
    hdr.align()
    head = hdr.to_bytes() + b"\x00"  # frame number 0
    head += struct.pack(">H", n_samples - 1)
    head += bytes([_crc8(head)])
    frame = head + frame_body_bits
    frame += struct.pack(">H", _crc16(frame))

    info = _BitWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(15, 5)  # bps-1
    info.write(n_samples, 36)
    info.align()
    si = info.to_bytes() + b"\x00" * 16
    meta = bytes([0x80]) + struct.pack(">I", len(si))[1:] + si
    return b"fLaC" + meta + frame


def test_lpc_subframe_decodes():
    """Hand-built LPC subframe (order 2, shift 1, coefs [3, -1]): the
    decoder must reproduce sample[i] = ((3*s[i-1] - s[i-2]) >> 1) + r[i]
    — a path our fixed-predictor encoder never emits."""
    warm = [100, 110]
    residuals = [5, -3, 0, 7, -2, 1]
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(32 + 1, 6)  # LPC, order = (type & 31) + 1 = 2
    bw.write(0, 1)       # no wasted bits
    for wv in warm:
        bw.write(wv, 16)
    bw.write(11, 4)      # precision-1 -> 12-bit coefficients
    bw.write(1, 5)       # shift 1
    for c in (3, -1):
        bw.write(c & 0xFFF, 12)
    bw.write(0, 2)       # rice method 0
    bw.write(0, 4)       # partition order 0
    bw.write(3, 4)       # rice parameter 3
    for v in residuals:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        bw.write_unary(u >> 3)
        bw.write(u & 7, 3)
    bw.align()
    blob = _stream_with_frame(bw.to_bytes(), 8)
    out, sr = decode_flac(blob)
    exp = list(warm)
    for r in residuals:
        pred = (3 * exp[-1] - exp[-2]) >> 1
        exp.append(pred + r)
    assert out[:, 0].tolist() == exp


def test_escape_partition_and_order():
    """Partition order 1 with one rice and one ESCAPED (raw 6-bit)
    partition — paths the encoder never writes."""
    n = 8
    vals = [7, -7, 3, -3]  # second partition, raw 6-bit signed
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(8, 6)   # FIXED order 0
    bw.write(0, 1)
    bw.write(0, 2)   # rice method 0
    bw.write(1, 4)   # partition order 1 -> two partitions of 4
    bw.write(2, 4)   # partition 1: rice param 2
    for v in (1, -1, 2, 0):
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> 2)
        bw.write(u & 3, 2)
    bw.write(15, 4)  # partition 2: escape
    bw.write(6, 5)   # raw 6-bit residuals
    for v in vals:
        bw.write(v & 0x3F, 6)
    bw.align()
    out, _ = decode_flac(_stream_with_frame(bw.to_bytes(), n))
    assert out[:, 0].tolist() == [1, -1, 2, 0] + vals


def test_wasted_bits_shift():
    """A subframe with 2 wasted bits: decoded samples are shifted left
    by 2 (the spec's trailing-zero optimization)."""
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)   # CONSTANT
    bw.write(1, 1)   # wasted-bits flag
    bw.write_unary(1)  # 1 + unary(1) = 2 wasted bits
    bw.write(25, 14)   # constant coded at bps - 2 = 14 bits
    bw.align()
    out, _ = decode_flac(_stream_with_frame(bw.to_bytes(), 5))
    assert (out[:, 0] == 100).all()  # 25 << 2


def test_flac_property_roundtrip():
    """Property: any int16 sample array (1-2 channels, any length)
    roundtrips losslessly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 600),
        ch=st.integers(1, 2),
        seed=st.integers(0, 2**31),
        kind=st.sampled_from(["noise", "smooth", "const", "alt"]),
    )
    def check(n, ch, seed, kind):
        rng = np.random.default_rng(seed)
        if kind == "noise":
            pcm = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        elif kind == "smooth":
            t = np.arange(n)[:, None] + np.arange(ch)[None, :]
            pcm = (np.sin(t / 9.0) * 20000).astype(np.int16)
        elif kind == "const":
            pcm = np.full((n, ch), int(rng.integers(-32768, 32768)),
                          np.int16)
        else:
            pcm = (((np.arange(n * ch) % 2) * 2 - 1) * 30000).reshape(
                n, ch).astype(np.int16)
        out, sr = decode_flac(encode_flac(pcm, 22050))
        assert sr == 22050
        assert (out == pcm).all()

    check()
