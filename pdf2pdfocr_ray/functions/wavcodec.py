"""Minimal RIFF/WAVE (PCM) codec, pure numpy.

Replaces the audio stub in ops/multimodal: WAV is a chunked RIFF file
whose PCM payload needs no external library — 8/16/32-bit integer and
32-bit float PCM, mono or interleaved multi-channel.  Compressed formats
(MP3/AAC/...) remain out of scope and raise ``ValueError``.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_DTYPES = {
    (1, 8): np.uint8,  # PCM unsigned 8-bit
    (1, 16): np.int16,
    (1, 32): np.int32,
    (3, 32): np.float32,  # IEEE float
}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 in [-1, 1] of shape (n, channels),
    sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt
    dtype = _FMT_DTYPES.get((audio_fmt, bits))
    if dtype is None:
        raise ValueError(
            f"unsupported WAV format {audio_fmt}/{bits}-bit (PCM 8/16/32 "
            "and float32 only)"
        )
    raw = np.frombuffer(payload, dtype=dtype)
    if channels > 1:
        raw = raw[: len(raw) - len(raw) % channels].reshape(-1, channels)
    else:
        raw = raw.reshape(-1, 1)
    if dtype == np.uint8:
        out = (raw.astype(np.float64) - 128.0) / 128.0
    elif dtype == np.float32:
        out = raw.astype(np.float64)
    else:
        out = raw.astype(np.float64) / float(np.iinfo(dtype).max)
    return out, int(rate)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    channels = s.shape[1]
    block = channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16
    )
    hdr += b"data" + struct.pack("<I", len(payload))
    return hdr + payload
