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


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """G.711 expansion tables, derived from the ITU formulas (both laws
    are pure segment/mantissa codecs — no tabulated constants).

    A-law: code XORed with 0x55; segment s = bits 4-6, mantissa m = bits
    0-3; magnitude = (m<<4)+8 for s=0 else ((m<<4)+0x108) << (s-1).
    mu-law: code inverted; magnitude = ((m<<3)+0x84) << s, minus the 0x84
    bias."""
    codes = np.arange(256, dtype=np.uint8)

    a = codes ^ 0x55
    sign_a = np.where(a & 0x80, 1.0, -1.0)  # MSB set = positive in A-law
    seg = (a >> 4) & 0x07
    man = (a & 0x0F).astype(np.int64)
    mag = np.where(seg == 0, (man << 4) + 8, ((man << 4) + 0x108) << np.maximum(seg - 1, 0))
    alaw = (sign_a * mag).astype(np.int64)

    u = (~codes) & 0xFF
    sign_u = np.where(codes & 0x80, 1.0, -1.0)  # inverted-domain MSB: code
    # 0x00 -> u=0xFF (sign bit set) = negative full-scale -32124
    seg_u = (u >> 4) & 0x07
    man_u = (u & 0x0F).astype(np.int64)
    mag_u = (((man_u << 3) + 0x84) << seg_u) - 0x84
    mulaw = (sign_u * mag_u).astype(np.int64)
    return alaw, mulaw


_ALAW_TABLE, _MULAW_TABLE = _g711_tables()


def encode_alaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float [-1, 1] (n,) or (n, ch) -> A-law WAV bytes (format tag 6),
    encoded by nearest-magnitude inverse of the expansion table."""
    return _encode_g711(samples, rate, fmt_tag=6)


def encode_mulaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float [-1, 1] -> mu-law WAV bytes (format tag 7)."""
    return _encode_g711(samples, rate, fmt_tag=7)


def _encode_g711(samples: np.ndarray, rate: int, fmt_tag: int) -> bytes:
    table = _ALAW_TABLE if fmt_tag == 6 else _MULAW_TABLE
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int64)
    # nearest expanded value via the sorted table (256 entries)
    order = np.argsort(table)
    sorted_vals = table[order]
    pos = np.searchsorted(sorted_vals, pcm.reshape(-1))
    pos = np.clip(pos, 1, 255)
    left = sorted_vals[pos - 1]
    right = sorted_vals[np.minimum(pos, 255)]
    pick = np.where(np.abs(pcm.reshape(-1) - left)
                    <= np.abs(right - pcm.reshape(-1)), pos - 1, pos)
    codes = order[pick].astype(np.uint8)
    payload = codes.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * ch, ch, 8)
    return (hdr + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)


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
    if audio_fmt in (6, 7):  # G.711 A-law / mu-law (telephony WAVs)
        raw8 = np.frombuffer(payload, dtype=np.uint8)
        pcm = (_ALAW_TABLE if audio_fmt == 6 else _MULAW_TABLE)[raw8]
        if channels > 1:
            pcm = pcm[: len(pcm) - len(pcm) % channels].reshape(-1, channels)
        else:
            pcm = pcm.reshape(-1, 1)
        return pcm.astype(np.float64) / 32767.0, int(rate)
    dtype = _FMT_DTYPES.get((audio_fmt, bits))
    if dtype is None:
        raise ValueError(
            f"unsupported WAV format {audio_fmt}/{bits}-bit (PCM 8/16/32, "
            "float32, A-law, mu-law only)"
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
