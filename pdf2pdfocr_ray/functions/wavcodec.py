"""Minimal RIFF/WAVE (PCM) codec, pure numpy.

Replaces the audio stub in ops/multimodal: WAV is a chunked RIFF file
whose PCM payload needs no external library — 8/16/32-bit integer and
32-bit float PCM, G.711 A-law/mu-law (tags 6/7) and IMA/DVI ADPCM
(tag 17), mono or interleaved multi-channel.  Other compressed formats
(MP3/AAC/...) are routed by ops.multimodal.decode_audio to their own
codecs or raise ``ValueError``.
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


# ---------------------------------------------------------------- IMA ADPCM
# IMA "Recommended Practices for Enhancing Digital Audio Compatibility",
# rev 3.00 (1992); WAVE registration = format tag 17 (DVI/IMA ADPCM).
# The step table (89 entries) and index-adjust table are the published
# constants; the per-nibble update is the 4-bit magnitude expansion
# diff = step/8 + b0*step/4 + b1*step/2 + b2*step with sign bit 8.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step_update(pred, idx, nib):
    """One IMA update, vectorized over any shape: (pred, idx) int64
    arrays + nibble array -> new (pred, idx).  Shared verbatim by the
    encoder and decoder so they cannot drift."""
    st = _IMA_STEPS[idx]
    diff = (st >> 3) + (nib & 1) * (st >> 2) + ((nib >> 1) & 1) * (st >> 1) \
        + ((nib >> 2) & 1) * st
    pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX_ADJ[nib & 7], 0, 88)
    return pred, idx


def _ima_block_nibbles(data: np.ndarray, channels: int) -> np.ndarray:
    """(nb, block_align - 4*ch) uint8 data bytes -> (nb, spb-1, ch)
    nibbles.  Data is interleaved in 4-byte words per channel (8 samples
    per channel per word group), low nibble first within each byte."""
    nb = data.shape[0]
    words = data.reshape(nb, -1, channels, 4)  # (nb, groups, ch, 4B)
    nib = np.empty(words.shape + (2,), dtype=np.int64)
    nib[..., 0] = words & 0x0F
    nib[..., 1] = words >> 4
    # (nb, groups, ch, 8 samples) -> (nb, groups*8, ch)
    return nib.reshape(nb, -1, channels, 8).transpose(0, 1, 3, 2).reshape(
        nb, -1, channels)


def _decode_ima_adpcm(payload: bytes, channels: int, block_align: int,
                      total_samples: int | None) -> np.ndarray:
    """IMA ADPCM data chunk -> int64 PCM of shape (n, channels).
    Vectorized across blocks (each block is an independent decode unit
    with its own header predictor/index); only the spb-long within-block
    recurrence is a Python loop."""
    hdr_len = 4 * channels
    if block_align <= hdr_len or (block_align - hdr_len) % (4 * channels):
        raise ValueError(f"bad IMA ADPCM block_align {block_align}")
    raw = np.frombuffer(payload, dtype=np.uint8)
    nb_full, rem = divmod(len(raw), block_align)
    spb = (block_align - hdr_len) * 2 // channels + 1
    n_out = nb_full * spb
    if rem:
        if rem < hdr_len:
            rem = 0  # dangling fragment too short to hold a header
        else:
            data_rem = (rem - hdr_len) // (4 * channels) * (4 * channels)
            n_out += 1 + data_rem * 2 // channels
            pad = np.zeros(block_align - hdr_len - data_rem, dtype=np.uint8)
            raw = np.concatenate(
                [raw[: nb_full * block_align + hdr_len + data_rem], pad])
    blk = raw[: (nb_full + (1 if rem else 0)) * block_align].reshape(
        -1, block_align)
    nb = blk.shape[0]
    if nb == 0:
        return np.zeros((0, channels), dtype=np.int64)
    hdr = blk[:, :hdr_len].reshape(nb, channels, 4).astype(np.int64)
    pred = hdr[..., 0] | (hdr[..., 1] << 8)
    pred = np.where(pred >= 32768, pred - 65536, pred)  # int16 LE
    idx = np.clip(hdr[..., 2], 0, 88)
    nibs = _ima_block_nibbles(blk[:, hdr_len:], channels)
    out = np.empty((nb, spb, channels), dtype=np.int64)
    out[:, 0, :] = pred
    for s in range(spb - 1):
        pred, idx = _ima_step_update(pred, idx, nibs[:, s, :])
        out[:, s + 1, :] = pred
    out = out.reshape(-1, channels)
    if total_samples is not None:
        n_out = min(n_out, total_samples)
    return out[:n_out]


def encode_ima_adpcm(samples: np.ndarray, rate: int = 16000,
                     block_align: int | None = None) -> bytes:
    """float [-1, 1] (n,) or (n, ch) -> IMA ADPCM WAV bytes (format tag
    17, 4 bits/sample, ``fact`` chunk with the true sample count).

    Each block's header carries its first PCM sample verbatim plus a
    spec-legal initial step index chosen from the block's median
    |first difference| (kills the step-table adaptation transient a
    reset-to-0 index would cost), so blocks stay independent and the
    encoder vectorizes across them like the decoder."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if n == 0:
        raise ValueError("empty audio")
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int64)
    if block_align is None:
        block_align = 256 * ch
    hdr_len = 4 * ch
    spb = (block_align - hdr_len) * 2 // ch + 1
    nb = (n + spb - 1) // spb
    padded = np.empty((nb * spb, ch), dtype=np.int64)
    padded[:n] = pcm
    padded[n:] = pcm[-1]  # hold the last sample through block padding
    blocks = padded.reshape(nb, spb, ch)
    pred = blocks[:, 0, :].copy()
    # per-block initial index: nearest step to the median |delta|
    med = np.median(np.abs(np.diff(blocks, axis=1)), axis=1).astype(np.int64)
    idx = np.clip(np.searchsorted(_IMA_STEPS, med), 0, 88)
    idx0 = idx.copy()
    codes = np.empty((nb, spb - 1, ch), dtype=np.int64)
    for s in range(spb - 1):
        st = _IMA_STEPS[idx]
        delta = blocks[:, s + 1, :] - pred
        sign = (delta < 0).astype(np.int64)
        mag = np.abs(delta)
        b2 = (mag >= st).astype(np.int64)
        mag = mag - b2 * st
        b1 = (mag >= (st >> 1)).astype(np.int64)
        mag = mag - b1 * (st >> 1)
        b0 = (mag >= (st >> 2)).astype(np.int64)
        nib = (sign << 3) | (b2 << 2) | (b1 << 1) | b0
        codes[:, s, :] = nib
        pred, idx = _ima_step_update(pred, idx, nib)
    # pack: header (pred int16 LE, index, reserved) per channel, then
    # 4-byte words per channel interleaved, low nibble first
    p0 = blocks[:, 0, :]
    hdr = np.empty((nb, ch, 4), dtype=np.uint8)
    hdr[..., 0] = p0 & 0xFF
    hdr[..., 1] = (p0 >> 8) & 0xFF
    hdr[..., 2] = idx0
    hdr[..., 3] = 0
    # (nb, spb-1, ch) -> (nb, groups, 8, ch) -> (nb, groups, ch, 8)
    grp = codes.reshape(nb, -1, 8, ch).transpose(0, 1, 3, 2)
    by = (grp[..., 0::2] | (grp[..., 1::2] << 4)).astype(np.uint8)
    payload = np.concatenate(
        [hdr.reshape(nb, -1), by.reshape(nb, -1)], axis=1).tobytes()
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 17, ch, rate, byte_rate, block_align,
                      4, 2, spb)
    out = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"fact" + struct.pack("<II", 4, n)
           + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


# ----------------------------------------------------------------- MS ADPCM
# WAVE_FORMAT_ADPCM (tag 2), Microsoft multimedia standards: 2nd-order
# linear predictor from a 7-pair coefficient table + per-nibble delta
# adaptation.  Both tables are the published constants; files may carry
# a custom coefficient table in the fmt extension (honored when present).
_MS_COEFS = np.array([
    [256, 0], [512, -256], [0, 0], [192, 64],
    [240, 0], [460, -208], [392, -232],
], dtype=np.int64)
_MS_ADAPT = np.array([
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
], dtype=np.int64)


def _decode_ms_adpcm(payload: bytes, channels: int, block_align: int,
                     total_samples: int | None,
                     coefs: np.ndarray) -> np.ndarray:
    """MS ADPCM data chunk -> int64 PCM (n, channels), vectorized across
    blocks.  Block header per channel: predictor index (u8), iDelta
    (i16), iSamp1 (i16), iSamp2 (i16) — header fields grouped by kind,
    channels within each group; nibbles are HIGH-first and interleave
    channels sample-by-sample."""
    hdr_len = 7 * channels
    if block_align <= hdr_len:
        raise ValueError(f"bad MS ADPCM block_align {block_align}")
    raw = np.frombuffer(payload, dtype=np.uint8)
    nb_full, rem = divmod(len(raw), block_align)
    spb = (block_align - hdr_len) * 2 // channels + 2
    n_out = nb_full * spb
    if rem:
        if rem < hdr_len:
            rem = 0
        else:
            data_rem = (rem - hdr_len) * 2 // channels * channels // 2
            n_out += 2 + data_rem * 2 // channels
            pad = np.zeros(block_align - hdr_len - data_rem, dtype=np.uint8)
            raw = np.concatenate(
                [raw[: nb_full * block_align + hdr_len + data_rem], pad])
    blk = raw[: (nb_full + (1 if rem else 0)) * block_align].reshape(
        -1, block_align)
    nb = blk.shape[0]
    if nb == 0:
        return np.zeros((0, channels), dtype=np.int64)

    def i16(lo, hi):
        v = lo.astype(np.int64) | (hi.astype(np.int64) << 8)
        return np.where(v >= 32768, v - 65536, v)

    ch = channels
    pidx = np.clip(blk[:, :ch].astype(np.int64), 0, len(coefs) - 1)
    delta = i16(blk[:, ch:3 * ch:2], blk[:, ch + 1:3 * ch:2])
    samp1 = i16(blk[:, 3 * ch:5 * ch:2], blk[:, 3 * ch + 1:5 * ch:2])
    samp2 = i16(blk[:, 5 * ch:7 * ch:2], blk[:, 5 * ch + 1:7 * ch:2])
    c1 = coefs[pidx, 0]
    c2 = coefs[pidx, 1]
    data = blk[:, hdr_len:]
    nib = np.empty(data.shape + (2,), dtype=np.int64)
    nib[..., 0] = data >> 4  # high nibble first
    nib[..., 1] = data & 0x0F
    nib = nib.reshape(nb, -1, ch)  # sample-interleaved across channels
    out = np.empty((nb, spb, ch), dtype=np.int64)
    out[:, 0, :] = samp2  # the OLDER header sample plays first
    out[:, 1, :] = samp1
    delta = np.maximum(delta, 16)
    for s in range(spb - 2):
        n = nib[:, s, :]
        sn = np.where(n >= 8, n - 16, n)
        pred = (samp1 * c1 + samp2 * c2) >> 8
        sample = np.clip(pred + delta * sn, -32768, 32767)
        out[:, s + 2, :] = sample
        samp2 = samp1
        samp1 = sample
        delta = np.maximum((_MS_ADAPT[n] * delta) >> 8, 16)
    out = out.reshape(-1, ch)
    if total_samples is not None:
        n_out = min(n_out, total_samples)
    return out[:n_out]


def encode_ms_adpcm(samples: np.ndarray, rate: int = 16000,
                    block_align: int | None = None) -> bytes:
    """float [-1, 1] (n,) or (n, ch) -> MS ADPCM WAV bytes (format tag
    2, 4 bits/sample, standard 7-pair coefficient table in the fmt
    extension, ``fact`` chunk with the true sample count).

    Per block/channel the coefficient pair minimizing the sum of
    |2nd-order prediction residuals| over the TRUE samples is chosen
    and iDelta seeded from the mean residual — both spec-legal header
    choices, so blocks stay independent and the encoder vectorizes
    across them."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if n < 2:
        raise ValueError("MS ADPCM needs at least 2 samples")
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int64)
    if block_align is None:
        block_align = 256 * ch
    hdr_len = 7 * ch
    spb = (block_align - hdr_len) * 2 // ch + 2
    nb = (n + spb - 1) // spb
    padded = np.empty((nb * spb, ch), dtype=np.int64)
    padded[:n] = pcm
    padded[n:] = pcm[-1]
    blocks = padded.reshape(nb, spb, ch)
    # pick the best predictor per (block, channel) on true samples
    prev1 = blocks[:, 1:-1, :]  # x[t-1]
    prev2 = blocks[:, :-2, :]   # x[t-2]
    cur = blocks[:, 2:, :]
    resid = np.abs(
        cur[None] - ((prev1[None] * _MS_COEFS[:, 0, None, None, None]
                      + prev2[None] * _MS_COEFS[:, 1, None, None, None])
                     >> 8)
    ).sum(axis=2)  # (7, nb, ch)
    pidx = resid.argmin(axis=0)  # (nb, ch)
    c1 = _MS_COEFS[pidx, 0]
    c2 = _MS_COEFS[pidx, 1]
    best = resid[pidx, np.arange(nb)[:, None], np.arange(ch)[None, :]]
    delta0 = np.maximum(best // max(spb - 2, 1) // 4, 16)
    samp2 = blocks[:, 0, :].copy()
    samp1 = blocks[:, 1, :].copy()
    delta = delta0.copy()
    codes = np.empty((nb, spb - 2, ch), dtype=np.int64)
    for s in range(spb - 2):
        pred = (samp1 * c1 + samp2 * c2) >> 8
        e = blocks[:, s + 2, :] - pred
        sn = np.clip(
            np.floor_divide(2 * e + delta, 2 * delta), -8, 7)
        codes[:, s, :] = sn & 0x0F
        sample = np.clip(pred + delta * sn, -32768, 32767)
        samp2 = samp1
        samp1 = sample
        delta = np.maximum((_MS_ADAPT[sn & 0x0F] * delta) >> 8, 16)
    hdr = np.empty((nb, hdr_len), dtype=np.uint8)
    hdr[:, :ch] = pidx
    for name, off in ((delta0, ch), (blocks[:, 1, :], 3 * ch),
                      (blocks[:, 0, :], 5 * ch)):
        v = name & 0xFFFF
        hdr[:, off:off + 2 * ch:2] = v & 0xFF
        hdr[:, off + 1:off + 2 * ch:2] = v >> 8
    flat = codes.reshape(nb, -1)  # sample-interleaved across channels
    by = ((flat[:, 0::2] << 4) | flat[:, 1::2]).astype(np.uint8)
    payload = np.concatenate([hdr, by], axis=1).tobytes()
    byte_rate = (rate * block_align + spb - 1) // spb
    ext = struct.pack("<HH", spb, len(_MS_COEFS)) + b"".join(
        struct.pack("<hh", int(a), int(b)) for a, b in _MS_COEFS)
    fmt = struct.pack("<HHIIHHH", 2, ch, rate, byte_rate, block_align,
                      4, len(ext)) + ext
    out = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"fact" + struct.pack("<II", 4, n)
           + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 in [-1, 1] of shape (n, channels),
    sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    fact_samples = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            payload = body
        elif cid == b"fact" and len(body) >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_fmt == 17:  # IMA/DVI ADPCM
        pcm = _decode_ima_adpcm(payload, max(channels, 1), block_align,
                                fact_samples)
        return pcm.astype(np.float64) / 32767.0, int(rate)
    if audio_fmt == 2:  # MS ADPCM
        coefs = _MS_COEFS
        if len(fmt_body) >= 22:  # cbSize ext: spb, nCoef, coef pairs
            (ncoef,) = struct.unpack_from("<H", fmt_body, 20)
            if ncoef and len(fmt_body) >= 22 + 4 * ncoef:
                coefs = np.frombuffer(
                    fmt_body[22:22 + 4 * ncoef], dtype="<i2"
                ).astype(np.int64).reshape(ncoef, 2)
        pcm = _decode_ms_adpcm(payload, max(channels, 1), block_align,
                               fact_samples, coefs)
        return pcm.astype(np.float64) / 32767.0, int(rate)
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
            "float32, A-law, mu-law, IMA ADPCM only)"
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
