"""Pure-Python/numpy MPEG audio Layer III (mp3) codec.

Reference parity: the reference engine accepts mp3 via its shelled-out
binaries (reference pdf2pdfocr.py delegates all media decode to
external tools); this engine decodes in-process so the multimodal audio
stages run real code on mp3 rows.

Scope
-----
* ``decode_mp3``: MPEG-1 (32/44.1/48 kHz, 2 granules) and MPEG-2 LSF
  (16/22.05/24 kHz, 1 granule) Layer III; mono, stereo, joint stereo
  (MS fully; MPEG-1 intensity for long+short blocks), long / short /
  start / stop / mixed blocks, scfsi scalefactor reuse, the bit
  reservoir (``main_data_begin``), preflag/pretab, subblock gains,
  alias reduction, windowed IMDCT with overlap-add and frequency
  inversion, and the 32-band synthesis filterbank.  Frames that select
  Huffman tables outside the structurally-validated subset raise
  ``Mp3UnsupportedTable`` (see mp3_tables docstring) — callers treat a
  payload as an isolated decode error, never a crash.
* ``encode_mp3``: a conforming MPEG-1 encoder used for fixtures and
  roundtrips — long blocks, per-granule global_gain fit so quantized
  lines fit the validated tables (|value| <= 5), per-region Huffman
  table choice by exact bit cost, count1 tail, per-band scalefactors
  (scalefac_scale=1) so quiet bands keep full mantissa range, no
  reservoir.  Expect ~15-21 dB reconstruction — the |value| <= 5
  ceiling of the validated Huffman subset bounds per-line mantissa
  precision (~13% on the dominant line); silence encodes to exact
  digital silence.  Third-party-stream DECODE does not share this
  ceiling (those streams bring their own table selections).

MPEG-2.5, free-format bitrate and LSF intensity stereo are rejected
with clear errors.
"""

from __future__ import annotations

import struct

import numpy as np

from .mp3_tables import (
    ALIAS_CA,
    ALIAS_CS,
    BIG_TABLE_MAX,
    BITRATES_V1_L3,
    BITRATES_V2_L3,
    COUNT1_A_HCOD,
    COUNT1_A_HLEN,
    LSF_NR_SFB,
    PRETAB,
    SAMPLE_RATES,
    SFB_LONG,
    SFB_SHORT,
    SLEN1,
    SLEN2,
    count1_lut,
    encode_maps,
    fb_analysis_matrix,
    fb_analysis_window,
    fb_synthesis_operator,
    huff_lut,
    imdct_matrix,
)


class Mp3Error(ValueError):
    pass


class Mp3UnsupportedTable(Mp3Error):
    """Frame uses a Huffman table outside the validated subset."""


class _Bits:
    """MSB-first bit reader over a buffer, with peek for LUT decode."""

    __slots__ = ("d", "pos")

    def __init__(self, data, pos_bits: int = 0):
        self.d = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.d
        for _ in range(n):
            byte = p >> 3
            if byte >= len(d):
                raise Mp3Error("truncated mp3 stream")
            v = (v << 1) | ((d[byte] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def peek(self, n: int) -> int:
        """Read n bits without consuming; zero-padded past the end."""
        v = 0
        p = self.pos
        d = self.d
        ln = len(d)
        for _ in range(n):
            byte = p >> 3
            bit = (d[byte] >> (7 - (p & 7))) & 1 if byte < ln else 0
            v = (v << 1) | bit
            p += 1
        return v


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bitlen(self) -> int:
        return len(self.buf) * 8 + self.nbits

    def bytes(self) -> bytes:
        if self.nbits:
            self.write(0, 8 - self.nbits)
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# header / side info


def _parse_header(h: int):
    if (h >> 21) & 0x7FF != 0x7FF:
        raise Mp3Error("lost frame sync")
    version = (h >> 19) & 3          # 3=MPEG1, 2=MPEG2 LSF, 0=MPEG2.5
    layer = (h >> 17) & 3            # 1 = Layer III
    if version == 1:
        raise Mp3Error("reserved MPEG version")
    if version == 0:
        raise Mp3Error("MPEG-2.5 not supported")
    if layer != 1:
        raise Mp3Error("only Layer III is supported")
    crc = ((h >> 16) & 1) == 0
    br_i = (h >> 12) & 15
    sr_i = (h >> 10) & 3
    if br_i == 0:
        raise Mp3Error("free-format bitrate not supported")
    if br_i == 15 or sr_i == 3:
        raise Mp3Error("invalid header")
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3              # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext = (h >> 4) & 3
    rate = SAMPLE_RATES[version][sr_i]
    kbps = (BITRATES_V1_L3 if version == 3 else BITRATES_V2_L3)[br_i]
    per = 144000 if version == 3 else 72000
    fsize = per * kbps // rate + pad
    nch = 1 if mode == 3 else 2
    return dict(version=version, crc=crc, rate=rate, kbps=kbps,
                fsize=fsize, mode=mode, mode_ext=mode_ext, nch=nch)


def _parse_side_info(r: _Bits, version: int, nch: int):
    v1 = version == 3
    info = {"main_data_begin": r.read(9 if v1 else 8)}
    r.read((5 if nch == 1 else 3) if v1 else (1 if nch == 1 else 2))
    if v1:
        info["scfsi"] = [[r.read(1) for _ in range(4)] for _ in range(nch)]
    ngr = 2 if v1 else 1
    grs = []
    for _ in range(ngr):
        chs = []
        for _ in range(nch):
            g = {
                "part2_3_length": r.read(12),
                "big_values": r.read(9),
                "global_gain": r.read(8),
                "scalefac_compress": r.read(4 if v1 else 9),
                "window_switching": r.read(1),
            }
            if g["window_switching"]:
                g["block_type"] = r.read(2)
                g["mixed"] = r.read(1)
                g["table_select"] = [r.read(5), r.read(5)]
                g["subblock_gain"] = [r.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise Mp3Error("window switching with block_type 0")
                g["region0_count"] = 7
                g["region1_count"] = 36
            else:
                g["block_type"] = 0
                g["mixed"] = 0
                g["table_select"] = [r.read(5), r.read(5), r.read(5)]
                g["region0_count"] = r.read(4)
                g["region1_count"] = r.read(3)
                g["subblock_gain"] = [0, 0, 0]
            if v1:
                g["preflag"] = r.read(1)
            g["scalefac_scale"] = r.read(1)
            g["count1table_select"] = r.read(1)
            chs.append(g)
        grs.append(chs)
    info["granules"] = grs
    return info


# ---------------------------------------------------------------------------
# scalefactors


def _read_scalefactors_v1(r: _Bits, g: dict, scfsi, prev_sf):
    s1, s2 = SLEN1[g["scalefac_compress"]], SLEN2[g["scalefac_compress"]]
    short = g["block_type"] == 2 and g["window_switching"]
    if short and not g["mixed"]:
        sf_s = np.zeros((13, 3), np.int32)
        for band in range(12):
            sl = s1 if band < 6 else s2
            for w in range(3):
                sf_s[band, w] = r.read(sl) if sl else 0
        return np.zeros(22, np.int32), sf_s, (s1 * 18 + s2 * 18)
    if short and g["mixed"]:
        sf_l = np.zeros(22, np.int32)
        sf_s = np.zeros((13, 3), np.int32)
        bits = 0
        for band in range(8):
            sf_l[band] = r.read(s1) if s1 else 0
            bits += s1
        for band in range(3, 12):
            sl = s1 if band < 6 else s2
            for w in range(3):
                sf_s[band, w] = r.read(sl) if sl else 0
                bits += sl
        return sf_l, sf_s, bits
    # long blocks, with scfsi reuse groups (0-5, 6-10, 11-15, 16-20)
    sf_l = np.zeros(22, np.int32)
    groups = [(0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2)]
    bits = 0
    for gi, (a, b, sl) in enumerate(groups):
        if scfsi is not None and scfsi[gi] and prev_sf is not None:
            sf_l[a:b] = prev_sf[a:b]
        else:
            for band in range(a, b):
                sf_l[band] = r.read(sl) if sl else 0
                bits += sl
    return sf_l, np.zeros((13, 3), np.int32), bits


def _read_scalefactors_lsf(r: _Bits, g: dict):
    sc = g["scalefac_compress"]
    short = g["block_type"] == 2 and g["window_switching"]
    kind = "short" if (short and not g["mixed"]) else (
        "mixed" if short else "long")
    if sc < 400:
        slens = ((sc >> 4) // 5, (sc >> 4) % 5, (sc % 16) >> 2, sc % 4)
        case = 0
        preflag = 0
    elif sc < 500:
        c = sc - 400
        slens = ((c >> 2) // 5, (c >> 2) % 5, c % 4, 0)
        case = 1
        preflag = 0
    else:
        c = sc - 500
        slens = (c // 3, c % 3, 0, 0)
        case = 2
        preflag = 1
    nr = LSF_NR_SFB[(case, kind)]
    flat = []
    bits = 0
    for slen, cnt in zip(slens, nr):
        for _ in range(cnt):
            flat.append(r.read(slen) if slen else 0)
            bits += slen
    g["preflag"] = preflag
    if kind == "long":
        sf_l = np.zeros(22, np.int32)
        sf_l[: min(21, len(flat))] = flat[:21]
        return sf_l, np.zeros((13, 3), np.int32), bits
    if kind == "short":
        sf_s = np.zeros((13, 3), np.int32)
        vals = (flat + [0] * 36)[:36]
        sf_s[:12] = np.asarray(vals, np.int32).reshape(12, 3)
        return np.zeros(22, np.int32), sf_s, bits
    # mixed: first 6 long bands then short bands 3..11
    sf_l = np.zeros(22, np.int32)
    sf_s = np.zeros((13, 3), np.int32)
    vals = (flat + [0] * 64)
    sf_l[:6] = vals[:6]
    rest = np.asarray(vals[6:6 + 27], np.int32).reshape(9, 3)
    sf_s[3:12] = rest
    return sf_l, sf_s, bits


# ---------------------------------------------------------------------------
# Huffman region decode


def _region_bounds(g: dict, rate: int):
    cum = np.concatenate([[0], np.cumsum(SFB_LONG[rate])])
    if g["window_switching"]:
        return 36, 576
    r0 = int(cum[min(g["region0_count"] + 1, 22)])
    r1 = int(cum[min(g["region0_count"] + 1 + g["region1_count"] + 1, 22)])
    return r0, r1


def _decode_huffman(r: _Bits, g: dict, rate: int, end_bit: int):
    vals = np.zeros(576, np.int32)
    big2 = g["big_values"] * 2
    if big2 > 576:
        raise Mp3Error("big_values out of range")
    r0, r1 = _region_bounds(g, rate)
    line = 0
    for region, bound in ((0, min(r0, big2)), (1, min(r1, big2)),
                         (2, big2)):
        if line >= bound:
            continue
        ts = g["table_select"][region] if region < len(
            g["table_select"]) else 0
        if ts == 0:
            line = bound
            continue
        if ts not in huff_tables_available():
            raise Mp3UnsupportedTable(
                f"huffman table {ts} is outside the validated subset "
                "(see mp3_tables docstring)")
        lut, maxlen = huff_lut(ts)
        while line < bound:
            x, y, ln = lut[r.peek(maxlen)]
            r.pos += int(ln)
            x, y = int(x), int(y)
            if x:
                if r.read(1):
                    x = -x
            if y:
                if r.read(1):
                    y = -y
            vals[line] = x
            vals[line + 1] = y
            line += 2
            if r.pos > end_bit:
                raise Mp3Error("huffman overrun in big_values")
    # count1 region
    lut1, maxlen1 = count1_lut(g["count1table_select"])
    while r.pos < end_bit and line <= 572:
        start = r.pos
        v, ln = lut1[r.peek(maxlen1)]
        r.pos += int(ln)
        quad = [(int(v) >> 3) & 1, (int(v) >> 2) & 1, (int(v) >> 1) & 1,
                int(v) & 1]
        for q in range(4):
            if quad[q] and r.read(1):
                quad[q] = -1
        if r.pos > end_bit:
            r.pos = start          # spec: rewind the overrunning quad
            break
        vals[line: line + 4] = quad
        line += 4
    r.pos = end_bit
    return vals, line


def huff_tables_available() -> frozenset:
    from .mp3_tables import HUFF_BIG

    return frozenset(HUFF_BIG)


# ---------------------------------------------------------------------------
# requantize / reorder / stereo / alias / imdct


def _line_maps(rate: int, mixed: bool):
    """For short (or mixed) granules: per spectral line (as stored,
    band-major) -> (is_short, band, window, reordered_index)."""
    widths = SFB_SHORT[rate]
    start_band = 3 if mixed else 0
    base = 36 if mixed else 0
    order = np.arange(576)
    band_of = np.zeros(576, np.int32)
    win_of = np.zeros(576, np.int32)
    is_short = np.zeros(576, bool)
    pos = base
    # global short line index within a window
    gline = sum(widths[:start_band])
    for band in range(start_band, 13):
        w = widths[band]
        for win in range(3):
            for ll in range(w):
                if pos >= 576:
                    break
                sl = gline + ll          # line index inside this window
                tgt = (sl // 6) * 18 + win * 6 + (sl % 6)
                order[pos] = tgt
                band_of[pos] = band
                win_of[pos] = win
                is_short[pos] = True
                pos += 1
        gline += w
    return order, band_of, win_of, is_short


_LINE_MAP_CACHE: dict = {}


def _line_maps_cached(rate: int, mixed: bool):
    key = (rate, mixed)
    if key not in _LINE_MAP_CACHE:
        _LINE_MAP_CACHE[key] = _line_maps(rate, mixed)
    return _LINE_MAP_CACHE[key]


def _requantize(vals, g, sf_l, sf_s, rate):
    mult = 0.5 * (g["scalefac_scale"] + 1)
    gain = (g["global_gain"] - 210) / 4.0
    pre = g.get("preflag", 0)
    short = g["block_type"] == 2 and g["window_switching"]
    exps = np.zeros(576)
    if not short:
        per_band = gain - mult * (sf_l[:22] + (PRETAB if pre else
                                               np.zeros(22)))
        exps[:] = np.repeat(per_band, SFB_LONG[rate])
    else:
        mixed = bool(g["mixed"])
        order, band_of, win_of, is_short = _line_maps_cached(rate, mixed)
        if mixed:
            long_e = gain - mult * (sf_l[:22] + (PRETAB if pre else
                                                 np.zeros(22)))
            rep = np.repeat(long_e, SFB_LONG[rate])
            exps[:36] = rep[:36]
        sbg = np.asarray(g["subblock_gain"], float)
        sel = is_short
        exps[sel] = (gain - 2.0 * sbg[win_of[sel]]
                     - mult * sf_s[band_of[sel], win_of[sel]])
    xr = np.sign(vals) * (np.abs(vals) ** (4.0 / 3.0)) * np.exp2(exps)
    if short:
        out = np.zeros(576)
        order = _line_maps_cached(rate, bool(g["mixed"]))[0]
        if g["mixed"]:
            out[:36] = xr[:36]
            out[order[36:]] = xr[36:]
        else:
            out[order] = xr
        return out
    return xr


def _stereo(xr_l, xr_r, hdr, g_r, sf_l_r, sf_s_r, rate, nonzero_r):
    if hdr["mode"] != 1:
        return xr_l, xr_r
    ms = hdr["mode_ext"] & 2
    intensity = hdr["mode_ext"] & 1
    l, r = xr_l.copy(), xr_r.copy()
    i_start = 576
    if intensity:
        if hdr["version"] != 3:
            raise Mp3Error("LSF intensity stereo not supported")
        short = g_r["block_type"] == 2 and g_r["window_switching"]
        cum_l = np.concatenate([[0], np.cumsum(SFB_LONG[rate])])
        if not short:
            bands = np.searchsorted(cum_l, nonzero_r, side="left")
            first_band = min(int(bands), 21)
            i_start = int(cum_l[first_band])
            for band in range(first_band, 22):
                a, b = int(cum_l[band]), int(cum_l[band + 1])
                is_pos = int(sf_l_r[band]) if band < 21 else int(
                    sf_l_r[20])
                if is_pos == 7:
                    continue
                k = np.tan(is_pos * np.pi / 12.0)
                l[a:b] = xr_l[a:b] * (k / (1.0 + k))
                r[a:b] = xr_l[a:b] * (1.0 / (1.0 + k))
        else:
            # short intensity: per (band, window) above the right
            # channel's zero bound, in reordered (output) layout
            order, band_of, win_of, is_short = _line_maps_cached(
                rate, bool(g_r["mixed"]))
            widths = SFB_SHORT[rate]
            cum_s = np.concatenate([[0], np.cumsum(widths)])
            nz_line = (nonzero_r + 2) // 3
            first_band = int(np.searchsorted(cum_s, nz_line, side="left"))
            for band in range(min(first_band, 12), 12):
                for win in range(3):
                    is_pos = int(sf_s_r[band, win])
                    if is_pos == 7:
                        continue
                    k = np.tan(is_pos * np.pi / 12.0)
                    a, b = int(cum_s[band]), int(cum_s[band + 1])
                    for sl in range(a, b):
                        tgt = (sl // 6) * 18 + win * 6 + (sl % 6)
                        l[tgt] = xr_l[tgt] * (k / (1.0 + k))
                        r[tgt] = xr_l[tgt] * (1.0 / (1.0 + k))
            i_start = 0 if first_band < 12 else 576
    if ms:
        inv = 1.0 / np.sqrt(2.0)
        m_, s_ = l[:i_start].copy(), r[:i_start].copy()
        l[:i_start] = (m_ + s_) * inv
        r[:i_start] = (m_ - s_) * inv
    return l, r


def _alias_reduce(xr, g):
    short = g["block_type"] == 2 and g["window_switching"]
    if short and not g["mixed"]:
        return xr
    sb = xr.reshape(32, 18)
    nb = 1 if (short and g["mixed"]) else 31
    a = sb[:nb, 17 - np.arange(8)]
    b = sb[1:nb + 1, :8]
    new_a = a * ALIAS_CS[None, :] - b * ALIAS_CA[None, :]
    new_b = b * ALIAS_CS[None, :] + a * ALIAS_CA[None, :]
    sb[:nb, 17 - np.arange(8)] = new_a
    sb[1:nb + 1, :8] = new_b
    return sb.reshape(576)


def _imdct_granule(xr, g, overlap):
    """xr (576,) -> 18 time samples x 32 subbands, updating overlap
    (32, 18). Returns (18, 32) block with frequency inversion applied."""
    sb = xr.reshape(32, 18)
    bt = g["block_type"] if g["window_switching"] else 0
    if bt == 2 and g["mixed"]:
        m_long = imdct_matrix(0)
        m_short = imdct_matrix(2)
        t = np.empty((32, 36))
        t[:2] = sb[:2] @ m_long.T
        t[2:] = sb[2:] @ m_short.T
    else:
        t = sb @ imdct_matrix(bt).T
    out = t[:, :18] + overlap
    overlap[:] = t[:, 18:]
    # frequency inversion: odd subbands, odd time samples
    out[1::2, 1::2] *= -1.0
    return out.T                      # (18 time, 32 subbands)


def _synthesize(blocks: np.ndarray) -> np.ndarray:
    """(nb, 32) subband blocks -> (nb*32,) PCM via the fitted synthesis
    operator (unity gain, 481-sample chain delay)."""
    F = fb_synthesis_operator()       # (32, 16, 32)
    nb = blocks.shape[0]
    S = np.concatenate([np.zeros((15, 32)), blocks], axis=0)
    win = np.lib.stride_tricks.sliding_window_view(S, 16, axis=0)
    # win[m, k, p] = S[m + p] ; we need S[m - p] -> reverse p
    win = win[:, :, ::-1]             # (nb, 32, 16): S[m+15-p'] etc.
    return np.einsum("jpk,mkp->mj", F, win).reshape(nb * 32)


# ---------------------------------------------------------------------------
# decoder


def decode_mp3(payload: bytes):
    """Decode an mp3 payload -> (samples float64 (n, ch) in [-1, 1],
    sample_rate).  ID3v2 prefix and ID3v1 trailer are skipped."""
    b = payload
    off = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        sz = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
            ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        off = 10 + sz
    frames = []
    main = bytearray()
    hdr0 = None
    while off + 4 <= len(b):
        if b[off:off + 3] == b"TAG":
            break
        try:
            hdr = _parse_header(int.from_bytes(b[off:off + 4], "big"))
        except Mp3Error:
            if frames:
                break                 # trailing garbage after audio
            raise
        if hdr0 is None:
            hdr0 = hdr
        elif hdr["rate"] != hdr0["rate"] or hdr["nch"] != hdr0["nch"] or \
                hdr["version"] != hdr0["version"]:
            break
        if off + hdr["fsize"] > len(b):
            break                     # truncated final frame
        p = off + 4 + (2 if hdr["crc"] else 0)
        side_len = (17 if hdr["nch"] == 1 else 32) if hdr[
            "version"] == 3 else (9 if hdr["nch"] == 1 else 17)
        side = _parse_side_info(_Bits(b, p * 8), hdr["version"],
                                hdr["nch"])
        md_start = len(main)
        main += b[p + side_len: off + hdr["fsize"]]
        frames.append((hdr, side, md_start))
        off += hdr["fsize"]
    if not frames:
        raise Mp3Error("no mp3 frames found")

    hdr0 = frames[0][0]
    rate, nch, v1 = hdr0["rate"], hdr0["nch"], hdr0["version"] == 3
    ngr = 2 if v1 else 1
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    blocks = [[] for _ in range(nch)]
    prev_sf = [None] * nch
    mb = _Bits(bytes(main), 0)

    for hdr, side, md_start in frames:
        begin = md_start - side["main_data_begin"]
        if begin < 0:
            # reservoir references data we never saw: emit silence
            for ch in range(nch):
                for _ in range(ngr):
                    blocks[ch].append(np.zeros((18, 32)))
            continue
        mb.pos = begin * 8
        for gi in range(ngr):
            xrs = []
            grinfo = []
            for ch in range(nch):
                g = side["granules"][gi][ch]
                start_bit = mb.pos
                end_bit = start_bit + g["part2_3_length"]
                if v1:
                    scfsi = side["scfsi"][ch] if gi == 1 else None
                    sf_l, sf_s, _ = _read_scalefactors_v1(
                        mb, g, scfsi, prev_sf[ch])
                    prev_sf[ch] = sf_l
                else:
                    sf_l, sf_s, _ = _read_scalefactors_lsf(mb, g)
                vals, nonzero = _decode_huffman(mb, g, rate, end_bit)
                xr = _requantize(vals, g, sf_l, sf_s, rate)
                xrs.append(xr)
                grinfo.append((g, sf_l, sf_s, nonzero))
            if nch == 2:
                g_r, sf_l_r, sf_s_r, nonzero_r = grinfo[1]
                xrs = list(_stereo(xrs[0], xrs[1], hdr, g_r, sf_l_r,
                                   sf_s_r, rate, nonzero_r))
            for ch in range(nch):
                g = grinfo[ch][0]
                xr = _alias_reduce(xrs[ch], g)
                blocks[ch].append(_imdct_granule(xr, g, overlap[ch]))

    # flush the IMDCT overlap + filterbank with two zero granules, then
    # compensate the fixed 481 + 576 = 1057-sample codec delay so the
    # output aligns 1:1 with the encoder's input (gapless-style) and
    # keeps exactly n_frames * samples_per_frame samples
    n_out = len(blocks[0]) * 18 * 32
    flush_g = dict(block_type=0, window_switching=0, mixed=0)
    for ch in range(nch):
        for _ in range(2):
            blocks[ch].append(
                _imdct_granule(np.zeros(576), flush_g, overlap[ch]))
    out = np.stack(
        [_synthesize(np.concatenate(bl, axis=0)) for bl in blocks],
        axis=1)
    out = out[1057: 1057 + n_out]
    return np.clip(out, -1.0, 1.0), rate


# ---------------------------------------------------------------------------
# encoder (MPEG-1, long blocks)


def _analysis_subbands(x: np.ndarray) -> np.ndarray:
    """(n,) PCM -> (n//32, 32) subband samples via the ISO sliding-
    window analysis (vectorized)."""
    C = fb_analysis_window()
    MA = fb_analysis_matrix()
    nb = len(x) // 32
    xp = np.concatenate([np.zeros(511), x[: nb * 32]])
    # X[i] = x[m*32 + 31 - i] = xp[32m + 542 - i]: window m spans
    # xp[32m+31 .. 32m+542], reversed
    wins = np.lib.stride_tricks.sliding_window_view(xp, 512)[31::32][:nb]
    Z = wins[:, ::-1] * C[None, :]
    Y = Z.reshape(nb, 8, 64).sum(axis=1)
    return Y @ MA.T


_MDCT_FWD = None


def _mdct_forward():
    """18x36 forward MDCT such that IMDCT+OLA reconstructs exactly
    (TDAC): solved from the long-window IMDCT matrix."""
    global _MDCT_FWD
    if _MDCT_FWD is None:
        M = imdct_matrix(0)          # (36, 18)
        # steady state: y_cur = M[:18] X_cur + M[18:] X_prev,
        # X_g = F [x_{g-1}; x_g].  Solve F by least squares over an
        # identity-complete deterministic basis.
        # unknown F (18, 36).  With X_g = F [x_{g-1}; x_g], the decoder
        # computes out_g = M[:18] X_g + M[18:] X_{g-1}; TDAC makes the
        # one-granule-delayed identity out_g == x_{g-1} exactly
        # achievable, so LS over a deterministic basis recovers the
        # exact forward transform.
        rng = np.random.default_rng(12345)
        xs = rng.standard_normal((600, 18))
        X1 = np.concatenate([xs[1:-1], xs[2:]], axis=1)     # [x_{g-1};x_g]
        X0 = np.concatenate([xs[:-2], xs[1:-1]], axis=1)    # prior pair
        nrows = X1.shape[0]
        big = np.zeros((nrows * 18, 18 * 36))
        for i in range(18):          # output time sample i
            blk = np.zeros((nrows, 18 * 36))
            for j in range(18):      # spectral line j (row j of F)
                blk[:, j * 36:(j + 1) * 36] += (
                    M[i, j] * X1 + M[18 + i, j] * X0)
            big[i * nrows:(i + 1) * nrows] = blk
        tgt = np.concatenate([xs[1:-1][:, i] for i in range(18)])
        sol, *_ = np.linalg.lstsq(big, tgt, rcond=None)
        _MDCT_FWD = sol.reshape(18, 36)
    return _MDCT_FWD


def _quantize_granule(xr: np.ndarray):
    """Pick global_gain so quantized lines fit |v| <= 5, quantize."""
    amax = float(np.abs(xr).max())
    if amax == 0.0:
        return np.zeros(576, np.int32), 210
    # |is| = round((|xr| / step)^(3/4)) <= 5 with step = 2^((gg-210)/4)
    # -> amax/step <= 5.49^(4/3): pick the SMALLEST such gg so quiet
    # granules use the full mantissa range (gg goes below 210)
    gg = int(np.ceil(210 + 4 * np.log2(amax / (5.49 ** (4.0 / 3.0)))))
    gg = min(max(gg, 0), 255)

    def quant(gv):
        step = 2.0 ** ((gv - 210) / 4.0)
        return np.rint(np.abs(xr / step) ** 0.75).astype(np.int32)

    is_ = quant(gg)
    while is_.max() > 5 and gg < 255:
        gg += 1
        is_ = quant(gg)
    while gg > 0:
        cand = quant(gg - 1)
        if cand.max() > 5:
            break
        gg -= 1
        is_ = cand
    is_ = np.minimum(is_, 5)
    return (np.sign(xr).astype(np.int32) * is_), gg


def _best_big_table(maxv: int, pairs, big_maps):
    if maxv == 0:
        return 0, 0
    cands = [t for t, mv in BIG_TABLE_MAX.items() if mv >= maxv]
    best = None
    for t in cands:
        m = big_maps[t]
        bits = 0
        for x, y in pairs:
            bits += m[(abs(x), abs(y))][1] + (x != 0) + (y != 0)
        if best is None or bits < best[0]:
            best = (bits, t)
    return best[1], best[0]


def _scalefactors_for(xr: np.ndarray, gg: int, rate: int):
    """Per-band scalefactors (scalefac_scale=1 -> factor 2^-sf per
    band): quiet bands get sf > 0 so their lines use the full |is|<=5
    mantissa range.  Returns (sf[22] with sf[21] forced 0, sfc index)."""
    widths = SFB_LONG[rate]
    step = 2.0 ** ((gg - 210) / 4.0)
    sf = np.zeros(22, np.int32)
    pos = 0
    for band in range(21):              # band 21 has no scalefactor
        w = widths[band]
        bmax = float(np.abs(xr[pos: pos + w]).max()) if w else 0.0
        pos += w
        if bmax > 0:
            sf[band] = int(min(15, max(0, np.floor(
                np.log2(step * (5.49 ** (4.0 / 3.0)) / bmax)))))
    sf[11:21] = np.minimum(sf[11:21], 7)      # slen2 is at most 3 bits
    # choose the cheapest scalefac_compress covering the needed bits
    need1 = max(int(v) for v in sf[:11]).bit_length()
    need2 = max(int(v) for v in sf[11:21]).bit_length()
    best = None
    for idx in range(16):
        if SLEN1[idx] >= need1 and SLEN2[idx] >= need2:
            cost = SLEN1[idx] * 11 + SLEN2[idx] * 10
            if best is None or cost < best[0]:
                best = (cost, idx)
    return sf, best[1]


def _encode_granule(xr: np.ndarray, rate: int):
    """Quantize + Huffman-encode one granule; returns (side-info dict,
    bit payload as (_BitWriter, nbits))."""
    big_maps, c1_maps = encode_maps()
    _, gg = _quantize_granule(xr)       # gg fit to the loudest band
    sf, sfc = _scalefactors_for(xr, gg, rate)
    # re-quantize with the per-band boost (scalefac_scale=1 -> 2^-sf)
    boost = np.exp2(np.repeat(sf.astype(float), SFB_LONG[rate]))
    step = 2.0 ** ((gg - 210) / 4.0)
    is_ = np.minimum(
        np.rint((np.abs(xr) * boost / step) ** 0.75).astype(np.int32), 5)
    vals = np.sign(xr).astype(np.int32) * is_
    nz = np.nonzero(vals)[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    big_nz = np.nonzero(np.abs(vals) >= 2)[0]
    big_end = int(big_nz[-1]) + 1 if len(big_nz) else 0
    big_end += big_end & 1
    # count1 region: quads from big_end; extend big region if the tail
    # would overflow 576
    c1_end = big_end + ((last_nz - big_end + 3) // 4) * 4
    if c1_end > 576:
        big_end = min(576, big_end + (c1_end - 576) + 1)
        big_end += big_end & 1
        c1_end = big_end + ((max(0, last_nz - big_end) + 3) // 4) * 4
    big_values = big_end // 2
    cum = np.concatenate([[0], np.cumsum(SFB_LONG[rate])])
    r0, r1 = int(cum[8]), int(cum[16])
    w = _BitWriter()
    # part2: scalefactor bits (long blocks: 11 x slen1 + 10 x slen2)
    for band in range(11):
        if SLEN1[sfc]:
            w.write(int(sf[band]), SLEN1[sfc])
    for band in range(11, 21):
        if SLEN2[sfc]:
            w.write(int(sf[band]), SLEN2[sfc])
    table_select = []
    for a, b in ((0, min(r0, big_end)), (min(r0, big_end),
                                         min(r1, big_end)),
                 (min(r1, big_end), big_end)):
        seg = vals[a:b]
        pairs = list(zip(seg[::2], seg[1::2]))
        maxv = int(np.abs(seg).max()) if len(seg) else 0
        t, _ = _best_big_table(maxv, pairs, big_maps)
        table_select.append(t)
        if t:
            m = big_maps[t]
            for x, y in pairs:
                code, ln = m[(abs(x), abs(y))]
                w.write(code, ln)
                if x:
                    w.write(1 if x < 0 else 0, 1)
                if y:
                    w.write(1 if y < 0 else 0, 1)
    # count1: choose table by cost
    quads = []
    for a in range(big_end, c1_end, 4):
        q = vals[a:a + 4]
        q = np.concatenate([q, np.zeros(4 - len(q), np.int32)])
        quads.append(q)
    costs = [0, 0]
    for q in quads:
        idx = ((q[0] != 0) << 3) | ((q[1] != 0) << 2) | \
            ((q[2] != 0) << 1) | (q[3] != 0)
        nsign = int(np.count_nonzero(q))
        costs[0] += COUNT1_A_HLEN[idx] + nsign
        costs[1] += 4 + nsign
    c1t = 0 if costs[0] <= costs[1] else 1
    for q in quads:
        idx = ((q[0] != 0) << 3) | ((q[1] != 0) << 2) | \
            ((q[2] != 0) << 1) | (q[3] != 0)
        code, ln = c1_maps[c1t][idx]
        w.write(code, ln)
        for v in q:
            if v:
                w.write(1 if v < 0 else 0, 1)
    g = dict(part2_3_length=w.bitlen(), big_values=big_values,
             global_gain=gg, scalefac_compress=sfc, window_switching=0,
             block_type=0, table_select=table_select, region0_count=7,
             region1_count=7, preflag=0, scalefac_scale=1,
             count1table_select=c1t)
    return g, w


def encode_mp3(samples: np.ndarray, rate: int) -> bytes:
    """Encode float PCM in [-1, 1] (n,) or (n, ch<=2) as MPEG-1 Layer
    III at ``rate`` in {32000, 44100, 48000}."""
    if rate not in SAMPLE_RATES[3]:
        raise Mp3Error(f"encoder supports MPEG-1 rates only, got {rate}")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] > 2:
        raise Mp3Error("at most 2 channels")
    nch = x.shape[1]
    n = x.shape[0]
    nfr = max(1, -(-n // 1152))
    x = np.vstack([x, np.zeros((nfr * 1152 - n, nch))])
    fwd = _mdct_forward()
    inv_alias = True
    sr_i = SAMPLE_RATES[3].index(rate)
    out = bytearray()
    # per channel: subband analysis then per-granule MDCT
    S = [_analysis_subbands(x[:, ch]) for ch in range(nch)]
    prev18 = [np.zeros((32, 18)) for _ in range(nch)]
    side_len = 17 if nch == 1 else 32
    for f in range(nfr):
        granules = []
        for gi in range(2):
            chs = []
            for ch in range(nch):
                blk = S[ch][(f * 2 + gi) * 18:(f * 2 + gi) * 18 + 18]
                sb = blk.T.copy()                     # (32 sub, 18 t)
                # frequency inversion (matches decoder)
                sb[1::2, 1::2] *= -1.0
                x36 = np.concatenate([prev18[ch], sb], axis=1)
                prev18[ch] = sb
                X = x36 @ fwd.T                       # (32, 18)
                xr = X.reshape(576)
                if inv_alias:
                    sbv = xr.reshape(32, 18)
                    a = sbv[:31, 17 - np.arange(8)]
                    b = sbv[1:32, :8]
                    new_a = a * ALIAS_CS[None, :] + b * ALIAS_CA[None, :]
                    new_b = b * ALIAS_CS[None, :] - a * ALIAS_CA[None, :]
                    sbv[:31, 17 - np.arange(8)] = new_a
                    sbv[1:32, :8] = new_b
                    xr = sbv.reshape(576)
                g, wbits = _encode_granule(xr, rate)
                chs.append((g, wbits))
            granules.append(chs)
        main_bits = sum(wb.bitlen() for chs in granules for _, wb in chs)
        need = (main_bits + 7) // 8 + 4 + side_len
        br_i = None
        for i, kbps in enumerate(BITRATES_V1_L3):
            if i == 0:
                continue
            if 144000 * kbps // rate >= need:
                br_i = i
                break
        if br_i is None:
            raise Mp3Error(
                "frame too large even at 320 kbps; lower the input "
                "level or use fewer channels")
        kbps = BITRATES_V1_L3[br_i]
        fsize = 144000 * kbps // rate
        # header: sync, MPEG1, layer III, no CRC
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | \
            (br_i << 12) | (sr_i << 10) | (0 << 9) | \
            ((3 if nch == 1 else 0) << 6)
        sw = _BitWriter()
        sw.write(0, 9)                               # main_data_begin
        sw.write(0, 5 if nch == 1 else 3)            # private
        for _ in range(nch):
            for _ in range(4):
                sw.write(0, 1)                       # scfsi
        for gi in range(2):
            for ch in range(nch):
                g, _ = granules[gi][ch]
                sw.write(g["part2_3_length"], 12)
                sw.write(g["big_values"], 9)
                sw.write(g["global_gain"], 8)
                sw.write(g["scalefac_compress"], 4)
                sw.write(0, 1)                       # window_switching
                for t in g["table_select"]:
                    sw.write(t, 5)
                sw.write(g["region0_count"], 4)
                sw.write(g["region1_count"], 3)
                sw.write(g["preflag"], 1)
                sw.write(g["scalefac_scale"], 1)
                sw.write(g["count1table_select"], 1)
        side = sw.bytes()
        assert len(side) == side_len
        mw = _BitWriter()
        for gi in range(2):
            for ch in range(nch):
                g, wb = granules[gi][ch]
                bits = wb.bitlen()
                buf = wb.bytes()
                full, rem = divmod(bits, 8)
                for by in buf[:full]:
                    mw.write(by, 8)
                if rem:
                    mw.write(buf[full] >> (8 - rem), rem)
        main = mw.bytes()
        frame = struct.pack(">I", h) + side + main
        frame += b"\x00" * (fsize - len(frame))
        out += frame
    return bytes(out)
