"""Pure-Python/numpy FLAC codec (RFC 9639 / the xiph FLAC format).

The multimodal audio stages previously decoded WAV-PCM only; FLAC is
the dominant lossless audio container in crawled archives.  Scope:

* ``decode_flac``: STREAMINFO + metadata walk, frame sync and header
  (blocksize/rate/channel-assignment/sample-size codes, UTF-8 frame
  numbers, CRC-8 header check), subframes CONSTANT / VERBATIM / FIXED
  (orders 0-4) / LPC (any order, quantized coefficients), rice-coded
  residuals (both 4- and 5-bit parameter methods, escape partitions,
  partition orders > 0), wasted bits, and the four stereo
  decorrelations (independent, left-side, right-side, mid-side).
  Frame CRC-16 is verified.
* ``encode_flac``: a conforming encoder — fixed 4096-sample blocks,
  independent channels, best-of fixed predictors (orders 0-2), rice
  partition order 0, correct CRC-8/16 and STREAMINFO — byte streams
  any FLAC decoder accepts; used for roundtrip tests and fixtures.

Everything is integer arithmetic from the public spec; no tables
beyond the two CRC polynomials.  Output/input samples are int16
(like wavcodec) shaped (n_samples, n_channels).
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (
                (crc << 1) & 0xFFFF)
    return crc


class _BitReader:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated FLAC stream")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def to_bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style frame/sample number coding."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad FLAC UTF-8 frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _utf8_encode(value: int) -> bytes:
    if value < 0x80:
        return bytes([value])
    out = []
    n = 1
    while value >= (1 << (6 * n + (6 - n))):
        n += 1
    lead = (0xFF << (7 - n)) & 0xFF
    out.append(lead | (value >> (6 * n)))
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((value >> (6 * i)) & 0x3F))
    return bytes(out)


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256,
                    9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
                    14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 6: 24}  # 5 -> 20 bits (unsupported)


def _decode_residual(br: _BitReader, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out = np.empty(n - order, np.int64)
    idx = 0
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("bad FLAC partition order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(cnt):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[idx] = (u >> 1) ^ -(u & 1)  # unzigzag
                idx += 1
    return out


def _encode_residual(bw: _BitWriter, res: np.ndarray) -> None:
    """Rice-code residuals: method 0, partition order 0, one parameter
    chosen from the mean magnitude."""
    bw.write(0, 2)  # 4-bit rice parameters
    bw.write(0, 4)  # partition order 0
    mean = float(np.abs(res).mean()) if len(res) else 0.0
    param = 0
    while (1 << param) < mean * 1.4 and param < 14:
        param += 1
    bw.write(param, 4)
    for v in np.asarray(res, np.int64):
        u = int((v << 1) ^ (v >> 63))  # zigzag
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _decode_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(n, br.read_signed(bps), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter((br.read_signed(bps) for _ in range(n)),
                          np.int64, n)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            pred = 0
            for k, c in enumerate(coefs):
                pred += c * out[i - 1 - k]
            out[i] = pred + res[i - order]
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = 0
            for k in range(order):
                pred += coefs[k] * out[i - 1 - k]
            out[i] = (pred >> shift) + res[i - order]
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(payload: bytes):
    """FLAC bytes -> (samples int16 (n, channels), sample_rate).
    Verifies frame header CRC-8 and frame CRC-16."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    sample_rate = channels = bps = 0
    total = -1
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1: pos + 4])
        body = payload[pos + 4: pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)
            br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + ln
    if not sample_rate or not channels:
        raise ValueError("FLAC stream missing STREAMINFO")
    if bps not in (8, 16):
        raise ValueError(f"unsupported FLAC bits-per-sample {bps}")

    chans: list[np.ndarray] = [np.empty(0, np.int64) for _ in range(channels)]
    out_parts: list[np.ndarray] = []
    n_decoded = 0
    while pos < len(payload) and (total < 0 or n_decoded < total):
        hstart = pos
        br = _BitReader(payload, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        sz_code = br.read(3)
        br.read(1)  # reserved
        _utf8_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError("reserved FLAC blocksize code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code != 0 and sr_code not in _RATE_CODES:
            raise ValueError("bad FLAC sample-rate code")
        fbps = bps if sz_code == 0 else _SIZE_CODES.get(sz_code)
        if fbps is None:
            raise ValueError("unsupported FLAC sample-size code")
        hdr_end = br.pos >> 3
        if _crc8(payload[hstart:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC frame channel-count mismatch")
            subs = [_decode_subframe(br, blocksize, fbps)
                    for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(br, blocksize, fbps)
            side = _decode_subframe(br, blocksize, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # side/right
            side = _decode_subframe(br, blocksize, fbps + 1)
            right = _decode_subframe(br, blocksize, fbps)
            subs = [side + right, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(br, blocksize, fbps)
            side = _decode_subframe(br, blocksize, fbps + 1)
            lr = (mid << 1) | (side & 1)
            subs = [(lr + side) >> 1, (lr - side) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        br.align()
        fend = br.pos >> 3
        crc = br.read(16)
        if _crc16(payload[hstart:fend]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos >> 3
        out_parts.append(np.stack(subs, axis=1))
        n_decoded += blocksize
    del chans
    if not out_parts:
        raise ValueError("FLAC stream has no frames")
    samples = np.concatenate(out_parts, axis=0)
    if total >= 0:
        samples = samples[:total]
    return samples.astype(np.int16), sample_rate


def encode_flac(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples (n,) or (n, channels) -> FLAC bytes (independent
    channels, best-of fixed predictor order 0-2, rice order-0
    partitions)."""
    s = np.asarray(samples, np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if not (1 <= channels <= 8):
        raise ValueError("FLAC supports 1-8 channels")
    bps = 16
    block = 4096

    body = bytearray()
    for start in range(0, max(n, 1), block):
        chunk = s[start: start + block]
        bs = len(chunk)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(7, 4)  # blocksize: 16-bit at end of header
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(channels - 1, 4)  # independent channels
        hdr.write(4, 3)  # 16-bit samples
        hdr.write(0, 1)
        hdr.align()
        head = hdr.to_bytes() + _utf8_encode(start // block)
        head += struct.pack(">H", bs - 1)
        head += bytes([_crc8(head)])

        bw = _BitWriter()
        for ch in range(channels):
            x = chunk[:, ch]
            # pick the fixed order with the smallest residual mass
            best_order, best_res, best_cost = 0, x, float("inf")
            for order in range(0, 3):
                if bs <= order:
                    break
                r = x.copy()
                for _ in range(order):
                    r = np.diff(r)
                cost = float(np.abs(r).sum())
                if cost < best_cost:
                    best_order, best_res, best_cost = order, r, cost
            bw.write(0, 1)
            bw.write(8 + best_order, 6)  # FIXED subframe
            bw.write(0, 1)  # no wasted bits
            for i in range(best_order):
                bw.write(int(x[i]), bps)
            _encode_residual(bw, best_res)
        bw.align()
        frame = head + bw.to_bytes()
        frame += struct.pack(">H", _crc16(frame))
        body += frame

    info = _BitWriter()
    info.write(block, 16)
    info.write(block, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    info.align()
    streaminfo = info.to_bytes() + b"\x00" * 16  # md5 unset (zeros)
    meta = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return b"fLaC" + meta + bytes(body)
