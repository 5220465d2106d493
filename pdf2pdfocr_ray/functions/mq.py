"""MQ arithmetic coder (ITU-T T.88 / JBIG2 Annex E, shared with JPEG
2000) — the adaptive binary arithmetic coder JBIG2 generic regions use.

Decoder and encoder implement the spec's flowcharts (INITDEC / DECODE /
BYTEIN; INITENC / ENCODE / BYTEOUT / FLUSH) over the published 47-state
Qe probability table.  Context state is (index, MPS) per context label,
held in caller-owned arrays so a region decode carries one state vector.
"""

from __future__ import annotations

import numpy as np

# (Qe, NMPS, NLPS, SWITCH) — T.88 Table E.1
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

_QE_V = np.array([q[0] for q in _QE], np.uint32)
_NMPS = np.array([q[1] for q in _QE], np.uint8)
_NLPS = np.array([q[2] for q in _QE], np.uint8)
_SWITCH = np.array([q[3] for q in _QE], np.uint8)


class MQDecoder:
    """T.88 software-conventions decoder (Figure G.1 organization: C holds
    the code register with the active byte in bits 16-23)."""

    def __init__(self, data: bytes, n_contexts: int):
        self.data = data
        self.icx = np.zeros(n_contexts, np.uint8)
        self.mps = np.zeros(n_contexts, np.uint8)
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        cur = data[bp] if bp < len(data) else 0xFF
        if cur == 0xFF:
            nxt = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nxt = data[self.bp] if self.bp < len(data) else 0xFF
            self.c += nxt << 8
            self.ct = 8
        self.c &= 0xFFFFFFFF

    def decode(self, cx: int) -> int:
        i = self.icx[cx]
        qe = int(_QE_V[i])
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path or MPS with conditional exchange
            if self.a < qe:
                d = int(self.mps[cx])
                self.icx[cx] = _NMPS[i]
            else:
                d = 1 - int(self.mps[cx])
                if _SWITCH[i]:
                    self.mps[cx] ^= 1
                self.icx[cx] = _NLPS[i]
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return int(self.mps[cx])
            if self.a < qe:
                d = 1 - int(self.mps[cx])
                if _SWITCH[i]:
                    self.mps[cx] ^= 1
                self.icx[cx] = _NLPS[i]
            else:
                d = int(self.mps[cx])
                self.icx[cx] = _NMPS[i]
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 encoder (Figure E.6 organization)."""

    def __init__(self, n_contexts: int):
        self.icx = np.zeros(n_contexts, np.uint8)
        self.mps = np.zeros(n_contexts, np.uint8)
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b = -1  # index of the last emitted byte (for carry)

    def _byteout(self) -> None:
        if self.b >= 0 and self.out[self.b] == 0xFF:
            # stuffing: 7-bit next byte after an 0xFF
            self.out.append((self.c >> 20) & 0xFF)
            self.b += 1
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c & 0x8000000:  # carry into the previous byte
            if self.b >= 0:
                self.out[self.b] += 1
            self.c &= 0x7FFFFFF
            if self.b >= 0 and self.out[self.b] == 0xFF:
                self.out.append((self.c >> 20) & 0xFF)
                self.b += 1
                self.c &= 0xFFFFF
                self.ct = 7
                return
        self.out.append((self.c >> 19) & 0xFF)
        self.b += 1
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, cx: int, d: int) -> None:
        i = self.icx[cx]
        qe = int(_QE_V[i])
        if d == self.mps[cx]:  # CODEMPS: MPS owns the upper subinterval
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.icx[cx] = _NMPS[i]
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _SWITCH[i]:
                self.mps[cx] ^= 1
            self.icx[cx] = _NLPS[i]
        while True:  # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (T.88 E.4.2): push in as many 1-bits as fit the final
        # interval so the decoder's 0xFF padding reads out correctly
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        return bytes(self.out)
