"""PDF standard security handler (PDF 32000-1 §7.6) — from scratch.

The reference processes encrypted PDFs in its default mode: pdftoppm /
poppler transparently decrypts files whose *user* password is empty
(the overwhelmingly common case in crawled PDFs — "permissions"
encryption), and pdf2pdfocr.py:1196-1198 only refuses them when the
explicit ``check_protection_mode`` flag is set.  This module gives the
engine the same behavior without shelling out: the standard security
handler with an empty user password, covering

* /V 1 (RC4-40), /V 2 (RC4 up to 128 bit), R 2/3,
* /V 4 crypt filters (/CFM /V2 RC4, /AESV2 AES-128-CBC, /Identity), R 4,
* /V 5 (/AESV3 AES-256-CBC), R 5 (deprecated Adobe extension) and R 6
  (PDF 2.0 Algorithm 2.B iterated hash).

Primitives are built here from the public specs: RC4 from its
well-known key-schedule/PRGA description, and AES from FIPS-197 — with
the bulk CBC *decrypt* path vectorized across blocks with numpy
(CBC decryption has no inter-block dependency: P_i = D(C_i) xor C_{i-1},
so a whole stream decrypts as one batched ECB pass plus one shifted
XOR).  CBC encryption (fixture writer + Algorithm 2.B) is inherently
sequential across blocks and loops in Python over the vectorized
single-block kernel; it only runs at fixture-build time and during R6
key derivation.

Empty-password authentication is cheap (a couple of hashes), so a
locked (truly password-protected) file is detected immediately and
stays on the ``encrypted`` error route — row-level fault isolation,
never a throw out of the stage.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np

# --------------------------------------------------------------------- AES
# FIPS-197 tables, computed (not transcribed) and pinned by the FIPS
# known-answer tests in tests/test_pdfcrypt.py.


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_tables():
    # multiplicative inverse in GF(2^8) via exp/log tables (generator 3)
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = np.zeros(256, np.uint8)
    for a in range(256):
        q = inv(a)
        s = q
        for _ in range(4):
            q = ((q << 1) | (q >> 7)) & 0xFF
            s ^= q
        sbox[a] = s ^ 0x63
    inv_sbox = np.zeros(256, np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)

    mul = {}
    for c in (2, 3, 9, 11, 13, 14):
        mul[c] = np.array([_gf_mul(a, c) for a in range(256)], np.uint8)
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _MUL = _build_tables()

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _build_ttables():
    """32-bit encryption T-tables (plain Python lists — scalar lookups are
    ~5x faster on lists than numpy arrays) for the sequential CBC-encrypt
    path; the bulk decrypt path stays numpy-vectorized."""
    m2, m3 = _MUL[2], _MUL[3]
    te = [[0] * 256 for _ in range(4)]
    for x in range(256):
        s = int(_SBOX[x])
        w = (int(m2[s]) << 24) | (s << 16) | (s << 8) | int(m3[s])
        te[0][x] = w
        te[1][x] = ((w >> 8) | (w << 24)) & 0xFFFFFFFF
        te[2][x] = ((w >> 16) | (w << 16)) & 0xFFFFFFFF
        te[3][x] = ((w >> 24) | (w << 8)) & 0xFFFFFFFF
    return te


_TE = _build_ttables()
_SBOX_L = [int(b) for b in _SBOX]

# ShiftRows index permutations over the 16-byte block laid out
# column-major (byte i -> state[row i%4][col i//4], FIPS-197 §3.4)
_SHIFT = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11])
_INV_SHIFT = np.zeros(16, np.int64)
_INV_SHIFT[_SHIFT] = np.arange(16)


def _expand_key(key: bytes) -> np.ndarray:
    """FIPS-197 §5.2 -> (rounds+1, 16) uint8 round keys."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"bad AES key length {len(key)}")
    rounds = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    sb = _SBOX
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(sb[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [int(sb[b]) for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    flat = np.array(w, np.uint8).reshape(rounds + 1, 16)
    return flat


def _ecb_encrypt(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Encrypt (N,16) uint8 blocks, vectorized across N."""
    s = blocks ^ rk[0]
    rounds = rk.shape[0] - 1
    for r in range(1, rounds):
        s = _SBOX[s][:, _SHIFT]
        c = s.reshape(-1, 4, 4)  # (N, col, row)
        a0, a1, a2, a3 = c[:, :, 0], c[:, :, 1], c[:, :, 2], c[:, :, 3]
        m2, m3 = _MUL[2], _MUL[3]
        out = np.empty_like(c)
        out[:, :, 0] = m2[a0] ^ m3[a1] ^ a2 ^ a3
        out[:, :, 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
        out[:, :, 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
        out[:, :, 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
        s = out.reshape(-1, 16) ^ rk[r]
    s = _SBOX[s][:, _SHIFT] ^ rk[rounds]
    return s


def _ecb_decrypt(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Decrypt (N,16) uint8 blocks, vectorized across N."""
    rounds = rk.shape[0] - 1
    s = blocks ^ rk[rounds]
    for r in range(rounds - 1, 0, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT]] ^ rk[r]
        c = s.reshape(-1, 4, 4)
        a0, a1, a2, a3 = c[:, :, 0], c[:, :, 1], c[:, :, 2], c[:, :, 3]
        m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
        out = np.empty_like(c)
        out[:, :, 0] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
        out[:, :, 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
        out[:, :, 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
        out[:, :, 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = out.reshape(-1, 16)
    s = _INV_SBOX[s[:, _INV_SHIFT]] ^ rk[0]
    return s


def _expand_key_words(key: bytes) -> list[int]:
    """Round keys as big-endian 32-bit words (T-table layout)."""
    rk = _expand_key(key)
    out = []
    for row in rk:
        b = row.tobytes()
        for i in range(0, 16, 4):
            out.append(int.from_bytes(b[i : i + 4], "big"))
    return out


def _tt_cbc_encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    """Sequential CBC encrypt with the 32-bit T-table kernel — the hot
    path of Algorithm 2.B (tens of thousands of chained single blocks,
    where per-call numpy overhead is ~20x the arithmetic)."""
    w = _expand_key_words(key)
    rounds = len(w) // 4 - 1
    te0, te1, te2, te3 = _TE
    sb = _SBOX_L
    c0 = int.from_bytes(iv[0:4], "big")
    c1 = int.from_bytes(iv[4:8], "big")
    c2 = int.from_bytes(iv[8:12], "big")
    c3 = int.from_bytes(iv[12:16], "big")
    out = bytearray(len(data))
    for off in range(0, len(data), 16):
        a0 = c0 ^ int.from_bytes(data[off : off + 4], "big") ^ w[0]
        a1 = c1 ^ int.from_bytes(data[off + 4 : off + 8], "big") ^ w[1]
        a2 = c2 ^ int.from_bytes(data[off + 8 : off + 12], "big") ^ w[2]
        a3 = c3 ^ int.from_bytes(data[off + 12 : off + 16], "big") ^ w[3]
        k = 4
        for _ in range(rounds - 1):
            b0 = (te0[a0 >> 24] ^ te1[(a1 >> 16) & 0xFF]
                  ^ te2[(a2 >> 8) & 0xFF] ^ te3[a3 & 0xFF] ^ w[k])
            b1 = (te0[a1 >> 24] ^ te1[(a2 >> 16) & 0xFF]
                  ^ te2[(a3 >> 8) & 0xFF] ^ te3[a0 & 0xFF] ^ w[k + 1])
            b2 = (te0[a2 >> 24] ^ te1[(a3 >> 16) & 0xFF]
                  ^ te2[(a0 >> 8) & 0xFF] ^ te3[a1 & 0xFF] ^ w[k + 2])
            b3 = (te0[a3 >> 24] ^ te1[(a0 >> 16) & 0xFF]
                  ^ te2[(a1 >> 8) & 0xFF] ^ te3[a2 & 0xFF] ^ w[k + 3])
            a0, a1, a2, a3 = b0, b1, b2, b3
            k += 4
        c0 = ((sb[a0 >> 24] << 24) | (sb[(a1 >> 16) & 0xFF] << 16)
              | (sb[(a2 >> 8) & 0xFF] << 8) | sb[a3 & 0xFF]) ^ w[k]
        c1 = ((sb[a1 >> 24] << 24) | (sb[(a2 >> 16) & 0xFF] << 16)
              | (sb[(a3 >> 8) & 0xFF] << 8) | sb[a0 & 0xFF]) ^ w[k + 1]
        c2 = ((sb[a2 >> 24] << 24) | (sb[(a3 >> 16) & 0xFF] << 16)
              | (sb[(a0 >> 8) & 0xFF] << 8) | sb[a1 & 0xFF]) ^ w[k + 2]
        c3 = ((sb[a3 >> 24] << 24) | (sb[(a0 >> 16) & 0xFF] << 16)
              | (sb[(a1 >> 8) & 0xFF] << 8) | sb[a2 & 0xFF]) ^ w[k + 3]
        out[off : off + 4] = c0.to_bytes(4, "big")
        out[off + 4 : off + 8] = c1.to_bytes(4, "big")
        out[off + 8 : off + 12] = c2.to_bytes(4, "big")
        out[off + 12 : off + 16] = c3.to_bytes(4, "big")
    return bytes(out)


def aes_encrypt_block(block: bytes, key: bytes) -> bytes:
    rk = _expand_key(key)
    b = np.frombuffer(block, np.uint8).reshape(1, 16)
    return _ecb_encrypt(b, rk).tobytes()


def aes_decrypt_block(block: bytes, key: bytes) -> bytes:
    rk = _expand_key(key)
    b = np.frombuffer(block, np.uint8).reshape(1, 16)
    return _ecb_decrypt(b, rk).tobytes()


def aes_cbc_decrypt(data: bytes, key: bytes, iv: bytes | None = None,
                    strip_padding: bool = True) -> bytes:
    """CBC decrypt, vectorized across all blocks in one ECB pass.

    ``iv=None`` means the PDF layout: first 16 bytes of ``data`` are the
    IV.  Padding per §7.6.2 is RFC 2898 (PKCS#7); tolerate a corrupt pad
    by returning the unstripped plaintext (real readers do).
    """
    if iv is None:
        if len(data) < 16:
            raise ValueError("AES-CBC data shorter than IV")
        iv, data = data[:16], data[16:]
    n = len(data) // 16
    if n == 0:
        return b""
    ct = np.frombuffer(data[: n * 16], np.uint8).reshape(n, 16)
    rk = _expand_key(key)
    pt = _ecb_decrypt(ct, rk)
    prev = np.empty_like(ct)
    prev[0] = np.frombuffer(iv, np.uint8)
    prev[1:] = ct[:-1]
    out = (pt ^ prev).tobytes()
    if strip_padding and out:
        pad = out[-1]
        if 1 <= pad <= 16 and pad <= len(out) and out.endswith(
            bytes([pad]) * pad
        ):
            out = out[:-pad]
    return out


def aes_cbc_encrypt(data: bytes, key: bytes, iv: bytes,
                    pad: bool = True) -> bytes:
    """CBC encrypt (sequential across blocks; fixture/key-derivation path).

    ``pad=True`` appends PKCS#7 padding (always, per §7.6.2); ``pad=False``
    requires block-aligned input (Algorithm 2.B)."""
    if pad:
        p = 16 - (len(data) % 16)
        data = data + bytes([p]) * p
    elif len(data) % 16:
        raise ValueError("unpadded AES-CBC needs block-aligned input")
    return _tt_cbc_encrypt(data, key, iv)


# --------------------------------------------------------------------- RC4
def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------- standard security handler
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _pad32(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def _alg2_file_key(pw: bytes, o_entry: bytes, p: int, id0: bytes, r: int,
                   key_len: int, encrypt_metadata: bool) -> bytes:
    """Algorithm 2 (§7.6.3.3): file encryption key for R 2-4."""
    h = hashlib.md5(_pad32(pw))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def _alg3_o_entry(owner_pw: bytes, user_pw: bytes, r: int,
                  key_len: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_pad32(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    rc4key = key[:key_len]
    o = rc4(rc4key, _pad32(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _alg4_5_u_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3+): the /U entry from the file key."""
    if r == 2:
        return rc4(file_key, _PAD)
    digest = hashlib.md5(_PAD + id0).digest()
    u = rc4(file_key, digest)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # 16 bytes of arbitrary padding (deterministic)


import functools


@functools.lru_cache(maxsize=256)
def _alg2b_hash(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B (R6 / PDF 2.0 iterated hash).

    Deliberately expensive by spec (an anti-brute-force KDF: >= 64
    chained AES-CBC + SHA-2 rounds); cached because the engine checks
    exactly one password (empty) and fixture salts repeat."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k1, k[:16], k[16:32], pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class PdfCryptError(ValueError):
    """Unsupported or malformed /Encrypt dictionary."""


class StandardSecurityHandler:
    """Decrypting handler for the standard security filter.

    Built from a resolved /Encrypt dict plus the first /ID string;
    ``authenticate("")`` (empty user password) yields ``unlocked=True``
    and enables :meth:`decrypt_string` / :meth:`decrypt_stream` keyed per
    object (Algorithm 1) for V<5, or with the file key directly for V5.
    """

    def __init__(self, enc: dict, id0: bytes):
        if str(enc.get("Filter", "Standard")) != "Standard":
            raise PdfCryptError(
                f"unsupported security filter {enc.get('Filter')!r}")
        self.v = int(enc.get("V", 0))
        self.r = int(enc.get("R", 2))
        if self.v not in (1, 2, 4, 5):
            raise PdfCryptError(f"unsupported /Encrypt V={self.v}")
        o, u = enc.get("O"), enc.get("U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfCryptError("missing /O or /U entry")
        self.o_entry, self.u_entry = o, u
        self.p = int(enc.get("P", -1))
        self.id0 = id0
        self.encrypt_metadata = bool(enc.get("EncryptMetadata", True))
        length_bits = int(enc.get("Length", 40))
        self.key_len = 5 if self.v == 1 else length_bits // 8
        # crypt-filter methods: (streams, strings); "rc4"|"aes"|"id"
        if self.v in (1, 2):
            self.stm_m = self.str_m = "rc4"
        elif self.v == 5:
            self.stm_m = self.str_m = "aes"
            self.key_len = 32
            if self.r not in (5, 6):
                raise PdfCryptError(f"V=5 with unsupported R={self.r}")
            self.oe = enc.get("OE")
            self.ue = enc.get("UE")
            if not isinstance(self.ue, bytes) or len(self.u_entry) < 48:
                raise PdfCryptError("V=5 missing /UE or short /U")
        else:  # V=4 crypt filters
            cf = enc.get("CF") or {}
            def method(name):
                if str(name) == "Identity":
                    return "id", self.key_len
                f = cf.get(str(name))
                if not isinstance(f, dict):
                    raise PdfCryptError(f"missing crypt filter {name!r}")
                cfm = str(f.get("CFM", "None"))
                flen = f.get("Length")
                klen = self.key_len
                if isinstance(flen, (int, float)):
                    # /Length in a CF dict is documented in bytes but
                    # written in bits by some producers — normalize
                    klen = int(flen) // 8 if int(flen) > 40 else int(flen)
                if cfm == "V2":
                    return "rc4", klen
                if cfm == "AESV2":
                    return "aes", 16
                raise PdfCryptError(f"unsupported /CFM {cfm}")
            self.stm_m, stm_len = method(enc.get("StmF", "Identity"))
            self.str_m, str_len = method(enc.get("StrF", "Identity"))
            self.key_len = max(
                stm_len if self.stm_m != "id" else 0,
                str_len if self.str_m != "id" else 0,
            ) or self.key_len
        self.file_key: bytes | None = None

    # ------------------------------------------------------- authentication
    def authenticate(self, user_pw: bytes = b"") -> bool:
        """Algorithm 6 (R2-4) / 11 (R5-6): try a user password."""
        if self.v == 5:
            vsalt = self.u_entry[32:40]
            ksalt = self.u_entry[40:48]
            if self.r == 6:
                h = _alg2b_hash(user_pw, vsalt, b"")
            else:
                h = hashlib.sha256(user_pw + vsalt).digest()
            if h != self.u_entry[:32]:
                return False
            if self.r == 6:
                ik = _alg2b_hash(user_pw, ksalt, b"")
            else:
                ik = hashlib.sha256(user_pw + ksalt).digest()
            self.file_key = aes_cbc_decrypt(
                self.ue, ik, iv=b"\x00" * 16, strip_padding=False)
            return True
        key = _alg2_file_key(user_pw, self.o_entry, self.p, self.id0,
                             self.r, self.key_len, self.encrypt_metadata)
        u = _alg4_5_u_entry(key, self.id0, self.r)
        ok = (u[:16] == self.u_entry[:16]) if self.r >= 3 else (
            u == self.u_entry[:32])
        if ok:
            self.file_key = key
        return ok

    # --------------------------------------------------------- per object
    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.v == 5:
            return self.file_key
        h = hashlib.md5(
            self.file_key
            + struct.pack("<i", num)[:3]
            + struct.pack("<i", gen)[:2]
            + (b"sAlT" if aes else b"")
        ).digest()
        return h[: min(len(self.file_key) + 5, 16)]

    def _apply(self, data: bytes, num: int, gen: int, m: str,
               decrypt: bool) -> bytes:
        if m == "id" or not data:
            return data
        if m == "rc4":
            return rc4(self._object_key(num, gen, False), data)
        key = self._object_key(num, gen, True)
        if decrypt:
            return aes_cbc_decrypt(data, key)
        iv = hashlib.md5(data + struct.pack("<ii", num, gen)).digest()
        return iv + aes_cbc_encrypt(data, key, iv)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.str_m, True)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.stm_m, True)

    def encrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.str_m, False)

    def encrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.stm_m, False)


# --------------------------------------------------------- fixture writing
def make_encrypt_dict(variant: str, *, user_pw: bytes = b"",
                      owner_pw: bytes = b"owner-secret",
                      id0: bytes = b"\x01" * 16,
                      p: int = -3904) -> tuple[dict, StandardSecurityHandler]:
    """Build a standard-security /Encrypt dict (entries as Python values)
    plus an authenticated handler for it — the fixture-writer side.

    ``variant``: ``rc4-40`` (V1/R2), ``rc4-128`` (V2/R3), ``aes-128``
    (V4/R4 AESV2 crypt filters) or ``aes-256`` (V5/R6 AESV3).
    Deterministic: salts/arbitrary bytes derive from the inputs.
    """
    if variant == "aes-256":
        # R6: file key is random in the wild; derive deterministically
        file_key = hashlib.sha256(
            b"graft-fixture-key" + id0 + user_pw + owner_pw).digest()
        # salts deliberately do NOT mix in id0: every fixture doc with the
        # same passwords shares salts, so the expensive Algorithm-2.B
        # derivations hit the lru_cache across a whole corpus build (and
        # across reads in a worker).  The file key still varies per doc.
        seed = hashlib.sha256(b"graft-fixture-salts" + user_pw + owner_pw).digest()
        vsalt, ksalt = seed[:8], seed[8:16]
        if user_pw == b"":
            uhash = _alg2b_hash(b"", vsalt, b"")
            ikey = _alg2b_hash(b"", ksalt, b"")
        else:
            uhash = _alg2b_hash(user_pw, vsalt, b"")
            ikey = _alg2b_hash(user_pw, ksalt, b"")
        u = uhash + vsalt + ksalt
        ue = aes_cbc_encrypt(file_key, ikey, b"\x00" * 16, pad=False)
        ovsalt, oksalt = seed[16:24], seed[24:32]
        ohash = _alg2b_hash(owner_pw, ovsalt, u)
        o = ohash + ovsalt + oksalt
        oikey = _alg2b_hash(owner_pw, oksalt, u)
        oe = aes_cbc_encrypt(file_key, oikey, b"\x00" * 16, pad=False)
        perms_pt = (struct.pack("<i", p) + b"\xff\xff\xff\xff"
                    + b"T" + b"adb" + b"grft")
        perms = aes_encrypt_block(perms_pt, file_key)
        enc = {
            "Filter": "Standard", "V": 5, "R": 6, "Length": 256,
            "O": o, "U": u, "OE": oe, "UE": ue, "P": p, "Perms": perms,
        }
    else:
        v, r, bits = {
            "rc4-40": (1, 2, 40),
            "rc4-128": (2, 3, 128),
            "aes-128": (4, 4, 128),
        }[variant]
        key_len = bits // 8
        o = _alg3_o_entry(owner_pw, user_pw, r, key_len)
        key = _alg2_file_key(user_pw, o, p, id0, r, key_len, True)
        u = _alg4_5_u_entry(key, id0, r)[:32]
        enc = {"Filter": "Standard", "V": v, "R": r, "O": o, "U": u, "P": p}
        if v >= 2:
            enc["Length"] = bits
        if v == 4:
            enc["CF"] = {"StdCF": {"CFM": "AESV2", "Length": 16,
                                   "AuthEvent": "DocOpen"}}
            enc["StmF"] = "StdCF"
            enc["StrF"] = "StdCF"
    handler = StandardSecurityHandler(_as_parsed(enc), id0)
    if not handler.authenticate(user_pw):
        raise AssertionError("fixture handler failed self-authentication")
    return enc, handler


def _ser_number(v: float) -> bytes:
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if isinstance(v, int):
        return b"%d" % v
    s = f"{v:.8f}".rstrip("0").rstrip(".")
    return (s or "0").encode()


def _serialize(obj) -> bytes:
    """Serialize a pdfparse-shaped object back to PDF syntax (strings as
    hex strings; no indirect /Length)."""
    from .pdfparse import PdfName, PdfRef, PdfStream

    if obj is None:
        return b"null"
    if isinstance(obj, PdfName):
        return b"/" + str(obj).encode("ascii")
    if isinstance(obj, bool) or isinstance(obj, (int, float)):
        return _ser_number(obj)
    if isinstance(obj, bytes):
        return b"<" + obj.hex().encode() + b">"
    if isinstance(obj, str):  # plain str only via fixture dicts
        return b"/" + obj.encode("ascii")
    if isinstance(obj, PdfRef):
        return b"%d %d R" % (obj.num, obj.gen)
    if isinstance(obj, list):
        return b"[ " + b" ".join(_serialize(o) for o in obj) + b" ]"
    if isinstance(obj, PdfStream):
        d = dict(obj.dict)
        d["Length"] = len(obj.raw)
        return (
            _serialize(d) + b"\nstream\n" + obj.raw + b"\nendstream"
        )
    if isinstance(obj, dict):
        parts = [b"<<"]
        for k, v in obj.items():
            parts.append(b"/" + str(k).encode("ascii"))
            parts.append(_serialize(v))
        parts.append(b">>")
        return b" ".join(parts)
    raise TypeError(f"cannot serialize {type(obj).__name__}")


def encrypt_pdf(pdf: bytes, variant: str = "rc4-128", *,
                user_pw: bytes = b"", owner_pw: bytes = b"owner-secret") -> bytes:
    """Rewrite a well-formed PDF as an encrypted one (fixture writer).

    Parses with :class:`pdfparse.PdfDocument`, expands any compressed
    (/ObjStm) objects into regular ones, encrypts every string and stream
    payload per the chosen standard-security ``variant``, and emits a
    classic-xref file whose trailer carries /Encrypt + /ID.  Deterministic
    for a given input.  With the default empty ``user_pw`` the output is
    the crawl-typical "permissions-encrypted" file the engine opens
    transparently; a non-empty ``user_pw`` produces a locked fixture.
    """
    from .pdfparse import PdfDocument, PdfRef, PdfStream

    doc = PdfDocument(pdf)
    nums = sorted(set(doc.offsets) | set(doc.compressed))
    objs = {}
    for n in nums:
        try:
            objs[n] = doc.get(n)
        except ValueError:
            continue
    objs = {
        n: o
        for n, o in objs.items()
        if not (
            isinstance(o, PdfStream)
            and str(o.dict.get("Type")) in ("ObjStm", "XRef")
        )
    }
    id0 = hashlib.md5(b"graft-encrypt-id" + pdf).digest()
    enc_entries, handler = make_encrypt_dict(
        variant, user_pw=user_pw, owner_pw=owner_pw, id0=id0)
    if user_pw:
        # writer must hold the real file key; fixture handler above
        # authenticated with user_pw already
        pass

    def transform(obj, num: int):
        if isinstance(obj, bytes):
            return handler.encrypt_string(obj, num, 0)
        if isinstance(obj, list):
            return [transform(o, num) for o in obj]
        if isinstance(obj, PdfStream):
            d = transform(obj.dict, num)
            return PdfStream(d, handler.encrypt_stream(obj.raw, num, 0))
        if isinstance(obj, dict):
            return {k: transform(v, num) for k, v in obj.items()}
        return obj

    enc_no = max(objs) + 1
    buf = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for n in sorted(objs):
        offsets[n] = len(buf)
        body = _serialize(transform(objs[n], n))
        buf += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    offsets[enc_no] = len(buf)
    buf += b"%d 0 obj\n" % enc_no + _serialize(enc_entries) + b"\nendobj\n"

    xref_at = len(buf)
    max_no = enc_no
    buf += b"xref\n0 %d\n" % (max_no + 1)
    buf += b"0000000000 65535 f \n"
    for n in range(1, max_no + 1):
        if n in offsets:
            buf += b"%010d 00000 n \n" % offsets[n]
        else:
            buf += b"0000000000 65535 f \n"
    root = doc.trailer.get("Root")
    info = doc.trailer.get("Info")
    trailer = {
        "Size": max_no + 1,
        "Root": root if isinstance(root, PdfRef) else root,
        "Encrypt": PdfRef(enc_no, 0),
        "ID": [id0, id0],
    }
    if info is not None:
        trailer["Info"] = info
    buf += b"trailer\n" + _serialize(trailer) + b"\n"
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(buf)


def _as_parsed(enc: dict):
    """Deep-convert a plain fixture dict into pdfparse-shaped values
    (names stay str; nested dicts copied)."""
    out = {}
    for k, v in enc.items():
        out[k] = dict(v) if isinstance(v, dict) else v
    if "CF" in out:
        out["CF"] = {k: dict(v) for k, v in enc["CF"].items()}
    return out
