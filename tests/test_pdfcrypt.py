"""PDF standard security handler (functions/pdfcrypt): primitive
known-answer tests, handler authentication, transparent decryption through
pdfparse/minipdf, pipeline integration (reference default-mode parity:
poppler opens empty-user-password files; -a check_protection_mode refuses
any /Encrypt, pdf2pdfocr.py:1196-1198, 1428-1429), and malformed-input
fuzz (typed error rows, never a stage crash)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf2pdfocr_ray.functions.minipdf import (
    PageSpec,
    build_foreign_pdf,
    build_foreign_pdf_15,
    build_pdf,
    build_scanned_pdf,
    parse_pdf,
)
from pdf2pdfocr_ray.functions.pdfcrypt import (
    StandardSecurityHandler,
    _as_parsed,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_decrypt_block,
    aes_encrypt_block,
    encrypt_pdf,
    make_encrypt_dict,
    rc4,
)

VARIANTS = ("rc4-40", "rc4-128", "aes-128", "aes-256")


# ------------------------------------------------------------- primitives
def test_aes_fips197_known_answers():
    """FIPS-197 appendix C vectors pin the whole AES construction
    (tables are computed, not transcribed — these vectors catch any slip)."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key, ct_hex in cases:
        ct = aes_encrypt_block(pt, key)
        assert ct.hex() == ct_hex
        assert aes_decrypt_block(ct, key) == pt


def test_aes_cbc_roundtrip_and_iv_layout():
    key = bytes(range(32))
    data = b"The quick brown fox jumps over the lazy dog" * 9
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct = aes_cbc_encrypt(data, key, iv)
    assert len(ct) % 16 == 0 and len(ct) > len(data)  # PKCS#7 always pads
    assert aes_cbc_decrypt(iv + ct, key) == data  # PDF layout: IV prefix
    assert aes_cbc_decrypt(ct, key, iv=iv) == data
    # single-block CBC with zero IV == ECB (kernel cross-check: the
    # sequential T-table encryptor vs the vectorized numpy decryptor)
    one = aes_cbc_encrypt(b"\x00" * 16, key[:16], bytes(16), pad=False)
    assert one == aes_encrypt_block(b"\x00" * 16, key[:16])


def test_rc4_known_answer_and_symmetry():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    msg = b"arbitrary bytes \x00\xff here"
    assert rc4(b"k3y", rc4(b"k3y", msg)) == msg


# ---------------------------------------------------------------- handler
@pytest.mark.parametrize("variant", VARIANTS)
def test_handler_empty_password_roundtrip(variant):
    enc, h = make_encrypt_dict(variant)
    s = h.encrypt_string(b"secret string value", 7, 0)
    assert s != b"secret string value"
    assert h.decrypt_string(s, 7, 0) == b"secret string value"
    t = h.encrypt_stream(b"stream payload" * 9, 12, 0)
    assert h.decrypt_stream(t, 12, 0) == b"stream payload" * 9
    # object keys differ per object number for V<5
    if variant != "aes-256":
        assert h.encrypt_string(b"same", 1, 0) != h.encrypt_string(b"same", 2, 0)


@pytest.mark.parametrize("variant", VARIANTS)
def test_handler_rejects_wrong_password_accepts_right_one(variant):
    enc, _ = make_encrypt_dict(variant, user_pw=b"hunter2")
    h = StandardSecurityHandler(_as_parsed(enc), b"\x01" * 16)
    assert not h.authenticate(b"")
    assert not h.authenticate(b"wrong")
    assert h.authenticate(b"hunter2")


def test_handler_rejects_unsupported_encrypt_dicts():
    with pytest.raises(ValueError):
        StandardSecurityHandler({"Filter": "MySecretFilter", "V": 1}, b"")
    with pytest.raises(ValueError):
        StandardSecurityHandler({"Filter": "Standard", "V": 3}, b"")
    with pytest.raises(ValueError):  # missing /O //U
        StandardSecurityHandler({"Filter": "Standard", "V": 1, "R": 2}, b"")


# -------------------------------------------------- transparent decryption
@pytest.mark.parametrize("variant", VARIANTS)
def test_encrypted_foreign_pdf_text_byte_identical(variant):
    pages = [["Hello encrypted world", "second line"], ["page two text"]]
    plain = build_foreign_pdf(pages, title="Enc Test")
    ref = parse_pdf(plain)
    d = parse_pdf(encrypt_pdf(plain, variant))
    assert d.was_encrypted and not d.is_encrypted
    assert [p.lines for p in d.pages] == [p.lines for p in ref.pages]
    assert d.metadata == ref.metadata  # /Info strings decrypt too


def test_encrypted_mini_dialect_pagespec_fidelity():
    pages = [
        PageSpec(lines=["mini text", "line two"], dpi=150, rot_k=1,
                 shear=0.4, color=True),
        PageSpec(blank=True),
    ]
    plain = build_pdf(pages, title="Mini")
    ref, d = parse_pdf(plain), parse_pdf(encrypt_pdf(plain, "aes-128"))
    for a, b in zip(ref.pages, d.pages):
        assert (a.lines, a.dpi, a.rot_k, a.shear, a.color, a.blank) == (
            b.lines, b.dpi, b.rot_k, b.shear, b.color, b.blank)


def test_encrypted_scanned_pdf_image_payloads_identical():
    from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg
    from pdf2pdfocr_ray.functions.pagerender import render_page

    img = render_page(["scan line one"], dpi=72)
    frames = [
        ("jpeg", encode_jpeg(img, quality=95), img.shape[1], img.shape[0]),
        ("gray", img.mean(axis=2).astype(np.uint8)),
    ]
    plain = build_scanned_pdf(frames)
    ref, d = parse_pdf(plain), parse_pdf(encrypt_pdf(plain, "rc4-128"))
    assert [p.image_bytes for p in d.pages] == [p.image_bytes for p in ref.pages]


def test_encrypted_pdf15_objstm_expansion():
    """ObjStm-bearing input: encrypt_pdf expands compressed objects and
    the reader decrypts the classic rewrite byte-identically."""
    plain = build_foreign_pdf_15([["alpha beta gamma", "delta"], ["page 2"]])
    ref = parse_pdf(plain)
    for variant in ("rc4-128", "aes-128"):
        d = parse_pdf(encrypt_pdf(plain, variant))
        assert [p.lines for p in d.pages] == [p.lines for p in ref.pages]


def test_locked_pdf_stays_on_encrypted_route():
    plain = build_foreign_pdf([["protected content"]])
    locked = encrypt_pdf(plain, "rc4-128", user_pw=b"hunter2")
    d = parse_pdf(locked)
    assert d.is_encrypted and d.was_encrypted and d.pages is None
    # legacy degenerate /Encrypt marker (no /O //U) also stays locked
    legacy = build_pdf([PageSpec(lines=["x"])], encrypted=True)
    d2 = parse_pdf(legacy)
    assert d2.is_encrypted and d2.pages is None


# ------------------------------------------------------------ integration
def _run(pages: pa.Table, **cfg_kwargs) -> pd.DataFrame:
    import ray.data

    from pdf2pdfocr_ray.config import PipelineConfig
    from pdf2pdfocr_ray.pipelines.extract import extract

    ds = ray.data.from_arrow(pages).repartition(2)
    cfg = PipelineConfig(**cfg_kwargs) if cfg_kwargs else None
    return (
        extract(ds, cfg).to_pandas().sort_values("url").reset_index(drop=True)
    )


def _pages_table(payloads: list[bytes]) -> pa.Table:
    return pa.table(
        {
            "url": [f"https://example.org/enc/{i:04d}" for i in range(len(payloads))],
            "warc_ts": pa.array([1_600_000_000_000_000 + i for i in range(len(payloads))], pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": [""] * len(payloads),
            "lang": ["en"] * len(payloads),
        }
    )


def test_flagship_extracts_encrypted_pdfs_byte_identical(ray_session):
    """Empty-user-password files of all four variants flow through the
    full sniff->fanout->OCR->assemble pipeline to the same bytes as their
    plaintext twins; a locked file lands on the 'encrypted' error route
    in the same run."""
    from pdf2pdfocr_ray.functions.hocr import normalize_ligatures

    lines = [["Rendered ocr text here", "and a second line"]]
    plain = build_foreign_pdf(lines)
    payloads = [plain] + [encrypt_pdf(plain, v) for v in VARIANTS]
    payloads.append(encrypt_pdf(plain, "aes-128", user_pw=b"nope"))
    res = _run(_pages_table(payloads))
    assert len(res) == 6
    ok = res[res["error"].isna()]
    assert len(ok) == 5
    texts = set(ok["extracted_text"])
    assert len(texts) == 1  # all five byte-identical
    locked = res[res["error"].notna()]
    assert list(locked["error"]) == ["encrypted"]


def test_check_protection_mode_refuses_decryptable_pdfs(ray_session):
    """Reference -a parity: with check_protection set, even an
    empty-user-password file is refused."""
    plain = build_foreign_pdf([["some text"]])
    enc = encrypt_pdf(plain, "rc4-40")
    res = _run(_pages_table([plain, enc]), check_protection=True)
    assert res["error"].notna().sum() == 1
    assert set(res[res["error"].notna()]["error"]) == {"encrypted"}
    assert res[res["error"].isna()]["extracted_text"].notna().all()


def test_malformed_encrypted_pdfs_are_isolated(ray_session):
    """Bit-flipped / truncated encrypted files must land on typed error
    routes (or decode, for flips in slack bytes) — never crash the task."""
    plain = build_foreign_pdf([["fuzz target text line"]])
    enc = encrypt_pdf(plain, "aes-128")
    rng = np.random.default_rng(99)
    payloads = [enc]
    for cut in (len(enc) // 3, len(enc) - 7):
        payloads.append(enc[:cut])
    for _ in range(12):
        b = bytearray(enc)
        b[int(rng.integers(0, len(enc)))] ^= 1 << int(rng.integers(0, 8))
        payloads.append(bytes(b))
    res = _run(_pages_table(payloads))
    assert len(res) >= len(payloads)  # every input accounted for
    bad = res[res["error"].notna()]
    assert set(bad["error"]) <= {"corrupt_pdf", "encrypted", "unsupported_type",
                                 "image_decode"}
