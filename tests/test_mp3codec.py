"""MPEG-1/2 Layer III codec tests.

Validation strategy (no reference decoder exists in this container —
see mp3_tables' docstring): structural table validation, bit-exact
encoder/decoder agreement, PSNR roundtrips through the full chain,
unit oracles for decode-only paths (scfsi, LSF scalefactors, intensity
stereo, MS patching), and a REAL third-party file pin (the gsutil test
fixture — MPEG-2 LSF mono, 45 frames of digital silence, which pins
the frame walk, LSF side info, reservoir bookkeeping and exact-zero
output)."""

import os

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.mp3codec import (
    Mp3Error,
    Mp3UnsupportedTable,
    _Bits,
    _BitWriter,
    _read_scalefactors_lsf,
    _read_scalefactors_v1,
    _stereo,
    decode_mp3,
    encode_mp3,
)

REAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
            "test_data/test.mp3")


def _psnr_aligned(x, y, search=2200):
    best = -1e9
    for d in range(search):
        n = min(len(x), len(y) - d) - 100
        if n < 500:
            break
        seg, ref = y[d: d + n], x[:n]
        g = np.dot(seg, ref) / max(np.dot(ref, ref), 1e-30)
        err = seg - g * ref
        p = 10 * np.log10(max(np.dot(ref, ref) * g * g, 1e-30)
                          / max(np.dot(err, err), 1e-30))
        best = max(best, p)
    return best


def test_huffman_tables_are_complete_prefix_codes():
    from fractions import Fraction

    from pdf2pdfocr_ray.functions.mp3_tables import (
        COUNT1_A_HCOD, COUNT1_A_HLEN, HUFF_BIG, SFB_LONG, SFB_SHORT)

    for tid, (hlen, hcod) in HUFF_BIG.items():
        kraft = Fraction(0)
        codes = set()
        for x in range(len(hlen)):
            for y in range(len(hlen[0])):
                kraft += Fraction(1, 1 << hlen[x][y])
                codes.add((hcod[x][y], hlen[x][y]))
        assert kraft == 1, tid
        assert len(codes) == len(hlen) * len(hlen[0]), tid
    assert sum(Fraction(1, 1 << ln) for ln in COUNT1_A_HLEN) == 1
    assert len(set(zip(COUNT1_A_HCOD, COUNT1_A_HLEN))) == 16
    for w in SFB_LONG.values():
        assert sum(w) == 576
    for w in SFB_SHORT.values():
        assert sum(w) == 192


def test_filterbank_near_perfect_reconstruction():
    from pdf2pdfocr_ray.functions.mp3codec import (
        _analysis_subbands, _synthesize)

    x = np.random.default_rng(0).standard_normal(32 * 400) * 0.3
    y = _synthesize(_analysis_subbands(x))
    assert _psnr_aligned(x, y, search=600) > 55.0


def test_roundtrip_tones_and_noise():
    t = np.arange(44100)
    cases = {
        "sine": 0.5 * np.sin(2 * np.pi * 440 * t / 44100),
        "multi": (0.3 * np.sin(2 * np.pi * 440 * t / 44100)
                  + 0.2 * np.sin(2 * np.pi * 1850 * t / 44100)
                  + 0.1 * np.sin(2 * np.pi * 7000 * t / 44100)),
        "noise": np.convolve(
            np.random.default_rng(3).standard_normal(44200),
            np.ones(8) / 8, "same")[:44100] * 0.2,
    }
    floors = {"sine": 18.0, "multi": 16.0, "noise": 13.0}
    for name, x in cases.items():
        enc = encode_mp3(x, 44100)
        y, rate = decode_mp3(enc)
        assert rate == 44100 and y.shape[1] == 1
        assert _psnr_aligned(x, y[:, 0]) > floors[name], name


def test_roundtrip_stereo_and_rates():
    t = np.arange(24000)
    xs = np.stack([0.4 * np.sin(2 * np.pi * 440 * t / 44100),
                   0.4 * np.sin(2 * np.pi * 660 * t / 44100)], axis=1)
    enc = encode_mp3(xs, 44100)
    y, rate = decode_mp3(enc)
    assert y.shape[1] == 2
    assert _psnr_aligned(xs[:, 0], y[:, 0]) > 15.0
    assert _psnr_aligned(xs[:, 1], y[:, 1]) > 15.0
    for r in (32000, 48000):
        y, rr = decode_mp3(encode_mp3(xs[:4000, 0], r))
        assert rr == r and y.shape[0] >= 4000


def test_silence_is_exact_and_truncation_degrades_gracefully():
    y, _ = decode_mp3(encode_mp3(np.zeros(4608), 44100))
    assert np.abs(y).max() == 0.0
    enc = encode_mp3(
        0.4 * np.sin(2 * np.pi * 440 * np.arange(4608) / 44100), 44100)
    y, _ = decode_mp3(enc[: len(enc) // 2])   # whole frames only
    assert y.shape[0] in (1152, 2304)


def test_error_paths():
    with pytest.raises(Mp3Error):
        decode_mp3(b"\x00" * 64)
    with pytest.raises(Mp3Error):
        decode_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x05hello")
    with pytest.raises(Mp3Error):
        encode_mp3(np.zeros(100), 22050)      # encoder is MPEG-1 only
    # MPEG-2.5 header
    h = bytearray(int.to_bytes((0x7FF << 21) | (0 << 19) | (1 << 17)
                               | (1 << 16) | (8 << 12), 4, "big"))
    with pytest.raises(Mp3Error):
        decode_mp3(bytes(h) + b"\x00" * 64)


def test_unsupported_huffman_table_is_flagged():
    """A frame whose side info selects table 13 (outside the validated
    subset) raises Mp3UnsupportedTable."""
    w = _BitWriter()
    w.write(0, 9)        # main_data_begin
    w.write(0, 5)        # private (mono)
    for _ in range(4):
        w.write(0, 1)    # scfsi
    for gi in range(2):
        w.write(30, 12)  # part2_3_length
        w.write(4, 9)    # big_values
        w.write(210, 8)  # global_gain
        w.write(0, 4)    # scalefac_compress
        w.write(0, 1)    # window_switching
        for t in (13, 0, 0):
            w.write(t, 5)
        w.write(7, 4)
        w.write(7, 3)
        w.write(0, 1)    # preflag
        w.write(0, 1)    # scalefac_scale
        w.write(0, 1)    # count1table_select
    side = w.bytes()
    assert len(side) == 17
    kbps, rate = 64, 44100
    fsize = 144000 * kbps // rate
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | \
        (5 << 12) | (0 << 10) | (3 << 6)
    frame = int.to_bytes(h, 4, "big") + side
    frame += b"\x55" * (fsize - len(frame))
    with pytest.raises(Mp3UnsupportedTable):
        decode_mp3(frame)


def test_scfsi_reuses_granule0_scalefactors():
    w = _BitWriter()
    sf0 = [3, 1, 4, 1, 5, 7, 2, 6, 5, 3, 5]       # slen1=3 region
    for v in sf0:
        w.write(v, 3)
    for v in [7, 2, 1, 0, 4, 6, 3, 2, 1, 5]:      # slen2=3
        w.write(v, 3)
    buf = w.bytes()
    g = dict(scalefac_compress=13, block_type=0, window_switching=0,
             mixed=0)
    r = _Bits(buf, 0)
    sf_l0, _, bits0 = _read_scalefactors_v1(r, g, None, None)
    assert list(sf_l0[:11]) == sf0 and bits0 == 63
    # granule 1 with scfsi groups 0 and 2 set: bands 0-5 and 11-15 reuse
    w2 = _BitWriter()
    for v in [1, 1, 1, 1, 1]:                     # bands 6-10
        w2.write(v, 3)
    for v in [2, 2, 2, 2, 2]:                     # bands 16-20
        w2.write(v, 3)
    r2 = _Bits(w2.bytes(), 0)
    sf_l1, _, _ = _read_scalefactors_v1(r2, g, [1, 0, 1, 0], sf_l0)
    assert list(sf_l1[:6]) == sf0[:6]             # reused
    assert list(sf_l1[6:11]) == [1] * 5           # read fresh
    assert list(sf_l1[11:16]) == list(sf_l0[11:16])
    assert list(sf_l1[16:21]) == [2] * 5


def test_lsf_scalefactor_cases():
    # case 0: sc = 77 -> sc>>4 = 4: slen1 = 0, slen2 = 4;
    # (77%16)>>2 = 3, 77%4 = 1 -> slens (0, 4, 3, 1), nr (6,5,5,5)
    vals = [0] * 6 + [9, 8, 7, 6, 5] + [3, 2, 1, 0, 4] + [1, 0, 1, 1, 0]
    w = _BitWriter()
    for v, sl in zip(vals, [0] * 6 + [4] * 5 + [3] * 5 + [1] * 5):
        if sl:
            w.write(v, sl)
    g = dict(scalefac_compress=77, block_type=0, window_switching=0,
             mixed=0)
    r = _Bits(w.bytes(), 0)
    sf_l, sf_s, bits = _read_scalefactors_lsf(r, g)
    assert list(sf_l[:21]) == vals
    assert bits == 4 * 5 + 3 * 5 + 1 * 5
    assert g["preflag"] == 0
    # case 2 sets preflag
    g2 = dict(scalefac_compress=500, block_type=0, window_switching=0,
              mixed=0)
    r2 = _Bits(b"\x00" * 16, 0)
    _read_scalefactors_lsf(r2, g2)
    assert g2["preflag"] == 1


def test_intensity_stereo_ratios():
    """MPEG-1 long-block intensity: bands above the right channel's
    zero bound split the left spectrum by tan(is_pos * pi/12)."""
    rate = 44100
    xr_l = np.zeros(576)
    xr_r = np.zeros(576)
    xr_l[:576] = 1.0
    hdr = dict(mode=1, mode_ext=1, version=3)
    g_r = dict(block_type=0, window_switching=0, mixed=0)
    sf_l_r = np.zeros(22, np.int32)
    sf_l_r[:] = 3                       # is_pos = 3 -> k = tan(pi/4) = 1
    l, r = _stereo(xr_l, xr_r, hdr, g_r, sf_l_r,
                   np.zeros((13, 3), np.int32), rate, nonzero_r=0)
    assert np.allclose(l, 0.5) and np.allclose(r, 0.5)
    # is_pos = 7 -> band untouched
    sf_l_r[:] = 7
    l, r = _stereo(xr_l, xr_r, hdr, g_r, sf_l_r,
                   np.zeros((13, 3), np.int32), rate, nonzero_r=0)
    assert np.allclose(l, 1.0) and np.allclose(r, 0.0)


def test_ms_stereo_via_patched_headers():
    """Encode (M*sqrt2, 0) as plain stereo, flip every frame header to
    joint-stereo/MS: the decode must come out as (M, M)."""
    t = np.arange(9216)
    m = 0.3 * np.sin(2 * np.pi * 520 * t / 44100)
    xs = np.stack([m * np.sqrt(2.0), np.zeros_like(m)], axis=1)
    enc = bytearray(encode_mp3(xs, 44100))
    off = 0
    while off + 4 <= len(enc):
        h = int.from_bytes(enc[off: off + 4], "big")
        assert (h >> 21) & 0x7FF == 0x7FF
        kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320][(h >> 12) & 15]
        fsize = 144000 * kbps // 44100 + ((h >> 9) & 1)
        h = (h & ~(0xF << 4)) | (1 << 6) | (2 << 4)   # joint + MS
        enc[off: off + 4] = int.to_bytes(h, 4, "big")
        off += fsize
    y_plain, _ = decode_mp3(
        bytes(encode_mp3(xs, 44100)))     # stereo, no MS bits
    y, _ = decode_mp3(bytes(enc))
    assert _psnr_aligned(m, y[:, 0]) > 12.0
    assert _psnr_aligned(m, y[:, 1]) > 12.0
    # the exact MS oracle: MS decode == plain decode / sqrt(2), L == R
    assert _psnr_aligned(y_plain[:, 0] / np.sqrt(2.0), y[:, 0],
                         search=5) > 60.0
    assert _psnr_aligned(y[:, 0], y[:, 1], search=5) > 60.0


@pytest.mark.skipif(not os.path.exists(REAL_MP3),
                    reason="gsutil fixture not present")
def test_real_third_party_file_pin():
    """The gsutil test.mp3 (MPEG-2 LSF 22.05 kHz mono, 45 frames of
    digital silence, reservoir offsets up to 255): decodes to exactly
    45*576 zero samples."""
    with open(REAL_MP3, "rb") as f:
        payload = f.read()
    pcm, rate = decode_mp3(payload)
    assert rate == 22050 and pcm.shape == (45 * 576, 1)
    assert np.abs(pcm).max() == 0.0


def test_decode_audio_routes_mp3():
    from pdf2pdfocr_ray.ops.multimodal import decode_audio, is_mp3

    x = 0.4 * np.sin(2 * np.pi * 700 * np.arange(23040) / 44100)
    enc = encode_mp3(x, 44100)
    assert is_mp3(enc)
    samples, rate = decode_audio(enc)
    assert rate == 44100 and samples.shape[1] == 1
    assert _psnr_aligned(x, samples[:, 0]) > 14.0


def test_audio_stages_accept_mp3(ray_session):
    """AudioFeatureStage + audio fingerprint treat mp3 rows as real
    decodes (no stub flag), and an mp3 re-encode of a WAV fingerprints
    identically (cross-container near-dup)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from pdf2pdfocr_ray.functions.wavcodec import encode_wav
    from pdf2pdfocr_ray.ops.multimodal import (
        AudioFeatureStage, AudioFingerprintStage)

    rng = np.random.default_rng(11)
    # bimodal envelope, exactly half loud / half quiet: every 64-window
    # RMS lands far from the median, so the fingerprint is stable
    # through the ~16 dB lossy roundtrip
    levels = rng.permutation([0.08] * 8 + [0.55] * 8)
    env = np.repeat(levels, 2880)                       # 46080 samples
    x = env * np.sin(2 * np.pi * 520 * np.arange(len(env)) / 44100)
    wav = encode_wav(x, 44100)
    mp3 = encode_mp3(x, 44100)
    tbl = pa.table({"doc_id": [0, 1], "audio": [wav, mp3]})
    feat = AudioFeatureStage(strict=True)(tbl).to_pandas()
    assert feat["n_samples"].tolist()[0] == len(x)
    assert abs(feat["duration_s"][1] - len(x) / 44100) < 0.06
    assert abs(feat["rms"][0] - feat["rms"][1]) < 0.05
    fp = AudioFingerprintStage()(
        pd.DataFrame({"doc_id": [0, 1], "audio": [wav, mp3]}))
    assert bool(fp["afp_ok"].all())
    # envelope fingerprint survives the lossy roundtrip exactly
    assert int(fp["afp"][0]) == int(fp["afp"][1])
