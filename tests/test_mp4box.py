"""ISO-BMFF (mp4) demux/mux tests."""

import numpy as np
import pytest

from pdf2pdfocr_ray.functions.jpegcodec import encode_jpeg
from pdf2pdfocr_ray.functions.mp3codec import encode_mp3
from pdf2pdfocr_ray.functions.mp4box import (
    decode_mp4_audio,
    demux_samples,
    mux_mp4,
    parse_mp4,
    sample_frames_mp4,
)


def _frames(n=5, w=48, h=32):
    return [encode_jpeg(np.full((h, w, 3), 40 * i, np.uint8))
            for i in range(1, n + 1)]


def test_video_roundtrip_sample_identity():
    frames = _frames()
    mp4 = mux_mp4(video_frames=frames, fps=5, width=48, height=32)
    (tr,) = parse_mp4(mp4)
    assert tr["kind"] == "video" and tr["codec"] == "jpeg"
    assert tr["width"] == 48 and tr["height"] == 32
    assert demux_samples(mp4, tr) == frames     # byte identity
    out = sample_frames_mp4(mp4, 3)
    assert len(out) == 3 and out[0].shape == (32, 48, 3)
    # evenly spaced: first and last frames included
    assert np.array_equal(out[0], sample_frames_mp4(mp4, 5)[0])


def test_audio_pcm_and_mp3_tracks():
    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 44100)
    pcm = np.clip(np.round(x * 32767), -32768, 32767).astype(
        "<i2").tobytes()
    m4a = mux_mp4(audio_payloads=[pcm[i: i + 4096]
                                  for i in range(0, len(pcm), 4096)],
                  audio_codec="sowt", rate=44100)
    y, r = decode_mp4_audio(m4a)
    assert r == 44100 and y.shape == (8000, 1)
    assert np.abs(y[:, 0] - x).max() < 1e-4
    xl = 0.3 * np.sin(2 * np.pi * 440 * np.arange(23040) / 44100)
    m4a2 = mux_mp4(audio_payloads=[encode_mp3(xl, 44100)],
                   audio_codec="mp4a", rate=44100, audio_oti=0x6B)
    y2, r2 = decode_mp4_audio(m4a2)
    assert r2 == 44100 and y2.shape[0] % 1152 == 0
    n = 22900
    g = np.dot(y2[:n, 0], xl[:n]) / np.dot(xl[:n], xl[:n])
    err = y2[:n, 0] - g * xl[:n]
    assert 10 * np.log10((xl[:n] ** 2).sum() * g * g
                         / (err ** 2).sum()) > 14.0


def test_dual_track_file():
    frames = _frames(4)
    enc = encode_mp3(0.2 * np.sin(np.arange(4608) * 0.05), 44100)
    both = mux_mp4(video_frames=frames, fps=4, width=48, height=32,
                   audio_payloads=[enc], audio_codec="mp4a",
                   rate=44100, audio_oti=0x6B)
    kinds = [(t["kind"], t["codec"]) for t in parse_mp4(both)]
    assert kinds == [("video", "jpeg"), ("audio", "mp4a")]
    assert len(sample_frames_mp4(both, 2)) == 2
    assert decode_mp4_audio(both)[1] == 44100


def test_absent_codecs_are_gated_not_crashed():
    frames = _frames(2)
    mp4 = bytearray(mux_mp4(video_frames=frames, fps=2, width=48,
                            height=32))
    idx = bytes(mp4).rindex(b"jpeg")            # stsd entry (moov at end)
    mp4[idx: idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        sample_frames_mp4(bytes(mp4), 2)
    # demux itself still works on the avc1 track
    (tr,) = parse_mp4(bytes(mp4))
    assert tr["codec"] == "avc1" and demux_samples(bytes(mp4), tr) == frames
    aac = mux_mp4(audio_payloads=[b"\x01\x02"], audio_codec="mp4a",
                  rate=44100, audio_oti=0x40)
    with pytest.raises(NotImplementedError, match="0x40"):
        decode_mp4_audio(aac)


def test_malformed_rejected():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 32)
    good = mux_mp4(video_frames=_frames(2), fps=2, width=48, height=32)
    with pytest.raises(ValueError):
        parse_mp4(good[: len(good) // 2])       # moov truncated away


def test_video_stage_routes_mp4(ray_session):
    import pyarrow as pa

    from pdf2pdfocr_ray.functions.pngcodec import decode_png
    from pdf2pdfocr_ray.ops.multimodal import VideoFrameSampleStage

    frames = _frames(6)
    mp4 = mux_mp4(video_frames=frames, fps=6, width=48, height=32)
    tbl = pa.table({"doc_id": [0], "video": [mp4]})
    out = VideoFrameSampleStage(n_frames=3, strict=True)(tbl).to_pandas()
    sampled = out["frames"][0]
    assert len(sampled) == 3
    img = decode_png(sampled[0])
    assert img.shape == (32, 48, 3)
    # avc1 in non-strict mode: deterministic stub, no crash
    patched = bytearray(mp4)
    idx = bytes(patched).rindex(b"jpeg")
    patched[idx: idx + 4] = b"avc1"
    tbl2 = pa.table({"doc_id": [0], "video": [bytes(patched)]})
    out2 = VideoFrameSampleStage(n_frames=2, strict=False)(tbl2).to_pandas()
    assert len(out2["frames"][0]) == 2


def test_audio_stage_routes_m4a(ray_session):
    import pyarrow as pa

    from pdf2pdfocr_ray.ops.multimodal import AudioFeatureStage

    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(23040) / 44100)
    m4a = mux_mp4(audio_payloads=[encode_mp3(x, 44100)],
                  audio_codec="mp4a", rate=44100, audio_oti=0x6B)
    aac = mux_mp4(audio_payloads=[b"\x00\x01"], audio_codec="mp4a",
                  rate=44100, audio_oti=0x40)
    tbl = pa.table({"doc_id": [0, 1], "audio": [m4a, aac]})
    feat = AudioFeatureStage(strict=False)(tbl).to_pandas()
    assert feat["n_samples"][0] == 23040
    assert abs(feat["rms"][0] - 0.3 / np.sqrt(2)) < 0.02
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(
            pa.table({"doc_id": [1], "audio": [aac]}))
