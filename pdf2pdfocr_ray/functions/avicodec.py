"""Minimal MJPEG-in-AVI demuxer/muxer, pure Python.

Replaces the video stub in ops/multimodal for the one container that
needs no native codec: Motion-JPEG AVI, where every video chunk
(``00dc``/``00db``) is a standalone baseline JPEG that the engine's own
jpegcodec decodes.  Non-MJPEG AVIs and other containers (mp4/mkv) raise
``ValueError`` — documented limits, same posture as the PDF/JPEG/TIFF
baseline subsets.

Layout parsed: RIFF 'AVI ' → LIST hdrl (avih main header for
frame-rate/count) → LIST movi → 00dc/00db chunks (optionally inside a
LIST rec), idx1 ignored (chunks are walked directly).
"""

from __future__ import annotations

import struct

import numpy as np

_VIDEO_CHUNK_IDS = (b"00dc", b"00db")


def demux_avi_mjpeg(data: bytes) -> tuple[list[bytes], float]:
    """AVI bytes -> (list of JPEG frame payloads, frames_per_second)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps = 0.0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)  # skip list type
            elif cid == b"avih" and size >= 4:
                (usec_per_frame,) = struct.unpack_from("<I", data, body_start)
                if usec_per_frame:
                    fps = 1_000_000.0 / usec_per_frame
            elif cid in _VIDEO_CHUNK_IDS:
                payload = data[body_start : body_start + size]
                if not payload.startswith(b"\xff\xd8"):
                    raise ValueError(
                        "AVI video chunk is not JPEG (only MJPEG AVIs are "
                        "supported without native codecs)"
                    )
                frames.append(payload)
            pos = body_start + size + (size & 1)

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI contains no video chunks")
    return frames, fps


def mux_avi_mjpeg(
    frames: list[bytes], fps: float = 10.0, width: int = 0, height: int = 0
) -> bytes:
    """JPEG payloads -> minimal MJPEG AVI bytes (fixture writer)."""
    if not frames:
        raise ValueError("no frames")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1_000_000 / fps),  # usec per frame
        0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                           int(fps), 0, len(frames), 0, 0, 0, 0)
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def sample_frames(data: bytes, n_frames: int) -> list[np.ndarray]:
    """Demux + decode ``n_frames`` evenly-spaced frames as RGB arrays."""
    from .jpegcodec import decode_jpeg

    payloads, _fps = demux_avi_mjpeg(data)
    if n_frames >= len(payloads):
        picks = list(range(len(payloads)))
    else:
        picks = [
            int(round(i * (len(payloads) - 1) / max(1, n_frames - 1)))
            for i in range(n_frames)
        ]
    return [decode_jpeg(payloads[i]) for i in picks]
