"""ISO-BMFF (MP4/QuickTime) demuxer + minimal muxer, pure Python.

Closes the "mp4/mkv need native demuxers" stub in ops/multimodal for
the container layer: the box walk, track discovery and sample-table
resolution (stsd / stts / stsc / stsz / stco / co64) are REAL, so any
mp4's samples can be extracted.  Codec routing after demux:

* video 'jpeg' / 'mjpa' (Motion-JPEG in MP4, the QuickTime/3GPP
  layout): every sample is a standalone JPEG the engine's own
  jpegcodec decodes — fully real path.
* audio 'sowt' / 'twos' / 'raw ' / 'lpcm': PCM16 — real.
* audio 'mp4a' with an esds objectTypeIndication of 0x6B/0x69
  (MPEG-1/2 audio): samples are mp3 frames — decoded by the engine's
  mp3codec (real, within its validated-table subset).
* 'avc1'/'hev1' video and AAC (OTI 0x40) audio: the bitstream codecs
  are genuinely absent from this container — ``NotImplementedError``
  with the track still fully demuxed (callers isolate per row).

The muxer writes a minimal conforming single-or-dual-track file
(ftyp + mdat + moov with full sample tables) used for fixtures and
roundtrip tests.
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed mp4 box")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _walk(data, pos, end):
        if t == btype:
            return b, e
    return None


def _esds_oti(body: bytes) -> int | None:
    """Walk the MPEG-4 descriptor soup inside esds for the
    DecoderConfigDescriptor's objectTypeIndication."""
    pos = 4                                  # version/flags
    while pos < len(body):
        tag = body[pos]
        pos += 1
        size = 0
        while pos < len(body):               # expandable length
            b = body[pos]
            pos += 1
            size = (size << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        if tag == 0x03:                      # ES_Descriptor: dive in
            inner = pos + 3                  # ES_ID + flags
            flags = body[pos + 2]
            if flags & 0x80:
                inner += 2
            if flags & 0x40:
                inner += 1 + body[inner]
            if flags & 0x20:
                inner += 2
            pos = inner
            continue
        if tag == 0x04:                      # DecoderConfigDescriptor
            return body[pos]
        pos += size
    return None


def parse_mp4(data: bytes) -> list[dict]:
    """mp4 bytes -> list of track dicts: kind ('video'/'audio'),
    codec fourcc (str), timescale, duration_s, per-track metadata
    (width/height or channels/rate, esds_oti) and resolved
    ``samples`` = [(offset, size), ...] in decode order."""
    if _find(data, 0, len(data), b"ftyp") is None and \
            _find(data, 0, len(data), b"moov") is None:
        raise ValueError("not an ISO-BMFF file")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("mp4 has no moov box")
    tracks = []
    for t, b, e in _walk(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        info: dict = {"codec": None, "kind": None}
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd:
            ver = data[mdhd[0]]
            if ver == 1:
                info["timescale"], dur = struct.unpack_from(
                    ">IQ", data, mdhd[0] + 4 + 16)
            else:
                info["timescale"], dur = struct.unpack_from(
                    ">II", data, mdhd[0] + 4 + 8)
            info["duration_s"] = dur / max(info["timescale"], 1)
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr:
            h = data[hdlr[0] + 8: hdlr[0] + 12]
            info["kind"] = {b"vide": "video", b"soun": "audio"}.get(h)
        minf = _find(data, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find(data, *minf, b"stbl")
        if stbl is None:
            continue
        # ---- stsd: sample description (codec + shape)
        stsd = _find(data, *stbl, b"stsd")
        if stsd:
            p = stsd[0] + 8                   # ver/flags + entry count
            (esize,) = struct.unpack_from(">I", data, p)
            fourcc = data[p + 4: p + 8]
            info["codec"] = fourcc.decode("latin1").strip()
            if info["kind"] == "video":
                info["width"], info["height"] = struct.unpack_from(
                    ">HH", data, p + 8 + 6 + 2 + 16)
            elif info["kind"] == "audio":
                ch, ss = struct.unpack_from(">HH", data, p + 8 + 6 + 2 + 8)
                (rate_fx,) = struct.unpack_from(">I", data, p + 8 + 6 + 2
                                                + 8 + 4 + 4)
                info["channels"], info["sample_size"] = ch, ss
                info["rate"] = rate_fx >> 16
                if fourcc == b"mp4a":
                    esds = _find(data, p + 8 + 6 + 2 + 20, p + esize,
                                 b"esds")
                    if esds:
                        info["esds_oti"] = _esds_oti(
                            data[esds[0]: esds[1]])
        # ---- sample tables
        stsz = _find(data, *stbl, b"stsz")
        sizes: list[int] = []
        if stsz:
            uniform, count = struct.unpack_from(">II", data, stsz[0] + 4)
            if uniform:
                sizes = [uniform] * count
            else:
                sizes = list(struct.unpack_from(
                    f">{count}I", data, stsz[0] + 12))
        stco = _find(data, *stbl, b"stco")
        co64 = _find(data, *stbl, b"co64")
        chunks: list[int] = []
        if stco:
            (cn,) = struct.unpack_from(">I", data, stco[0] + 4)
            chunks = list(struct.unpack_from(f">{cn}I", data, stco[0] + 8))
        elif co64:
            (cn,) = struct.unpack_from(">I", data, co64[0] + 4)
            chunks = list(struct.unpack_from(f">{cn}Q", data, co64[0] + 8))
        stsc = _find(data, *stbl, b"stsc")
        runs: list[tuple[int, int]] = []      # (first_chunk, per_chunk)
        if stsc:
            (rn,) = struct.unpack_from(">I", data, stsc[0] + 4)
            for i in range(rn):
                fc, spc, _di = struct.unpack_from(
                    ">III", data, stsc[0] + 8 + 12 * i)
                runs.append((fc, spc))
        # resolve (offset, size) per sample
        samples: list[tuple[int, int]] = []
        si = 0
        for ci, coff in enumerate(chunks, start=1):
            spc = 1
            for fc, n in runs:
                if fc <= ci:
                    spc = n
                else:
                    break
            off = coff
            for _ in range(spc):
                if si >= len(sizes):
                    break
                samples.append((off, sizes[si]))
                off += sizes[si]
                si += 1
        info["samples"] = samples
        tracks.append(info)
    if not tracks:
        raise ValueError("mp4 has no usable tracks")
    return tracks


def demux_samples(data: bytes, track: dict) -> list[bytes]:
    return [data[o: o + s] for o, s in track["samples"]]


def sample_frames_mp4(data: bytes, n_frames: int) -> list[np.ndarray]:
    """Evenly-sampled decoded frames from an MJPEG mp4 video track."""
    from .jpegcodec import decode_jpeg

    for tr in parse_mp4(data):
        if tr["kind"] != "video":
            continue
        if tr["codec"] not in ("jpeg", "mjpa", "mjpb"):
            raise NotImplementedError(
                f"mp4 video codec {tr['codec']!r} needs a native decoder "
                "absent from this container (MJPEG tracks decode in-"
                "process)")
        payloads = demux_samples(data, tr)
        if not payloads:
            return []
        idx = np.linspace(0, len(payloads) - 1,
                          min(n_frames, len(payloads))).astype(int)
        return [decode_jpeg(payloads[i]) for i in idx]
    raise ValueError("mp4 has no video track")


def decode_mp4_audio(data: bytes):
    """(samples float64 (n, ch) in [-1, 1], rate) from an mp4 audio
    track: PCM16 ('sowt'/'twos'/'raw '/'lpcm') or MPEG audio in
    'mp4a' (esds OTI 0x6B/0x69 -> mp3codec)."""
    for tr in parse_mp4(data):
        if tr["kind"] != "audio":
            continue
        payload = b"".join(demux_samples(data, tr))
        codec = tr["codec"]
        if codec in ("sowt", "raw", "lpcm", "twos"):
            dt = "<i2" if codec in ("sowt", "lpcm", "raw") else ">i2"
            pcm = np.frombuffer(
                payload[: len(payload) // 2 * 2], dtype=dt)
            ch = max(1, tr.get("channels", 1))
            pcm = pcm[: len(pcm) // ch * ch].reshape(-1, ch)
            return pcm.astype(np.float64) / 32767.0, tr.get("rate", 44100)
        if codec == "mp4a":
            oti = tr.get("esds_oti")
            if oti in (0x6B, 0x69):
                from .mp3codec import decode_mp3

                return decode_mp3(payload)
            raise NotImplementedError(
                f"mp4a objectTypeIndication 0x{oti:02x} (AAC?) needs a "
                "native decoder absent from this container")
        raise NotImplementedError(
            f"mp4 audio codec {codec!r} not decodable in-process")
    raise ValueError("mp4 has no audio track")


# ---------------------------------------------------------------------------
# muxer (fixtures)


def _box(btype: bytes, *bodies: bytes) -> bytes:
    body = b"".join(bodies)
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, verflags: int, *bodies: bytes) -> bytes:
    return _box(btype, struct.pack(">I", verflags), *bodies)


def _stbl(entry: bytes, sizes: list[int], offset0: int,
          timescale: int, sample_delta: int) -> bytes:
    n = len(sizes)
    offsets = []
    off = offset0
    for s in sizes:
        offsets.append(off)
        off += s
    return _box(
        b"stbl",
        _full(b"stsd", 0, struct.pack(">I", 1), entry),
        _full(b"stts", 0, struct.pack(">III", 1, n, sample_delta)),
        _full(b"stsc", 0, struct.pack(">IIII", 1, 1, 1, 1)),
        _full(b"stsz", 0, struct.pack(">II", 0, n),
              struct.pack(f">{n}I", *sizes)),
        _full(b"stco", 0, struct.pack(">I", n),
              struct.pack(f">{n}I", *offsets)),
    )


def _trak(track_id: int, kind: str, entry: bytes, sizes: list[int],
          offset0: int, timescale: int, delta: int, n: int,
          w: int = 0, h: int = 0) -> bytes:
    dur = n * delta
    tkhd = _full(b"tkhd", 7, struct.pack(
        ">IIIIII", 0, 0, track_id, 0, dur, 0),
        b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))
    handler = b"vide" if kind == "video" else b"soun"
    hdlr = _full(b"hdlr", 0, b"\x00" * 4, handler, b"\x00" * 12,
                 b"engine\x00")
    mhd = (_full(b"vmhd", 1, struct.pack(">HHHH", 0, 0, 0, 0))
           if kind == "video" else
           _full(b"smhd", 0, struct.pack(">HH", 0, 0)))
    dinf = _box(b"dinf", _full(b"dref", 0, struct.pack(">I", 1),
                               _full(b"url ", 1)))
    minf = _box(b"minf", mhd, dinf,
                _stbl(entry, sizes, offset0, timescale, delta))
    return _box(b"trak", tkhd, _box(b"mdia", mdhd, hdlr, minf))


def _video_entry(w: int, h: int, fourcc: bytes = b"jpeg") -> bytes:
    return _box(fourcc,
                b"\x00" * 6 + struct.pack(">H", 1),
                struct.pack(">HHIII", 0, 0, 0, 0, 0),
                struct.pack(">HH", w, h),
                struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1),
                b"\x00" * 32,
                struct.pack(">Hh", 24, -1))


def _audio_entry(fourcc: bytes, channels: int, rate: int,
                 esds_oti: int | None = None) -> bytes:
    body = (b"\x00" * 6 + struct.pack(">H", 1)
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">HHHH", channels, 16, 0, 0)
            + struct.pack(">I", rate << 16))
    if esds_oti is not None:
        dcd = bytes([0x04, 13, esds_oti, 0x15]) + b"\x00" * 11
        esd = bytes([0x03, 3 + len(dcd), 0, 0, 0]) + dcd
        body += _full(b"esds", 0, esd)
    return _box(fourcc, body)


def mux_mp4(video_frames: list[bytes] | None = None,
            fps: float = 10.0, width: int = 0, height: int = 0,
            audio_payloads: list[bytes] | None = None,
            audio_codec: str = "sowt", channels: int = 1,
            rate: int = 44100, audio_oti: int | None = None) -> bytes:
    """Minimal conforming mp4: optional MJPEG video track (one JPEG
    per frame) and/or one audio track ('sowt' PCM16LE payloads or
    'mp4a' with ``audio_oti``, e.g. 0x6B for mp3 frames)."""
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200),
                b"isomiso2mp41")
    media = b"".join(video_frames or []) + b"".join(audio_payloads or [])
    mdat_off = len(ftyp) + 8
    mdat = _box(b"mdat", media)
    traks = []
    tid = 1
    off = mdat_off
    timescale = 1000
    if video_frames:
        sizes = [len(f) for f in video_frames]
        traks.append(_trak(tid, "video", _video_entry(width, height),
                           sizes, off, timescale,
                           max(1, int(round(timescale / fps))),
                           len(sizes), width, height))
        off += sum(sizes)
        tid += 1
    if audio_payloads:
        sizes = [len(p) for p in audio_payloads]
        entry = _audio_entry(audio_codec.encode("latin1").ljust(4),
                             channels, rate, audio_oti)
        n_samp = (sum(sizes) // (2 * channels)
                  if audio_codec == "sowt" else len(sizes))
        traks.append(_trak(tid, "audio", entry, sizes, off, rate,
                           1, max(n_samp, 1)))
        off += sum(sizes)
        tid += 1
    if not traks:
        raise ValueError("mux_mp4 needs at least one track")
    mvhd = _full(b"mvhd", 0, struct.pack(
        ">IIIII", 0, 0, timescale, 0, 0x00010000),
        struct.pack(">HHII", 0x0100, 0, 0, 0),
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                    0x40000000),
        b"\x00" * 24, struct.pack(">I", tid))
    moov = _box(b"moov", mvhd, *traks)
    return ftyp + mdat + moov
