"""The OCR engine core: line/glyph segmentation + template classification.

In-process replacement for the external Tesseract/Cuneiform binaries the
reference drives via subprocess (/root/reference/pdf2pdfocr.py:104-207).  The
algorithm is a real (if small) OCR engine over the deterministic 5x7 font:

1. binarize -> ink mask;
2. horizontal-projection line segmentation (blank-row runs >= 4 units split
   line bands; glyph-internal blank rows are <= 2 units by font invariant);
3. per line, vertical-projection glyph segmentation (any blank column splits
   glyphs — the font guarantees no internal blank columns — and gaps >= 5
   units split words; inter-char gaps are exactly 2 units);
4. per glyph, tight-crop, block-downsample by the render scale, and exact
   template match against the font table (unknown shapes -> U+FFFD).

Orientation detection (reference: tesseract --psm 0 OSD,
/root/reference/pdf2pdfocr.py:78-91) falls out of the same machinery: try the
four 90-degree rotations and keep the one whose first glyphs actually match
templates.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from .font5x7 import (
    LINE_SPLIT_UNITS,
    REPLACEMENT_CHAR,
    WORD_GAP_MIN_UNITS,
    classify_tight,
)
from .image_ops import ink_mask


class OcrDeadlineExceeded(Exception):
    """Raised inside the engine's scan loops when the per-page deadline set
    via :func:`set_deadline` has passed.  This is the PREEMPTIVE analog of
    the reference's ``--timeout`` future wrapper
    (/root/reference/pdf2pdfocr.py:1511-1528): the reference interrupts a
    hung document; here the engine's own loops yield, so a pathological
    page stops occupying its actor at ~the deadline instead of running to
    completion and being marked late."""


# One deadline per worker process; actors process one batch at a time, so a
# module global is race-free and costs one monotonic() read per check site.
_deadline: float | None = None


def set_deadline(t: float | None) -> None:
    global _deadline
    _deadline = t


def check_deadline() -> None:
    if _deadline is not None and time.monotonic() > _deadline:
        raise OcrDeadlineExceeded()


@dataclass
class WordBox:
    text: str
    x1: int
    y1: int
    x2: int
    y2: int


@dataclass
class LineBox:
    words: list[WordBox] = field(default_factory=list)

    @property
    def bbox(self) -> tuple[int, int, int, int]:
        return (
            min(w.x1 for w in self.words),
            min(w.y1 for w in self.words),
            max(w.x2 for w in self.words),
            max(w.y2 for w in self.words),
        )

    @property
    def text(self) -> str:
        return " ".join(w.text for w in self.words)


def _runs(mask_1d: np.ndarray, min_gap: int) -> list[tuple[int, int]]:
    """Group True positions into runs, splitting where the blank gap between
    consecutive True positions is >= ``min_gap`` (gap = diff - 1, so the
    split condition is ``diff > min_gap``)."""
    idx = np.flatnonzero(mask_1d)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > min_gap)
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [idx.size - 1]])
    return [(int(idx[s]), int(idx[e]) + 1) for s, e in zip(starts, ends)]


def _downsample(tight: np.ndarray, s: int) -> np.ndarray | None:
    h, w = tight.shape
    if h % s or w % s:
        return None
    blocks = tight.reshape(h // s, s, w // s, s)
    return blocks.any(axis=(1, 3))


# Pure-function memo: pages repeat the same ~70 glyph bitmaps thousands of
# times, so classification collapses to a dict lookup after warmup.  Keyed
# by (scale, shape, bitmap bytes); bounded to stay heap-safe on garbage
# (noise pages produce unbounded distinct blobs).
_CLASSIFY_CACHE: dict[tuple, str] = {}
_CLASSIFY_CACHE_MAX = 4096


def _classify_glyph(tight: np.ndarray, s: int) -> str:
    key = (s, tight.shape, np.packbits(tight).tobytes())
    hit = _CLASSIFY_CACHE.get(key)
    if hit is not None:
        return hit
    small = _downsample(tight, s)
    ch = REPLACEMENT_CHAR if small is None else classify_tight(small)
    if len(_CLASSIFY_CACHE) >= _CLASSIFY_CACHE_MAX:
        _CLASSIFY_CACHE.clear()
    _CLASSIFY_CACHE[key] = ch
    return ch


def _glyph_row_bounds(
    band: np.ndarray, runs: list[tuple[int, int]]
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-glyph tight row bounds: for each column run
    [x1, x2) of an ink band, the min first-ink-row and max last-ink-row
    over its columns — one argmax pass + one reduceat per band instead of
    a per-glyph ``any(axis=1)`` + ``flatnonzero``."""
    h, w = band.shape
    has_ink = band.any(axis=0)
    first = np.where(has_ink, np.argmax(band, axis=0), h)
    last = np.where(has_ink, h - 1 - np.argmax(band[::-1], axis=0), -1)
    bounds = np.empty(2 * len(runs), dtype=np.int64)
    bounds[0::2] = [r[0] for r in runs]
    bounds[1::2] = [r[1] for r in runs]
    # reduceat segment i covers [bounds[i], bounds[i+1]); glyph segments
    # are the even positions.  A trailing bound == w is invalid for
    # reduceat; the final glyph segment is computed directly instead.
    if bounds[-1] >= w:
        if len(runs) == 1:
            return (
                np.array([int(first[runs[0][0] : runs[0][1]].min())]),
                np.array([int(last[runs[0][0] : runs[0][1]].max())]),
            )
        gy1 = np.minimum.reduceat(first, bounds[:-1])[0::2]
        gy2 = np.maximum.reduceat(last, bounds[:-1])[0::2]
        x1, x2 = runs[-1]
        gy1[-1] = first[x1:x2].min()
        gy2[-1] = last[x1:x2].max()
        return gy1, gy2
    gy1 = np.minimum.reduceat(first, bounds)[0::2]
    gy2 = np.maximum.reduceat(last, bounds)[0::2]
    return gy1, gy2


def recognize_page(img: np.ndarray, scale: int) -> list[LineBox]:
    """Segment and classify a clean (upright, deskewed) page image."""
    mask = ink_mask(img)
    lines: list[LineBox] = []
    n_glyphs = 0
    for y1, y2 in _runs(mask.any(axis=1), LINE_SPLIT_UNITS * scale):
        check_deadline()
        band = mask[y1:y2]
        line = LineBox()
        word_chars: list[str] = []
        word_x1 = word_y1 = word_x2 = word_y2 = 0

        def flush_word() -> None:
            if word_chars:
                line.words.append(
                    WordBox("".join(word_chars), word_x1, word_y1, word_x2, word_y2)
                )

        prev_end = None
        glyph_runs = _runs(band.any(axis=0), 1)
        if not glyph_runs:
            continue
        gy1s, gy2s = _glyph_row_bounds(band, glyph_runs)
        for gi, (x1, x2) in enumerate(glyph_runs):
            n_glyphs += 1
            if not n_glyphs % 256:  # cheap amortized check in the hot loop
                check_deadline()
            gy1, gy2 = int(gy1s[gi]), int(gy2s[gi]) + 1
            ch = _classify_glyph(band[gy1:gy2, x1:x2], scale)
            if prev_end is not None and (x1 - prev_end) >= WORD_GAP_MIN_UNITS * scale:
                flush_word()
                word_chars = []
            if not word_chars:
                word_x1, word_y1 = x1, y1 + gy1
                word_x2, word_y2 = x2, y1 + gy2
            else:
                word_x2 = max(word_x2, x2)
                word_y1 = min(word_y1, y1 + gy1)
                word_y2 = max(word_y2, y1 + gy2)
            word_chars.append(ch)
            prev_end = x2
        flush_word()
        if line.words:
            lines.append(line)
    return lines


def match_score(img: np.ndarray, scale: int, max_glyphs: int = 8) -> float:
    """Fraction of the first ``max_glyphs`` glyphs that match a template."""
    mask = ink_mask(img)
    row_runs = _runs(mask.any(axis=1), LINE_SPLIT_UNITS * scale)
    if not row_runs:
        return 0.0
    y1, y2 = row_runs[0]
    return _band_glyph_score(mask[y1:y2], scale, max_glyphs)


def detect_orientation(img: np.ndarray, scale: int) -> int:
    """Return k in {0,1,2,3}: the page was rotated by k*90 deg CCW.

    Correcting rotation = np.rot90(img, -k).  Mirrors the reference's
    per-page OSD pass (pdf2pdfocr.py:78-91, 1018-1036) via 4-way trial
    recognition instead of a separate model.
    """
    best_k, best = 0, -1.0
    for k in range(4):
        candidate = np.rot90(img, -k) if k else img
        score = match_score(candidate, scale)
        if score > best:
            best, best_k = score, k
    return best_k


def _unshear_band(mask: np.ndarray, y1: int, y2: int, slope: float) -> np.ndarray:
    """Inverse-shear rows [y1, y2) of a bool ink mask (absolute y offsets)."""
    band = mask[y1:y2]
    if slope == 0.0:
        return band
    h, w = band.shape
    shifts = np.round(slope * np.arange(y1, y2)).astype(np.int64)
    lo, hi = int(shifts.min()), int(shifts.max())
    out = np.zeros((h, w + hi - lo), dtype=bool)
    # shifts are monotone in y, so equal-shift rows form contiguous runs
    # (|slope| <= 0.2 -> a new shift every >= 5 rows): block slice-copies
    # replace the previous O(h*w) fancy scatter (~20x on wide bands)
    breaks = np.flatnonzero(np.diff(shifts) != 0) + 1
    bounds = np.concatenate([[0], breaks, [h]])
    for r0, r1 in zip(bounds[:-1], bounds[1:]):
        off = hi - int(shifts[r0])
        out[r0:r1, off : off + w] = band[r0:r1]
    return out


def _band_glyph_score(band: np.ndarray, scale: int, max_glyphs: int = 12) -> float:
    """Fraction of the band's first ``max_glyphs`` glyphs matching a
    template.  Small fixed glyph budget → the per-glyph loop beats the
    vectorized bounds pass here (measured; recognize_page, which walks
    EVERY glyph, uses _glyph_row_bounds instead)."""
    cols = band.any(axis=0)
    hits = total = 0
    for x1, x2 in _runs(cols, 1)[:max_glyphs]:
        glyph = band[:, x1:x2]
        rows = np.flatnonzero(glyph.any(axis=1))
        ch = _classify_glyph(glyph[rows[0] : rows[-1] + 1], scale)
        total += 1
        if ch != REPLACEMENT_CHAR:
            hits += 1
    return hits / total if total else 0.0


def _page_match_fraction(
    img: np.ndarray, scale: int
) -> tuple[float, list["LineBox"]]:
    """(fraction of non-replacement chars, the recognition itself) over a
    full-page pass — the lines are returned so the winning candidate's
    verification recognition can be REUSED by the caller instead of
    recognized a second time (the two passes are identical by
    construction: same image, same scale, same recognize_page)."""
    lines = recognize_page(img, scale)
    text = "".join(w.text for ln in lines for w in ln.words)
    if not text:
        return 0.0, lines
    return 1.0 - text.count(REPLACEMENT_CHAR) / len(text), lines


def normalize_page(img: np.ndarray, scale: int) -> tuple[np.ndarray, int, float]:
    """3-tuple compatibility wrapper around :func:`normalize_page_full`."""
    fixed, k, slope, _ = normalize_page_full(img, scale)
    return fixed, k, slope


def normalize_page_full(
    img: np.ndarray, scale: int
) -> tuple[np.ndarray, int, float, list["LineBox"] | None]:
    """Jointly detect and undo 90-degree rotation and integer shear.

    Scan-distortion model: ``scan = rot90(shear(clean), k)``; recovery
    un-rotates first, then deskews.  Fuses the reference's separate OSD
    (pdf2pdfocr.py:78-91) and mogrify-deskew (94-101) passes, scoring by OCR
    confidence itself: for each (rotation, grid slope) candidate, the BOTTOM
    line band (largest y ⇒ max shear lever arm ⇒ best slope discrimination)
    is inverse-sheared and its glyphs template-matched; finalists tied at the
    best band score are verified with a full-page recognition.  Projection
    sharpness criteria are deliberately not used — cross-line superposition
    makes them content-fragile.

    Returns ``(upright_image, k, slope, lines)`` where ``lines`` is the
    winner's full-page verification recognition when one was computed
    (template semantics — callers using the default engine reuse it and
    skip a second identical pass), else None.  Blank pages →
    (img, 0, 0.0, None).  Ties prefer smaller k then the earlier grid
    slope.  Caveat (shared with any OSD): a page whose glyphs are all
    180°-symmetric is ambiguous.
    """
    from .image_ops import DESKEW_SLOPES, deskew, ink_mask

    mask0 = ink_mask(img)
    if not mask0.any():
        return img, 0, 0.0, None

    def fix(k: int, slope: float) -> np.ndarray:
        cand = np.ascontiguousarray(np.rot90(img, -k)) if k else img
        return deskew(cand, slope) if slope != 0.0 else cand

    # Scan in tie-break order (k ascending, grid slope order).  A candidate
    # whose band score AND full-page match are both perfect cannot be beaten
    # by any later candidate, so it returns immediately — the common clean
    # page (k=0, slope=0) costs one band check + one recognition instead of
    # the full 4x|DESKEW_SLOPES| scan (measured 19 ms -> ~2 ms/page).
    # Slopes scanned nearest-zero first (undistorted is the common case);
    # the fallback path below re-sorts ties back to grid order so the
    # original tie-break (earlier grid slope) is preserved exactly.
    grid_idx = {float(s): i for i, s in enumerate(DESKEW_SLOPES)}
    scan_order = sorted((float(s) for s in DESKEW_SLOPES), key=lambda s: (abs(s), s))

    candidates: list[tuple[float, int, float]] = []
    fulls: dict[tuple[int, float], tuple[float, np.ndarray]] = {}
    for k in range(4):
        mask = np.ascontiguousarray(np.rot90(mask0, -k)) if k else mask0
        row_runs = _runs(mask.any(axis=1), LINE_SPLIT_UNITS * scale)
        if not row_runs:
            continue
        y1, y2 = row_runs[-1]
        for slope in scan_order:
            check_deadline()
            band = _unshear_band(mask, y1, y2, slope)
            score = _band_glyph_score(band, scale)
            if score <= 0.0:
                continue
            candidates.append((score, k, slope))
            if score == 1.0:
                fixed = fix(k, slope)
                full, lines = _page_match_fraction(fixed, scale)
                if full == 1.0:
                    return fixed, k, slope, lines
                fulls[(k, slope)] = (full, fixed, lines)
    if not candidates:
        return img, 0, 0.0, None

    best_band = max(c[0] for c in candidates)
    candidates.sort(key=lambda c: (c[1], grid_idx[c[2]]))  # original order
    best: tuple[float, int, float, np.ndarray, list] | None = None
    for score, k, slope in candidates:
        check_deadline()
        if score < best_band:
            continue
        if (k, slope) in fulls:
            full, fixed, lines = fulls[(k, slope)]
        else:
            fixed = fix(k, slope)
            full, lines = _page_match_fraction(fixed, scale)
        if best is None or full > best[0]:
            best = (full, k, slope, fixed, lines)
    _, k, slope, fixed, lines = best
    return fixed, k, slope, lines
