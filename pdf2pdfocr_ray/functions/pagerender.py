"""Deterministic page renderer: lines of text -> RGB page raster.

Generator-side counterpart of the OCR engine: pages rendered here (optionally
distorted with a 90-degree rotation or an integer shear "skew") are what the
engine's rasterize + preprocess + OCR stages must invert exactly.  Replaces
the reference's `pdftoppm` rasterization step
(/root/reference/pdf2pdfocr.py:56-75) with an in-process, fully deterministic
equivalent.
"""

from __future__ import annotations

import numpy as np

from .font5x7 import (
    BASE_DPI,
    CHAR_GAP,
    GLYPHS,
    LINE_GAP,
    LINE_HEIGHT,
    PAGE_MARGIN,
    SPACE_ADV,
    line_advance_units,
)

WHITE = (255, 255, 255)
BLACK_INK = (0, 0, 0)
COLOR_INK = (40, 40, 160)  # non-greyscale ink for the M1 greyscale-vote path


def scale_for_dpi(dpi: int) -> int:
    s = dpi // BASE_DPI
    if s < 1 or dpi % BASE_DPI != 0:
        raise ValueError(f"dpi must be a positive multiple of {BASE_DPI}, got {dpi}")
    return s


def render_page(
    lines: list[str],
    dpi: int = 72,
    ink: tuple[int, int, int] = BLACK_INK,
    min_width_units: int = 0,
) -> np.ndarray:
    """Render text lines to an RGB page image at ``dpi`` (scale = dpi//36)."""
    s = scale_for_dpi(dpi)
    width_u = max([line_advance_units(t) for t in lines] + [min_width_units]) + (
        2 * PAGE_MARGIN
    )
    n = max(len(lines), 1)
    height_u = n * LINE_HEIGHT + (n - 1) * LINE_GAP + 2 * PAGE_MARGIN
    # Stamp glyphs on a unit-scale bool mask (tiny array ops per char),
    # then upscale the whole mask once and paint — identical pixels to the
    # old per-glyph kron path at a fraction of the numpy-call count.
    mask_u = np.zeros((height_u, width_u), dtype=bool)
    for li, text in enumerate(lines):
        y0u = PAGE_MARGIN + li * (LINE_HEIGHT + LINE_GAP)
        x_u = PAGE_MARGIN
        for ch in text:
            if ch == " ":
                x_u += SPACE_ADV
                continue
            glyph = GLYPHS.get(ch, GLYPHS["?"])
            gh, gw = glyph.shape
            mask_u[y0u : y0u + gh, x_u : x_u + gw] |= glyph
            x_u += gw + CHAR_GAP
    mask = (
        mask_u
        if s == 1
        else np.repeat(np.repeat(mask_u, s, axis=0), s, axis=1)
    )
    img = np.full((height_u * s, width_u * s, 3), 255, dtype=np.uint8)
    img[mask] = np.array(ink, dtype=np.uint8)
    return img


def render_blank_page(width_u: int, height_u: int, dpi: int) -> np.ndarray:
    s = scale_for_dpi(dpi)
    return np.full((height_u * s, width_u * s, 3), 255, dtype=np.uint8)


def apply_shear(img: np.ndarray, slope: float) -> np.ndarray:
    """Horizontal integer shear: row y shifts right by round(slope*y).

    Exactly invertible by ``apply_shear(img2, -slope)`` after cropping, since
    shifts are integral per row.  The canvas is widened so no ink is lost.
    """
    h, w = img.shape[:2]
    shifts = np.round(slope * np.arange(h)).astype(np.int64)
    lo, hi = int(shifts.min()), int(shifts.max())
    out = np.full((h, w + hi - lo, 3), 255, dtype=np.uint8)
    for y in range(h):
        x0 = shifts[y] - lo
        out[y, x0 : x0 + w] = img[y]
    return out


def apply_rot90(img: np.ndarray, k: int) -> np.ndarray:
    """Rotate page by k*90 degrees counter-clockwise (k in 0..3)."""
    return np.ascontiguousarray(np.rot90(img, k))
