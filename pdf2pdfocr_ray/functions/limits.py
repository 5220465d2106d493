"""Decode-time sanity caps shared by every in-house codec.

A bit-flipped or adversarial header can declare absurd output sizes
(PNG/TIFF carry 32-bit width/height -> petabyte allocations) that would
OOM-thrash a worker long before any payload-bounded read fails — fuzzing
found corrupted TIFF headers stalling a FanOut task inside one giant
``np.zeros``.  Every decoder validates header-DECLARED dimensions with
:func:`guard_dims` BEFORE allocating, so malformed payloads raise
``ValueError`` promptly and land on the row-level error route like any
other corrupt input (the reference inherits the equivalent caps from
ImageMagick's resource limits, /root/reference/Dockerfile policy.xml).
"""

from __future__ import annotations

# 134 MP ~= 400 MB decoded RGB8 — comfortably above any real scan
# (A0 at 600 dpi is ~132 MP) while far below an allocation that could
# stall a worker.  Module-level so an operator can raise it for a
# legitimately-huge-imagery corpus.
MAX_PIXELS = 1 << 27


def guard_dims(w: int, h: int, what: str = "image") -> None:
    """Reject implausible header-declared dimensions before allocation."""
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(
            f"{what}: implausible declared dimensions {w}x{h} "
            f"(cap {MAX_PIXELS} pixels)"
        )


# 512 MiB per decoded stream: above any legitimate guarded decode
# (134 MP RGB = 400 MB), far below a deflate/LZW bomb's multi-GB
# expansion (zlib inflates up to ~1032:1, LZW up to ~4096:1).
MAX_DECODE_BYTES = 1 << 29


def capped_inflate(
    data: bytes,
    what: str = "stream",
    cap: int | None = None,
    require_eof: bool = True,
) -> bytes:
    """zlib inflate with a decompression-bomb cap.

    ``require_eof=True`` keeps strict semantics (truncated input raises,
    like ``zlib.decompress``); ``False`` tolerates truncated tails and
    returns the prefix that decoded (the lenient PDF-reader behavior).
    """
    import zlib

    cap = MAX_DECODE_BYTES if cap is None else cap
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, cap)
    except zlib.error as e:
        raise ValueError(f"{what}: bad deflate stream: {e}") from e
    if d.unconsumed_tail:
        raise ValueError(f"{what}: decompressed output exceeds {cap} byte cap")
    if require_eof and not d.eof:
        raise ValueError(f"{what}: truncated deflate stream")
    return out
