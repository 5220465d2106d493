"""Mergeable sketches: distributed approximate aggregates where the
per-batch state is a small serialized summary and the combine step is a
cheap merge (the scale pattern for distinct counts / quantiles at 10^12
rows — the shuffle moves kilobyte sketches, never values).

HyperLogLog here; the same emit-partial/merge shape fits KLL/theta.
Deterministic end-to-end: value hashing is crc32+splitmix64 (salted
``hash()`` would differ per worker), register merges are max (order-free).
"""

from __future__ import annotations

import zlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _hash64(values) -> np.ndarray:
    """Stable 64-bit hashes for a sequence of arbitrary scalar values."""
    hs = np.fromiter(
        (zlib.crc32(repr(v).encode("utf-8")) for v in values),
        dtype=np.uint64,
        count=len(values),
    )
    hs = hs + np.uint64(0x9E3779B97F4A7C15)
    hs ^= hs >> np.uint64(30)
    hs *= np.uint64(0xBF58476D1CE4E5B9)
    hs ^= hs >> np.uint64(27)
    hs *= np.uint64(0x94D049BB133111EB)
    hs ^= hs >> np.uint64(31)
    return hs


def _batch_registers(values, p: int) -> np.ndarray:
    """One batch -> HLL register array (uint8, 2^p slots), vectorized."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rank = leading zeros of `rest` + 1 (rest == 0 -> max rank 64 - p + 1)
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    # floor(log2(rest)) via float conversion is exact for < 2^53 mantissa
    # concerns; use bit_length emulation: 63 - floor(log2) on the high part
    hi = (rest >> np.uint64(32)).astype(np.float64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl = np.where(
        hi > 0,
        np.floor(np.log2(np.maximum(hi, 1))) + 33,
        np.floor(np.log2(np.maximum(lo, 1))) + 1,
    ).astype(np.int64)
    lz[nz] = 64 - bl[nz]
    rank = (np.minimum(lz, 64 - p) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(
    ds: "ray.data.Dataset", col: str, p: int = 12
) -> tuple[float, int]:
    """Approximate COUNT(DISTINCT col).  Per-batch register arrays ride as
    2^p-byte binary rows; the driver merges (elementwise max) the handful
    of partials.  Returns (estimate, n_partials).  Relative error
    ~1.04/sqrt(2^p) (~1.6% at p=12)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _batch_registers(df[col].tolist(), p)
        return pd.DataFrame({"sketch": [regs.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts["sketch"]:
        np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
    return hll_estimate(merged), len(parts)
