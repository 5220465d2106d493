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


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: list[float],
    n_bins: int = 8192,
) -> dict[float, float]:
    """EXACT linear-interpolated quantiles (quantile_cont semantics) of a
    numeric column, distributed, without a global sort:

    1. pass 1 — per-batch (count, min, max) partials, merged on driver;
    2. pass 2 — per-batch histogram over shared bin edges, summed;
    3. pass 3 — only the bins containing the needed order statistics are
       pulled to the driver (≈ n/n_bins values each) and the exact order
       stats + interpolation computed there.

    Three streaming passes; driver memory is O(n_bins + n/n_bins).
    """

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        if len(v) == 0:
            return pd.DataFrame({"n": [0], "lo": [np.inf], "hi": [-np.inf]})
        return pd.DataFrame({"n": [len(v)], "lo": [v.min()], "hi": [v.max()]})

    st = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    n = int(st["n"].sum())
    lo, hi = float(st["lo"].min()), float(st["hi"].max())
    if n == 0:
        return {q: float("nan") for q in qs}
    if lo == hi:
        return {q: lo for q in qs}
    edges = np.linspace(lo, hi, n_bins + 1)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        counts, _ = np.histogram(df[col].to_numpy(), bins=edges)
        return pd.DataFrame({"h": [counts.astype(np.int64).tobytes()]})

    hp = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    counts = np.zeros(n_bins, dtype=np.int64)
    for b in hp["h"]:
        counts += np.frombuffer(b, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])

    # ranks needed: floor(k) and floor(k)+1 for k = (n-1) q
    need_ranks = sorted(
        {int(np.floor((n - 1) * q)) for q in qs}
        | {min(n - 1, int(np.floor((n - 1) * q)) + 1) for q in qs}
    )
    need_bins = sorted({int(np.searchsorted(cum, r, side="right") - 1) for r in need_ranks})

    sel_lo = edges[need_bins]
    sel_hi = edges[[b + 1 for b in need_bins]]
    is_last = np.array([b == n_bins - 1 for b in need_bins])

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy()
        mask = np.zeros(len(v), dtype=bool)
        for blo, bhi, last in zip(sel_lo, sel_hi, is_last):
            m = (v >= blo) & ((v <= bhi) if last else (v < bhi))
            mask |= m
        return pd.DataFrame({col: v[mask]})

    vals = np.sort(
        ds.map_batches(collect, batch_format="pandas").to_pandas()[col].to_numpy()
    )

    def order_stat(r: int) -> float:
        b = int(np.searchsorted(cum, r, side="right") - 1)
        below = int(cum[b])
        # values < this bin's range were not collected; index within the
        # collected+sorted array = (rank - ranks below collected bins)
        below_collected = sum(
            int(counts[bb]) for bb in need_bins if bb < b
        )
        return float(vals[r - below + below_collected])

    out = {}
    for q in qs:
        k = (n - 1) * q
        f = int(np.floor(k))
        c = min(n - 1, f + 1)
        xf, xc = order_stat(f), order_stat(c)
        out[q] = xf + (k - f) * (xc - xf)
    return out


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
