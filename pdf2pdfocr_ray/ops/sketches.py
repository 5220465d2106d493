"""Mergeable sketches: distributed approximate aggregates where the
per-batch state is a small serialized summary and the combine step is a
cheap merge (the scale pattern for distinct counts / quantiles at 10^12
rows — the shuffle moves kilobyte sketches, never values).

HyperLogLog, a KLL-style mergeable quantile sketch, and theta (KMV) set
sketches.  Deterministic end-to-end: value hashing is blake2b-8 (salted
``hash()`` would differ per worker; a crc32-derived 64-bit value would
carry only 32 bits of real entropy because CRC is linear, so distinct
counts would saturate toward 2^32), register merges are max (order-free).
"""

from __future__ import annotations

from hashlib import blake2b
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    import ray.data


def _hash64(values) -> np.ndarray:
    """Stable 64-bit hashes for a sequence of arbitrary scalar values.

    Full 64 bits of entropy (blake2b, digest_size=8): required for HLL /
    theta correctness at the 10^9+ distinct scale this module targets.
    """
    return np.fromiter(
        (
            int.from_bytes(
                blake2b(repr(v).encode("utf-8"), digest_size=8).digest(), "big"
            )
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


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
    Null/NaN rows are dropped (SQL ``quantile_cont`` semantics); ``n``
    counts non-NaN values only so ranks stay aligned with the histogram.
    """

    def _clean(df: pd.DataFrame) -> np.ndarray:
        return df[col].dropna().to_numpy()

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = _clean(df)
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
        counts, _ = np.histogram(_clean(df), bins=edges)
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
        v = _clean(df)
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
    if len(parts) == 0 or "sketch" not in parts:
        return 0.0, 0  # empty input: zero distinct values, no partials
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts["sketch"]:
        np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
    return hll_estimate(merged), len(parts)


# --------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (single-pass alternative to
# exact_quantiles' 3 synchronous passes: partials merge associatively, so
# at cluster scale the combine is a tree reduce over kilobyte blobs).
# --------------------------------------------------------------------------


class QuantileSketch:
    """Mergeable quantile sketch: a compactor hierarchy in the KLL/MRL
    family.  Level ``i`` holds values of weight ``2^i``; when a level
    exceeds its capacity ``k`` it is sorted and every other element
    (alternating offset — deterministic, from the compaction counter, so
    results are reproducible across runs without an RNG) is promoted to
    level ``i+1``.  Merge = levelwise concat + recompaction.

    Rank error is O(log(n/k)/k) (deterministic-compaction/MRL bound, not
    the tighter randomized-KLL bound — the price of determinism); at
    k=256 and n=10^9 that is ~0.09% of rank.  Space per sketch is
    O(k log(n/k)) float64s — kilobytes, safe to ship as Arrow binary rows.
    """

    __slots__ = ("k", "levels", "n", "compactions")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self.compactions = 0

    def add_many(self, vals) -> None:
        v = np.asarray(vals, np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._restore()

    def _restore(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                self._compact(i)
            i += 1

    def _compact(self, i: int) -> None:
        arr = np.sort(self.levels[i])
        off = self.compactions & 1
        self.compactions += 1
        self.levels[i] = np.empty(0, np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], arr[off::2]])

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for i, arr in enumerate(other.levels):
            if len(arr):
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self.n += other.n
        self.compactions += other.compactions
        self._restore()
        return self

    def quantiles(self, qs: list[float]) -> dict[float, float]:
        """Weighted-CDF interpolated quantile estimates."""
        if self.n == 0:
            return {q: float("nan") for q in qs}
        vals = np.concatenate(self.levels)
        w = np.concatenate(
            [
                np.full(len(arr), float(1 << i))
                for i, arr in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        v, w = vals[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1]
        pos = cw - w / 2.0  # midpoint rule for the weighted empirical CDF
        return {q: float(np.interp(q * total, pos, v)) for q in qs}

    def to_bytes(self) -> bytes:
        head = np.array(
            [self.k, self.n, self.compactions, len(self.levels)]
            + [len(a) for a in self.levels],
            dtype=np.int64,
        )
        return head.tobytes() + b"".join(
            a.astype(np.float64).tobytes() for a in self.levels
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "QuantileSketch":
        k, n, comp, n_levels = np.frombuffer(b, np.int64, 4)
        lens = np.frombuffer(b, np.int64, int(n_levels), offset=32)
        sk = cls(int(k))
        sk.n, sk.compactions = int(n), int(comp)
        off = 32 + 8 * int(n_levels)
        sk.levels = []
        for ln in lens:
            sk.levels.append(np.frombuffer(b, np.float64, int(ln), offset=off).copy())
            off += 8 * int(ln)
        if not sk.levels:
            sk.levels = [np.empty(0, np.float64)]
        return sk


def quantile_sketch(
    ds: "ray.data.Dataset", col: str, qs: list[float], k: int = 256
) -> dict[float, float]:
    """Single-pass approximate quantiles via mergeable QuantileSketch
    partials (one kilobyte-scale blob per batch; driver tree-merges)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = QuantileSketch(k)
        sk.add_many(df[col].dropna().to_numpy())
        return pd.DataFrame({"sketch": [sk.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = QuantileSketch(k)
    for b in parts["sketch"]:
        merged.merge(QuantileSketch.from_bytes(b))
    return merged.quantiles(qs)


# --------------------------------------------------------------------------
# Theta (KMV) sketch: mergeable distinct-count sketch supporting set
# operations (union / intersection / difference) — fully deterministic
# (k smallest unique hashes; no RNG), so merges are order-free EXACTLY.
# --------------------------------------------------------------------------


class ThetaSketch:
    """K-minimum-values sketch over 64-bit value hashes.

    Keeps the ``k`` smallest unique hashes.  While fewer than ``k`` values
    have been seen the sketch is EXACT.  Beyond that, theta = (k-th
    smallest hash)/2^64 and the retained hashes below theta form a
    uniform sample of the distinct universe: |sample|/theta estimates the
    distinct count with relative error ~1/sqrt(k-2).

    Set ops follow the standard theta-sketch framework: pick
    theta = min(theta_a, theta_b), restrict both samples below it, apply
    the set operation to the samples, scale by 1/theta.
    """

    __slots__ = ("k", "hashes")

    def __init__(self, k: int = 4096, hashes=None):
        self.k = int(k)
        h = np.asarray(hashes if hashes is not None else [], dtype=np.uint64)
        h = np.unique(h)  # unique() sorts
        self.hashes = h[: self.k]

    @classmethod
    def from_values(cls, values, k: int = 4096) -> "ThetaSketch":
        return cls(k, _hash64(values) if len(values) else None)

    @property
    def theta(self) -> float:
        if len(self.hashes) < self.k:
            return 1.0
        return float(self.hashes[self.k - 1]) / 2.0**64

    def _sample(self, theta: float) -> np.ndarray:
        """Retained hashes strictly below a theta threshold."""
        cut = np.uint64(min(theta, 1.0) * 2.0**64) if theta < 1.0 else None
        return self.hashes if cut is None else self.hashes[self.hashes < cut]

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        return ThetaSketch(
            min(self.k, other.k), np.concatenate([self.hashes, other.hashes])
        )

    def estimate(self) -> float:
        if len(self.hashes) < self.k:
            return float(len(self.hashes))
        return (self.k - 1) / self.theta

    def to_bytes(self) -> bytes:
        return np.int64(self.k).tobytes() + self.hashes.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "ThetaSketch":
        k = int(np.frombuffer(b, np.int64, 1)[0])
        return cls(k, np.frombuffer(b, np.uint64, offset=8))


def theta_intersection_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    th = min(a.theta, b.theta)
    common = np.intersect1d(a._sample(th), b._sample(th))
    return len(common) / th


def theta_difference_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """Estimated |distinct(a) - distinct(b)| (set difference, a minus b)."""
    th = min(a.theta, b.theta)
    sa, sb = a._sample(th), b._sample(th)
    only = np.setdiff1d(sa, sb)
    return len(only) / th


def theta_sketch_column(
    ds: "ray.data.Dataset", col: str, k: int = 4096
) -> ThetaSketch:
    """One streaming pass -> ThetaSketch of a column's distinct values."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = ThetaSketch.from_values(df[col].dropna().tolist(), k)
        return pd.DataFrame({"sketch": [sk.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = ThetaSketch(k)
    for b in parts["sketch"]:
        merged = merged.merge(ThetaSketch.from_bytes(b))
    return merged


def group_quantile_sketch(
    ds: "ray.data.Dataset",
    key: str,
    col: str,
    qs: list[float],
    k: int = 128,
) -> "ray.data.Dataset":
    """Per-GROUP quantile estimates via mergeable QuantileSketch partials —
    the scalable form of the holistic per-group median
    (ops/relational.user_value_median): each batch emits one kilobyte
    sketch per (group, batch), the groupby shuffles SKETCHES (never
    values), and the per-group merge emits the quantile columns.  A group
    whose rows span the whole cluster still needs only its sketches
    co-located."""
    from .grouped import sorted_groupby

    qcols = [f"q{int(q * 100)}" for q in qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows_k, rows_s = [], []
        for g, sub in df.groupby(key, sort=False):
            sk = QuantileSketch(k)
            sk.add_many(sub[col].dropna().to_numpy())
            rows_k.append(g)
            rows_s.append(sk.to_bytes())
        return pd.DataFrame({key: rows_k, "sketch": rows_s})

    def merge_block(df: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {key: [], **{c: [] for c in qcols}}
        for g, sub in df.groupby(key, sort=False):
            m = QuantileSketch(k)
            for b in sub["sketch"]:
                m.merge(QuantileSketch.from_bytes(b))
            est = m.quantiles(qs)
            out[key].append(g)
            for q, c in zip(qs, qcols):
                out[c].append(est[q])
        return pd.DataFrame(out)

    return sorted_groupby(
        ds.map_batches(partial, batch_format="pandas"), key, merge_block
    )


# ------------------------------------------------------------ Bloom filter
def _bloom_positions(values, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing: pos_i = h1 + i*h2 mod m.
    h1 carries the full 64-bit blake2b entropy; h2 is an odd derivative so
    the k probes cycle through distinct slots."""
    h1 = _hash64(values)
    h2 = (h1 >> np.uint64(17)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def bloom_build(
    ds: "ray.data.Dataset", col: str, m_bits: int = 1 << 23, k: int = 5
) -> np.ndarray:
    """Distributed Bloom-filter build: map-side partial bitmaps (one
    ``m_bits/8``-byte uint64 array per input block, bits set vectorized),
    a combiner level OR-merging 32 partials per task, final OR on the
    driver.  Driver traffic is ``ceil(blocks/32)`` bitmaps of m_bits/8
    bytes — at 2^23 bits that is 1 MiB per 32 input blocks, independent of
    row count.  No false negatives ever; FP rate ≈ (1-e^(-k*n/m))^k.
    """
    words = m_bits >> 6

    def partial(t: pa.Table) -> pa.Table:
        regs = np.zeros(words, np.uint64)
        if len(t):
            pos = _bloom_positions(t.column(col).to_pylist(), m_bits, k).ravel()
            np.bitwise_or.at(
                regs,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    def or_merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, np.uint64)
        for buf in t.column("regs").to_pylist():
            acc |= np.frombuffer(buf, np.uint64)
        return pa.table({"regs": pa.array([acc.tobytes()], pa.large_binary())})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(or_merge, batch_format="pyarrow", batch_size=32)
        .take_all()
    )
    out = np.zeros(words, np.uint64)
    for row in parts:
        out |= np.frombuffer(row["regs"], np.uint64)
    return out


def bloom_contains(
    regs: np.ndarray, values, m_bits: int, k: int
) -> np.ndarray:
    """Vectorized membership probe: True = possibly present (FP rate per
    ``bloom_build``), False = DEFINITELY absent."""
    n = len(values)
    if n == 0:
        return np.zeros(0, bool)
    pos = _bloom_positions(values, m_bits, k)
    bits = (regs[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=0)


# --------------------------------------------------- Misra-Gries heavy hitters
def _mg_trim(values: np.ndarray, counts: np.ndarray, k: int) -> dict:
    """Trim a weighted summary to < k counters: subtract the k-th largest
    weight from everything, keep positives.  Each survivor undercounts by
    at most C_k <= (sum of weights)/k; dropped items had weight <= C_k
    (the Agarwal et al. 2013 mergeable-summaries merge step)."""
    if len(values) < k:
        return dict(zip(values.tolist(), counts.tolist()))
    order = np.argsort(counts)[::-1]
    values, counts = values[order], counts[order]
    thresh = counts[k - 1]
    kept = counts[: k - 1] - thresh
    pos = kept > 0
    return dict(zip(values[: k - 1][pos].tolist(), kept[pos].tolist()))


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 50,
    tokenize: bool = False,
) -> "ray.data.Dataset":
    """EXACT frequent-items above the N/k threshold via a mergeable
    Misra-Gries sketch + exact verification (the sketch-prefilter +
    exact-verify shape, like the Bloom anti-join):

    1. each batch MG-compresses its (tokenized) value stream to a
       4k-counter weighted summary (a few kB) — only summaries shuffle;
    2. the driver merges the summaries (weight add, one re-trim).  With
       4k internal counters the cumulative undercount is <= N/(4k)
       (batch trims) + N/(4k) (merge trim) = N/(2k) < N/k, so every item
       with true count > N/k survives with positive weight — the
       candidate set is a guaranteed SUPERSET of the true heavy hitters;
    3. one exact counting pass over the broadcast candidate set;
    4. keep candidates whose exact count > N/k.

    False positives die in step 4, false negatives can\'t exist, so the
    result is EXACTLY the items with count > N/k — SQL-oracle-able with
    GROUP BY / HAVING."""
    import ray

    from .grouped import combined_groupby_agg

    k_int = 4 * k
    token_re = None
    if tokenize:
        import re as _re

        token_re = _re.compile(r"[a-z0-9]+")

    def to_values(df: pd.DataFrame):
        if tokenize:
            return df[col].str.lower().str.findall(token_re).explode().dropna()
        return df[col]

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        s = to_values(df)
        vals, counts = np.unique(s.to_numpy(object), return_counts=True)
        mg = _mg_trim(vals, counts.astype(np.int64), k_int)
        items = list(mg.keys()) + [None]  # sentinel row carries the batch N
        ws = list(mg.values()) + [0]
        ns = [0] * len(mg) + [int(counts.sum())]
        return pd.DataFrame(
            {
                "item": pd.Series(items, dtype="object"),
                "w": pd.Series(ws, dtype="int64"),
                "n": pd.Series(ns, dtype="int64"),
            }
        )

    parts = ds.map_batches(summarize, batch_format="pandas").to_pandas()
    total_n = int(parts["n"].sum())
    real = parts[parts["item"].notna()]
    merged = real.groupby("item", as_index=False)["w"].sum()
    mg = _mg_trim(
        merged["item"].to_numpy(object), merged["w"].to_numpy(np.int64), k_int
    )
    candidates = sorted(mg.keys())  # superset of all true heavy hitters

    cand_ref = ray.put(pd.Index(candidates))

    def exact_count(df: pd.DataFrame) -> pd.DataFrame:
        s = to_values(df)
        cand = ray.get(cand_ref)
        s = s[s.isin(cand)]
        if not len(s):
            return pd.DataFrame(
                {"item": pd.Series([], dtype="object"),
                 "n_occurrences": pd.Series([], dtype="int64")}
            )
        vc = s.value_counts()
        return pd.DataFrame(
            {"item": vc.index.to_numpy(object),
             "n_occurrences": vc.to_numpy(np.int64)}
        )

    exact = combined_groupby_agg(
        ds.map_batches(exact_count, batch_format="pandas"),
        "item",
        {"n_occurrences": ("n_occurrences", "sum")},
    )

    thresh = total_n / k

    def keep_hh(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_occurrences"] > thresh]

    return exact.map_batches(keep_hh, batch_format="pandas")


# ------------------------------------------------------- corpus profiler
def _qs_ser(sk: QuantileSketch) -> bytes:
    import struct

    parts = [struct.pack("<qqq", sk.n, sk.compactions, len(sk.levels))]
    for lv in sk.levels:
        parts.append(struct.pack("<q", len(lv)))
        parts.append(lv.astype(np.float64).tobytes())
    return b"".join(parts)


def _qs_de(buf: bytes) -> QuantileSketch:
    import struct

    n, comp, nlv = struct.unpack_from("<qqq", buf, 0)
    off = 24
    sk = QuantileSketch()
    sk.n, sk.compactions, sk.levels = n, comp, []
    for _ in range(nlv):
        (cnt,) = struct.unpack_from("<q", buf, off)
        off += 8
        sk.levels.append(np.frombuffer(buf, np.float64, cnt, off).copy())
        off += 8 * cnt
    return sk


def profile_table(
    ds: "ray.data.Dataset", columns: list[str] | None = None
) -> pd.DataFrame:
    """Corpus report card: one pass computes, per column — row count,
    null count, min/max, mean (numeric), HLL distinct estimate, and a
    mergeable quantile sketch median (numeric).  All statistics are
    mergeable partials (moments, HLL registers, KLL sketches), so the
    shuffle is one tiny summary row per (column, block); the profile of
    a 100 TB table costs one streaming scan.  The data-quality first
    step of any ingest."""
    schema = ds.schema()
    names = columns or list(schema.names)
    p = 12

    def partial(t: pa.Table) -> pd.DataFrame:
        rows = []
        for name in names:
            col = t.column(name) if name in t.column_names else None
            if col is None:
                continue
            n = len(col)
            nulls = col.null_count
            arr = col.drop_null()
            is_num = pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
            vmin = vmax = None
            mean_sum = 0.0
            regs = _batch_registers(
                [str(v) for v in arr.to_pylist()], p
            ) if len(arr) else np.zeros(1 << p, np.uint8)
            qs = b""
            if is_num and len(arr):
                v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
                vmin, vmax = float(v.min()), float(v.max())
                mean_sum = float(v.sum())
                sk = QuantileSketch()
                sk.add_many(v)
                qs = _qs_ser(sk)
            elif len(arr) and pa.types.is_string(col.type):
                lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
                vmin, vmax = float(lens.min()), float(lens.max())
            rows.append(
                {
                    "column": name,
                    "n": n,
                    "nulls": nulls,
                    "vmin": vmin,
                    "vmax": vmax,
                    "sum": mean_sum,
                    "hll": regs.tobytes(),
                    "qsketch": qs,
                    "is_num": is_num,
                }
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):  # empty input: report the columns, all-zero stats
        return pd.DataFrame(
            {
                "column": names,
                "n_rows": 0,
                "n_nulls": 0,
                "min": None,
                "max": None,
                "mean": None,
                "approx_distinct": 0.0,
                "p50": None,
            }
        )
    out = []
    for name, g in parts.groupby("column", sort=False):
        regs = np.zeros(1 << p, np.uint8)
        for buf in g["hll"]:
            regs = np.maximum(regs, np.frombuffer(buf, np.uint8))
        sk = None
        for buf in g["qsketch"]:
            if buf:
                s2 = _qs_de(buf)
                sk = s2 if sk is None else sk.merge(s2)
        n = int(g["n"].sum())
        nulls = int(g["nulls"].sum())
        is_num = bool(g["is_num"].any())
        vmin = g["vmin"].dropna().min() if g["vmin"].notna().any() else None
        vmax = g["vmax"].dropna().max() if g["vmax"].notna().any() else None
        out.append(
            {
                "column": name,
                "n_rows": n,
                "n_nulls": nulls,
                "min": vmin,
                "max": vmax,
                "mean": (float(g["sum"].sum()) / max(n - nulls, 1))
                if is_num
                else None,
                "approx_distinct": round(hll_estimate(regs), 1),
                "p50": float(sk.quantiles([0.5])[0.5]) if sk is not None else None,
            }
        )
    order = {c: i for i, c in enumerate(names)}
    out.sort(key=lambda r: order[r["column"]])
    return pd.DataFrame(out)
