"""Similarity search over an embedding column (``list<float>``).

* ``topk_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  (``ray.put`` once, read per task), each batch computes a numpy matmul and
  emits its LOCAL top-k rows; a tiny final aggregation keeps the global
  top-k.  Per-batch work is O(B·d·Q); shuffle volume is O(k·Q·num_blocks)
  candidate rows, never the embeddings.
* ``topk_lsh`` — random-hyperplane LSH variant (the 10^12-row scale path):
  vectors are bucketed by sign-pattern signature; only buckets matching the
  query's signature (within ``probe_bits`` flips) are scanned.  Recall < 1
  by construction; the bruteforce path is the correctness baseline.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _to_raw_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _to_matrix(col) -> np.ndarray:
    m = _to_raw_matrix(col)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def topk_bruteforce(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k per query row.  Returns a small pandas DataFrame
    (query_id, vec_id, cosine) with k rows per query, cosine descending,
    ties broken by vec_id ascending."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qref = ray.put(q)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        mat = _to_matrix(batch[vec_col])
        ids = batch[id_col].to_numpy()
        sims = qm @ mat.T  # (Q, B)
        rows = {"query_id": [], id_col: [], "cosine": []}
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            part = np.argpartition(-sims[qi], kk - 1)[:kk]
            for j in part:
                rows["query_id"].append(qi)
                rows[id_col].append(ids[j])
                rows["cosine"].append(sims[qi, j])
        return pd.DataFrame(rows)

    candidates = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    # tiny final reduce: global top-k per query (deterministic tie-break)
    candidates = candidates.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True]
    )
    return candidates.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def _kmeans_lite(sample: np.ndarray, n_centroids: int, iters: int,
                 seed: int) -> np.ndarray:
    """Few-iteration spherical k-means on a driver-side sample (the IVF
    coarse quantizer).  Deterministic: seeded init, argmin ties -> lowest
    index."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_centroids, n), replace=False)]
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def topk_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 32,
    n_probe: int = 4,
    sample_rows: int = 4096,
    seed: int = 3,
) -> pd.DataFrame:
    """IVF approximate top-k (the other 10^12-row scale path besides LSH):

    1. a driver-side SAMPLE trains a spherical-kmeans coarse quantizer
       (at cluster scale: train once, persist, broadcast);
    2. centroids broadcast via ray.put;
    3. each batch assigns its vectors to nearest centroid and scores only
       vectors whose centroid is in the query's ``n_probe`` nearest lists;
    4. tiny candidate reduce keeps the global top-k.

    Scanned fraction ≈ n_probe / n_centroids.  Recall < 1 by construction;
    ``topk_bruteforce`` is the correctness baseline."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)

    sample_df = ds.limit(sample_rows).to_pandas()
    cent = _kmeans_lite(_to_matrix(sample_df[vec_col]), n_centroids, 5, seed)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    ref = ray.put((q, cent, probe))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm, cm, pr = ray.get(ref)
        mat = _to_matrix(batch[vec_col])
        ids = batch[id_col].to_numpy()
        assign = np.argmax(mat @ cm.T, axis=1)
        rows = {"query_id": [], id_col: [], "cosine": []}
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sims = mat[mask] @ qm[qi]
            sel_ids = ids[mask]
            kk = min(k, sims.shape[0])
            part = np.argpartition(-sims, kk - 1)[:kk]
            rows["query_id"].extend([qi] * kk)
            rows[id_col].extend(sel_ids[part])
            rows["cosine"].extend(sims[part])
        return pd.DataFrame(rows)

    candidates = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    candidates = candidates.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True]
    )
    return candidates.groupby("query_id", sort=True).head(k).reset_index(drop=True)


class _HyperplaneSigner:
    def __init__(self, dim: int, n_bits: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bits, dim))
        self.n_bits = n_bits

    def sign(self, mat: np.ndarray) -> np.ndarray:
        return ((mat @ self.planes.T) > 0) @ (1 << np.arange(self.n_bits))


def topk_lsh(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    probe_bits: int = 1,
    seed: int = 11,
) -> pd.DataFrame:
    """Approximate cosine top-k: scan only buckets whose random-hyperplane
    signature is within ``probe_bits`` bit flips of the query's."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    dim = q.shape[1]
    signer = _HyperplaneSigner(dim, n_bits, seed)
    qsigs = signer.sign(q)
    # probe set: signature ± up to probe_bits flips (multi-probe LSH —
    # all flip combinations up to the budget, not just single bits)
    import itertools

    probe: set[int] = set()
    for s in qsigs.tolist():
        probe.add(int(s))
        for r in range(1, probe_bits + 1):
            for combo in itertools.combinations(range(n_bits), r):
                mask = 0
                for b in combo:
                    mask |= 1 << b
                probe.add(int(s) ^ mask)
    qref = ray.put((q, probe))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm, probe_set = ray.get(qref)
        mat = _to_matrix(batch[vec_col])
        sigs = signer.sign(mat)
        mask = np.isin(sigs, np.fromiter(probe_set, dtype=np.int64))
        if not mask.any():
            return pd.DataFrame({"query_id": [], id_col: [], "cosine": []})
        mat = mat[mask]
        ids = batch[id_col].to_numpy()[mask]
        sims = qm @ mat.T
        rows = {"query_id": [], id_col: [], "cosine": []}
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            part = np.argpartition(-sims[qi], kk - 1)[:kk] if kk else []
            for j in part:
                rows["query_id"].append(qi)
                rows[id_col].append(ids[j])
                rows["cosine"].append(sims[qi, j])
        return pd.DataFrame(rows)

    candidates = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    candidates = candidates.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True]
    )
    return candidates.groupby("query_id", sort=True).head(k).reset_index(drop=True)


# ------------------------------------------------ distributed k-means
def _kmeanspp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic k-means++ on a driver-side sample (seeded greedy:
    first center = seeded choice, then farthest-point-by-D2 with the rng
    drawn from the classic D2 distribution)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(k, n)
    first = int(rng.integers(n))
    cents = [sample[first]]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        p = d2 / max(d2.sum(), 1e-12)
        nxt = int(rng.choice(n, p=p))
        cents.append(sample[nxt])
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(axis=1))
    return np.asarray(cents, dtype=np.float64)


def kmeans_fit(
    ds: "ray.data.Dataset",
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 7,
    tol: float = 1e-6,
) -> tuple[np.ndarray, float]:
    """Distributed Lloyd's algorithm (the iterative-ML representative):
    k-means++ init on a driver-side sample, then per iteration ONE
    streaming pass — each batch emits its (k, d) partial sums + counts +
    SSE (a few KB regardless of batch rows), the driver merges the tiny
    partials and updates centroids, which re-broadcast via ``ray.put``.
    Per-iteration network cost is O(blocks * k * d) bytes, never O(rows);
    at 10^12 rows one would train on a sampled subset and run a single
    full assign pass — both paths are this same code.  Deterministic for
    a fixed seed (partial-sum merge is float-order-stable because the
    driver sums block partials in block order).  Returns (centroids,
    final SSE).  Empty clusters keep their previous centroid."""
    import ray

    sample_df = ds.limit(sample_rows).to_pandas()
    if len(sample_df) == 0 or vec_col not in sample_df:
        # an empty Dataset's to_pandas drops its columns entirely —
        # raise the clear error instead of a KeyError deep in pandas
        raise ValueError("kmeans_fit: empty input (no vectors to cluster)")
    sample = _to_raw_matrix(sample_df[vec_col])
    cent = _kmeanspp_init(sample, k, seed)
    kk, d = cent.shape
    sse_prev = np.inf

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            mat = _to_raw_matrix(df[vec_col])
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            sse = float(d2[np.arange(len(a)), a].sum())
            return pd.DataFrame(
                {
                    "sums": [sums.tobytes()],
                    "counts": [counts.tobytes()],
                    "sse": [sse],
                }
            )

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        sums = np.zeros((kk, d))
        counts = np.zeros(kk, np.int64)
        for s, c in zip(parts["sums"], parts["counts"]):
            sums += np.frombuffer(s, np.float64).reshape(kk, d)
            counts += np.frombuffer(c, np.int64)
        sse = float(parts["sse"].sum())
        nonempty = counts > 0
        new_cent = cent.copy()
        new_cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.abs(new_cent - cent).max())
        cent = new_cent
        if shift < tol or abs(sse_prev - sse) <= tol * max(sse_prev, 1.0):
            sse_prev = sse
            break
        sse_prev = sse
    return cent, sse_prev


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> "ray.data.Dataset":
    """Pure-map cluster assignment against broadcast centroids."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        mat = _to_raw_matrix(df[vec_col])
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        out = df.copy()
        out[out_col] = np.argmin(d2, axis=1).astype(np.int32)
        return out

    return ds.map_batches(assign, batch_format="pandas")


# --------------------------------------------- product quantization (PQ)
def pq_train(
    ds: "ray.data.Dataset",
    m: int = 4,
    n_codes: int = 64,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Train PQ codebooks: split the (L2-normalized) vector space into
    ``m`` contiguous subspaces and run k-means per subspace on a
    driver-side sample (codebooks are always sample-trained in practice;
    the full corpus only gets ENCODED).  Returns (m, n_codes, d/m)
    float64, deterministic for a fixed seed."""
    sample = _to_matrix(ds.limit(sample_rows).to_pandas()[vec_col])
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, min(n_codes, len(sample)), sub))
    for j in range(m):
        part = sample[:, j * sub : (j + 1) * sub]
        cent = _kmeanspp_init(part, n_codes, seed + j)
        for _ in range(iters):
            d2 = (
                (part * part).sum(axis=1)[:, None]
                - 2.0 * (part @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                mask = a == c
                if mask.any():
                    cent[c] = part[mask].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> "ray.data.Dataset":
    """Encode every vector to ``m`` uint8 code bytes against broadcast
    codebooks — a 32x-512x compression of the embedding column (the
    memory path that makes 10^12-vector ANN fit a cluster's RAM).  Pure
    map; codes ride as fixed-width binary."""
    import ray

    ref = ray.put(np.ascontiguousarray(codebooks))

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        books = ray.get(ref)
        mat = _to_matrix(df[vec_col])
        m, _, sub = books.shape
        codes = np.empty((len(mat), m), np.uint8)
        for j in range(m):
            part = mat[:, j * sub : (j + 1) * sub]
            cent = books[j]
            d2 = (
                (part * part).sum(axis=1)[:, None]
                - 2.0 * (part @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        out = df.copy()
        out[out_col] = [c.tobytes() for c in codes]
        return out

    return ds.map_batches(encode, batch_format="pandas")


def topk_pq(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query build the
    (m, n_codes) subspace distance LUT once, then every row's approximate
    L2^2 is m table gathers + a sum — no float vectors touched during the
    scan.  Local top-k per batch, tiny global reduce, ties by id.  On
    L2-normalized vectors ascending L2 == descending cosine, so recall is
    judged against ``topk_bruteforce``."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    m, n_codes, sub = codebooks.shape
    # LUT[qi, j, c] = ||q_sub - centroid||^2
    luts = np.empty((len(q), m, n_codes))
    for j in range(m):
        part = q[:, j * sub : (j + 1) * sub]
        cent = codebooks[j]
        luts[:, j, :] = (
            (part * part).sum(axis=1)[:, None]
            - 2.0 * (part @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
    ref = ray.put(luts)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        lt = ray.get(ref)
        ids = df[id_col].to_numpy()
        codes = np.frombuffer(
            b"".join(df[code_col].tolist()), np.uint8
        ).reshape(len(df), m)
        rows = {"query_id": [], id_col: [], "adc_dist": []}
        for qi in range(lt.shape[0]):
            dist = lt[qi, np.arange(m)[None, :], codes].sum(axis=1)
            kk = min(k, len(dist))
            part = np.argpartition(dist, kk - 1)[:kk]
            rows["query_id"].extend([qi] * kk)
            rows[id_col].extend(ids[part])
            rows["adc_dist"].extend(dist[part])
        return pd.DataFrame(rows)

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["query_id", "adc_dist", id_col], ascending=[True, True, True]
    )
    return cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)


# ------------------------------------------------ IVF-PQ (residual-encoded)
def ivfpq_build(
    ds: "ray.data.Dataset",
    n_centroids: int = 32,
    m: int = 8,
    n_codes: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 3,
):
    """Build a residual-encoded IVF-PQ index (the 10^12-vector ANN
    architecture: coarse lists bound the scan fraction, PQ bounds the
    memory): train the coarse quantizer and the RESIDUAL codebooks on a
    driver-side sample, then one streaming pass assigns every vector to
    its list and PQ-encodes ``vector - centroid`` — the index dataset
    carries (id, list_id, pq_code) only, ~9 bytes/vector + id.  Returns
    (coarse_centroids, codebooks, index_ds)."""
    import ray

    sample = _to_raw_matrix(ds.limit(sample_rows).to_pandas()[vec_col])
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    coarse = _kmeanspp_init(sample, n_centroids, seed)
    for _ in range(iters):
        d2 = (
            (sample * sample).sum(axis=1)[:, None]
            - 2.0 * (sample @ coarse.T)
            + (coarse * coarse).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        for c in range(len(coarse)):
            mask = a == c
            if mask.any():
                coarse[c] = sample[mask].mean(axis=0)
    resid = sample - coarse[np.argmin(
        (sample * sample).sum(axis=1)[:, None]
        - 2.0 * (sample @ coarse.T)
        + (coarse * coarse).sum(axis=1)[None, :],
        axis=1,
    )]
    books = np.empty((m, min(n_codes, len(resid)), sub))
    for j in range(m):
        part = resid[:, j * sub : (j + 1) * sub]
        cent = _kmeanspp_init(part, n_codes, seed + 17 + j)
        for _ in range(iters):
            d2 = (
                (part * part).sum(axis=1)[:, None]
                - 2.0 * (part @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                mask = a == c
                if mask.any():
                    cent[c] = part[mask].mean(axis=0)
        books[j] = cent

    ref = ray.put((np.ascontiguousarray(coarse), np.ascontiguousarray(books)))

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        co, bo = ray.get(ref)
        mat = _to_matrix(df[vec_col])
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ co.T)
            + (co * co).sum(axis=1)[None, :]
        )
        lists = np.argmin(d2, axis=1).astype(np.int32)
        res = mat - co[lists]
        codes = np.empty((len(mat), m), np.uint8)
        for j in range(m):
            part = res[:, j * sub : (j + 1) * sub]
            cent = bo[j]
            dd = (
                (part * part).sum(axis=1)[:, None]
                - 2.0 * (part @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(dd, axis=1).astype(np.uint8)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "list_id": lists,
                "pq_code": [c.tobytes() for c in codes],
            }
        )

    index_ds = ds.map_batches(encode, batch_format="pandas")
    return coarse, books, index_ds


def topk_ivfpq(
    index_ds: "ray.data.Dataset",
    queries: np.ndarray,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """ADC scan over the probed lists only: per (query, probed list) one
    residual LUT (m, n_codes); each batch scores only its rows whose
    list_id is probed — scan fraction ~ n_probe/n_centroids, scan payload
    = code bytes.  Ties by id; tiny global reduce."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    m, n_codes, sub = codebooks.shape
    qd2 = (
        (q * q).sum(axis=1)[:, None]
        - 2.0 * (q @ coarse.T)
        + (coarse * coarse).sum(axis=1)[None, :]
    )
    probe = np.argsort(qd2, axis=1)[:, :n_probe]  # (Q, n_probe)
    # LUT[qi, pi, j, c] built from the query's residual vs the probed list
    luts = np.empty((len(q), n_probe, m, n_codes))
    for qi in range(len(q)):
        for pi, c in enumerate(probe[qi]):
            rq = q[qi] - coarse[c]
            for j in range(m):
                part = rq[j * sub : (j + 1) * sub]
                cent = codebooks[j]
                luts[qi, pi, j, :] = (
                    (part * part).sum()
                    - 2.0 * (cent @ part)
                    + (cent * cent).sum(axis=1)
                )
    ref = ray.put((probe, luts))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        pr, lt = ray.get(ref)
        ids = df[id_col].to_numpy()
        lists = df["list_id"].to_numpy()
        codes = np.frombuffer(
            b"".join(df["pq_code"].tolist()), np.uint8
        ).reshape(len(df), m)
        rows = {"query_id": [], id_col: [], "adc_dist": []}
        for qi in range(pr.shape[0]):
            for pi, c in enumerate(pr[qi]):
                mask = lists == c
                if not mask.any():
                    continue
                sel = codes[mask]
                dist = lt[qi, pi, np.arange(m)[None, :], sel].sum(axis=1)
                kk = min(k, len(dist))
                part = np.argpartition(dist, kk - 1)[:kk]
                rows["query_id"].extend([qi] * kk)
                rows[id_col].extend(ids[mask][part])
                rows["adc_dist"].extend(dist[part])
        return pd.DataFrame(rows)

    cand = index_ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["query_id", "adc_dist", id_col], ascending=[True, True, True]
    )
    return cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
