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


def _to_matrix(col) -> np.ndarray:
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
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
    # probe set: signature ± up to probe_bits flips
    probe: set[int] = set()
    for s in qsigs.tolist():
        probe.add(int(s))
        if probe_bits >= 1:
            for b in range(n_bits):
                probe.add(int(s) ^ (1 << b))
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
