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
spam pages) cannot produce O(n²) pairs.  Per SURVEY's no-silent-caps rule the
cap is surfaced, not silent: every emitted pair carries a
``bucket_truncated`` bool column — true when the pair came from a bucket
that exceeded ``max_bucket`` (i.e. recall in that bucket is incomplete).
Downstream consumers can count/flag them; a truncated bucket that emits no
surviving pairs leaves no row, so the flag is a lower bound on truncation.
"""

from __future__ import annotations

import functools
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

# 16-bit popcount LUT: one 64 KiB table per worker process, built at import.
_POPCNT16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via four 16-bit LUT lookups (no Python
    per-element loop; the hot path of every Hamming-banded near-dup)."""
    x = x.astype(np.uint64, copy=False)
    m = np.uint64(0xFFFF)
    out = _POPCNT16[(x & m).astype(np.int64)].astype(np.int64)
    for s in (16, 32, 48):
        out += _POPCNT16[((x >> np.uint64(s)) & m).astype(np.int64)]
    return out


# ---------------------------------------------------------------- exact dedup
def dedup_exact(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep the min-id row per exact (whitespace-normalized, lowercased)
    content hash.  SQL-equivalent: GROUP BY md5(norm(text)) → min(id)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        norm = batch[text_col].str.replace(r"\s+", " ", regex=True).str.lower()
        batch = batch.copy()
        # null text (error rows riding through a pipeline) is NOT
        # duplicate content: a unique per-row hash keeps every such row
        batch["content_hash"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            if isinstance(t, str) else f"__null__{i}"
            for t, i in zip(norm, batch[id_col])
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
_SHINGLE_P = np.uint64(1_000_003)


def _shingles(text: str, k: int) -> np.ndarray:
    """Word k-gram shingles -> 31-bit hashes, vectorized.

    Tokens hash via crc32 (stable, C-speed); k-grams combine via a
    polynomial roll computed as a numpy stencil over the token-hash array.
    31-bit folding keeps the downstream (a*x + b) universal hash inside
    uint64 (31b * 31b = 62b, + b < 2^61 < 2^64 — no object-dtype bigints)."""
    import zlib

    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in toks),
        dtype=np.uint64,
        count=len(toks),
    )
    if len(toks) < k:
        acc = np.uint64(0)
        for v in th:
            acc = (acc * _SHINGLE_P + v) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return np.array([acc & np.uint64(0x7FFFFFFF)], dtype=np.uint64)
    n = len(toks) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):  # k is small (3): k stencil passes, each vectorized
        acc = acc * _SHINGLE_P + th[j : j + n]
    return acc & np.uint64(0x7FFFFFFF)


class MinHasher:
    """Warm-state signature stage: per-actor permutation constants."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 31, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.shingle_k)
        if sh.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # universal hashing h_i(x) = (a_i*x + b_i) mod p — pure uint64:
        # a < 2^31, x < 2^31, b < 2^61 keeps a*x+b < 2^63.
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return np.min(prod, axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # Signatures ride as fixed-width BYTES (num_perm * 8), not
        # list<uint64>: the band explode copies each sig `bands` times and
        # the bucket shuffle moves them all — binary cells are ~5x cheaper
        # to serialize than object lists.
        # null-text rows (error docs) cannot be near-duplicates; they are
        # dropped here — the op's output is PAIRS, so nothing is lost
        batch = batch[batch["text"].notna()]
        out = batch.copy()
        out["minhash_sig"] = [self.signature(t).tobytes() for t in batch["text"]]
        return out


@functools.lru_cache(maxsize=8)
def _cached_minhasher(num_perm: int, shingle_k: int, seed: int) -> MinHasher:
    return MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)


def minhash_batch(batch: pd.DataFrame, num_perm: int = 64,
                  shingle_k: int = 3, seed: int = 7) -> pd.DataFrame:
    """Task-form MinHash stage: the permutation constants are trivial to
    build (64 rng draws), so an actor POOL buys nothing here — running as
    plain tasks reuses Ray's warm worker processes (lru_cache holds the
    state per worker) and skips the per-call pool spawn that dominated
    small/delta signature passes (~2s per dedup_minhash_incremental run)."""
    return _cached_minhasher(num_perm, shingle_k, seed)(batch)


def _explode_bands(batch: pd.DataFrame, bands: int, rows_per_band: int,
                   id_col: str) -> pd.DataFrame:
    """Row (id, sig) -> ``bands`` rows (id, band_id, band_hash, sig),
    fully vectorized: the band hash is a polynomial fold of the band's
    signature slice computed on the (n, bands, rows_per_band) cube."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "band_id": pd.Series([], dtype="int64"),
             "band_hash": pd.Series([], dtype="uint64"),
             "minhash_sig": pd.Series([], dtype="object")}
        )
    sig_mat = np.frombuffer(
        b"".join(batch["minhash_sig"]), dtype=np.uint64
    ).reshape(n, bands, rows_per_band)
    mult = np.uint64(0x9E3779B97F4A7C15)  # odd constant -> bijective fold
    bh = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows_per_band):  # rows_per_band is small: vector passes
        bh = bh * mult + sig_mat[:, :, j]
    return pd.DataFrame(
        {
            id_col: np.repeat(batch[id_col].to_numpy(), bands),
            "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_hash": bh.reshape(-1),
            "minhash_sig": [s for s in batch["minhash_sig"] for _ in range(bands)],
        }
    )


def dedup_minhash_lsh(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int | str = 16,
    threshold: float = 0.7,
    max_bucket: int = 64,
) -> "ray.data.Dataset":
    """Near-dup candidate pairs with signature-estimated Jaccard >= threshold.

    ``bands="auto"`` picks the band layout from the threshold via
    :func:`tune_lsh` (S-curve FP/FN minimization).

    Output: (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
    bands via a final groupby on the pair key.
    """
    import functools

    if bands == "auto":
        bands, _rows = tune_lsh(threshold, num_perm)
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        functools.partial(minhash_batch, num_perm=num_perm),
        batch_format="pandas",
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
        out_tr: list = []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            truncated = len(g) > max_bucket  # no-silent-caps: flag the rows
            g = g.sort_values(id_col).head(max_bucket)  # hot-bucket cap
            ids = g[id_col].to_numpy()
            sig_mat = np.frombuffer(
                b"".join(g["minhash_sig"]), dtype=np.uint64
            ).reshape(len(g), -1)
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            est = (sig_mat[a_idx] == sig_mat[b_idx]).mean(axis=1)
            keep = est >= threshold
            out_a.extend(ids[a_idx][keep])
            out_b.extend(ids[b_idx][keep])
            out_est.extend(est[keep])
            out_tr.extend([truncated] * int(keep.sum()))
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "est_jaccard": pd.Series(out_est, dtype="float64"),
                "bucket_truncated": pd.Series(out_tr, dtype="bool"),
            }
        )

    pairs = sorted_groupby(band_rows, ["band_id", "band_hash"], bucket_pairs_block)

    def dedup_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    # Candidate pairs are orders of magnitude fewer than band rows; a small
    # fixed partition count keeps the dedup shuffle's task floor low.
    return sorted_groupby(pairs, ["id_a", "id_b"], dedup_pairs_block, partitions=8)


# ------------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    """64-bit SimHash over tokens.  Token hash = crc32 avalanched to 64
    bits by a splitmix-style mix (crc alone only fills 32 bits)."""
    import zlib

    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    hs = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in toks),
        dtype=np.uint64,
        count=len(toks),
    )
    # splitmix64 finalizer: spreads 32-bit crc values over all 64 bits
    hs = (hs + np.uint64(0x9E3779B97F4A7C15))
    hs ^= hs >> np.uint64(30)
    hs *= np.uint64(0xBF58476D1CE4E5B9)
    hs ^= hs >> np.uint64(27)
    hs *= np.uint64(0x94D049BB133111EB)
    hs ^= hs >> np.uint64(31)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def add_simhash(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        # null-text rows (error docs) cannot be near-duplicates — dropped
        # (downstream consumes pairs, so nothing is lost)
        batch = batch[batch[text_col].notna()].copy()
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
        n = len(batch)
        hs = batch["simhash"].to_numpy(dtype=np.uint64)
        chunk = np.arange(4, dtype=np.uint64)
        vals = (hs[:, None] >> (np.uint64(16) * chunk[None, :])) & np.uint64(0xFFFF)
        return pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(), 4),
                "chunk_id": np.tile(np.arange(4, dtype=np.int64), n),
                "chunk_val": vals.reshape(-1).astype(np.int64),
                "simhash": np.repeat(hs, 4),
            }
        )

    from .grouped import sorted_groupby

    def bucket_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["chunk_id", "chunk_val"])[id_col].transform("size")
        df = df[sizes >= 2]
        out_a: list = []
        out_b: list = []
        out_h: list = []
        out_tr: list = []
        for _, g in df.groupby(["chunk_id", "chunk_val"], sort=False):
            truncated = len(g) > max_bucket  # no-silent-caps: flag the rows
            g = g.sort_values(id_col).head(max_bucket)
            ids = g[id_col].to_numpy()
            hs = g["simhash"].to_numpy(dtype=np.uint64)
            a, b = np.triu_indices(len(ids), k=1)
            x = hs[a] ^ hs[b]
            ham = popcount64(x)
            keep = ham <= max_hamming
            out_a.extend(ids[a][keep])
            out_b.extend(ids[b][keep])
            out_h.extend(ham[keep])
            out_tr.extend([truncated] * int(keep.sum()))
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "hamming": pd.Series(out_h, dtype="int64"),
                "bucket_truncated": pd.Series(out_tr, dtype="bool"),
            }
        )

    pairs = sorted_groupby(
        with_hash.map_batches(explode, batch_format="pandas"),
        ["chunk_id", "chunk_val"],
        bucket_pairs_block,
    )
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # bucket_truncated can differ between a pair's chunk copies;
        # aggregate with any() so the surviving flag is block-order-free.
        return (
            df.groupby(["id_a", "id_b"], sort=False, as_index=False)
            .agg(hamming=("hamming", "first"),
                 bucket_truncated=("bucket_truncated", "any"))
        )

    return sorted_groupby(pairs, ["id_a", "id_b"], dedup_pairs)


# ------------------------------------------- near-dup clusters (connected
# components over candidate pairs, iterative min-label propagation)
def connected_components(
    pairs_ds: "ray.data.Dataset", max_iters: int = 15
) -> "ray.data.Dataset":
    """(id_a, id_b) pair Dataset -> (node, cluster_id) with cluster_id =
    min node id in the component.  Iterative distributed min-label
    propagation: each round joins labels across edges and takes the
    per-node min; labels only decrease, so convergence is detected by the
    (cheap) global label sum going stationary.  LSH candidate cliques
    (diameter ~2) converge in 1-2 rounds; from round 3 on, POINTER
    DOUBLING kicks in (label <- label[label], one extra node-sized SMJ
    per round), so a pathological diameter-D chain needs O(log D) rounds
    instead of D — the long-path insurance at corpus scale without
    taxing the common clique case.

    Docs not in any pair are their own singleton cluster by definition;
    callers map missing ids to themselves.  Scale: the node set is the
    DUPLICATED subset of the corpus (bounded by the pair stages' bucket
    caps), orders of magnitude smaller than the corpus itself."""
    from .grouped import sorted_groupby

    def bidir(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["id_a"], df["id_b"]], ignore_index=True).astype("int64"),
                "dst": pd.concat([df["id_b"], df["id_a"]], ignore_index=True).astype("int64"),
            }
        )

    edges = pairs_ds.map_batches(bidir, batch_format="pandas").materialize()
    if edges.count() == 0:  # no pairs at all -> empty labeling (a clean
        # corpus reaches here; downstream anti-joins see nothing to drop)
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64")}
            )
        )

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["src"].unique()
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = sorted_groupby(edges, "src", init_labels).materialize()
    prev_sum = labels.sum("label")

    from .relational import sort_merge_join

    for it in range(max_iters):
        lab_as_dst = labels.map_batches(
            lambda df: df.rename(columns={"node": "dst"}), batch_format="pandas"
        )
        neighbor = sort_merge_join(edges, lab_as_dst, ["dst"], how="inner")
        cand = neighbor.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["src"].astype("int64"), "label": df["label"].astype("int64")}
            ),
            batch_format="pandas",
        )
        both = cand.union(labels)
        labels = sorted_groupby(
            both,
            "node",
            lambda df: df.groupby("node", as_index=False).agg(label=("label", "min")),
            partitions=8,
        ).materialize()
        if it >= 2:
            # not converged after two edge rounds: the component diameter
            # exceeds a clique's — add pointer doubling (label[label])
            as_ptr = labels.map_batches(
                lambda df: df.rename(
                    columns={"node": "ptr", "label": "ptr_label"}),
                batch_format="pandas",
            )
            with_ptr = sort_merge_join(
                labels.map_batches(
                    lambda df: df.rename(columns={"label": "ptr"}),
                    batch_format="pandas",
                ),
                as_ptr, ["ptr"], how="left",
            )
            labels = with_ptr.map_batches(
                lambda df: pd.DataFrame(
                    {
                        "node": df["node"].astype("int64"),
                        "label": np.minimum(
                            df["ptr"].to_numpy(np.int64),
                            df["ptr_label"].fillna(df["ptr"]).to_numpy(
                                np.int64),
                        ),
                    }
                ),
                batch_format="pandas",
            ).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # labels only decrease -> fixpoint
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda df: df.rename(columns={"label": "cluster_id"}), batch_format="pandas"
    )


# ---------------------------------------------------------- n-gram Jaccard
def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (verification kernel for LSH candidates)."""
    a, b = set(_shingles(text_a, k).tolist()), set(_shingles(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def dedup_jaccard(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    candidate_threshold: float = 0.5,
    **lsh_kwargs,
) -> "ray.data.Dataset":
    """Exact n-gram-Jaccard near-dup pairs: MinHash-LSH candidate
    generation followed by EXACT word-k-gram Jaccard verification.

    Scale shape (the two-phase fuzzy-dedup standard): the LSH phase
    shuffles signatures only; the verification phase moves TEXT for the
    candidate ids alone (orders of magnitude fewer than corpus rows) via
    two small co-shuffles — never a driver materialization and never a
    text broadcast:

    1. candidate pairs (id_a, id_b) from :func:`dedup_minhash_lsh` at a
       looser ``candidate_threshold`` (estimate noise floor);
    2. pair rows explode to two slot rows keyed by doc id; corpus text
       rows for candidate ids (semi-join against the worker-built id
       set) co-shuffle with them on the id -> each slot row picks up its
       text;
    3. re-shuffle on the pair key -> both texts land in one group ->
       exact ``ngram_jaccard``; keep pairs >= ``threshold``.

    Output: (id_a, id_b, est_jaccard, jaccard) with id_a < id_b.
    """
    from .grouped import sorted_groupby
    from .relational import semi_join

    # materialize: the candidate-pair list is tiny (pairs, not corpus) but
    # feeds TWO consumers (slot explode + the id set for the text
    # semi-join) — without pinning it, Ray re-executes the whole LSH
    # phase once per consumer (measured 3.3x the LSH cost at sf0.1)
    pairs = dedup_minhash_lsh(
        ds, text_col=text_col, id_col=id_col,
        threshold=candidate_threshold, **lsh_kwargs,
    ).materialize()

    def pair_slots(df: pd.DataFrame) -> pd.DataFrame:
        # each pair -> two rows keyed by the doc whose text it needs
        n = len(df)
        return pd.DataFrame(
            {
                "join_id": np.concatenate(
                    [df["id_a"].to_numpy(), df["id_b"].to_numpy()]
                ) if n else np.array([], dtype=np.int64),
                "id_a": np.tile(df["id_a"].to_numpy(), 2),
                "id_b": np.tile(df["id_b"].to_numpy(), 2),
                "est_jaccard": np.tile(df["est_jaccard"].to_numpy(), 2),
                "pair_text": pd.Series([None] * (2 * n), dtype="object"),
            }
        )

    slots = pairs.map_batches(pair_slots, batch_format="pandas")
    # text rows for candidate ids only: worker-built broadcast id set
    cand_ids = slots.map_batches(
        lambda df: df[["join_id"]].drop_duplicates(), batch_format="pandas"
    )
    cand_texts = semi_join(
        ds, cand_ids, fact_key=id_col, dim_key="join_id"
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "join_id": df[id_col].astype("int64"),
                "id_a": pd.Series([-1] * len(df), dtype="int64"),
                "id_b": pd.Series([-1] * len(df), dtype="int64"),
                "est_jaccard": pd.Series([0.0] * len(df), dtype="float64"),
                "pair_text": df[text_col].astype("object"),
            }
        ),
        batch_format="pandas",
    )

    def attach_text(df: pd.DataFrame) -> pd.DataFrame:
        # groups arrive whole: one text row (id_a == -1) + N slot rows.
        # A corpus with duplicate doc ids would make the index non-unique
        # and Series.map raise — keep the first text per id (duplicate ids
        # carry identical text by definition of the id column) so a dirty
        # input degrades gracefully instead of failing the whole query.
        texts = df.loc[df["id_a"] == -1].set_index("join_id")["pair_text"]
        texts = texts[~texts.index.duplicated(keep="first")]
        out = df.loc[df["id_a"] != -1].copy()
        out["pair_text"] = out["join_id"].map(texts)
        return out

    with_text = sorted_groupby(
        slots.union(cand_texts), "join_id", attach_text, partitions=8
    )

    def verify_block(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (ia, ib), g in df.groupby(["id_a", "id_b"], sort=False):
            texts = g.set_index("join_id")["pair_text"]
            ta, tb = texts.get(ia), texts.get(ib)
            if ta is None or tb is None:
                continue
            j = ngram_jaccard(str(ta), str(tb), k)
            if j >= threshold:
                rows.append((ia, ib, float(g["est_jaccard"].iloc[0]), j))
        return pd.DataFrame(
            rows, columns=["id_a", "id_b", "est_jaccard", "jaccard"]
        ).astype(
            {"id_a": "int64", "id_b": "int64",
             "est_jaccard": "float64", "jaccard": "float64"}
        )

    return sorted_groupby(with_text, ["id_a", "id_b"], verify_block, partitions=8)


# ------------------------------- embedding near-dup, LSH-bucketed (scale path)
def embedding_near_dup_lsh(
    ds: "ray.data.Dataset",
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    max_bucket: int = 512,
    seed: int = 13,
) -> "ray.data.Dataset":
    """Near-dup pairs at 10^12-row scale: random-hyperplane signatures
    bucket the vectors (``n_tables`` independent tables — recall knob);
    exact cosine verification runs only WITHIN buckets, and the shuffle
    carries (id, bucket, vector) rows — never the full N x N comparison.
    Output: (id_a, id_b, cosine) with id_a < id_b, deduplicated across
    tables.  Recall < 1 by construction; ``embedding_near_dup`` (broadcast
    matrix) is the exact small-N baseline."""
    from .grouped import sorted_groupby

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        dim = mat.shape[1]
        out_id, out_tab, out_sig, out_vec = [], [], [], []
        for t in range(n_tables):
            p_rng = np.random.default_rng([seed, t, dim])
            planes_t = p_rng.standard_normal((n_bits, dim))
            sig = ((mat @ planes_t.T) > 0) @ (1 << np.arange(n_bits))
            out_id.extend(df[id_col].to_numpy())
            out_tab.extend([t] * len(df))
            out_sig.extend(sig.astype(np.int64))
            out_vec.extend([v.tobytes() for v in mat])
        return pd.DataFrame(
            {
                id_col: pd.Series(out_id, dtype="int64"),
                "table_id": pd.Series(out_tab, dtype="int64"),
                "bucket": pd.Series(out_sig, dtype="int64"),
                "vec": pd.Series(out_vec, dtype="object"),
            }
        )

    def bucket_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["table_id", "bucket"])[id_col].transform("size")
        df = df[sizes >= 2]
        out_a: list = []
        out_b: list = []
        out_c: list = []
        out_tr: list = []
        for _, g in df.groupby(["table_id", "bucket"], sort=False):
            truncated = len(g) > max_bucket  # no-silent-caps: flag the rows
            g = g.sort_values(id_col).head(max_bucket)
            ids = g[id_col].to_numpy()
            mat = np.frombuffer(b"".join(g["vec"]), dtype=np.float64).reshape(
                len(g), -1
            )
            sims = mat @ mat.T
            a, b = np.triu_indices(len(ids), k=1)
            keep = sims[a, b] >= threshold
            out_a.extend(ids[a][keep])
            out_b.extend(ids[b][keep])
            out_c.extend(sims[a, b][keep])
            out_tr.extend([truncated] * int(keep.sum()))
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "cosine": pd.Series(out_c, dtype="float64"),
                "bucket_truncated": pd.Series(out_tr, dtype="bool"),
            }
        )

    pairs = sorted_groupby(
        ds.map_batches(explode, batch_format="pandas"),
        ["table_id", "bucket"],
        bucket_pairs_block,
    )
    return sorted_groupby(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
        partitions=8,
    )


# ------------------------------------------------- embedding cosine near-dup
def embedding_near_dup(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
) -> "ray.data.Dataset":
    """Cosine-similarity >= threshold pairs (id_a < id_b), EXACT.

    Broadcast pattern with no driver materialization: the (id, normalized
    vector) reference matrix is assembled by a Ray TASK from the dataset's
    Arrow block refs (the driver only passes object refs around), stored
    once in the object store, and read zero-copy inside each batch task,
    which matmuls its block against it.  O(N²/B) compute per task.

    The reference side is still O(N·d) object-store bytes on the node
    running each task — inherent to exact all-pairs.  ``max_broadcast_rows``
    guards the pattern: above it the task raises with a pointer to
    ``embedding_near_dup_lsh``, the bucketed 10^12-row path.
    """
    import ray

    proj = ds.select_columns([id_col, vec_col])

    @ray.remote
    def build_ref(*blocks: pa.Table):
        t = pa.concat_tables(blocks)
        if t.num_rows > max_broadcast_rows:
            raise ValueError(
                f"embedding_near_dup: {t.num_rows} rows exceeds "
                f"max_broadcast_rows={max_broadcast_rows}; use "
                "embedding_near_dup_lsh (bucketed) for corpora this size"
            )
        ids = np.asarray(t.column(id_col).to_pylist())
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in t.column(vec_col).to_pylist()]
        )
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return ids, mat

    # to_arrow_refs() yields the blocks as object refs; the driver never
    # holds the table.  The build task runs where Ray schedules it.
    ref = build_ref.remote(*proj.to_arrow_refs())

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        bids, bmat = ray.get(ref)  # zero-copy numpy view from object store
        q = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        qids = batch[id_col].to_numpy()
        sims = q @ bmat.T
        ii, jj = np.nonzero((sims >= threshold) & (qids[:, None] < bids[None, :]))
        return pd.DataFrame(
            {
                "id_a": pd.Series(qids[ii], dtype=batch[id_col].dtype),
                "id_b": pd.Series(bids[jj], dtype=batch[id_col].dtype),
                "cosine": pd.Series(sims[ii, jj], dtype="float64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def tune_lsh(
    threshold: float, num_perm: int = 64,
    fp_weight: float = 0.5,
) -> tuple[int, int]:
    """Pick (bands, rows_per_band) for MinHash-LSH at a target Jaccard
    threshold by minimizing the weighted false-positive + false-negative
    probability integrals of the S-curve P(hit | s) = 1 - (1 - s^r)^b
    (the standard datasketch-style parameter search, exhaustive over the
    divisors of ``num_perm``).  Returns the best (bands, rows)."""
    import numpy as np

    s = np.linspace(0.0, 1.0, 501)
    best, best_err = None, float("inf")
    for rows in range(1, num_perm + 1):
        if num_perm % rows:
            continue
        bands = num_perm // rows
        p_hit = 1.0 - (1.0 - s**rows) ** bands
        fp = np.trapz(p_hit[s < threshold], s[s < threshold])
        fn = np.trapz(1.0 - p_hit[s >= threshold], s[s >= threshold])
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if err < best_err:
            best_err, best = err, (bands, rows)
    return best


# ------------------------------------------------------ substring dedup
def dedup_substrings(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens: int = 8,
    max_broadcast_hashes: int = 5_000_000,
) -> "ray.data.Dataset":
    """Cross-document duplicated-substring census — the substring-level
    exact dedup of "Deduplicating Training Data Makes Language Models
    Better" (Lee et al. 2022), at word-n-gram granularity.

    A span is one window of ``n_tokens`` consecutive whitespace tokens
    (stride 1).  A span is DUPLICATED iff its text occurs in >= 2
    distinct documents (in-document repeats alone don't count).  Output:
    one row per input doc — (id, n_spans, n_dup_spans, dup_frac).

    100 TB shape: pass 1 ships (64-bit span hash, 1) partials (hashes
    deduped per doc map-side, so each doc contributes once per span
    text) through a combine-groupby -> document frequency; only hashes
    with df >= 2 survive.  Pass 2 re-scans the text and counts span
    hits against that set — broadcast as a worker-built sorted array
    under ``max_broadcast_hashes``, else a hash-key sort-merge join of
    exploded span hashes (both passes move hashes, never text).
    Counts assume collision-free 64-bit span hashing (2^-64-scale
    error; the standard trade in suffix/ngram dedup at scale).
    """
    import ray

    from .grouped import combined_groupby_agg
    from .text_analysis import _TOKEN_RE

    def span_hashes(text: str) -> np.ndarray:
        toks = _TOKEN_RE.findall(text)
        if len(toks) < n_tokens:
            return np.empty(0, np.int64)
        joined = [" ".join(toks[i: i + n_tokens])
                  for i in range(len(toks) - n_tokens + 1)]
        import hashlib

        # 63-bit (int64-positive) blake2b: Arrow/pandas join machinery
        # casts unsigned keys unsafely, so hashes stay signed-positive
        return np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
             & 0x7FFFFFFFFFFFFFFF
             for s in joined),
            np.int64, len(joined),
        )

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        # per doc: DISTINCT span hashes (a doc votes once per span text)
        hs: list[np.ndarray] = [
            np.unique(span_hashes(t or "")) for t in df[text_col]
        ]
        flat = (np.concatenate(hs) if hs else np.empty(0, np.int64))
        if not len(flat):
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "docs": pd.Series([], dtype="int64")})
        uniq, cnt = np.unique(flat, return_counts=True)
        return pd.DataFrame({"h": uniq, "docs": cnt.astype(np.int64)})

    df_tab = combined_groupby_agg(
        ds.map_batches(df_partial, batch_format="pandas"),
        "h",
        {"docs": ("docs", "sum")},
    )
    dup = df_tab.map_batches(
        lambda d: d[d["docs"] >= 2][["h"]], batch_format="pandas"
    ).materialize()

    n_dup = dup.count()
    if n_dup <= max_broadcast_hashes:
        import pyarrow as pa

        from .relational import build_broadcast

        def keys_of(t: "pa.Table | None"):
            if t is None:
                return np.empty(0, np.int64)
            return np.sort(
                t.column("h").to_numpy(zero_copy_only=False).astype(
                    np.int64)
            )

        ref = build_broadcast(dup, keys_of)

        def count_hits(df: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(ref)
            n_spans, n_dups = [], []
            for t in df[text_col]:
                hs = span_hashes(t or "")
                n_spans.append(len(hs))
                if len(hs) and len(keys):
                    pos = np.searchsorted(keys, hs)
                    pos[pos >= len(keys)] = len(keys) - 1
                    n_dups.append(int((keys[pos] == hs).sum()))
                else:
                    n_dups.append(0)
            out = pd.DataFrame(
                {
                    id_col: df[id_col],
                    "n_spans": pd.Series(n_spans, dtype="int64"),
                    "n_dup_spans": pd.Series(n_dups, dtype="int64"),
                }
            )
            out["dup_frac"] = np.where(
                out["n_spans"] > 0, out["n_dup_spans"] / out["n_spans"], 0.0
            )
            return out

        return ds.map_batches(count_hits, batch_format="pandas")

    # scale fallback: explode (id, h) spans and SMJ against the dup set
    from .grouped import sorted_groupby
    from .relational import sort_merge_join

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for i, t in zip(df[id_col], df[text_col]):
            h = span_hashes(t or "")
            ids.extend([i] * len(h))
            hs.append(h)
        return pd.DataFrame(
            {id_col: ids,
             "h": (np.concatenate(hs) if hs else np.empty(0, np.int64))}
        )

    spans = ds.map_batches(explode, batch_format="pandas")
    hits = sort_merge_join(spans, dup.map_batches(
        lambda d: d.assign(is_dup=True), batch_format="pandas"), ["h"],
        how="left")

    def agg_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).agg(
            n_spans=("h", "size"), n_dup_spans=("is_dup", "sum"))
        g["n_dup_spans"] = g["n_dup_spans"].fillna(0).astype("int64")
        g["dup_frac"] = np.where(
            g["n_spans"] > 0, g["n_dup_spans"] / g["n_spans"], 0.0)
        return g

    counted = sorted_groupby(hits, id_col, agg_block)
    # docs with < n_tokens tokens never exploded: re-attach with zeros
    from .relational import dim_join

    base = ds.map_batches(
        lambda df: df[[id_col]], batch_format="pandas")
    joined = dim_join(base, counted, id_col, id_col,
                      ["n_spans", "n_dup_spans", "dup_frac"])
    return joined.map_batches(
        lambda df: df.fillna(
            {"n_spans": 0, "n_dup_spans": 0, "dup_frac": 0.0}).astype(
            {"n_spans": "int64", "n_dup_spans": "int64"}),
        batch_format="pandas",
    )


def semdedup(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    k: int = 64,
    iters: int = 8,
    seed: int = 7,
    max_cluster: int = 20_000,
    n_probe: int = 2,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023 shape): semantic near-dup pairs via
    k-means bucketing + exact within-cluster cosine.

    Returns (id_a, id_b, cos, cluster_truncated) pairs with
    ``cos >= threshold`` — feed into ``connected_components`` /
    ``dedup_purge`` to keep one representative per group, exactly like
    the MinHash text path.

    100 TB shape: centroids train on a sample with tiny per-pass
    partials (``kmeans_fit``) and broadcast once; assignment is a pure
    map — each vector goes to its ``n_probe`` nearest clusters
    (multi-probe: a pair is found if the two sets overlap, the same
    recall lever as IVF probing; duplicate finds are merged by a
    pair-key pass); ONE cluster-key shuffle moves each vector
    ``n_probe`` times; the quadratic within-cluster scan is bounded by
    cluster sizes — an oversized cluster is truncated to
    ``max_cluster`` members with the cap SURFACED on every emitted
    pair of that cluster (``cluster_truncated``), the engine's
    no-silent-caps rule.  Precision is exact (cosine verified
    in-bucket); recall misses only pairs whose probe sets are
    disjoint — the standard SemDeDup trade, measured in the gate query
    against the exact all-pairs path."""
    import ray

    from .grouped import sorted_groupby
    from .similarity import kmeans_fit

    if ds.limit(1).count() == 0:
        # a fully-filtered corpus has no pairs by definition (and no
        # vectors to train centroids on)
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64()),
                 "cluster_truncated": pa.array([], pa.bool_())}
            )
        )
    cents, _ = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col,
                          seed=seed)
    npb = max(1, min(n_probe, len(cents)))
    ref = ray.put(np.asarray(cents, np.float64))

    def assign_probes(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        mat = np.stack([np.asarray(v, np.float64) for v in df[vec_col]])
        d2 = ((mat * mat).sum(axis=1)[:, None] - 2.0 * (mat @ c.T)
              + (c * c).sum(axis=1)[None, :])
        near = np.argpartition(d2, npb - 1, axis=1)[:, :npb]
        rep = df.loc[df.index.repeat(npb)].reset_index(drop=True)
        rep["cluster"] = near.reshape(-1).astype(np.int32)
        return rep

    assigned = ds.map_batches(assign_probes, batch_format="pandas")

    def pairs_of(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c, out_t = [], [], [], []
        for _, grp in df.groupby("cluster", sort=False):
            truncated = len(grp) > max_cluster
            if truncated:
                grp = grp.nsmallest(max_cluster, id_col)
            if len(grp) < 2:
                continue
            mat = np.stack([np.asarray(v, np.float64)
                            for v in grp[vec_col]])
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            mat = mat / norms[:, None]
            gram = mat @ mat.T
            ids = grp[id_col].to_numpy()
            ii, jj = np.triu_indices(len(grp), k=1)
            keep = gram[ii, jj] >= threshold
            a, b = ids[ii[keep]], ids[jj[keep]]
            swap = a > b
            out_a.append(np.where(swap, b, a))
            out_b.append(np.where(swap, a, b))
            out_c.append(gram[ii, jj][keep])
            out_t.append(np.full(int(keep.sum()), truncated))
        if not out_a:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
                "cluster_truncated": pd.Series([], dtype="bool")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype(np.int64),
            "id_b": np.concatenate(out_b).astype(np.int64),
            "cos": np.concatenate(out_c),
            "cluster_truncated": np.concatenate(out_t)})

    pairs = sorted_groupby(assigned, "cluster", pairs_of)
    if npb == 1:
        return pairs

    def merge_dupes(df: pd.DataFrame) -> pd.DataFrame:
        # a pair found in several shared probe clusters appears once per
        # cluster: merge, aggregating the truncation flag with any() so
        # the output is block-order-independent
        return df.groupby(["id_a", "id_b"], as_index=False).agg(
            cos=("cos", "max"),
            cluster_truncated=("cluster_truncated", "any"))

    return sorted_groupby(pairs, ["id_a", "id_b"], merge_dupes)


def _word_ngram_hashes(text: str, n_tokens: int) -> np.ndarray:
    """Signed-positive 63-bit blake2b hashes of the lowercased word
    ``n_tokens``-grams of ``text`` (stride 1).  Lowercasing matches the
    standard benchmark-decontamination normalization (GPT-3 appendix C /
    The Pile): eval passages are compared case-insensitively."""
    import hashlib
    import re

    toks = re.findall(r"\S+", text.lower())
    if len(toks) < n_tokens:
        return np.empty(0, np.int64)
    joined = (" ".join(toks[i: i + n_tokens])
              for i in range(len(toks) - n_tokens + 1))
    return np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
         & 0x7FFFFFFFFFFFFFFF
         for s in joined),
        np.int64, len(toks) - n_tokens + 1,
    )


def decontaminate(
    ds: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n_tokens: int = 13,
    max_broadcast_hashes: int = 50_000_000,
) -> "ray.data.Dataset":
    """Benchmark decontamination: flag training documents that share any
    lowercased word-``n_tokens``-gram with an evaluation/benchmark set
    (the GPT-3 appendix-C / Pile 13-gram overlap rule).

    Output: one row per input doc — (id, n_spans, n_contaminated,
    contam_frac, contaminated).

    100 TB shape: the benchmark side is SMALL relative to the corpus —
    its distinct n-gram hashes are built once worker-side and broadcast
    (``ray.put`` via build_broadcast; each scoring actor reads the
    sorted int64 array zero-copy and searchsorted-probes it), so the
    corpus pass is a pure map: no shuffle touches document text.  Past
    ``max_broadcast_hashes`` the op falls back to a hash-key sort-merge
    join of exploded corpus span hashes against the benchmark hash
    table — hashes move, text never does.  Collision risk is the
    standard 2^-63-scale n-gram-hash trade."""
    import ray

    from .grouped import sorted_groupby
    from .relational import build_broadcast, dim_join, sort_merge_join

    def bench_partial(df: pd.DataFrame) -> pd.DataFrame:
        hs = [np.unique(_word_ngram_hashes(t or "", n_tokens))
              for t in df[bench_text_col]]
        flat = np.concatenate(hs) if hs else np.empty(0, np.int64)
        return pd.DataFrame({"h": pd.Series(np.unique(flat), dtype="int64")})

    bench_hashes = bench.map_batches(
        bench_partial, batch_format="pandas").materialize()
    n_bench = bench_hashes.count()

    def score_df(ids, texts, keys) -> pd.DataFrame:
        n_spans, n_hits = [], []
        for t in texts:
            hs = _word_ngram_hashes(t or "", n_tokens)
            n_spans.append(len(hs))
            if len(hs) and len(keys):
                pos = np.searchsorted(keys, hs)
                pos[pos >= len(keys)] = len(keys) - 1
                n_hits.append(int((keys[pos] == hs).sum()))
            else:
                n_hits.append(0)
        out = pd.DataFrame({
            id_col: ids,
            "n_spans": pd.Series(n_spans, dtype="int64"),
            "n_contaminated": pd.Series(n_hits, dtype="int64"),
        })
        out["contam_frac"] = np.where(
            out["n_spans"] > 0, out["n_contaminated"] / out["n_spans"], 0.0)
        out["contaminated"] = out["n_contaminated"] > 0
        return out

    if n_bench <= max_broadcast_hashes:
        def keys_of(t):
            if t is None:
                return np.empty(0, np.int64)
            return np.sort(np.unique(
                t.column("h").to_numpy(zero_copy_only=False).astype(
                    np.int64)))

        ref = build_broadcast(bench_hashes, keys_of)

        def count_hits(df: pd.DataFrame) -> pd.DataFrame:
            return score_df(df[id_col], df[text_col], ray.get(ref))

        return ds.map_batches(count_hits, batch_format="pandas")

    # scale fallback: explode (id, h) and SMJ against the benchmark set
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for i, t in zip(df[id_col], df[text_col]):
            h = _word_ngram_hashes(t or "", n_tokens)
            ids.extend([i] * len(h))
            hs.append(h)
        return pd.DataFrame(
            {id_col: ids,
             "h": (np.concatenate(hs) if hs else np.empty(0, np.int64))})

    # bench_partial dedups per block only: make hashes GLOBALLY distinct
    # before the join, else cross-block repeats overcount hits
    from .grouped import combined_groupby_agg

    uniq_bench = combined_groupby_agg(
        bench_hashes.map_batches(
            lambda d: d.assign(n=np.int64(1)), batch_format="pandas"),
        "h", {"n": ("n", "sum")},
    ).map_batches(
        lambda d: d[["h"]].assign(is_hit=True), batch_format="pandas")
    spans = ds.map_batches(explode, batch_format="pandas")
    hits = sort_merge_join(spans, uniq_bench, ["h"], how="left")

    def agg_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).agg(
            n_spans=("h", "size"), n_contaminated=("is_hit", "sum"))
        g["n_contaminated"] = g["n_contaminated"].fillna(0).astype("int64")
        g["contam_frac"] = np.where(
            g["n_spans"] > 0, g["n_contaminated"] / g["n_spans"], 0.0)
        g["contaminated"] = g["n_contaminated"] > 0
        return g

    counted = sorted_groupby(hits, id_col, agg_block)
    base = ds.map_batches(lambda df: df[[id_col]], batch_format="pandas")
    joined = dim_join(base, counted, id_col, id_col,
                      ["n_spans", "n_contaminated", "contam_frac",
                       "contaminated"])
    return joined.map_batches(
        lambda df: df.fillna(
            {"n_spans": 0, "n_contaminated": 0, "contam_frac": 0.0,
             "contaminated": False}).astype(
            {"n_spans": "int64", "n_contaminated": "int64",
             "contaminated": "bool"}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# incremental cross-snapshot MinHash dedup (persisted signature store)
# ---------------------------------------------------------------------------

def dedup_minhash_incremental(
    new_ds: "ray.data.Dataset",
    store_dir: str,
    snapshot: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 64,
) -> "ray.data.Dataset":
    """Near-dup pairs for a NEW crawl snapshot against everything seen
    before, without recomputing (or even re-reading) old text.

    The signature STORE is partitioned parquet of (id, minhash_sig) under
    ``store_dir/snapshot=<name>/``.  This call:

    1. signatures the new snapshot's text (ONE pass — the only text read);
    2. unions them with all PRIOR snapshots' stored signatures;
    3. LSH-bands the union but emits only pairs touching >= 1 NEW doc
       (old-old pairs were already reported when their snapshots landed);
    4. persists the new signatures under ``snapshot=<name>/``
       (overwritten idempotently, so a crashed run can just re-run).

    Scale shape: per crawl delta, text I/O is O(new docs); the shuffle
    carries 8*num_perm-byte signatures for old + new; the store grows by
    ~0.5 KB/doc.  This is the 100-TB recrawl pattern — a 1% delta costs
    ~1% of a full dedup's text work.

    Returns (id_a, id_b, est_jaccard, bucket_truncated) pairs.

    Invariant (pinned in tests/test_ops.py): absent bucket truncation,
    the UNION of pair sets over snapshots 1..n equals one full
    :func:`dedup_minhash_lsh` over the concatenated corpus — banding is
    per-doc deterministic, so each pair is reported exactly once, by the
    first snapshot that completes it.
    """
    import functools as _functools
    import os
    import shutil

    import ray.data

    from .grouped import sorted_groupby

    rows_per_band = num_perm // bands
    if text_col != "text":
        raise ValueError("minhash expects a 'text' column")

    snap_dir = os.path.join(store_dir, f"snapshot={snapshot}")
    shutil.rmtree(snap_dir, ignore_errors=True)
    # Materialized once: the signatures feed BOTH the store write and the
    # banding below — without materialize() each consumer would re-run the
    # signature pass, and reading the store back from disk (the previous
    # shape) paid a parquet round-trip for bytes already in the object
    # store.  Signatures are 8*num_perm B/doc, so a 1B-doc delta holds
    # ~0.5 TB — the object store spills; still strictly less I/O than
    # write-then-reread.
    new_sigs = new_ds.map_batches(
        _functools.partial(minhash_batch, num_perm=num_perm),
        batch_format="pandas",
    ).map_batches(
        lambda df: df[[id_col, "minhash_sig"]], batch_format="pandas"
    ).materialize()
    new_sigs.write_parquet(snap_dir)

    def _has_parquet(d: str) -> bool:
        # an EMPTY snapshot (e.g. a crawl delta with zero new docs) writes
        # no files; read_parquet on a fileless dir raises FileNotFoundError
        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d))

    # expand to file paths: read_parquet accepts one dir but not a LIST
    # of dirs (pyarrow opens list entries as files)
    prior_files = [
        os.path.join(p, f)
        for d in sorted(os.listdir(store_dir))
        if d.startswith("snapshot=") and d != f"snapshot={snapshot}"
        and _has_parquet(p := os.path.join(store_dir, d))
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]

    if new_sigs.count() == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "est_jaccard": pd.Series([], dtype="float64"),
            "bucket_truncated": pd.Series([], dtype="bool"),
        }))

    tagged_new = new_sigs.map_batches(
        lambda df: df.assign(is_new=True), batch_format="pandas")
    if prior_files:
        tagged_old = ray.data.read_parquet(prior_files).map_batches(
            lambda df: df.assign(is_new=False), batch_format="pandas")
        union = tagged_new.union(tagged_old)
    else:
        union = tagged_new

    def explode_tagged(batch: pd.DataFrame) -> pd.DataFrame:
        out = _explode_bands(batch, bands=bands, rows_per_band=rows_per_band,
                             id_col=id_col)
        out["is_new"] = np.repeat(
            batch["is_new"].to_numpy(), bands) if len(batch) else np.array(
            [], dtype=bool)
        return out

    band_rows = union.map_batches(explode_tagged, batch_format="pandas")

    def bucket_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band_id", "band_hash"])[id_col].transform("size")
        df = df[sizes >= 2]
        out_a, out_b, out_est, out_tr = [], [], [], []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            if not g["is_new"].any():
                continue  # old-old bucket: already reported
            truncated = len(g) > max_bucket
            g = g.sort_values(id_col).head(max_bucket)
            ids = g[id_col].to_numpy()
            newf = g["is_new"].to_numpy()
            sig_mat = np.frombuffer(
                b"".join(g["minhash_sig"]), dtype=np.uint64
            ).reshape(len(g), -1)
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            touch_new = newf[a_idx] | newf[b_idx]
            est = (sig_mat[a_idx] == sig_mat[b_idx]).mean(axis=1)
            keep = (est >= threshold) & touch_new
            out_a.extend(ids[a_idx][keep])
            out_b.extend(ids[b_idx][keep])
            out_est.extend(est[keep])
            out_tr.extend([truncated] * int(keep.sum()))
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "est_jaccard": pd.Series(out_est, dtype="float64"),
                "bucket_truncated": pd.Series(out_tr, dtype="bool"),
            }
        )

    pairs = sorted_groupby(band_rows, ["band_id", "band_hash"],
                           bucket_pairs_block)
    return sorted_groupby(
        pairs, ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False).agg(
            est_jaccard=("est_jaccard", "first"),
            bucket_truncated=("bucket_truncated", "any"),
        ),
    )


def mirror_hosts(
    ds: "ray.data.Dataset",
    host_col: str = "host",
    text_col: str = "text",
    min_shared: int = 2,
    max_hosts_per_hash: int = 32,
) -> "ray.data.Dataset":
    """Mirror-site detection: ordered host pairs sharing >= ``min_shared``
    byte-identical documents -> (host_a, host_b, n_shared).  The standard
    crawl-curation step before host-level dedup decisions (a mirror pair
    means one side's documents are redundant wholesale).

    Shape: hash text per batch (md5, vectorized via hashlib over the
    block), global DISTINCT (host, hash) + per-hash host-pair expansion
    inside ONE sorted group pass, then a grouped count over pairs — no
    self-join.  A hash carried by more than ``max_hosts_per_hash`` hosts
    (boilerplate shared by everyone — empty pages, parked-domain
    templates) is dropped with its pair explosion: it identifies no
    specific mirror relationship.  At 100 TB the group pass is one
    shuffle of (host, hash16) pairs, far smaller than the corpus."""
    import hashlib

    from .grouped import sorted_groupby

    def hash_block(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "host": df[host_col].astype(str),
                "hsh": [
                    hashlib.md5(t.encode() if isinstance(t, str) else b"").hexdigest()
                    for t in df[text_col]
                ],
            }
        )
        return out.drop_duplicates()  # map-side partial distinct

    hashed = ds.map_batches(hash_block, batch_format="pandas")

    def pairs_block(df: pd.DataFrame):
        import pyarrow as pa

        out_a: list[str] = []
        out_b: list[str] = []
        for _, grp in df.groupby("hsh", sort=False):
            hosts = sorted(grp["host"].unique())
            if len(hosts) < 2 or len(hosts) > max_hosts_per_hash:
                continue
            for i in range(len(hosts)):
                for j in range(i + 1, len(hosts)):
                    out_a.append(hosts[i])
                    out_b.append(hosts[j])
        # typed Arrow block: zero-pair blocks keep the schema
        return pa.table(
            {"host_a": pa.array(out_a, pa.string()),
             "host_b": pa.array(out_b, pa.string())}
        )

    pairs = sorted_groupby(hashed, ["hsh"], pairs_block).materialize()
    if pairs.count() == 0:
        # mirror-free corpus: a typed empty (post-shuffle all-empty
        # datasets lose their schema — the connected_components pattern)
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"host_a": pa.array([], pa.string()),
                 "host_b": pa.array([], pa.string()),
                 "n_shared": pa.array([], pa.int64())}
            )
        )

    def count_block(df: pd.DataFrame):
        import pyarrow as pa

        out = (
            df.groupby(["host_a", "host_b"], as_index=False)
            .size()
            .rename(columns={"size": "n_shared"})
        )
        if "n_shared" in out:
            out = out[out["n_shared"] >= min_shared]
        # typed Arrow block so a mirror-free corpus still yields a dataset
        # WITH a schema (all-empty pandas blocks infer to schema None)
        return pa.table(
            {
                "host_a": pa.array(out.get("host_a", []), pa.string()),
                "host_b": pa.array(out.get("host_b", []), pa.string()),
                "n_shared": pa.array(
                    out.get("n_shared", pd.Series([], dtype="int64"))
                    .astype("int64"),
                    pa.int64(),
                ),
            }
        )

    return sorted_groupby(pairs, ["host_a", "host_b"], count_block)
