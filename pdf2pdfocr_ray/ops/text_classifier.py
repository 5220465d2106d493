"""Trained text-quality classifier — the CCNet/RefinedWeb-style filtering
step: a hashed bag-of-ngrams linear classifier (fastText-shaped) trained
ON the cluster and applied as a pure-map scoring pass.

This complements the heuristic quality signals in ``text_analysis``
(Gopher rules, repetition, trigram-LM): real curation pipelines train a
classifier on a labeled seed (e.g. "reference corpus vs random crawl")
and keep the documents the classifier likes.

Scale shape (what survives 100 TB):

* Features are HASHED (crc32 -> ``dim`` buckets, unigrams + bigrams), so
  the model is a fixed-size float vector (dim 2^18 ~ 2 MB) with no vocab
  to ship or synchronize.
* Training is full-batch gradient descent: one streaming pass per epoch;
  each batch emits a SPARSE gradient partial (observed feature ids +
  values — KBs, never O(rows)); the driver merges partials in block
  order (deterministic float order), updates the weights, re-broadcasts
  via ``ray.put``.  Exactly the kmeans_fit partial pattern
  (similarity.py) with a sparse vector instead of (k, d) sums.
  Full-batch GD makes the result PARTITION-INDEPENDENT: the gradient is
  a sum over docs, so block boundaries cannot change the model (modulo
  float association, pinned by block-order merge).
* Labeled seeds are small by construction (the web-scale input is the
  UNLABELED corpus being scored); at 10^12 rows one trains on the seed
  sample and runs the single scoring pass over everything — both paths
  are this code.
* Scoring is a broadcast-weights map: zero shuffle.

Deterministic: crc32 features, fixed init, block-order partial merge.
"""

from __future__ import annotations

import zlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

from .text_analysis import _TOKEN_RE

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant (public)


def _doc_features(text: str, mask: int) -> np.ndarray:
    """UNIQUE hashed unigram+bigram feature ids for one document.

    Presence (binary) features rather than mean-pooled counts: a
    presence rule ("contains token X") is then exactly linearly
    separable — mean pooling would scale the discriminative weight by
    1/n_tokens and make the margin length-dependent."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, np.int64)
    uni = np.array([zlib.crc32(t.encode("utf-8")) for t in toks], np.uint64)
    if len(uni) > 1:
        big = (uni[:-1] * _MIX) ^ uni[1:]
        ids = np.concatenate([uni, big])
    else:
        ids = uni
    return np.unique((ids & np.uint64(mask)).astype(np.int64))


def _batch_csr(texts, mask: int):
    """Batch of texts -> (rows, cols, vals) binary-presence sparse
    matrix (vals all 1.0)."""
    rows_l, cols_l = [], []
    for i, t in enumerate(texts):
        ids = _doc_features(t if isinstance(t, str) else "", mask)
        if len(ids) == 0:
            continue
        rows_l.append(np.full(len(ids), i, np.int64))
        cols_l.append(ids)
    if not rows_l:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.float64)
    rows = np.concatenate(rows_l)
    return rows, np.concatenate(cols_l), np.ones(len(rows), np.float64)


def train_quality_classifier(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 1 << 18,
    epochs: int = 30,
    lr: float = 0.5,
    l2: float = 1e-6,
    l1: float = 0.0,
    balanced: bool = True,
    collect_max_docs: int = 200_000,
) -> dict:
    """Fit the hashed-ngram logistic regression on a labeled Dataset
    (``label_col``: 0/1).  Driver update is Adagrad over the exact
    full-batch gradient — sparse presence features are badly scaled for
    a constant step, and the per-feature accumulator fixes that while
    keeping the partition-independence of full-batch training (the
    accumulator is a deterministic function of the per-epoch
    gradients).  ``balanced`` weights each class by n/(2*n_class) — web
    quality seeds are routinely skewed, and without it the background
    vocabulary absorbs the majority prior.

    Labeled seeds up to ``collect_max_docs`` take the SMALL-SEED path:
    featurize in ONE distributed pass, collect the sparse (doc, feature)
    id matrix (KBs/doc) and run the epochs driver-local.  This is the
    honest scale shape for quality classifiers: the seed is small by
    construction (the 100-TB input is the UNLABELED corpus being scored,
    and scoring is the distributed pass) — paying a full Ray job per
    epoch on a 400-doc seed is scheduler overhead, not distributed
    compute.  Above the threshold the per-epoch distributed loop runs
    (sparse gradient partials -> driver merge, the kmeans_fit pattern).
    Both paths compute the SAME exact full-batch gradient, so the
    learned model is identical up to float association and
    partition-independent either way.

    Returns a model dict for :func:`score_quality_classifier` —
    {"w": float32 bytes, "bias": float, "dim": int, "loss": final
    weighted mean log-loss}."""
    import ray

    if dim & (dim - 1):
        raise ValueError(f"dim must be a power of two, got {dim}")
    mask = dim - 1
    w = np.zeros(dim, np.float64)
    bias = 0.0
    loss = float("nan")
    acc_g = np.zeros(dim, np.float64)  # Adagrad accumulators (driver-side,
    acc_b = 0.0                        # ~2 MB at dim 2^18 — bounded)

    if balanced:
        # one cheap pre-pass for class counts (sum + count aggregates)
        n_all = ds.count()
        n_pos = float(ds.sum(label_col))
        n_neg = float(n_all) - n_pos
        if n_pos == 0 or n_neg == 0:
            raise ValueError(
                "train_quality_classifier: need both classes present")
        sw = (float(n_all) / (2.0 * n_neg), float(n_all) / (2.0 * n_pos))
    else:
        n_all = ds.count()
        sw = (1.0, 1.0)

    if n_all <= collect_max_docs:
        return _train_collected(
            ds, text_col, label_col, dim, mask, epochs, lr, l2, l1, sw)

    for _ in range(epochs):
        ref = ray.put((w, bias))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            ww, bb = ray.get(ref)
            rows, cols, vals = _batch_csr(df[text_col].tolist(), mask)
            y = df[label_col].to_numpy(np.float64)
            z = np.bincount(rows, weights=vals * ww[cols],
                            minlength=len(df)) + bb
            p = 1.0 / (1.0 + np.exp(-z))
            smp = np.where(y > 0.5, sw[1], sw[0])
            err = (p - y) * smp
            # sparse gradient: only features observed in this batch
            g = np.bincount(cols, weights=err[rows] * vals, minlength=dim)
            nz = np.flatnonzero(g)
            eps = 1e-12
            ll = -(smp * (y * np.log(p + eps)
                          + (1 - y) * np.log(1 - p + eps))).sum()
            return pd.DataFrame({
                "idx": [nz.astype(np.int64).tobytes()],
                "val": [g[nz].tobytes()],
                "gb": [float(err.sum())],
                "loss": [float(ll)],
                "n": [len(df)],
            })

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        grad = np.zeros(dim, np.float64)
        for ib, vb in zip(parts["idx"], parts["val"]):
            idx = np.frombuffer(ib, np.int64)
            grad[idx] += np.frombuffer(vb, np.float64)
        n = int(parts["n"].sum())
        if n == 0:
            raise ValueError("train_quality_classifier: empty dataset")
        g = grad / n + l2 * w
        gb = float(parts["gb"].sum()) / n
        acc_g += g * g
        acc_b += gb * gb
        step = lr / np.sqrt(acc_g + 1e-10)
        w -= step * g
        if l1 > 0.0:
            # proximal (ISTA) step: soft-threshold by the per-feature
            # step size — sparsifies background vocabulary, keeping only
            # features that genuinely predict the label
            w = np.sign(w) * np.maximum(np.abs(w) - step * l1, 0.0)
        bias -= lr * gb / np.sqrt(acc_b + 1e-10)
        loss = float(parts["loss"].sum()) / n

    return {"w": w.astype(np.float32).tobytes(), "bias": float(bias),
            "dim": dim, "loss": loss}


def _train_collected(ds, text_col, label_col, dim, mask, epochs, lr, l2,
                     l1, sw) -> dict:
    """Small-seed path: one distributed featurization pass, then exact
    full-batch epochs on the driver (same gradient as the distributed
    loop; see train_quality_classifier's docstring)."""
    def feat(df: pd.DataFrame) -> pd.DataFrame:
        ids = [
            _doc_features(t if isinstance(t, str) else "", mask).tobytes()
            for t in df[text_col]
        ]
        return pd.DataFrame({
            "ids": pd.Series(ids, dtype="object"),
            "y": df[label_col].to_numpy(np.float64),
        })

    coll = ds.map_batches(feat, batch_format="pandas").to_pandas()
    y = coll["y"].to_numpy(np.float64)
    cols_l = [np.frombuffer(b, np.int64) for b in coll["ids"]]
    lens = np.array([len(c) for c in cols_l], np.int64)
    rows = np.repeat(np.arange(len(y), dtype=np.int64), lens)
    cols = (np.concatenate(cols_l) if cols_l
            else np.empty(0, np.int64))
    smp = np.where(y > 0.5, sw[1], sw[0])
    n = len(y)
    if n == 0:
        raise ValueError("train_quality_classifier: empty dataset")

    w = np.zeros(dim, np.float64)
    bias = 0.0
    acc_g = np.zeros(dim, np.float64)
    acc_b = 0.0
    loss = float("nan")
    eps = 1e-12
    for _ in range(epochs):
        z = np.bincount(rows, weights=w[cols], minlength=n) + bias
        p = 1.0 / (1.0 + np.exp(-z))
        err = (p - y) * smp
        g = np.bincount(cols, weights=err[rows], minlength=dim) / n + l2 * w
        gb = float(err.sum()) / n
        acc_g += g * g
        acc_b += gb * gb
        step = lr / np.sqrt(acc_g + 1e-10)
        w -= step * g
        if l1 > 0.0:
            w = np.sign(w) * np.maximum(np.abs(w) - step * l1, 0.0)
        bias -= lr * gb / np.sqrt(acc_b + 1e-10)
        loss = float(-(smp * (y * np.log(p + eps)
                              + (1 - y) * np.log(1 - p + eps))).sum()) / n
    return {"w": w.astype(np.float32).tobytes(), "bias": float(bias),
            "dim": dim, "loss": loss}


def score_quality_classifier(
    ds: "ray.data.Dataset",
    model: dict,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> "ray.data.Dataset":
    """Append P(label=1) per row — pure map against broadcast weights."""
    import ray

    dim = int(model["dim"])
    mask = dim - 1
    ref = ray.put((np.frombuffer(model["w"], np.float32).astype(np.float64),
                   float(model["bias"])))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ww, bb = ray.get(ref)
        rows, cols, vals = _batch_csr(df[text_col].tolist(), mask)
        z = np.bincount(rows, weights=vals * ww[cols],
                        minlength=len(df)) + bb
        out = df.copy()
        out[out_col] = 1.0 / (1.0 + np.exp(-z))
        return out

    return ds.map_batches(score, batch_format="pandas")


def classifier_filter(
    ds: "ray.data.Dataset",
    model: dict,
    threshold: float = 0.5,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Keep rows the classifier scores above ``threshold`` (the CCNet
    "keep head/middle" step, threshold standing in for the perplexity
    buckets)."""
    scored = score_quality_classifier(ds, model, text_col=text_col)
    return scored.map_batches(
        lambda df: df[df["quality_prob"] >= threshold],
        batch_format="pandas",
    )
