"""Trained hashed-ngram quality classifier (ops/text_classifier.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf2pdfocr_ray.ops.text_classifier import (
    classifier_filter,
    score_quality_classifier,
    train_quality_classifier,
)

GOOD = ["analysis", "report", "method", "theory", "result", "study",
        "curated", "formal", "journal", "peer"]
BAD = ["click", "buy", "free", "winner", "casino", "pills", "offer",
       "cheap", "deal", "spam"]


def _corpus(n, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        vocab = GOOD if good else BAD
        text = " ".join(rng.choice(vocab, size=int(rng.integers(20, 60))))
        rows.append({"id": i, "text": text, "label": 1 if good else 0})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def model_and_data(ray_session):
    import ray.data

    train = _corpus(400, 4)
    ds = ray.data.from_pandas(train)
    model = train_quality_classifier(ds, dim=1 << 16, epochs=20)
    return model, ds, train


def test_classifier_separates_planted_vocabularies(model_and_data, ray_session):
    import ray.data

    model, ds, _ = model_and_data
    held = _corpus(200, 99)  # fresh draws, same generating process
    scored = score_quality_classifier(
        ray.data.from_pandas(held), model).to_pandas()
    acc = ((scored["quality_prob"] >= 0.5).astype(int)
           == scored["label"]).mean()
    assert acc >= 0.95, acc


def test_classifier_partition_independent(model_and_data, ray_session):
    """Full-batch GD: block boundaries cannot change the learned weights
    (driver merges sparse partials index-wise; weights match to the
    byte, bias to float tolerance)."""
    import ray.data

    model, _, train = model_and_data
    ds13 = ray.data.from_pandas(train).repartition(13)
    m2 = train_quality_classifier(ds13, dim=1 << 16, epochs=20)
    assert m2["w"] == model["w"]
    assert abs(m2["bias"] - model["bias"]) < 1e-9


def test_classifier_filter_keeps_positives(model_and_data, ray_session):
    import ray.data

    model, _, _ = model_and_data
    held = _corpus(200, 7)
    kept = classifier_filter(
        ray.data.from_pandas(held), model, threshold=0.5).to_pandas()
    assert set(kept["label"].unique()) == {1}
    assert len(kept) == 100


def test_classifier_rejects_bad_dim(ray_session):
    import ray.data

    with pytest.raises(ValueError, match="power of two"):
        train_quality_classifier(
            ray.data.from_pandas(_corpus(10, 0)), dim=1000)


def test_classifier_empty_text_rows_score_at_bias(model_and_data, ray_session):
    import ray.data

    model, _, _ = model_and_data
    df = pd.DataFrame({"id": [0], "text": [""], "label": [0]})
    scored = score_quality_classifier(
        ray.data.from_pandas(df), model).to_pandas()
    expect = 1.0 / (1.0 + np.exp(-model["bias"]))
    assert abs(scored["quality_prob"].iloc[0] - expect) < 1e-12


def test_distributed_and_collected_paths_agree(ray_session):
    """collect_max_docs=0 forces the per-epoch distributed loop; both
    paths compute the same exact full-batch gradient, so the models must
    match to float tolerance (identical feature sets -> near-identical
    weights and identical predictions)."""
    import ray.data

    train = _corpus(120, 21)
    ds = ray.data.from_pandas(train)
    m_small = train_quality_classifier(ds, dim=1 << 14, epochs=8)
    m_dist = train_quality_classifier(
        ds, dim=1 << 14, epochs=8, collect_max_docs=0)
    w1 = np.frombuffer(m_small["w"], np.float32)
    w2 = np.frombuffer(m_dist["w"], np.float32)
    assert np.allclose(w1, w2, atol=1e-5)
    assert abs(m_small["bias"] - m_dist["bias"]) < 1e-6
    s1 = score_quality_classifier(ds, m_small).to_pandas()["quality_prob"]
    s2 = score_quality_classifier(ds, m_dist).to_pandas()["quality_prob"]
    assert np.allclose(s1, s2, atol=1e-5)


def test_l1_sparsifies_background_vocabulary(ray_session):
    """With L1, weights for non-discriminative features go to exactly
    zero while the model still separates the classes."""
    import ray.data

    train = _corpus(300, 33)
    ds = ray.data.from_pandas(train)
    model = train_quality_classifier(ds, dim=1 << 16, epochs=25, l1=3e-3)
    w = np.frombuffer(model["w"], np.float32)
    nnz = int((w != 0).sum())
    assert 0 < nnz < 2000, nnz  # overwhelmingly sparse vs 65536 buckets
    held = _corpus(100, 55)
    scored = score_quality_classifier(
        ray.data.from_pandas(held), model).to_pandas()
    acc = ((scored["quality_prob"] >= 0.5).astype(int)
           == scored["label"]).mean()
    assert acc >= 0.95, acc


def test_balanced_training_on_skewed_labels(ray_session):
    """9:1 skew: balanced class weights keep the minority class
    recallable."""
    import ray.data

    rng = np.random.default_rng(8)
    rows = []
    for i in range(400):
        good = i % 10 == 0  # 10% positives
        vocab = GOOD if good else BAD
        rows.append({
            "id": i,
            "text": " ".join(rng.choice(vocab, size=int(rng.integers(20, 60)))),
            "label": 1 if good else 0,
        })
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    model = train_quality_classifier(ds, dim=1 << 16, epochs=20)
    scored = score_quality_classifier(ds, model).to_pandas()
    pos = scored[scored["label"] == 1]
    recall = ((pos["quality_prob"] >= 0.5).astype(int) == 1).mean()
    assert recall >= 0.95, recall
