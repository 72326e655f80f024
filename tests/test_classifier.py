"""Distributed logistic-regression tests (stages/classifier.py): the IRLS
loop is checked against an independent single-machine numpy IRLS (same
iteration count → near-identical weights), plus recovery of a planted
linear rule, block-split invariance (exact fsum reduction), and the
end-to-end quality-classifier path over the driver-shaped corpus."""

import os

import numpy as np
import pandas as pd
import ray.data

from powergraph_ray.stages.classifier import (
    QUALITY_FEATURES,
    logreg_score,
    logreg_train,
    train_quality_classifier,
)

SF = "/root/testdata/sf0.001"


def oracle_irls(X, y, iters, l2):
    """Independent sequential IRLS on the dense matrix."""
    X = np.column_stack([np.ones(len(X)), X])
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) + l2 * w
        s = np.maximum(p * (1 - p), 1e-12)
        H = (X * s[:, None]).T @ X + l2 * np.eye(X.shape[1])
        w = w - np.linalg.solve(H, g)
    return w


def _synth(n=4000, seed=7):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 3)
    w_true = np.array([0.5, 2.0, -1.5, 0.7])  # bias first
    z = w_true[0] + X @ w_true[1:]
    y = (z + 0.5 * rng.randn(n) > 0).astype(np.int64)
    df = pd.DataFrame(X, columns=["f0", "f1", "f2"])
    df["label"] = y
    df["doc_id"] = np.arange(n)
    return df, w_true


def test_matches_sequential_irls():
    df, _ = _synth()
    ds = ray.data.from_pandas(df).repartition(7)
    w = logreg_train(ds, ["f0", "f1", "f2"], "label", iters=6, l2=1e-3)
    w_ref = oracle_irls(df[["f0", "f1", "f2"]].to_numpy(),
                        df["label"].to_numpy(np.float64), 6, 1e-3)
    assert np.allclose(w, w_ref, rtol=1e-8, atol=1e-10)


def test_recovers_planted_direction_and_classifies():
    df, w_true = _synth()
    ds = ray.data.from_pandas(df).repartition(5)
    w = logreg_train(ds, ["f0", "f1", "f2"], "label", iters=8, l2=1e-3)
    # direction of the planted rule is recovered
    cos = (w @ w_true) / (np.linalg.norm(w) * np.linalg.norm(w_true))
    assert cos > 0.99
    scored = logreg_score(ds, w, ["f0", "f1", "f2"], out_col="p").to_pandas()
    merged = scored.merge(df[["doc_id", "label"]], on="doc_id")
    acc = ((merged["p"] > 0.5).astype(int) == merged["label"]).mean()
    assert acc > 0.9


def test_block_order_invariance_and_split_stability():
    """The fsum reduction is order-insensitive → re-running the SAME split
    is bit-identical (no matter which block's partial lands first); a
    different split regroups the per-block BLAS row sums, so weights agree
    only to float precision."""
    df, _ = _synth(n=1500)
    ds = ray.data.from_pandas(df).repartition(13)
    args = (["f0", "f1", "f2"], "label")
    w_a = logreg_train(ds, *args, iters=5, l2=1e-3)
    w_rerun = logreg_train(ds, *args, iters=5, l2=1e-3)
    assert np.array_equal(w_a, w_rerun)
    w_b = logreg_train(ray.data.from_pandas(df).repartition(2),
                       *args, iters=5, l2=1e-3)
    assert np.allclose(w_a, w_b, rtol=1e-9, atol=1e-12)


def test_quality_classifier_end_to_end():
    docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                 columns=["doc_id", "text"])

    def weak_label(df):  # "long enough and stopword-bearing" rule
        return ((df["n_tokens"] >= df["n_tokens"].median())
                & (df["stop_ratio"] > 0)).astype(int)

    w, cols = train_quality_classifier(docs, weak_label, iters=6)
    assert cols == QUALITY_FEATURES and len(w) == len(cols) + 1
    from powergraph_ray.stages.classifier import quality_features

    scored = logreg_score(quality_features(docs), w, cols,
                          out_col="quality_prob").to_pandas()
    assert len(scored) == docs.count()
    assert scored["quality_prob"].between(0, 1).all()
    # the trained scores actually separate the weak-label classes
    feats = quality_features(docs).to_pandas()
    lab = weak_label(feats)
    m = scored.merge(pd.DataFrame({"doc_id": feats["doc_id"], "label": lab}),
                     on="doc_id")
    assert (m[m["label"] == 1]["quality_prob"].mean()
            > m[m["label"] == 0]["quality_prob"].mean() + 0.2)
