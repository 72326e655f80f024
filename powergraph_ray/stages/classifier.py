"""Model-based quality scoring: distributed logistic regression.

The standard pretraining-corpus quality filter (GPT-3 / CCNet style) is a
small linear classifier over cheap document features, trained on weak
labels and applied corpus-wide. Heuristic features already exist
(stages/text.DocProfile); this module adds the TRAINED step with the same
scale shape as the reference's linear-solver toolkits: the model is tiny,
the data is huge, so each Newton/IRLS iteration is ONE streaming pass that
reduces per-block sufficient statistics (gradient d-vector + Hessian d×d)
— never the rows.

Scale shape per iteration: map_batches emits one (d + d²)-float row per
block; the driver reduces them with ``math.fsum`` (exact, order-insensitive
— re-running the same block split is bit-identical regardless of block
arrival order) and takes a Newton step. Driver state is O(d²), independent
of corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["logreg_train", "logreg_score", "quality_features",
           "train_quality_classifier"]


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _xmat(df: pd.DataFrame, feature_cols: list[str]) -> np.ndarray:
    X = np.column_stack([df[c].to_numpy(np.float64) for c in feature_cols])
    return np.column_stack([np.ones(len(df)), X])  # bias first


def logreg_train(ds, feature_cols, label_col: str, iters: int = 8,
                 l2: float = 1e-6) -> np.ndarray:
    """Newton/IRLS logistic regression → weight vector ``w`` of length
    ``1 + len(feature_cols)`` (bias first). ``ds`` streams once per
    iteration; only (d+d²)-float per-block partials move."""
    feature_cols = list(feature_cols)
    d = 1 + len(feature_cols)
    w = np.zeros(d)
    ds = ds.materialize()  # one read; iterations re-stream the blocks

    for _ in range(iters):
        w_now = w.copy()

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            X = _xmat(df, feature_cols)
            y = df[label_col].to_numpy(np.float64)
            p = _sigmoid(X @ w_now)
            g = X.T @ (p - y)
            s = np.maximum(p * (1.0 - p), 1e-12)
            H = (X * s[:, None]).T @ X
            row = np.concatenate([g, H.ravel()])
            return pd.DataFrame([row], columns=[f"v{i}" for i in range(d + d * d)])

        part = ds.map_batches(partials, batch_format="pandas").to_pandas()
        # exact order-insensitive reduction: fsum per component
        vec = np.array([math.fsum(part[f"v{i}"]) for i in range(d + d * d)])
        g = vec[:d] + l2 * w
        H = vec[d:].reshape(d, d) + l2 * np.eye(d)
        w = w - np.linalg.solve(H, g)
    return w


def logreg_score(ds, w: np.ndarray, feature_cols, out_col: str = "score",
                 keep_cols: tuple[str, ...] = ("doc_id",)):
    """→ Dataset(keep_cols + [out_col]): sigmoid(w·x) per row, one
    vectorized pass; ``w`` ships in the task closure (d+1 floats)."""
    feature_cols = list(feature_cols)
    w = np.asarray(w, np.float64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        out = {c: df[c].to_numpy() for c in keep_cols}
        out[out_col] = _sigmoid(_xmat(df, feature_cols) @ w)
        return pd.DataFrame(out)

    return ds.map_batches(score, batch_format="pandas")


QUALITY_FEATURES = ["n_tokens", "n_chars", "n_stopwords", "n_punct",
                    "stop_ratio"]


def quality_features(docs_ds):
    """documents → DocProfile feature table (the weak-label substrate)."""
    from .text import doc_profile

    return doc_profile(docs_ds)


def train_quality_classifier(docs_ds, label_fn, iters: int = 8,
                             l2: float = 1e-4):
    """End-to-end: profile features → per-batch weak labels (``label_fn``:
    DataFrame → 0/1 int array, e.g. a heuristic rule or a labeled join) →
    distributed IRLS. Returns ``(w, feature_cols)`` ready for
    ``logreg_score``."""
    feats = quality_features(docs_ds)

    def with_label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["label"] = np.asarray(label_fn(df), np.int64)
        return df

    labeled = feats.map_batches(with_label, batch_format="pandas")
    w = logreg_train(labeled, QUALITY_FEATURES, "label", iters=iters, l2=l2)
    return w, QUALITY_FEATURES
