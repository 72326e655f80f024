"""Distributed Lloyd k-means over an embedding column — the clustering
toolkit's kmeans (toolkits/clustering/kmeans.cpp) re-expressed Ray-Data-first,
and the centroid stage of spectral partitioning (partitioning.cpp:60-115:
laplacian → svd → kmeans).

Physical plan per iteration: broadcast the (k, d) centroid matrix once
(``ray.put``), one ``map_batches`` pass computes per-batch partial sums and
counts per cluster (a (k, d+1) matrix — tiny), the driver merges partials in
sorted batch-key order (deterministic float order) and updates centroids.
Assignment is a vectorized argmin over squared distances
(‖x‖² − 2x·C + ‖C‖², ties → lowest cluster index). No per-row Python; the
shuffle-free partial/final split is the same pattern as the degree tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _to_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    col = t[vec_col].combine_chunks()
    return np.stack([np.asarray(v, np.float64) for v in col.to_pylist()])


def nearest_cell(x: np.ndarray, C: np.ndarray):
    """Vectorized nearest-centroid assignment → (cluster idx, sq-distance).
    THE kmeans assignment rule (argmin over ‖x−c‖², ties → lowest cluster
    index) — shared by the iteration pass, the final assignment pass, and
    the IVF index/probe paths (stages/ann.py), which recompute cells per
    batch from the broadcast (k, d) centroids instead of shipping any O(N)
    (vec_id → cell) lookup table."""
    d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ C.T) + (C * C).sum(1)[None, :]
    a = np.argmin(d2, axis=1)
    return a, np.maximum(d2[np.arange(len(a)), a], 0.0)


def kmeans(emb_ds, k: int = 8, iterations: int = 10,
           id_col: str = "vec_id", vec_col: str = "embedding"):
    """→ (centroids (k,d), assignment ``ray.data.Dataset`` (id, cluster),
    inertia float).

    Deterministic: init = the k rows with the smallest ids; partial merge in
    sorted batch-key order; argmin ties go to the lowest cluster index.

    The assignment comes back as a *Dataset* (object-store blocks, spillable)
    — nothing O(N) ever lands on the driver: the iteration traffic is one
    (k, d+1) partial matrix per batch, and inertia is a distributed scalar
    sum over the assignment blocks."""
    # materialize once: the iteration loop re-reads the SAME plasma blocks.
    # Iterations run as raw tasks over the materialized block refs — a
    # map_batches per iteration would rebuild the streaming topology each
    # round (~0.4 s/round of pure scheduling at any scale), which is the
    # one loop shape the Dataset API can't express cheaply (same reason the
    # GAS engine supersteps are raw tasks). Per-task traffic is one (k, d+1)
    # partial matrix; blocks never move.
    emb_ds = emb_ds.materialize()
    refs = emb_ds.to_arrow_refs()

    @ray.remote(num_cpus=1)
    def seed_part(t: pa.Table):
        if len(t) == 0:
            return np.empty(0, np.int64), np.empty((0, 0), np.float64)
        ids = np.asarray(t[id_col], np.int64)
        order = np.argsort(ids, kind="stable")[:k]
        return ids[order], _to_matrix(t, vec_col)[order]

    @ray.remote(num_cpus=1)
    def partial(t: pa.Table, C: np.ndarray):
        if len(t) == 0:
            d = C.shape[1]
            return (np.iinfo(np.int64).max, np.zeros((k, d), np.float64),
                    np.zeros(k, np.int64))
        x = _to_matrix(t, vec_col)
        assign, _ = nearest_cell(x, C)
        sums = np.zeros((k, x.shape[1]), np.float64)
        np.add.at(sums, assign, x)
        cnt = np.bincount(assign, minlength=k).astype(np.int64)
        return int(np.min(np.asarray(t[id_col], np.int64))), sums, cnt

    # deterministic init: k smallest-id rows via per-block partial top-k
    # (no full sort shuffle — blocks are scanned once, k rows per block
    # return to the driver)
    seeds = ray.get([seed_part.remote(r) for r in refs])
    sids = np.concatenate([s[0] for s in seeds if len(s[0])])
    svecs = np.concatenate([s[1] for s in seeds if len(s[0])])
    order = np.argsort(sids, kind="stable")[:k]
    cents = svecs[order].astype(np.float64).copy()

    for _ in range(iterations):
        cref = ray.put(cents)
        parts = ray.get([partial.remote(r, cref) for r in refs])
        parts.sort(key=lambda p: p[0])  # deterministic float merge order
        d = cents.shape[1]
        sums = np.zeros((k, d), np.float64)
        cnts = np.zeros(k, np.int64)
        for _, s, c in parts:
            sums += s
            cnts += c
        nonempty = cnts > 0
        cents = np.where(nonempty[:, None], sums / np.maximum(cnts, 1)[:, None], cents)

    # final assignment + inertia — streamed: the per-row assignment stays in
    # object-store blocks (spillable), inertia is a distributed scalar sum
    cref = ray.put(cents)

    def assign_fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                id_col: t[id_col],
                "cluster": pa.array([], pa.int64()),
                "sqdist": pa.array([], pa.float64()),
            })
        C = ray.get(cref)
        x = _to_matrix(t, vec_col)
        a, sq = nearest_cell(x, C)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "sqdist": pa.array(sq),
        })

    out = emb_ds.map_batches(assign_fn, batch_format="pyarrow").materialize()
    inertia = float(out.sum("sqdist") or 0.0)
    return cents, out.select_columns([id_col, "cluster"]), inertia


def kmeans_oracle(x: np.ndarray, ids: np.ndarray, k: int, iterations: int):
    """Sequential reference implementation (same init/tie rules) for tests."""
    order = np.argsort(ids, kind="stable")[:k]
    cents = x[order].astype(np.float64).copy()
    for _ in range(iterations):
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = x[a == c].mean(axis=0)
    d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
    a = np.argmin(d2, axis=1)
    inertia = float(np.maximum(d2[np.arange(len(a)), a], 0.0).sum())
    return cents, a, inertia
