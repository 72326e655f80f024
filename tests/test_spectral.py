"""Spectral toolkit vs dense numpy oracles (graph_laplacian.cpp,
eigen_vector_normalization.cpp, TSC.cpp semantics)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from powergraph_ray.graph.gas import build_graph_from_arrays
from powergraph_ray.graph.spectral import (
    adjacency_matvec,
    normalize_rows,
    normalized_laplacian,
    total_subgraph_centrality,
)


@pytest.fixture(scope="module")
def rand_edges():
    rng = np.random.default_rng(3)
    n, m = 120, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


def test_normalized_laplacian_exact(rand_edges):
    src, dst = rand_edges
    eds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    lap = normalized_laplacian(eds).to_pandas()
    pairs = {(min(s, d), max(s, d)) for s, d in zip(src, dst)}
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want = {}
    for a, b in pairs:
        w = round(-1.0 / np.sqrt(deg[a] * deg[b]), 6)
        want[(a, b)] = w
        want[(b, a)] = w
    for v in deg:
        want[(v, v)] = 1.0
    got = {(r.i, r.j): r.lap for r in lap.itertuples()}
    assert got == want


def test_normalize_rows_exact():
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[3.0, 4.0], [1.0, 1.0]], pa.list_(pa.float32())),
    }))
    nr = normalize_rows(emb).to_pandas().sort_values(["vec_id", "i"])
    r2 = round(1 / np.sqrt(2), 6)
    np.testing.assert_allclose(nr["val"].to_numpy(), [0.6, 0.8, r2, r2])


def test_tsc_matches_dense_expm(rand_edges):
    src, dst = rand_edges
    g = build_graph_from_arrays(src.astype(np.uint64), dst.astype(np.uint64), 4,
                                dedup=True)
    # oracle: exp(A_dir + A_dir^T)·1 by dense eigendecomposition
    dd = set(zip(src.tolist(), dst.tolist()))
    A = np.zeros((g.nv, g.nv))
    for a, b in dd:
        ia = int(np.searchsorted(g.vids, a))
        ib = int(np.searchsorted(g.vids, b))
        A[ia, ib] += 1.0
        A[ib, ia] += 1.0
    # matvec parity first (one superstep)
    x = np.arange(g.nv, dtype=np.float64)
    np.testing.assert_allclose(adjacency_matvec(g, x), A @ x, rtol=1e-12)
    lam, U = np.linalg.eigh(A)
    exact = U @ (np.exp(lam) * (U.T @ np.ones(g.nv)))
    tsc, iters = total_subgraph_centrality(g)
    assert iters < 40
    rel = np.max(np.abs(tsc - exact) / (1e-15 + np.abs(exact)))
    assert rel < 1e-8
    g.close()


def test_tsc_column_mode(rand_edges):
    """--column mode (TSC.cpp:228): b = e_j gives column j of exp(A)."""
    src, dst = rand_edges
    g = build_graph_from_arrays(src.astype(np.uint64), dst.astype(np.uint64), 4,
                                dedup=True)
    dd = set(zip(src.tolist(), dst.tolist()))
    A = np.zeros((g.nv, g.nv))
    for a, b in dd:
        ia = int(np.searchsorted(g.vids, a))
        ib = int(np.searchsorted(g.vids, b))
        A[ia, ib] += 1.0
        A[ib, ia] += 1.0
    lam, U = np.linalg.eigh(A)
    e0 = np.zeros(g.nv)
    e0[0] = 1.0
    exact = U @ (np.exp(lam) * (U.T @ e0))
    col, _ = total_subgraph_centrality(g, b=e0)
    assert np.max(np.abs(col - exact)) / np.max(np.abs(exact)) < 1e-8
    g.close()
