"""Spectral toolkit re-expressed on Ray Data.

- :func:`normalized_laplacian` — graph_laplacian.cpp: per-vertex degree →
  ``1/sqrt(deg)`` (graph_laplacian.cpp:122), edge weight scaled by
  ``d1 * d2`` (:127-130), emitted as COO triplet text for an external SVD
  (:185-224). Here: the symmetric normalized Laplacian
  ``L = I - D^{-1/2} A D^{-1/2}`` of the undirected simple graph as an
  ``(i, j, lap)`` Dataset (diag +1, off-diag −1/√(dᵢdⱼ), both directions).
- :func:`normalize_rows` — eigen_vector_normalization.cpp: row-normalize an
  eigenvector/embedding matrix (each data row scaled to unit L2 norm, the
  ratio-cut normalization step) as a vectorized ``map_batches`` stage.
- :func:`total_subgraph_centrality` — TSC.cpp:22-44: TSC = exp(A)·b via a
  Krylov subspace: distributed mat-vecs (the ``arnoldi_map/combine``
  neighborhood map-reduce, TSC.cpp:121-133) build an orthonormal basis V and
  a small tridiagonal H on the driver; TSC ≈ ||b|| · (V · exp(H))[:, 0],
  stopping when the per-vertex relative change stabilizes (TSC.cpp:199,295).

Scale notes: the Laplacian emit is two streaming passes (degree groupby +
edge map with a broadcast inv-sqrt-degree lookup); each Lanczos step is one
superstep over the resident edge partitions — O(m) supersteps total, driver
memory O(m · nv) for the basis (m ≤ 50), which is the same vertex-state
regime as the other dense-state algorithms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .gas import Graph, VertexProgram
from ..ids import round_half_away


# ---------------------------------------------------------------------------
# normalized Laplacian (graph_laplacian.cpp)
# ---------------------------------------------------------------------------

def normalized_laplacian(edges_ds):
    """Edge Dataset (src,dst int64) → COO Dataset ``(i, j, lap:double)`` of
    the symmetric normalized Laplacian of the canonical undirected simple
    graph (self-edges dropped, duplicate pairs collapsed). ``lap`` rounded to
    6 decimals (the text-emit precision contract of the writers)."""
    from .triangles import _canonical_dedup, _is_uint64
    from ..stages.degrees import degree_table

    as_u64 = _is_uint64(edges_ds)
    # materialized: canon feeds the degree table AND the off-diag emit, degs
    # feeds the broadcast lookup AND the diag emit — without this the dedup
    # shuffle would re-run for every consumer of the lazy union
    # (uint64 ids ride as int64 bit-casts through the shuffles; restored at
    # the final emit)
    canon = _canonical_dedup(edges_ds, as_uint64=as_u64).materialize()

    und = canon.map_batches(
        lambda t: pa.table({"src": t["a"], "dst": t["b"]}),
        batch_format="pyarrow")
    degs = degree_table(und).materialize()  # canonical pairs: undirected degree

    # vertex-state-sized inv-sqrt-degree lookup, broadcast once (ray.put) —
    # the role of the per-vertex `degree = 1/sqrt(total)` vertex data
    dt = degs.select_columns(["vid", "deg"]).to_pandas()
    vids = dt["vid"].to_numpy()
    order = np.argsort(vids)
    vids = vids[order]
    isq = 1.0 / np.sqrt(dt["deg"].to_numpy(np.float64)[order])
    lookup_ref = ray.put((vids, isq))

    def offdiag(t: pa.Table) -> pa.Table:
        lv, li = ray.get(lookup_ref)
        a = np.asarray(t["a"])  # dtype-preserving (uint64 hashed ids)
        b = np.asarray(t["b"])
        w = round_half_away(-li[np.searchsorted(lv, a)] * li[np.searchsorted(lv, b)], 6)
        return pa.table({
            "i": pa.array(np.concatenate([a, b])),
            "j": pa.array(np.concatenate([b, a])),
            "lap": pa.array(np.concatenate([w, w])),
        })

    def diag(t: pa.Table) -> pa.Table:
        v = np.asarray(t["vid"])
        return pa.table({"i": pa.array(v), "j": pa.array(v),
                         "lap": pa.array(np.ones(len(v), np.float64))})

    out = canon.map_batches(offdiag, batch_format="pyarrow").union(
        degs.map_batches(diag, batch_format="pyarrow"))
    if as_u64:
        out = out.map_batches(
            lambda t: pa.table({
                "i": pa.array(np.asarray(t["i"], np.int64).view(np.uint64), pa.uint64()),
                "j": pa.array(np.asarray(t["j"], np.int64).view(np.uint64), pa.uint64()),
                "lap": t["lap"]}),
            batch_format="pyarrow")
    return out


# ---------------------------------------------------------------------------
# row normalization (eigen_vector_normalization.cpp)
# ---------------------------------------------------------------------------

def normalize_rows(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Unit-L2-normalize each row vector; → unnested ``(id, i, val)`` rows
    (1-based component index, value rounded to 6 decimals). The sum of
    squares is accumulated sequentially over components in float64 so the
    result is bit-comparable with a sequential SQL ``list_sum``."""

    def norm(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col])
        col = t[vec_col].combine_chunks()
        x = np.stack([np.asarray(v, np.float64) for v in col.to_pylist()])
        s = np.zeros(len(x), np.float64)
        for k in range(x.shape[1]):  # fixed left-to-right summation order
            s += x[:, k] * x[:, k]
        val = round_half_away(x / np.sqrt(s)[:, None], 6)
        n, d = x.shape
        return pa.table({
            id_col: pa.array(np.repeat(ids, d)),
            "i": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "val": pa.array(val.ravel()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# total subgraph centrality (TSC.cpp)
# ---------------------------------------------------------------------------

class _MatVecVP(VertexProgram):
    """One symmetric adjacency mat-vec as a partition kernel: the
    ``arnoldi_map`` edge map + ``arnoldi_combine`` sum (TSC.cpp:121-133) —
    y[v] = Σ_{u~v} x[u] over ALL edges, pre-reduced per partition."""

    name = "matvec"
    broadcast_keys = ("x",)

    def partial(self, src, dst, nv, iteration, x):
        # empty partitions: bincount with no weights yields int64 — force
        # the monoid dtype so merge never casts
        y = np.bincount(dst, weights=x[src], minlength=nv).astype(np.float64, copy=False)
        y += np.bincount(src, weights=x[dst], minlength=nv)
        return y

    @staticmethod
    def merge(a, b):
        return a + b


def adjacency_matvec(g: Graph, x: np.ndarray) -> np.ndarray:
    """Distributed y = A·x (undirected symmetric adjacency) — one superstep
    over the resident edge partitions, merged in fixed partition order."""
    vp = _MatVecVP()
    xref = ray.put(x)
    partials = ray.get([a.superstep.remote(vp, 0, xref) for a in g.pool()])
    y = partials[0].copy() if partials else np.zeros(g.nv)
    for p in partials[1:]:
        y += p
    return y


def total_subgraph_centrality(g: Graph, b: np.ndarray | None = None,
                              max_m: int = 50, tol: float = 1e-9):
    """TSC = exp(A)·b (b = ones → row sums of exp(A), TSC.cpp:22-27; pass a
    basis vector e_j for the ``--column`` mode, :228).

    Lanczos (A symmetric) with full reorthogonalization: m distributed
    mat-vecs; exp of the small tridiagonal H via its eigendecomposition (the
    "small and dense" exponential of TSC.cpp:44); stop when the per-vertex
    relative change of the estimate stabilizes (TSC.cpp:199).
    → (tsc array aligned with g.vids, iterations used)
    """
    nv = g.nv
    if b is None:
        b = np.ones(nv, np.float64)
    beta0 = float(np.linalg.norm(b))
    if beta0 == 0.0:
        return np.zeros(nv), 0
    Q = [b / beta0]
    alphas: list[float] = []
    betas: list[float] = []
    prev = None
    used = 0
    for j in range(max_m):
        w = adjacency_matvec(g, Q[j])
        a_j = float(Q[j] @ w)
        alphas.append(a_j)
        w = w - a_j * Q[j] - (betas[-1] * Q[j - 1] if j > 0 else 0.0)
        for q in Q:  # full reorthogonalization (numerical stability)
            w -= (q @ w) * q
        used = j + 1
        # current estimate: beta0 * Q_m exp(T_m) e_1
        T = np.diag(alphas)
        if betas:
            T += np.diag(betas, 1) + np.diag(betas, -1)
        lam, U = np.linalg.eigh(T)
        coeff = U @ (np.exp(lam) * U[0, :])
        est = beta0 * (np.column_stack(Q) @ coeff)
        if prev is not None:
            denom = 1e-15 + np.abs(est)
            if float(np.max(np.abs(est - prev) / denom)) < tol:
                break
        prev = est
        beta_j = float(np.linalg.norm(w))
        if beta_j < 1e-12:  # invariant subspace: exact
            break
        betas.append(beta_j)
        Q.append(w / beta_j)
    return est, used


# ---------------------------------------------------------------------------
# spectral partitioning (partitioning.cpp: laplacian → svd → kmeans)
# ---------------------------------------------------------------------------

def spectral_partition(g: Graph, k: int, m: int | None = None,
                       kmeans_iters: int = 20):
    """The partitioning.cpp pipeline (its main orchestrates
    ``call_graph_laplacian`` → ``call_svd`` → ``call_eigen_vector_normalization``
    → ``call_kmeans``, partitioning.cpp:60-115) as one in-engine flow:

    1. smallest-k eigenvectors of the symmetric normalized Laplacian, found
       as the LARGEST-k Ritz pairs of ``M = 2I − L = I + D^{-1/2} A D^{-1/2}``
       via Lanczos on distributed mat-vecs (the SVD step's role);
    2. row-normalize the spectral embedding (eigen_vector_normalization.cpp);
    3. driver-side Lloyd k-means on the (nv, k) embedding (the clustering
       toolkit kmeans — nv×k is vertex-state-sized, the same regime as every
       dense per-vertex state here).

    → (labels int64 aligned with g.vids, embedding (nv, k)). Deterministic.
    """
    nv = g.nv
    m = m or max(4 * k + 10, 30)
    deg = (g.out_deg + g.in_deg).astype(np.float64)
    isq = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1)), 0.0)

    def M_matvec(x: np.ndarray) -> np.ndarray:
        return x + isq * adjacency_matvec(g, isq * x)

    # Lanczos with full reorthogonalization, deterministic start vector
    q = np.cos(np.arange(nv, dtype=np.float64))  # seedless, reproducible
    q /= np.linalg.norm(q)
    Q = [q]
    alphas: list[float] = []
    betas: list[float] = []
    for j in range(min(m, nv)):
        w = M_matvec(Q[j])
        a_j = float(Q[j] @ w)
        alphas.append(a_j)
        w = w - a_j * Q[j] - (betas[-1] * Q[j - 1] if j > 0 else 0.0)
        for qv in Q:
            w -= (qv @ w) * qv
        beta_j = float(np.linalg.norm(w))
        if beta_j < 1e-12:
            break
        if j < min(m, nv) - 1:
            betas.append(beta_j)
            Q.append(w / beta_j)
    T = np.diag(alphas)
    if betas:
        T += np.diag(betas, 1) + np.diag(betas, -1)
    lam, U = np.linalg.eigh(T)
    topk = np.argsort(lam)[::-1][:k]          # largest of M = smallest of L
    emb = np.column_stack(Q) @ U[:, topk]     # (nv, k) Ritz vectors
    # row-normalize (ratio-cut normalization); zero rows left at zero
    nrm = np.linalg.norm(emb, axis=1)
    emb = np.where(nrm[:, None] > 0, emb / np.maximum(nrm, 1e-300)[:, None], 0.0)

    from ..stages.kmeans import kmeans_oracle

    _, labels, _ = kmeans_oracle(emb, np.arange(nv, dtype=np.int64), k, kmeans_iters)
    return labels.astype(np.int64), emb


# ---------------------------------------------------------------------------
# spectral node embeddings (adjacency eigenvectors → similarity stack)
# ---------------------------------------------------------------------------

def spectral_embedding(g: Graph, k: int, m: int | None = None):
    """Largest-k eigenvectors of the symmetric undirected adjacency as an
    (nv, k) node embedding (classic spectral / HOPE-style embedding — the
    deterministic, SGD-free counterpart of DeepWalk vectors): Lanczos with
    full reorthogonalization on the SAME distributed mat-vecs as TSC /
    spectral_partition, deterministic seedless start vector. Column signs
    are canonicalized (largest-|entry| component made positive, ties →
    lowest dense index) so reruns and test oracles are comparable.

    → (emb (nv, k) float64 aligned with g.vids, eigenvalues desc). Feed
    through :func:`embedding_dataset` into stages/ann.knn_graph /
    semantic_clusters for the graph → embedding → similarity bridge."""
    nv = g.nv
    m = m or max(4 * k + 10, 30)
    q = np.cos(np.arange(nv, dtype=np.float64))
    q /= np.linalg.norm(q)
    Q = [q]
    alphas: list[float] = []
    betas: list[float] = []
    for j in range(min(m, nv)):
        w = adjacency_matvec(g, Q[j])
        a_j = float(Q[j] @ w)
        alphas.append(a_j)
        w = w - a_j * Q[j] - (betas[-1] * Q[j - 1] if j > 0 else 0.0)
        for qv in Q:
            w -= (qv @ w) * qv
        beta_j = float(np.linalg.norm(w))
        if beta_j < 1e-12:
            break
        if j < min(m, nv) - 1:
            betas.append(beta_j)
            Q.append(w / beta_j)
    T = np.diag(alphas)
    if betas:
        T += np.diag(betas, 1) + np.diag(betas, -1)
    lam, U = np.linalg.eigh(T)
    order = np.argsort(lam)[::-1][:k]
    emb = np.column_stack(Q) @ U[:, order]
    for c in range(emb.shape[1]):  # deterministic sign
        i = int(np.argmax(np.abs(emb[:, c])))
        if emb[i, c] < 0:
            emb[:, c] = -emb[:, c]
    return emb, lam[order]


def embedding_dataset(g: Graph, emb: np.ndarray):
    """(nv, k) embedding → Dataset (vec_id int64 = global vid, embedding
    list<double>) — the schema stages/ann (knn_graph, ann_topk,
    semantic_clusters) and stages/kmeans consume."""
    import ray.data

    vids = np.asarray(g.vids, np.uint64).view(np.int64)
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(vids),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    }))
