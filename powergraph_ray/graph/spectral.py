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
  neighborhood map-reduce, TSC.cpp:121-133) build an orthonormal basis and
  a small tridiagonal H; TSC ≈ ||b|| · (V · exp(H))[:, 0], stopping when
  the per-vertex relative change stabilizes (TSC.cpp:199,295).

Scale discipline (the same range-native contract as the GAS engine's
sharded path, applied to Krylov state):

- **No O(nv) array ever lives on the driver.** Every Krylov basis vector is
  held as R plasma range chunks aligned with :func:`~.gas.range_bounds`;
  the mat-vec runs as one superstep over the resident edge partitions
  (``superstep_sharded`` with a range-native ``partial_sharded`` kernel —
  per-actor transients are touched-ranges-sized, not O(nv)) reduced by
  per-range tasks co-hosted on the partition actors. Dot products,
  (re)orthogonalization, norms, and the convergence estimate are per-chunk
  tasks that return scalars / small (j+1)-vectors; the driver's working set
  is O(m² + R·m) refs for a Krylov depth m ≤ 50.
- **Gram-Schmidt is CGS2** (classical Gram-Schmidt, applied twice — "twice
  is enough", Giraud et al. 2005): two rounds of per-chunk dot-vectors +
  per-chunk axpy instead of the j sequential driver round-trips per step
  modified GS would need. With full reorthogonalization both variants keep
  the basis orthonormal to machine precision; all chunk reductions merge in
  fixed range order, so reruns are bit-identical.
- The degree scaling of :func:`normalized_laplacian` is a co-bucketed join
  (the stages/features.py discipline) — no O(nv) driver pull or broadcast
  of the degree table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .gas import Graph, VertexProgram, range_bounds
from ..ids import integer_mix, round_half_away


# ---------------------------------------------------------------------------
# normalized Laplacian (graph_laplacian.cpp)
# ---------------------------------------------------------------------------

def _bkt(ids: np.ndarray, n: int) -> np.ndarray:
    return (integer_mix(ids.astype(np.int64).view(np.uint64))
            % np.uint64(n)).astype(np.int64)


def normalized_laplacian(edges_ds, n_buckets: int = 32,
                         broadcast_max_verts: int = 2_000_000):
    """Edge Dataset (src,dst int64) → COO Dataset ``(i, j, lap:double)`` of
    the symmetric normalized Laplacian of the canonical undirected simple
    graph (self-edges dropped, duplicate pairs collapsed). ``lap`` rounded to
    6 decimals (the text-emit precision contract of the writers).

    The ``1/sqrt(deg)`` scaling is attached by two co-bucketed joins (one
    per endpoint) instead of broadcasting a vertex-count-sized lookup:
    edges and degree rows are hash-bucketed on the join-side vertex, each
    bucket resolves its lookups with a local ``searchsorted`` — exchange is
    O(E + nv) rows and no worker ever holds the whole degree table. Below
    ``broadcast_max_verts`` the degree table is instead broadcast once
    (``ray.put``, a bounded ≤ ~32 MB object) and the emit is a single map
    pass — two extra bucket shuffles are pure latency at that size."""
    from .triangles import _canonical_dedup, _is_uint64
    from ..stages.degrees import degree_table

    as_u64 = _is_uint64(edges_ds)
    # materialized: canon feeds the degree table AND the off-diag emit, degs
    # feeds both joins AND the diag emit — without this the dedup shuffle
    # would re-run for every consumer of the lazy union
    # (uint64 ids ride as int64 bit-casts through the shuffles; restored at
    # the final emit)
    canon = _canonical_dedup(edges_ds, as_uint64=as_u64).materialize()

    und = canon.map_batches(
        lambda t: pa.table({"src": t["a"], "dst": t["b"]}),
        batch_format="pyarrow")
    degs = degree_table(und).materialize()  # canonical pairs: undirected degree

    def diag(t: pa.Table) -> pa.Table:
        v = np.asarray(t["vid"], np.int64)
        return pa.table({"i": pa.array(v), "j": pa.array(v),
                         "lap": pa.array(np.ones(len(v), np.float64))})

    def _restore_u64(ds):
        if not as_u64:
            return ds
        return ds.map_batches(
            lambda t: pa.table({
                "i": pa.array(np.asarray(t["i"], np.int64).view(np.uint64), pa.uint64()),
                "j": pa.array(np.asarray(t["j"], np.int64).view(np.uint64), pa.uint64()),
                "lap": t["lap"]}),
            batch_format="pyarrow")

    if degs.count() <= broadcast_max_verts:
        # bounded small side: one broadcast lookup, single emit pass
        dt = degs.select_columns(["vid", "deg"]).to_pandas()
        vids = dt["vid"].to_numpy()
        order = np.argsort(vids)
        vids = vids[order]
        isq = 1.0 / np.sqrt(dt["deg"].to_numpy(np.float64)[order])
        lookup_ref = ray.put((vids, isq))

        def offdiag_bcast(t: pa.Table) -> pa.Table:
            lv, li = ray.get(lookup_ref)
            a = np.asarray(t["a"], np.int64)
            b = np.asarray(t["b"], np.int64)
            w = round_half_away(-li[np.searchsorted(lv, a)]
                                * li[np.searchsorted(lv, b)], 6)
            return pa.table({
                "i": pa.array(np.concatenate([a, b])),
                "j": pa.array(np.concatenate([b, a])),
                "lap": pa.array(np.concatenate([w, w])),
            })

        out = canon.map_batches(offdiag_bcast, batch_format="pyarrow").union(
            degs.map_batches(diag, batch_format="pyarrow"))
        return _restore_u64(out)

    def tag_edges_a(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], np.int64)
        return pa.table({"bucket": pa.array(_bkt(a, n_buckets)),
                         "a": pa.array(a), "b": pa.array(np.asarray(t["b"], np.int64)),
                         "isq": pa.array(np.full(len(a), np.nan))})

    def tag_degs(t: pa.Table) -> pa.Table:
        v = np.asarray(t["vid"], np.int64)
        isq = 1.0 / np.sqrt(np.asarray(t["deg"], np.float64))
        return pa.table({"bucket": pa.array(_bkt(v, n_buckets)),
                         "a": pa.array(v),
                         "b": pa.array(np.full(len(v), -2**62, np.int64)),
                         "isq": pa.array(isq)})

    _DEG_MARK = np.int64(-2**62)    # sentinel b: this row is a degree row
    _EMPTY = pd.DataFrame({"a": pd.array([], dtype="int64"),
                           "b": pd.array([], dtype="int64"),
                           "isq": pd.array([], dtype="float64")})

    def _split_degs(g: pd.DataFrame):
        """Bucket group → (sorted degree vids, their isq, edge-row frame)."""
        is_deg = g["b"].to_numpy() == _DEG_MARK
        dv = g["a"].to_numpy()[is_deg]
        di = g["isq"].to_numpy()[is_deg]
        order = np.argsort(dv, kind="stable")
        return dv[order], di[order], g[~is_deg]

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        dv, di, e = _split_degs(g)
        if not len(e):
            return _EMPTY
        return pd.DataFrame({"a": e["a"].to_numpy(),
                             "b": e["b"].to_numpy(),
                             "isq": di[np.searchsorted(dv, e["a"].to_numpy())]})

    def retag_b(df: pd.DataFrame) -> pa.Table:
        # re-bucket the (a, b, isq_a) rows by the b endpoint for join 2
        return pa.table({"bucket": pa.array(_bkt(df["b"].to_numpy(), n_buckets)),
                         "a": pa.array(df["a"].to_numpy()),
                         "b": pa.array(df["b"].to_numpy()),
                         "isq": pa.array(df["isq"].to_numpy())})

    def offdiag(g: pd.DataFrame) -> pa.Table:
        dv, di, e = _split_degs(g)
        if not len(e):
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "lap": pa.array([], pa.float64())})
        a = e["a"].to_numpy()
        b = e["b"].to_numpy()
        isq_a = e["isq"].to_numpy()
        isq_b = di[np.searchsorted(dv, b)]
        w = round_half_away(-isq_a * isq_b, 6)
        return pa.table({"i": pa.array(np.concatenate([a, b])),
                         "j": pa.array(np.concatenate([b, a])),
                         "lap": pa.array(np.concatenate([w, w]))})

    j1 = (canon.map_batches(tag_edges_a, batch_format="pyarrow")
          .union(degs.map_batches(tag_degs, batch_format="pyarrow"))
          .groupby("bucket").map_groups(attach_a, batch_format="pandas"))
    off = (j1.map_batches(retag_b, batch_format="pandas")
           .union(degs.map_batches(tag_degs, batch_format="pyarrow"))
           .groupby("bucket").map_groups(offdiag, batch_format="pandas"))

    return _restore_u64(off.union(degs.map_batches(diag,
                                                   batch_format="pyarrow")))


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
# sharded symmetric adjacency mat-vec (TSC.cpp arnoldi_map/combine)
# ---------------------------------------------------------------------------

class _MatVecVP(VertexProgram):
    """One symmetric adjacency mat-vec as a range-native partition kernel:
    the ``arnoldi_map`` edge map + ``arnoldi_combine`` sum (TSC.cpp:121-133)
    — y[v] = Σ_{u~v} x[u] over ALL edges, emitted per touched reduce range
    through the cached segment structure (no O(nv) transient per actor)."""

    name = "matvec"
    broadcast_keys = ("x",)
    shardable = True
    wants_aux = True

    def build_aux(self, src, dst, nv):
        from .algorithms import segment_aux

        return segment_aux(src, dst)

    def partial_sharded(self, src, dst, nv, iteration, bounds, tidx, aux, x):
        d_uniq, d_starts, s_order, s_uniq, s_starts = aux
        b = np.asarray(bounds)
        ne = len(src)
        out = {}
        for r in np.asarray(tidx, np.int64):
            lo, hi = int(b[r]), int(b[r + 1])
            y = np.zeros(hi - lo, np.float64)
            k0, k1 = np.searchsorted(d_uniq, [lo, hi])
            if k1 > k0:     # dst side: y[v] += Σ x[src] over v's dst run
                j0 = int(d_starts[k0])
                j1 = int(d_starts[k1]) if k1 < len(d_starts) else ne
                y[d_uniq[k0:k1] - lo] = np.add.reduceat(
                    x[src[j0:j1]], d_starts[k0:k1] - j0)
            k0, k1 = np.searchsorted(s_uniq, [lo, hi])
            if k1 > k0:     # src side: y[u] += Σ x[dst] over u's src rows
                p0 = int(s_starts[k0])
                p1 = int(s_starts[k1]) if k1 < len(s_starts) else ne
                rows = s_order[p0:p1]
                y[s_uniq[k0:k1] - lo] += np.add.reduceat(
                    x[dst[rows]], s_starts[k0:k1] - p0)
            out[int(r)] = y
        return out

    @staticmethod
    def merge(a, b):
        return a + b

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        # the "apply" of a bare mat-vec is the identity on the merged sum;
        # the chunk dict is keyed by the broadcast key so it feeds straight
        # back into the next superstep
        return {"x": total}, 0, 0.0


# -- per-chunk vector-op tasks (driver traffic: scalars / (j+1)-vectors) ----

@ray.remote
def _seed_chunk_task(lo: int, hi: int, kind: str):
    if kind == "ones":
        return {"x": np.ones(hi - lo, np.float64)}
    if kind == "cos":       # seedless, reproducible start vector
        return {"x": np.cos(np.arange(lo, hi, dtype=np.float64))}
    raise ValueError(kind)


@ray.remote
def _slice_chunk_task(vec, lo: int, hi: int):
    return {"x": np.asarray(vec, np.float64)[lo:hi].copy()}


@ray.remote
def _sumsq_chunk_task(c) -> float:
    x = c["x"]
    return float(x @ x)


@ray.remote
def _dots_chunk_task(w, *qs) -> np.ndarray:
    wx = w["x"]
    return np.array([q["x"] @ wx for q in qs])


@ray.remote(num_returns=2)
def _update_dots_chunk_task(w, coef, *qs):
    """w -= Σ coefᵢ qᵢ (first CGS pass); → (new chunk, dots of the new w
    against the basis — the second CGS pass's projection coefficients)."""
    wx = w["x"].copy()
    for c, q in zip(coef, qs):
        wx -= c * q["x"]
    return {"x": wx}, np.array([q["x"] @ wx for q in qs])


@ray.remote(num_returns=2)
def _update_sumsq_chunk_task(w, coef, *qs):
    """Second CGS pass + partial squared norm of the result."""
    wx = w["x"].copy()
    for c, q in zip(coef, qs):
        wx -= c * q["x"]
    return {"x": wx}, float(wx @ wx)


@ray.remote
def _scale_chunk_task(c, s: float):
    return {"x": c["x"] * s}


@ray.remote
def _mul_chunk_task(c, d):
    return {"x": c["x"] * d["x"]}


@ray.remote
def _xpsy_chunk_task(x, s, y):
    """x + s ⊙ y — the M = I + D^{-1/2} A D^{-1/2} post-scale."""
    return {"x": x["x"] + s["x"] * y["x"]}


@ray.remote
def _isq_chunk_task(lo: int, hi: int, out_deg, in_deg):
    deg = (out_deg[lo:hi] + in_deg[lo:hi]).astype(np.float64)
    return {"x": np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1)), 0.0)}


@ray.remote(num_returns=2)
def _est_chunk_task(beta0: float, coef, prev, *qs):
    """Range chunk of the TSC estimate beta0·Q·coef and its max per-vertex
    relative change vs the previous estimate (TSC.cpp:199)."""
    est = coef[0] * qs[0]["x"]
    for c, q in zip(coef[1:], qs[1:]):
        est += c * q["x"]
    est *= beta0
    if prev is None:
        return {"x": est}, float("inf")
    return {"x": est}, float(np.max(np.abs(est - prev["x"]) / (1e-15 + np.abs(est))))


@ray.remote
def _combine_chunk_task(cols, *qs):
    """Range chunk of the Ritz matrix Q @ U[:, cols] → (range_len, k)."""
    out = np.zeros((len(qs[0]["x"]), cols.shape[1]), np.float64)
    for j, q in enumerate(qs):
        out += np.outer(q["x"], cols[j, :])
    return out


@ray.remote
def _rownorm_chunk_task(emb):
    nrm = np.linalg.norm(emb, axis=1)
    return np.where(nrm[:, None] > 0,
                    emb / np.maximum(nrm, 1e-300)[:, None], 0.0)


@ray.remote
def _colsign_chunk_task(emb, lo: int):
    """Per-column (max |entry|, global index of the first max, its sign) —
    the partial of the deterministic sign canonicalization."""
    a = np.abs(emb)
    idx = np.argmax(a, axis=0)
    cols = np.arange(emb.shape[1])
    return a[idx, cols], idx + lo, np.sign(emb[idx, cols])


@ray.remote
def _flip_chunk_task(emb, flip):
    return emb * np.where(flip, -1.0, 1.0)[None, :]


class ShardedSpectral:
    """Distributed mat-vec context over a graph's resident edge partitions:
    the reducer wiring (touched-range masks → feeders) is fetched once and
    reused by every mat-vec; vectors are lists of R plasma chunk refs
    (dicts keyed ``"x"``) aligned with ``self.bounds``."""

    def __init__(self, g: Graph, reduce_shards: int | None = None) -> None:
        self.g = g
        self.vp = _MatVecVP()
        self.actors = g.pool()
        self.bounds = range_bounds(g, reduce_shards)
        self.R = len(self.bounds) - 1
        masks = ray.get([a.touched_ranges.remote(self.bounds)
                         for a in self.actors])
        self.feeders = [[p for p in range(len(self.actors)) if masks[p][r]]
                        for r in range(self.R)]
        tranges = [np.flatnonzero(m) for m in masks]
        self.tranges = tranges
        self.tsend = [t if len(t) else np.zeros(min(1, self.R), np.int64)
                      for t in tranges]

    # -- vector plumbing --------------------------------------------------
    def seed(self, kind: str) -> list:
        b = self.bounds
        return [_seed_chunk_task.remote(int(b[r]), int(b[r + 1]), kind)
                for r in range(self.R)]

    def from_array(self, vec: np.ndarray) -> list:
        b = self.bounds
        ref = ray.put(np.asarray(vec, np.float64))
        return [_slice_chunk_task.remote(ref, int(b[r]), int(b[r + 1]))
                for r in range(self.R)]

    def gather(self, chunks: list) -> np.ndarray:
        return np.concatenate([c["x"] for c in ray.get(chunks)])

    def norm(self, chunks: list) -> float:
        # fixed range order → deterministic float sum
        return float(np.sqrt(sum(ray.get(
            [_sumsq_chunk_task.remote(c) for c in chunks]))))

    def matvec(self, x_chunks: list) -> list:
        """y = A·x: one superstep over the partitions (range-restricted
        chunk reads, range-native kernel), merged by per-range reduce tasks
        co-hosted on the partition actors in fixed partition order."""
        b, nA = self.bounds, len(self.actors)
        part = [a.superstep_sharded.remote(
                    self.vp, 0, b, self.tranges[p],
                    *[x_chunks[int(r)] for r in self.tsend[p]])
                for p, a in enumerate(self.actors)]
        out = []
        for r in range(self.R):
            nc, _st = self.actors[r % nA].reduce_apply_chunk.options(
                num_returns=2).remote(
                self.vp, 0, r, int(b[r]), int(b[r + 1]), self.g.nv, None,
                *[part[p] for p in self.feeders[r]])
            out.append(nc)
        return out

    # -- Lanczos step (CGS2 full reorthogonalization) ---------------------
    def lanczos_step(self, Q: list, mv) -> tuple[float, list, list]:
        """One Lanczos step on basis ``Q`` (list of chunked vectors):
        w = mv(Q[-1]), α = Q[-1]·w, then two classical Gram-Schmidt passes
        against the whole basis. → (alpha, w_chunks, sumsq_part_refs) —
        the caller reduces the squared-norm partials (β) when it needs
        them, after its convergence check."""
        j1 = len(Q)
        w = mv(Q[-1])
        d1 = ray.get([_dots_chunk_task.remote(w[r], *[q[r] for q in Q])
                      for r in range(self.R)])
        c1 = np.sum(d1, axis=0) if self.R > 1 else d1[0]
        alpha = float(c1[j1 - 1])
        c1_ref = ray.put(c1)
        w2, d2 = [], []
        for r in range(self.R):
            wr, dr = _update_dots_chunk_task.remote(
                w[r], c1_ref, *[q[r] for q in Q])
            w2.append(wr)
            d2.append(dr)
        c2 = np.sum(ray.get(d2), axis=0) if self.R > 1 else ray.get(d2)[0]
        c2_ref = ray.put(c2)
        w3, nrm = [], []
        for r in range(self.R):
            wr, nr = _update_sumsq_chunk_task.remote(
                w2[r], c2_ref, *[q[r] for q in Q])
            w3.append(wr)
            nrm.append(nr)
        return alpha, w3, nrm


def _ctx(g: Graph) -> ShardedSpectral:
    ctx = getattr(g, "_spectral_ctx", None)
    if ctx is None:
        ctx = ShardedSpectral(g)
        g._spectral_ctx = ctx
    return ctx


def adjacency_matvec(g: Graph, x: np.ndarray) -> np.ndarray:
    """Distributed y = A·x (undirected symmetric adjacency) — one sharded
    superstep; array-in/array-out convenience over the chunked context."""
    ctx = _ctx(g)
    return ctx.gather(ctx.matvec(ctx.from_array(x)))


# -- small-graph local path (the louvain-style threshold) -------------------

#: at or below this edge count the Lanczos family runs driver-locally on one
#: dense-edge fetch — ~6 distributed task rounds per Krylov step are pure
#: scheduling latency on a graph this size (measured ~0.7-1 s per sf0.1
#: query), while the arrays involved are a few MB. Above it, the chunked
#: plasma path is the only one that runs.
SMALL_GRAPH_EDGES = 500_000


def _dense_edges_local(g: Graph) -> tuple[np.ndarray, np.ndarray]:
    cached = getattr(g, "_dense_edges_cache", None)
    if cached is None:
        parts = ray.get([a.dense_edges.remote() for a in g.pool()])
        src = (np.concatenate([p[0] for p in parts]) if parts
               else np.zeros(0, np.int64))
        dst = (np.concatenate([p[1] for p in parts]) if parts
               else np.zeros(0, np.int64))
        cached = (src, dst)
        g._dense_edges_cache = cached
    return cached


def _matvec_local(src, dst, nv: int, x: np.ndarray) -> np.ndarray:
    y = np.bincount(dst, weights=x[src], minlength=nv).astype(np.float64,
                                                              copy=False)
    y += np.bincount(src, weights=x[dst], minlength=nv)
    return y


def _lanczos_local(mv, q0: np.ndarray, m: int):
    """In-process fixed-depth Lanczos with full (modified) Gram-Schmidt
    reorthogonalization — the same recurrence the chunked path runs, on
    driver arrays. → (alphas, betas, Q list)."""
    Q = [q0]
    alphas: list[float] = []
    betas: list[float] = []
    for j in range(m):
        w = mv(Q[j])
        a_j = float(Q[j] @ w)
        alphas.append(a_j)
        w = w - a_j * Q[j] - (betas[-1] * Q[j - 1] if j > 0 else 0.0)
        for q in Q:
            w -= (q @ w) * q
        beta_j = float(np.linalg.norm(w))
        if beta_j < 1e-12:
            break
        if j < m - 1:
            betas.append(beta_j)
            Q.append(w / beta_j)
    return alphas, betas, Q


def _tsc_local(g: Graph, b, max_m: int, tol: float):
    src, dst = _dense_edges_local(g)
    nv = g.nv
    if b is None:
        b = np.ones(nv, np.float64)
    beta0 = float(np.linalg.norm(b))
    if beta0 == 0.0:
        return np.zeros(nv), 0
    Q = [b / beta0]
    alphas: list[float] = []
    betas: list[float] = []
    prev = est = None
    used = 0
    for j in range(max_m):
        w = _matvec_local(src, dst, nv, Q[j])
        a_j = float(Q[j] @ w)
        alphas.append(a_j)
        w = w - a_j * Q[j] - (betas[-1] * Q[j - 1] if j > 0 else 0.0)
        for q in Q:
            w -= (q @ w) * q
        used = j + 1
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
        if beta_j < 1e-12:
            break
        betas.append(beta_j)
        Q.append(w / beta_j)
    return est, used


def _array_result(g: Graph, arr: np.ndarray, result: str, col: str):
    """Local-path result packaging for the chunks/dataset modes."""
    if result == "array":
        return arr
    bounds = range_bounds(g)
    refs = [ray.put({"x": arr[bounds[r]:bounds[r + 1]]})
            for r in range(len(bounds) - 1)]
    if result == "chunks":
        return refs, bounds
    from .gas import chunks_to_dataset

    return chunks_to_dataset(g, bounds, refs, cols_fn=lambda c: {col: c["x"]})


# ---------------------------------------------------------------------------
# total subgraph centrality (TSC.cpp)
# ---------------------------------------------------------------------------

def total_subgraph_centrality(g: Graph, b: np.ndarray | None = None,
                              max_m: int = 50, tol: float = 1e-9,
                              result: str = "array"):
    """TSC = exp(A)·b (b = ones → row sums of exp(A), TSC.cpp:22-27; pass a
    basis vector e_j for the ``--column`` mode, :228).

    Lanczos (A symmetric) with CGS2 full reorthogonalization: m distributed
    mat-vecs over chunked Krylov vectors; exp of the small tridiagonal H via
    its eigendecomposition (the "small and dense" exponential of TSC.cpp:44);
    stop when the per-vertex relative change of the estimate stabilizes
    (TSC.cpp:199) — the change is reduced per chunk, only its max reaches
    the driver.

    ``result="array"`` (legacy): → (tsc array aligned with g.vids, iters).
    ``result="chunks"``: → (est chunk refs, bounds, iters) — nothing O(nv)
    on the driver. ``result="dataset"``: → (Dataset (vid, tsc), iters).

    Graphs at or below :data:`SMALL_GRAPH_EDGES` run driver-locally (same
    recurrence, one dense-edge fetch — the louvain-style small-graph path).
    """
    nv = g.nv
    if g.num_edges <= SMALL_GRAPH_EDGES:
        est_l, used_l = _tsc_local(g, b, max_m, tol)
        if result == "array":
            return est_l, used_l
        if result == "chunks":
            refs, bounds = _array_result(g, est_l, "chunks", "tsc")
            return refs, bounds, used_l
        return _array_result(g, est_l, "dataset", "tsc"), used_l
    ctx = _ctx(g)
    if b is None:
        beta0 = float(np.sqrt(nv))   # ||ones(nv)|| exactly (nv < 2^53)
        q0 = [_scale_chunk_task.remote(c, 1.0 / beta0)
              for c in ctx.seed("ones")]
    else:
        beta0 = float(np.linalg.norm(b))
        if beta0 == 0.0:
            z = np.zeros(nv)
            if result == "array":
                return z, 0
            if result == "chunks":
                return ctx.from_array(z), ctx.bounds, 0
            raise ValueError("result='dataset' undefined for b == 0")
        q0 = ctx.from_array(np.asarray(b, np.float64) / beta0)
    Q = [q0]
    alphas: list[float] = []
    betas: list[float] = []
    prev_est: list | None = None
    est = None
    used = 0
    for j in range(max_m):
        alpha, w, nrm_parts = ctx.lanczos_step(Q, ctx.matvec)
        alphas.append(alpha)
        used = j + 1
        # current estimate: beta0 * Q_m exp(T_m) e_1
        T = np.diag(alphas)
        if betas:
            T += np.diag(betas, 1) + np.diag(betas, -1)
        lam, U = np.linalg.eigh(T)
        coeff = U @ (np.exp(lam) * U[0, :])
        cref = ray.put(coeff)
        pairs = [_est_chunk_task.remote(
                    beta0, cref, None if prev_est is None else prev_est[r],
                    *[q[r] for q in Q])
                 for r in range(ctx.R)]
        est = [p[0] for p in pairs]
        maxrel = max(ray.get([p[1] for p in pairs]))
        if prev_est is not None and maxrel < tol:
            break
        prev_est = est
        beta_j = float(np.sqrt(sum(ray.get(nrm_parts))))
        if beta_j < 1e-12:  # invariant subspace: exact
            break
        betas.append(beta_j)
        Q.append([_scale_chunk_task.remote(c, 1.0 / beta_j) for c in w])
    if result == "chunks":
        return est, ctx.bounds, used
    if result == "dataset":
        from .gas import chunks_to_dataset

        ds = chunks_to_dataset(g, ctx.bounds, est,
                               cols_fn=lambda c: {"tsc": c["x"]})
        return ds, used
    return ctx.gather(est), used


# ---------------------------------------------------------------------------
# shared chunked Lanczos basis builder (fixed depth, for Ritz eigenvectors)
# ---------------------------------------------------------------------------

def _lanczos_basis(ctx: ShardedSpectral, mv, m: int):
    """Fixed-depth Lanczos from the deterministic cos-ramp start vector:
    → (alphas, betas, Q — list of chunked basis vectors)."""
    q = ctx.seed("cos")
    n0 = float(np.sqrt(sum(ray.get([_sumsq_chunk_task.remote(c) for c in q]))))
    Q = [[_scale_chunk_task.remote(c, 1.0 / n0) for c in q]]
    alphas: list[float] = []
    betas: list[float] = []
    steps = min(m, ctx.g.nv)
    for j in range(steps):
        alpha, w, nrm_parts = ctx.lanczos_step(Q, mv)
        alphas.append(alpha)
        beta_j = float(np.sqrt(sum(ray.get(nrm_parts))))
        if beta_j < 1e-12:
            break
        if j < steps - 1:
            betas.append(beta_j)
            Q.append([_scale_chunk_task.remote(c, 1.0 / beta_j) for c in w])
    return alphas, betas, Q


def _ritz_chunks(ctx: ShardedSpectral, Q: list, U_cols: np.ndarray) -> list:
    """emb chunks = Q @ U[:, cols] per range → list of (range_len, k) refs."""
    uref = ray.put(np.ascontiguousarray(U_cols))
    return [_combine_chunk_task.remote(uref, *[q[r] for q in Q])
            for r in range(ctx.R)]


# ---------------------------------------------------------------------------
# spectral partitioning (partitioning.cpp: laplacian → svd → kmeans)
# ---------------------------------------------------------------------------

def spectral_partition(g: Graph, k: int, m: int | None = None,
                       kmeans_iters: int = 20, result: str = "array"):
    """The partitioning.cpp pipeline (its main orchestrates
    ``call_graph_laplacian`` → ``call_svd`` → ``call_eigen_vector_normalization``
    → ``call_kmeans``, partitioning.cpp:60-115) as one in-engine flow:

    1. smallest-k eigenvectors of the symmetric normalized Laplacian, found
       as the LARGEST-k Ritz pairs of ``M = 2I − L = I + D^{-1/2} A D^{-1/2}``
       via chunked Lanczos on distributed mat-vecs (the SVD step's role);
    2. row-normalize the spectral embedding (eigen_vector_normalization.cpp)
       — a per-chunk task;
    3. Lloyd k-means on the (nv, k) embedding (the clustering toolkit
       kmeans). Deterministic throughout (fixed start vector, fixed-order
       chunk reductions, smallest-index seeding, lowest-index tie-breaks).

    ``result="array"`` (legacy): → (labels int64 aligned with g.vids,
    embedding (nv, k)). ``result="dataset"``: → (Dataset (vid, cluster),
    centroids (k, k)) — k-means runs distributed over the embedding chunks
    and nothing O(nv) lands on the driver.

    Graphs at or below :data:`SMALL_GRAPH_EDGES` run driver-locally.
    """
    m = m or max(4 * k + 10, 30)
    if g.num_edges <= SMALL_GRAPH_EDGES:
        return _spectral_partition_local(g, k, m, kmeans_iters, result)
    ctx = _ctx(g)
    b = ctx.bounds
    isq = [_isq_chunk_task.remote(int(b[r]), int(b[r + 1]),
                                  g.out_deg_ref(), g.in_deg_ref())
           for r in range(ctx.R)]

    def M_matvec(x: list) -> list:
        xin = [_mul_chunk_task.remote(x[r], isq[r]) for r in range(ctx.R)]
        y = ctx.matvec(xin)
        return [_xpsy_chunk_task.remote(x[r], isq[r], y[r])
                for r in range(ctx.R)]

    alphas, betas, Q = _lanczos_basis(ctx, M_matvec, m)
    T = np.diag(alphas)
    if betas:
        T += np.diag(betas, 1) + np.diag(betas, -1)
    lam, U = np.linalg.eigh(T)
    topk = np.argsort(lam)[::-1][:k]          # largest of M = smallest of L
    emb_chunks = [_rownorm_chunk_task.remote(c)
                  for c in _ritz_chunks(ctx, Q, U[:len(alphas), topk])]

    if result == "dataset":
        cents, assign = _kmeans_chunks(ctx, emb_chunks, k, kmeans_iters,
                                       as_dataset=True)
        return assign, cents

    from ..stages.kmeans import kmeans_oracle

    emb = np.concatenate(ray.get(emb_chunks), axis=0)
    _, labels, _ = kmeans_oracle(emb, np.arange(g.nv, dtype=np.int64), k,
                                 kmeans_iters)
    return labels.astype(np.int64), emb


def _spectral_partition_local(g: Graph, k: int, m: int, kmeans_iters: int,
                              result: str):
    src, dst = _dense_edges_local(g)
    nv = g.nv
    deg = (g.out_deg + g.in_deg).astype(np.float64)
    isq = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1)), 0.0)
    q = np.cos(np.arange(nv, dtype=np.float64))
    q /= np.linalg.norm(q)
    alphas, betas, Q = _lanczos_local(
        lambda x: x + isq * _matvec_local(src, dst, nv, isq * x),
        q, min(m, nv))
    T = np.diag(alphas)
    if betas:
        T += np.diag(betas, 1) + np.diag(betas, -1)
    lam, U = np.linalg.eigh(T)
    topk = np.argsort(lam)[::-1][:k]
    emb = np.column_stack(Q) @ U[:len(Q), topk]
    nrm = np.linalg.norm(emb, axis=1)
    emb = np.where(nrm[:, None] > 0,
                   emb / np.maximum(nrm, 1e-300)[:, None], 0.0)

    from ..stages.kmeans import kmeans_oracle

    cents, labels, _ = kmeans_oracle(emb, np.arange(nv, dtype=np.int64), k,
                                     kmeans_iters)
    if result == "dataset":
        from ray.data import from_arrow

        ds = from_arrow(pa.table({
            "vid": pa.array(np.asarray(g.vids, np.uint64), pa.uint64()),
            "cluster": pa.array(labels.astype(np.int64)),
        }))
        return ds, cents
    return labels.astype(np.int64), emb


@ray.remote
def _km_seed_task(emb, k: int):
    return emb[:k].copy()


@ray.remote
def _km_partial_task(emb, C):
    from ..stages.kmeans import nearest_cell

    assign, _ = nearest_cell(emb, C)
    sums = np.zeros((len(C), emb.shape[1]), np.float64)
    np.add.at(sums, assign, emb)
    return sums, np.bincount(assign, minlength=len(C)).astype(np.int64)


@ray.remote
def _km_assign_block_task(emb, C, vids, lo: int, hi: int) -> pa.Table:
    from ..stages.kmeans import nearest_cell

    assign, _ = nearest_cell(emb, C)
    return pa.table({"vid": pa.array(vids[lo:hi], pa.uint64()),
                     "cluster": pa.array(assign.astype(np.int64))})


def _kmeans_chunks(ctx: ShardedSpectral, emb_chunks: list, k: int,
                   iterations: int, as_dataset: bool = False):
    """Lloyd k-means over chunked embeddings: per-chunk (k, d+1) partials
    merged in fixed range order; init = the first k dense rows (the
    smallest-dense-index seeding of the array path). Assignment comes back
    as a Dataset of (vid, cluster) blocks built straight from the chunks."""
    from ray.data import from_arrow_refs

    g, b = ctx.g, ctx.bounds
    # init = first k dense rows (ranges are dense-order-contiguous, so the
    # first chunks supply them; each seed task ships ≤ k rows back)
    pieces, have = [], 0
    for c in emb_chunks:
        pieces.append(ray.get(_km_seed_task.remote(c, k - have)))
        have += len(pieces[-1])
        if have >= k:
            break
    cents = np.concatenate(pieces, axis=0)
    if len(cents) < k:
        raise ValueError(f"graph has {len(cents)} vertices < k={k}")
    for _ in range(iterations):
        cref = ray.put(cents)
        parts = ray.get([_km_partial_task.remote(c, cref)
                         for c in emb_chunks])
        sums = np.zeros_like(parts[0][0])
        cnts = np.zeros(k, np.int64)
        for s, c in parts:      # fixed range order
            sums += s
            cnts += c
        nonempty = cnts > 0
        cents = np.where(nonempty[:, None],
                         sums / np.maximum(cnts, 1)[:, None], cents)
    cref = ray.put(cents)
    if not as_dataset:
        return cents, None
    refs = [_km_assign_block_task.remote(emb_chunks[r], cref, g.vids_ref(),
                                         int(b[r]), int(b[r + 1]))
            for r in range(ctx.R)]
    return cents, from_arrow_refs(refs)


# ---------------------------------------------------------------------------
# spectral node embeddings (adjacency eigenvectors → similarity stack)
# ---------------------------------------------------------------------------

def spectral_embedding(g: Graph, k: int, m: int | None = None,
                       result: str = "array"):
    """Largest-k eigenvectors of the symmetric undirected adjacency as an
    (nv, k) node embedding (classic spectral / HOPE-style embedding — the
    deterministic, SGD-free counterpart of DeepWalk vectors): chunked
    Lanczos on the SAME distributed mat-vecs as TSC / spectral_partition,
    deterministic seedless start vector. Column signs are canonicalized
    (largest-|entry| component made positive, ties → lowest dense index —
    reduced across chunks, no gather) so reruns and test oracles compare.

    ``result="array"`` (legacy): → (emb (nv, k) float64 aligned with
    g.vids, eigenvalues desc). ``result="dataset"``: → (Dataset (vec_id,
    embedding list<double>), eigenvalues) — feeds stages/ann directly.

    Graphs at or below :data:`SMALL_GRAPH_EDGES` run driver-locally."""
    m = m or max(4 * k + 10, 30)
    if g.num_edges <= SMALL_GRAPH_EDGES:
        src, dst = _dense_edges_local(g)
        nv = g.nv
        q = np.cos(np.arange(nv, dtype=np.float64))
        q /= np.linalg.norm(q)
        alphas, betas, Q = _lanczos_local(
            lambda x: _matvec_local(src, dst, nv, x), q, min(m, nv))
        T = np.diag(alphas)
        if betas:
            T += np.diag(betas, 1) + np.diag(betas, -1)
        lam, U = np.linalg.eigh(T)
        order = np.argsort(lam)[::-1][:k]
        emb = np.column_stack(Q) @ U[:len(Q), order]
        for c in range(emb.shape[1]):  # deterministic sign
            i = int(np.argmax(np.abs(emb[:, c])))
            if emb[i, c] < 0:
                emb[:, c] = -emb[:, c]
        if result == "dataset":
            return embedding_dataset(g, emb), lam[order]
        return emb, lam[order]
    ctx = _ctx(g)
    alphas, betas, Q = _lanczos_basis(ctx, ctx.matvec, m)
    T = np.diag(alphas)
    if betas:
        T += np.diag(betas, 1) + np.diag(betas, -1)
    lam, U = np.linalg.eigh(T)
    order = np.argsort(lam)[::-1][:k]
    emb_chunks = _ritz_chunks(ctx, Q, U[:len(alphas), order])
    # deterministic sign: first global max-|entry| per column
    b = ctx.bounds
    parts = ray.get([_colsign_chunk_task.remote(emb_chunks[r], int(b[r]))
                     for r in range(ctx.R)])
    kk = len(order)
    best = np.full(kk, -1.0)
    bidx = np.full(kk, np.iinfo(np.int64).max)
    sign = np.ones(kk)
    for mx, ix, sg in parts:    # fixed range order; ties → lowest index
        take = (mx > best) | ((mx == best) & (ix < bidx))
        best = np.where(take, mx, best)
        bidx = np.where(take, ix, bidx)
        sign = np.where(take, sg, sign)
    flip = sign < 0
    if flip.any():
        fref = ray.put(flip)
        emb_chunks = [_flip_chunk_task.remote(c, fref) for c in emb_chunks]
    if result == "dataset":
        from ray.data import from_arrow_refs

        refs = [_emb_block_task.remote(emb_chunks[r], g.vids_ref(),
                                       int(b[r]), int(b[r + 1]))
                for r in range(ctx.R)]
        return from_arrow_refs(refs), lam[order]
    emb = np.concatenate(ray.get(emb_chunks), axis=0)
    return emb, lam[order]


@ray.remote
def _emb_block_task(emb, vids, lo: int, hi: int) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(np.asarray(vids[lo:hi], np.uint64).view(np.int64)),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    })


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
