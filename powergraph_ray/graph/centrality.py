"""Centrality toolkit (graph_algorithms/{betweeness,closeness,djikstra}.cpp
re-expressed): batched multi-source BFS over the GAS engine.

The reference runs one (fibered) Dijkstra tree per source; with unit edge
weights the tree is a BFS whose level == superstep index, so S sources run
SIMULTANEOUSLY as (nv, S) matrix columns of the vertex state — per-partition
kernels are the same gathers, just 2-D. Betweenness follows Brandes'01
(public algorithm): forward supersteps accumulate geodesic counts σ per
level; backward supersteps accumulate dependencies δ level by level.

Scale note: state is O(nv·S); at 10^12 vertices sources are processed in
column blocks of S (betweenness by source sampling — the standard
approximation), each block one engine run.
"""

from __future__ import annotations

import numpy as np

from .gas import GASEngine, Graph, VertexProgram, split_dense


class MultiSourceBFSVP(VertexProgram):
    """Level-synchronous multi-source BFS with geodesic counting:
    bundle ``dist`` (nv,S) float64, ``sigma`` (nv,S) float64, ``fresh``
    (nv,S) bool — vertices settled in the previous superstep. Superstep t
    settles level t: msg σ[v] = Σ over edges (u,v) with u fresh of σ[u]."""

    name = "multi_source_bfs"
    broadcast_keys = ("dist", "sigma", "fresh")
    shardable = True

    def __init__(self, directed: bool = False, max_iter: int = 10_000) -> None:
        self.directed = directed
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def partial(self, src, dst, nv, iteration, dist, sigma, fresh):
        S = dist.shape[1]
        msg = np.zeros((nv, S), np.float64)
        contrib = np.where(fresh[src], sigma[src], 0.0)
        np.add.at(msg, dst, contrib)
        if not self.directed:
            contrib = np.where(fresh[dst], sigma[dst], 0.0)
            np.add.at(msg, src, contrib)
        return msg

    @staticmethod
    def merge(a, b):
        return a + b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        dist, sigma = bundle["dist"], bundle["sigma"]
        newly = (total > 0) & ~np.isfinite(dist)
        dist = np.where(newly, float(iteration + 1), dist)
        sigma = sigma + np.where(newly, total, 0.0)
        n_active = int(newly.sum())
        return ({"dist": dist, "sigma": sigma, "fresh": newly},
                n_active, float(n_active))

    def apply(self, bundle, total, iteration):
        nv = len(bundle["dist"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def multi_source_bfs(g: Graph, source_vids: np.ndarray, directed: bool = False):
    """→ (dist (nv,S), sigma (nv,S)) for the S sources (geodesic counts)."""
    S = len(source_vids)
    si = g.dense(np.asarray(source_vids, np.uint64))
    dist = np.full((g.nv, S), np.inf, np.float64)
    sigma = np.zeros((g.nv, S), np.float64)
    fresh = np.zeros((g.nv, S), bool)
    dist[si, np.arange(S)] = 0.0
    sigma[si, np.arange(S)] = 1.0
    fresh[si, np.arange(S)] = True
    vp = MultiSourceBFSVP(directed=directed)
    eng = GASEngine(g, vp, init_bundle={"dist": dist, "sigma": sigma, "fresh": fresh})
    out = eng.run()
    return out["dist"], out["sigma"]


class BrandesBackwardVP(VertexProgram):
    """Backward dependency accumulation (Brandes'01): at superstep t,
    vertices on level L-t push ``(1+δ)/σ`` to their level-(L-t-1) BFS
    parents: δ[u] += σ[u] · Σ_{v child} (1+δ[v])/σ[v]."""

    name = "brandes_backward"
    broadcast_keys = ("ratio",)
    shardable = True

    def __init__(self, dist_ref, max_level: int, directed: bool = False) -> None:
        self.dist_ref = dist_ref      # ObjectRef → (nv,S) distances
        self.max_level = max_level
        self.directed = directed

    def max_iterations(self) -> int:
        return self.max_level

    def partial(self, src, dst, nv, iteration, ratio):
        import ray

        dist = ray.get(self.dist_ref)
        lev = float(self.max_level - iteration)     # children on this level
        msg = np.zeros_like(ratio)
        child_d, parent_d = dist[dst], dist[src]
        m = (child_d == lev) & (parent_d == lev - 1.0)
        np.add.at(msg, src, np.where(m, ratio[dst], 0.0))
        if not self.directed:
            child_d, parent_d = dist[src], dist[dst]
            m = (child_d == lev) & (parent_d == lev - 1.0)
            np.add.at(msg, dst, np.where(m, ratio[src], 0.0))
        return msg

    @staticmethod
    def merge(a, b):
        return a + b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        # delta[u] += sigma[u] * received; refresh u's outgoing ratio
        delta = bundle["delta"] + bundle["sigma"] * total
        ratio = np.where(bundle["sigma"] > 0, (1.0 + delta) / np.maximum(bundle["sigma"], 1e-300), 0.0)
        n_active = 0 if iteration + 1 >= self.max_level else 1
        return ({"delta": delta, "ratio": ratio, "sigma": bundle["sigma"]},
                n_active, float(np.abs(total).sum()))

    def apply(self, bundle, total, iteration):
        nv = len(bundle["delta"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def _source_blocks(sources: np.ndarray, block: int):
    for lo in range(0, len(sources), block):
        yield sources[lo:lo + block]


def betweenness_centrality(g: Graph, source_vids: np.ndarray | None = None,
                           directed: bool = False, block: int = 256) -> np.ndarray:
    """Brandes betweenness over the given sources (all vertices = exact;
    a sample = the standard approximation, scaled by nv/S). Undirected pair
    counting halves the total, as in the classic formulation.

    Sources are processed in column blocks of ``block`` (the scale contract:
    state is O(nv·block), never O(nv·S)); per-source dependency sums are
    additive across blocks, so the blocked result is exact."""
    import ray

    sources = g.vids if source_vids is None else np.asarray(source_vids, np.uint64)
    bc = np.zeros(g.nv, np.float64)
    for blk in _source_blocks(sources, block):
        dist, sigma = multi_source_bfs(g, blk, directed=directed)
        finite_max = dist[np.isfinite(dist)].max() if np.isfinite(dist).any() else 0.0
        L = int(finite_max)
        if L == 0:
            continue
        ratio = np.where(sigma > 0, 1.0 / np.maximum(sigma, 1e-300), 0.0)
        init = {"delta": np.zeros_like(sigma), "ratio": ratio, "sigma": sigma}
        vp = BrandesBackwardVP(ray.put(dist), L, directed=directed)
        out = GASEngine(g, vp, init_bundle=init).run()
        delta = out["delta"]
        # exclude each source's own column entry (Brandes sums over s != v)
        si = g.dense(blk)
        delta[si, np.arange(len(blk))] = 0.0
        bc += delta.sum(axis=1)
    if not directed:
        bc = bc / 2.0
    if len(sources) < g.nv:  # sampled approximation, rescale
        bc = bc * (g.nv / len(sources))
    return bc


def closeness_centrality(g: Graph, source_vids: np.ndarray | None = None,
                         directed: bool = False) -> np.ndarray:
    """closeness(v) = (reachable-1) / Σ d(v,u) over the BFS distances
    (closeness.cpp semantics, unit weights); 0 for isolated vertices.
    Computed for the given vertices (default: all)."""
    sources = g.vids if source_vids is None else np.asarray(source_vids, np.uint64)
    out = []
    for blk in _source_blocks(sources, 256):  # O(nv·block) state per run
        dist, _ = multi_source_bfs(g, blk, directed=directed)
        # column j = distances FROM source j to every vertex; closeness of
        # the source uses its column
        d = dist.T  # (S_b, nv)
        finite = np.isfinite(d)
        reach = finite.sum(axis=1) - 1
        tot = np.where(finite, d, 0.0).sum(axis=1)
        out.append(np.where(tot > 0, reach / np.maximum(tot, 1e-300), 0.0))
    return np.concatenate(out) if out else np.zeros(0, np.float64)


def proximity_prestige(g: Graph, source_vids: np.ndarray | None = None) -> np.ndarray:
    """Proximity prestige (graph_algorithms/prestige.cpp: multi-source
    shortest-path trees into each vertex, averaged): for each vertex v,
    over the influence domain I_v = {s : s ≠ v, d(s→v) < ∞} along
    *directed* edges,

        PP(v) = (|I_v| / ns_v) / (Σ d(s→v) / |I_v|)

    — reachability fraction divided by mean inbound geodesic distance;
    ns_v = #candidate sources (excluding v itself); 0 when unreachable.
    Restricted to a source subset S (the same subsampling contract as
    ``closeness_centrality``); → PP array aligned with ``g.vids``.
    Unit weights (the reference's default edge cost, sssp.cpp:52)."""
    sources = g.vids if source_vids is None else np.asarray(source_vids, np.uint64)
    S = len(sources)
    influence = np.zeros(g.nv, np.float64)
    tot = np.zeros(g.nv, np.float64)
    is_src = np.zeros(g.nv, bool)
    for blk in _source_blocks(sources, 256):  # O(nv·block) state per run
        dist, _ = multi_source_bfs(g, blk, directed=True)  # d[v, j] = d(s_j → v)
        si = g.dense(blk)
        mask = np.isfinite(dist)
        mask[si, np.arange(len(blk))] = False  # drop s == v (d == 0)
        influence += mask.sum(axis=1)
        tot += np.where(mask, dist, 0.0).sum(axis=1)
        is_src[si] = True
    ns = (S - is_src.astype(np.int64)).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        pp = influence / ns * influence / tot  # fixed op order (SQL-parity)
    return np.where((influence > 0) & (tot > 0), pp, 0.0)


def harmonic_centrality(g: Graph, source_vids: np.ndarray | None = None,
                        directed: bool = False) -> np.ndarray:
    """harmonic(v) = Σ_{u ≠ v, d < ∞} 1/d(v,u) (Boldi & Vigna 2014) —
    the robust-to-disconnection closeness variant, over the same batched
    multi-source BFS columns as closeness_centrality."""
    sources = g.vids if source_vids is None else np.asarray(source_vids,
                                                            np.uint64)
    out = []
    for blk in _source_blocks(sources, 256):  # O(nv·block) state per run
        dist, _ = multi_source_bfs(g, blk, directed=directed)
        d = dist.T  # (S_b, nv)
        ok = np.isfinite(d) & (d > 0)
        inv = np.where(ok, 1.0 / np.where(ok, d, 1.0), 0.0)
        out.append(inv.sum(axis=1))
    return np.concatenate(out) if out else np.zeros(0, np.float64)


def landmark_distances(g: Graph, k: int = 16, directed: bool = False):
    """Landmark-based distance oracle (Potamias et al. 2009): BFS columns
    from the ``k`` highest-degree vertices (ties → lowest vid — the
    standard degree heuristic picks hubs most shortest paths route
    through). → (landmark_vids (k,), dist (nv, k)) — the sketch behind
    O(k) approximate point-to-point distance queries
    ``d̂(u,v) = min_l d(u,l) + d(l,v)`` (an upper bound; exact when some
    landmark lies on a shortest u-v path). One engine run of the SAME
    batched multi-source BFS as closeness/harmonic; at corpus scale the
    (nv, k) column block is the per-source state every centrality op here
    already carries."""
    deg = g.out_deg + g.in_deg
    order = np.lexsort((g.vids, -deg))
    marks = np.asarray(g.vids[order[:min(k, g.nv)]], np.uint64)
    dist, _ = multi_source_bfs(g, marks, directed=directed)
    return marks, dist


def landmark_distance_estimates(g: Graph, source_vid: int, k: int = 16):
    """→ (vids, est float array): d̂(source, v) = min_l d(source,l)+d(l,v)
    over the k degree-picked landmarks (np.inf where no landmark reaches
    both endpoints)."""
    marks, dist = landmark_distances(g, k)
    s = int(g.dense(np.asarray([source_vid], np.uint64))[0])
    d0 = dist[s, :]                       # d(source, l) (undirected BFS)
    est = np.min(d0[None, :] + dist, axis=1)
    return g.vids, est


def distance_summary(g: Graph, n_sources: int = 100):
    """Sampled-BFS distance statistics (the ANF-style global summary from
    exact columns): over the ``n_sources`` smallest vids (the same sample
    closeness/harmonic use), eccentricity per source, then
    ``radius_est = min ecc`` (upper bound on the true radius),
    ``diameter_lb = max ecc`` (lower bound on the true diameter), and
    ``avg_dist`` = mean d(s, v) over all reachable ordered pairs with
    v ≠ s. One batched multi-source BFS run; integer hop sums, one float
    division. → dict(radius_est, diameter_lb, avg_dist, n_pairs)."""
    srcs = np.sort(np.asarray(g.vids, np.uint64))[:min(n_sources, g.nv)]
    tot = 0
    n_pairs = 0
    eccs = []
    for blk in _source_blocks(srcs, 256):
        dist, _ = multi_source_bfs(g, blk, directed=False)
        d = dist.T
        finite = np.isfinite(d) & (d > 0)
        reach = finite.any(axis=1)
        # a sampled source reaching nothing has NO eccentricity (the SQL
        # replay's GROUP BY over d>0 rows likewise emits no row for it) —
        # folding it in as ecc=0 would drag radius_est to 0
        eccs.append(np.where(finite, d, 0.0).max(axis=1)[reach])
        tot += int(np.where(finite, d, 0.0).sum())
        n_pairs += int(finite.sum())
    ecc = np.concatenate(eccs) if eccs else np.zeros(0)
    return {
        "radius_est": int(ecc.min()) if len(ecc) else 0,
        "diameter_lb": int(ecc.max()) if len(ecc) else 0,
        "avg_dist": (tot / n_pairs) if n_pairs else 0.0,
        "n_pairs": n_pairs,
    }
