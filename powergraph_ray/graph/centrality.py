"""Centrality toolkit (graph_algorithms/{betweeness,closeness,djikstra}.cpp
re-expressed): batched multi-source BFS over the GAS engine.

The reference runs one (fibered) Dijkstra tree per source; with unit edge
weights the tree is a BFS whose level == superstep index, so S sources run
SIMULTANEOUSLY as (·, S) matrix columns of the vertex state — per-partition
kernels are the same gathers, just 2-D. Betweenness follows Brandes'01
(public algorithm): forward supersteps accumulate geodesic counts σ per
level; backward supersteps accumulate dependencies δ level by level.

Scale discipline (the same range-native contract as the 1-D PageRank
path, applied to 2-D source-column bundles):

- **No (nv, S) array ever touches the driver.** Initial state is built per
  range chunk in tasks (``supports_chunk_init``; the VP carries only the S
  dense source indices); the forward run's final chunks feed the backward
  run's init chunks through per-range tasks (``GASEngine.init_chunks``);
  per-vertex/per-source reductions (closeness sums, dependency totals,
  eccentricities) are computed per chunk in tasks and only the 1-D /
  (S,)-sized results reach the driver.
- **Per-actor state is touched-ranges × S, not nv × S.** The VPs define
  ``partial_sharded`` kernels that allocate and emit only each touched
  reduce range's (range_len, S) chunk — with bucket-ordered grid ingress a
  partition touches ~2/√P of the ranges, so per-actor transient memory
  drops ~√P-fold vs the old full-(nv, S) partial. The backward pass reads
  the forward distances from the broadcast bundle (range-restricted,
  zero-copy plasma chunk reads) instead of ray.get-ing a full (nv, S)
  matrix per partition per superstep.
- Sources are processed in column blocks of ``block`` (betweenness by
  source sampling — the standard approximation); per-source dependency
  sums are additive across blocks, so the blocked result is exact.

All per-element float accumulation orders match the previous dense
formulation (range slices preserve the partition's fixed edge
subsequence), and the closeness/prestige/distance sums are exact integer
arithmetic in float64 — outputs are unchanged.
"""

from __future__ import annotations

import numpy as np
import ray

from .gas import GASEngine, Graph, VertexProgram


@ray.remote
def _dense_lookup_task(svids, perm, gids):
    """Global vids → dense indices against the plasma sorted-vid view;
    raises on absent vids (sources must exist)."""
    g = np.asarray(gids, np.uint64)
    if not len(svids):
        raise ValueError("empty graph has no source vertices")
    pos = np.searchsorted(svids, g)
    safe = np.minimum(pos, len(svids) - 1)
    hit = (pos < len(svids)) & (svids[safe] == g)
    if not hit.all():
        raise ValueError(f"{int((~hit).sum())} source vids not in the graph")
    return (safe if perm is None else perm[safe]).astype(np.int64)


def _dense_sources(g: Graph, source_vids) -> np.ndarray:
    """Dense indices of the given source vids — via the driver cache when
    the vid table is already local, else one small task against plasma."""
    gids = np.asarray(source_vids, np.uint64)
    if g._vids_cache is not None:
        return np.asarray(g.dense(gids), np.int64)
    sv, perm = g.sorted_view_refs()
    return ray.get(_dense_lookup_task.remote(sv, perm, gids))


#: uint16 "not reached" sentinel for BFS levels (depth < 65535)
UNREACHED = np.uint16(0xFFFF)


class MultiSourceBFSVP(VertexProgram):
    """Level-synchronous multi-source BFS with geodesic counting:
    bundle ``dist`` (·,S) uint16 levels (``UNREACHED`` sentinel — 4× less
    chunk state than the former float64-inf form), ``sigma`` (·,S)
    float64, ``fresh`` (·,S) bool — vertices settled in the previous
    superstep. Superstep t settles level t: msg σ[v] = Σ over edges (u,v)
    with u fresh of σ[u]. Only ``sigma``/``fresh`` are BROADCAST — the
    gather kernels never read distances, so dist rides only in the range
    chunk state for apply (round 5: dropping it from broadcast_keys cut
    the per-actor assembly volume ~47%). The VP carries only the S dense
    source indices; all (·, S) state is built per range chunk in tasks."""

    name = "multi_source_bfs"
    broadcast_keys = ("sigma", "fresh")
    shardable = True
    supports_chunk_init = True
    wants_aux = True

    def __init__(self, si: np.ndarray, directed: bool = False,
                 max_iter: int = 10_000) -> None:
        self.si = np.asarray(si, np.int64)   # dense source indices, len S
        self.directed = directed
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def build_aux(self, src, dst, nv):
        from .algorithms import segment_aux

        return segment_aux(src, dst)

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        n, S = hi - lo, len(self.si)
        dist = np.full((n, S), UNREACHED, np.uint16)
        sigma = np.zeros((n, S), np.float64)
        fresh = np.zeros((n, S), bool)
        m = (self.si >= lo) & (self.si < hi)
        rows, cols = self.si[m] - lo, np.flatnonzero(m)
        dist[rows, cols] = 0
        sigma[rows, cols] = 1.0
        fresh[rows, cols] = True
        return {"dist": dist, "sigma": sigma, "fresh": fresh}

    def partial_sharded(self, src, dst, nv, iteration, bounds, tidx, aux,
                        sigma, fresh):
        """Range-native 2-D gather via the cached segment structure: a
        range's dst segments are a contiguous run of ``d_uniq`` (edge block
        is dst-sorted); its src segments (undirected) gather their edge
        rows through ``s_order`` — no per-range full-edge mask scan and no
        O(nv·S) transient. Per output element the edge subsequence order
        matches the pre-segment formulation (all dst-adds precede all
        src-adds, each in partition edge order; ``reduceat`` sums each
        segment left-to-right), so chunks are bit-identical."""
        d_uniq, d_starts, s_order, s_uniq, s_starts = aux
        b = np.asarray(bounds)
        S = sigma.shape[1]
        ne = len(src)
        out = {}
        for r in np.asarray(tidx, np.int64):
            lo, hi = int(b[r]), int(b[r + 1])
            msg = np.zeros((hi - lo, S), np.float64)
            k0, k1 = np.searchsorted(d_uniq, [lo, hi])
            if k1 > k0:
                j0 = int(d_starts[k0])
                j1 = int(d_starts[k1]) if k1 < len(d_starts) else ne
                s_ = src[j0:j1]
                msg[d_uniq[k0:k1] - lo] = np.add.reduceat(
                    np.where(fresh[s_], sigma[s_], 0.0),
                    d_starts[k0:k1] - j0, axis=0)
            if not self.directed:
                k0, k1 = np.searchsorted(s_uniq, [lo, hi])
                if k1 > k0:
                    p0 = int(s_starts[k0])
                    p1 = int(s_starts[k1]) if k1 < len(s_starts) else ne
                    d_ = dst[s_order[p0:p1]]
                    msg[s_uniq[k0:k1] - lo] += np.add.reduceat(
                        np.where(fresh[d_], sigma[d_], 0.0),
                        s_starts[k0:k1] - p0, axis=0)
            out[int(r)] = msg
        return out

    @staticmethod
    def merge(a, b):
        return a + b

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        dist, sigma = bundle["dist"], bundle["sigma"]
        newly = (total > 0) & (dist == UNREACHED)
        dist = np.where(newly, np.uint16(iteration + 1), dist)
        sigma = sigma + np.where(newly, total, 0.0)
        n_active = int(newly.sum())
        return ({"dist": dist, "sigma": sigma, "fresh": newly},
                n_active, float(n_active))


class MultiSourceReachVP(VertexProgram):
    """Distance-ONLY multi-source BFS — the lean engine behind closeness /
    harmonic / prestige / landmark / distance-summary, which never read σ:

    - messages are BOOLEAN reach flags ((range, S) uint8-sized, OR monoid —
      order-free, so no float-order caveats), 8× smaller than the σ-count
      float64 messages of :class:`MultiSourceBFSVP`;
    - distances are uint16 levels with ``UNREACHED`` = 0xFFFF (BFS depth
      < 65535 — any real graph), 4× smaller broadcast than float64;
    - kernels are ``np.logical_or.reduceat`` over the cached segment
      structure (segment_aux — the CSR/CSC reduce of local gather
      accumulation) instead of per-edge ``ufunc.at``.

    Net: ~7× less superstep object-store traffic than running the full
    σ-counting VP for a distance query (measured: the S=256 / nv=1M
    closeness run went from object-store-spill-bound to compute-bound).
    Betweenness keeps :class:`MultiSourceBFSVP` — Brandes needs σ."""

    name = "ms_reach"
    broadcast_keys = ("fresh",)     # kernels never read distances
    shardable = True
    supports_chunk_init = True
    wants_aux = True

    def __init__(self, si: np.ndarray, directed: bool = False,
                 max_iter: int = 60_000) -> None:
        assert max_iter < int(UNREACHED)
        self.si = np.asarray(si, np.int64)
        self.directed = directed
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def build_aux(self, src, dst, nv):
        from .algorithms import segment_aux

        return segment_aux(src, dst)

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        n, S = hi - lo, len(self.si)
        dist = np.full((n, S), UNREACHED, np.uint16)
        fresh = np.zeros((n, S), bool)
        m = (self.si >= lo) & (self.si < hi)
        rows, cols = self.si[m] - lo, np.flatnonzero(m)
        dist[rows, cols] = 0
        fresh[rows, cols] = True
        return {"dist": dist, "fresh": fresh}

    def partial_sharded(self, src, dst, nv, iteration, bounds, tidx, aux,
                        fresh):
        """Range-native OR gather via the cached segment structure: a
        range's dst segments are a contiguous run of ``d_uniq``; its src
        segments gather their edge rows through ``s_order``. OR is
        order-free, so no accumulation-order caveats apply."""
        d_uniq, d_starts, s_order, s_uniq, s_starts = aux
        b = np.asarray(bounds)
        S = fresh.shape[1]
        ne = len(src)
        out = {}
        for r in np.asarray(tidx, np.int64):
            lo, hi = int(b[r]), int(b[r + 1])
            msg = np.zeros((hi - lo, S), bool)
            k0, k1 = np.searchsorted(d_uniq, [lo, hi])
            if k1 > k0:
                j0 = int(d_starts[k0])
                j1 = int(d_starts[k1]) if k1 < len(d_starts) else ne
                red = np.logical_or.reduceat(fresh[src[j0:j1]],
                                             d_starts[k0:k1] - j0, axis=0)
                msg[d_uniq[k0:k1] - lo] = red
            if not self.directed:
                k0, k1 = np.searchsorted(s_uniq, [lo, hi])
                if k1 > k0:
                    p0 = int(s_starts[k0])
                    p1 = int(s_starts[k1]) if k1 < len(s_starts) else ne
                    rows = s_order[p0:p1]
                    red = np.logical_or.reduceat(fresh[dst[rows]],
                                                 s_starts[k0:k1] - p0,
                                                 axis=0)
                    msg[s_uniq[k0:k1] - lo] |= red
            out[int(r)] = msg
        return out

    @staticmethod
    def merge(a, b):
        return a | b

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        dist = bundle["dist"]
        newly = total & (dist == UNREACHED)
        nd = np.where(newly, np.uint16(iteration + 1), dist)
        n_active = int(newly.sum())
        return {"dist": nd, "fresh": newly}, n_active, float(n_active)


def multi_source_reach(g: Graph, si: np.ndarray, directed: bool = False):
    """→ (engine, final chunk refs): reach-only BFS from the S dense
    sources; each chunk holds a (range, S) uint16 ``dist`` (UNREACHED
    sentinel). The distance-family scale entry point."""
    vp = MultiSourceReachVP(si, directed=directed)
    eng = GASEngine(g, vp)
    return eng, eng.run(result="chunks")


def multi_source_bfs(g: Graph, source_vids=None, directed: bool = False,
                     result: str = "arrays", si: np.ndarray | None = None,
                     pipeline_width: int | None = None):
    """Batched multi-source BFS from the S sources.

    ``result="arrays"`` (legacy): → (dist (nv,S), sigma (nv,S)) gathered
    dense. ``result="chunks"`` (the scale path every centrality op here
    uses): → (engine, final chunk refs) — per-range {dist, sigma, fresh}
    dicts in plasma, reduced by per-chunk tasks without a driver gather.
    ``si`` passes pre-resolved dense source indices directly."""
    if si is None:
        si = _dense_sources(g, source_vids)
    vp = MultiSourceBFSVP(si, directed=directed)
    eng = GASEngine(g, vp, pipeline_width=pipeline_width)
    chunks = eng.run(result="chunks")
    if result == "chunks":
        return eng, chunks
    out = eng._gather_chunks(chunks)
    d = out["dist"]     # uint16 levels → the legacy float64/inf contract
    return np.where(d == UNREACHED, np.inf, d.astype(np.float64)), out["sigma"]


class BrandesBackwardVP(VertexProgram):
    """Backward dependency accumulation (Brandes'01): at superstep t,
    vertices on level L-t push ``(1+δ)/σ`` to their level-(L-t-1) BFS
    parents: δ[u] += σ[u] · Σ_{v child} (1+δ[v])/σ[v]. The forward
    distances ride in the broadcast bundle (range-restricted zero-copy
    chunk reads, passed through unchanged by apply) instead of a full
    (nv,S) ray.get per partition per superstep."""

    name = "brandes_backward"
    broadcast_keys = ("ratio", "dist")
    shardable = True
    wants_aux = True

    def __init__(self, max_level: int, directed: bool = False) -> None:
        self.max_level = max_level
        self.directed = directed

    def max_iterations(self) -> int:
        return self.max_level

    def build_aux(self, src, dst, nv):
        from .algorithms import segment_aux

        return segment_aux(src, dst)

    def partial_sharded(self, src, dst, nv, iteration, bounds, tidx, aux,
                        ratio, dist):
        """Range-native backward push via the cached segment structure:
        parent-side (src) sums over the ``s_order`` segments, then
        child-side (dst) sums over the contiguous dst segments (undirected)
        — per output element the same edge-subsequence order as the
        pre-segment formulation (src adds precede dst adds), so chunks are
        bit-identical, without the per-range full-edge mask scan. ``dist``
        is the forward pass's uint16 level matrix (4× lighter broadcast
        than the former float64); level equality is exact integer math."""
        d_uniq, d_starts, s_order, s_uniq, s_starts = aux
        b = np.asarray(bounds)
        lev = np.uint16(self.max_level - iteration)
        lev_p = np.uint16(self.max_level - iteration - 1)   # parent level
        ne = len(src)
        out = {}
        for r in np.asarray(tidx, np.int64):
            lo, hi = int(b[r]), int(b[r + 1])
            msg = np.zeros((hi - lo,) + ratio.shape[1:], ratio.dtype)
            k0, k1 = np.searchsorted(s_uniq, [lo, hi])
            if k1 > k0:
                p0 = int(s_starts[k0])
                p1 = int(s_starts[k1]) if k1 < len(s_starts) else ne
                rows = s_order[p0:p1]
                s_, d_ = src[rows], dst[rows]
                m = (dist[d_] == lev) & (dist[s_] == lev_p)
                msg[s_uniq[k0:k1] - lo] = np.add.reduceat(
                    np.where(m, ratio[d_], 0.0), s_starts[k0:k1] - p0, axis=0)
            if not self.directed:
                k0, k1 = np.searchsorted(d_uniq, [lo, hi])
                if k1 > k0:
                    j0 = int(d_starts[k0])
                    j1 = int(d_starts[k1]) if k1 < len(d_starts) else ne
                    s2, d2 = src[j0:j1], dst[j0:j1]
                    m = (dist[s2] == lev) & (dist[d2] == lev_p)
                    msg[d_uniq[k0:k1] - lo] += np.add.reduceat(
                        np.where(m, ratio[s2], 0.0), d_starts[k0:k1] - j0,
                        axis=0)
            out[int(r)] = msg
        return out

    @staticmethod
    def merge(a, b):
        return a + b

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        # delta[u] += sigma[u] * received; refresh u's outgoing ratio
        delta = bundle["delta"] + bundle["sigma"] * total
        ratio = np.where(bundle["sigma"] > 0,
                         (1.0 + delta) / np.maximum(bundle["sigma"], 1e-300),
                         0.0)
        n_active = 0 if iteration + 1 >= self.max_level else 1
        return ({"delta": delta, "ratio": ratio, "sigma": bundle["sigma"],
                 "dist": bundle["dist"]},
                n_active, float(np.abs(total).sum()))


# -- per-chunk reduction tasks (the only things the driver ever gathers) ----

@ray.remote
def _max_finite_dist_task(chunk) -> float:
    d = chunk["dist"]
    f = d != UNREACHED
    return float(d[f].max()) if f.any() else 0.0


@ray.remote
def _brandes_init_chunk_task(fwd_chunk) -> dict:
    """Forward chunk → backward init chunk (delta/ratio/sigma/dist)."""
    sigma = fwd_chunk["sigma"]
    ratio = np.where(sigma > 0, 1.0 / np.maximum(sigma, 1e-300), 0.0)
    return {"delta": np.zeros_like(sigma), "ratio": ratio, "sigma": sigma,
            "dist": fwd_chunk["dist"]}


@ray.remote
def _bc_chunk_task(chunk, si, lo: int, hi: int) -> np.ndarray:
    """One range's betweenness contribution: per-vertex dependency sum with
    each source's own column zeroed (Brandes sums over s != v)."""
    delta = chunk["delta"].copy()
    m = (si >= lo) & (si < hi)
    delta[si[m] - lo, np.flatnonzero(m)] = 0.0
    return delta.sum(axis=1)


@ray.remote
def _closeness_chunk_task(chunk):
    """→ ((S,) reached count, (S,) distance sum) over this range's rows —
    integer-exact (uint16 levels summed in int64), so the cross-range
    fold is order-free."""
    d = chunk["dist"]
    reached = d != UNREACHED
    return (reached.sum(axis=0).astype(np.int64),
            np.where(reached, d, 0).sum(axis=0, dtype=np.int64))


@ray.remote
def _harmonic_chunk_task(chunk) -> np.ndarray:
    d = chunk["dist"]
    ok = (d != UNREACHED) & (d > 0)
    inv = np.where(ok, 1.0 / np.where(ok, d, 1).astype(np.float64), 0.0)
    return inv.sum(axis=0)


@ray.remote
def _prestige_chunk_task(chunk, si, lo: int, hi: int):
    """→ ((range_len,) influence counts, (range_len,) inbound distance
    sums) with each source's own row-entry dropped (d(s,s)=0)."""
    d = chunk["dist"]
    mask = d != UNREACHED
    m = (si >= lo) & (si < hi)
    mask[si[m] - lo, np.flatnonzero(m)] = False
    return (mask.sum(axis=1).astype(np.float64),
            np.where(mask, d, 0).sum(axis=1, dtype=np.int64))


@ray.remote
def _distance_summary_chunk_task(chunk):
    """→ ((S,) eccentricity partial maxima, (S,) reached-any flags,
    int distance sum, int pair count) over this range's rows."""
    d = chunk["dist"]
    reached = (d != UNREACHED) & (d > 0)
    ecc = (np.where(reached, d, 0).max(axis=0).astype(np.int64)
           if len(d) else np.zeros(d.shape[1], np.int64))
    return (ecc, reached.any(axis=0),
            int(np.where(reached, d, 0).sum(dtype=np.int64)),
            int(reached.sum()))


def _source_blocks(si: np.ndarray, block: int):
    for lo in range(0, len(si), block):
        yield si[lo:lo + block]


def _auto_block(g: Graph, requested: int, bytes_per_msg: int,
                in_flight: int = 3) -> int:
    """Cap the source-column block so one superstep's partial volume fits
    the object store: partials replicate vertex-cut-style (each range is
    emitted by ~r = replication_factor partitions), so live bytes per
    superstep ≈ r · nv · S · bytes_per_msg — and with the engine's
    pipelined submission plus state-chunk versions, ~3 supersteps' worth
    are in flight at once, so the budget is store/12 (≈ 8%). Past that the
    store spills EVERY superstep and the cumulative spill files exhaust
    the disk (measured: the σ-counting S=256 / nv=1M run wrote 80 GB of
    spill before dying). On a real multi-node cluster the aggregate store
    grows with the node count, so the cap rises back toward ``requested``
    — this is a memory guard, not a semantic knob; blocked results are
    exact regardless of block size."""
    try:
        store = ray.cluster_resources().get("object_store_memory", 0)
    except Exception:
        store = 0
    if not store or not g.nv:
        return requested
    r = max(1.0, float(g.replication_factor))
    cap = int(store * (0.25 / max(1, in_flight))
              // (r * g.nv * bytes_per_msg))
    s = max(16, min(requested, cap))
    if s < requested:
        import logging

        logging.getLogger(__name__).info(
            "centrality: source block auto-capped %d → %d "
            "(object store %.1f GB, nv=%d, replication %.1f)",
            requested, s, store / 1e9, g.nv, r)
    return s


def _all_sources(g: Graph, source_vids) -> np.ndarray:
    """Dense source indices: the full vertex set (arange — dense(g.vids)
    is the identity) when None, else resolved vids."""
    if source_vids is None:
        return np.arange(g.nv, dtype=np.int64)
    return _dense_sources(g, source_vids)


def betweenness_centrality(g: Graph, source_vids: np.ndarray | None = None,
                           directed: bool = False, block: int = 256) -> np.ndarray:
    """Brandes betweenness over the given sources (all vertices = exact;
    a sample = the standard approximation, scaled by nv/S). Undirected pair
    counting halves the total, as in the classic formulation.

    Per block: forward BFS chunks → per-range backward init tasks →
    backward run → per-range dependency-sum tasks; the driver accumulates
    only the 1-D per-vertex result (the function's own return shape)."""
    si_all = _all_sources(g, source_vids)
    bc = np.zeros(g.nv, np.float64)
    # measured: strict lockstep (pipeline_width=1) with a bigger block is
    # SLOWER here — the pipelined window productively hides per-superstep
    # dispatch latency; keep the default window + conservative block
    block = _auto_block(g, block, 8)  # float64 σ messages
    for si in _source_blocks(si_all, block):
        engF, fwd = multi_source_bfs(g, si=si, directed=directed,
                                     result="chunks")
        L = int(max(ray.get([_max_finite_dist_task.remote(c) for c in fwd])))
        if L == 0:
            continue
        vpB = BrandesBackwardVP(L, directed=directed)
        engB = GASEngine(g, vpB)
        engB.init_chunks = [_brandes_init_chunk_task.remote(c) for c in fwd]
        back = engB.run(result="chunks")
        b = engB.bounds
        parts = ray.get([_bc_chunk_task.remote(back[r], si, int(b[r]),
                                               int(b[r + 1]))
                         for r in range(engB.nshards)])
        bc += np.concatenate(parts) if parts else 0.0
    if not directed:
        bc = bc / 2.0
    if len(si_all) < g.nv:  # sampled approximation, rescale
        bc = bc * (g.nv / len(si_all))
    return bc


def closeness_centrality(g: Graph, source_vids: np.ndarray | None = None,
                         directed: bool = False) -> np.ndarray:
    """closeness(v) = (reachable-1) / Σ d(v,u) over the BFS distances
    (closeness.cpp semantics, unit weights); 0 for isolated vertices.
    Computed for the given vertices (default: all). Per-chunk reductions:
    only (S,)-sized partials reach the driver."""
    si_all = _all_sources(g, source_vids)
    out = []
    for si in _source_blocks(si_all, _auto_block(g, 256, 1)):
        _, fwd = multi_source_reach(g, si, directed=directed)
        parts = ray.get([_closeness_chunk_task.remote(c) for c in fwd])
        reach = sum(p[0] for p in parts) - 1
        tot = sum(p[1] for p in parts)  # integer-exact int64
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
    Unit weights (the reference's default edge cost, sssp.cpp:52).
    Per-range chunk reductions; the driver holds only the 1-D result."""
    si_all = _all_sources(g, source_vids)
    S = len(si_all)
    influence = np.zeros(g.nv, np.float64)
    tot = np.zeros(g.nv, np.float64)
    is_src = np.zeros(g.nv, bool)
    for si in _source_blocks(si_all, _auto_block(g, 256, 1)):
        eng, fwd = multi_source_reach(g, si, directed=True)
        b = eng.bounds
        parts = ray.get([_prestige_chunk_task.remote(fwd[r], si, int(b[r]),
                                                     int(b[r + 1]))
                         for r in range(eng.nshards)])
        for r, (inf_r, tot_r) in enumerate(parts):
            influence[b[r]:b[r + 1]] += inf_r
            tot[b[r]:b[r + 1]] += tot_r
        is_src[si] = True
    ns = (S - is_src.astype(np.int64)).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        pp = influence / ns * influence / tot  # fixed op order (SQL-parity)
    return np.where((influence > 0) & (tot > 0), pp, 0.0)


def harmonic_centrality(g: Graph, source_vids: np.ndarray | None = None,
                        directed: bool = False) -> np.ndarray:
    """harmonic(v) = Σ_{u ≠ v, d < ∞} 1/d(v,u) (Boldi & Vigna 2014) —
    the robust-to-disconnection closeness variant, over the same batched
    multi-source BFS columns as closeness_centrality (per-chunk inverse
    sums folded in fixed range order; cross-range order differs from a
    dense row sum only in the last ulps, inside the 6-dp parity margin)."""
    si_all = _all_sources(g, source_vids)
    out = []
    for si in _source_blocks(si_all, _auto_block(g, 256, 1)):
        _, fwd = multi_source_reach(g, si, directed=directed)
        parts = ray.get([_harmonic_chunk_task.remote(c) for c in fwd])
        tot = parts[0]
        for p in parts[1:]:
            tot = tot + p
        out.append(tot)
    return np.concatenate(out) if out else np.zeros(0, np.float64)


def landmark_distances(g: Graph, k: int = 16, directed: bool = False):
    """Landmark-based distance oracle (Potamias et al. 2009): BFS columns
    from the ``k`` highest-degree vertices (ties → lowest vid — the
    standard degree heuristic picks hubs most shortest paths route
    through). → (landmark_vids (k,), dist (nv, k)) — the sketch behind
    O(k) approximate point-to-point distance queries
    ``d̂(u,v) = min_l d(u,l) + d(l,v)`` (an upper bound; exact when some
    landmark lies on a shortest u-v path). One engine run of the SAME
    reach-only batched BFS as closeness/harmonic; the (nv, k) gather IS
    this function's return contract (k small — the sketch itself)."""
    deg = g.out_deg + g.in_deg
    order = np.lexsort((g.vids, -deg))
    marks = np.asarray(g.vids[order[:min(k, g.nv)]], np.uint64)
    eng, chunks = multi_source_reach(g, _dense_sources(g, marks),
                                     directed=directed)
    d16 = eng._gather_chunks(chunks)["dist"]
    dist = np.where(d16 == UNREACHED, np.inf, d16.astype(np.float64))
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
    v ≠ s. One batched multi-source BFS run; integer hop sums reduced per
    chunk, one float division. → dict(radius_est, diameter_lb, avg_dist,
    n_pairs)."""
    srcs = np.sort(np.asarray(g.vids, np.uint64))[:min(n_sources, g.nv)]
    si_all = _dense_sources(g, srcs)
    tot = 0
    n_pairs = 0
    eccs = []
    for si in _source_blocks(si_all, _auto_block(g, 256, 1)):
        _, fwd = multi_source_reach(g, si, directed=False)
        parts = ray.get([_distance_summary_chunk_task.remote(c) for c in fwd])
        ecc = np.max([p[0] for p in parts], axis=0)
        reach = np.any([p[1] for p in parts], axis=0)
        # a sampled source reaching nothing has NO eccentricity (the SQL
        # replay's GROUP BY over d>0 rows likewise emits no row for it) —
        # folding it in as ecc=0 would drag radius_est to 0
        eccs.append(ecc[reach])
        tot += sum(p[2] for p in parts)
        n_pairs += sum(p[3] for p in parts)
    ecc = np.concatenate(eccs) if eccs else np.zeros(0)
    return {
        "radius_est": int(ecc.min()) if len(ecc) else 0,
        "diameter_lb": int(ecc.max()) if len(ecc) else 0,
        "avg_dist": (tot / n_pairs) if n_pairs else 0.0,
        "n_pairs": n_pairs,
    }
