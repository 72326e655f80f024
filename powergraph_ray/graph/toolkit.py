"""Further toolkit programs: k-core, approximate diameter, graph coloring,
CC stats — the rest of graph_analytics (SURVEY.md §2.6) on the GAS engine.
"""

from __future__ import annotations

import numpy as np

from ..ids import integer_mix
from .gas import GASEngine, Graph, VertexProgram, split_dense


class KCoreVP(VertexProgram):
    """K-core decomposition for one K (kcore.cpp:55-120, 150-270):
    repeatedly delete vertices whose remaining degree < K; the reference's
    deletion messages carrying removed-adjacent-edge counts become a dense
    remaining-degree recount per superstep (same fixed point; the message
    form is an incremental optimization of this recount).

    bundle: ``alive`` bool, ``value`` = remaining degree (within the core
    subgraph). Terminates when no vertex dies in a superstep.
    """

    name = "kcore"
    broadcast_keys = ("alive",)
    shardable = True

    def __init__(self, k: int, max_iter: int = 10_000) -> None:
        self.k = k
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        nv = graph.nv
        return {"alive": np.ones(nv, bool), "value": np.zeros(nv, np.int64)}

    def partial(self, src, dst, nv, iteration, alive):
        m = alive[src] & alive[dst]
        deg = np.bincount(src[m], minlength=nv)
        deg += np.bincount(dst[m], minlength=nv)
        return deg.astype(np.int64)

    @staticmethod
    def merge(a, b):
        return a + b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        alive = bundle["alive"]
        dead = alive & (total < self.k)
        new_alive = alive & ~dead
        return ({"alive": new_alive, "value": np.where(new_alive, total, 0)},
                int(dead.sum()), float(dead.sum()))

    def apply(self, bundle, total, iteration):
        nv = len(bundle["alive"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def run_kcore(graph: Graph, k: int, checkpoint_path: str | None = None,
              resume: bool = False):
    """→ (vids, in_core bool array, core-degree array, engine)."""
    vp = KCoreVP(k)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume,
                    lineage_extra={"k": k})
    bundle = eng.run()
    return graph.vids, bundle["alive"], bundle["value"], eng



def _min_free_color(u: np.ndarray) -> np.ndarray:
    """Lowest zero bit of each row of a (n, W)-word used-color bitmask —
    the shared min-free-color scan of both coloring variants."""
    free = np.full(len(u), -1, np.int32)
    undecided = np.ones(len(free), bool)
    for w in range(u.shape[1]):
        inv = ~u[:, w]
        has = undecided & (inv != 0)
        if has.any():
            bitpos = np.zeros(len(free), np.int64)
            x = inv[has]
            lsb = (x & (~x + np.uint64(1)))
            bitpos[has] = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
            free[has] = (64 * w + bitpos[has]).astype(np.int32)
            undecided &= ~has
    if undecided.any():
        # all 256 colors used by neighbors: fail loudly instead of spinning
        # uncolored for max_iter supersteps and emitting -1 colors
        raise ValueError("graph degeneracy exceeds the 256-color palette "
                         "(a vertex's neighbors use every color)")
    return free


class ColoringVP(VertexProgram):
    """Greedy graph coloring (simple_coloring.cpp: gather = set-union of
    neighbor colors, apply = min free color). The reference relies on the
    async engine's edge-consistency for validity; under BSP we use the
    classic parallel variant (Jones–Plassmann): a vertex colors itself when
    it holds the max hash-priority among its *uncolored* neighbors, choosing
    the smallest color absent from its colored neighborhood (bitmask gather,
    256 colors max — beyond any test graph's degeneracy).

    bundle: ``value`` int32 color (-1 = uncolored). Deterministic: priority =
    ``integer_mix(global vid)``, ties broken by vid.
    """

    name = "coloring"
    broadcast_keys = ("value",)
    shardable = True
    MAXC = 256

    def __init__(self, prio_ref=None, max_iter: int = 10_000) -> None:
        self.prio_ref = prio_ref
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def prepare(self, graph: Graph) -> None:
        if self.prio_ref is None:
            import ray

            # unique deterministic priority: mix then rank (vid tie-break)
            h = integer_mix(graph.vids)
            order = np.lexsort((graph.vids, h))
            prio = np.empty(graph.nv, np.int64)
            prio[order] = np.arange(graph.nv)
            self.prio_ref = ray.put(prio)

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        return {"value": np.full(graph.nv, -1, np.int32)}

    def partial(self, src, dst, nv, iteration, value):
        import ray

        prio = ray.get(self.prio_ref)
        W = self.MAXC // 64
        used = np.zeros((nv, W), np.uint64)        # colors used by neighbors
        blocked = np.zeros(nv, np.int64)           # max uncolored-nbr priority
        for u, v in ((src, dst), (dst, src)):
            colored = value[v] >= 0
            cu, cv = u[colored], value[v[colored]].astype(np.int64)
            np.bitwise_or.at(used, (cu, cv // 64), np.uint64(1) << (cv % 64).astype(np.uint64))
            un = ~colored
            np.maximum.at(blocked, u[un], prio[v[un]] + 1)  # +1 so 0 = none
        return used, blocked

    @staticmethod
    def merge(a, b):
        return a[0] | b[0], np.maximum(a[1], b[1])

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        import ray

        used, blocked = total
        value = bundle["value"]
        prio = ray.get(self.prio_ref)[lo:hi]
        win = (value < 0) & (prio + 1 > blocked)
        if win.any():
            newval = value.copy()
            newval[win] = _min_free_color(used[win])
        else:
            newval = value
        n_uncolored = int((newval < 0).sum())
        changed = int(win.sum())
        # keep running while anything is uncolored; a superstep always colors
        # at least the global max-priority uncolored vertex
        return {"value": newval}, n_uncolored, float(changed)

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def run_coloring(graph: Graph, checkpoint_path: str | None = None,
                 resume: bool = False):
    """→ (vids, colors int32, engine)."""
    vp = ColoringVP()
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume)
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


def run_coloring_degree_ordered(graph: Graph, checkpoint_path: str | None = None,
                                resume: bool = False):
    """Degree-ordered coloring (degree_ordered_coloring.cpp: vertices are
    processed in descending degree order): same Jones–Plassmann superstep,
    but priority = rank by (total degree, vid) — high-degree vertices win
    ties and color first, which tends to lower the color count on skewed
    graphs. → (vids, colors int32, engine)."""
    import ray

    deg = graph.out_deg + graph.in_deg
    order = np.lexsort((graph.vids, deg))  # ascending; later rank = higher prio
    prio = np.empty(graph.nv, np.int64)
    prio[order] = np.arange(graph.nv)
    vp = ColoringVP(prio_ref=ray.put(prio))
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume)
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


class SaturationColoringVP(ColoringVP):
    """Saturation-ordered coloring (saturation_ordered_coloring.cpp: the
    next vertex to color is the one with the most distinctly-colored
    neighbors — DSATUR). BSP adaptation: the per-round priority is the
    *dynamic* key ``saturation·nv + static rank`` recomputed from the shared
    broadcast state, so every partition agrees on the order and two adjacent
    uncolored vertices can never both win a round (ranks are unique)."""

    name = "coloring_sat"
    broadcast_keys = ("value", "sat")

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        return {"value": np.full(graph.nv, -1, np.int32),
                "sat": np.zeros(graph.nv, np.int64)}

    def partial(self, src, dst, nv, iteration, value, sat):
        import ray

        prio = sat * np.int64(nv) + ray.get(self.prio_ref)
        W = self.MAXC // 64
        used = np.zeros((nv, W), np.uint64)
        blocked = np.zeros(nv, np.int64)
        for u, v in ((src, dst), (dst, src)):
            colored = value[v] >= 0
            cu, cv = u[colored], value[v[colored]].astype(np.int64)
            np.bitwise_or.at(used, (cu, cv // 64), np.uint64(1) << (cv % 64).astype(np.uint64))
            un = ~colored
            np.maximum.at(blocked, u[un], prio[v[un]] + 1)
        return used, blocked

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        import ray

        used, blocked = total
        value = bundle["value"]
        rank = ray.get(self.prio_ref)[lo:hi]
        prio = bundle["sat"] * np.int64(nv) + rank
        win = (value < 0) & (prio + 1 > blocked)
        newval = value.copy()
        if win.any():
            newval[win] = _min_free_color(used[win])
        # saturation for the next round = #distinct neighbor colors (popcount
        # of the used mask) — recomputed for every vertex each superstep
        bytes_ = used.view(np.uint8)
        newsat = np.unpackbits(bytes_, axis=1).sum(axis=1).astype(np.int64)
        n_uncolored = int((newval < 0).sum())
        return {"value": newval, "sat": newsat}, n_uncolored, float(win.sum())

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def run_coloring_saturation_ordered(graph: Graph, checkpoint_path: str | None = None,
                                    resume: bool = False):
    """→ (vids, colors int32, engine)."""
    vp = SaturationColoringVP()
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume)
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


class DiameterVP(VertexProgram):
    """Approximate diameter via Flajolet–Martin neighborhood sketches
    (approximate_diameter.cpp:48-77): each vertex holds ``B`` duplicated
    32-bit FM bitmasks, OR-merged from ALL neighbors every hop; the hop count
    at which the global neighborhood-size estimate stops growing (< 1+eps) is
    the diameter estimate.

    bundle ``value``: (nv, B) uint32 masks. Deterministic bit choice:
    geometric bit = count-trailing-zeros of ``integer_mix(vid * B + i)``.
    """

    name = "approx_diameter"
    broadcast_keys = ("value",)
    shardable = True
    B = 10

    def __init__(self, eps: float = 1e-4, max_iter: int = 100) -> None:
        self.eps = eps
        self._max_iter = max_iter
        self.estimates: list[float] = []

    def max_iterations(self) -> int:
        return self._max_iter

    @classmethod
    def init_masks(cls, vids: np.ndarray) -> np.ndarray:
        nv = len(vids)
        i = np.arange(cls.B, dtype=np.uint64)
        h = integer_mix(np.asarray(vids, np.uint64)[:, None] * np.uint64(cls.B) + i[None, :])
        # trailing-zero count capped at 31 (the FM geometric bit): isolate the
        # lowest set bit, log2 is exact for powers of two
        lsb = (h & (~h + np.uint64(1))).astype(np.float64)
        bit = np.where(h == 0, 31,
                       np.minimum(np.log2(np.maximum(lsb, 1.0)).round().astype(np.int64), 31))
        return (np.uint32(1) << bit.astype(np.uint32)).astype(np.uint32)

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        return {"value": self.init_masks(graph.vids)}

    def partial(self, src, dst, nv, iteration, value):
        msgs = np.zeros((nv, self.B), np.uint32)
        np.bitwise_or.at(msgs, dst, value[src])
        np.bitwise_or.at(msgs, src, value[dst])
        return msgs

    @staticmethod
    def merge(a, b):
        return a | b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    @staticmethod
    def _estimate(masks: np.ndarray) -> float:
        """FM count estimate summed over vertices: mean lowest-zero-bit over
        the B masks per vertex → 2^b / 0.77351 (approximate_diameter.cpp)."""
        # lowest-zero-bit index = trailing-zero count of ~mask
        inv = (~masks).astype(np.uint32)
        lsb = (inv & (~inv + np.uint32(1))).astype(np.float64)
        b = np.where(inv == 0, 32.0, np.log2(np.maximum(lsb, 1.0)).round())
        return float((2.0 ** b.mean(axis=1) / 0.77351).sum())

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        value = bundle["value"]
        newval = value | total
        changed = (newval != value).any(axis=1)
        # chunk stat carries the chunk's estimate; driver-side termination
        # uses the summed estimate ratio via the engine metrics (l1_delta)
        est = self._estimate(newval)
        return {"value": newval}, int(changed.sum()), est

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def run_approx_diameter(graph: Graph, eps: float = 1e-4, max_iter: int = 100) -> tuple[int, list[float]]:
    """→ (diameter estimate, per-hop neighborhood-size estimates).

    Runs hop supersteps until the global estimate growth falls below 1+eps
    (approximate_diameter.cpp main loop), like the reference checking
    ``current < previous * (1+eps)``.
    """
    vp = DiameterVP(eps=eps, max_iter=max_iter)
    eng = GASEngine(graph, vp, max_iterations=max_iter)
    # custom loop on the metrics: l1_delta carries the estimate sum
    bundle = eng.run_until(lambda prev, cur: cur < prev * (1.0 + eps))
    ests = [m["l1_delta"] for m in eng.metrics]
    # diameter = first hop where growth stopped (reference reports the hop
    # count at convergence)
    return max(0, len(ests) - 1), ests


def run_kcore_decomposition(graph: Graph, kmin: int = 1, kmax: int | None = None):
    """The kcore.cpp driver loop (kcore.cpp:150-270): peel for each K in
    [kmin, kmax] (stopping early once the core empties) → per-vertex core
    number (largest K whose core contains the vertex; 0 if below kmin).
    Each K-pass reuses the resident edge-partition pool."""
    if kmax is None:
        kmax = int((graph.out_deg + graph.in_deg).max())
    core = np.zeros(graph.nv, np.int64)
    for k in range(kmin, kmax + 1):
        _, alive, _, _ = run_kcore(graph, k)
        if not alive.any():
            break
        core[alive] = k
    return graph.vids, core


def maximal_independent_set(graph: Graph):
    """→ (vids_in_mis uint64): a maximal independent set of the undirected
    simple graph — the color-0 class of the degree-ordered Jones–Plassmann
    coloring (degree_ordered_coloring.cpp's priority). Correctness is
    structural, not heuristic: in any proper min-free-color greedy coloring
    the 0-class is independent (the coloring is proper) AND maximal (a
    vertex colored > 0 skipped color 0 only because a neighbor already held
    it). Deterministic — same priorities, same MIS — and SQL-replayable via
    the coloring oracle's recursive-CTE BSP replay."""
    vids, colors, _ = run_coloring_degree_ordered(graph)
    return vids[np.asarray(colors) == 0]


def densest_subgraph(edges_ds, eps: float = 0.1, max_rounds: int = 10_000):
    """Greedy densest-subgraph peeling (Bahmani, Kumar & Vassilvitskii
    2012 — the MapReduce-native 2(1+ε)-approximation of Charikar's greedy):
    each round measures the density ρ = E/V of the alive edge-induced
    subgraph, then removes EVERY alive vertex with alive-degree ≤ 2(1+ε)·ρ
    (the average degree is 2ρ, so at least the ≤-average half qualifies and
    rounds are O(log n) — a (1+ε)·ρ cutoff would strand any near-regular
    remainder forever). The answer is the alive set at the round where ρ
    peaked.

    → (pandas (vid, peel_round, in_densest), best_density, best_round):
    ``peel_round`` = the 1-based round a vertex was removed in;
    ``in_densest`` ⇔ peel_round ≥ best_round (alive when ρ peaked).
    Per round: ONE pass over the edge shards (sparse alive-degree partials,
    as the engine's pre-reduced gathers) with the alive mask broadcast via
    ray.put; driver state is the dense peel_round array (toolkit path).
    The threshold is computed as literally ``2.2 * (E/V)`` in float64 so
    the DuckDB replay (sql_densest_subgraph) hits the identical doubles."""
    import pandas as pd
    import ray
    import ray.data

    from .triangles import _canonical_dedup

    canon = _canonical_dedup(edges_ds).materialize()

    def batch_vids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": np.unique(np.concatenate(
            [df["a"].to_numpy(), df["b"].to_numpy()]))})

    vids = np.unique(canon.map_batches(batch_vids, batch_format="pandas")
                     .to_pandas()["v"].to_numpy()).astype(np.int64)
    nv = len(vids)
    vref = ray.put(vids)
    peel_round = np.zeros(nv, np.int64)
    alive = np.ones(nv, bool)
    best_rho, best_round = -1.0, 0

    for rnd in range(1, max_rounds + 1):
        n_alive = int(alive.sum())
        if n_alive == 0:
            break
        aref = ray.put(alive)

        def part(df: pd.DataFrame, _a=aref, _v=vref) -> pd.DataFrame:
            al = ray.get(_a)
            t = ray.get(_v)
            a = np.searchsorted(t, df["a"].to_numpy())
            b = np.searchsorted(t, df["b"].to_numpy())
            m = al[a] & al[b]
            ids = np.concatenate([a[m], b[m]])
            if not len(ids):
                return pd.DataFrame({"i": pd.array([], dtype="int64"),
                                     "c": pd.array([], dtype="int64"),
                                     "e": pd.array([], dtype="int64")})
            ids.sort()
            st = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            cnt = np.diff(np.r_[st, len(ids)])
            e = np.zeros(len(st), np.int64)
            e[0] = int(m.sum())
            return pd.DataFrame({"i": ids[st], "c": cnt, "e": e})

        parts = canon.map_batches(part, batch_format="pandas").to_pandas()
        deg = np.zeros(nv, np.int64)
        np.add.at(deg, parts["i"].to_numpy().astype(np.int64),
                  parts["c"].to_numpy().astype(np.int64))
        n_edges = int(parts["e"].sum())
        rho = np.float64(n_edges) / np.float64(n_alive)
        if rho > best_rho:
            best_rho, best_round = float(rho), rnd
        thr = np.float64(2.0 * (1.0 + eps)) * rho
        drop = alive & (deg <= thr)
        peel_round[drop] = rnd
        alive &= ~drop
    else:
        raise RuntimeError(f"densest_subgraph: no fixed point in "
                           f"{max_rounds} rounds")

    return (pd.DataFrame({"vid": vids,
                          "peel_round": peel_round,
                          "in_densest": peel_round >= best_round}),
            best_rho, best_round)


# ---------------------------------------------------------------------------
# PageRank-Nibble local clustering (Andersen, Chung & Lang 2006)
# ---------------------------------------------------------------------------

def ppr_nibble(graph: Graph, edges_ds, source_vid: int, iterations: int = 5,
               sweep_m: int = 100):
    """Local community of ``source_vid`` by the PPR sweep cut: rank vertices
    by (round6(ppr) DESC, vid), sweep prefixes S_r over the top ``sweep_m``
    ranks, return the minimum-conductance prefix
    ``φ(S) = cut(S) / min(vol(S), vol(V)−vol(S))`` on the simple undirected
    graph. Scale shape: PPR is the engine's fixed-K superstep run; the sweep
    needs ONE task per canonical-edge block (each emits an O(m) cut-delta +
    degree histogram against the broadcast top-m rank table — never O(nv)
    driver state) and an O(m) driver epilogue. Conductances are exact
    integer ratios, so the DuckDB replay (sql_ppr_nibble) picks the
    identical argmin. → DataFrame (vid, rank 1-based, phi) of the winning
    prefix."""
    import pyarrow as pa
    import pandas as pd
    import ray

    from ..graph.algorithms import run_ppr
    from ..ids import round_half_away
    from .triangles import _canonical_dedup

    vids, scores, _ = run_ppr(graph, source_vid, iterations=iterations)
    r6 = round_half_away(scores, 6)
    order = np.lexsort((vids, -r6))
    m = int(min(sweep_m, graph.nv))
    top = np.asarray(vids[order[:m]], np.int64)
    tsort = np.argsort(top, kind="stable")
    tv, trk = top[tsort], tsort.astype(np.int64) + 1  # vid-sorted, 1-based

    cp = _canonical_dedup(edges_ds, as_uint64=False).materialize()

    @ray.remote
    def block_sweep(t):
        a = np.asarray(t["a"], np.int64) if "a" in t.schema.names \
            else np.empty(0, np.int64)
        b = np.asarray(t["b"], np.int64) if len(a) else np.empty(0, np.int64)

        def rank_of(x):
            p = np.searchsorted(tv, x)
            p = np.minimum(p, max(len(tv) - 1, 0))
            r = np.full(len(x), m + 1, np.int64)
            if len(tv):
                hit = tv[p] == x
                r[hit] = trk[p[hit]]
            return r

        ra, rb = rank_of(a), rank_of(b)
        lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
        delta = np.zeros(m + 2, np.int64)
        inb = lo <= m
        np.add.at(delta, lo[inb], 1)
        np.add.at(delta, np.minimum(hi[inb], m + 1), -1)
        deg = (np.bincount(ra[ra <= m], minlength=m + 2)
               + np.bincount(rb[rb <= m], minlength=m + 2))[1:m + 1]
        return delta, deg, len(a)

    parts = ray.get([block_sweep.remote(ref) for ref in cp.to_arrow_refs()])
    delta = sum(p[0] for p in parts)
    deg = sum(p[1] for p in parts)
    n_edges = sum(p[2] for p in parts)

    cut = np.cumsum(delta)[1:m + 1]          # cut(r), r = 1..m
    vol = np.cumsum(deg)                     # vol(S_r)
    tot = 2 * n_edges
    side = np.minimum(vol, tot - vol)
    valid = side > 0
    phi = np.full(m, np.inf)
    phi[valid] = cut[valid] / side[valid]
    phi6 = round_half_away(phi[valid], 6)
    rs = np.flatnonzero(valid) + 1
    best_i = np.lexsort((rs, phi6))[0]
    best_r, best_phi = int(rs[best_i]), float(phi6[best_i])

    keep = trk <= best_r
    out = pd.DataFrame({"vid": tv[keep], "rank": trk[keep],
                        "phi": np.full(int(keep.sum()), best_phi)})
    return out.sort_values("rank").reset_index(drop=True)


def run_effective_diameter(graph: Graph, fraction: float = 0.9,
                           eps: float = 1e-4, max_iter: int = 100):
    """Effective diameter (ANF, Palmer et al. 2002 §3): the smallest hop h
    whose FM neighborhood-size estimate reaches ``fraction`` of the
    converged estimate — the robust "90% of pairs connect within h"
    distance statistic (the full diameter chases sketch-noise tails).
    Reuses run_approx_diameter's per-hop estimates verbatim.
    → (effective_hops, diameter_hops, per-hop estimates)."""
    dia, ests = run_approx_diameter(graph, eps=eps, max_iter=max_iter)
    if not ests:
        return 0, dia, ests
    final = ests[dia - 1] if dia >= 1 else ests[0]
    eff = next((h for h, e in enumerate(ests, start=1)
                if e >= fraction * final), dia)
    return min(eff, dia) if dia >= 1 else eff, dia, ests


# ---------------------------------------------------------------------------
# maximal matching / 2-approx vertex cover (Luby-style hash priorities)
# ---------------------------------------------------------------------------

_MM_C1 = np.uint64(0xFF51AFD7ED558CCD)
_MM_C2 = np.uint64(0xC4CEB9FE1A85EC53)
_MM_C3 = np.uint64(0x9E3779B97F4A7C15)


def _mm_prio(a: np.ndarray, b: np.ndarray, rnd: int, seedmix) -> np.ndarray:
    """63-bit edge priority (top bit dropped so int64 min-order == uint64
    min-order through pandas shuffles)."""
    with np.errstate(over="ignore"):
        h = integer_mix(a.view(np.uint64) * _MM_C1
                        ^ b.view(np.uint64) * _MM_C2
                        ^ np.uint64(rnd) * _MM_C3 ^ seedmix)
    return (h >> np.uint64(1)).view(np.int64)


def maximal_matching(edges_ds, seed: int = 7, n_buckets: int = 64,
                     max_rounds: int = 200, local_threshold: int = 500_000):
    """Distributed maximal matching by synchronous hash-priority rounds
    (the edge-level Luby symmetry breaker — same discipline as the
    Jones–Plassmann coloring): each round every alive edge draws a
    deterministic 63-bit priority; an edge joins the matching iff its
    priority is the minimum among alive edges at BOTH endpoints; matched
    endpoints die and their edges drop. O(log m) rounds in expectation.
    (Two distinct incident edges drawing the same 63-bit priority could
    select a non-matching pair — probability ~2^-63 per wedge, accepted
    and replayed identically by the SQL oracle.)

    Per round: ONE bucket-co-located per-vertex min + half-select, one
    (a, b) both-sides confirm, and one covered-endpoint anti-join — all
    coarse-bucket shuffles over the shrinking alive set, no driver edge
    state. → (matched Dataset (a, b, round), n_rounds). The matched
    endpoint set is a ≤2× vertex cover (every edge is incident to a
    matched vertex by maximality)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ..stages.agg import bucketed_agg
    from .triangles import _canonical_dedup

    seedmix = integer_mix(np.uint64(seed))
    cur = _canonical_dedup(edges_ds, as_uint64=False).materialize()
    matched_parts = []
    rnd = 0
    while rnd < max_rounds:
        m_alive = cur.count()
        if m_alive == 0:
            break
        if m_alive <= local_threshold:
            # tail rounds each pay the full multi-shuffle latency floor on
            # a shrinking set — finish driver-locally with the IDENTICAL
            # vectorized rule (louvain's small-level discipline); results
            # are bit-equal because the rule is deterministic
            df = cur.to_pandas()
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            la, lb, lr = [], [], []
            while len(a) and rnd < max_rounds:
                p = _mm_prio(a, b, rnd, seedmix)
                v = np.r_[a, b]
                pp = np.r_[p, p]
                o = np.lexsort((pp, v))
                vs, ps = v[o], pp[o]
                starts = np.r_[0, np.flatnonzero(np.diff(vs)) + 1]
                vmin_v = vs[starts]
                vmin_p = ps[starts]
                pa_ = vmin_p[np.searchsorted(vmin_v, a)]
                pb_ = vmin_p[np.searchsorted(vmin_v, b)]
                selm = (p == pa_) & (p == pb_)
                if selm.any():
                    la.append(a[selm])
                    lb.append(b[selm])
                    lr.append(np.full(int(selm.sum()), rnd, np.int64))
                    cov = np.unique(np.r_[a[selm], b[selm]])
                    keepm = ~(np.isin(a, cov) | np.isin(b, cov))
                    a, b = a[keepm], b[keepm]
                rnd += 1
            if la:
                matched_parts.append(ray.data.from_arrow(pa.table({
                    "a": pa.array(np.concatenate(la)),
                    "b": pa.array(np.concatenate(lb)),
                    "round": pa.array(np.concatenate(lr))})))
            break

        def emit(t: pa.Table, _r=rnd) -> pd.DataFrame:
            if "a" not in t.schema.names or t.num_rows == 0:
                return pd.DataFrame({"_bkt": pd.Series([], dtype="int64"),
                                     "v": pd.Series([], dtype="int64"),
                                     "ea": pd.Series([], dtype="int64"),
                                     "eb": pd.Series([], dtype="int64"),
                                     "prio": pd.Series([], dtype="int64")})
            a = np.asarray(t["a"], np.int64)
            b = np.asarray(t["b"], np.int64)
            p = _mm_prio(a, b, _r, seedmix)
            v = np.r_[a, b]
            # both half-rows carry cur's OWN canonical (ea, eb) — a local
            # min/max would re-orient pairs crossing the 2^63 bit-cast
            # boundary differently from _canonical_dedup's true-uint64
            # order (and ships one redundant column)
            return pd.DataFrame({
                "_bkt": (integer_mix(v.view(np.uint64))
                         % np.uint64(n_buckets)).astype(np.int64),
                "v": v, "ea": np.r_[a, a], "eb": np.r_[b, b],
                "prio": np.r_[p, p]})

        def half_select(g: pd.DataFrame) -> pd.DataFrame:
            """Rows whose prio equals their vertex's min → one 'side
            vote' per (canonical edge, endpoint)."""
            v = g["v"].to_numpy(np.int64)
            p = g["prio"].to_numpy(np.int64)
            o = np.lexsort((p, v))
            vs, ps = v[o], p[o]
            starts = np.r_[0, np.flatnonzero(np.diff(vs)) + 1]
            mins = ps[starts]
            mv = np.repeat(mins, np.diff(np.r_[starts, len(vs)]))
            keep = ps == mv
            return pd.DataFrame({"ea": g["ea"].to_numpy(np.int64)[o][keep],
                                 "eb": g["eb"].to_numpy(np.int64)[o][keep]})

        votes = (cur.map_batches(emit, batch_format="pyarrow")
                 .groupby("_bkt").map_groups(half_select,
                                             batch_format="pandas"))
        sel = bucketed_agg(votes, ["ea", "eb"], {"n": (None, "count")})

        def selected_only(df: pd.DataFrame) -> pd.DataFrame:
            m = df["n"].to_numpy() == 2  # min at BOTH endpoints
            return pd.DataFrame({"a": df["ea"].to_numpy(np.int64)[m],
                                 "b": df["eb"].to_numpy(np.int64)[m]})

        sel = sel.map_batches(selected_only,
                              batch_format="pandas").materialize()
        if sel.count() == 0:
            # no edge won at both endpoints this round (possible only via
            # priority ties); re-roll next round's priorities
            rnd += 1
            continue
        matched_parts.append(sel.map_batches(
            lambda d, _r=rnd: d.assign(round=np.int64(_r)),
            batch_format="pandas"))

        # anti-join: drop edges with a matched endpoint (bucket by each
        # endpoint in turn; matched-vertex rows ride the same shuffle)
        def cov_rows(df: pd.DataFrame) -> pd.DataFrame:
            v = np.r_[df["a"].to_numpy(np.int64),
                      df["b"].to_numpy(np.int64)]
            return pd.DataFrame({"v": v})

        cov = sel.map_batches(cov_rows, batch_format="pandas")

        def filter_side(side):
            def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
                key = df[side].to_numpy(np.int64)
                return pd.DataFrame({
                    "_bkt": (integer_mix(key.view(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64),
                    "key": key,
                    "a": df["a"].to_numpy(np.int64),
                    "b": df["b"].to_numpy(np.int64),
                    "is_cov": np.zeros(len(df), np.int64)})

            def tag_cov(df: pd.DataFrame) -> pd.DataFrame:
                v = df["v"].to_numpy(np.int64)
                return pd.DataFrame({
                    "_bkt": (integer_mix(v.view(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64),
                    "key": v, "a": v, "b": v,
                    "is_cov": np.ones(len(v), np.int64)})

            def drop_covered(g: pd.DataFrame) -> pd.DataFrame:
                covs = np.unique(g.loc[g["is_cov"] == 1, "key"]
                                 .to_numpy(np.int64))
                em = g[g["is_cov"] == 0]
                key = em["key"].to_numpy(np.int64)
                hit = np.isin(key, covs)
                return pd.DataFrame({"a": em["a"].to_numpy(np.int64)[~hit],
                                     "b": em["b"].to_numpy(np.int64)[~hit]})

            return tag_edge, tag_cov, drop_covered

        alive = cur
        for side in ("a", "b"):
            tag_edge, tag_cov, drop_covered = filter_side(side)
            alive = (alive.map_batches(tag_edge, batch_format="pandas")
                     .union(cov.map_batches(tag_cov, batch_format="pandas"))
                     .groupby("_bkt").map_groups(drop_covered,
                                                 batch_format="pandas"))
        cur = alive.materialize()
        rnd += 1

    if matched_parts:
        out = matched_parts[0]
        for p in matched_parts[1:]:
            out = out.union(p)
    else:
        out = ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "round": pa.array([], pa.int64())}))
    return out, rnd


def vertex_cover(edges_ds, seed: int = 7, n_buckets: int = 64):
    """2-approximate minimum vertex cover = both endpoints of a maximal
    matching (Gavril/Yannakakis) → (vid) Dataset, distinct sorted."""
    from ..stages.agg import bucketed_agg

    matched, _ = maximal_matching(edges_ds, seed=seed, n_buckets=n_buckets)

    def ends(df) -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame({"vid": np.r_[df["a"].to_numpy(np.int64),
                                          df["b"].to_numpy(np.int64)]})

    return bucketed_agg(matched.map_batches(ends, batch_format="pandas"),
                        ["vid"], {"_n": (None, "count")}) \
        .select_columns(["vid"]).sort("vid")
