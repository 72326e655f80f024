"""The warp-engine user API re-expressed (engine/warp_*.hpp):

- ``map_reduce_neighborhood`` (warp_graph_mapreduce.hpp:392)
- ``transform_neighborhood`` (warp_graph_transform.hpp:111)
- ``broadcast_neighborhood`` (warp_graph_broadcast.hpp:121)
- ``parfor_all_vertices`` (warp_parfor_all_vertices.hpp:106)

The reference's warp engine lets an update function imperatively interleave
fine-grained neighborhood map-reduces on blocking fibers; under bulk
execution each such call IS one fused gather(+apply) superstep, so the API
maps onto a single-superstep vertex program over the resident edge
partitions (SURVEY.md §2.4). ``edge_map`` kernels are numpy-vectorized over
(neighbor values, center values) edge arrays; ``combine`` is the
commutative monoid ("sum" | "min" | "max").
"""

from __future__ import annotations

import numpy as np

from .gas import GASEngine, Graph, VertexProgram, split_dense

#: monoid identities; "or" is the set-union gather of warp_coloring.cpp:65-100
#: (a boost::unordered_set there, a fixed-width uint64 bitmask here)
_IDENT = {"sum": 0.0, "min": np.inf, "max": -np.inf, "or": 0}


class _NeighborhoodVP(VertexProgram):
    """One-superstep gather: per-edge ``edge_map(nbr_vals, center_vals)``
    contributions reduced into each center by the monoid. ``width > 1``
    gathers a per-vertex vector (e.g. a color-set bitmask): ``edge_map``
    then returns an (E, width) array."""

    name = "warp_neighborhood"
    broadcast_keys = ("value",)
    shardable = True

    def __init__(self, edge_map, combine: str, direction: str,
                 width: int = 1, dtype=np.float64) -> None:
        assert combine in ("sum", "min", "max", "or")
        assert direction in ("in", "out", "all")
        self.edge_map = edge_map
        self.combine = combine
        self.direction = direction
        self.width = width
        self.dtype = dtype

    def init_bundle(self, graph):  # bundle injected by the caller
        raise NotImplementedError

    def _accum(self, msgs, centers, contrib):
        if self.combine == "sum":
            np.add.at(msgs, centers, contrib)
        elif self.combine == "min":
            np.minimum.at(msgs, centers, contrib)
        elif self.combine == "max":
            np.maximum.at(msgs, centers, contrib)
        else:
            np.bitwise_or.at(msgs, centers, contrib)

    def _identity(self, nv: int) -> np.ndarray:
        shape = (nv, self.width) if self.width > 1 else nv
        return np.full(shape, _IDENT[self.combine], self.dtype)

    def partial(self, src, dst, nv, iteration, value):
        msgs = self._identity(nv)
        if self.direction in ("in", "all"):   # gather over IN edges: center=dst
            self._accum(msgs, dst, np.asarray(self.edge_map(value[src], value[dst]), self.dtype))
        if self.direction in ("out", "all"):  # center=src, neighbor=dst
            self._accum(msgs, src, np.asarray(self.edge_map(value[dst], value[src]), self.dtype))
        return msgs

    @staticmethod
    def merge(a, b):
        # the instance combine is not available in the classmethod fallback;
        # merge is monkey-set per instance in __init__ of the runner
        raise NotImplementedError

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        return {"value": bundle["value"], "out": total}, 0, 0.0

    def apply(self, bundle, total, iteration):
        return self.apply_chunk(bundle, total, iteration, 0, len(total), len(total))


def _make_vp(edge_map, combine, direction, width=1, dtype=np.float64):
    vp = _NeighborhoodVP(edge_map, combine, direction, width, dtype)
    vp.merge = {"sum": lambda a, b: a + b,
                "min": np.minimum,
                "max": np.maximum,
                "or": np.bitwise_or}[combine]
    return vp


def map_reduce_neighborhood(g: Graph, values: np.ndarray, edge_map,
                            combine: str = "sum", direction: str = "in",
                            width: int = 1, dtype=None) -> np.ndarray:
    """Per-vertex neighborhood map-reduce → dense result array
    (warp::map_reduce_neighborhood). ``edge_map(nbr_vals, center_vals)``.
    ``combine="or"`` + ``width=W`` gathers uint64 bitmask vectors (the
    set-union gather of warp_coloring.cpp:65-100)."""
    if dtype is None:
        dtype = np.uint64 if combine == "or" else np.float64
    vp = _make_vp(edge_map, combine, direction, width, dtype)
    init = {"value": np.asarray(values),
            "out": vp._identity(g.nv)}
    eng = GASEngine(g, vp, max_iterations=1, init_bundle=init)
    return eng.run()["out"]


def transform_neighborhood(g: Graph, values: np.ndarray, edge_map, apply_fn,
                           combine: str = "sum",
                           direction: str = "in") -> np.ndarray:
    """Neighborhood map-reduce + vertex update in one pass
    (warp::transform_neighborhood): ``apply_fn(values, gathered) → new``."""
    gathered = map_reduce_neighborhood(g, values, edge_map, combine, direction)
    return np.asarray(apply_fn(np.asarray(values, np.float64), gathered), np.float64)


def broadcast_neighborhood(g: Graph, values: np.ndarray, edge_map, apply_fn,
                           combine: str = "sum") -> np.ndarray:
    """Center→neighbor broadcast with per-neighbor monoid combine + update
    (warp::broadcast_neighborhood) — the OUT-direction dual of gather."""
    return transform_neighborhood(g, values, edge_map, apply_fn, combine, "out")


def parfor_all_vertices(g: Graph, values: np.ndarray, fn) -> np.ndarray:
    """Vectorized for-each over vertices (warp::parfor_all_vertices)."""
    return np.asarray(fn(np.asarray(values)))


def warp_pagerank(g: Graph, iterations: int = 10) -> np.ndarray:
    """warp_pagerank2.cpp:148-159 re-expressed: K synchronous sweeps of
    ``parfor_all_local_vertices(update_function)`` where update =
    ``0.15 + 0.85 * map_reduce(IN, nbr.rank/nbr.out_deg)`` — one
    transform_neighborhood round per sweep."""
    out_deg = np.maximum(g.out_deg, 1).astype(np.float64)
    inv_ref = 1.0 / out_deg
    r = np.ones(g.nv, np.float64)
    for _ in range(iterations):
        winv = r * inv_ref

        def edge_map(nbr, center):
            return nbr  # nbr value is already rank/out_deg (winv broadcast)

        r = transform_neighborhood(
            g, winv, edge_map, lambda vals, tot: 0.15 + 0.85 * tot,
            combine="sum", direction="in")
    return r


#: the reference ships two warp PageRank apps; the fixed-sweep one is
#: warp_pagerank2.cpp — alias the faithful name
warp_pagerank2 = warp_pagerank


def warp_pagerank_dynamic(g: Graph, tol: float = 1e-2,
                          max_iter: int = 500) -> np.ndarray:
    """warp_pagerank.cpp:79-90 re-expressed: signal-driven updates —
    a vertex recomputes when signalled, and ``broadcast_signal(OUT_EDGES)``
    fires while ``|Δ| > tol``. The signal wave is itself a neighborhood
    map-reduce (max over IN edges of the sources' signal indicator), so each
    logical update round is two warp map-reduce supersteps."""
    out_deg = np.maximum(g.out_deg, 1).astype(np.float64)
    inv_ref = 1.0 / out_deg
    r = np.ones(g.nv, np.float64)
    signalled = np.ones(g.nv, bool)  # engine.signal_all() (warp_pagerank.cpp:160)
    for _ in range(max_iter):
        if not signalled.any():
            break
        winv = r * inv_ref
        gathered = map_reduce_neighborhood(
            g, winv, lambda nbr, center: nbr, combine="sum", direction="in")
        new_r = np.where(signalled, 0.15 + 0.85 * gathered, r)
        over_tol = (np.abs(new_r - r) > tol).astype(np.float64)
        # broadcast_signal(OUT_EDGES) = each target's max over IN-neighbors
        signalled = map_reduce_neighborhood(
            g, over_tol, lambda nbr, center: nbr, combine="max",
            direction="in") > 0.0
        r = new_r
    return r


def warp_coloring(g: Graph, max_iter: int = 10_000) -> np.ndarray:
    """warp_coloring.cpp re-expressed: gather the neighborhood's color SET
    (set_union_gather, :65-113 — here a 256-bit mask via ``combine="or"``),
    take the smallest absent color (:224-230), repeat for vertices whose
    color may still conflict. The reference serializes adjacent updates with
    edge-consistency fiber locks (:204-218); under BSP the equivalent is the
    same deterministic Jones–Plassmann priority used by toolkit.run_coloring
    (a vertex updates when it beats all uncolored neighbors), so the two
    apps produce identical colorings — asserted in tests."""
    from ..ids import integer_mix
    from .toolkit import ColoringVP, _min_free_color

    W = ColoringVP.MAXC // 64
    h = integer_mix(g.vids)
    order = np.lexsort((g.vids, h))
    prio = np.empty(g.nv, np.int64)
    prio[order] = np.arange(g.nv)
    colors = np.full(g.nv, -1, np.int32)

    def used_map(nbr, center):
        c = nbr.astype(np.int64)
        valid = c >= 0
        cc = np.clip(c, 0, ColoringVP.MAXC - 1)
        out = np.zeros((len(c), W), np.uint64)
        out[np.arange(len(c)), cc // 64] = np.where(
            valid, np.uint64(1) << (cc % 64).astype(np.uint64), np.uint64(0))
        return out

    def blocked_map(nbr, center):
        # nbr value = prio if uncolored else -1; +1 so 0 = "no blocker"
        return np.where(nbr >= 0, nbr + 1.0, 0.0)

    for _ in range(max_iter):
        uncolored = colors < 0
        if not uncolored.any():
            break
        used = map_reduce_neighborhood(g, colors, used_map,
                                       combine="or", direction="all", width=W)
        pv = np.where(uncolored, prio.astype(np.float64), -1.0)
        blocked = map_reduce_neighborhood(g, pv, blocked_map,
                                          combine="max", direction="all")
        win = uncolored & (prio + 1 > blocked)
        if win.any():
            colors[win] = _min_free_color(used[win])
    return colors
