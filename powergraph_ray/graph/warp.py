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

_IDENT = {"sum": 0.0, "min": np.inf, "max": -np.inf}


class _NeighborhoodVP(VertexProgram):
    """One-superstep gather: per-edge ``edge_map(nbr_vals, center_vals)``
    contributions reduced into each center by the monoid."""

    name = "warp_neighborhood"
    broadcast_keys = ("value",)
    shardable = True

    def __init__(self, edge_map, combine: str, direction: str) -> None:
        assert combine in ("sum", "min", "max")
        assert direction in ("in", "out", "all")
        self.edge_map = edge_map
        self.combine = combine
        self.direction = direction

    def init_bundle(self, graph):  # bundle injected by the caller
        raise NotImplementedError

    def _accum(self, msgs, centers, contrib):
        if self.combine == "sum":
            np.add.at(msgs, centers, contrib)
        elif self.combine == "min":
            np.minimum.at(msgs, centers, contrib)
        else:
            np.maximum.at(msgs, centers, contrib)

    def partial(self, src, dst, nv, iteration, value):
        msgs = np.full(nv, _IDENT[self.combine], np.float64)
        if self.direction in ("in", "all"):   # gather over IN edges: center=dst
            self._accum(msgs, dst, np.asarray(self.edge_map(value[src], value[dst]), np.float64))
        if self.direction in ("out", "all"):  # center=src, neighbor=dst
            self._accum(msgs, src, np.asarray(self.edge_map(value[dst], value[src]), np.float64))
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


def _make_vp(edge_map, combine, direction):
    vp = _NeighborhoodVP(edge_map, combine, direction)
    vp.merge = {"sum": lambda a, b: a + b,
                "min": np.minimum,
                "max": np.maximum}[combine]
    return vp


def map_reduce_neighborhood(g: Graph, values: np.ndarray, edge_map,
                            combine: str = "sum",
                            direction: str = "in") -> np.ndarray:
    """Per-vertex neighborhood map-reduce → dense result array
    (warp::map_reduce_neighborhood). ``edge_map(nbr_vals, center_vals)``."""
    vp = _make_vp(edge_map, combine, direction)
    init = {"value": np.asarray(values, np.float64),
            "out": np.full(g.nv, _IDENT[combine], np.float64)}
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
    """warp_pagerank.cpp (~60 LoC) re-expressed: K rounds of
    transform_neighborhood with the PageRank update."""
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
