"""Strongly connected components (directed) — the web-graph "bowtie" op.

Beyond the reference's toolkit surface (its connected_component.cpp is the
WEAKLY-connected min-id propagation), but core territory for a link-graph
engine: SCC condensation is how directed link graphs are structurally
analyzed (Broder et al. 2000's web bowtie). Algorithm: the BSP "coloring"
SCC (Orzan 2004; Slota/Rajamanickam/Madduri 2014's color propagation
phase), which is exactly two GAS vertex programs per round:

1. **Forward min-label propagation** among still-unassigned ("alive")
   vertices: ``c(v) = min local id that reaches v``. A *root* is a vertex
   with ``c(r) == r`` — no smaller alive id reaches it.
2. **Backward reachability within the color class**: ``v`` joins SCC ``r``
   iff ``c(v) == r`` and ``v`` reaches ``r``. Soundness of restricting the
   backward sweep to same-color edges: any intermediate ``w`` on a path
   ``v→…→r`` is reached by ``r`` (via ``r→…→v→…→w``), and no ``s < r``
   reaches ``w`` (else ``s`` would reach ``r`` through ``w→…→r``,
   contradicting ``c(r)==r``) — so the whole path has color ``r``.

Every round assigns at least the minimum alive id's SCC (many roots peel in
parallel), so the driver loop terminates; real link graphs finish in a few
rounds. Per round the work is two CC-shaped superstep fixpoints over the
alive subgraph — all the engine's scale machinery (sharded reduce-scatter,
range-chunk apply, pipelined dispatch) applies unchanged.
"""

from __future__ import annotations

import numpy as np

from .gas import GASEngine, Graph, VertexProgram, split_dense

__all__ = ["run_scc", "scc_table", "scc_condensation", "dag_depth"]

_SENT = np.iinfo(np.uint64).max


class _FwdMinVP(VertexProgram):
    """Directed min-label propagation (src → dst only) over alive vertices;
    labels are LOCAL dense vertex ids (uint64)."""

    name = "scc_fwd"
    broadcast_keys = ("value", "active", "alive")
    shardable = True

    def __init__(self, max_iter: int = 10_000) -> None:
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def init_bundle(self, graph: Graph):  # driver loop always overrides
        raise NotImplementedError

    def partial(self, src, dst, nv, iteration, value, active, alive):
        msgs = np.full(nv, _SENT, np.uint64)
        m = alive[src] & alive[dst] & active[src] & (value[src] < value[dst])
        if m.any():
            np.minimum.at(msgs, dst[m], value[src][m])
        return msgs

    @staticmethod
    def merge(a, b):
        return np.minimum(a, b)

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        value, alive = bundle["value"], bundle["alive"]
        improved = alive & (total < value)
        new = {"value": np.where(improved, total, value),
               "active": improved, "alive": alive}
        n = int(improved.sum())
        return new, n, float(n)

    def apply(self, bundle, total, iteration):
        n = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, n, n)


class _BwdReachVP(VertexProgram):
    """Backward reachability to the color root, restricted to same-color
    edges: along edge u→v, u becomes reached when v is reached and
    ``c(u) == c(v)``. Message monoid = boolean OR."""

    name = "scc_bwd"
    broadcast_keys = ("value", "reached", "active", "alive")
    shardable = True

    def __init__(self, max_iter: int = 10_000) -> None:
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def init_bundle(self, graph: Graph):
        raise NotImplementedError

    def partial(self, src, dst, nv, iteration, value, reached, active, alive):
        msgs = np.zeros(nv, bool)
        m = (alive[src] & ~reached[src] & active[dst]
             & (value[src] == value[dst]))
        if m.any():
            msgs[src[m]] = True
        return msgs

    @staticmethod
    def merge(a, b):
        return a | b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        reached, alive = bundle["reached"], bundle["alive"]
        newly = total & alive & ~reached
        new = {"value": bundle["value"], "reached": reached | newly,
               "active": newly, "alive": alive}
        n = int(newly.sum())
        return new, n, float(n)

    def apply(self, bundle, total, iteration):
        n = len(bundle["reached"])
        return self.apply_chunk(bundle, total, iteration, 0, n, n)


def run_scc(graph: Graph, max_rounds: int = 1000):
    """→ (vids, scc) where ``scc[i]`` is the GLOBAL vid of the minimum-vid
    member of vertex i's strongly connected component (the canonical SCC
    id). Driver loop state is three dense nv arrays (the toolkit-legacy
    bundle path, like kcore/coloring); the superstep traffic is the
    engine's sharded O(nv/√P)-per-partition protocol."""
    nv = graph.nv
    # labels = local ids ranked by GLOBAL vid, so the canonical member is
    # the minimum global vid (deterministic across ingress orderings)
    order = np.argsort(graph.vids, kind="stable")
    rank = np.empty(nv, np.uint64)
    rank[order] = np.arange(nv, dtype=np.uint64)
    alive = np.ones(nv, bool)
    scc_rank = np.full(nv, _SENT, np.uint64)

    for _ in range(max_rounds):
        if not alive.any():
            break
        # phase 1: forward min-rank propagation among alive
        fwd = GASEngine(graph, _FwdMinVP(), init_bundle={
            "value": np.where(alive, rank, _SENT),
            "active": alive.copy(),
            "alive": alive,
        })
        c = fwd.run()["value"]
        # phase 2: backward reachability from roots within color classes
        roots = alive & (c == rank)
        bwd = GASEngine(graph, _BwdReachVP(), init_bundle={
            "value": c, "reached": roots.copy(),
            "active": roots.copy(), "alive": alive,
        })
        assigned = bwd.run()["reached"]
        scc_rank[assigned] = c[assigned]
        alive = alive & ~assigned
    else:
        raise RuntimeError(f"SCC did not converge in {max_rounds} rounds")

    inv = np.empty(nv, np.int64)
    inv[rank.astype(np.int64)] = np.arange(nv)
    scc = graph.vids[inv[scc_rank.astype(np.int64)]]
    return graph.vids, scc


def scc_table(graph: Graph):
    """→ pandas (vid, scc): per-vertex canonical SCC id (min member vid)."""
    import pandas as pd

    vids, scc = run_scc(graph)
    return pd.DataFrame({"vid": pd.array(vids, dtype="uint64"),
                         "scc": pd.array(scc, dtype="uint64")})


def scc_condensation(graph: Graph, scc_map=None):
    """→ Dataset (scc_src, scc_dst, n_edges): the condensation DAG — one
    row per distinct cross-SCC edge pair with its multiplicity (how the
    bowtie structure of a link graph is actually read). The vid→scc map is
    broadcast ONCE via ray.put and applied per batch with searchsorted;
    the distinct-pair count is a bucketed shuffle of the (already
    cross-SCC-filtered) pairs, never the vertices. ``scc_map`` takes a
    precomputed ``(vids, scc)`` pair so composites (dag_depth) run SCC
    once."""
    import pandas as pd
    import ray

    from ..stages.agg import bucketed_agg
    from .transforms import edge_table

    vids, scc = scc_map if scc_map is not None else run_scc(graph)
    order = np.argsort(vids, kind="stable")
    map_ref = ray.put((vids[order], scc[order]))

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        tv, ts = ray.get(map_ref)  # zero-copy plasma read per actor
        s = ts[np.searchsorted(tv, df["src"].to_numpy().astype(np.uint64))]
        d = ts[np.searchsorted(tv, df["dst"].to_numpy().astype(np.uint64))]
        m = s != d
        return pd.DataFrame({"scc_src": s[m], "scc_dst": d[m]})

    pairs = edge_table(graph).map_batches(relabel, batch_format="pandas")
    return bucketed_agg(pairs, ["scc_src", "scc_dst"],
                        {"n_edges": (None, "count")})


class _LongestPathVP(VertexProgram):
    """Longest-path level propagation over a DAG (directed, src → dst):
    ``level(v) = max over in-edges of level(u) + 1``, init 0 everywhere —
    the fixed point is the longest path from any source to v ("dependency
    depth" when the DAG is an import/condensation graph). Message monoid =
    max; an improved vertex re-signals, so rounds ≤ longest path length
    (which is finite exactly because the input is acyclic — a cycle would
    loop forever, see dag_depth's max_iter guard)."""

    name = "dag_longest_path"
    broadcast_keys = ("value", "active")
    shardable = True

    def __init__(self, max_iter: int = 10_000) -> None:
        self._max_iter = max_iter

    def max_iterations(self) -> int:
        return self._max_iter

    def init_bundle(self, graph: Graph):
        nv = graph.nv
        return {"value": np.zeros(nv, np.int64),
                "active": np.ones(nv, bool)}

    def partial(self, src, dst, nv, iteration, value, active):
        msgs = np.full(nv, -1, np.int64)
        m = active[src]
        if m.any():
            np.maximum.at(msgs, dst[m], value[src][m] + 1)
        return msgs

    @staticmethod
    def merge(a, b):
        return np.maximum(a, b)

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        value = bundle["value"]
        improved = total > value
        new = {"value": np.where(improved, total, value),
               "active": improved}
        n = int(improved.sum())
        return new, n, float(n)

    def apply(self, bundle, total, iteration):
        n = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, n, n)


def dag_depth(graph: Graph, num_partitions: int = 8, max_rounds: int = 1000):
    """→ pandas (scc_id, depth): dependency depth of every SCC in the
    condensation DAG — the longest path (in condensation edges) from any
    source SCC. For an import graph this is the build-order depth of each
    mutually-dependent file group. Composition: one SCC run → condensation
    edges (Dataset, distinct pairs) → a fresh graph over the DAG →
    longest-path BSP fixpoint; isolated SCCs (no cross edges) come back at
    depth 0. ``max_rounds`` bounds the fixpoint — it can only be hit if the
    input were cyclic, which the SCC contraction rules out."""
    import pandas as pd
    import pyarrow as pa

    from .gas import build_graph

    vids, scc = run_scc(graph, max_rounds=max_rounds)
    cond = scc_condensation(graph, scc_map=(vids, scc))
    uniq = np.unique(scc)  # every SCC id, including isolated ones

    def to_edges(df):
        return pa.table({
            "src": pa.array(df["scc_src"].to_numpy().astype(np.uint64),
                            pa.uint64()),
            "dst": pa.array(df["scc_dst"].to_numpy().astype(np.uint64),
                            pa.uint64())})

    # materialized: the emptiness check and the ingress both consume it —
    # unmaterialized, the condensation relabel+distinct DAG would run twice
    edges = cond.map_batches(to_edges, batch_format="pandas").materialize()
    depth = np.zeros(len(uniq), np.int64)
    if edges.count() > 0:
        g2 = build_graph(edges, num_partitions=num_partitions)
        eng = GASEngine(g2, _LongestPathVP(max_iter=max_rounds))
        level = eng.run()["value"].astype(np.int64)
        pos = np.searchsorted(uniq, g2.vids)
        depth[pos] = level
    return pd.DataFrame({"scc_id": uniq.astype(np.int64), "depth": depth})
