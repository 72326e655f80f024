"""Greedy streaming ingress heuristics: oblivious and HDRF.

Re-express ``distributed_oblivious_ingress`` (ingress_edge_decision.hpp:
75-121) and ``distributed_hdrf_ingress`` (Petroni et al., CIKM'15 "HDRF:
Stream-Based Partitioning for Power-Law Graphs"; ingress_edge_decision.hpp:
192-248): each *ingest actor* keeps LOCAL state — vertex→partition bitmask,
per-partition load, (HDRF) partial degrees — and greedily scores partitions
per edge:

    score(p) = affinity(u,p) + affinity(v,p) + balance(p)

with HDRF weighting the affinity of the *lower*-partial-degree endpoint
higher (replicate the high-degree vertex), and ties broken by the
deterministic edge hash. Like the reference, state is per-loader (an
approximation of the global placement) — quality improves with fewer, larger
ingest actors; the pure-hash partitioners remain the fully-deterministic
default.

NOTE: greedy placement does NOT colocate duplicate copies of a pair, so
``build_graph(dedup=True)`` is rejected with these modes — dedup first
(``dedup_edges``) or use random/grid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ids import hash_edge

BAL_EPS = 1e-9
HDRF_LAMBDA = 1.0


class GreedyPlacer:
    """Actor-pool ingress stage: (src,dst) batch → (src,dst,part)."""

    def __init__(self, num_partitions: int, mode: str = "oblivious") -> None:
        assert mode in ("oblivious", "hdrf")
        self.P = num_partitions
        self.mode = mode
        self.masks: dict[int, int] = {}      # vertex → partition bitmask
        self.load = np.zeros(num_partitions, np.int64)
        self.deg: dict[int, int] = {}        # HDRF partial degrees

    def _place(self, u: int, v: int, h: int) -> int:
        P = self.P
        mu = self.masks.get(u, 0)
        mv = self.masks.get(v, 0)
        if self.mode == "hdrf":
            du = self.deg[u] = self.deg.get(u, 0) + 1
            dv = self.deg[v] = self.deg.get(v, 0) + 1
            theta_u = du / (du + dv)
            gu = 1.0 + (1.0 - theta_u)
            gv = 1.0 + theta_u
        else:
            gu = gv = 1.0
        load = self.load
        maxl = load.max()
        minl = load.min()
        denom = BAL_EPS + (maxl - minl)
        best_p, best_s = 0, -1e18
        for p in range(P):
            s = HDRF_LAMBDA * (maxl - load[p]) / denom
            if (mu >> p) & 1:
                s += gu
            if (mv >> p) & 1:
                s += gv
            if s > best_s or (s == best_s and ((h >> (p & 31)) & 1)):
                best_s, best_p = s, p
        self.masks[u] = mu | (1 << best_p)
        self.masks[v] = mv | (1 << best_p)
        self.load[best_p] += 1
        return best_p

    def __call__(self, t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"], np.uint64)
        dst = np.asarray(t["dst"], np.uint64)
        hs = hash_edge(src, dst)
        parts = np.empty(len(src), np.uint32)
        place = self._place
        for i in range(len(src)):
            parts[i] = place(int(src[i]), int(dst[i]), int(hs[i]))
        return pa.table({"src": pa.array(src, pa.uint64()),
                         "dst": pa.array(dst, pa.uint64()),
                         "part": pa.array(parts, pa.uint32())})


def greedy_partition_stage(edges_ds, num_partitions: int, mode: str,
                           concurrency=(1, 4)):
    """edges → (src,dst,part) via the greedy placer actor pool."""
    return edges_ds.map_batches(
        GreedyPlacer, batch_format="pyarrow",
        fn_constructor_args=(num_partitions, mode),
        concurrency=concurrency)
