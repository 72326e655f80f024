"""The flagship end-to-end pipeline (north star):

Parquet source-code repository table → regex import extraction per language →
cross-repo file-reference hashing (uint64 vertex ids) → exact edge dedup →
vertex-cut hash partitioning → GAS PageRank to 1e-6 convergence with
per-superstep checkpoints → ranked file table.

This is the pipeline ``__ray_entry__.entry()`` smoke-runs and ``bench.py``
times; correctness of every stage is pytest-verified against closed-form /
python oracles (tests/test_edge_builder.py, tests/test_gas_algorithms.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..graph.algorithms import run_connected_components, run_pagerank
from ..graph.gas import Graph, build_graph
from ..sources.repo_table import read_repo_table
from ..stages.edge_builder import build_hashed_edges


def build_hashed_graph(sf_dir: str, num_partitions: int = 9) -> Graph:
    repo_ds = read_repo_table(sf_dir)
    # exact dedup happens partition-locally at ingress (grid placement is a
    # pure function of (u,v), colocating every copy of a pair) — no wide
    # dedup shuffle. Grid ingress + bucket-aligned vid ordering is the
    # deployment configuration: replication ≤ 2√P−1 and the sharded
    # supersteps broadcast/emit only the ~2/√P vertex ranges each partition
    # touches (gas.py superstep_sharded).
    edges = build_hashed_edges(repo_ds, dedup=False)
    return build_graph(edges, num_partitions, dedup=True,
                       ingress="grid", vid_order="bucket")


def flagship_pagerank(sf_dir: str, tol: float = 1e-6,
                      checkpoint_path: str | None = None,
                      resume: bool = False,
                      num_partitions: int = 9,
                      top_k: int = 100) -> pd.DataFrame:
    """→ top-k files by PageRank: (vid, rank, out_deg, in_deg)."""
    g = build_hashed_graph(sf_dir, num_partitions)
    vids, ranks, eng = run_pagerank(g, tol=tol, checkpoint_path=checkpoint_path,
                                    resume=resume)
    order = np.lexsort((vids, -ranks))[:top_k]
    return pd.DataFrame({
        "vid": vids[order].astype(np.uint64),
        "rank": ranks[order],
        "out_deg": g.out_deg[order],
        "in_deg": g.in_deg[order],
    })


def flagship_components(sf_dir: str, num_partitions: int = 9) -> pd.DataFrame:
    """Component-size histogram over the hashed link graph — the
    connected_component_stats.cpp:65-90 aggregate."""
    g = build_hashed_graph(sf_dir, num_partitions)
    _, labels, _ = run_connected_components(g)
    lab, cnt = np.unique(labels, return_counts=True)
    size, n = np.unique(cnt, return_counts=True)
    return pd.DataFrame({"component_size": size.astype(np.int64),
                         "n_components": n.astype(np.int64)})
