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
    """→ top-k files by PageRank: (vid, rank, out_deg, in_deg).

    nv-independent driver path end-to-end: ingress negotiates the vertex
    table into plasma, PageRank initializes + finishes as range chunks
    (``result="dataset"``), top-k is a per-block partial reduce, and the
    degree lookup for the k winners is a broadcast-filter over the
    plasma-backed vertex table — the driver only ever holds O(top_k) rows."""
    import ray

    g = build_hashed_graph(sf_dir, num_partitions)
    rank_ds, eng = run_pagerank(g, tol=tol, checkpoint_path=checkpoint_path,
                                resume=resume, result="dataset")
    from ..graph.transforms import vertex_table
    from ..stages.sampling import top_k_by

    top = top_k_by(rank_ds, "rank", top_k, "vid")  # O(top_k) on the driver
    want = ray.put(np.sort(top["vid"].to_numpy().astype(np.uint64)))

    def pick(t):
        import pyarrow as pa

        w = ray.get(want)
        vid = np.asarray(t["vid"], np.uint64)
        pos = np.searchsorted(w, vid)
        hit = (pos < len(w)) & (w[np.minimum(pos, max(len(w) - 1, 0))] == vid)
        return t.filter(pa.array(hit))

    degs = (vertex_table(g).map_batches(pick, batch_format="pyarrow")
            .to_pandas())  # ≤ top_k rows
    out = top.merge(degs[["vid", "out_deg", "in_deg"]], on="vid", how="left")
    return pd.DataFrame({
        "vid": out["vid"].to_numpy().astype(np.uint64),
        "rank": out["rank"].to_numpy(),
        "out_deg": out["out_deg"].to_numpy(np.int64),
        "in_deg": out["in_deg"].to_numpy(np.int64),
    })


def flagship_components(sf_dir: str, num_partitions: int = 9) -> pd.DataFrame:
    """Component-size histogram over the hashed link graph — the
    connected_component_stats.cpp:65-90 aggregate, as two small groupby
    aggregates over the label Dataset (labels never gathered)."""
    from ..stages.agg import bucketed_agg

    g = build_hashed_graph(sf_dir, num_partitions)
    ds, _ = run_connected_components(g, result="dataset")

    sizes = bucketed_agg(ds, ["label"], {"component_size": (None, "count")})
    hist = bucketed_agg(sizes, ["component_size"],
                        {"n_components": (None, "count")}).to_pandas()
    hist = hist.sort_values("component_size").reset_index(drop=True)
    return pd.DataFrame({"component_size": hist["component_size"].astype(np.int64),
                         "n_components": hist["n_components"].astype(np.int64)})
