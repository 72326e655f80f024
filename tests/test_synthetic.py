"""Synthetic power-law generator (distributed_graph.hpp:2380-2412 semantics):
batching-invariant determinism, degree law, self-edge exclusion; synthetic
repo table round-trips through the extract pipeline to the exact edge set."""

import numpy as np
import pytest

from powergraph_ray.sources.synthetic import (
    load_synthetic_powerlaw,
    powerlaw_degrees,
    synthetic_powerlaw_arrays,
    synthetic_repo_table,
)


def _pairs(ds):
    df = ds.to_pandas()
    return set(zip((int(x) for x in df["src"].to_numpy().astype(np.uint64)),
                   (int(x) for x in df["dst"].to_numpy().astype(np.uint64))))


def test_generator_batching_invariant():
    nv = 3000
    want_s, want_d = synthetic_powerlaw_arrays(nv, alpha=1.2, seed=9)
    want = set(zip(want_s.astype(int), want_d.astype(int)))
    for blocks in (2, 7):
        ds = load_synthetic_powerlaw(nv, alpha=1.2, seed=9, override_num_blocks=blocks)
        assert _pairs(ds) == want


def test_degree_law_and_no_self_edges():
    nv = 20000
    deg = powerlaw_degrees(np.arange(nv), alpha=2.1, truncate=100, seed=3)
    assert deg.min() >= 1 and deg.max() <= 100
    # Zipf(2.1): degree-1 mass dominates
    assert (deg == 1).mean() > 0.5
    s, d = synthetic_powerlaw_arrays(2000, alpha=1.0, seed=5)
    assert (s != d).all()


def test_repo_table_recovers_exact_edge_set(tmp_path):
    """The flagship ingest on the synthetic repo table must recover exactly
    the closed-form powerlaw edge set (post directed dedup, no self-edges)."""
    import ray.data

    from powergraph_ray.graph.gas import build_graph
    from powergraph_ray.stages.edge_builder import build_hashed_edges
    from powergraph_ray.ids import hash64_str
    from powergraph_ray.sources.repo_table import path_of, repo_of

    nv = 800
    repo_dir = synthetic_repo_table(nv, alpha=0.8, seed=7)
    edges = build_hashed_edges(ray.data.read_parquet(repo_dir),
                               dedup=False, concurrency=2)
    g = build_graph(edges, 4, dedup=True)

    s, d = synthetic_powerlaw_arrays(nv, alpha=0.8, seed=7)
    want = np.unique(np.stack([s, d]), axis=1)
    h = np.fromiter((hash64_str(f"{repo_of(i)}:{path_of(i)}") for i in range(nv)),
                    np.uint64, nv)
    want_hashed = {(int(h[a]), int(h[b])) for a, b in zip(want[0], want[1])}
    assert g.num_edges == len(want_hashed)
    got = _pairs(__import__("ray").data.read_parquet(g.parquet_dir,
                                                     columns=["src", "dst"]))
    assert got == want_hashed
    g.close()
