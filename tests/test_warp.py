"""Warp-API surface (engine/warp_*.hpp re-expression)."""

import numpy as np

from powergraph_ray.graph import warp
from powergraph_ray.graph.gas import build_graph_from_arrays
from powergraph_ray.sources.repo_table import doc_edge_ground_truth

from . import oracles


def _g(n=200):
    e = doc_edge_ground_truth(n)
    g = build_graph_from_arrays(e[:, 0].astype(np.uint64), e[:, 1].astype(np.uint64), 4)
    return g, g.dense(e[:, 0].astype(np.uint64)), g.dense(e[:, 1].astype(np.uint64))


def test_map_reduce_neighborhood_sum_min_max():
    g, s, d = _g()
    vals = np.arange(g.nv, dtype=np.float64)
    got = warp.map_reduce_neighborhood(g, vals, lambda nbr, c: nbr, "sum", "in")
    want = np.bincount(d, weights=vals[s], minlength=g.nv)
    np.testing.assert_allclose(got, want)
    got_min = warp.map_reduce_neighborhood(g, vals, lambda nbr, c: nbr, "min", "all")
    want_min = np.full(g.nv, np.inf)
    np.minimum.at(want_min, d, vals[s])
    np.minimum.at(want_min, s, vals[d])
    np.testing.assert_allclose(got_min, want_min)
    got_max = warp.map_reduce_neighborhood(g, vals, lambda nbr, c: nbr, "max", "out")
    want_max = np.full(g.nv, -np.inf)
    np.maximum.at(want_max, s, vals[d])
    np.testing.assert_allclose(got_max, want_max)
    g.close()


def test_broadcast_and_parfor():
    g, s, d = _g()
    vals = np.ones(g.nv)
    # broadcast: each center receives count of its out-neighbors' ones
    got = warp.broadcast_neighborhood(g, vals, lambda nbr, c: nbr,
                                      lambda v, t: np.where(np.isfinite(t), t, 0.0))
    np.testing.assert_allclose(got, np.bincount(s, minlength=g.nv).astype(float))
    np.testing.assert_allclose(warp.parfor_all_vertices(g, vals, lambda v: v * 3), 3.0)
    g.close()


def test_warp_pagerank_matches_oracle():
    g, s, d = _g(300)
    r = warp.warp_pagerank(g, iterations=10)
    want = oracles.pagerank_fixed(s, d, g.nv, 10)
    np.testing.assert_allclose(r, want, rtol=1e-12, atol=1e-12)
    assert warp.warp_pagerank2 is warp.warp_pagerank  # the fixed-sweep app
    g.close()


def test_warp_pagerank_dynamic_matches_gas_dynamic():
    """warp_pagerank.cpp's signal-driven updates must land on the same
    values as the GAS PageRankVP dynamic mode (same update + signal rule)."""
    from powergraph_ray.graph.algorithms import run_pagerank

    g, s, d = _g(300)
    r = warp.warp_pagerank_dynamic(g, tol=1e-6)
    _, want, _ = run_pagerank(g, tol=1e-6)
    np.testing.assert_allclose(r, want, rtol=1e-9, atol=1e-9)
    g.close()


def test_warp_coloring_valid_and_matches_toolkit():
    """warp_coloring.cpp via the set-union ("or") gather: a proper coloring,
    identical to toolkit.run_coloring (same JP priorities)."""
    from powergraph_ray.graph.toolkit import run_coloring

    g, s, d = _g(300)
    colors = warp.warp_coloring(g)
    assert (colors >= 0).all()
    assert (colors[s] != colors[d]).all()          # proper coloring
    _, want, _ = run_coloring(g)
    np.testing.assert_array_equal(colors, want)
    g.close()


def test_set_union_gather():
    """combine="or" with width>1 gathers the neighborhood color-set bitmask
    (set_union_gather, warp_coloring.cpp:65-113)."""
    g, s, d = _g()
    vals = (np.arange(g.nv) % 100).astype(np.int32)

    def emap(nbr, c):
        cc = nbr.astype(np.int64)
        out = np.zeros((len(cc), 2), np.uint64)
        out[np.arange(len(cc)), cc // 64] = np.uint64(1) << (cc % 64).astype(np.uint64)
        return out

    got = warp.map_reduce_neighborhood(g, vals, emap, "or", "in", width=2)
    want = np.zeros((g.nv, 2), np.uint64)
    np.bitwise_or.at(want, (d, vals[s].astype(np.int64) // 64),
                     np.uint64(1) << (vals[s].astype(np.int64) % 64).astype(np.uint64))
    np.testing.assert_array_equal(got, want)
    g.close()
