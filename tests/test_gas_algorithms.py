"""GAS engine correctness vs pure-python oracles on the reference's own
5-vertex conformance graph (tests/data/test_tsv) and the doc-derived graph."""

import numpy as np
import pytest

from powergraph_ray.graph.algorithms import (
    run_connected_components,
    run_lpa,
    run_pagerank,
    run_sssp,
)
from powergraph_ray.graph.gas import build_graph_from_arrays
from powergraph_ray.sources.repo_table import doc_edge_ground_truth

from . import oracles


def _dense_graph(src, dst, P=4):
    g = build_graph_from_arrays(src, dst, P)
    # dense-index edge arrays for oracles
    ds_src = g.dense(np.asarray(src, np.uint64))
    ds_dst = g.dense(np.asarray(dst, np.uint64))
    return g, ds_src, ds_dst


@pytest.fixture(scope="module")
def tiny():
    return _dense_graph(oracles.TINY_SRC.astype(np.uint64), oracles.TINY_DST.astype(np.uint64))


@pytest.fixture(scope="module")
def docg():
    e = doc_edge_ground_truth(500)
    return _dense_graph(e[:, 0].astype(np.uint64), e[:, 1].astype(np.uint64), P=8)


def test_graph_build_stats(tiny):
    g, _, _ = tiny
    assert g.nv == 5  # vertices {0,1,2,3,5}
    assert g.num_edges == 7
    assert g.out_deg.sum() == 7 and g.in_deg.sum() == 7


def test_pagerank_fixed_iterations(tiny):
    g, s, d = tiny
    vids, ranks, eng = run_pagerank(g, iterations=10)
    want = oracles.pagerank_fixed(s, d, g.nv, 10)
    np.testing.assert_allclose(ranks, want, rtol=1e-12, atol=1e-12)
    assert len(eng.metrics) == 10


def test_pagerank_dynamic_tolerance(docg):
    g, s, d = docg
    vids, ranks, _ = run_pagerank(g, tol=1e-6)
    want = oracles.pagerank_dynamic(s, d, g.nv, tol=1e-6)
    np.testing.assert_allclose(ranks, want, rtol=1e-9, atol=1e-9)
    # and 1e-6-close to the true fixed point (the convergence criterion)
    fixed = oracles.pagerank_fixed(s, d, g.nv, 200)
    np.testing.assert_allclose(ranks, fixed, rtol=2e-5, atol=2e-5)


def test_connected_components_exact(tiny, docg):
    for g, s, d in (tiny, docg):
        vids, labels, _ = run_connected_components(g)
        want_dense = oracles.connected_components(s, d, g.nv)
        # oracle labels are dense min-index; map to global vids
        np.testing.assert_array_equal(labels.astype(np.uint64), vids[want_dense])


def test_lpa_exact(docg):
    g, s, d = docg
    init = np.array([f"c{v % 23:03d}" for v in range(g.nv)])
    vids, labels, _ = run_lpa(g, init, max_iter=8, frontier=True)
    codes = np.array([int(x[1:]) for x in init])
    want = oracles.lpa(s, d, codes, 23, max_iter=8, frontier=True)
    got = np.array([int(x[1:]) for x in labels])
    np.testing.assert_array_equal(got, want)


def test_sssp_exact(docg):
    g, s, d = docg
    src_vid = int(g.vids[0])
    vids, dist, _ = run_sssp(g, src_vid, directed=False)
    want = oracles.sssp(s, d, g.nv, 0, directed=False)
    np.testing.assert_array_equal(dist, want)


def test_sssp_weighted_exact(docg):
    """Weighted SSSP (edge payload column) vs networkx Dijkstra; weights are
    symmetric in (src, dst) so directed-edge reversal is weight-consistent."""
    from powergraph_ray.graph.algorithms import run_sssp_weighted
    from powergraph_ray.graph.gas import build_graph_from_arrays

    g0, s, d = docg
    w = (1.0 + (s + d) % 9).astype(np.float64)
    gw = build_graph_from_arrays(g0.vids[s].astype(np.uint64),
                                 g0.vids[d].astype(np.uint64), 4,
                                 edata={"weight": w})
    vids, dist, _ = run_sssp_weighted(gw, int(gw.vids[0]), directed=False)
    ds_s = gw.dense(g0.vids[s].astype(np.uint64))
    ds_d = gw.dense(g0.vids[d].astype(np.uint64))
    want = oracles.sssp_weighted(ds_s, ds_d, w, gw.nv, 0, directed=False)
    np.testing.assert_array_equal(dist, want)
    gw.close()


def test_proximity_prestige_exact(docg):
    """Proximity prestige (prestige.cpp) vs a direct BFS-from-each-source
    python oracle on directed edges."""
    import collections

    from powergraph_ray.graph.centrality import proximity_prestige

    g, s, d = docg
    S = 50
    srcs = g.vids[:S]
    pp = proximity_prestige(g, srcs)

    adj = collections.defaultdict(list)
    for a, b in zip(s, d):
        adj[a].append(b)
    dist = np.full((g.nv, S), np.inf)
    for j in range(S):
        s0 = int(g.dense(srcs[j:j + 1])[0])
        dist[s0, j] = 0
        frontier = [s0]
        lvl = 0
        while frontier:
            lvl += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if not np.isfinite(dist[v, j]):
                        dist[v, j] = lvl
                        nxt.append(v)
            frontier = nxt
    want = np.zeros(g.nv)
    src_dense = set(int(x) for x in g.dense(srcs))
    for v in range(g.nv):
        ds_ = [dist[v, j] for j in range(S)
               if np.isfinite(dist[v, j]) and int(g.dense(srcs[j:j + 1])[0]) != v]
        ns = S - (1 if v in src_dense else 0)
        if ds_ and sum(ds_) > 0:
            want[v] = len(ds_) / ns * len(ds_) / sum(ds_)
    np.testing.assert_allclose(pp, want, rtol=1e-12)


def test_grid_ingress_lowers_replication_same_results(docg):
    """Grid-constrained ingress (sharding_constraint.hpp grid): replication
    factor bounded by 2*sqrt(P)-1 and algorithm results unchanged."""
    e = doc_edge_ground_truth(500)
    src, dst = e[:, 0].astype(np.uint64), e[:, 1].astype(np.uint64)
    g_rand, _, _ = docg
    g_grid = build_graph_from_arrays(src, dst, 16, ingress="grid",
                                     vid_order="sorted")
    # explicit random baseline: 16 is deployment-square, so the "auto"
    # default would itself pick grid+bucket
    g_r16 = build_graph_from_arrays(src, dst, 16, ingress="random")
    assert g_grid.num_edges == g_r16.num_edges
    assert g_grid.replication_factor <= 2 * 4 - 1 + 1e-9
    assert g_grid.replication_factor < g_r16.replication_factor
    _, r1, _ = run_pagerank(g_grid, iterations=8)
    _, r2, _ = run_pagerank(g_r16, iterations=8)
    np.testing.assert_allclose(r1, r2, rtol=1e-12, atol=1e-12)
    g_grid.close()
    g_r16.close()


def test_pds_ingress_lowers_replication_same_results():
    """PDS-constrained ingress (sharding_constraint.hpp pds +
    generate_pds.hpp): replication bounded by p+1 per vertex (≈√P, below
    grid's 2√P−1) at P = p²+p+1, algorithm results unchanged."""
    e = doc_edge_ground_truth(500)
    src, dst = e[:, 0].astype(np.uint64), e[:, 1].astype(np.uint64)
    g_pds = build_graph_from_arrays(src, dst, 13, ingress="pds",
                                    vid_order="sorted")
    g_r13 = build_graph_from_arrays(src, dst, 13)
    assert g_pds.num_edges == g_r13.num_edges
    assert g_pds.replication_factor <= 3 + 1 + 1e-9    # p+1, p=3
    assert g_pds.replication_factor < g_r13.replication_factor
    _, r1, _ = run_pagerank(g_pds, iterations=8)
    _, r2, _ = run_pagerank(g_r13, iterations=8)
    np.testing.assert_allclose(r1, r2, rtol=1e-12, atol=1e-12)
    g_pds.close()
    g_r13.close()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_graph_from_arrays(src, dst, 16, ingress="pds")


def test_pagerank_delta_cache_matches(docg):
    """use_cache (pagerank.cpp:37,200): cached-gather dynamic PageRank agrees
    with the uncached run to float-accumulation precision."""
    g, s, d = docg
    _, r_plain, e1 = run_pagerank(g, tol=1e-6)
    _, r_cache, e2 = run_pagerank(g, tol=1e-6, use_cache=True)
    np.testing.assert_allclose(r_cache, r_plain, rtol=1e-9, atol=1e-9)
    want = oracles.pagerank_dynamic(s, d, g.nv, tol=1e-6)
    np.testing.assert_allclose(r_cache, want, rtol=1e-8, atol=1e-8)


def test_greedy_ingress_quality_and_correctness():
    """Oblivious/HDRF greedy ingress (ingress_edge_decision.hpp:75-248):
    lower replication than random hashing, identical algorithm results."""
    from powergraph_ray.graph.gas import build_graph
    from powergraph_ray.sources.synthetic import synthetic_powerlaw_arrays
    import pyarrow as pa
    import ray.data

    s, d = synthetic_powerlaw_arrays(1500, alpha=1.2, seed=11)
    e = np.unique(np.stack([s, d]), axis=1)
    t = pa.table({"src": pa.array(e[0], pa.uint64()),
                  "dst": pa.array(e[1], pa.uint64())})
    g_rand = build_graph(ray.data.from_arrow(t), 16, ingress="random")
    results = {}
    for mode in ("oblivious", "hdrf"):
        g = build_graph(ray.data.from_arrow(t), 16, ingress=mode)
        assert g.num_edges == g_rand.num_edges
        assert g.replication_factor < g_rand.replication_factor
        _, r, _ = run_pagerank(g, iterations=6)
        results[mode] = r
        g.close()
    _, r_rand, _ = run_pagerank(g_rand, iterations=6)
    for mode, r in results.items():
        np.testing.assert_allclose(r, r_rand, rtol=1e-12, atol=1e-12)
    g_rand.close()


def test_identity_ingress_trusts_part_column():
    """identity ingress (distributed_identity_ingress.hpp): edges land in the
    partition the input names; algorithm results equal random ingress."""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.graph.gas import build_graph
    from powergraph_ray.sources.synthetic import synthetic_powerlaw_arrays

    s, d = synthetic_powerlaw_arrays(600, alpha=1.0, seed=3)
    part = (np.arange(len(s)) % 4).astype(np.uint32)
    t = pa.table({"src": pa.array(s.astype(np.uint64), pa.uint64()),
                  "dst": pa.array(d.astype(np.uint64), pa.uint64()),
                  "part": pa.array(part, pa.uint32())})
    g_id = build_graph(ray.data.from_arrow(t), 4, ingress="identity")
    g_r = build_graph_from_arrays(s.astype(np.uint64), d.astype(np.uint64), 4)
    assert g_id.nv == g_r.nv and g_id.num_edges == g_r.num_edges
    # the trusted layout is honored: each shard holds exactly its rows
    import os

    import pyarrow.parquet as pq

    for p in range(4):
        path = os.path.join(g_id.parquet_dir, f"part={p}")
        n = pq.read_table(path).num_rows if os.path.isdir(path) else 0
        assert n == int((part == p).sum())
    _, c1, _ = run_connected_components(g_id)
    _, c2, _ = run_connected_components(g_r)
    o1 = np.argsort(g_id.vids)
    o2 = np.argsort(g_r.vids)
    np.testing.assert_array_equal(c1[o1], c2[o2])
    with pytest.raises(ValueError):
        build_graph(ray.data.from_arrow(t.drop_columns(["part"])), 4,
                    ingress="identity")
    g_id.close()
    g_r.close()


def test_pagerank_ranged_kernel_bit_identical(docg):
    """partial_sharded (range-native bincount over contiguous dst slices)
    must be BIT-identical to the full-nv partial + split_partial route —
    same per-element accumulation order (gas.py superstep_sharded)."""
    g, _, _ = docg
    from powergraph_ray.graph.algorithms import PageRankVP
    from powergraph_ray.graph.gas import GASEngine

    assert PageRankVP(iterations=3).partial_sharded is not None

    def full_path(vp):
        vp.partial_sharded = None  # force the full-nv partial + split route
        return vp

    vids, ranks_ranged, _ = run_pagerank(g, iterations=3)
    eng = GASEngine(g, full_path(PageRankVP(iterations=3)), max_iterations=3)
    ranks_full = eng.run()["value"]
    np.testing.assert_array_equal(ranks_ranged, ranks_full)

    # dynamic (tolerance) mode: signal masks must agree too
    _, r_dyn_ranged, e1 = run_pagerank(g, tol=1e-10)
    eng2 = GASEngine(g, full_path(PageRankVP(tol=1e-10)), max_iterations=500)
    r_dyn_full = eng2.run()["value"]
    np.testing.assert_array_equal(r_dyn_ranged, r_dyn_full)
    assert len(e1.metrics) == len(eng2.metrics)


def weighted_pagerank_oracle(src, dst, w, nv, iterations, reset=0.15):
    """Sequential weighted PageRank: contribution = r·w/strength(src)."""
    strength = np.bincount(src, weights=w, minlength=nv)
    r = np.ones(nv)
    for _ in range(iterations):
        contrib = r[src] * w / np.maximum(strength[src], 1e-300)
        total = np.bincount(dst, weights=contrib, minlength=nv)
        r = (1 - reset) * total + reset
    return r


def test_weighted_pagerank_matches_oracle():
    from powergraph_ray.graph.algorithms import run_weighted_pagerank

    rng = np.random.RandomState(9)
    src = rng.randint(0, 80, 400).astype(np.uint64)
    dst = rng.randint(0, 80, 400).astype(np.uint64)
    keep = src != dst
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = e[:, 0], e[:, 1]
    w = (1.0 + (src.astype(np.int64) + dst.astype(np.int64)) % 9).astype(np.float64)
    g = build_graph_from_arrays(src, dst, 4, edata={"weight": w})
    vids, ranks, eng = run_weighted_pagerank(g, iterations=7)
    ds, dd = g.dense(src), g.dense(dst)
    want = weighted_pagerank_oracle(ds, dd, w, g.nv, 7)
    np.testing.assert_allclose(ranks, want, rtol=1e-12, atol=1e-12)
    assert len(eng.metrics) == 7


def test_weighted_pagerank_uniform_weights_equal_unweighted(tiny):
    """With identical weights on every edge, weighted == unweighted."""
    from powergraph_ray.graph.algorithms import run_weighted_pagerank

    g, s, d = tiny
    src = g.vids[s].astype(np.uint64)
    dst = g.vids[d].astype(np.uint64)
    w = np.full(len(src), 2.5)
    gw = build_graph_from_arrays(src, dst, 3, edata={"weight": w})
    _, got, _ = run_weighted_pagerank(gw, iterations=6)
    _, want, _ = run_pagerank(g, iterations=6)
    # align by vid
    ga = dict(zip(gw.vids.astype(int), got))
    wa = dict(zip(g.vids.astype(int), want))
    for v in wa:
        np.testing.assert_allclose(ga[v], wa[v], rtol=1e-12, atol=1e-12)


def test_katz_matches_dense_oracle(docg):
    """K Katz supersteps == the dense recurrence x_{t+1} = αAᵀx_t + β."""
    from powergraph_ray.graph.algorithms import run_katz

    g, s, d = docg
    vids, got, _ = run_katz(g, alpha=1 / 16, beta=1.0, iterations=5)
    x = np.zeros(g.nv)
    for _ in range(5):
        x = np.bincount(d, weights=x[s], minlength=g.nv) / 16 + 1.0
    np.testing.assert_allclose(got, x, rtol=1e-12, atol=1e-12)
    assert (got >= 1.0).all()  # β floor


def test_eigencentrality_matches_dense_oracle(docg):
    """K power-iteration supersteps + final L2 == the dense recurrence."""
    from powergraph_ray.graph.algorithms import run_eigencentrality

    g, s, d = docg
    vids, got, _ = run_eigencentrality(g, iterations=5)
    x = np.ones(g.nv)
    for _ in range(5):
        x = np.bincount(d, weights=x[s], minlength=g.nv)
    x = x / np.sqrt((x * x).sum())
    np.testing.assert_allclose(got, x, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float((got * got).sum()), 1.0, rtol=1e-12)


def test_pagerank_warm_start_converges_faster_same_fixed_point():
    """Daily-refresh pattern: converge graph v2 FROM v1's ranks — same
    fixed point (unique), and the dynamic frontier stays concentrated near
    the new edges, cutting total work (Σ n_active) by an order of
    magnitude. (On tiny small-world graphs the perturbation wave saturates
    the vertex set, so the effect needs a graph large enough that the wave
    decays below tol before reaching everyone.)"""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.sources.synthetic import synthetic_powerlaw_arrays

    src, dst = synthetic_powerlaw_arrays(50_000)
    g1 = build_graph_from_arrays(src, dst, 8)
    vids1, ranks1, _ = run_pagerank(g1, tol=1e-6)

    es = np.array([11, 222, 3333], np.uint64)
    ed = np.array([101, 2020, 30303], np.uint64)
    g2 = build_graph_from_arrays(np.r_[src, es], np.r_[dst, ed], 8)

    vids2, cold, eng_cold = run_pagerank(g2, tol=1e-6)
    warm_ds = ray.data.from_arrow(pa.table({
        "vid": pa.array(vids1, pa.uint64()),
        "rank": pa.array(ranks1, pa.float64())}))
    vids2w, warm, eng_warm = run_pagerank(g2, tol=1e-6,
                                          warm_ranks_ds=warm_ds)
    np.testing.assert_array_equal(vids2w, vids2)
    np.testing.assert_allclose(warm, cold, atol=1e-4, rtol=1e-4)
    work_warm = sum(m["n_active"] for m in eng_warm.metrics)
    work_cold = sum(m["n_active"] for m in eng_cold.metrics)
    assert work_warm < 0.2 * work_cold, (work_warm, work_cold)


def test_cc_warm_start_from_previous_version():
    """CC labels from v1 are a valid starting state for v2 = v1 + edges
    (min-propagation only merges); result equals the cold run with the
    frontier confined to the merge seams."""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.sources.synthetic import synthetic_powerlaw_arrays

    src, dst = synthetic_powerlaw_arrays(20_000)
    g1 = build_graph_from_arrays(src, dst, 8)
    vids1, lab1, _ = run_connected_components(g1)

    es = np.array([5, 77, 999], np.uint64)
    ed = np.array([1001, 4040, 1700], np.uint64)
    g2 = build_graph_from_arrays(np.r_[src, es], np.r_[dst, ed], 8)

    vids2, cold, eng_cold = run_connected_components(g2)
    warm_ds = ray.data.from_arrow(pa.table({
        "vid": pa.array(vids1, pa.uint64()),
        "label": pa.array(lab1, pa.uint64())}))
    vids2w, warm, eng_warm = run_connected_components(
        g2, warm_labels_ds=warm_ds)
    np.testing.assert_array_equal(vids2w, vids2)
    np.testing.assert_array_equal(warm, cold)
    work_warm = sum(m["n_active"] for m in eng_warm.metrics)
    work_cold = sum(m["n_active"] for m in eng_cold.metrics)
    assert work_warm < work_cold, (work_warm, work_cold)


def test_katz_dataset_result_matches_arrays(docg):
    from powergraph_ray.graph.algorithms import run_katz

    g, _, _ = docg
    vids, scores, _ = run_katz(g, iterations=5)
    ds, _ = run_katz(g, iterations=5, result="dataset")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    order = np.argsort(vids)
    np.testing.assert_array_equal(df["vid"].to_numpy(np.uint64), vids[order])
    np.testing.assert_allclose(df["katz"].to_numpy(), scores[order],
                               rtol=0, atol=0)


def test_eigencentrality_dataset_result_matches_arrays(docg):
    from powergraph_ray.graph.algorithms import run_eigencentrality

    g, _, _ = docg
    vids, scores, _ = run_eigencentrality(g, iterations=3)
    ds, _ = run_eigencentrality(g, iterations=3, result="dataset")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    order = np.argsort(vids)
    np.testing.assert_array_equal(df["vid"].to_numpy(np.uint64), vids[order])
    np.testing.assert_allclose(df["eigen"].to_numpy(), scores[order],
                               rtol=1e-12, atol=1e-15)
