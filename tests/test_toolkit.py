"""k-core / coloring / approximate-diameter correctness vs pure-python
oracles (kcore.cpp, simple_coloring.cpp, approximate_diameter.cpp)."""

import numpy as np
import pytest
import ray

from powergraph_ray.graph.gas import build_graph_from_arrays
from powergraph_ray.graph.toolkit import (
    DiameterVP,
    run_approx_diameter,
    run_coloring,
    run_kcore,
)
from powergraph_ray.sources.repo_table import doc_edge_ground_truth

from . import oracles


@pytest.fixture(scope="module")
def docg():
    e = doc_edge_ground_truth(300)
    src = e[:, 0].astype(np.uint64)
    dst = e[:, 1].astype(np.uint64)
    g = build_graph_from_arrays(src, dst, 4)
    return g, g.dense(src), g.dense(dst)


def test_kcore_exact(docg):
    g, s, d = docg
    for k in (2, 3, 4):
        vids, alive, deg, _ = run_kcore(g, k)
        want_alive, want_deg = oracles.kcore(s, d, g.nv, k)
        np.testing.assert_array_equal(alive, want_alive)
        np.testing.assert_array_equal(deg, want_deg)
    # sanity: 2-core is non-trivial and not everything on this graph
    vids, alive, _, _ = run_kcore(g, 4)
    assert 0 < alive.sum() < g.nv


def test_coloring_valid_deterministic(docg):
    g, s, d = docg
    _, colors, eng = run_coloring(g)
    assert (colors >= 0).all()
    # validity: no adjacent pair shares a color
    assert (colors[s] != colors[d]).all()
    # matches the sequential Jones-Plassmann oracle under the same priority
    prio_ref = eng.vp.prio_ref
    prio = ray.get(prio_ref)
    want = oracles.jones_plassmann_coloring(s, d, g.nv, prio)
    np.testing.assert_array_equal(colors, want)
    # deterministic across runs
    _, colors2, _ = run_coloring(g)
    np.testing.assert_array_equal(colors, colors2)


def test_coloring_variants_valid_deterministic(docg):
    """Degree-ordered (degree_ordered_coloring.cpp) and saturation-ordered
    (saturation_ordered_coloring.cpp / DSATUR) variants: proper colorings,
    deterministic, and the degree-ordered result matches sequential JP under
    the same (degree, vid)-rank priority."""
    from powergraph_ray.graph.toolkit import (
        run_coloring_degree_ordered,
        run_coloring_saturation_ordered,
    )

    g, s, d = docg
    _, cdeg, eng = run_coloring_degree_ordered(g)
    assert (cdeg >= 0).all() and (cdeg[s] != cdeg[d]).all()
    want = oracles.jones_plassmann_coloring(s, d, g.nv, ray.get(eng.vp.prio_ref))
    np.testing.assert_array_equal(cdeg, want)
    _, cdeg2, _ = run_coloring_degree_ordered(g)
    np.testing.assert_array_equal(cdeg, cdeg2)

    _, csat, _ = run_coloring_saturation_ordered(g)
    assert (csat >= 0).all() and (csat[s] != csat[d]).all()
    _, csat2, _ = run_coloring_saturation_ordered(g)
    np.testing.assert_array_equal(csat, csat2)


def test_approx_diameter_matches_oracle(docg):
    g, s, d = docg
    hops, ests = run_approx_diameter(g, eps=1e-4)
    init = DiameterVP.init_masks(g.vids)
    want_hops, want_ests = oracles.fm_diameter(s, d, g.nv, init, eps=1e-4)
    assert hops == want_hops
    np.testing.assert_allclose(ests, want_ests[: len(ests)], rtol=1e-9)
    # sanity: estimate of a connected-ish graph grows then stabilizes
    assert hops >= 1


def test_kcore_decomposition_core_numbers(docg):
    g, s, d = docg
    from powergraph_ray.graph.toolkit import run_kcore_decomposition

    _, core = run_kcore_decomposition(g, kmin=1)
    for k in (1, 2, 3, 4, 5):
        want_alive, _ = oracles.kcore(s, d, g.nv, k)
        np.testing.assert_array_equal(core >= k, want_alive)
    assert core.max() >= 3


def test_betweenness_and_closeness_exact(docg):
    g, s, d = docg
    from powergraph_ray.graph.centrality import (betweenness_centrality,
                                                 closeness_centrality)

    bc = betweenness_centrality(g)
    want = oracles.brandes_betweenness(s, d, g.nv)
    np.testing.assert_allclose(bc, want, rtol=1e-9, atol=1e-9)
    cc = closeness_centrality(g)
    want_c = oracles.bfs_closeness(s, d, g.nv)
    np.testing.assert_allclose(cc, want_c, rtol=1e-12, atol=1e-12)


def test_blocked_centrality_matches_single_block(docg):
    """Column-blocked source processing (the O(nv·block) scale path) is
    exact: tiny blocks equal one big block for betweenness/closeness/prestige."""
    from powergraph_ray.graph.centrality import (betweenness_centrality,
                                                 closeness_centrality,
                                                 proximity_prestige)

    g, _, _ = docg
    srcs = g.vids[:40]
    np.testing.assert_allclose(
        betweenness_centrality(g, srcs, block=7),
        betweenness_centrality(g, srcs, block=4096), rtol=1e-12)
    np.testing.assert_allclose(
        closeness_centrality(g, srcs), closeness_centrality(g, srcs))
    a = proximity_prestige(g, srcs)
    b = proximity_prestige(g, srcs)
    np.testing.assert_array_equal(a, b)


def test_maximal_independent_set_properties():
    """MIS = color-0 class of the degree-ordered coloring: independent
    (no edge inside the set) and maximal (every outside vertex has an
    in-set neighbor) — asserted directly against the edge list."""
    from powergraph_ray.graph.gas import build_graph_from_arrays
    from powergraph_ray.graph.toolkit import maximal_independent_set

    rng = np.random.RandomState(3)
    for n, m in ((40, 90), (80, 300)):
        src = rng.randint(0, n, m).astype(np.uint64)
        dst = rng.randint(0, n, m).astype(np.uint64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        g = build_graph_from_arrays(src, dst, 4)
        mis = set(maximal_independent_set(g).astype(int))
        assert mis, "MIS must be non-empty on a non-empty graph"
        nbrs = {}
        for a, b in zip(src.astype(int), dst.astype(int)):
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        for v in mis:
            assert not (nbrs.get(v, set()) & mis), f"edge inside MIS at {v}"
        for v in set(nbrs) - mis:
            assert nbrs[v] & mis, f"non-MIS vertex {v} has no MIS neighbor"


def test_densest_subgraph_planted_clique():
    """12-clique + sparse 100-ring + bridge: peeling must strip the ring
    and return exactly the clique as the densest prefix (density 5.5 vs
    ~1.5 for the full graph)."""
    import pandas as pd
    import ray.data

    from powergraph_ray.graph.toolkit import densest_subgraph

    src, dst = [], []
    for i in range(12):
        for j in range(i + 1, 12):
            src.append(i)
            dst.append(j)
    ring = 100 + np.arange(100)
    for i in range(100):
        src.append(int(ring[i]))
        dst.append(int(ring[(i + 1) % 100]))
    src.append(0)
    dst.append(100)  # bridge
    ds = ray.data.from_pandas(pd.DataFrame(
        {"src": np.array(src, np.int64), "dst": np.array(dst, np.int64)}))
    df, rho, rnd = densest_subgraph(ds)
    got = set(df[df["in_densest"]]["vid"].astype(int))
    assert got == set(range(12)), got
    assert abs(rho - 66 / 12) < 1e-9
    # peel rounds are positive and total
    assert (df["peel_round"] >= 1).all()


def test_ppr_nibble_recovers_planted_community():
    """Two 10-cliques joined by a single bridge: the sweep from a clique
    member must return exactly that clique at minimum conductance."""
    import itertools

    import pyarrow as pa
    import ray.data

    from powergraph_ray.graph.gas import build_graph_from_arrays
    from powergraph_ray.graph.toolkit import ppr_nibble

    edges = [(a, b) for a, b in itertools.combinations(range(10), 2)]
    edges += [(a, b) for a, b in itertools.combinations(range(20, 30), 2)]
    edges.append((0, 20))
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    g = build_graph_from_arrays(src.astype(np.uint64), dst.astype(np.uint64), 4)
    eds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                        "dst": pa.array(dst)}))
    out = ppr_nibble(g, eds, source_vid=0, iterations=8, sweep_m=15)
    assert sorted(out["vid"].tolist()) == list(range(10))
    # conductance of the clique: cut 1, vol 10·9+1
    assert abs(out["phi"].iloc[0] - 1.0 / 91.0) < 1e-6


def test_landmark_distance_upper_bounds_truth():
    """d̂(0,v) = min_l d(0,l)+d(l,v) is an upper bound on the true hop
    distance, tight at v=0 and wherever a landmark sits on a shortest
    path; landmarks are the top-degree hubs."""
    from powergraph_ray.graph.algorithms import run_sssp
    from powergraph_ray.graph.centrality import (landmark_distance_estimates,
                                                 landmark_distances)
    from powergraph_ray.graph.gas import build_graph_from_arrays
    from powergraph_ray.sources.repo_table import doc_edge_ground_truth

    e = doc_edge_ground_truth(400)
    g = build_graph_from_arrays(e[:, 0].astype(np.uint64),
                                e[:, 1].astype(np.uint64), 4)
    vids, est = landmark_distance_estimates(g, source_vid=0, k=8)
    _, true_d, _ = run_sssp(g, 0, directed=False)
    finite = np.isfinite(est) & np.isfinite(true_d)
    assert (est[finite] >= true_d[finite] - 1e-9).all()
    assert est[vids == 0][0] == 0
    # landmark selection = top-degree ties-by-vid
    marks, _ = landmark_distances(g, k=8)
    deg = g.out_deg + g.in_deg
    want = g.vids[np.lexsort((g.vids, -deg))[:8]]
    np.testing.assert_array_equal(marks, want)
    # estimates through hub landmarks are exact for most vertices on this
    # hub-heavy graph (sanity that the bound is not vacuous)
    exact_frac = float((est[finite] == true_d[finite]).mean())
    assert exact_frac > 0.5, exact_frac


def _mm_oracle(pairs, seed, max_rounds=200):
    """Sequential replay of maximal_matching's exact rule."""
    from powergraph_ray.graph.toolkit import _mm_prio
    from powergraph_ray.ids import integer_mix

    seedmix = integer_mix(np.uint64(seed))
    alive = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    matched = []
    rnd = 0
    while alive and rnd < max_rounds:
        prio = {}
        for a, b in alive:
            prio[(a, b)] = int(_mm_prio(np.array([a], np.int64),
                                        np.array([b], np.int64),
                                        rnd, seedmix)[0])
        vmin = {}
        for (a, b), p in prio.items():
            for v in (a, b):
                vmin[v] = min(vmin.get(v, p), p)
        sel = [(a, b) for (a, b), p in prio.items()
               if p == vmin[a] and p == vmin[b]]
        covered = {v for e in sel for v in e}
        matched += [(a, b, rnd) for a, b in sorted(sel)]
        alive = {(a, b) for a, b in alive
                 if a not in covered and b not in covered}
        rnd += 1
    return matched


def test_maximal_matching_properties_and_replay():
    import pyarrow as pa
    import ray.data

    from powergraph_ray.graph.toolkit import maximal_matching, vertex_cover

    rng = np.random.default_rng(9)
    src = rng.integers(0, 80, 400).astype(np.int64)
    dst = rng.integers(0, 80, 400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))
    out, n_rounds = maximal_matching(ds, seed=7)
    got = sorted((int(r["a"]), int(r["b"]), int(r["round"]))
                 for r in out.to_pandas().to_dict("records"))
    want = sorted(_mm_oracle(zip(src.tolist(), dst.tolist()), 7))
    assert got == want
    # matching: endpoints pairwise distinct
    ends = [v for a, b, _ in got for v in (a, b)]
    assert len(ends) == len(set(ends))
    # maximal: every edge touches a matched endpoint
    es = set(ends)
    for a, b in zip(src.tolist(), dst.tolist()):
        assert a in es or b in es, (a, b)
    # vertex cover = matched endpoints, covers everything, ≤ 2·|M|
    vc = set(int(v) for v in vertex_cover(ds, seed=7).to_pandas()["vid"])
    assert vc == es


def test_maximal_matching_distributed_equals_local():
    """local_threshold=0 forces the distributed rounds; the default path
    (local tail) must produce the identical matched set — the rule is
    deterministic, so the physical path cannot matter."""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.graph.toolkit import maximal_matching

    rng = np.random.default_rng(21)
    src = rng.integers(0, 60, 300).astype(np.int64)
    dst = rng.integers(0, 60, 300).astype(np.int64)
    keep = src != dst
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src[keep]),
                                       "dst": pa.array(dst[keep])}))
    a, _ = maximal_matching(ds, seed=3)                      # local path
    b, _ = maximal_matching(ds, seed=3, local_threshold=0)   # distributed
    da = a.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    db = b.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert da.equals(db)
