"""nv-independent driver path: plasma-negotiated vertex metadata, chunked
engine init, and Dataset results (gas.py chunks_to_dataset /
vertex_table_dataset; the scale epilogue the 10^12-vertex north star needs —
driver holds ObjectRefs + counts, never O(nv) arrays)."""

import numpy as np

from powergraph_ray.graph.algorithms import (ConnectedComponentsVP, PageRankVP,
                                             SSSPVP, run_connected_components,
                                             run_pagerank)
from powergraph_ray.graph.gas import build_graph_from_arrays, vertex_table_dataset


def _edges(n=400, m=3000, seed=3):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.uint64)
    dst = rng.randint(0, n, m).astype(np.uint64)
    keep = src != dst
    return src[keep], dst[keep]


def test_build_graph_never_gathers_vertex_metadata():
    src, dst = _edges()
    g = build_graph_from_arrays(src, dst, 4)
    assert g._vids_cache is None and g._out_deg_cache is None \
        and g._in_deg_cache is None
    assert g.nv == len(np.union1d(src, dst))
    # lazy legacy access still returns the exact arrays
    assert (g.vids == np.union1d(src, dst)).all()
    assert g._vids_cache is not None  # gathered exactly on demand
    g.close()


def test_init_chunk_equals_init_bundle_slices():
    src, dst = _edges()
    g = build_graph_from_arrays(src, dst, 3)
    vids, od, ind = g.vids, g.out_deg, g.in_deg
    nv = g.nv
    cuts = [0, nv // 3, (2 * nv) // 3, nv]
    for vp in (PageRankVP(iterations=4), PageRankVP(use_cache=True),
               ConnectedComponentsVP(), SSSPVP(source_dense=nv // 2)):
        full = vp.init_bundle(g)
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            chunk = vp.init_chunk(lo, hi, nv, vids, od, ind)
            assert set(chunk) == set(full)
            for k in full:
                assert (chunk[k] == full[k][lo:hi]).all(), (type(vp).__name__, k)
    g.close()


def test_dataset_result_matches_legacy_and_stays_distributed():
    src, dst = _edges()
    g = build_graph_from_arrays(src, dst, 4)
    ds, _ = run_pagerank(g, iterations=5, result="dataset")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    # the whole build+run+result path never materialized O(nv) on the driver
    assert g._vids_cache is None and g._out_deg_cache is None
    vids, ranks, _ = run_pagerank(g, iterations=5)
    order = np.argsort(vids)
    assert (df["vid"].to_numpy().astype(np.uint64) == vids[order]).all()
    assert np.allclose(df["rank"].to_numpy(), ranks[order])

    dsc, _ = run_connected_components(g, result="dataset")
    dfc = dsc.to_pandas().sort_values("vid").reset_index(drop=True)
    v2, lab, _ = run_connected_components(g)
    o2 = np.argsort(v2)
    assert (dfc["label"].to_numpy().astype(np.uint64) == lab[o2]).all()
    g.close()


def test_vertex_table_dataset_matches_arrays():
    src, dst = _edges(seed=11)
    g = build_graph_from_arrays(src, dst, 4)
    df = vertex_table_dataset(g, num_blocks=5).to_pandas()
    assert g._vids_cache is None  # built from refs, not a driver gather
    assert (df["vid"].to_numpy().astype(np.uint64) == g.vids).all()
    assert (df["out_deg"].to_numpy() == g.out_deg).all()
    assert (df["in_deg"].to_numpy() == g.in_deg).all()
    g.close()


def test_run_lpa_vidmod_matches_run_lpa():
    """run_lpa_vidmod == run_lpa with the f"c{v%mod}" init array, including
    a mod > 10 where lexicographic label order != numeric order; dataset
    mode returns identical (vid, label) rows without driver-side init."""
    from powergraph_ray.graph.algorithms import run_lpa, run_lpa_vidmod

    src, dst = _edges(seed=5)
    g = build_graph_from_arrays(src, dst, 4)
    for mod in (4, 29):
        init = np.array([f"c{int(v) % mod}" for v in g.vids])
        v1, l1, _ = run_lpa(g, init, max_iter=4, frontier=False)
        v2, l2, _ = run_lpa_vidmod(g, mod, max_iter=4, frontier=False)
        assert (v1 == v2).all() and (l1 == l2).all(), mod
    ds, _ = run_lpa_vidmod(g, 29, max_iter=4, frontier=False, result="dataset")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    order = np.argsort(v2)
    assert (df["label"].to_numpy() == l2[order]).all()
    g.close()


def test_resume_loads_chunks_not_bundle():
    """A shard-aligned resume goes through _load_checkpoint_chunks (tasks,
    no driver O(nv) scatter) and reproduces the uninterrupted run exactly."""
    from powergraph_ray.graph.algorithms import PageRankVP
    from powergraph_ray.graph.gas import GASEngine

    import shutil

    src, dst = _edges(seed=9)
    ck = "/tmp/powergraph_ray/test_chunk_resume"
    shutil.rmtree(ck, ignore_errors=True)
    g = build_graph_from_arrays(src, dst, 4)
    full = GASEngine(g, PageRankVP(iterations=6), max_iterations=6).run()
    eng1 = GASEngine(g, PageRankVP(iterations=6), max_iterations=3,
                     checkpoint_path=ck)
    eng1.run()
    eng2 = GASEngine(g, PageRankVP(iterations=6), max_iterations=6,
                     checkpoint_path=ck, resume=True)
    chunks = eng2._load_checkpoint_chunks(eng2._latest_checkpoint())
    assert chunks is not None  # the chunked fast path applies
    resumed = eng2.run()
    assert np.allclose(resumed["value"], full["value"])
    g.close()


def test_sssp_dataset_mode_and_plasma_source_lookup():
    from powergraph_ray.graph.algorithms import run_sssp

    src, dst = _edges(seed=13)
    g = build_graph_from_arrays(src, dst, 4)
    source = int(np.union1d(src, dst)[0])
    ds, _ = run_sssp(g, source, result="dataset")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert g._vids_cache is None  # source looked up in a task, not a gather
    vids, dist, _ = run_sssp(g, source)
    order = np.argsort(vids)
    got, want = df["dist"].to_numpy(), dist[order]
    both_inf = np.isinf(got) & np.isinf(want)
    assert (both_inf | (got == want)).all()
    import pytest

    with pytest.raises(ValueError):
        run_sssp(g, 10**12 + 7)  # absent source still validated
    g.close()


def test_hits_ppr_weighted_dataset_modes_match_arrays():
    """Round 4: run_hits / run_ppr / run_weighted_pagerank dataset modes
    agree with the legacy array returns (HITS normalizer within the
    documented per-chunk-fold tolerance)."""
    from powergraph_ray.graph.algorithms import (run_hits, run_ppr,
                                                 run_weighted_pagerank)
    from powergraph_ray.graph.gas import build_graph_from_arrays

    src, dst = _edges()
    g = build_graph_from_arrays(src, dst, 4)

    vids, hub, auth, _ = run_hits(g, iterations=4)
    ds, _ = run_hits(g, iterations=4, result="dataset")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    order = np.argsort(vids, kind="stable")
    np.testing.assert_allclose(df["hub"].to_numpy(), hub[order], rtol=1e-12)
    np.testing.assert_allclose(df["auth"].to_numpy(), auth[order], rtol=1e-12)

    source = int(vids[0])
    vids2, scores, _ = run_ppr(g, source, iterations=6)
    ds2, _ = run_ppr(g, source, iterations=6, result="dataset")
    df2 = ds2.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_array_equal(df2["ppr"].to_numpy(),
                                  scores[np.argsort(vids2, kind="stable")])
    g.close()

    w = ((src.astype(np.int64) * 7 + dst.astype(np.int64)) % 5 + 1) \
        .astype(np.float64)
    gw = build_graph_from_arrays(src, dst, 4, edata={"weight": w})
    vids3, ranks, _ = run_weighted_pagerank(gw, iterations=5)
    ds3, _ = run_weighted_pagerank(gw, iterations=5, result="dataset")
    df3 = ds3.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_array_equal(df3["rank"].to_numpy(),
                                  ranks[np.argsort(vids3, kind="stable")])
    # the chunked 1/strength path never gathered a dense strength array
    assert getattr(gw, "_out_strength", None) is None
    gw.close()
