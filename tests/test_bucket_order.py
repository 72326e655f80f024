"""Bucket-aligned vid ordering (build_graph(vid_order="bucket")) + the
range-restricted sharded superstep: algorithm results must match the default
sorted-vid ordering exactly (integer programs) / to float-reorder tolerance
(PageRank), partitions must only touch their two grid buckets, and
checkpoint/resume + save/load must round-trip the ordering."""

import numpy as np
import pytest

from powergraph_ray.graph.algorithms import (
    run_connected_components,
    run_pagerank,
    run_sssp,
)
from powergraph_ray.graph.gas import (
    GASEngine,
    build_graph_from_arrays,
    load_graph,
    load_vertex_values,
    save_graph,
)
from powergraph_ray.ids import integer_mix
from powergraph_ray.sources.synthetic import synthetic_powerlaw_arrays


@pytest.fixture(scope="module")
def edges():
    s, d = synthetic_powerlaw_arrays(1200, alpha=1.0, seed=5)
    return s.astype(np.uint64), d.astype(np.uint64)


@pytest.fixture(scope="module")
def graphs(edges):
    src, dst = edges
    g_sorted = build_graph_from_arrays(src, dst, 16, dedup=True,
                                       ingress="random")
    g_bucket = build_graph_from_arrays(src, dst, 16, dedup=True,
                                       ingress="grid", vid_order="bucket")
    return g_sorted, g_bucket


def _by_vid(vids, vals):
    order = np.argsort(vids, kind="stable")
    return vids[order], np.asarray(vals)[order]


def test_bucket_structure(graphs):
    _, gb = graphs
    assert gb.vid_order == "bucket"
    bb = gb.bucket_bounds
    assert bb[0] == 0 and bb[-1] == gb.nv
    s = 4  # sqrt(16)
    bkt = (integer_mix(gb.vids) % np.uint64(s)).astype(np.int64)
    # dense order is (bucket, vid): buckets are contiguous, sorted within
    assert (np.diff(bkt) >= 0).all()
    for i in range(s):
        seg = gb.vids[bb[i]:bb[i + 1]]
        assert (np.diff(seg.view(np.uint64)) > 0).all()
        assert ((integer_mix(seg) % np.uint64(s)) == i).all()
    # same vertex/edge universe as the sorted graph
    assert gb.nv == graphs[0].nv
    assert gb.num_edges == graphs[0].num_edges


def test_partition_touches_two_buckets(graphs, edges):
    """A grid partition (i,j)'s endpoints live in buckets {i,j} only — the
    locality the range-restricted superstep exploits."""
    import pyarrow.parquet as pq
    import os

    _, gb = graphs
    s = 4
    for p in range(gb.num_partitions):
        path = os.path.join(gb.parquet_dir, f"part={p}")
        if not os.path.isdir(path):
            continue
        t = pq.read_table(path, columns=["src", "dst"])
        vs = np.union1d(np.asarray(t["src"], np.uint64),
                        np.asarray(t["dst"], np.uint64))
        assert len(np.unique(integer_mix(vs) % np.uint64(s))) <= 2


def test_engine_bounds_bucket_aligned(graphs):
    _, gb = graphs
    eng = GASEngine(gb, _DummyVP(), reduce_shards=16)
    # every engine bound lies inside exactly one bucket (no straddling)
    bb = set(int(x) for x in gb.bucket_bounds)
    inner = [int(x) for x in eng.bounds]
    assert inner[0] == 0 and inner[-1] == gb.nv
    assert (np.diff(eng.bounds) >= 0).all()
    for cut in bb:
        assert cut in set(inner)  # bucket boundaries are range boundaries


class _DummyVP:
    shardable = True
    broadcast_keys = ("value",)

    def max_iterations(self):
        return 1


def test_pagerank_matches_sorted(graphs):
    gs, gb = graphs
    _, r1, e1 = run_pagerank(gs, tol=1e-6)
    _, r2, e2 = run_pagerank(gb, tol=1e-6)
    v1, r1 = _by_vid(gs.vids, r1)
    v2, r2 = _by_vid(gb.vids, r2)
    np.testing.assert_array_equal(v1, v2)
    # partition edge order differs → float sum order differs; semantics equal
    np.testing.assert_allclose(r1, r2, rtol=1e-9, atol=1e-9)
    assert len(e1.metrics) == len(e2.metrics)  # same convergence trajectory


def test_cc_and_sssp_exact_match(graphs):
    gs, gb = graphs
    _, c1, _ = run_connected_components(gs)
    _, c2, _ = run_connected_components(gb)
    np.testing.assert_array_equal(_by_vid(gs.vids, c1)[1], _by_vid(gb.vids, c2)[1])
    source = int(gs.vids[np.argmax(gs.out_deg + gs.in_deg)])
    _, d1, _ = run_sssp(gs, source)
    _, d2, _ = run_sssp(gb, source)
    np.testing.assert_array_equal(_by_vid(gs.vids, d1)[1], _by_vid(gb.vids, d2)[1])


def test_checkpoint_resume_bit_identical(graphs, tmp_path):
    _, gb = graphs
    ck = str(tmp_path / "ck")
    _, full, _ = run_pagerank(gb, tol=1e-6, checkpoint_path=ck)
    # re-run resuming from the midpoint checkpoint: must land bit-identically
    import glob
    import os
    import shutil

    iters = sorted(glob.glob(os.path.join(ck, "iter=*")))
    for d in iters[len(iters) // 2:]:          # drop the back half
        shutil.rmtree(d)
    _, resumed, _ = run_pagerank(gb, tol=1e-6, checkpoint_path=ck, resume=True)
    np.testing.assert_array_equal(full, resumed)


def test_save_load_roundtrip(graphs, tmp_path):
    _, gb = graphs
    p = str(tmp_path / "snap")
    save_graph(gb, p)
    g2 = load_graph(p)
    assert g2.vid_order == "bucket"
    np.testing.assert_array_equal(g2.vids, gb.vids)
    np.testing.assert_array_equal(g2.bucket_bounds, gb.bucket_bounds)
    _, c1, _ = run_connected_components(gb)
    _, c2, _ = run_connected_components(g2)
    np.testing.assert_array_equal(c1, c2)
    g2.close()


def test_load_vertex_values_bucket(graphs):
    import pyarrow as pa
    import ray.data

    _, gb = graphs
    # value = f(vid); loaded array must align with the bucket-ordered vids
    want = (gb.vids % np.uint64(97)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vid": pa.array(gb.vids, pa.uint64()),
        "score": pa.array(want, pa.int64()),
    }))
    got = load_vertex_values(gb, ds, "score", combine="min")
    np.testing.assert_array_equal(got, want)


def test_load_vertex_value_chunks_matches_dense(graphs):
    """Round 4: the chunked loader (engine warm-start path) must agree
    with the dense legacy loader on BOTH vid orderings, range by range."""
    import pyarrow as pa
    import ray
    import ray.data

    from powergraph_ray.graph.gas import load_vertex_value_chunks

    for g in graphs:
        want = (g.vids % np.uint64(101)).astype(np.float64)
        ds = ray.data.from_arrow(pa.table({
            "vid": pa.array(g.vids, pa.uint64()),
            "w": pa.array(want, pa.float64()),
        }))
        bounds = np.linspace(0, g.nv, 5).astype(np.int64)
        refs = load_vertex_value_chunks(g, ds, "w", bounds, combine="max")
        got = np.concatenate(ray.get(refs))
        np.testing.assert_array_equal(got, want)
        dense = load_vertex_values(g, ds, "w", combine="max")
        np.testing.assert_array_equal(got, dense)


def test_multi_source_reach_matches_sigma_bfs(graphs):
    """Round 4: the reach-only VP's uint16 levels must equal the
    σ-counting VP's distances on both orderings, directed + undirected."""
    from powergraph_ray.graph.centrality import (UNREACHED,
                                                 multi_source_bfs,
                                                 multi_source_reach)

    for g in graphs:
        si = np.arange(0, g.nv, max(1, g.nv // 37), dtype=np.int64)[:24]
        for directed in (False, True):
            dist, _ = multi_source_bfs(g, si=si, directed=directed)
            eng, chunks = multi_source_reach(g, si, directed=directed)
            d16 = eng._gather_chunks(chunks)["dist"]
            dr = np.where(d16 == UNREACHED, np.inf, d16.astype(np.float64))
            np.testing.assert_array_equal(dr, dist)


def test_centrality_kernels_no_dense_transient():
    """Round 5: the multi-source-BFS family's partition kernels must stay
    touched-range-sized — a kernel that allocates a full (nv, S) transient
    (the pre-round-5 dense fallback shape) would show up as an
    nv-proportional tracemalloc peak here. nv = 1M with all edges inside a
    1k-vertex range and S = 64: a dense transient would be ≥ 512 MB
    (float64) / 64 MB (bool); the range-native kernels stay under 16 MB.
    Also asserts the dense fallbacks are gone from the VP surface."""
    import tracemalloc

    from powergraph_ray.graph.centrality import (
        UNREACHED,
        BrandesBackwardVP,
        MultiSourceBFSVP,
        MultiSourceReachVP,
    )

    nv, S, ne = 1_000_000, 64, 4_000
    rng = np.random.default_rng(11)
    src = rng.integers(0, 1_000, ne).astype(np.int64)
    dst = rng.integers(0, 1_000, ne).astype(np.int64)
    order = np.lexsort((src, dst))          # edge blocks are (dst, src)-sorted
    src, dst = src[order], dst[order]
    bounds = np.array([0, 1_000, nv], np.int64)
    tidx = np.array([0], np.int64)

    for vp_name in ("partial", "partial_aux", "init_bundle", "apply"):
        for cls in (MultiSourceBFSVP, MultiSourceReachVP, BrandesBackwardVP):
            assert vp_name not in vars(cls), (
                f"{cls.__name__}.{vp_name} dense fallback resurrected")

    # broadcast arrays are allocated OUTSIDE the traced window (the engine
    # holds them persistently per actor); only the kernel's own transients
    # are measured. Round 5b: the gather kernels broadcast only what they
    # read (sigma/fresh for σ-BFS, fresh for reach, ratio + uint16 levels
    # for the backward pass).
    sigma = np.ones((nv, S))
    fresh = np.zeros((nv, S), bool)
    fresh[:1_000] = True
    d16 = np.full((nv, S), UNREACHED, np.uint16)
    d16[:1_000] = 1
    ratio = np.ones((nv, S))

    budget = 16 << 20
    cases = [
        (MultiSourceBFSVP(np.array([0]), directed=False),
         lambda vp, aux: vp.partial_sharded(src, dst, nv, 0, bounds, tidx,
                                            aux, sigma, fresh)),
        (MultiSourceReachVP(np.array([0]), directed=False),
         lambda vp, aux: vp.partial_sharded(src, dst, nv, 0, bounds, tidx,
                                            aux, fresh)),
        (BrandesBackwardVP(3, directed=False),
         lambda vp, aux: vp.partial_sharded(src, dst, nv, 2, bounds, tidx,
                                            aux, ratio, d16)),
    ]
    for vp, run in cases:
        aux = vp.build_aux(src, dst, nv)
        tracemalloc.start()
        out = run(vp, aux)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert set(out) == {0} and len(out[0]) == 1_000
        assert peak < budget, (type(vp).__name__, peak)


def test_build_graph_auto_deployment_default(edges):
    """Round 5: ingress/vid_order default to 'auto' — grid+bucket at
    deployment-square partition counts (P >= 16), random/sorted below."""
    src, dst = edges
    g = build_graph_from_arrays(src, dst, 16, dedup=True)
    try:
        assert g.vid_order == "bucket"
        assert g.bucket_bounds is not None
        assert g.replication_factor <= 2 * 4 - 1 + 1e-9  # grid bound
    finally:
        g.close()
    g_small = build_graph_from_arrays(src, dst, 8, dedup=True)
    try:
        assert g_small.vid_order == "sorted"
        assert g_small.bucket_bounds is None
    finally:
        g_small.close()
