"""Graph-wide relational operators + engine aggregators
(distributed_graph.hpp:967-1650, 2459-2560; distributed_aggregator.hpp)."""

import numpy as np
import pyarrow as pa

from powergraph_ray.graph.algorithms import PageRankVP
from powergraph_ray.graph.gas import GASEngine, VertexAggregator, build_graph_from_arrays
from powergraph_ray.graph import transforms as tr

from . import oracles


def _g():
    return build_graph_from_arrays(oracles.TINY_SRC.astype(np.uint64),
                                   oracles.TINY_DST.astype(np.uint64), 4)


def test_vertex_table_and_transform():
    g = _g()
    vds = tr.vertex_table(g, {"score": np.arange(g.nv, dtype=np.float64)})

    def double(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("score"), "score",
                            pa.array(np.asarray(t["score"]) * 2.0))

    out = tr.transform_vertices(vds, double).to_pandas().sort_values("vid")
    np.testing.assert_allclose(out["score"], np.arange(g.nv) * 2.0)

    # vset-restricted transform leaves other rows untouched
    sub = tr.transform_vertices(vds, double, vset=g.vids[:2]) \
        .to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_allclose(sub["score"][:2], np.arange(2) * 2.0)
    np.testing.assert_allclose(sub["score"][2:], np.arange(2, g.nv, dtype=float))
    g.close()


def test_map_reduce_fold_select():
    g = _g()
    vds = tr.vertex_table(g)
    total_deg = tr.map_reduce_vertices(
        vds, lambda t: int(np.asarray(t["out_deg"]).sum()))
    assert total_deg == 7
    assert tr.map_reduce_vertices_sum(
        vds, lambda t: np.asarray(t["out_deg"]).sum()) == 7.0
    folded = tr.fold_vertices(vds, lambda acc, t: acc + len(t), 0)
    assert folded == g.nv
    # select: vertices with out_deg == 2 → {1,2,3}
    sel = tr.select(vds, lambda t: np.asarray(t["out_deg"]) == 2)
    np.testing.assert_array_equal(sel, np.array([1, 2, 3], np.uint64))
    g.close()


def test_vset_algebra_and_neighbors():
    g = _g()
    a = np.array([0, 1], np.uint64)
    b = np.array([1, 2], np.uint64)
    np.testing.assert_array_equal(tr.vset_union(a, b), [0, 1, 2])
    np.testing.assert_array_equal(tr.vset_intersect(a, b), [1])
    np.testing.assert_array_equal(tr.vset_minus(a, b), [0])
    np.testing.assert_array_equal(tr.vset_invert(a, g), [2, 3, 5])
    # TINY edges: 0→5, 1→0, 1→5, 2→0, 2→5, 3→0, 3→5
    np.testing.assert_array_equal(tr.neighbors(g, np.array([0], np.uint64), "out"), [5])
    np.testing.assert_array_equal(tr.neighbors(g, np.array([0], np.uint64), "in"), [1, 2, 3])
    np.testing.assert_array_equal(tr.neighbors(g, np.array([0], np.uint64), "all"), [1, 2, 3, 5])
    g.close()


def test_transform_edges_sees_endpoint_values():
    g = _g()
    vals = {"x": np.arange(g.nv, dtype=np.float64)}

    def fn(src, dst, joined):
        xs, xd = joined["x"]
        return {"xsum": xs + xd}

    out = tr.transform_edges(g, vals, fn).to_pandas()
    dense = {int(v): i for i, v in enumerate(g.vids)}
    for _, r in out.iterrows():
        assert r["xsum"] == dense[int(r["src"])] + dense[int(r["dst"])]
    g.close()


def test_engine_vertex_aggregator_total_rank():
    """Closed-form self-check in the style of synchronous_engine_test.cpp:296:
    total PageRank mass tracked per superstep by a periodic aggregator equals
    the driver-side recomputation from the oracle."""
    g = _g()
    vp = PageRankVP(iterations=5)
    agg = VertexAggregator(
        map_chunk=lambda chunk, lo, hi: float(chunk["value"].sum()),
        every=1)
    eng = GASEngine(g, vp, max_iterations=5,
                    aggregators={"total_rank": agg})
    eng.run()
    hist = dict(eng.aggregates["total_rank"])
    assert sorted(hist) == [0, 1, 2, 3, 4]
    s = g.dense(oracles.TINY_SRC.astype(np.uint64))
    d = g.dense(oracles.TINY_DST.astype(np.uint64))
    for it in range(5):
        want = oracles.pagerank_fixed(s, d, g.nv, it + 1).sum()
        np.testing.assert_allclose(hist[it], want, rtol=1e-12)
    g.close()


def test_load_vertex_values_duplicate_resolution():
    """set_duplicate_vertex_strategy (distributed_ingress_base.hpp:155-159)
    as a named API: duplicate vids resolved by a commutative combine; vids
    above 2^63 survive the shuffle (bit-cast guard)."""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.graph.gas import build_graph_from_arrays, load_vertex_values

    big = np.uint64(1 << 63)
    src = np.array([1, 2, 3], np.uint64) + big
    dst = np.array([2, 3, 1], np.uint64) + big
    g = build_graph_from_arrays(src, dst, 2)

    vd = ray.data.from_arrow(pa.table({
        "vid": pa.array(np.array([1, 1, 2, 3, 3, 3], np.uint64) + big, pa.uint64()),
        "w": pa.array([5.0, 2.0, 7.0, 1.0, 9.0, 4.0]),
    }))
    got_min = load_vertex_values(g, vd, "w", combine="min")
    np.testing.assert_allclose(got_min, [2.0, 7.0, 1.0])
    got_sum = load_vertex_values(g, vd, "w", combine="sum")
    np.testing.assert_allclose(got_sum, [7.0, 7.0, 14.0])

    # missing vertex: default fills, no default raises
    vd2 = ray.data.from_arrow(pa.table({
        "vid": pa.array(np.array([1], np.uint64) + big, pa.uint64()),
        "w": pa.array([3.0])}))
    got = load_vertex_values(g, vd2, "w", combine="min", default=0.0)
    np.testing.assert_allclose(got, [3.0, 0.0, 0.0])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_vertex_values(g, vd2, "w", combine="min")
    g.close()


def test_parallel_for_vertices_stripes():
    """parallel_for_vertices (distributed_graph.hpp:1602-1650): functor i
    sees exactly its vid % k stripe; output is the union of stripes."""
    import pyarrow as pa

    from powergraph_ray.graph.transforms import parallel_for_vertices, vertex_table

    g = _g()
    vds = vertex_table(g)

    def mk(i):
        def fn(t: pa.Table) -> pa.Table:
            vid = np.asarray(t["vid"]).astype(np.uint64)
            assert (vid % 3 == i).all()
            return pa.table({"vid": t["vid"],
                             "tag": pa.array(np.full(len(vid), i, np.int64))})
        return fn

    out = parallel_for_vertices(vds, [mk(0), mk(1), mk(2)]).to_pandas()
    assert len(out) == g.nv
    assert (out["tag"].to_numpy() == (out["vid"].to_numpy().astype(np.uint64) % 3)).all()


def test_edge_aggregator_periodic():
    """add_edge_aggregator / aggregate_periodic over resident edges: the
    edge-count aggregate equals num_edges at every probe."""
    from powergraph_ray.graph.algorithms import PageRankVP
    from powergraph_ray.graph.gas import EdgeAggregator, GASEngine

    g = _g()
    agg = EdgeAggregator(map_part=lambda src, dst, edata, nv: len(src), every=2)
    eng = GASEngine(g, PageRankVP(iterations=5), max_iterations=5,
                    aggregators={"n_edges": agg})
    eng.run()
    assert len(eng.aggregates["n_edges"]) >= 2
    for it, val in eng.aggregates["n_edges"]:
        assert val == g.num_edges


def test_edge_table_dedup_shard_cache():
    """edge_table on a dedup=True graph: the first call dumps the resident
    deduped edges once (actor-parallel, no per-call wide shuffle); repeat
    calls read the cached shards and rows always equal the resident
    num_edges / the exact pair set."""
    import os

    src = np.array([1, 2, 3, 1, 2, 1, 9], np.uint64)
    dst = np.array([2, 3, 1, 2, 3, 2, 9], np.uint64)  # dup pairs + self-edge pair
    g = build_graph_from_arrays(src, dst, 3, dedup=True)
    t1 = tr.edge_table(g).to_pandas()
    d = g._dedup_dir
    assert d is not None and os.path.exists(os.path.join(d, "_SUCCESS"))
    t2 = tr.edge_table(g).to_pandas()
    pairs = sorted(map(tuple, t1[["src", "dst"]].to_numpy().tolist()))
    assert pairs == sorted(map(tuple, t2[["src", "dst"]].to_numpy().tolist()))
    assert pairs == [(1, 2), (2, 3), (3, 1), (9, 9)]
    assert len(t1) == g.num_edges
    g.close()


def test_segment_membership_counts_matches_isin():
    """Vectorized per-doc membership == the per-doc np.isin oracle."""
    from powergraph_ray.stages.text import (_flatten_hashes,
                                            _segment_membership_counts)

    rng = np.random.RandomState(7)
    whs = [rng.randint(0, 50, size=n).astype(np.uint64)
           for n in [0, 5, 1, 17, 0, 33]]
    table = np.sort(np.unique(rng.randint(0, 50, size=12).astype(np.uint64)))
    flat, lens, nd = _flatten_hashes(whs)
    got = _segment_membership_counts(flat, lens, nd, table)
    want = np.array([int(np.isin(w, table).sum()) for w in whs], np.int64)
    assert (got == want).all()
