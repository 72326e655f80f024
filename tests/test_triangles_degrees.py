import numpy as np
import pyarrow as pa
import ray.data

from powergraph_ray.graph.triangles import triangle_per_vertex, triangle_total
from powergraph_ray.stages.degrees import degree_histogram, degree_table, degree_top_k
from powergraph_ray.sources.repo_table import doc_edge_ground_truth

from . import oracles


def _edges_ds(src, dst):
    return ray.data.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                         "dst": pa.array(dst, pa.int64())}))


def test_triangle_tiny():
    # tiny graph: triangles {1,0,5},{2,0,5},{3,0,5} = 3
    ds = _edges_ds(oracles.TINY_SRC, oracles.TINY_DST)
    assert triangle_total(ds) == 3


def test_triangle_doc_graph_exact():
    e = doc_edge_ground_truth(500)
    ds = _edges_ds(e[:, 0], e[:, 1])
    want = oracles.triangle_total(e[:, 0], e[:, 1], 500)
    assert triangle_total(ds) == want


def test_triangle_per_vertex_exact():
    e = doc_edge_ground_truth(300)
    ds = _edges_ds(e[:, 0], e[:, 1])
    got = triangle_per_vertex(ds).to_pandas().sort_values("vid").reset_index(drop=True)
    vids = np.unique(e)
    want = oracles.triangles_per_vertex(e[:, 0], e[:, 1], 300)
    assert (got["vid"].to_numpy() == vids).all()
    np.testing.assert_array_equal(got["n_tri"].to_numpy(), want[vids])


def test_triangle_bucket_invariance_and_uint64():
    """Counts are independent of the grid bucket count B, and full-range
    uint64 ids survive the cell shuffle (bit-cast pattern)."""
    e = doc_edge_ground_truth(200)
    ds = _edges_ds(e[:, 0], e[:, 1])
    want = oracles.triangle_total(e[:, 0], e[:, 1], 200)
    for b in (2, 5):
        assert triangle_total(ds, n_buckets=b) == want
    big = np.uint64(1 << 63)
    ds_u = ray.data.from_arrow(pa.table({
        "src": pa.array(e[:, 0].astype(np.uint64) + big, pa.uint64()),
        "dst": pa.array(e[:, 1].astype(np.uint64) + big, pa.uint64())}))
    assert triangle_total(ds_u, n_buckets=3) == want
    pv = triangle_per_vertex(ds_u, n_buckets=3).to_pandas().sort_values("vid")
    assert pv["vid"].dtype == np.uint64
    want_pv = oracles.triangles_per_vertex(e[:, 0], e[:, 1], 200)
    vids = np.unique(e)
    np.testing.assert_array_equal(pv["vid"].to_numpy() - big, vids.astype(np.uint64))
    np.testing.assert_array_equal(pv["n_tri"].to_numpy(), want_pv[vids])


def _directed_census_oracle(src, dst):
    """Brute-force per-vertex directed census over the distinct directed
    edge set (directed_triangle_count.cpp:598-656 semantics)."""
    keep = src != dst
    E = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    outs: dict[int, set] = {}
    ins: dict[int, set] = {}
    for a, b in E:
        outs.setdefault(int(a), set()).add(int(b))
        ins.setdefault(int(b), set()).add(int(a))
    verts = np.unique(E)
    cnt = {int(v): [0, 0, 0, 0] for v in verts}  # in, out, through, cycle
    for a, b in E:
        a, b = int(a), int(b)
        s_s = len(outs.get(a, set()) & outs.get(b, set()))
        st_st = len(ins.get(a, set()) & ins.get(b, set()))
        st_s = len(ins.get(a, set()) & outs.get(b, set()))
        cnt[a][1] += s_s
        cnt[a][2] += st_st
        cnt[a][3] += st_s
        cnt[b][0] += st_st
    return verts, cnt, outs, ins


def test_directed_triangle_census_exact():
    from powergraph_ray.graph.triangles import (directed_triangle_census,
                                                directed_triangle_counts)

    e = doc_edge_ground_truth(250)
    src, dst = e[:, 0], e[:, 1]
    ds = _edges_ds(src, dst)
    verts, cnt, outs, ins = _directed_census_oracle(src, dst)
    got = directed_triangle_census(ds, n_buckets=3).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert (got["vid"].to_numpy() == verts).all()
    for _, r in got.iterrows():
        v = int(r["vid"])
        assert [r["in_tri"], r["out_tri"], r["through_tri"], r["cycle_tri"]] == cnt[v]
        assert r["out_deg"] == len(outs.get(v, set()))
        assert r["in_deg"] == len(ins.get(v, set()))
    # global totals agree with the census sums (cycle counted once per corner)
    tot = directed_triangle_counts(ds, n_buckets=4)
    assert int(tot["n_trans"][0]) == int(got["out_tri"].sum())
    assert int(tot["n_cycle"][0]) == int(got["cycle_tri"].sum()) // 3


def test_degree_table_and_topk():
    e = doc_edge_ground_truth(500)
    dt = degree_table(_edges_ds(e[:, 0], e[:, 1])).to_pandas().sort_values("vid")
    out_want = np.bincount(e[:, 0], minlength=500)
    in_want = np.bincount(e[:, 1], minlength=500)
    vids = dt["vid"].to_numpy()
    np.testing.assert_array_equal(dt["out_deg"].to_numpy(), out_want[vids])
    np.testing.assert_array_equal(dt["in_deg"].to_numpy(), in_want[vids])
    top = degree_top_k(_edges_ds(e[:, 0], e[:, 1]), 5).to_pandas()
    deg = out_want + in_want
    order = np.lexsort((np.arange(500), -deg))[:5]
    np.testing.assert_array_equal(top["vid"].to_numpy(), order)

    hist = degree_histogram(_edges_ds(e[:, 0], e[:, 1])).to_pandas()
    assert hist["n_vertices"].sum() == len(vids)


def test_degree_assortativity_star_is_minus_one():
    """A star is maximally disassortative: r = −1 exactly."""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.stages.degrees import degree_assortativity

    src = np.zeros(7, np.int64)
    dst = np.arange(1, 8, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))
    out = degree_assortativity(ds)
    assert abs(out["assortativity"].iloc[0] + 1.0) < 1e-12
    assert int(out["n_samples"].iloc[0]) == 14  # 2·7 ordered samples


def test_degree_assortativity_matches_sequential():
    """Random graph vs a direct dense-numpy Pearson computation."""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.stages.degrees import degree_assortativity

    rng = np.random.default_rng(3)
    src = rng.integers(0, 40, 200).astype(np.int64)
    dst = rng.integers(0, 40, 200).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))
    out = degree_assortativity(ds)

    pairs = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist())}
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    xs, ys = [], []
    for v, ns in nbrs.items():
        for u in ns:
            xs.append(len(nbrs[v]))
            ys.append(len(nbrs[u]))
    want = np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1]
    assert abs(out["assortativity"].iloc[0] - want) < 1e-9


def test_edge_reciprocity_exact():
    import pyarrow as pa
    import ray.data

    from powergraph_ray.stages.degrees import edge_reciprocity

    # 1→2, 2→1 (reciprocal), 1→3, 3→4, 4→4 (self, dropped), dup 1→3
    src = np.array([1, 2, 1, 3, 4, 1], np.int64)
    dst = np.array([2, 1, 3, 4, 4, 3], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))
    out = edge_reciprocity(ds)
    assert int(out["n_directed"].iloc[0]) == 4
    assert abs(out["reciprocity"].iloc[0] - 0.5) < 1e-12
