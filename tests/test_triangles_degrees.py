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
