import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from powergraph_ray.sources import repo_table as rt
from powergraph_ray.stages.edge_builder import build_doc_edges, build_hashed_edges, dedup_edges

SF = "/root/testdata/sf0.001"


def test_ground_truth_no_self_no_dup():
    e = rt.doc_edge_ground_truth(500)
    assert (e[:, 0] != e[:, 1]).all()
    assert len(np.unique(e, axis=0)) == len(e)


def test_repo_table_content_sha256_invariant():
    """Per-row invariant (BASELINE.json input_hint): content sha256 equality
    between the source Parquet and the Ray-ingested table."""
    path = rt.ensure_repo_table(SF)
    src_tbl = pq.read_table(path)
    ingested = ray.data.read_parquet(path)

    def sha(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(c.encode()).hexdigest() for c in batch["content"].to_pylist()]
        return pa.table({"repo": batch["repo"], "path": batch["path"],
                         "sha": pa.array(hs, pa.string())})

    got = ingested.map_batches(sha, batch_format="pyarrow").to_pandas()
    got = got.sort_values(["repo", "path"]).reset_index(drop=True)
    want = {}
    for r, p, c in zip(src_tbl["repo"].to_pylist(), src_tbl["path"].to_pylist(), src_tbl["content"].to_pylist()):
        want[(r, p)] = hashlib.sha256(c.encode()).hexdigest()
    assert len(got) == len(want)
    for r, p, s in zip(got["repo"], got["path"], got["sha"]):
        assert want[(r, p)] == s


def test_doc_edges_match_closed_form():
    """The regex edge builder over generated content must recover exactly the
    closed-form edge set."""
    repo_ds = rt.read_repo_table(SF)
    n = 500
    edges = build_doc_edges(repo_ds).to_pandas()
    got = np.unique(np.stack([edges["src"].to_numpy(), edges["dst"].to_numpy()], axis=1), axis=0)
    want = rt.doc_edge_ground_truth(n)
    assert got.shape == want.shape
    assert (got == want).all()


def test_hashed_edges_consistent_with_doc_edges():
    from powergraph_ray.ids import hash64_str

    repo_ds = rt.read_repo_table(SF)
    n = 500
    hashed = build_hashed_edges(repo_ds).to_pandas()
    want = rt.doc_edge_ground_truth(n)
    h = np.fromiter((hash64_str(f"{rt.repo_of(i)}:{rt.path_of(i)}") for i in range(n)),
                    dtype=np.uint64, count=n)
    want_h = np.unique(np.stack([h[want[:, 0]], h[want[:, 1]]], axis=1), axis=0)
    got = np.unique(np.stack([hashed["src"].to_numpy().astype(np.uint64),
                              hashed["dst"].to_numpy().astype(np.uint64)], axis=1), axis=0)
    assert got.shape == want_h.shape
    assert (got == want_h).all()


def test_dedup_edges_directed():
    t = pa.table({"src": pa.array([1, 1, 2, 2, 1], pa.uint64()),
                  "dst": pa.array([2, 2, 1, 1, 3], pa.uint64())})
    out = dedup_edges(ray.data.from_arrow(t)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert [tuple(r) for r in out.to_numpy()] == [(1, 2), (1, 3), (2, 1)]


def test_dedup_edges_uint64_beyond_int63():
    """uint64 hash keys ≥ 2^63 must survive the dedup shuffle with exact
    values and uint64 schema (Ray's sort-aggregate overflows C long without
    the bit-cast guard)."""
    import pyarrow as pa
    import ray.data

    big = np.array([2**63 + 5, 2**64 - 1, 7, 2**63 + 5], np.uint64)
    t = pa.table({"src": pa.array(big, pa.uint64()),
                  "dst": pa.array(big[::-1], pa.uint64())})
    out = dedup_edges(ray.data.from_arrow(t), uint64_keys=True)
    got = out.to_pandas()
    assert str(got["src"].dtype) == "uint64"
    pairs = set(zip((int(x) for x in got["src"]), (int(x) for x in got["dst"])))
    assert pairs == {(2**63 + 5, 2**63 + 5), (2**64 - 1, 7), (7, 2**64 - 1)}
