"""kNN-graph + semantic-clustering tests (stages/ann.py): exact vs a numpy
brute-force oracle using the identical (-round6(sim), nbr_id) ranking,
bucket-count invariance, and a union-find oracle for the clusters."""

import os

import numpy as np
import pandas as pd
import ray.data

from powergraph_ray.ids import round_half_away
from powergraph_ray.stages.ann import knn_graph, semantic_clusters

SF = "/root/testdata/sf0.001"


def _emb(sf=SF):
    return ray.data.read_parquet(os.path.join(sf, "embeddings.parquet"),
                                 columns=["vec_id", "embedding"])


def _dense(sf=SF):
    df = _emb(sf).to_pandas().sort_values("vec_id").reset_index(drop=True)
    ids = df["vec_id"].to_numpy(np.int64)
    m = np.stack(df["embedding"].to_numpy())
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    return ids, mn


def oracle_knn(ids, mn, k):
    sims = round_half_away(mn @ mn.T, 6)
    np.fill_diagonal(sims, -np.inf)
    rows = []
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))[:k]
        order = order[np.isfinite(sims[i][order])]
        for r, j in enumerate(order):
            rows.append((ids[i], ids[j], sims[i, j], r))
    return pd.DataFrame(rows, columns=["vec_id", "nbr_id", "sim", "rank"])


def test_knn_graph_matches_bruteforce():
    ids, mn = _dense()
    want = oracle_knn(ids, mn, 5).sort_values(["vec_id", "rank"]).reset_index(drop=True)
    got = (knn_graph(_emb(), k=5, n_buckets=4).to_pandas()
           .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_knn_bucket_count_invariance():
    a = (knn_graph(_emb(), k=3, n_buckets=2).to_pandas()
         .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    b = (knn_graph(_emb(), k=3, n_buckets=7).to_pandas()
         .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def _union_find_clusters(ids, edges):
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(int(i)) for i in ids}


def test_semantic_clusters_matches_union_find():
    ids, mn = _dense()
    k = 5
    knn = oracle_knn(ids, mn, k)
    # data-derived threshold: ~40% of vectors get at least one edge, so the
    # result has both multi-vector clusters and singletons
    t = float(np.quantile(knn[knn["rank"] == 0]["sim"], 0.6))
    edges = knn[knn["sim"] >= t][["vec_id", "nbr_id"]].to_numpy()
    want = _union_find_clusters(ids, edges)
    got = semantic_clusters(_emb(), k=k, threshold=t, n_buckets=3)
    assert len(got) == len(ids)
    gm = dict(zip(got["vec_id"].astype(int), got["cluster"].astype(int)))
    for i in ids:
        assert gm[int(i)] == want[int(i)], i
    # sanity: thresholding actually produces non-trivial structure
    n_clusters = got["cluster"].nunique()
    assert 1 < n_clusters < len(ids)


def test_semantic_clusters_all_singletons_at_high_threshold():
    ids, _ = _dense()
    got = semantic_clusters(_emb(), k=3, threshold=1.1)
    assert (got["vec_id"].to_numpy(np.int64)
            == got["cluster"].to_numpy(np.int64)).all()
    assert len(got) == len(ids)


def test_semantic_clusters_dataset_mode_matches_pandas():
    """Round 4: result="dataset" returns the same (vec_id, cluster) rows
    as the legacy pandas gather (the distributed label-join path)."""
    want = semantic_clusters(_emb(), k=3, threshold=0.5, n_buckets=3)
    ds = semantic_clusters(_emb(), k=3, threshold=0.5, n_buckets=3,
                           result="dataset")
    got = (ds.to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["vec_id", "cluster"]].astype("int64"),
        want[["vec_id", "cluster"]].astype("int64"))
