"""neighborhood_mean_embedding (stages/features.py) vs a dense numpy oracle:
both directions, bucket-count invariance, and edges whose neighbor has no
embedding row (they must contribute nothing)."""

import numpy as np
import pandas as pd
import ray.data

from powergraph_ray.ids import round_half_away
from powergraph_ray.stages.features import neighborhood_mean_embedding


def _oracle(src, dst, ids, mat, direction):
    jk, ok_ = (src, dst) if direction == "in" else (dst, src)
    lut = {int(v): mat[i] for i, v in enumerate(ids)}
    sums, cnts = {}, {}
    for a, b in zip(jk, ok_):
        v = lut.get(int(a))
        if v is None:
            continue
        sums[int(b)] = sums.get(int(b), 0.0) + v
        cnts[int(b)] = cnts.get(int(b), 0) + 1
    rows = []
    for t in sorted(sums):
        m = round_half_away(sums[t] / cnts[t], 6)
        for i, val in enumerate(m, start=1):
            rows.append((t, i, val))
    return pd.DataFrame(rows, columns=["vid", "i", "val"])


def _setup(n_emb=40, n_vert=60, m=200, d=7, seed=5):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n_vert, m).astype(np.int64)
    dst = rng.randint(0, n_vert, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ids = np.arange(n_emb, dtype=np.int64)  # vertices >= n_emb lack vectors
    mat = rng.standard_normal((n_emb, d))
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    emb = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": list(mat)}))
    return src, dst, ids, mat, edges, emb


def test_neighborhood_mean_matches_oracle_both_directions():
    src, dst, ids, mat, edges, emb = _setup()
    for direction in ("in", "out"):
        got = (neighborhood_mean_embedding(edges, emb, direction=direction,
                                           n_buckets=5)
               .to_pandas().sort_values(["vid", "i"]).reset_index(drop=True))
        want = _oracle(src, dst, ids, mat, direction)
        assert len(got) == len(want)
        np.testing.assert_array_equal(got["vid"], want["vid"])
        np.testing.assert_array_equal(got["i"], want["i"])
        np.testing.assert_allclose(got["val"], want["val"], atol=1e-9)


def test_neighborhood_mean_bucket_invariance():
    _, _, _, _, edges, emb = _setup(seed=6)
    a = (neighborhood_mean_embedding(edges, emb, n_buckets=2).to_pandas()
         .sort_values(["vid", "i"]).reset_index(drop=True))
    b = (neighborhood_mean_embedding(edges, emb, n_buckets=13).to_pandas()
         .sort_values(["vid", "i"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
