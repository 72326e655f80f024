"""Spectral toolkit vs dense numpy oracles (graph_laplacian.cpp,
eigen_vector_normalization.cpp, TSC.cpp semantics)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from powergraph_ray.graph.gas import build_graph_from_arrays
from powergraph_ray.graph.spectral import (
    adjacency_matvec,
    normalize_rows,
    normalized_laplacian,
    total_subgraph_centrality,
)


@pytest.fixture(scope="module")
def rand_edges():
    rng = np.random.default_rng(3)
    n, m = 120, 500
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


def test_normalized_laplacian_exact(rand_edges):
    src, dst = rand_edges
    eds = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    lap = normalized_laplacian(eds).to_pandas()
    pairs = {(min(s, d), max(s, d)) for s, d in zip(src, dst)}
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want = {}
    for a, b in pairs:
        w = round(-1.0 / np.sqrt(deg[a] * deg[b]), 6)
        want[(a, b)] = w
        want[(b, a)] = w
    for v in deg:
        want[(v, v)] = 1.0
    got = {(r.i, r.j): r.lap for r in lap.itertuples()}
    assert got == want


def test_normalize_rows_exact():
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[3.0, 4.0], [1.0, 1.0]], pa.list_(pa.float32())),
    }))
    nr = normalize_rows(emb).to_pandas().sort_values(["vec_id", "i"])
    r2 = round(1 / np.sqrt(2), 6)
    np.testing.assert_allclose(nr["val"].to_numpy(), [0.6, 0.8, r2, r2])


def test_tsc_matches_dense_expm(rand_edges):
    src, dst = rand_edges
    g = build_graph_from_arrays(src.astype(np.uint64), dst.astype(np.uint64), 4,
                                dedup=True)
    # oracle: exp(A_dir + A_dir^T)·1 by dense eigendecomposition
    dd = set(zip(src.tolist(), dst.tolist()))
    A = np.zeros((g.nv, g.nv))
    for a, b in dd:
        ia = int(np.searchsorted(g.vids, a))
        ib = int(np.searchsorted(g.vids, b))
        A[ia, ib] += 1.0
        A[ib, ia] += 1.0
    # matvec parity first (one superstep)
    x = np.arange(g.nv, dtype=np.float64)
    np.testing.assert_allclose(adjacency_matvec(g, x), A @ x, rtol=1e-12)
    lam, U = np.linalg.eigh(A)
    exact = U @ (np.exp(lam) * (U.T @ np.ones(g.nv)))
    tsc, iters = total_subgraph_centrality(g)
    assert iters < 40
    rel = np.max(np.abs(tsc - exact) / (1e-15 + np.abs(exact)))
    assert rel < 1e-8
    g.close()


def test_spectral_partition_planted_communities():
    """partitioning.cpp pipeline: two dense planted communities joined by one
    bridge edge must separate perfectly and deterministically."""
    from powergraph_ray.graph.spectral import spectral_partition

    rng = np.random.default_rng(9)

    def comm(lo, n, m):
        a = rng.integers(lo, lo + n, m)
        b = rng.integers(lo, lo + n, m)
        k = a != b
        return a[k], b[k]

    a1, b1 = comm(0, 40, 300)
    a2, b2 = comm(40, 40, 300)
    src = np.concatenate([a1, a2, [0]]).astype(np.uint64)
    dst = np.concatenate([b1, b2, [50]]).astype(np.uint64)
    g = build_graph_from_arrays(src, dst, 4, dedup=True)
    labels, emb = spectral_partition(g, 2)
    lo = labels[g.vids < 40]
    hi = labels[g.vids >= 40]
    assert len(set(lo.tolist())) == 1 and len(set(hi.tolist())) == 1
    assert lo[0] != hi[0]
    labels2, _ = spectral_partition(g, 2)
    np.testing.assert_array_equal(labels, labels2)
    g.close()


def test_sessionize_oracle():
    """Session windows vs a direct pandas implementation."""
    import pandas as pd

    from powergraph_ray.stages.events import sessionize

    rng = np.random.default_rng(4)
    n = 2000
    ts = (np.datetime64("2026-01-01") +
          rng.integers(0, 7 * 24 * 3600, n).astype("timedelta64[s]"))
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                       "ts": ts, "user_id": rng.integers(0, 40, n)})
    got = (sessionize(ray.data.from_pandas(df), gap_minutes=30)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        t = g["ts"].to_numpy()
        new = np.ones(len(t), bool)
        new[1:] = (t[1:] - t[:-1]) > np.timedelta64(30 * 60, "s")
        sid = np.cumsum(new) - 1
        sizes = np.bincount(sid)
        durs = [(t[sid == i][-1] - t[sid == i][0]) / np.timedelta64(60, "s")
                for i in range(sizes.size)]
        rows.append((uid, sizes.size, sizes.max(), max(durs)))
    want = pd.DataFrame(rows, columns=["user_id", "n_sessions",
                                       "longest_session_events",
                                       "max_session_minutes"])
    assert got["n_sessions"].tolist() == want["n_sessions"].tolist()
    assert got["longest_session_events"].tolist() == want["longest_session_events"].tolist()
    np.testing.assert_allclose(got["max_session_minutes"], want["max_session_minutes"])


def test_tsc_column_mode(rand_edges):
    """--column mode (TSC.cpp:228): b = e_j gives column j of exp(A)."""
    src, dst = rand_edges
    g = build_graph_from_arrays(src.astype(np.uint64), dst.astype(np.uint64), 4,
                                dedup=True)
    dd = set(zip(src.tolist(), dst.tolist()))
    A = np.zeros((g.nv, g.nv))
    for a, b in dd:
        ia = int(np.searchsorted(g.vids, a))
        ib = int(np.searchsorted(g.vids, b))
        A[ia, ib] += 1.0
        A[ib, ia] += 1.0
    lam, U = np.linalg.eigh(A)
    e0 = np.zeros(g.nv)
    e0[0] = 1.0
    exact = U @ (np.exp(lam) * (U.T @ e0))
    col, _ = total_subgraph_centrality(g, b=e0)
    assert np.max(np.abs(col - exact)) / np.max(np.abs(exact)) < 1e-8
    g.close()


def test_asof_join_oracle():
    """As-of join vs a direct per-row python oracle."""
    import pandas as pd

    from powergraph_ray.stages.events import asof_join

    rng = np.random.default_rng(8)
    n = 1500
    ts = (np.datetime64("2026-02-01") +
          rng.integers(0, 3 * 24 * 3600, n).astype("timedelta64[s]"))
    types = rng.choice(["click", "purchase", "view"], n)
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "ts": ts,
                       "user_id": rng.integers(0, 25, n),
                       "event_type": types,
                       "value": rng.normal(size=n)})
    got = (asof_join(ray.data.from_pandas(df), "click", "purchase")
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    want_rows = []
    for r in df[df["event_type"] == "click"].itertuples():
        cand = df[(df["event_type"] == "purchase")
                  & (df["user_id"] == r.user_id) & (df["ts"] <= r.ts)]
        if len(cand):
            best = cand.sort_values(["ts", "event_id"]).iloc[-1]
            want_rows.append((r.event_id, int(best["event_id"]), best["value"]))
        else:
            want_rows.append((r.event_id, -1, 0.0))
    want = pd.DataFrame(want_rows, columns=["event_id", "asof_event_id",
                                            "asof_value"]).sort_values(
        "event_id").reset_index(drop=True)
    assert got["asof_event_id"].tolist() == want["asof_event_id"].tolist()
    np.testing.assert_allclose(got["asof_value"], want["asof_value"])


def test_time_range_count_oracle():
    """Banded range join vs O(n²) python oracle, including bucket-boundary
    pairs (inclusive window on both ends)."""
    import pandas as pd

    from powergraph_ray.stages.events import time_range_count

    rng = np.random.default_rng(2)
    n = 800
    ts = (np.datetime64("2026-03-01") +
          rng.integers(0, 3600, n).astype("timedelta64[s]"))
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "ts": ts})
    got = (time_range_count(ray.data.from_pandas(df).repartition(4), window_s=30)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    t = ts.astype("datetime64[s]").astype(np.int64)
    want = np.array([(np.abs(t - t[i]) <= 30).sum() - 1 for i in range(n)])
    assert got["n_nearby"].tolist() == want.tolist()


def test_spectral_embedding_matches_dense_eigh():
    """Top-k adjacency eigenvectors vs numpy's dense eigendecomposition:
    eigenvalues match and each Ritz vector aligns with the dense
    eigenvector (|cos| ≈ 1) on a graph with a separated spectrum."""
    import itertools

    from powergraph_ray.graph.gas import build_graph_from_arrays
    from powergraph_ray.graph.spectral import spectral_embedding

    # a 12-clique and an 8-clique bridged once: distinct leading eigenpairs
    edges = [(a, b) for a, b in itertools.combinations(range(12), 2)]
    edges += [(a, b) for a, b in itertools.combinations(range(20, 28), 2)]
    edges.append((0, 20))
    src = np.array([e[0] for e in edges], np.uint64)
    dst = np.array([e[1] for e in edges], np.uint64)
    g = build_graph_from_arrays(src, dst, 3)

    emb, lam = spectral_embedding(g, k=3)

    dense = np.zeros((g.nv, g.nv))
    ds_src, ds_dst = g.dense(src), g.dense(dst)
    dense[ds_src, ds_dst] = 1.0
    dense[ds_dst, ds_src] = 1.0
    wl, wv = np.linalg.eigh(dense)
    np.testing.assert_allclose(lam, wl[::-1][:3], rtol=1e-9, atol=1e-9)
    for c in range(3):
        cos = abs(float(emb[:, c] @ wv[:, g.nv - 1 - c]))
        assert cos > 1.0 - 1e-9, f"column {c}: |cos|={cos}"
    # deterministic across runs (fixed start vector + sign canonicalization)
    emb2, _ = spectral_embedding(g, k=3)
    np.testing.assert_array_equal(emb, emb2)


def test_spectral_embedding_feeds_similarity_stack():
    """graph → spectral embedding → kNN/semantic clustering composition:
    the two planted cliques come back as the two embedding-space clusters."""
    import itertools

    from powergraph_ray.graph.gas import build_graph_from_arrays
    from powergraph_ray.graph.spectral import embedding_dataset, spectral_embedding
    from powergraph_ray.stages.ann import semantic_clusters

    edges = [(a, b) for a, b in itertools.combinations(range(10), 2)]
    edges += [(a, b) for a, b in itertools.combinations(range(30, 40), 2)]
    edges.append((0, 30))
    src = np.array([e[0] for e in edges], np.uint64)
    dst = np.array([e[1] for e in edges], np.uint64)
    g = build_graph_from_arrays(src, dst, 3)

    emb, _ = spectral_embedding(g, k=4)
    out = semantic_clusters(embedding_dataset(g, emb), k=3, threshold=0.6)
    lab = dict(zip(out["vec_id"].astype(int), out["cluster"].astype(int)))
    # the bridge endpoints (0, 30) pick up a cross-clique embedding
    # component; the interior members must split exactly by clique
    a = {lab[v] for v in range(1, 10)}
    b = {lab[v] for v in range(31, 40)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_tsc_dataset_mode_matches_array(rand_edges):
    """result="dataset" (chunk-native, no driver gather) rows == the array
    path values, vid-aligned."""
    src, dst = rand_edges
    g = build_graph_from_arrays(src.astype(np.uint64), dst.astype(np.uint64), 4,
                                dedup=True)
    arr, used_a = total_subgraph_centrality(g)
    ds, used_d = total_subgraph_centrality(g, result="dataset")
    assert used_a == used_d
    df = ds.to_pandas()
    pos = np.searchsorted(g.vids, df["vid"].to_numpy(np.uint64))
    np.testing.assert_array_equal(df["tsc"].to_numpy(), arr[pos])
    g.close()


def test_spectral_dataset_modes():
    """spectral_embedding / spectral_partition dataset modes line up with
    their array paths (same values / labels, vid-keyed)."""
    import itertools

    from powergraph_ray.graph.spectral import (
        spectral_embedding,
        spectral_partition,
    )

    edges = [(a, b) for a, b in itertools.combinations(range(12), 2)]
    edges += [(a, b) for a, b in itertools.combinations(range(20, 28), 2)]
    edges.append((0, 20))
    src = np.array([e[0] for e in edges], np.uint64)
    dst = np.array([e[1] for e in edges], np.uint64)
    g = build_graph_from_arrays(src, dst, 3)

    emb, lam = spectral_embedding(g, k=3)
    eds, lam2 = spectral_embedding(g, k=3, result="dataset")
    np.testing.assert_array_equal(lam, lam2)
    df = eds.to_pandas()
    pos = np.searchsorted(g.vids, df["vec_id"].to_numpy(np.int64).astype(np.uint64))
    got = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    np.testing.assert_array_equal(got, emb[pos])

    labels, _ = spectral_partition(g, 2)
    ads, cents = spectral_partition(g, 2, result="dataset")
    adf = ads.to_pandas()
    pos = np.searchsorted(g.vids, adf["vid"].to_numpy(np.uint64))
    lab = np.empty(g.nv, np.int64)
    lab[pos] = adf["cluster"].to_numpy(np.int64)
    # same partition (labels may permute between the two kmeans runs only
    # if the seeding differed — it doesn't: both seed the first k dense
    # rows — so require exact equality)
    np.testing.assert_array_equal(lab, labels)
    g.close()


def test_laplacian_join_path_equals_broadcast(rand_edges):
    """The scale-path co-bucketed join must emit exactly the broadcast
    path's rows (broadcast_max_verts=0 forces the join)."""
    src, dst = rand_edges
    eds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                        "dst": pa.array(dst)}))
    a = (normalized_laplacian(eds).to_pandas()
         .sort_values(["i", "j"]).reset_index(drop=True))
    b = (normalized_laplacian(eds, broadcast_max_verts=0).to_pandas()
         .sort_values(["i", "j"]).reset_index(drop=True))
    assert a.equals(b)


def test_distributed_chunked_path_matches_local(rand_edges, monkeypatch):
    """Force the chunked/plasma path (SMALL_GRAPH_EDGES=0) and check it
    against the local path within Lanczos tolerance — the scale path must
    stay correct even though every pytest-sized graph normally short-cuts
    to the local one."""
    import powergraph_ray.graph.spectral as sp

    src, dst = rand_edges
    g = build_graph_from_arrays(src.astype(np.uint64), dst.astype(np.uint64), 4,
                                dedup=True)
    tsc_l, _ = sp.total_subgraph_centrality(g)
    lab_l, emb_l = sp.spectral_partition(g, 3)
    se_l, lam_l = sp.spectral_embedding(g, k=3)

    monkeypatch.setattr(sp, "SMALL_GRAPH_EDGES", 0)
    tsc_d, _ = sp.total_subgraph_centrality(g)
    rel = np.max(np.abs(tsc_d - tsc_l) / (1e-15 + np.abs(tsc_l)))
    assert rel < 1e-7
    ds, used = sp.total_subgraph_centrality(g, result="dataset")
    df = ds.to_pandas()
    pos = np.searchsorted(g.vids, df["vid"].to_numpy(np.uint64))
    got = np.empty(g.nv)
    got[pos] = df["tsc"].to_numpy()
    rel = np.max(np.abs(got - tsc_l) / (1e-15 + np.abs(tsc_l)))
    assert rel < 1e-7

    se_d, lam_d = sp.spectral_embedding(g, k=3)
    np.testing.assert_allclose(lam_d, lam_l, rtol=1e-8, atol=1e-8)
    for c in range(3):
        cos = abs(float(se_d[:, c] @ se_l[:, c]))
        assert cos > 1.0 - 1e-8

    lab_d, _ = sp.spectral_partition(g, 3)
    # same-partition check up to label permutation (CGS2 vs MGS can flip
    # Ritz vector signs; kmeans ids may permute)
    m = {}
    ok = True
    for a, b in zip(lab_l.tolist(), lab_d.tolist()):
        if a in m:
            ok = ok and m[a] == b
        else:
            m[a] = b
    assert ok and len(set(m.values())) == len(m)

    # distributed dataset modes: embedding rows equal the array path;
    # partition assignment Dataset equals the distributed array labels'
    # chunk-kmeans twin up to the same label-permutation check
    eds, lam_ds = sp.spectral_embedding(g, k=3, result="dataset")
    np.testing.assert_allclose(lam_ds, lam_d, rtol=1e-12)
    df = eds.to_pandas()
    pos = np.searchsorted(g.vids,
                          df["vec_id"].to_numpy(np.int64).astype(np.uint64))
    got = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    np.testing.assert_allclose(got, se_d[pos], rtol=1e-12, atol=1e-12)

    ads, _cents = sp.spectral_partition(g, 3, result="dataset")
    adf = ads.to_pandas()
    pos = np.searchsorted(g.vids, adf["vid"].to_numpy(np.uint64))
    lab_ds = np.empty(g.nv, np.int64)
    lab_ds[pos] = adf["cluster"].to_numpy(np.int64)
    m2, ok2 = {}, True
    for a, b in zip(lab_d.tolist(), lab_ds.tolist()):
        if a in m2:
            ok2 = ok2 and m2[a] == b
        else:
            m2[a] = b
    assert ok2 and len(set(m2.values())) == len(m2)
    g.close()
