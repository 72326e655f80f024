"""k-truss decomposition vs an independent sequential peeling oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from powergraph_ray.graph.ktruss import ktruss


def _ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64))}))


def _seq_ktruss(pairs, k):
    """Sequential peeling oracle over a set of canonical (a, b) pairs."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    if k <= 2:
        return edges
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        drop = {(a, b) for a, b in edges
                if len(adj[a] & adj[b]) < k - 2}
        if not drop:
            return edges
        edges -= drop


def _got(ds):
    df = ds.to_pandas()
    if not len(df):
        return set()
    return {(int(a), int(b)) for a, b in zip(df["a"], df["b"])}


def _clique(vs):
    return [(a, b) for i, a in enumerate(vs) for b in vs[i + 1:]]


def test_ktruss_planted_cliques():
    # K5 on 0-4, K4 on 10-13, a bridge chain 4-9-10
    pairs = _clique(range(5)) + _clique(range(10, 14)) + [(4, 9), (9, 10)]
    src = [a for a, _ in pairs]
    dst = [b for _, b in pairs]
    k4 = _got(ktruss(_ds(src, dst), 4))
    assert k4 == set(_clique(range(5))) | set(_clique(range(10, 14)))
    k5 = _got(ktruss(_ds(src, dst), 5))
    assert k5 == set(_clique(range(5)))
    assert _got(ktruss(_ds(src, dst), 6)) == set()
    # k<=2: the deduped simple graph unchanged
    assert _got(ktruss(_ds(src + src, dst + dst), 2)) == \
        {(min(a, b), max(a, b)) for a, b in pairs}


@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_random_matches_sequential(k):
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    got = _got(ktruss(_ds(src, dst), k))
    want = _seq_ktruss(zip(src.tolist(), dst.tolist()), k)
    assert got == want
    # cascade check: removing one shell must have triggered recursive peels
    assert want < _seq_ktruss(zip(src.tolist(), dst.tolist()), 2)


def test_local_sparsify_properties():
    """Sparsified set ⊆ original canonical edges; per-vertex keep bound
    respected for the either-endpoint-keeps union; intra-clique edges
    (high Jaccard) survive preferentially over the bridge."""
    import itertools

    import pyarrow as pa
    import ray.data

    from powergraph_ray.graph.ktruss import local_sparsify

    edges = [(a, b) for a, b in itertools.combinations(range(8), 2)]
    edges += [(a, b) for a, b in itertools.combinations(range(20, 28), 2)]
    edges.append((0, 20))  # bridge: zero common neighbors → jac 0
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))
    out = local_sparsify(ds, e=0.5).to_pandas()
    orig = {(min(a, b), max(a, b)) for a, b in edges}
    got = set(zip(out["a"].astype(int), out["b"].astype(int)))
    assert got <= orig
    assert len(got) < len(orig)  # it actually sparsifies
    # bridge endpoints keep ceil(sqrt(8))=3 edges each; the bridge has
    # jac 0 while clique edges have jac > 0, so the bridge is dropped
    assert (0, 20) not in got
    # kept clique edges all have positive similarity
    assert (out["jac"] > 0).all()


def test_local_sparsify_uint64_boundary_ids():
    """Hashed-identity ids crossing 2^63: the zero-jac rows must share the
    triangle kernel's int64-ordered keys, or boundary edges appear twice
    and inflate per-vertex degrees (regression for the dual-
    canonicalization bug)."""
    import pyarrow as pa
    import ray.data

    from powergraph_ray.graph.ktruss import local_sparsify

    big = np.uint64(2**63 + 3)
    src = np.array([5, 9, 5, 2, 9], np.uint64)
    dst = np.array([big, big, 9, 5, 2], np.uint64)
    ds = ray.data.from_arrow(pa.table({"src": pa.array(src, pa.uint64()),
                                       "dst": pa.array(dst, pa.uint64())}))
    out = local_sparsify(ds, e=1.0).to_pandas()  # e=1 keeps everything
    assert len(out) == 5  # exactly the distinct undirected edges
    pairs = set(zip(out["a"].astype(np.int64), out["b"].astype(np.int64)))
    assert len(pairs) == 5


def test_local_support_equals_grid_path():
    """Round 5b: the in-task local support/peel path must emit exactly the
    distributed grid path's rows (support counts are integers — any
    correct algorithm agrees bit-for-bit)."""
    import pyarrow as pa
    import ray.data

    import powergraph_ray.graph.ktruss as kt

    rng = np.random.default_rng(17)
    n, m = 300, 2500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    eds = ray.data.from_arrow(pa.table({
        "src": pa.array(src[keep], pa.int64()),
        "dst": pa.array(dst[keep], pa.int64())}))

    canon = kt._canonical_dedup(eds).materialize()

    def rows(ds):
        df = ds.to_pandas()
        cols = list(df.columns)
        return sorted(map(tuple, df[cols].to_numpy().tolist()))

    sup_local = rows(kt.edge_support(canon))
    tr_local = rows(kt.ktruss(eds, 4))
    old = kt.SMALL_EDGES
    try:
        kt.SMALL_EDGES = 0          # force the distributed grid path
        sup_grid = rows(kt.edge_support(canon))
        tr_grid = rows(kt.ktruss(eds, 4))
    finally:
        kt.SMALL_EDGES = old
    assert sup_local == sup_grid
    assert tr_local == tr_grid
