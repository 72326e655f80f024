"""Distributed k-means vs the sequential oracle (identical init/tie rules)."""

import numpy as np
import pyarrow as pa
import ray.data

from powergraph_ray.stages.kmeans import kmeans, kmeans_oracle


def test_kmeans_matches_sequential_oracle():
    rng = np.random.default_rng(5)
    n, d, k = 400, 16, 6
    x = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(x), pa.list_(pa.float64())),
    })).repartition(5)
    cents, assign, inertia = kmeans(ds, k=k, iterations=8)
    oc, oa, oi = kmeans_oracle(x, ids, k, 8)
    np.testing.assert_allclose(cents, oc, rtol=1e-9)
    # the assignment comes back as a Dataset (no O(N) driver state in kmeans)
    import ray.data as rd
    assert isinstance(assign, rd.Dataset)
    a = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    np.testing.assert_array_equal(a, oa)
    assert abs(inertia - oi) / oi < 1e-9


def test_kmeans_empty_cluster_kept():
    """A centroid that captures no points keeps its position (no NaN)."""
    x = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0], [10.1, 10.0]])
    ids = np.arange(4, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(x), pa.list_(pa.float64())),
    }))
    cents, assign, _ = kmeans(ds, k=3, iterations=5)
    assert np.isfinite(cents).all()
    assert assign.to_pandas()["cluster"].nunique() <= 3
