import numpy as np

from powergraph_ray.ids import (
    edge_partition,
    hash64_str,
    hash64_str_array,
    hash_edge,
    integer_mix,
)


def test_integer_mix_deterministic_and_mixing():
    a = integer_mix(np.arange(1000, dtype=np.uint64))
    b = integer_mix(np.arange(1000, dtype=np.uint64))
    assert (a == b).all()
    assert len(np.unique(a)) == 1000
    # bits well spread: top byte takes many values
    assert len(np.unique(a >> np.uint64(56))) > 200


def test_hash_edge_order_insensitive():
    s = np.array([1, 2, 3, 7], dtype=np.uint64)
    d = np.array([5, 9, 2, 7], dtype=np.uint64)
    assert (hash_edge(s, d) == hash_edge(d, s)).all()


def test_edge_partition_range_and_stability():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 1 << 62, 10_000).astype(np.uint64)
    d = rng.integers(0, 1 << 62, 10_000).astype(np.uint64)
    p = edge_partition(s, d, 16)
    assert p.min() >= 0 and p.max() < 16
    # roughly balanced
    counts = np.bincount(p, minlength=16)
    assert counts.min() > 10_000 / 16 * 0.7


def test_hash64_str_array_matches_scalar():
    strs = [f"org{i % 3}/repo{i}:src/m{i}.py" for i in range(50)] * 2
    arr = hash64_str_array(strs)
    assert arr.dtype == np.uint64
    assert arr[0] == np.uint64(hash64_str(strs[0]))
    assert (arr[:50] == arr[50:]).all()
    assert len(np.unique(arr)) == 50


def test_disable_numpy_hugepage_applied():
    """The huge-page fault-tax fix (ids.disable_numpy_hugepage) must engage:
    it is applied on package import, numpy's runtime toggle reports the
    previous state, and the env var is exported for child processes."""
    import importlib
    import os

    import pytest

    from powergraph_ray.ids import disable_numpy_hugepage

    if os.environ.get("GRAFT_NUMPY_HUGEPAGE") == "1" or \
            os.environ.get("NUMPY_MADVISE_HUGEPAGE") == "1":
        pytest.skip("huge pages explicitly opted in for this run")
    multiarray = None
    for modname in ("numpy._core.multiarray", "numpy.core.multiarray"):
        try:
            m = importlib.import_module(modname)
            if hasattr(m, "_set_madvise_hugepage"):
                multiarray = m
                break
        except ImportError:
            continue
    if multiarray is None:
        pytest.skip("numpy runtime madvise toggle absent in this numpy")
    assert disable_numpy_hugepage() is True  # numpy toggle present + applied
    assert os.environ.get("NUMPY_MADVISE_HUGEPAGE") == "0"
    # idempotent: the flag stayed off after the package-import application
    assert multiarray._set_madvise_hugepage(False) is False


def test_hash64_str_md5_matches_duckdb():
    """ids.hash64_str_md5 must equal DuckDB's md5_number_lower bit-for-bit
    (it anchors the SQL-oracled SimHash query)."""
    import duckdb

    from powergraph_ray.ids import hash64_str_md5

    words = ["abc", "", "hello_world", "üñïçødé", "x" * 300, "123"]
    got = [hash64_str_md5(w) for w in words]
    want = [duckdb.sql("select md5_number_lower(?)", params=[w]).fetchone()[0]
            for w in words]
    assert got == want


def test_tune_actor_threads_caps_arrow_pools():
    """Partition actors run at 0 scheduling CPUs and must not each spawn a
    host-sized pyarrow thread pool (P x ncores runnable decode threads
    measured 6-12x slowdowns on the negotiation phase at full node load)."""
    import pyarrow as pa

    from powergraph_ray.ids import tune_actor_threads

    before_cpu, before_io = pa.cpu_count(), pa.io_thread_count()
    try:
        tune_actor_threads(cpu=1, io=2)
        assert pa.cpu_count() == 1
        assert pa.io_thread_count() == 2
    finally:
        tune_actor_threads(cpu=before_cpu, io=before_io)
