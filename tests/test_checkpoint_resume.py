"""Resumability (north rule): kill after superstep k, resume from the latest
complete checkpoint, final state must be bit-identical."""

import json
import os
import shutil

import numpy as np

from powergraph_ray.graph.algorithms import PageRankVP, run_connected_components, run_pagerank
from powergraph_ray.graph.gas import GASEngine, build_graph_from_arrays
from powergraph_ray.sources.repo_table import doc_edge_ground_truth

CKPT = "/tmp/powergraph_ray/test_ckpt"


def _graph():
    e = doc_edge_ground_truth(500)
    return build_graph_from_arrays(e[:, 0].astype(np.uint64), e[:, 1].astype(np.uint64), 4)


def test_pagerank_resume_bit_identical():
    g = _graph()
    path = os.path.join(CKPT, "pr")
    shutil.rmtree(path, ignore_errors=True)

    # uninterrupted run
    _, want, full_eng = run_pagerank(g, tol=1e-6, checkpoint_path=None)
    n_iters = len(full_eng.metrics)
    assert n_iters > 5

    # interrupted run: stop after 3 supersteps (simulated kill via max_iterations)
    vp = PageRankVP(tol=1e-6)
    eng = GASEngine(g, vp, checkpoint_path=path, checkpoint_interval=1, max_iterations=3)
    eng.run()
    assert eng._latest_checkpoint() == 2

    # resume to completion
    _, got, eng2 = run_pagerank(g, tol=1e-6, checkpoint_path=path, resume=True)
    assert np.array_equal(got, want)  # bit-identical, not just allclose
    # resumed run did fewer supersteps than the full run
    assert len(eng2.metrics) == n_iters - 3

    # checkpoint artifacts: metrics + lineage per iteration dir
    it_dir = os.path.join(path, "iter=00002")
    with open(os.path.join(it_dir, "metrics.json")) as f:
        m = json.load(f)
    assert m["iteration"] == 2 and m["edges_processed"] == g.num_edges
    with open(os.path.join(it_dir, "lineage.json")) as f:
        lin = json.load(f)
    assert lin["algorithm"] == "pagerank" and lin["num_partitions"] == 4
    assert lin["num_vertices"] == g.nv


def test_cc_resume_bit_identical():
    g = _graph()
    path = os.path.join(CKPT, "cc")
    shutil.rmtree(path, ignore_errors=True)
    _, want, _ = run_connected_components(g)

    from powergraph_ray.graph.algorithms import ConnectedComponentsVP

    eng = GASEngine(g, ConnectedComponentsVP(), checkpoint_path=path, max_iterations=2)
    eng.run()
    _, got, _ = run_connected_components(g, checkpoint_path=path, resume=True)
    assert np.array_equal(got, want)


def test_actor_restart_rebuilds_partition_state(tmp_path):
    """Lost-worker recovery: killing a partition actor mid-session must not
    change results — the restarted actor lazily rebuilds its edge block from
    its Parquet shard + the plasma vid table (EdgePartitionActor._ensure)."""
    import ray

    from powergraph_ray.graph.algorithms import run_pagerank
    from powergraph_ray.graph.gas import (build_graph_from_arrays, load_graph,
                                          save_graph)

    rng = np.random.default_rng(6)
    n, m = 400, 3000
    src = rng.integers(0, n, m).astype(np.uint64)
    dst = rng.integers(0, n, m).astype(np.uint64)
    g0 = build_graph_from_arrays(src, dst, 4, work_dir=str(tmp_path / "g"))
    save_graph(g0, str(tmp_path / "snap"))
    g0.close()

    g = load_graph(str(tmp_path / "snap"))
    _, ranks_a, _ = run_pagerank(g, iterations=8)

    # kill two of the four partition actors; Ray restarts the processes
    ray.kill(g._pool[0], no_restart=False)
    ray.kill(g._pool[2], no_restart=False)

    _, ranks_b, _ = run_pagerank(g, iterations=8)
    np.testing.assert_array_equal(ranks_a, ranks_b)  # bit-identical rebuild
    g.close()


def test_actor_killed_mid_run_retries_and_matches(tmp_path):
    """Kill a partition actor WHILE the superstep loop is running: the
    in-flight task retries on the restarted actor (max_task_retries=-1),
    `_ensure` rebuilds. Uncached mode is bit-identical (every superstep is a
    fresh full bincount, so a retry replays the same computation); cached
    mode cold-starts the accumulator with a full recompute whose float
    summation order differs from the incremental path by ≤1 ulp — the same
    inherent property as the reference's gather cache."""
    import threading
    import time as _time

    import ray

    from powergraph_ray.graph.algorithms import run_pagerank
    from powergraph_ray.graph.gas import (build_graph_from_arrays, load_graph,
                                          save_graph)

    rng = np.random.default_rng(12)
    n, m = 2000, 20000
    src = rng.integers(0, n, m).astype(np.uint64)
    dst = rng.integers(0, n, m).astype(np.uint64)
    g0 = build_graph_from_arrays(src, dst, 4, work_dir=str(tmp_path / "g"))
    save_graph(g0, str(tmp_path / "snap"))
    g0.close()

    g = load_graph(str(tmp_path / "snap"))
    _, want_exact, _ = run_pagerank(g, tol=1e-10)
    _, want_cache, _ = run_pagerank(g, tol=1e-10, use_cache=True)

    killer = threading.Timer(0.15, lambda: ray.kill(g._pool[1], no_restart=False))
    killer.start()
    _, got, _ = run_pagerank(g, tol=1e-10)
    killer.cancel()
    np.testing.assert_array_equal(got, want_exact)  # bit-identical retry

    killer = threading.Timer(0.15, lambda: ray.kill(g._pool[2], no_restart=False))
    killer.start()
    _, gotc, _ = run_pagerank(g, tol=1e-10, use_cache=True)
    killer.cancel()
    _time.sleep(0.05)
    np.testing.assert_allclose(gotc, want_cache, rtol=1e-12)
    g.close()


def test_hits_resume_bit_identical():
    """The two-array (hub, auth) bundle round-trips through checkpoint
    shards and resumes bit-identically."""
    from powergraph_ray.graph.algorithms import HITSVP, run_hits

    g = _graph()
    path = os.path.join(CKPT, "hits")
    shutil.rmtree(path, ignore_errors=True)

    _, want_h, want_a, _ = run_hits(g, iterations=6)

    vp = HITSVP(iterations=6)
    eng = GASEngine(g, vp, checkpoint_path=path, checkpoint_interval=1,
                    max_iterations=2)
    eng.run()
    assert eng._latest_checkpoint() == 1

    _, got_h, got_a, eng2 = run_hits(g, iterations=6, checkpoint_path=path,
                                     resume=True)
    assert np.array_equal(got_h, want_h)
    assert np.array_equal(got_a, want_a)
    assert len(eng2.metrics) == 4  # resumed from iter 2


def test_sir_resume_bit_identical():
    """The mixed (uint8 status, uint64 gvid) bundle round-trips through
    checkpoint shards — including the constant gvid column the recovery
    rolls hash — and resumes bit-identically."""
    from powergraph_ray.graph.cascades import SIRCascadeVP, run_sir

    g = _graph()
    path = os.path.join(CKPT, "sir")
    shutil.rmtree(path, ignore_errors=True)

    _, want, _ = run_sir(g, 0.5, 0.25, 8, seed=7, init_frac=0.05)

    vp = SIRCascadeVP(0.5, 0.25, 8, seed=7, init_frac=0.05)
    eng = GASEngine(g, vp, checkpoint_path=path, checkpoint_interval=1,
                    max_iterations=3)
    eng.run()
    assert eng._latest_checkpoint() == 2

    _, got, eng2 = run_sir(g, 0.5, 0.25, 8, seed=7, init_frac=0.05,
                           checkpoint_path=path, resume=True)
    assert np.array_equal(got, want)
    assert len(eng2.metrics) <= 5  # resumed from iter 3
