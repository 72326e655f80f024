"""SIR epidemic cascade (apps/cascades/cascades.cpp) vs the sequential
hash-replay oracle: exact status equality, partition-count invariance,
explicit-initial-status mode, and early extinction."""

import numpy as np
import pytest

from powergraph_ray.graph.cascades import (
    INFECTED,
    RECOVERED,
    SUSCEPTIBLE,
    SIRCascadeVP,
    run_sir,
    sir_oracle,
)
from powergraph_ray.graph.gas import build_graph_from_arrays
from powergraph_ray.sources.repo_table import doc_edge_ground_truth


@pytest.fixture(scope="module")
def edges300():
    e = doc_edge_ground_truth(300)
    return e[:, 0].astype(np.uint64), e[:, 1].astype(np.uint64)


def _hash_init(vp: SIRCascadeVP, vids: np.ndarray) -> np.ndarray:
    return vp._hash_init(np.asarray(vids, np.uint64))


@pytest.mark.parametrize("p_inf,p_rec,iters,seed",
                         [(0.6, 0.3, 6, 7), (0.9, 0.1, 10, 13)])
def test_sir_matches_sequential_oracle(edges300, p_inf, p_rec, iters, seed):
    src, dst = edges300
    g = build_graph_from_arrays(src, dst, 4)
    vids, status, _ = run_sir(g, p_inf, p_rec, iters, seed=seed,
                              init_frac=0.05)
    vp = SIRCascadeVP(p_inf, p_rec, iters, seed=seed, init_frac=0.05)
    st0 = _hash_init(vp, vids)
    assert (st0 == INFECTED).any(), "hash seeding picked no patient zero"
    want = sir_oracle(src, dst, vids, st0, p_inf, p_rec, iters, seed=seed)
    np.testing.assert_array_equal(status, want)
    # with p_inf this high the contagion must have spread beyond the seeds
    assert (status != SUSCEPTIBLE).sum() > (st0 == INFECTED).sum()
    assert (status == RECOVERED).any()


def test_sir_partition_count_invariant(edges300):
    src, dst = edges300
    base = None
    for p in (2, 5):
        g = build_graph_from_arrays(src, dst, p)
        vids, status, _ = run_sir(g, 0.5, 0.25, 8, seed=3, init_frac=0.03)
        order = np.argsort(vids)
        cur = status[order]
        if base is None:
            base = cur
        else:
            np.testing.assert_array_equal(cur, base)


def test_sir_explicit_initial_status(edges300):
    """Reference mode: caller supplies per-vertex S/I/R labels
    (cascades.cpp:61-80 line parser)."""
    src, dst = edges300
    g = build_graph_from_arrays(src, dst, 4)
    gvids = g.vids
    st0 = np.zeros(g.nv, np.uint8)
    st0[0] = INFECTED                    # patient zero = smallest vid
    st0[g.nv - 1] = RECOVERED            # pre-recovered vertex stays R
    vids, status, _ = run_sir(g, 0.8, 0.2, 6, seed=11, init_status=st0)
    want = sir_oracle(src, dst, vids, st0, 0.8, 0.2, 6, seed=11)
    np.testing.assert_array_equal(status, want)
    assert status[g.nv - 1] == RECOVERED


def test_sir_extinction_stops_early():
    """p_rec=1 recovers every infected vertex at superstep 0; with p_inf=0
    nothing spreads, so the engine must stop after one superstep with only
    R (ex-seeds) and S left."""
    src = np.arange(0, 50, dtype=np.uint64)
    dst = (src + 1) % np.uint64(50)
    g = build_graph_from_arrays(src, dst, 2)
    st0 = np.zeros(g.nv, np.uint8)
    st0[:5] = INFECTED
    vids, status, eng = run_sir(g, 0.0, 1.0, 20, seed=1, init_status=st0)
    assert (status == INFECTED).sum() == 0
    assert (status == RECOVERED).sum() == 5
    assert len(eng.metrics) < 20


def test_sis_matches_sequential_oracle_and_reinfects(edges300):
    """SIS: recovery returns to S (reinfectable) — exact vs the sequential
    replay, no R state ever, and at high p_inf the infection persists past
    where SIR burns out."""
    src, dst = edges300
    g = build_graph_from_arrays(src, dst, 4)
    vids, status, _ = run_sir(g, 0.7, 0.5, 12, seed=5, init_frac=0.05,
                              model="SIS")
    vp = SIRCascadeVP(0.7, 0.5, 12, seed=5, init_frac=0.05, model="SIS")
    st0 = _hash_init(vp, vids)
    want = sir_oracle(src, dst, vids, st0, 0.7, 0.5, 12, seed=5,
                      model="SIS")
    np.testing.assert_array_equal(status, want)
    assert (status != RECOVERED).all()
    assert (status == INFECTED).any()  # endemic at these rates


def test_sir_dataset_result_matches_arrays(edges300):
    """result='dataset' keeps the final state as range chunks; rows must
    equal the dense-array result."""
    src, dst = edges300
    g = build_graph_from_arrays(src, dst, 4)
    vids, status, _ = run_sir(g, 0.5, 0.25, 6, seed=7, init_frac=0.05)
    ds, _ = run_sir(g, 0.5, 0.25, 6, seed=7, init_frac=0.05,
                    result="dataset")
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    order = np.argsort(vids)
    np.testing.assert_array_equal(df["vid"].to_numpy(np.uint64), vids[order])
    np.testing.assert_array_equal(df["status"].to_numpy(np.uint8),
                                  status[order])
