"""User-written vertex programs through the public VertexProgram protocol —
the self-verifying engine tests of tests/synchronous_engine_test.cpp:35-301
(count in/out/all neighbors == the graph's own degree records; message
delivery; aggregator totals vs the closed form num_vertices*(iteration+1)).

These exercise the protocol exactly the way an end user extends it: no
internal engine hooks, just partial/merge/apply (driver-merge fallback path,
the one a custom non-shardable program gets)."""

import numpy as np
import pytest

from powergraph_ray.graph.gas import (
    GASEngine,
    VertexAggregator,
    VertexProgram,
    build_graph_from_arrays,
)


@pytest.fixture(scope="module")
def powerlaw_graph():
    rng = np.random.default_rng(21)
    n, m = 300, 2000
    src = rng.zipf(2.0, m) % n
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = build_graph_from_arrays(src[keep].astype(np.uint64),
                                dst[keep].astype(np.uint64), 4, dedup=True)
    yield g
    g.close()


class CountNeighbors(VertexProgram):
    """count_in/out_neighbors (synchronous_engine_test.cpp:35-110): gather 1
    per edge in the given direction; apply asserts the total equals the
    degree the graph negotiated at ingress."""

    name = "count_nbrs"
    broadcast_keys = ("value",)

    def __init__(self, direction: str, expect: np.ndarray) -> None:
        self.direction = direction
        self.expect = expect

    def init_bundle(self, graph):
        return {"value": np.zeros(graph.nv, np.int64)}

    def partial(self, src, dst, nv, iteration, value):
        c = np.zeros(nv, np.int64)
        if self.direction in ("in", "all"):
            c += np.bincount(dst, minlength=nv)
        if self.direction in ("out", "all"):
            c += np.bincount(src, minlength=nv)
        return c

    @staticmethod
    def merge(a, b):
        return a + b

    def apply(self, bundle, total, iteration):
        np.testing.assert_array_equal(total, self.expect)  # the ASSERT_EQ
        return {"value": total}, 0, 0.0  # n_active 0 → one superstep


@pytest.mark.parametrize("direction", ["in", "out", "all"])
def test_count_neighbors_matches_degree_records(powerlaw_graph, direction):
    g = powerlaw_graph
    expect = {"in": g.in_deg, "out": g.out_deg,
              "all": g.in_deg + g.out_deg}[direction]
    vp = CountNeighbors(direction, expect)
    out = GASEngine(g, vp, max_iterations=1).run()
    np.testing.assert_array_equal(out["value"], expect)


class EchoMessage(VertexProgram):
    """Message delivery (synchronous_engine_test.cpp:187-231): every vertex
    signals all out-neighbors with its id+iteration; receivers check the
    merged (max) message equals the max over their in-neighbors."""

    name = "echo_msg"
    broadcast_keys = ("value",)

    def __init__(self, rounds: int) -> None:
        self.rounds = rounds

    def init_bundle(self, graph):
        return {"value": np.arange(graph.nv, dtype=np.int64)}

    def partial(self, src, dst, nv, iteration, value):
        msg = np.full(nv, -1, np.int64)
        np.maximum.at(msg, dst, value[src] + iteration)
        return msg

    @staticmethod
    def merge(a, b):
        return np.maximum(a, b)

    def apply(self, bundle, total, iteration):
        active = 0 if iteration + 1 >= self.rounds else 1
        return ({"value": bundle["value"], "last_msg": total},
                active, float(active))


def test_message_delivery_merged_max(powerlaw_graph):
    g = powerlaw_graph
    out = GASEngine(g, EchoMessage(rounds=3), max_iterations=3).run()
    # oracle: dense replay of the last round (iteration 2)
    want = np.full(g.nv, -1, np.int64)
    import pyarrow.parquet as pq
    import glob
    import os

    vals = np.arange(g.nv, dtype=np.int64)
    for f in sorted(glob.glob(os.path.join(g.parquet_dir, "part=*", "*.parquet"))):
        t = pq.read_table(f)
        s = g.dense(np.asarray(t["src"], np.uint64))
        d = g.dense(np.asarray(t["dst"], np.uint64))
        # dedup=True graphs dedup per partition; replay the same pairs
        pairs = np.unique(np.stack([s, d], axis=1), axis=0)
        np.maximum.at(want, pairs[:, 1], vals[pairs[:, 0]] + 2)
    np.testing.assert_array_equal(out["last_msg"], want)


def test_periodic_aggregator_closed_form(powerlaw_graph):
    """Aggregator totals vs num_vertices * (iteration+1)
    (synchronous_engine_test.cpp:296)."""
    g = powerlaw_graph

    class Tick(VertexProgram):
        name = "tick"
        broadcast_keys = ("value",)

        def init_bundle(self, graph):
            return {"value": np.zeros(graph.nv, np.int64)}

        def partial(self, src, dst, nv, iteration, value):
            return np.zeros(nv, np.int64)

        @staticmethod
        def merge(a, b):
            return a + b

        def apply(self, bundle, total, iteration):
            nxt = bundle["value"] + 1
            return {"value": nxt}, (1 if iteration < 4 else 0), 1.0

    agg = VertexAggregator(
        map_chunk=lambda chunk, lo, hi: int(chunk["value"].sum()),
        reduce=lambda a, b: a + b)
    eng = GASEngine(g, Tick(), max_iterations=5, aggregators={"total": agg})
    eng.run()
    for it, val in eng.aggregates["total"]:
        assert val == g.nv * (it + 1)


def test_wall_clock_aggregator_period(powerlaw_graph):
    """aggregate_periodic(key, seconds) wall-clock semantics
    (distributed_aggregator.hpp:518-612): every_secs=0 fires every superstep;
    a period far beyond the run's wall time fires exactly once (first tick)."""
    g = powerlaw_graph

    class Tick(VertexProgram):
        name = "tick_secs"
        broadcast_keys = ("value",)

        def init_bundle(self, graph):
            return {"value": np.zeros(graph.nv, np.int64)}

        def partial(self, src, dst, nv, iteration, value):
            return np.zeros(nv, np.int64)

        @staticmethod
        def merge(a, b):
            return a + b

        def apply(self, bundle, total, iteration):
            return {"value": bundle["value"] + 1}, (1 if iteration < 4 else 0), 1.0

    mk = lambda secs: VertexAggregator(  # noqa: E731
        map_chunk=lambda chunk, lo, hi: int(chunk["value"].sum()),
        reduce=lambda a, b: a + b, every_secs=secs)
    eng = GASEngine(g, Tick(), max_iterations=5,
                    aggregators={"fast": mk(0.0), "slow": mk(3600.0)})
    eng.run()
    assert len(eng.aggregates["fast"]) == 5     # fires every superstep
    assert len(eng.aggregates["slow"]) == 1     # period > run wall time
    assert eng.aggregates["slow"][0][0] == 0    # ... on the first superstep
    for it, val in eng.aggregates["fast"]:
        assert val == g.nv * (it + 1)


def test_omni_engine_selection(powerlaw_graph):
    """omni_engine (omni_engine.hpp:41-80): sync builds the BSP engine;
    async warns and produces identical results; unknown type raises."""
    import warnings

    import pytest

    from powergraph_ray.graph.algorithms import PageRankVP
    from powergraph_ray.graph.gas import omni_engine

    g = powerlaw_graph
    sync = omni_engine(g, PageRankVP(iterations=5), "synchronous",
                       max_iterations=5).run()["value"]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = omni_engine(g, PageRankVP(iterations=5), "async",
                          max_iterations=5).run()["value"]
        assert any("BSP" in str(x.message) for x in w)
    np.testing.assert_array_equal(sync, got)
    with pytest.raises(ValueError):
        omni_engine(g, PageRankVP(iterations=5), "fifo")
