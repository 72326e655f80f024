"""Deterministic random walks vs a sequential replay oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from powergraph_ray.graph.walks import _STEP_MIX, random_walks
from powergraph_ray.ids import integer_mix


def _ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64))}))


def _seq_walks(pairs, starts, length, seed, directed):
    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out = {}
    for wid, v in enumerate(starts):
        path = [v]
        for step in range(1, length + 1):
            nbrs = sorted(adj.get(v, ()))
            if nbrs:
                h = int(integer_mix(
                    np.uint64(wid) * _STEP_MIX
                    ^ np.uint64(step) * _STEP_MIX ^ np.uint64(seed)))
                v = nbrs[h % len(nbrs)]
            path.append(v)
        out[wid] = path
    return out


def _got(ds):
    df = ds.to_pandas()
    out = {}
    for wid, g in df.groupby("walk_id"):
        out[int(wid)] = g.sort_values("step")["vid"].astype(int).tolist()
    return out


def test_walks_match_sequential_undirected():
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, 200)
    dst = rng.integers(0, 40, 200)
    starts = list(range(0, 40, 3))
    got = _got(random_walks(_ds(src, dst), starts, length=8, seed=3))
    want = _seq_walks(zip(src.tolist(), dst.tolist()), starts, 8, 3, False)
    assert got == want


def test_walks_match_sequential_directed_with_dangling():
    # a chain into a sink: directed walks must stall at the sink
    src = [0, 1, 2, 5, 5]
    dst = [1, 2, 3, 6, 7]
    starts = [0, 5, 3]
    got = _got(random_walks(_ds(src, dst), starts, length=5, seed=9,
                            directed=True))
    want = _seq_walks(zip(src, dst), starts, 5, 9, True)
    assert got == want
    assert got[2] == [3] * 6  # vertex 3 is a sink: stays put every step
