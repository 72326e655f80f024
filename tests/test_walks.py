"""Deterministic random walks vs a sequential replay oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from powergraph_ray.graph.walks import _HOP_MIX, _STEP_MIX, random_walks
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
                    ^ np.uint64(step) * _HOP_MIX ^ np.uint64(seed)))
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


def _sample_oracle(src, dst, seeds, fanouts, seed, directed=False):
    """Sequential replay of sample_neighbors' ranking rule: per (vertex,
    hop), keep the fanout neighbors with the smallest
    mix(vid*C ^ (pos+1)*C ^ hop*C ^ seed) over the id-sorted neighbor run."""
    import numpy as np

    from powergraph_ray.ids import integer_mix

    C = np.uint64(0x9E3779B97F4A7C15)
    CT = np.uint64(0xBF58476D1CE4E5B9)
    CH = np.uint64(0xD6E8FEB86659FD93)
    adj = {}
    pairs = set()
    for a, b in zip(src.astype(int), dst.astype(int)):
        if a == b:
            continue
        if directed:
            pairs.add((a, b))
        else:
            pairs.add((a, b))
            pairs.add((b, a))
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    for a in adj:
        adj[a] = sorted(set(adj[a]))
    out = []
    frontier = sorted(set(int(s) for s in seeds))
    for hop, f in enumerate(fanouts, start=1):
        nxt = set()
        for v in frontier:
            run = adj.get(v, [])
            ranked = []
            for pos, n in enumerate(run):
                with np.errstate(over="ignore"):
                    h = int(integer_mix(np.uint64(v) * C
                                        ^ np.uint64(pos + 1) * CT
                                        ^ np.uint64(hop) * CH
                                        ^ np.uint64(seed)))
                ranked.append((h, n))
            ranked.sort()
            for _, n in ranked[:f]:
                out.append((hop, v, n))
                nxt.add(n)
        frontier = sorted(nxt)
    return sorted(out)


def test_sample_neighbors_matches_replay():
    import numpy as np
    import pandas as pd
    import ray.data

    from powergraph_ray.graph.walks import sample_neighbors

    rng = np.random.RandomState(31)
    src = rng.randint(0, 80, 400).astype(np.int64)
    dst = rng.randint(0, 80, 400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    seeds = [0, 5, 9, 42]
    got = sample_neighbors(ds, seeds, fanouts=[3, 2], seed=7).to_pandas()
    got_rows = sorted(zip(got["hop"].astype(int), got["src"].astype(int),
                          got["dst"].astype(int)))
    want = _sample_oracle(src, dst, seeds, [3, 2], 7)
    assert got_rows == want
    # properties: fanout respected; sampled edges are real edges
    per = got.groupby(["hop", "src"]).size()
    assert (per[per.index.get_level_values(0) == 1] <= 3).all()
    assert (per[per.index.get_level_values(0) == 2] <= 2).all()
    real = set(zip(src.tolist(), dst.tolist())) | set(
        zip(dst.tolist(), src.tolist()))
    for _, s, d in got_rows:
        assert (s, d) in real


def test_sample_neighbors_directed_and_full_fanout():
    import numpy as np
    import pandas as pd
    import ray.data

    from powergraph_ray.graph.walks import sample_neighbors

    # star 0 -> 1..6; directed: hop 1 from 0 samples out-neighbors only
    src = np.array([0] * 6 + [3], np.int64)
    dst = np.array([1, 2, 3, 4, 5, 6, 0], np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    got = sample_neighbors(ds, [0], fanouts=[10], seed=1,
                           directed=True).to_pandas()
    # fanout 10 > deg 6: the full distinct out-neighborhood comes back
    assert sorted(got["dst"].astype(int)) == [1, 2, 3, 4, 5, 6]
    assert (got["src"] == 0).all()


def _seq_node2vec(pairs, starts, length, p, q, seed, n_trials=24):
    """Sequential replay of node2vec_walks' exact hash streams."""
    from powergraph_ray.graph.walks import _ACC_MIX, _TRIAL_MIX

    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    from powergraph_ray.graph.cascades import prob_threshold

    alphas = [1.0 / p, 1.0, 1.0 / q]
    amax = max(alphas)
    thr = [int(prob_threshold(a / amax)) for a in alphas]
    out = {}
    for wid, v0 in enumerate(starts):
        cur, prev = v0, v0
        path = [cur]
        for step in range(1, length + 1):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                path.append(cur)
                continue
            if step == 1:
                h = int(integer_mix(np.uint64(wid) * _STEP_MIX
                                    ^ np.uint64(step) * _HOP_MIX
                                    ^ np.uint64(seed)))
                prev, cur = cur, nbrs[h % len(nbrs)]
            else:
                chosen = None
                first_prop = None
                for k in range(1, n_trials + 1):
                    hp = int(integer_mix(np.uint64(wid) * _STEP_MIX
                                         ^ np.uint64(step) * _HOP_MIX
                                         ^ np.uint64(k) * _TRIAL_MIX
                                         ^ np.uint64(seed)))
                    x = nbrs[hp % len(nbrs)]
                    if first_prop is None:
                        first_prop = x
                    cls = 0 if x == prev else (1 if x in adj.get(prev, ())
                                               else 2)
                    roll = int(integer_mix(np.uint64(wid) * _STEP_MIX
                                           ^ np.uint64(step) * _HOP_MIX
                                           ^ np.uint64(k) * _ACC_MIX
                                           ^ np.uint64(seed)))
                    if roll < thr[cls]:
                        chosen = x
                        break
                prev, cur = cur, (chosen if chosen is not None else first_prop)
            path.append(cur)
        out[wid] = path
    return out


def test_node2vec_matches_sequential_oracle():
    from powergraph_ray.graph.walks import node2vec_walks

    rng = np.random.default_rng(5)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    pairs = list(zip(src.tolist(), dst.tolist()))
    starts = list(range(25))
    for p, q in ((0.5, 2.0), (2.0, 0.5), (1.0, 1.0)):
        got = _got(node2vec_walks(_ds(src, dst), starts, 10, p=p, q=q,
                                  seed=23, n_shards=4))
        want = _seq_node2vec(pairs, starts, 10, p, q, 23)
        assert got == want, f"p={p} q={q}"


def test_node2vec_shard_count_invariant():
    from powergraph_ray.graph.walks import node2vec_walks

    src = np.arange(0, 40, dtype=np.int64)
    dst = (src * 7 + 3) % np.int64(40)
    a = _got(node2vec_walks(_ds(src, dst), [0, 5, 9], 8, p=0.25, q=4.0,
                            seed=3, n_shards=2))
    b = _got(node2vec_walks(_ds(src, dst), [0, 5, 9], 8, p=0.25, q=4.0,
                            seed=3, n_shards=7))
    assert a == b


def test_node2vec_return_bias_measurable():
    """Tiny p (cheap returns) must produce more immediate backtracks than
    huge p on the same graph/seed — the second-order bias is live."""
    from powergraph_ray.graph.walks import node2vec_walks

    rng = np.random.default_rng(11)
    src = rng.integers(0, 80, 500)
    dst = rng.integers(0, 80, 500)
    keep = src != dst
    src, dst = src[keep], dst[keep]

    def backtracks(pq):
        w = _got(node2vec_walks(_ds(src, dst), list(range(40)), 12,
                                p=pq, q=1.0, seed=9, n_shards=4))
        n = 0
        for path in w.values():
            n += sum(1 for i in range(2, len(path))
                     if path[i] == path[i - 2] and path[i] != path[i - 1])
        return n

    assert backtracks(0.05) > backtracks(20.0)
