"""Louvain (graph/louvain.py) vs an independent sequential replay of the
identical deterministic synchronous rule, plus planted-partition recovery,
an independent modularity check, and bucket-count invariance."""

import numpy as np
import pandas as pd
import ray.data

from powergraph_ray.graph.louvain import modularity, run_louvain
from powergraph_ray.ids import round_half_away

MIN_GAIN = 1e-7


def _replay_oracle(src, dst, w=None, max_levels=10, max_rounds=50):
    """Pure-python replay of the synchronous rule: frozen-state rounds,
    round6 gains, smallest-community tie-break, index-parity alternation,
    stop after two consecutive empty rounds; then contract and repeat."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.ones(len(src)) if w is None else np.asarray(w, np.float64)
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    vids = np.unique(np.concatenate([a, b]))
    da = np.searchsorted(vids, a)
    db = np.searchsorted(vids, b)
    nv = len(vids)
    assign = np.arange(nv)
    rep = vids.copy()
    edges = list(zip(da.tolist(), db.tolist(), w.tolist()))

    for _level in range(max_levels):
        if nv <= 1:
            break
        k = np.zeros(nv)
        m = 0.0
        adj = [dict() for _ in range(nv)]
        for x, y, ww in edges:
            m += ww
            k[x] += ww
            k[y] += ww
            if x != y:
                adj[x][y] = adj[x].get(y, 0.0) + ww
                adj[y][x] = adj[y].get(x, 0.0) + ww
        if m <= 0:
            break
        comm = np.arange(nv)
        sig = k.copy()
        prev_count, best_pair, stall = None, np.inf, 0
        done = False
        for rnd in range(max_rounds):
            parity = rnd % 2
            csize = np.bincount(comm, minlength=nv)
            moves = []
            for v in range(nv):
                cand = {}
                for u, ww in adj[v].items():
                    cand[comm[u]] = cand.get(comm[u], 0.0) + ww
                cand.setdefault(comm[v], 0.0)
                best_c, best_g, g_own = None, None, None
                for c in sorted(cand):
                    # m-scaled gain, mirroring the module
                    g = round_half_away(
                        cand[c] - k[v] * (sig[c] - (k[v] if c == comm[v]
                                                    else 0.0))
                        / (2 * m), 6)
                    if c == comm[v]:
                        g_own = g
                    if best_g is None or g > best_g:
                        best_c, best_g = c, g
                if (best_c != comm[v] and best_g - g_own > MIN_GAIN
                        and v % 2 == parity
                        # singleton-singleton minimum-label guard
                        and not (csize[comm[v]] == 1 and csize[best_c] == 1
                                 and best_c > comm[v])):
                    moves.append((v, best_c))
            for v, c in moves:
                comm[v] = c
            if moves:
                sig = np.bincount(comm, weights=k, minlength=nv)
            # mirror the module's parity-pair stop rule
            if prev_count is None:
                prev_count = len(moves)
            else:
                pair = prev_count + len(moves)
                prev_count = None
                if pair == 0 or pair < 2e-3 * nv:
                    done = True
                elif pair < 0.95 * best_pair:
                    best_pair, stall = pair, 0
                else:
                    stall += 1
                    done = stall >= 2
            if done:
                break
        uniq, dense = np.unique(comm, return_inverse=True)
        if len(uniq) == nv:
            break
        assign = dense[assign]
        new_rep = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        for j in range(nv):
            new_rep[dense[j]] = min(new_rep[dense[j]], rep[j])
        rep = new_rep
        agg = {}
        for x, y, ww in edges:
            key = tuple(sorted((int(dense[x]), int(dense[y]))))
            agg[key] = agg.get(key, 0.0) + ww
        edges = [(x, y, ww) for (x, y), ww in agg.items()]
        nv = len(uniq)
    return dict(zip(vids.tolist(), rep[assign].tolist()))


def _ds(src, dst, w=None):
    d = {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
    if w is not None:
        d["weight"] = np.asarray(w, np.float64)
    return ray.data.from_pandas(pd.DataFrame(d))


def _planted(n_cliques=3, size=8):
    src, dst = [], []
    for c in range(n_cliques):
        base = c * size
        for i in range(size):
            for j in range(i + 1, size):
                src.append(base + i)
                dst.append(base + j)
    for c in range(n_cliques - 1):  # single bridges between cliques
        src.append(c * size)
        dst.append((c + 1) * size)
    return np.array(src), np.array(dst)


def test_louvain_matches_sequential_replay_random():
    rng = np.random.RandomState(17)
    for seed in (0, 1):
        rng = np.random.RandomState(17 + seed)
        src = rng.randint(0, 50, 140)
        dst = rng.randint(0, 50, 140)
        keep = src != dst
        e = np.unique(np.stack([np.minimum(src[keep], dst[keep]),
                                np.maximum(src[keep], dst[keep])], 1), axis=0)
        src, dst = e[:, 0], e[:, 1]
        # local_threshold=0 forces the DISTRIBUTED kernels (bucketed emit +
        # choose + contraction shuffles); the default path goes local on a
        # graph this small — both must equal the sequential replay
        got = run_louvain(_ds(src, dst), n_buckets=4, local_threshold=0)
        want = _replay_oracle(src, dst)
        gm = dict(zip(got["vid"].astype(int), got["community"].astype(int)))
        assert gm == want
        loc = run_louvain(_ds(src, dst))
        lm = dict(zip(loc["vid"].astype(int), loc["community"].astype(int)))
        assert lm == want


def test_louvain_recovers_planted_cliques():
    src, dst = _planted()
    got = run_louvain(_ds(src, dst))
    gm = dict(zip(got["vid"].astype(int), got["community"].astype(int)))
    # each clique must be one community, labelled by its min member
    for c in range(3):
        members = {gm[v] for v in range(c * 8, (c + 1) * 8)}
        assert members == {c * 8}, members
    # independent modularity check: clearly community-structured
    vids = np.unique(np.concatenate([src, dst]))
    comm_dense = np.searchsorted(
        vids, np.array([gm[int(v)] for v in vids]))
    q = modularity(np.searchsorted(vids, src), np.searchsorted(vids, dst),
                   np.ones(len(src)), comm_dense)
    assert q > 0.5, q


def test_louvain_bucket_count_invariance():
    rng = np.random.RandomState(23)
    src = rng.randint(0, 40, 100)
    dst = rng.randint(0, 40, 100)
    keep = src != dst
    e = np.unique(np.stack([np.minimum(src[keep], dst[keep]),
                            np.maximum(src[keep], dst[keep])], 1), axis=0)
    a = run_louvain(_ds(e[:, 0], e[:, 1]), n_buckets=2,
                    local_threshold=0).sort_values("vid")
    b = run_louvain(_ds(e[:, 0], e[:, 1]), n_buckets=11,
                    local_threshold=0).sort_values("vid")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_louvain_weighted_pulls_heavy_pair_together():
    # 0-1 heavy, 1-2 and 0-2 light plus a far triangle; heavy pair must
    # share a community
    src = np.array([0, 1, 0, 3, 4, 3])
    dst = np.array([1, 2, 2, 4, 5, 5])
    w = np.array([10.0, 0.5, 0.5, 1.0, 1.0, 1.0])
    got = run_louvain(_ds(src, dst, w))
    gm = dict(zip(got["vid"].astype(int), got["community"].astype(int)))
    assert gm[0] == gm[1]
    want = _replay_oracle(src, dst, w)
    assert gm == want
