"""Deterministic random-walk sampling (DeepWalk / node2vec-style corpus
generation, Perozzi 2014) over the distinct adjacency — the input stage of
every embedding-training pipeline on a link graph.

Architecture: this is the one pattern the Dataset API genuinely can't
express — L sequential tiny lookups against one big shared index — so the
adjacency lives in a pool of ``_AdjShard`` ACTORS (hash-bucketed by
vertex, each shard holding its bucket's CSR slice built once in
``__init__`` from zero-copy plasma block refs), and each step routes the
walker frontier to shards as plain numpy arrays: O(W) bytes per step, no
Dataset shuffle, no per-step scheduling floor. Walk choice is a splitmix
hash of (walk_id, step, seed) — no RNG state, so any walk is replayable
in isolation (the pytest oracle recomputes walks sequentially).

Scale notes: frontier arrays live on the driver (O(W) — the caller picks
the walker count; the OUTPUT is O(W·L) regardless of engine). Each shard
filters its rows from every adjacency block at init — one parallel pass,
zero-copy on co-located plasma; on a multi-node cluster feed the actors
from a bucket-partitioned Parquet layout instead (stages/export.
write_partitioned) to avoid the K× over-fetch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..ids import integer_mix
from .triangles import _canonical_dedup, _directed_dedup

__all__ = ["random_walks", "sample_neighbors", "node2vec_walks"]

_STEP_MIX = np.uint64(0x9E3779B97F4A7C15)
_TRIAL_MIX = np.uint64(0xBF58476D1CE4E5B9)
_ACC_MIX = np.uint64(0x94D049BB133111EB)
# distinct multiplier for the STEP/HOP term: multiplying wid and step by
# the SAME constant cancels the two terms whenever wid == step (x ^ x = 0)
# and is symmetric under wid<->step, which correlated the roll streams of
# walker w at step w across every walker (and the ranks of vertex v at
# position v-1 in the GraphSAGE sampler)
_HOP_MIX = np.uint64(0xD6E8FEB86659FD93)


@ray.remote
class _AdjShard:
    """One hash bucket of the adjacency as CSR (sorted verts, neighbor
    runs sorted by id — deterministic choice order)."""

    def __init__(self, bucket: int, n_buckets: int, *blocks) -> None:
        # blocks arrive as TOP-LEVEL ctor args so Ray resolves the refs
        # (refs hidden inside a list are delivered unresolved)
        vs, ns = [], []
        for t in blocks:
            a = np.asarray(t["a"], np.int64) if "a" in t.schema.names \
                else np.empty(0, np.int64)
            if not len(a):
                continue
            b = np.asarray(t["b"], np.int64)
            m = (integer_mix(a.view(np.uint64)) % np.uint64(n_buckets)
                 ).astype(np.int64) == bucket
            vs.append(a[m])
            ns.append(b[m])
        v = np.concatenate(vs) if vs else np.empty(0, np.int64)
        n = np.concatenate(ns) if ns else np.empty(0, np.int64)
        o = np.lexsort((n, v))
        v, n = v[o], n[o]
        new = np.r_[True, v[1:] != v[:-1]] if len(v) \
            else np.empty(0, bool)  # np.r_[True, ...] is len-1 on empty v
        self.verts = v[new]
        self.starts = np.flatnonzero(new)
        self.degs = np.diff(np.r_[self.starts, len(v)])
        self.nbrs = n

    def step(self, walk_ids: np.ndarray, curs: np.ndarray, step: int,
             seed: int) -> tuple[np.ndarray, np.ndarray]:
        """One hop for the walkers currently at this shard's vertices;
        dangling walkers stay in place (the DeepWalk restart-free form)."""
        p = np.searchsorted(self.verts, curs)
        p = np.minimum(p, max(len(self.verts) - 1, 0))
        ok = np.zeros(len(curs), bool)
        if len(self.verts):
            ok = self.verts[p] == curs
        nxt = curs.copy()
        if ok.any():
            with np.errstate(over="ignore"):
                h = integer_mix(walk_ids[ok].astype(np.uint64)
                                * _STEP_MIX
                                ^ np.uint64(step) * _HOP_MIX
                                ^ np.uint64(seed))
            d = self.degs[p[ok]]
            pick = (h % d.astype(np.uint64)).astype(np.int64)
            nxt[ok] = self.nbrs[self.starts[p[ok]] + pick]
        return walk_ids, nxt

    def propose(self, walk_ids: np.ndarray, curs: np.ndarray, step: int,
                n_trials: int, seed: int):
        """node2vec proposal batch: for each walker at one of this shard's
        vertices, ``n_trials`` independent uniform draws from N(cur) —
        trial k's pick = ``mix(wid·C ^ step·C ^ (k+1)·C_TRIAL ^ seed) %
        deg``. → (walk_ids, ok mask, (W, T) candidate matrix; dangling
        walkers get ok=False and stay put at the caller)."""
        p = np.searchsorted(self.verts, curs)
        p = np.minimum(p, max(len(self.verts) - 1, 0))
        ok = np.zeros(len(curs), bool)
        if len(self.verts):
            ok = self.verts[p] == curs
        cands = np.empty((len(curs), n_trials), np.int64)
        if ok.any():
            k = np.arange(n_trials, dtype=np.uint64) + np.uint64(1)
            with np.errstate(over="ignore"):
                h = integer_mix(
                    (walk_ids[ok].astype(np.uint64) * _STEP_MIX)[:, None]
                    ^ np.uint64(step) * _HOP_MIX
                    ^ (k * _TRIAL_MIX)[None, :]
                    ^ np.uint64(seed))
            d = self.degs[p[ok]].astype(np.uint64)
            pick = (h % d[:, None]).astype(np.int64)
            cands[ok] = self.nbrs[self.starts[p[ok]][:, None] + pick]
        return walk_ids, ok, cands

    def member(self, prevs: np.ndarray, cands: np.ndarray) -> np.ndarray:
        """Membership matrix: cands[i, k] ∈ N(prevs[i])? Vectorized binary
        search inside each prev's (id-sorted) neighbor run."""
        p = np.searchsorted(self.verts, prevs)
        p = np.minimum(p, max(len(self.verts) - 1, 0))
        known = np.zeros(len(prevs), bool)
        if len(self.verts):
            known = self.verts[p] == prevs
        out = np.zeros(cands.shape, bool)
        if not known.any():
            return out
        lo = np.broadcast_to(self.starts[p][:, None], cands.shape).copy()
        hi = lo + self.degs[p][:, None]
        lo[~known], hi[~known] = 0, 0
        # branchless vectorized binary search over all (walker, trial) cells
        while True:
            active = lo < hi
            if not active.any():
                break
            mid = (lo + hi) // 2
            mv = self.nbrs[np.where(active, mid, 0)]
            hit = active & (mv == cands)
            out |= hit
            go_left = active & (mv > cands)
            hi = np.where(go_left, mid, hi)
            lo = np.where(active & (mv < cands), mid + 1, lo)
            lo = np.where(hit, hi, lo)  # found → retire the cell
        return out

    def sample(self, vs: np.ndarray, fanout: int, hop: int,
               seed: int) -> tuple[np.ndarray, np.ndarray]:
        """GraphSAGE-style without-replacement neighbor sample: for each
        frontier vertex keep the ``fanout`` neighbors whose rank
        ``mix(vid·C_STEP ^ (pos+1)·C_TRIAL ^ hop·C_HOP ^ seed)`` (three
        DISTINCT multipliers — a shared constant cancels when two terms
        collide) is smallest within the
        vertex's (id-sorted) neighbor run — deterministic, distinct (run
        positions are unique, so ranks never tie), and vectorized over the
        whole frontier (one lexsort of the gathered run entries)."""
        p = np.searchsorted(self.verts, vs)
        p = np.minimum(p, max(len(self.verts) - 1, 0))
        ok = np.zeros(len(vs), bool)
        if len(self.verts):
            ok = self.verts[p] == vs
        vs, p = vs[ok], p[ok]
        if not len(vs):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        reps = self.degs[p]
        run_id = np.repeat(np.arange(len(vs), dtype=np.int64), reps)
        starts_cum = np.r_[0, np.cumsum(reps)[:-1]]
        off = np.arange(len(run_id), dtype=np.int64) - starts_cum[run_id]
        gidx = self.starts[p][run_id] + off
        with np.errstate(over="ignore"):
            h = integer_mix(vs[run_id].astype(np.uint64) * _STEP_MIX
                            ^ (off + 1).astype(np.uint64) * _TRIAL_MIX
                            ^ np.uint64(hop) * _HOP_MIX
                            ^ np.uint64(seed))
        order = np.lexsort((h, run_id))
        rank = np.arange(len(order), dtype=np.int64) \
            - starts_cum[run_id[order]]
        keep = rank < fanout
        return vs[run_id[order][keep]], self.nbrs[gidx[order][keep]]


def _build_shards(edges_ds, directed: bool, n_shards: int):
    """Edge Dataset → the hash-sharded CSR adjacency actor pool shared by
    random_walks and sample_neighbors."""
    if directed:
        adj = _directed_dedup(edges_ds).materialize()
        blocks = adj.to_arrow_refs()

        # shard ctor expects (a, b) names
        @ray.remote(num_cpus=1)
        def rename(t):
            return pa.table({"a": t["s"], "b": t["d"]})

        blocks = [rename.remote(r) for r in blocks]
    else:
        canon = _canonical_dedup(edges_ds).materialize()

        @ray.remote(num_cpus=1)
        def both(t):
            if "a" not in t.schema.names:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
            return pa.table({
                "a": pa.concat_arrays([t["a"].combine_chunks(),
                                       t["b"].combine_chunks()]),
                "b": pa.concat_arrays([t["b"].combine_chunks(),
                                       t["a"].combine_chunks()])})

        blocks = [both.remote(r) for r in canon.to_arrow_refs()]

    return [_AdjShard.remote(s, n_shards, *blocks) for s in range(n_shards)]


def random_walks(edges_ds, start_vids, length: int, seed: int = 17,
                 directed: bool = False, n_shards: int = 8):
    """→ Dataset (walk_id, step, vid): ``len(start_vids)`` deterministic
    walks of ``length`` hops (step 0 = the start vertex). Undirected by
    default (walks traverse either direction); ``directed=True`` follows
    out-edges only, dangling walkers stay put. walk_id = index into
    ``start_vids``."""
    import ray.data

    shards = _build_shards(edges_ds, directed, n_shards)

    wid = np.arange(len(start_vids), dtype=np.int64)
    cur = np.asarray(start_vids, np.int64)
    out_w = [wid]
    out_s = [np.zeros(len(wid), np.int64)]
    out_v = [cur]
    for step in range(1, length + 1):
        bkt = (integer_mix(cur.view(np.uint64)) % np.uint64(n_shards)
               ).astype(np.int64)
        futs, order = [], []
        for s in range(n_shards):
            m = bkt == s
            if m.any():
                futs.append(shards[s].step.remote(wid[m], cur[m], step, seed))
        nxt = np.empty_like(cur)
        for w_ids, n_vs in ray.get(futs):
            nxt[w_ids] = n_vs  # walk_id IS the frontier index
        cur = nxt
        out_w.append(wid)
        out_s.append(np.full(len(wid), step, np.int64))
        out_v.append(cur)
    return ray.data.from_arrow(pa.table({
        "walk_id": pa.array(np.concatenate(out_w)),
        "step": pa.array(np.concatenate(out_s)),
        "vid": pa.array(np.concatenate(out_v))}))


def node2vec_walks(edges_ds, start_vids, length: int, p: float = 1.0,
                   q: float = 1.0, seed: int = 17, directed: bool = False,
                   n_shards: int = 8, n_trials: int = 24):
    """Second-order biased walks (node2vec, Grover & Leskovec 2016) →
    Dataset (walk_id, step, vid). The transition from ``cur`` with
    predecessor ``prev`` weights neighbor x by 1/p (x == prev), 1
    (x ∈ N(prev)) or 1/q (distance 2), sampled by DETERMINISTIC rejection
    sampling (the KnightKing scheme, Yang et al. 2019 — the scale route:
    it needs O(1) adjacency probes per trial instead of materializing the
    O(deg(cur)) weight vector per walker per hop):

    - trial k proposes a uniform neighbor (``_AdjShard.propose``; the
      O(deg)-traffic exact alternative would ship whole neighbor runs),
    - the proposal's weight class needs ONE membership probe
      x ∈ N(prev), answered by prev's shard in a second routing wave
      (vectorized binary search, ``_AdjShard.member``),
    - accept iff ``mix(wid·C ^ step·C ^ (k+1)·C_ACC ^ seed)`` is below the
      class's EXACT integer threshold ``(α/α_max)·2^64`` (the three
      thresholds are precomputed uint64s — no float compare anywhere),
    - first accepted trial wins; after ``n_trials`` straight rejections
      the walker takes trial 0's proposal — a deterministic fallback with
      bias ≤ (1 − α_min/α_max)^n_trials (≈1e-3 at p,q ∈ [1/2, 2] and the
      default 24 trials), documented rather than looped unboundedly.

    Step 1 has no predecessor → uniform first hop (the standard node2vec
    start). Dangling walkers stay put with prev unchanged. p=q=1
    degenerates to first-trial-always-accepted uniform walks. Frontier =
    O(W·n_trials) driver bytes per hop; adjacency stays in the shard
    actors. The pytest oracle replays the identical trial/accept hashes
    sequentially."""
    import ray.data

    shards = _build_shards(edges_ds, directed, n_shards)
    if not (p > 0 and q > 0):
        raise ValueError(
            f"node2vec return/in-out parameters must be positive: p={p}, "
            f"q={q} (acceptance thresholds are 1/p and 1/q)")
    alphas = [1.0 / p, 1.0, 1.0 / q]
    amax = max(alphas)
    # EXACT per-class acceptance thresholds (roll < thresh; α=α_max ⇒
    # always accept, clamped to 2^64−1: a 2^-64 under-acceptance).
    # prob_threshold clamps in PYTHON ints — a float64 2^64 cast to uint64
    # is undefined (wraps to 0 = never-accept on x86).
    from ..ids import prob_threshold

    thr = np.array([prob_threshold(a / amax) for a in alphas], np.uint64)

    wid = np.arange(len(start_vids), dtype=np.int64)
    cur = np.asarray(start_vids, np.int64)
    prev = cur.copy()  # step-1 sentinel (unused: first hop is uniform)
    out_w = [wid]
    out_s = [np.zeros(len(wid), np.int64)]
    out_v = [cur]
    for step in range(1, length + 1):
        bkt = (integer_mix(cur.view(np.uint64)) % np.uint64(n_shards)
               ).astype(np.int64)
        if step == 1:
            futs = [shards[s].step.remote(wid[bkt == s], cur[bkt == s],
                                          step, seed)
                    for s in range(n_shards) if (bkt == s).any()]
            nxt = np.empty_like(cur)
            for w_ids, n_vs in ray.get(futs):
                nxt[w_ids] = n_vs
            prev, cur = cur, nxt
        else:
            futs = [shards[s].propose.remote(wid[bkt == s], cur[bkt == s],
                                             step, n_trials, seed)
                    for s in range(n_shards) if (bkt == s).any()]
            ok = np.zeros(len(wid), bool)
            cands = np.empty((len(wid), n_trials), np.int64)
            for w_ids, okm, cm in ray.get(futs):
                ok[w_ids] = okm
                cands[w_ids] = cm
            # weight class per (walker, trial): 0 = return-to-prev,
            # 1 = distance-1 (x ∈ N(prev)), 2 = distance-2
            pb = (integer_mix(prev.view(np.uint64)) % np.uint64(n_shards)
                  ).astype(np.int64)
            mfuts, midx = [], []
            for s in range(n_shards):
                m = ok & (pb == s)
                if m.any():
                    mfuts.append(shards[s].member.remote(prev[m], cands[m]))
                    midx.append(np.flatnonzero(m))
            member = np.zeros((len(wid), n_trials), bool)
            for idx, mm in zip(midx, ray.get(mfuts)):
                member[idx] = mm
            cls = np.where(cands == prev[:, None], 0,
                           np.where(member, 1, 2))
            k = np.arange(n_trials, dtype=np.uint64) + np.uint64(1)
            with np.errstate(over="ignore"):
                roll = integer_mix(
                    (wid.astype(np.uint64) * _STEP_MIX)[:, None]
                    ^ np.uint64(step) * _HOP_MIX
                    ^ (k * _ACC_MIX)[None, :]
                    ^ np.uint64(seed))
            accept = roll < thr[cls]
            first = np.argmax(accept, axis=1)  # 0 when none accepted
            nxt = np.where(ok, cands[np.arange(len(wid)), first], cur)
            prev = np.where(ok, cur, prev)
            cur = nxt
        out_w.append(wid)
        out_s.append(np.full(len(wid), step, np.int64))
        out_v.append(cur)
    return ray.data.from_arrow(pa.table({
        "walk_id": pa.array(np.concatenate(out_w)),
        "step": pa.array(np.concatenate(out_s)),
        "vid": pa.array(np.concatenate(out_v))}))


def sample_neighbors(edges_ds, seeds, fanouts, seed: int = 17,
                     directed: bool = False, n_shards: int = 8):
    """GraphSAGE minibatch computation graph (Hamilton et al. 2017): from
    the seed set, sample ≤ ``fanouts[h-1]`` distinct neighbors per frontier
    vertex at each hop h → Dataset (hop, src, dst) of the sampled edges
    (one shared sample per (vertex, hop), the LADIES-style layer-shared
    form — the block every seed in the minibatch reads). Deterministic:
    same seeds/fanouts/seed → same block; the hop index salts the rank hash
    so a vertex on two layers draws different samples. Frontier and output
    are O(|seeds|·Πfanout) driver rows; adjacency stays sharded in the
    actor pool."""
    import ray.data

    shards = _build_shards(edges_ds, directed, n_shards)
    frontier = np.unique(np.asarray(seeds, np.int64))
    out_h, out_s, out_d = [], [], []
    for hop, f in enumerate(fanouts, start=1):
        if not len(frontier):
            break
        bkt = (integer_mix(frontier.view(np.uint64)) % np.uint64(n_shards)
               ).astype(np.int64)
        futs = [shards[s].sample.remote(frontier[bkt == s], int(f), hop,
                                        seed)
                for s in range(n_shards) if (bkt == s).any()]
        srcs, dsts = [], []
        for sv, dv in ray.get(futs):
            srcs.append(sv)
            dsts.append(dv)
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        out_h.append(np.full(len(src), hop, np.int64))
        out_s.append(src)
        out_d.append(dst)
        frontier = np.unique(dst)
    return ray.data.from_arrow(pa.table({
        "hop": pa.array(np.concatenate(out_h) if out_h
                        else np.empty(0, np.int64)),
        "src": pa.array(np.concatenate(out_s) if out_s
                        else np.empty(0, np.int64)),
        "dst": pa.array(np.concatenate(out_d) if out_d
                        else np.empty(0, np.int64))}))
