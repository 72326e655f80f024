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

__all__ = ["random_walks", "sample_neighbors"]

_STEP_MIX = np.uint64(0x9E3779B97F4A7C15)


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
                                ^ np.uint64(step) * _STEP_MIX
                                ^ np.uint64(seed))
            d = self.degs[p[ok]]
            pick = (h % d.astype(np.uint64)).astype(np.int64)
            nxt[ok] = self.nbrs[self.starts[p[ok]] + pick]
        return walk_ids, nxt

    def sample(self, vs: np.ndarray, fanout: int, hop: int,
               seed: int) -> tuple[np.ndarray, np.ndarray]:
        """GraphSAGE-style without-replacement neighbor sample: for each
        frontier vertex keep the ``fanout`` neighbors whose rank
        ``mix(vid·C ^ (pos+1)·C ^ hop ^ seed)`` is smallest within the
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
                            ^ (off + 1).astype(np.uint64) * _STEP_MIX
                            ^ np.uint64(hop) * _STEP_MIX
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
