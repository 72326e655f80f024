"""Louvain community detection (Blondel et al. 2008), deterministic
synchronous variant.

The reference toolkit's community detector is label propagation
(label_propagation.cpp); Louvain is the modularity-maximizing standard a
link-graph engine is expected to carry. The sequential algorithm is
inherently order-dependent, so this is the SYNCHRONOUS formulation used by
parallel/distributed Louvain implementations (Grappolo — Lu, Halappanavar &
Kalyanaraman 2015; GraphX ports): every round all eligible vertices
evaluate their best move against the PREVIOUS round's assignment and
community strengths, with two determinism rules that also prevent the
classic synchronous swap oscillation:

- tie-break: the best insert gain wins with the SMALLEST community id on
  equal (6-dp-rounded, m-scaled) gain;
- parity alternation: in round r only vertices whose dense index parity
  equals r % 2 may move (alternating parities breaks A↔B swap cycles);
  a level stops after two consecutive rounds below the sweep cutoff
  ``max(1, min_moves_frac·nv)``.

Both rules make the result a pure function of the input edge set — the test
suite replays the identical rule sequentially and asserts exact equality,
plus planted-partition recovery and an independent modularity check.

Scale shape: a level-0 local-moving round is ONE pass over the edge shards
(per-batch lexsort/reduceat pre-reduction of (v, comm(u), w) rows — the
pre_local_gather shape) followed by ONE bucketed merge keyed by v that
computes the argmax insert gain; the driver holds the dense per-level
``comm`` / ``k`` / ``sig_tot`` arrays (the toolkit-legacy dense path, like
kcore/coloring) and broadcasts them via ``ray.put`` once per round.
Contraction relabels the edge shards through the broadcast assignment and
re-aggregates weights in one bucketed shuffle. Once a contracted level's
edge list drops under ``local_threshold`` rows it is pulled to the driver
and the IDENTICAL kernels run locally (contracted graphs shrink
geometrically; paying ~0.5 s of Dataset scheduling per round on a
1000-vertex level was the dominant cost of the first cut — 188 s → 45 s on
a 1M-vertex power-law)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray

from ..ids import integer_mix, round_half_away

__all__ = ["run_louvain", "modularity"]


def _bkt(ids: np.ndarray, n: int) -> np.ndarray:
    return (integer_mix(ids.astype(np.int64).view(np.uint64))
            % np.uint64(n)).astype(np.int64)


def modularity(src, dst, w, comm) -> float:
    """Q = Σ_C [ w_in(C)/m − (Σtot(C)/2m)² ] over dense-indexed vertices;
    ``src == dst`` rows are self-loops (weight counted once in w_in and m,
    twice in strength — they hit both bincounts)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float64)
    comm = np.asarray(comm, np.int64)
    m = float(w.sum())
    if m <= 0:
        return 0.0
    nv = len(comm)
    k = (np.bincount(src, weights=w, minlength=nv)
         + np.bincount(dst, weights=w, minlength=nv))
    sig = np.bincount(comm, weights=k, minlength=nv)
    intra = w[comm[src] == comm[dst]].sum()
    return float(intra / m - ((sig / (2.0 * m)) ** 2).sum())


# ---------------------------------------------------------------------------
# shared kernels — the distributed and local paths call the SAME math
# ---------------------------------------------------------------------------

def _reduce_vcu(v, cu, ww):
    """(v, cu, w) rows → reduced (v, cu, ws) with one lexsort + reduceat."""
    if not len(v):
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.float64)
    so = np.lexsort((cu, v))
    v, cu, ww = v[so], cu[so], ww[so]
    starts = np.flatnonzero(np.r_[True, (v[1:] != v[:-1])
                                  | (cu[1:] != cu[:-1])])
    return v[starts], cu[starts], np.add.reduceat(ww, starts)


def _gather_rows(a, b, w, comm):
    """Edge slice → reduced (v, cu, ws) rows: per vertex, summed edge weight
    toward each neighbor community (both directions; self-loops excluded —
    they travel with the vertex and are constant across move choices)."""
    nl = a != b
    v = np.concatenate([a[nl], b[nl]])
    if not len(v):
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.float64)
    cu = np.concatenate([comm[b[nl]], comm[a[nl]]])
    ww = np.concatenate([w[nl], w[nl]])
    return _reduce_vcu(v, cu, ww)


def _choose_moves(v, cu, ws, comm, sig, k, inv_2m, min_gain, parity,
                  csize):
    """Reduced (v, cu, ws) rows → (moved_v, new_comm).

    m-SCALED insert gain of v into cu after removal from its own community
    (Σtot excludes v's strength when cu == comm(v)): g = m·ΔQ = ws −
    k_v·Σtot'/(2m). Scaling keeps magnitudes O(1) so the 6-dp rounding that
    guards the smallest-id tie-break against FP noise never flattens real
    gains (unscaled ΔQ is O(1/m) and would round to zero on a big graph);
    argmax and the > min_gain move test are invariant under the m>0 scale."""
    if not len(v):  # nothing gathered (e.g. an all-self-loop level)
        z = np.zeros(0, np.int64)
        return z, z
    # a zero-weight "stay" candidate per distinct v so the own community
    # always competes in the argmax
    uv = np.unique(v)
    v = np.concatenate([v, uv])
    cu = np.concatenate([cu, comm[uv]])
    ws = np.concatenate([ws, np.zeros(len(uv))])
    so = np.lexsort((cu, v))
    v, cu, ws = v[so], cu[so], ws[so]
    starts = np.flatnonzero(np.r_[True, (v[1:] != v[:-1])
                                  | (cu[1:] != cu[:-1])])
    v, cu = v[starts], cu[starts]
    ws = np.add.reduceat(ws, starts)
    own = cu == comm[v]
    gain = round_half_away(
        ws - k[v] * (sig[cu] - np.where(own, k[v], 0.0)) * inv_2m, 6)
    so2 = np.lexsort((cu, -gain, v))
    first = np.flatnonzero(np.r_[True, v[so2][1:] != v[so2][:-1]])
    bi = so2[first]
    bv, bc, bg = v[bi], cu[bi], gain[bi]
    oidx = np.flatnonzero(own)
    g_own = gain[oidx][np.searchsorted(v[oidx], bv)]
    mv = ((bc != comm[bv]) & (bg - g_own > min_gain)
          & ((bv % 2) == parity))
    # Grappolo's minimum-label heuristic (Lu et al. 2015): two SINGLETON
    # communities may only merge toward the smaller label — kills the
    # dominant synchronous ping-pong (measured 3× lower steady churn AND
    # better modularity on a 100k power-law)
    mv &= ~((csize[comm[bv]] == 1) & (csize[bc] == 1) & (bc > comm[bv]))
    return bv[mv], bc[mv]


def _contract_rows(a, b, w, comm_dense):
    """Relabel an edge slice by community and pre-reduce (keeps self-pairs —
    they become the contracted level's self-loops)."""
    ca = comm_dense[a]
    cb = comm_dense[b]
    lo, hi = np.minimum(ca, cb), np.maximum(ca, cb)
    so = np.lexsort((hi, lo))
    lo, hi, ww = lo[so], hi[so], w[so]
    starts = np.flatnonzero(np.r_[True, (lo[1:] != lo[:-1])
                                  | (hi[1:] != hi[:-1])])
    return lo[starts], hi[starts], np.add.reduceat(ww, starts)


class _PairStop:
    """Round-stop tracker over PARITY PAIRS (two consecutive rounds cover
    both parity classes, so per-round counts alternate and a per-round
    trend test misfires). Stop when a completed pair (a) moved nothing —
    the exact fixed point, (b) fell under the sweep cutoff
    ``2·min_moves_frac·nv``, or (c) failed to shrink 5% below the best
    pair twice in a row — the steady-churn plateau where residual
    synchronous oscillation moves O(plateau) vertices forever while
    modularity no longer improves."""

    def __init__(self, nv: int, min_moves_frac: float) -> None:
        self.cutoff = 2.0 * min_moves_frac * nv
        self.best = np.inf
        self.stall = 0
        self.prev: int | None = None

    def push(self, n_moves: int) -> bool:
        if self.prev is None:
            self.prev = n_moves
            return False
        pair = self.prev + n_moves
        self.prev = None
        if pair == 0 or pair < self.cutoff:
            return True
        if pair < 0.95 * self.best:
            self.best = pair
            self.stall = 0
            return False
        self.stall += 1
        return self.stall >= 2


# ---------------------------------------------------------------------------
# distributed level (edge Dataset)
# ---------------------------------------------------------------------------

def _local_moving_ds(edges_ds, nv, m, k, max_rounds, min_gain, n_buckets,
                     min_moves_frac):
    """Per-round work is ONE map pass: the (v, neighbor, w) gather rows are
    hash-bucketed by v and physically grouped ONCE per level (one shuffle),
    so every round just maps over the bucket-aligned blocks — recompute
    cu = comm[u] from the round's broadcast assignment, reduce, choose.
    (The first cut re-sorted the gather rows every round; at 2.7M edges
    that was ~2.5 s/round of pure shuffle.)"""
    def ex(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        w = df["w"].to_numpy().astype(np.float64)
        nl = a != b
        v = np.concatenate([a[nl], b[nl]])
        u = np.concatenate([b[nl], a[nl]])
        ww = np.concatenate([w[nl], w[nl]])
        return pd.DataFrame({"bucket": _bkt(v, n_buckets),
                             "v": v, "u": u, "w": ww})

    gath = (edges_ds.map_batches(ex, batch_format="pandas")
            .groupby("bucket")
            .map_groups(lambda g: g, batch_format="pandas")
            .materialize())

    comm = np.arange(nv, dtype=np.int64)
    sig_tot = k.copy()
    inv_2m = 1.0 / (2.0 * m)
    k_ref = ray.put(k)
    stop = _PairStop(nv, min_moves_frac)
    move_counts = []

    for rnd in range(max_rounds):
        comm_ref = ray.put(comm)
        sig_ref = ray.put(sig_tot)
        csize_ref = ray.put(np.bincount(comm, minlength=nv))
        parity = rnd % 2

        def choose(g: pd.DataFrame, _cr=comm_ref, _sr=sig_ref, _kr=k_ref,
                   _zr=csize_ref, _p=parity) -> pd.DataFrame:
            c = ray.get(_cr)
            v = g["v"].to_numpy().astype(np.int64)
            u = g["u"].to_numpy().astype(np.int64)
            ww = g["w"].to_numpy().astype(np.float64)
            vv, cu, ws = _reduce_vcu(v, c[u], ww)
            bv, bc = _choose_moves(vv, cu, ws, c, ray.get(_sr),
                                   ray.get(_kr), inv_2m, min_gain, _p,
                                   ray.get(_zr))
            return pd.DataFrame({"v": bv, "newc": bc})

        # batch_size=None → whole blocks; groupby kept each bucket (hence
        # every row of a vertex) inside one block
        moves = gath.map_batches(choose, batch_format="pandas",
                                 batch_size=None).to_pandas()
        if len(moves):
            comm[moves["v"].to_numpy().astype(np.int64)] = \
                moves["newc"].to_numpy().astype(np.int64)
            sig_tot = np.bincount(comm, weights=k, minlength=nv)
        move_counts.append(len(moves))
        if stop.push(len(moves)):
            break
    if os.environ.get("GRAFT_LOUVAIN_DEBUG"):
        print(f"[louvain] ds level nv={nv} rounds={rnd + 1} "
              f"moves={move_counts}", flush=True)
    return comm


def _strength_and_m_ds(lvl, nv):
    """One pass over the edge shards → dense strength k (self-loops ×2) and
    total weight m. Per-batch partials are SPARSE (touched vertices only)."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        w = df["w"].to_numpy().astype(np.float64)
        if not len(a):
            return pd.DataFrame({"i": pd.array([], dtype="int64"),
                                 "kk": pd.array([], dtype="float64"),
                                 "mm": pd.array([], dtype="float64")})
        ids = np.concatenate([a, b])
        so = np.argsort(ids, kind="stable")
        ids = ids[so]
        ww = np.concatenate([w, w])[so]
        st = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        return pd.DataFrame({"i": ids[st], "kk": np.add.reduceat(ww, st),
                             "mm": np.r_[w.sum(), np.zeros(len(st) - 1)]})

    parts = lvl.map_batches(part, batch_format="pandas").to_pandas()
    k = np.zeros(nv, np.float64)
    np.add.at(k, parts["i"].to_numpy().astype(np.int64),
              parts["kk"].to_numpy(np.float64))
    return k, float(parts["mm"].sum())


# ---------------------------------------------------------------------------
# local level (contracted graph fits on the driver) — SAME kernels
# ---------------------------------------------------------------------------

def _local_moving_np(a, b, w, nv, m, k, max_rounds, min_gain,
                     min_moves_frac):
    comm = np.arange(nv, dtype=np.int64)
    sig_tot = k.copy()
    inv_2m = 1.0 / (2.0 * m)
    stop = _PairStop(nv, min_moves_frac)
    for rnd in range(max_rounds):
        v, cu, ws = _gather_rows(a, b, w, comm)
        bv, bc = _choose_moves(v, cu, ws, comm, sig_tot, k, inv_2m,
                               min_gain, rnd % 2,
                               np.bincount(comm, minlength=nv))
        if len(bv):
            comm[bv] = bc
            sig_tot = np.bincount(comm, weights=k, minlength=nv)
        if stop.push(len(bv)):
            break
    return comm


# ---------------------------------------------------------------------------
# driver loop
# ---------------------------------------------------------------------------

def run_louvain(edges_ds, max_levels: int = 10, max_rounds: int = 50,
                min_gain: float = 1e-7, n_buckets: int = 32,
                min_moves_frac: float = 1e-3,
                local_threshold: int = 500_000) -> pd.DataFrame:
    """Louvain over an undirected edge Dataset ``(src, dst[, weight])`` —
    feed the canonical simple pairs (no duplicate pairs; level-0 self-loops
    are ignored for moving but counted in strength). → pandas
    (vid, community) with community = the minimum member vid (the CC/SCC
    canonical-label convention). Levels whose edge list has ≤
    ``local_threshold`` rows run the identical kernels driver-locally."""
    import pyarrow as pa

    def canon(t: pa.Table) -> pd.DataFrame:
        s = np.asarray(t["src"], np.int64)
        d = np.asarray(t["dst"], np.int64)
        w = (np.asarray(t["weight"], np.float64)
             if "weight" in t.schema.names else np.ones(len(s)))
        return pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d),
                             "w": w})

    raw = edges_ds.map_batches(canon, batch_format="pyarrow").materialize()

    def batch_vids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": np.unique(np.concatenate(
            [df["a"].to_numpy(), df["b"].to_numpy()]))})

    vids = np.unique(raw.map_batches(batch_vids, batch_format="pandas")
                     .to_pandas()["v"].to_numpy()).astype(np.int64)
    nv = len(vids)
    vref = ray.put(vids)

    def to_dense(df: pd.DataFrame, _r=vref) -> pd.DataFrame:
        t = ray.get(_r)
        return pd.DataFrame({
            "a": np.searchsorted(t, df["a"].to_numpy()),
            "b": np.searchsorted(t, df["b"].to_numpy()),
            "w": df["w"].to_numpy()})

    lvl = raw.map_batches(to_dense, batch_format="pandas").materialize()
    lvl_df: pd.DataFrame | None = None  # local representation when small
    n_rows = lvl.count()
    assign = np.arange(nv, dtype=np.int64)  # original vertex → level vertex
    rep = vids.copy()                       # level vertex → min original vid

    for _level in range(max_levels):
        if nv <= 1:
            break
        if lvl_df is None and n_rows <= local_threshold:
            lvl_df = lvl.to_pandas()
        if lvl_df is not None:
            a = lvl_df["a"].to_numpy().astype(np.int64)
            b = lvl_df["b"].to_numpy().astype(np.int64)
            w = lvl_df["w"].to_numpy().astype(np.float64)
            k = (np.bincount(a, weights=w, minlength=nv)
                 + np.bincount(b, weights=w, minlength=nv))
            m = float(w.sum())
            if m <= 0:
                break
            comm = _local_moving_np(a, b, w, nv, m, k, max_rounds,
                                    min_gain, min_moves_frac)
        else:
            k, m = _strength_and_m_ds(lvl, nv)
            if m <= 0:
                break
            comm = _local_moving_ds(lvl, nv, m, k, max_rounds, min_gain,
                                    n_buckets, min_moves_frac)
        comm_u, comm_dense = np.unique(comm, return_inverse=True)
        if len(comm_u) == nv:  # nobody merged at this level → done
            break
        comm_dense = comm_dense.astype(np.int64)
        assign = comm_dense[assign]
        order = np.argsort(comm_dense, kind="stable")
        cs = comm_dense[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        rep = np.minimum.reduceat(rep[order], starts)

        if lvl_df is not None:
            lo, hi, ww = _contract_rows(a, b, w, comm_dense)
            lvl_df = pd.DataFrame({"a": lo, "b": hi, "w": ww})
            n_rows = len(lvl_df)
        else:
            cd_ref = ray.put(comm_dense)
            _EMPTY_C = pd.DataFrame({"a": pd.array([], dtype="int64"),
                                     "b": pd.array([], dtype="int64"),
                                     "ws": pd.array([], dtype="float64"),
                                     "bucket": pd.array([], dtype="int64")})

            def contract(df: pd.DataFrame, _r=cd_ref) -> pd.DataFrame:
                if not len(df):
                    return _EMPTY_C
                lo, hi, ww = _contract_rows(
                    df["a"].to_numpy().astype(np.int64),
                    df["b"].to_numpy().astype(np.int64),
                    df["w"].to_numpy().astype(np.float64), ray.get(_r))
                return pd.DataFrame({
                    "a": lo, "b": hi, "ws": ww,
                    "bucket": _bkt(lo * np.int64(2654435761) + hi,
                                   n_buckets)})

            def merge_e(g: pd.DataFrame) -> pd.DataFrame:
                lo = g["a"].to_numpy().astype(np.int64)
                hi = g["b"].to_numpy().astype(np.int64)
                ww = g["ws"].to_numpy().astype(np.float64)
                so = np.lexsort((hi, lo))
                lo, hi, ww = lo[so], hi[so], ww[so]
                st = np.flatnonzero(np.r_[True, (lo[1:] != lo[:-1])
                                          | (hi[1:] != hi[:-1])])
                return pd.DataFrame({"a": lo[st], "b": hi[st],
                                     "w": np.add.reduceat(ww, st)})

            lvl = (lvl.map_batches(contract, batch_format="pandas")
                   .groupby("bucket").map_groups(merge_e,
                                                 batch_format="pandas")
                   .materialize())
            n_rows = lvl.count()
        nv = len(comm_u)

    return pd.DataFrame({"vid": vids, "community": rep[assign]})
