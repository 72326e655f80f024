"""k-truss decomposition: the maximal subgraph in which every edge lies on
≥ k−2 triangles (Cohen 2008) — the edge-level cohesion analogue of k-core
(toolkit.py run_kcore), built on the triangle grid machinery
(triangles.py: degree-ordered orientation + bucketed 2D-grid self-join).

Each round computes exact per-edge triangle SUPPORT over the surviving
edge set (the same cell kernel as triangle counting, but each matched
triangle (u,v,w) credits its three canonical edges instead of its three
corners, partial-aggregated inside the cell) and drops edges with support
< k−2; the loop runs until a fixed point. Rounds are few in practice
(peeling removes whole shells at once); each round is one grid shuffle —
the cost model of triangle_total times the round count. No driver-side
edge state: the surviving edge set stays a (materialized) Dataset between
rounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.agg import bucketed_agg
from .triangles import (_EXPANSION_CAP, _OrientEmit, _auto_buckets, _bucket,
                        _canon_degrees, _canonical_dedup, _chunked_expansion,
                        _degree_arrays, _sorted_pairs)

__all__ = ["edge_support", "ktruss"]

#: at or below this many surviving edges the support computation (and the
#: whole k-truss peel loop) runs inside ONE task on gathered arrays — the
#: louvain/spectral small-size threshold. Each distributed round costs a
#: grid shuffle + degree pass of fixed scheduling floor (~0.8 s at sf0.1)
#: that dwarfs the actual kernel there; support counts are exact integers,
#: so the two paths are value-identical.
SMALL_EDGES = 500_000


def _support_local_arrays(a: np.ndarray, b: np.ndarray,
                          pair_cap: int = 5_000_000) -> np.ndarray:
    """Exact per-edge triangle support for a canonical (a<b) distinct edge
    set, vectorized in-process: (deg, vid)-ordered orientation (the same
    rule as _OrientEmit), chunked wedge expansion, packed-key membership.
    → int64 support aligned with the input rows (0 for triangle-free)."""
    ne = len(a)
    sup = np.zeros(ne, np.int64)
    if ne == 0:
        return sup
    verts = np.unique(np.concatenate([a, b]))
    n = np.int64(len(verts))
    da = np.searchsorted(verts, a)
    db = np.searchsorted(verts, b)
    deg = np.bincount(da, minlength=n) + np.bincount(db, minlength=n)
    order = np.empty(n, np.int64)
    order[np.lexsort((np.arange(n), deg))] = np.arange(n)
    lo_first = order[da] < order[db]
    ou = np.where(lo_first, da, db)
    ov = np.where(lo_first, db, da)
    so = np.lexsort((ov, ou))
    ou, ov = ou[so], ov[so]
    # canonical dense pair key → original edge row (for crediting)
    ekey = np.minimum(da, db) * n + np.maximum(da, db)
    eorder = np.argsort(ekey, kind="stable")
    eks = ekey[eorder]
    # wedge runs grouped by oriented source
    starts = np.r_[0, np.flatnonzero(np.diff(ou)) + 1]
    run_of = np.repeat(np.arange(len(starts)),
                       np.diff(np.r_[starts, ne]))
    t = np.arange(ne) - starts[run_of]          # #previous same-source rows
    csum = np.concatenate([[0], np.cumsum(t)])
    # chunk the pair expansion so peak memory stays bounded
    pos0 = 0
    while pos0 < ne:
        pos1 = int(np.searchsorted(csum, csum[pos0] + pair_cap, "right"))
        pos1 = max(pos1 - 1, pos0 + 1)
        sl = slice(pos0, pos1)
        tt = t[sl]
        tot = int(tt.sum())
        pos0 = pos1
        if tot == 0:
            continue
        second = np.repeat(np.arange(sl.start, sl.stop), tt)
        offs = np.arange(tot) - np.repeat(np.cumsum(tt) - tt, tt)
        first = np.repeat(starts[run_of[sl]], tt) + offs
        u, w1, w2 = ou[second], ov[first], ov[second]
        wkey = np.minimum(w1, w2) * n + np.maximum(w1, w2)
        p = np.searchsorted(eks, wkey)
        hit = (p < len(eks)) & (eks[np.minimum(p, len(eks) - 1)] == wkey)
        if not hit.any():
            continue
        uh, w1h, w2h = u[hit], w1[hit], w2[hit]
        for x, y in ((uh, w1h), (uh, w2h), (w1h, w2h)):
            kk = np.minimum(x, y) * n + np.maximum(x, y)
            np.add.at(sup, eorder[np.searchsorted(eks, kk)], 1)
    return sup


@ray.remote
def _support_local_task(*blocks) -> pa.Table:
    t = pa.concat_tables([b for b in blocks if len(b)])
    if t.num_rows == 0:
        return _EMPTY_SUP
    a = np.asarray(t["a"]).astype(np.int64, copy=False)
    b = np.asarray(t["b"]).astype(np.int64, copy=False)
    sup = _support_local_arrays(a, b)
    m = sup > 0     # absent row == support 0, matching the grid path
    return pa.table({"ea": pa.array(a[m]), "eb": pa.array(b[m]),
                     "sup": pa.array(sup[m])})


@ray.remote
def _ktruss_local_task(k: int, max_rounds: int, *blocks) -> pa.Table:
    """The whole peel loop on gathered arrays (small survivor sets): one
    task instead of rounds × (grid shuffle + filter + count)."""
    t = pa.concat_tables([b for b in blocks if len(b)])
    a = np.asarray(t["a"]).astype(np.int64, copy=False)
    b = np.asarray(t["b"]).astype(np.int64, copy=False)
    for _ in range(max_rounds):
        if len(a) == 0:
            break
        sup = _support_local_arrays(a, b)
        good = sup >= (k - 2)
        if good.all():
            break
        a, b = a[good], b[good]
    else:
        raise RuntimeError(f"ktruss did not converge in {max_rounds} rounds")
    return pa.table({"a": pa.array(a), "b": pa.array(b)})

_EMPTY_SUP = pa.table({"ea": pa.array([], pa.int64()),
                       "eb": pa.array([], pa.int64()),
                       "sup": pa.array([], pa.int64())})


def _support_cell_kernel(t: pa.Table, B: int) -> pa.Table:
    """Per-cell per-EDGE support: for each matched triangle (qu, qv, w)
    credit the canonical forms of (qu,qv), (qu,w), (qv,w); one lexsort
    partial-agg per cell so repeated edges leave the cell as single rows."""
    role = np.asarray(t["role"])
    x = np.asarray(t["x"])
    y = np.asarray(t["y"])
    cell = int(t["cell"][0].as_py())
    i, j = divmod(cell, B)
    qm = role == 0
    qu, qv = x[qm], y[qm]
    ax, ay = x[~qm], y[~qm]
    if len(qu) == 0 or len(ax) == 0:
        return _EMPTY_SUP
    h = _bucket(ax, B)
    rx, ry = _sorted_pairs(ax[h == i], ay[h == i])
    cx, cy = ax[h == j], ay[h == j]
    if len(rx) == 0 or len(cx) == 0:
        return _EMPTY_SUP
    univ = np.unique(np.concatenate([qv, cx, cy, ry]))
    n = np.int64(len(univ))
    ckey = np.sort(np.searchsorted(univ, cx).astype(np.int64) * n
                   + np.searchsorted(univ, cy))
    qvl = np.searchsorted(univ, qv).astype(np.int64)
    ryl = np.searchsorted(univ, ry).astype(np.int64)
    starts = np.searchsorted(rx, qu, "left")
    ends = np.searchsorted(rx, qu, "right")
    eas, ebs = [], []
    for rep, pos in _chunked_expansion(starts, ends, _EXPANSION_CAP):
        keys = qvl[rep] * n + ryl[pos]
        p = np.searchsorted(ckey, keys)
        m = (p < len(ckey)) & (ckey[np.minimum(p, len(ckey) - 1)] == keys)
        mrep = rep[m]
        if not len(mrep):
            continue
        u, v, w = qu[mrep], qv[mrep], ry[pos[m]]
        # orientation is by (deg, vid) — canonicalize each edge by id
        eas.append(np.concatenate([np.minimum(u, v), np.minimum(u, w),
                                   np.minimum(v, w)]))
        ebs.append(np.concatenate([np.maximum(u, v), np.maximum(u, w),
                                   np.maximum(v, w)]))
    if not eas:
        return _EMPTY_SUP
    ea = np.concatenate(eas)
    eb = np.concatenate(ebs)
    o = np.lexsort((eb, ea))
    ea, eb = ea[o], eb[o]
    new = np.r_[True, (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])]
    st = np.flatnonzero(new)
    cnt = np.diff(np.r_[st, len(ea)])
    return pa.table({"ea": pa.array(ea[st]), "eb": pa.array(eb[st]),
                     "sup": pa.array(cnt.astype(np.int64))})


def edge_support(canon_ds, n_buckets: int | None = None):
    """Distinct canonical (a,b) pairs → (ea, eb, sup) Dataset: the exact
    triangle support of every edge that lies on ≥ 1 triangle (absent
    edge = support 0). ``canon_ds`` must already be the deduped canonical
    pair set (ktruss maintains that invariant between rounds)."""
    from ..stages.agg import coalesce_small

    # size-aware: each round's survivor set inherits the previous round's
    # block count (near-empty blocks after a deep peel), and this grid
    # pays ~0.1 s of sort scheduling per block per round
    canon = coalesce_small(canon_ds)
    m = canon.count()
    if m == 0:
        import ray.data

        return ray.data.from_arrow(_EMPTY_SUP)
    if m <= SMALL_EDGES:
        import ray.data

        return ray.data.from_arrow_refs(
            [_support_local_task.remote(*canon.to_arrow_refs())])
    B = n_buckets or _auto_buckets(m)
    deg_ds = _canon_degrees(canon).materialize()
    deg_ref = _degree_arrays.remote(*deg_ds.to_arrow_refs())
    grid = canon.map_batches(_OrientEmit, batch_format="pyarrow",
                             fn_constructor_args=(deg_ref, B),
                             concurrency=(1, 8))
    per_cell = grid.groupby("cell").map_groups(
        lambda t: _support_cell_kernel(t, B), batch_format="pyarrow")
    return bucketed_agg(per_cell, ["ea", "eb"], {"sup": ("sup", "sum")})


def ktruss(edges_ds, k: int, n_buckets: int | None = None,
           max_rounds: int = 1000):
    """→ (a, b) Dataset of the k-truss's surviving undirected edges
    (canonical a < b in the bit-cast int64 id space, matching the triangle
    pipeline's convention; empty for k > max cohesion). k ≥ 3 peels; k ≤ 2
    returns the deduped simple graph unchanged (every edge is trivially in
    a 2-truss). Reference anchor: the same peeling discipline as k-core
    (graph_analytics/kcore.cpp) lifted from vertices to edges."""
    cur = _canonical_dedup(edges_ds).materialize()
    if k <= 2:
        return cur
    m = cur.count()
    if m <= SMALL_EDGES:
        import ray.data

        return ray.data.from_arrow_refs(
            [_ktruss_local_task.remote(k, max_rounds, *cur.to_arrow_refs())])
    for _ in range(max_rounds):
        if m == 0:
            return cur
        sup = edge_support(cur, n_buckets)

        def keep(t: pa.Table) -> pa.Table:
            s = np.asarray(t["sup"])
            good = s >= (k - 2)
            return pa.table({"a": pa.array(np.asarray(t["ea"])[good]),
                             "b": pa.array(np.asarray(t["eb"])[good])})

        # edges on zero triangles have no support row and drop implicitly
        nxt = sup.map_batches(keep, batch_format="pyarrow").materialize()
        n2 = nxt.count()
        if n2 == m:
            return nxt
        cur, m = nxt, n2
    raise RuntimeError(f"ktruss did not converge in {max_rounds} rounds")


def edge_jaccard(edges_ds, n_buckets: int | None = None, _canon_ds=None):
    """→ (ea, eb, jac) Dataset: neighbor-set Jaccard similarity of each
    edge's endpoints over the simple undirected graph —
    ``J(a,b) = |N(a)∩N(b)| / (deg(a)−1 + deg(b)−1 − |N(a)∩N(b)|)`` — the
    link-level similarity used for graph sparsification / local community
    strength (Satuluri et al. 2011). Emitted only for edges on ≥ 1 triangle
    (every other edge has J = 0 exactly). One edge_support grid pass +
    one degree broadcast; |N(a)∩N(b)| IS the edge's triangle support."""
    from ..ids import round_half_away

    canon = (_canon_ds if _canon_ds is not None
             else _canonical_dedup(edges_ds).materialize())
    sup = edge_support(canon, n_buckets)
    deg_ds = _canon_degrees(canon).materialize()
    deg_ref = _degree_arrays.remote(*deg_ds.to_arrow_refs())

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ea": pa.array([], pa.int64()),
                             "eb": pa.array([], pa.int64()),
                             "jac": pa.array([], pa.float64())})
        v, d = ray.get(deg_ref)
        ea = np.asarray(t["ea"]).astype(np.int64, copy=False)
        eb = np.asarray(t["eb"]).astype(np.int64, copy=False)
        s = np.asarray(t["sup"]).astype(np.float64, copy=False)
        da = d[np.searchsorted(v, ea)].astype(np.float64)
        db = d[np.searchsorted(v, eb)].astype(np.float64)
        jac = round_half_away(s / (da - 1.0 + db - 1.0 - s), 6)
        return pa.table({"ea": pa.array(ea), "eb": pa.array(eb),
                         "jac": pa.array(jac)})

    return sup.map_batches(score, batch_format="pyarrow")


def local_sparsify(edges_ds, e: float = 0.5, n_buckets: int = 64):
    """Local graph sparsification (Satuluri, Parthasarathy & Ruan 2011):
    each vertex keeps its top-⌈deg^e⌉ incident edges ranked by endpoint
    Jaccard similarity (``edge_jaccard``; edges on no triangle rank with
    J = 0); an edge survives if EITHER endpoint keeps it — the
    similarity-preserving pre-filter that cuts community-detection input
    size while retaining intra-cluster edges. Deterministic order:
    (jac DESC, neighbor vid ASC) on the 6-dp-rounded similarity both
    engines compute identically. → (a, b, jac) Dataset, canonical a < b.

    Scale shape: jac values fold onto the canonical pairs with ONE
    bucketed max-merge (triangle-free edges never produce a jac row), the
    per-vertex top-k runs inside coarse hash buckets (a vertex's incident
    rows co-locate), and the surviving set dedups with one more bucketed
    count — no broadcast, no driver state."""
    import pandas as pd

    from ..ids import integer_mix
    from ..stages.agg import bucketed_agg

    canon = _canonical_dedup(edges_ds).materialize()
    jac = edge_jaccard(edges_ds, _canon_ds=canon)  # one dedup shuffle, shared

    def zero_rows(t: pa.Table) -> pa.Table:
        if "a" not in t.schema.names:
            return pa.table({"ea": pa.array([], pa.int64()),
                             "eb": pa.array([], pa.int64()),
                             "jac": pa.array([], pa.float64())})
        # RE-orient into int64 min/max order — the triangle kernel's (ea,
        # eb) convention. _canonical_dedup orients on TRUE uint64 order,
        # which disagrees for pairs crossing the 2^63 bit-cast boundary
        # (hashed-identity graphs); without this the two row families
        # carry different keys and the max-merge keeps both.
        a = np.asarray(t["a"], np.int64)
        b = np.asarray(t["b"], np.int64)
        return pa.table({"ea": pa.array(np.minimum(a, b)),
                         "eb": pa.array(np.maximum(a, b)),
                         "jac": pa.array(np.zeros(t.num_rows, np.float64))})

    merged = bucketed_agg(
        jac.union(canon.map_batches(zero_rows, batch_format="pyarrow")),
        ["ea", "eb"], {"jac": ("jac", "max")})

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df["ea"].to_numpy(np.int64)
        b = df["eb"].to_numpy(np.int64)
        j = df["jac"].to_numpy(np.float64)
        v = np.r_[a, b]
        return pd.DataFrame({
            "_bkt": (integer_mix(v.view(np.uint64))
                     % np.uint64(n_buckets)).astype(np.int64),
            "v": v, "nbr": np.r_[b, a], "jac": np.r_[j, j]})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy(np.int64)
        nbr = g["nbr"].to_numpy(np.int64)
        j = g["jac"].to_numpy(np.float64)
        order = np.lexsort((nbr, -j, v))
        vs = v[order]
        starts = np.r_[0, np.flatnonzero(np.diff(vs)) + 1]
        deg = np.diff(np.r_[starts, len(vs)])
        rank = np.arange(len(vs)) - np.repeat(starts, deg)
        keep_n = np.ceil(deg.astype(np.float64) ** e)
        kept = rank < np.repeat(keep_n, deg)
        a2 = np.minimum(vs[kept], nbr[order][kept])
        b2 = np.maximum(vs[kept], nbr[order][kept])
        return pd.DataFrame({"a": a2, "b": b2, "jac": j[order][kept]})

    kept = (merged.map_batches(orient, batch_format="pandas")
            .groupby("_bkt").map_groups(topk, batch_format="pandas"))
    return bucketed_agg(kept, ["a", "b"], {"jac": ("jac", "max")})
