"""Exact triangle counting — the reference's 2-phase vertex programs
(undirected_triangle_count.cpp, directed_triangle_count.cpp) re-expressed as
non-iterative, fully-distributed Dataset pipelines (SURVEY.md §3.3).

Reference semantics reproduced:
- degree-ordered orientation: vertex keeps only neighbors with
  ``(deg, id)`` lexicographically greater (undirected_triangle_count.cpp:
  457-463) — bounds oriented adjacency to O(sqrt(m)) per vertex,
- per-edge count = |N_o(u) ∩ N_o(v)| over the oriented sets (scatter,
  :507-520), total = sum over undirected edges (:656-658; each triangle
  counted exactly once at its lexicographically-lowest edge),
- per-vertex mode: every triangle increments all three corners,
- directed census (directed_triangle_count.cpp:289-334,598-606): per
  directed edge (s,t): ``s_s=|out(s)∩out(t)|``, ``st_st=|in(s)∩in(t)|``,
  ``st_s=|in(s)∩out(t)|``; per-vertex gather (:625-656):
  ``out[s]+=s_s, through[s]+=st_st, cycle[s]+=st_s`` on out-edges and
  ``in[t]+=st_st`` on in-edges,
- input contract: each undirected edge appears once; callers dedup first
  (:603-605 documents over-counting otherwise) — we dedup distributedly.

Physical plan (the 2D "bucketed grid" self-join — no driver-side edge
materialization, no per-edge Python loops):

1. canonicalize+dedup → distinct pairs (distributed groupby),
2. degree table (partial-agg groupby) → compact (vids, deg) arrays built in
   a REMOTE task and broadcast once via the object store (O(nv), the same
   dense-vertex-state ceiling the GAS engine documents — NOT O(m)),
3. orient each edge lower-(deg,vid) → higher in ``map_batches``; assign the
   query edge to grid cell ``(hash(u)%B, hash(v)%B)`` and replicate the
   oriented adjacency entry to its row + column (2B−1 of B² cells),
4. ``groupby(cell).map_groups``: per cell, a fully vectorized
   expansion-and-membership kernel (searchsorted over locally-densified
   composite keys) counts the intersections; per-vertex corner increments
   are partial-aggregated before the final ``groupby(vid).sum``.

Scale contract: total exchange is O((2B−1)·m) rows, per-cell memory is
O(m/B² + 2m/B); choose B so a cell's adjacency slice fits a worker
(``_auto_buckets``). The driver never holds edges; the only O(nv) object is
the broadcast degree array (step 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..ids import integer_mix
from ..stages.agg import bucketed_agg

# max expansion elements materialized at once inside a cell kernel
_EXPANSION_CAP = 1 << 22
# auto bucket sizing: per-cell adjacency ≈ 2m/B rows; keep it ≤ ~25M rows
_ROWS_PER_CELL = 25_000_000


def _is_uint64(edges_ds) -> bool:
    try:
        return edges_ds.schema().base_schema.field("src").type == pa.uint64()
    except Exception:
        return False


def _auto_buckets(m: int) -> int:
    return int(max(2, min(64, -(-m // _ROWS_PER_CELL) + 1)))


def _canonical_dedup(edges_ds, as_uint64: bool | None = None):
    """(src,dst) → undirected canonical (a<b) distinct pairs, self-edges
    dropped. Full-range uint64 ids (hashed identities) are bit-cast to int64
    for the shuffle — Ray's sort-aggregate overflows C long on raw uint64
    keys ≥ 2^63 — and bit-cast back by the public emitters; the canonical
    min/max is taken on the TRUE uint64 order before the cast."""
    if as_uint64 is None:
        as_uint64 = _is_uint64(edges_ds)

    def canon(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"])
        dst = np.asarray(t["dst"])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        if a.dtype == np.uint64:
            a, b = a.view(np.int64), b.view(np.int64)
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"a": pa.array(uniq[:, 0]), "b": pa.array(uniq[:, 1])})

    ds = edges_ds.map_batches(canon, batch_format="pyarrow")

    # global dedup as a bucketed vectorized distinct (stages/agg.py) — the
    # built-in sort-aggregate runs per-row Python in AggregateMap
    return bucketed_agg(ds, ["a", "b"], {"_n": (None, "count")}) \
        .select_columns(["a", "b"])


def _directed_dedup(edges_ds, as_uint64: bool | None = None):
    """Distinct directed edges (self-edges dropped), uint64 bit-cast int64."""
    if as_uint64 is None:
        as_uint64 = _is_uint64(edges_ds)

    def canon(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"])
        dst = np.asarray(t["dst"])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        if src.dtype == np.uint64:
            src, dst = src.view(np.int64), dst.view(np.int64)
        uniq = np.unique(np.stack([src, dst], axis=1), axis=0)
        return pa.table({"s": pa.array(uniq[:, 0]), "d": pa.array(uniq[:, 1])})

    ds = edges_ds.map_batches(canon, batch_format="pyarrow")
    return bucketed_agg(ds, ["s", "d"], {"_n": (None, "count")}) \
        .select_columns(["s", "d"])


# ---------------------------------------------------------------------------
# degree broadcast (built in a remote task; the driver holds only the ref)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=1)
def _degree_arrays(*tables):
    # groupby-aggregate can emit zero-column placeholder blocks — drop them
    tables = [t for t in tables if t.num_columns]
    if not tables:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pa.concat_tables(list(tables))
    v = np.asarray(t["vid"]).astype(np.int64, copy=False)
    d = np.asarray(t["deg"]).astype(np.int64, copy=False)
    o = np.argsort(v, kind="stable")
    return v[o], d[o]


def _canon_degrees(canon_ds):
    """(a,b) distinct pairs → (vid, deg) Dataset via partial-agg groupby."""
    def part(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            np.concatenate([np.asarray(t["a"]), np.asarray(t["b"])]),
            return_counts=True)
        return pa.table({"vid": pa.array(v.astype(np.int64, copy=False)),
                         "cnt": pa.array(c.astype(np.int64))})

    return bucketed_agg(canon_ds.map_batches(part, batch_format="pyarrow"),
                        ["vid"], {"deg": ("cnt", "sum")})


def _bucket(v: np.ndarray, B: int) -> np.ndarray:
    """Deterministic vertex→bucket hash (graph_hash-style mix)."""
    return (integer_mix(v.view(np.uint64)) % np.uint64(B)).astype(np.int64)


def _rowcol_cells(c: np.ndarray, B: int):
    """Cells of row c ∪ column c (2B−1 distinct per entry) →
    (flat cell ids, source-row selector)."""
    n = len(c)
    jj = np.arange(B, dtype=np.int64)
    row = (c[:, None] * B + jj[None, :]).ravel()
    colm = (jj[None, :] != c[:, None]).ravel()
    col = (jj[None, :] * B + c[:, None]).ravel()[colm]
    idx_row = np.repeat(np.arange(n, dtype=np.int64), B)
    idx = np.concatenate([idx_row, idx_row[colm]])
    return np.concatenate([row, col]), idx


class _OrientEmit:
    """Actor-pool stage: orient canonical edges by the broadcast (deg, vid)
    order (fetched once per actor) and emit the grid rows: one query row per
    edge + 2B−1 adjacency copies (its row and column of the B×B grid)."""

    def __init__(self, deg_ref, B: int) -> None:
        self.vids, self.deg = ray.get(deg_ref)
        self.B = B

    def __call__(self, t: pa.Table) -> pa.Table:
        B = self.B
        a = np.asarray(t["a"]).astype(np.int64, copy=False)
        b = np.asarray(t["b"]).astype(np.int64, copy=False)
        da = self.deg[np.searchsorted(self.vids, a)]
        db = self.deg[np.searchsorted(self.vids, b)]
        first = (da < db) | ((da == db) & (a < b))
        u = np.where(first, a, b)
        v = np.where(first, b, a)
        cu = _bucket(u, B)
        cv = _bucket(v, B)
        cells_a, idx = _rowcol_cells(cu, B)
        ne, na = len(u), len(cells_a)
        return pa.table({
            "cell": pa.array(np.concatenate([cu * B + cv, cells_a])),
            "role": pa.array(np.concatenate(
                [np.zeros(ne, np.int8), np.ones(na, np.int8)])),
            "x": pa.array(np.concatenate([u, u[idx]])),
            "y": pa.array(np.concatenate([v, v[idx]])),
        })


def _chunked_expansion(starts: np.ndarray, ends: np.ndarray, cap: int):
    """Yield (rep, pos): rep = query index per expansion element (global),
    pos = index into the sorted adjacency value array; bounded to ≤ cap
    elements per chunk."""
    d = (ends - starts).astype(np.int64)
    cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(d)])
    nq = len(d)
    s0 = 0
    while s0 < nq:
        s1 = int(np.searchsorted(cum, cum[s0] + cap, side="right")) - 1
        s1 = min(max(s1, s0 + 1), nq)
        dd = d[s0:s1]
        tot = int(dd.sum())
        if tot:
            rep = np.repeat(np.arange(s0, s1, dtype=np.int64), dd)
            base = np.repeat(starts[s0:s1] - (cum[s0:s1] - cum[s0]), dd)
            yield rep, np.arange(tot, dtype=np.int64) + base
        s0 = s1


def _sorted_pairs(x: np.ndarray, y: np.ndarray):
    o = np.lexsort((y, x))
    return x[o], y[o]


_EMPTY_PV = pa.table({"vid": pa.array([], pa.int64()),
                      "n_tri": pa.array([], pa.int64())})


def _und_cell_kernel(t: pa.Table, B: int, per_vertex: bool) -> pa.Table:
    """Per-cell vectorized intersection counting (count_set_intersect,
    undirected_triangle_count.cpp:29-68, batched): expand w ∈ N_o(u) for
    each query edge (u,v), test (v,w) membership in the column adjacency
    via searchsorted over locally-densified composite keys."""
    zero = pa.table({"n": pa.array([0], pa.int64())})
    role = np.asarray(t["role"])
    x = np.asarray(t["x"])
    y = np.asarray(t["y"])
    cell = int(t["cell"][0].as_py())
    i, j = divmod(cell, B)
    qm = role == 0
    qu, qv = x[qm], y[qm]
    ax, ay = x[~qm], y[~qm]
    if len(qu) == 0 or len(ax) == 0:
        return _EMPTY_PV if per_vertex else zero
    h = _bucket(ax, B)
    rx, ry = _sorted_pairs(ax[h == i], ay[h == i])     # expansion (lists of u)
    cx, cy = ax[h == j], ay[h == j]                    # membership (lists of v)
    if len(rx) == 0 or len(cx) == 0:
        return _EMPTY_PV if per_vertex else zero
    univ = np.unique(np.concatenate([qv, cx, cy, ry]))
    n = np.int64(len(univ))
    ckey = np.sort(np.searchsorted(univ, cx).astype(np.int64) * n
                   + np.searchsorted(univ, cy))
    qvl = np.searchsorted(univ, qv).astype(np.int64)
    ryl = np.searchsorted(univ, ry).astype(np.int64)
    starts = np.searchsorted(rx, qu, "left")
    ends = np.searchsorted(rx, qu, "right")
    total = 0
    pv_ids: list[np.ndarray] = []
    pv_cnt: list[np.ndarray] = []
    for rep, pos in _chunked_expansion(starts, ends, _EXPANSION_CAP):
        keys = qvl[rep] * n + ryl[pos]
        p = np.searchsorted(ckey, keys)
        m = (p < len(ckey)) & (ckey[np.minimum(p, len(ckey) - 1)] == keys)
        if per_vertex:
            mrep = rep[m]
            if len(mrep):
                vids = np.concatenate([qu[mrep], qv[mrep], ry[pos[m]]])
                uu, cc = np.unique(vids, return_counts=True)
                pv_ids.append(uu)
                pv_cnt.append(cc.astype(np.int64))
        else:
            total += int(m.sum())
    if not per_vertex:
        return pa.table({"n": pa.array([total], pa.int64())})
    if not pv_ids:
        return _EMPTY_PV
    vv = np.concatenate(pv_ids)
    cc = np.concatenate(pv_cnt)
    uu, inv = np.unique(vv, return_inverse=True)
    out = np.zeros(len(uu), np.int64)
    np.add.at(out, inv, cc)
    return pa.table({"vid": pa.array(uu), "n_tri": pa.array(out)})


def _und_grid(edges_ds, n_buckets: int | None):
    """canon dedup → (grid Dataset, degree Dataset, B); grid is None when
    the graph has no edges."""
    canon = _canonical_dedup(edges_ds).materialize()
    m = canon.count()
    if m == 0:
        return None, None, 0
    B = n_buckets or _auto_buckets(m)
    deg_ds = _canon_degrees(canon).materialize()
    deg_ref = _degree_arrays.remote(*deg_ds.to_arrow_refs())
    grid = canon.map_batches(_OrientEmit, batch_format="pyarrow",
                             fn_constructor_args=(deg_ref, B),
                             concurrency=(1, 8))
    return grid, deg_ds, B


def triangle_total(edges_ds, n_buckets: int | None = None) -> int:
    """Exact global triangle count."""
    grid, _, B = _und_grid(edges_ds, n_buckets)
    if grid is None:
        return 0
    out = grid.groupby("cell").map_groups(
        lambda t: _und_cell_kernel(t, B, False), batch_format="pyarrow")
    return int(out.sum("n") or 0)


def triangle_per_vertex(edges_ds, n_buckets: int | None = None):
    """Per-vertex exact triangle counts → Dataset (vid, n_tri) including
    zero-triangle vertices (writer shape of undirected_triangle_count.cpp:
    578-588). uint64-id inputs come back as uint64 vids."""
    as_u64 = _is_uint64(edges_ds)
    grid, deg_ds, B = _und_grid(edges_ds, n_buckets)
    if grid is None:
        empty = pa.table({"vid": pa.array([], pa.uint64() if as_u64 else pa.int64()),
                          "n_tri": pa.array([], pa.int64())})
        return ray.data.from_arrow(empty)
    contrib = grid.groupby("cell").map_groups(
        lambda t: _und_cell_kernel(t, B, True), batch_format="pyarrow")
    zeros = deg_ds.map_batches(
        lambda t: pa.table({"vid": t["vid"],
                            "n_tri": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow")
    out = bucketed_agg(contrib.union(zeros), ["vid"],
                       {"n_tri": ("n_tri", "sum")})
    if as_u64:
        # restore the true uint64 ids from the shuffle's int64 bit-cast
        out = out.map_batches(
            lambda t: pa.table({
                "vid": pa.array(np.asarray(t["vid"], np.int64).view(np.uint64),
                                pa.uint64()),
                "n_tri": t["n_tri"]}),
            batch_format="pyarrow")
    return out


# ---------------------------------------------------------------------------
# directed triangle census (directed_triangle_count.cpp): per-edge closure
# counts s_s / st_st / st_s over the distinct directed edge set, gathered
# per vertex as in/out/through/cycle
# ---------------------------------------------------------------------------

def _dir_grid_emit(t: pa.Table, B: int) -> pa.Table:
    """Directed grid rows: query (s,t) → cell (h(s), h(t)); each edge also
    contributes an out-list entry for s and an in-list entry for t, each
    replicated to its owner's row (expansion) + column (membership)."""
    s = np.asarray(t["s"]).astype(np.int64, copy=False)
    d = np.asarray(t["d"]).astype(np.int64, copy=False)
    hs = _bucket(s, B)
    hd = _bucket(d, B)
    cells_o, idx_o = _rowcol_cells(hs, B)
    cells_i, idx_i = _rowcol_cells(hd, B)
    ne = len(s)
    return pa.table({
        "cell": pa.array(np.concatenate([hs * B + hd, cells_o, cells_i])),
        "role": pa.array(np.concatenate([
            np.zeros(ne, np.int8),
            np.full(len(cells_o), 1, np.int8),     # out-entry: own=s, nbr=d
            np.full(len(cells_i), 2, np.int8),     # in-entry:  own=d, nbr=s
        ])),
        "x": pa.array(np.concatenate([s, s[idx_o], d[idx_i]])),
        "y": pa.array(np.concatenate([d, d[idx_o], s[idx_i]])),
    })


_EMPTY_CENSUS = pa.table({
    "vid": pa.array([], pa.int64()),
    "in_tri": pa.array([], pa.int64()),
    "out_tri": pa.array([], pa.int64()),
    "through_tri": pa.array([], pa.int64()),
    "cycle_tri": pa.array([], pa.int64()),
})


def _dir_cell_kernel(t: pa.Table, B: int, per_vertex: bool) -> pa.Table:
    """Per-cell directed closure counts. For each query edge (s,t):
    s_s via out(s)-expansion vs OUT membership; st_st and st_s via
    in(s)-expansion vs IN / OUT membership (directed_triangle_count.cpp:
    598-606)."""
    zero = pa.table({"n_trans": pa.array([0], pa.int64()),
                     "n_cyc_inst": pa.array([0], pa.int64())})
    role = np.asarray(t["role"])
    x = np.asarray(t["x"])
    y = np.asarray(t["y"])
    cell = int(t["cell"][0].as_py())
    i, j = divmod(cell, B)
    qm = role == 0
    qs, qt = x[qm], y[qm]
    if len(qs) == 0:
        return _EMPTY_CENSUS if per_vertex else zero
    h = _bucket(x, B)
    rowm = (h == i) & ~qm
    colm = (h == j) & ~qm
    ox, oy = _sorted_pairs(x[rowm & (role == 1)], y[rowm & (role == 1)])
    ix, iy = _sorted_pairs(x[rowm & (role == 2)], y[rowm & (role == 2)])
    mox, moy = x[colm & (role == 1)], y[colm & (role == 1)]
    mix_, miy = x[colm & (role == 2)], y[colm & (role == 2)]
    univ = np.unique(np.concatenate([qt, oy, iy, mox, moy, mix_, miy]))
    n = np.int64(len(univ))

    def keyset(px, py):
        return np.sort(np.searchsorted(univ, px).astype(np.int64) * n
                       + np.searchsorted(univ, py))

    okey = keyset(mox, moy)
    ikey = keyset(mix_, miy)
    qtl = np.searchsorted(univ, qt).astype(np.int64)

    def matches(rep, keys, kset):
        if len(kset) == 0:
            return np.zeros(len(keys), bool)
        p = np.searchsorted(kset, keys)
        return kset[np.minimum(p, len(kset) - 1)] == keys

    n_trans = 0
    n_cyc = 0
    cat_v: list[np.ndarray] = []
    cat_c: list[np.ndarray] = []

    def add(vids, cat):
        if len(vids):
            cat_v.append(vids)
            cat_c.append(np.full(len(vids), cat, np.int64))

    # out(s) expansion → s_s
    if len(ox):
        oyl = np.searchsorted(univ, oy).astype(np.int64)
        st = np.searchsorted(ox, qs, "left")
        en = np.searchsorted(ox, qs, "right")
        for rep, pos in _chunked_expansion(st, en, _EXPANSION_CAP):
            m = matches(rep, qtl[rep] * n + oyl[pos], okey)
            if per_vertex:
                add(qs[rep[m]], 1)                     # out[s] += s_s
            else:
                n_trans += int(m.sum())
    # in(s) expansion → st_st (IN) and st_s (OUT)
    if len(ix):
        iyl = np.searchsorted(univ, iy).astype(np.int64)
        st = np.searchsorted(ix, qs, "left")
        en = np.searchsorted(ix, qs, "right")
        for rep, pos in _chunked_expansion(st, en, _EXPANSION_CAP):
            keys = qtl[rep] * n + iyl[pos]
            m_in = matches(rep, keys, ikey)
            m_out = matches(rep, keys, okey)
            if per_vertex:
                add(qs[rep[m_in]], 2)                  # through[s] += st_st
                add(qt[rep[m_in]], 0)                  # in[t]     += st_st
                add(qs[rep[m_out]], 3)                 # cycle[s]  += st_s
            else:
                n_cyc += int(m_out.sum())
    if not per_vertex:
        return pa.table({"n_trans": pa.array([n_trans], pa.int64()),
                         "n_cyc_inst": pa.array([n_cyc], pa.int64())})
    if not cat_v:
        return _EMPTY_CENSUS
    vv = np.concatenate(cat_v)
    cc = np.concatenate(cat_c)
    uu, inv = np.unique(vv, return_inverse=True)
    mat = np.zeros((len(uu), 4), np.int64)
    np.add.at(mat, (inv, cc), 1)
    return pa.table({
        "vid": pa.array(uu),
        "in_tri": pa.array(mat[:, 0]),
        "out_tri": pa.array(mat[:, 1]),
        "through_tri": pa.array(mat[:, 2]),
        "cycle_tri": pa.array(mat[:, 3]),
    })


def _dir_grid(edges_ds, n_buckets: int | None):
    de = _directed_dedup(edges_ds).materialize()
    m = de.count()
    if m == 0:
        return None, None, 0
    B = n_buckets or _auto_buckets(m)
    grid = de.map_batches(lambda t: _dir_grid_emit(t, B), batch_format="pyarrow")
    return grid, de, B


def directed_triangle_counts(edges_ds, n_buckets: int | None = None):
    """→ one-row DataFrame (n_trans, n_cycle): global transitive- and
    cycle-triangle counts over the distinct directed edge set
    (each cycle is found at each of its 3 edges → divide once)."""
    import pandas as pd

    grid, _, B = _dir_grid(edges_ds, n_buckets)
    if grid is None:
        return pd.DataFrame({"n_trans": [0], "n_cycle": [0]})
    out = grid.groupby("cell").map_groups(
        lambda t: _dir_cell_kernel(t, B, False), batch_format="pyarrow")
    agg = out.sum(["n_trans", "n_cyc_inst"])
    return pd.DataFrame({"n_trans": [int(agg["sum(n_trans)"])],
                         "n_cycle": [int(agg["sum(n_cyc_inst)"]) // 3]})


def directed_triangle_census(edges_ds, n_buckets: int | None = None):
    """Per-vertex directed triangle census → Dataset
    (vid, in_tri, out_tri, through_tri, cycle_tri, out_deg, in_deg) —
    the writer shape of directed_triangle_count.cpp:670-690 (n_followed /
    n_following are the out/in degrees it appends). Covers every vertex,
    zeros included. uint64-id inputs come back as uint64 vids."""
    as_u64 = _is_uint64(edges_ds)
    grid, de, B = _dir_grid(edges_ds, n_buckets)
    tri_cols = ["in_tri", "out_tri", "through_tri", "cycle_tri"]
    if grid is None:
        empty = pa.table({"vid": pa.array([], pa.uint64() if as_u64 else pa.int64()),
                          **{c: pa.array([], pa.int64())
                             for c in tri_cols + ["out_deg", "in_deg"]}})
        return ray.data.from_arrow(empty)
    parts = grid.groupby("cell").map_groups(
        lambda t: _dir_cell_kernel(t, B, True), batch_format="pyarrow")

    def pad_deg(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), np.int64)
        return t.append_column("out_deg", pa.array(z)).append_column(
            "in_deg", pa.array(z))

    def deg_rows(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"])
        d = np.asarray(t["d"])
        us, cs = np.unique(s, return_counts=True)
        ud, cd = np.unique(d, return_counts=True)
        vids = np.concatenate([us, ud])
        z = np.zeros(len(vids), np.int64)
        return pa.table({
            "vid": pa.array(vids),
            **{c: pa.array(z) for c in tri_cols},
            "out_deg": pa.array(np.concatenate(
                [cs.astype(np.int64), np.zeros(len(ud), np.int64)])),
            "in_deg": pa.array(np.concatenate(
                [np.zeros(len(us), np.int64), cd.astype(np.int64)])),
        })

    zeros = de.map_batches(deg_rows, batch_format="pyarrow")
    cols = tri_cols + ["out_deg", "in_deg"]
    out = bucketed_agg(parts.map_batches(pad_deg, batch_format="pyarrow")
                       .union(zeros),
                       ["vid"], {c: (c, "sum") for c in cols})
    if as_u64:
        out = out.map_batches(
            lambda t: pa.table({
                "vid": pa.array(np.asarray(t["vid"], np.int64).view(np.uint64),
                                pa.uint64()),
                **{c: t[c] for c in cols}}),
            batch_format="pyarrow")
    return out
