"""Exact undirected triangle counting — the reference's 2-phase vertex
program (undirected_triangle_count.cpp) re-expressed as a non-iterative
Dataset join pipeline (SURVEY.md §3.3).

Reference semantics reproduced:
- degree-ordered orientation: vertex keeps only neighbors with
  ``(deg, id)`` lexicographically greater (undirected_triangle_count.cpp:
  457-463) — bounds oriented adjacency to O(sqrt(m)) per vertex,
- per-edge count = |N_o(u) ∩ N_o(v)| over the oriented sets (scatter,
  :507-520), total = sum over undirected edges (:656-658; each triangle
  counted exactly once at its lexicographically-lowest edge),
- per-vertex mode: every triangle increments all three corners
  (:529-563 computes it as adjacent-edge sums / 2; we emit corner
  increments directly — same counts),
- input contract: each undirected edge appears once; callers dedup first
  (:603-605 documents over-counting otherwise).

Physical plan: canonicalize+dedup (groupby) → degree table (partial-agg
groupby) → broadcast (deg,vid)-order ranks → orient in map_batches →
oriented adjacency CSR broadcast via ray.put → per-edge intersection counts
in map_batches → global sum / per-vertex groupby-sum.

Scale note: the broadcast adjacency is O(E) in the object store (read
zero-copy by every task). At 100 TB the same plan becomes a bucketed
self-join: hash vertices into B buckets, replicate oriented edges to the
(bucket(u), bucket(v)) grid, and intersect per bucket-pair — the documented
partitioning assumption (each bucket-pair's adjacency slice fits a worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def _is_uint64(edges_ds) -> bool:
    try:
        return edges_ds.schema().base_schema.field("src").type == pa.uint64()
    except Exception:
        return False


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

    # global dedup as a vectorized shuffle aggregate (groupby-count, result
    # projected back to the key columns) — NOT map_groups(first), which costs
    # one Python call per distinct edge
    from ray.data.aggregate import Count

    deduped = ds.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
    return deduped.select_columns(["a", "b"])


def _adjacency_broadcast(canon_ds):
    """Build the oriented-adjacency CSR on the driver from the (already
    deduped, canonical) edge Dataset and ``ray.put`` it once.

    Orientation key: rank(v) = position of v in (deg, vid) ascending order;
    edge oriented lower-rank → higher-rank.
    """
    # collect canonical edges (distinct pairs — far smaller than raw input)
    parts = [b for b in canon_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    t = pa.concat_tables(parts) if parts else pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    a = np.asarray(t["a"])  # dtype-preserving (uint64 hashed ids)
    b = np.asarray(t["b"])
    vids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a):]
    deg = np.bincount(ai, minlength=len(vids)) + np.bincount(bi, minlength=len(vids))
    # rank by (deg, vid) ascending — vids are sorted already so lexsort works
    order = np.lexsort((vids, deg))
    rank = np.empty(len(vids), np.int64)
    rank[order] = np.arange(len(vids))
    # orient each canonical edge from lower rank to higher rank
    lo = np.where(rank[ai] < rank[bi], ai, bi)
    hi = np.where(rank[ai] < rank[bi], bi, ai)
    # oriented adjacency CSR sorted by (lo, hi)
    o = np.lexsort((hi, lo))
    lo, hi = lo[o], hi[o]
    indptr = np.zeros(len(vids) + 1, np.int64)
    np.add.at(indptr, lo + 1, 1)
    indptr = np.cumsum(indptr)
    return vids, rank, indptr, hi, a, b, ai, bi


class _IntersectCounter:
    """Actor-pool stage: per-edge oriented-set intersections against the
    broadcast CSR (fetched once per actor in __init__)."""

    def __init__(self, csr_ref, per_vertex: bool) -> None:
        self.vids, self.rank, self.indptr, self.adj = ray.get(csr_ref)
        self.per_vertex = per_vertex

    def __call__(self, t: pa.Table) -> pa.Table:
        ai = np.asarray(t["ai"]).astype(np.int64, copy=False)
        bi = np.asarray(t["bi"]).astype(np.int64, copy=False)
        indptr, adj = self.indptr, self.adj
        if not self.per_vertex:
            counts = np.empty(len(ai), np.int64)
            for k in range(len(ai)):
                u, v = ai[k], bi[k]
                nu = adj[indptr[u]:indptr[u + 1]]
                nv = adj[indptr[v]:indptr[v + 1]]
                # sorted-array intersection via merge (count_set_intersect,
                # undirected_triangle_count.cpp:29-68)
                counts[k] = np.intersect1d(nu, nv, assume_unique=True).size
            return pa.table({"n": pa.array([int(counts.sum())], pa.int64())})
        vout, cout = [], []
        for k in range(len(ai)):
            u, v = ai[k], bi[k]
            nu = adj[indptr[u]:indptr[u + 1]]
            nv = adj[indptr[v]:indptr[v + 1]]
            common = np.intersect1d(nu, nv, assume_unique=True)
            if common.size:
                vout.extend((u, v))
                cout.extend((common.size, common.size))
                vout.extend(common.tolist())
                cout.extend([1] * common.size)
        return pa.table({"vi": pa.array(vout, pa.int64()), "n_tri": pa.array(cout, pa.int64())})


def triangle_total(edges_ds) -> int:
    """Exact global triangle count."""
    canon = _canonical_dedup(edges_ds)
    vids, rank, indptr, adj, a, b, ai, bi = _adjacency_broadcast(canon)
    if len(a) == 0:
        return 0
    csr_ref = ray.put((vids, rank, indptr, adj))
    pairs = ray.data.from_arrow(pa.table({"ai": pa.array(ai), "bi": pa.array(bi)}))
    out = pairs.map_batches(_IntersectCounter, batch_format="pyarrow",
                            fn_constructor_args=(csr_ref, False),
                            concurrency=(1, 8), batch_size=8192)
    return int(out.sum("n") or 0)


def triangle_per_vertex(edges_ds):
    """Per-vertex exact triangle counts → Dataset (vid, n_tri) including
    zero-triangle vertices (writer shape of undirected_triangle_count.cpp:
    578-588). uint64-id inputs come back as uint64 vids."""
    as_u64 = _is_uint64(edges_ds)
    canon = _canonical_dedup(edges_ds, as_uint64=as_u64)
    vids, rank, indptr, adj, a, b, ai, bi = _adjacency_broadcast(canon)
    if len(a) == 0:
        return ray.data.from_arrow(pa.table({"vid": pa.array([], pa.int64()),
                                             "n_tri": pa.array([], pa.int64())}))
    csr_ref = ray.put((vids, rank, indptr, adj))
    pairs = ray.data.from_arrow(pa.table({"ai": pa.array(ai), "bi": pa.array(bi)}))
    contrib = pairs.map_batches(_IntersectCounter, batch_format="pyarrow",
                                fn_constructor_args=(csr_ref, True),
                                concurrency=(1, 8), batch_size=8192)
    agg = contrib.groupby("vi").aggregate(Sum("n_tri", alias_name="n_tri"))

    vids_ref = ray.put(vids)

    def to_global(t: pa.Table) -> pa.Table:
        v = ray.get(vids_ref)
        vi = np.asarray(t["vi"]).astype(np.int64, copy=False)
        return pa.table({"vid": pa.array(v[vi]), "n_tri": t["n_tri"]})

    got = agg.map_batches(to_global, batch_format="pyarrow")
    # union with zero rows for vertices in no triangle
    zero = ray.data.from_arrow(pa.table({"vid": pa.array(vids),
                                         "n_tri": pa.array(np.zeros(len(vids), np.int64))}))
    out = (
        got.union(zero)
        .groupby("vid")
        .aggregate(Sum("n_tri", alias_name="n_tri"))
    )
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
# directed triangle counting (directed_triangle_count.cpp): global counts of
# the two directed closure types over the distinct directed edge set
# ---------------------------------------------------------------------------

def _directed_adjacency(edges_ds):
    """Distinct directed edges → dense (out-CSR, in-CSR) + edge arrays."""
    parts = [b for b in edges_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    t = pa.concat_tables(parts) if parts else pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    s = np.asarray(t["src"]).astype(np.int64, copy=False)
    d = np.asarray(t["dst"]).astype(np.int64, copy=False)
    keep = s != d
    e = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
    s, d = e[:, 0], e[:, 1]
    vids, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    si, di = inv[: len(s)], inv[len(s):]
    nv = len(vids)

    def csr(a, b):
        o = np.lexsort((b, a))
        aa, bb = a[o], b[o]
        indptr = np.zeros(nv + 1, np.int64)
        np.add.at(indptr, aa + 1, 1)
        return np.cumsum(indptr), bb

    out_ptr, out_adj = csr(si, di)
    in_ptr, in_adj = csr(di, si)
    return vids, si, di, out_ptr, out_adj, in_ptr, in_adj


class _DirectedCounter:
    """Per-edge (u→v) closure counts against the broadcast directed CSRs:
    trans: w ∈ N_out(u) ∩ N_out(v) (u→v, v→w, u→w — counted once at its
    base edge); cycle: w ∈ N_out(v) ∩ N_in(u) (u→v→w→u — counted at each of
    its 3 edges, divided once at the end)."""

    def __init__(self, ref) -> None:
        (self.out_ptr, self.out_adj, self.in_ptr, self.in_adj) = ray.get(ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        si = np.asarray(t["si"]).astype(np.int64, copy=False)
        di = np.asarray(t["di"]).astype(np.int64, copy=False)
        trans = 0
        cyc = 0
        op, oa, ip, ia = self.out_ptr, self.out_adj, self.in_ptr, self.in_adj
        for k in range(len(si)):
            u, v = si[k], di[k]
            ou = oa[op[u]:op[u + 1]]
            ov = oa[op[v]:op[v + 1]]
            iu = ia[ip[u]:ip[u + 1]]
            trans += np.intersect1d(ou, ov, assume_unique=True).size
            cyc += np.intersect1d(ov, iu, assume_unique=True).size
        return pa.table({"n_trans": pa.array([trans], pa.int64()),
                        "n_cycle3": pa.array([cyc], pa.int64())})


def directed_triangle_counts(edges_ds):
    """→ one-row DataFrame (n_trans, n_cycle): global transitive- and
    cycle-triangle counts over the distinct directed edge set."""
    import pandas as pd

    vids, si, di, out_ptr, out_adj, in_ptr, in_adj = _directed_adjacency(edges_ds)
    if len(si) == 0:
        return pd.DataFrame({"n_trans": [0], "n_cycle": [0]})
    ref = ray.put((out_ptr, out_adj, in_ptr, in_adj))
    pairs = ray.data.from_arrow(pa.table({"si": pa.array(si), "di": pa.array(di)}))
    out = pairs.map_batches(_DirectedCounter, batch_format="pyarrow",
                            fn_constructor_args=(ref,),
                            concurrency=(1, 8), batch_size=8192).to_pandas()
    return pd.DataFrame({"n_trans": [int(out["n_trans"].sum())],
                         "n_cycle": [int(out["n_cycle3"].sum()) // 3]})
