"""Graph-wide relational operators (SURVEY.md §2.3): transform / map-reduce /
fold / select / vertex-set algebra / neighbors — the reference's
distributed_graph.hpp:967-1650, 2459-2560 surface, Dataset-first.

The vertex table is an ordinary ``ray.data.Dataset`` (``vid`` + value
columns); every operator is a ``map_batches`` / ``filter`` / aggregate over
it, so these compose with the rest of the engine's pipelines. Vertex *sets*
are represented as sorted numpy vid arrays broadcast via ``ray.put`` (the
distributed bitset of vertex_set.hpp re-expressed; at 10^12 vertices these
become vid-range bitmap shards — same operators, sharded lookup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .gas import Graph


def vertex_table(g: Graph, values: dict[str, np.ndarray] | None = None):
    """Graph → vertex Dataset (vid, out_deg, in_deg [+ value columns]).

    Without ``values`` the blocks are built by tasks straight from the
    plasma-backed vid/degree refs (no driver O(nv)); with driver-side value
    arrays the legacy single-table path applies."""
    if values is None:
        from .gas import vertex_table_dataset

        return vertex_table_dataset(g)
    cols = {"vid": pa.array(g.vids, pa.uint64()),
            "out_deg": pa.array(g.out_deg, pa.int64()),
            "in_deg": pa.array(g.in_deg, pa.int64())}
    for k, v in values.items():
        cols[k] = pa.array(v)
    return ray.data.from_arrow(pa.table(cols))


def edge_table(g: Graph):
    """Graph → edge Dataset read back from the hash-partitioned shards.

    For a ``dedup=True`` graph the raw shards still hold duplicates
    (finalize dedups inside the actors), so the first call dumps the
    already-deduped resident edges once (per-partition Parquet written by
    the actors themselves — no driver traffic, no wide shuffle) and every
    ``edge_table()`` after that reads the cached deduped shards."""
    if g.dedup:
        return ray.data.read_parquet(g.dedup_shard_dir(), columns=["src", "dst"])
    return ray.data.read_parquet(g.parquet_dir, columns=["src", "dst"])


def transform_vertices(vds, fn, vset: np.ndarray | None = None):
    """Pure re-expression of the in-place vertex transform
    (distributed_graph.hpp:1474-1497): ``fn(batch) -> batch`` applied to the
    (optionally vset-restricted) vertex table; rows outside the set pass
    through unchanged."""
    if vset is None:
        return vds.map_batches(fn, batch_format="pyarrow")
    ref = ray.put(np.asarray(vset, np.uint64))

    def guarded(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        vid = np.asarray(t["vid"], np.uint64)
        mask = np.isin(vid, s)
        if not mask.any():
            return t
        changed = fn(t.filter(pa.array(mask)))
        kept = t.filter(pa.array(~mask))
        return pa.concat_tables([kept, changed]).combine_chunks()

    return vds.map_batches(guarded, batch_format="pyarrow")


def transform_edges(g: Graph, values: dict[str, np.ndarray], fn):
    """Edge transform seeing both endpoints' data
    (distributed_graph.hpp:1556-1580): ``fn(src, dst, {name: (src_vals,
    dst_vals)}) -> dict of new edge columns``; endpoint values are broadcast
    once and gathered per batch (the mirror read)."""
    refs = {k: ray.put(v) for k, v in values.items()}
    sv, perm = g._sorted_view()
    lut_ref = ray.put((sv, perm))  # sorted vids + dense perm (None if sorted)

    def per_batch(t: pa.Table) -> pa.Table:
        sv, perm = ray.get(lut_ref)
        src = np.asarray(t["src"], np.uint64)
        dst = np.asarray(t["dst"], np.uint64)
        si = np.searchsorted(sv, src)
        di = np.searchsorted(sv, dst)
        if perm is not None:
            si, di = perm[si], perm[di]
        joined = {k: (ray.get(r)[si], ray.get(r)[di]) for k, r in refs.items()}
        out = fn(src, dst, joined)
        cols = {"src": pa.array(src, pa.uint64()), "dst": pa.array(dst, pa.uint64())}
        cols.update({k: pa.array(v) for k, v in out.items()})
        return pa.table(cols)

    return edge_table(g).map_batches(per_batch, batch_format="pyarrow")


def map_reduce_vertices(vds, map_fn, reduce_fn=None):
    """Global vertex aggregate (distributed_graph.hpp:967-1028): ``map_fn``
    runs per batch inside tasks (vectorized, any picklable monoid value);
    the small per-batch partials are ``+``- (or custom-) reduced in fixed
    order. The same partial/merge split as map_reduce_edges
    (ivertex_program.hpp:729-765)."""
    import pickle

    def part(t: pa.Table) -> pa.Table:
        return pa.table({"_p": pa.array([pickle.dumps(map_fn(t))], pa.binary())})

    blobs = vds.map_batches(part, batch_format="pyarrow").to_pandas()["_p"]
    parts = [pickle.loads(b) for b in blobs]
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = reduce_fn(out, p) if reduce_fn is not None else out + p
    return out


def map_reduce_edges(g: Graph, map_fn, reduce_fn=None):
    """Same over the edge table (distributed_graph.hpp:1094-1160; e.g. the
    triangle-count total, undirected_triangle_count.cpp:657)."""
    return map_reduce_vertices(edge_table(g), map_fn, reduce_fn)


def map_reduce_vertices_sum(vds, map_fn) -> float:
    """Common case (e.g. total PageRank mass, pagerank.cpp:257-268):
    per-batch vectorized partial sums, reduced distributedly by the Dataset
    ``sum`` aggregate — no driver-side batch loop."""
    return (vds.map_batches(
        lambda t: pa.table({"_p": pa.array([float(map_fn(t))], pa.float64())}),
        batch_format="pyarrow").sum("_p") or 0.0)


def parallel_for_vertices(vds, fns):
    """k functors striped over the vertices (distributed_graph.hpp:
    1602-1650: ``parallel_for_vertices(vec<fn>)`` runs functor i on its
    stripe): functor i receives the batch slice where ``vid % k == i`` as a
    vectorized sub-table and returns its transformed rows; stripes are
    re-concatenated per batch (pure Dataset-out, like transform_vertices)."""
    k = len(fns)

    def per_batch(t: pa.Table) -> pa.Table:
        vid = np.asarray(t["vid"]).astype(np.uint64, copy=False)
        stripe = (vid % np.uint64(k)).astype(np.int64)
        parts = []
        for i, fn in enumerate(fns):
            m = stripe == i
            if m.any():
                parts.append(fn(t.filter(pa.array(m))))
        # empty batches must still carry the functors' OUTPUT schema, or a
        # dataset mixing empty and non-empty blocks fails on union/consume
        return pa.concat_tables(parts) if parts else fns[0](t.slice(0, 0))

    return vds.map_batches(per_batch, batch_format="pyarrow")


def fold_vertices(vds, fold_fn, init):
    """Sequential-within-batch fold, reduced across batches
    (distributed_graph.hpp:1243-1300)."""
    acc = init
    for b in vds.iter_batches(batch_format="pyarrow"):
        acc = fold_fn(acc, b)
    return acc


# -- vertex sets (vertex_set.hpp) -------------------------------------------

def select(vds, pred) -> np.ndarray:
    """Predicate → sorted vid array (distributed_graph.hpp:2533-2560):
    per-batch vectorized mask, small vid partials unioned."""
    parts = vds.map_batches(
        lambda t: pa.table({"vid": pa.array(
            np.asarray(t["vid"], np.uint64)[pred(t)], pa.uint64())}),
        batch_format="pyarrow").to_pandas()
    return np.unique(parts["vid"].to_numpy().astype(np.uint64))


def vset_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.union1d(a, b)


def vset_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.intersect1d(a, b)


def vset_minus(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.setdiff1d(a, b)


def vset_invert(a: np.ndarray, g: Graph) -> np.ndarray:
    return np.setdiff1d(g.vids, a)


def neighbors(g: Graph, vset: np.ndarray, edir: str = "all") -> np.ndarray:
    """1-hop expansion (distributed_graph.hpp:2471-2489): distinct vertices
    adjacent to the set via in/out/all edges; per-batch unique partials."""
    ref = ray.put(np.asarray(vset, np.uint64))

    def expand(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        src = np.asarray(t["src"], np.uint64)
        dst = np.asarray(t["dst"], np.uint64)
        outs = []
        if edir in ("out", "all"):
            outs.append(dst[np.isin(src, s)])
        if edir in ("in", "all"):
            outs.append(src[np.isin(dst, s)])
        nb = np.unique(np.concatenate(outs)) if outs else np.empty(0, np.uint64)
        return pa.table({"vid": pa.array(nb, pa.uint64())})

    parts = edge_table(g).map_batches(expand, batch_format="pyarrow").to_pandas()
    return np.unique(parts["vid"].to_numpy().astype(np.uint64))
