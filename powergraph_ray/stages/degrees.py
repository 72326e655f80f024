"""Degree tables — the reference computes per-vertex in/out degrees during
ingress negotiation (distributed_ingress_base.hpp:86-109, summed per mirror);
here it is a partial-aggregated groupby over the edge Dataset.

The ``map_batches`` pre-aggregation (one row per distinct vid per batch)
means the wide ``groupby(vid)`` shuffle moves O(distinct vids) rows, not
O(edges) — the partial/final split of SURVEY.md §2.7.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .agg import bucketed_agg


def _partial_degrees(t: pa.Table) -> pa.Table:
    # dtype-preserving (uint64 hashed ids must not wrap through int64)
    src = np.asarray(t["src"])
    dst = np.asarray(t["dst"])
    vids = np.unique(np.concatenate([src, dst]))
    out_c = np.zeros(len(vids), np.int64)
    in_c = np.zeros(len(vids), np.int64)
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    np.add.at(out_c, si, 1)
    np.add.at(in_c, di, 1)
    return pa.table({
        "vid": pa.array(vids),
        "out_deg": pa.array(out_c, pa.int64()),
        "in_deg": pa.array(in_c, pa.int64()),
    })


def degree_table(edges_ds):
    """Edge Dataset (src,dst) → (vid, out_deg, in_deg, deg) Dataset.

    uint64 ids ride the shuffle as int64 bit-casts (Ray's sort-aggregate
    overflows C long on raw uint64 keys ≥ 2^63) and are restored on emit."""
    try:
        as_u64 = edges_ds.schema().base_schema.field("src").type == pa.uint64()
    except Exception:
        as_u64 = False
    if as_u64:
        edges_ds = edges_ds.map_batches(
            lambda t: pa.table({
                "src": pa.array(np.asarray(t["src"], np.uint64).view(np.int64)),
                "dst": pa.array(np.asarray(t["dst"], np.uint64).view(np.int64))}),
            batch_format="pyarrow")
    partial = edges_ds.map_batches(_partial_degrees, batch_format="pyarrow")
    agg = bucketed_agg(partial, ["vid"], {"out_deg": ("out_deg", "sum"),
                                          "in_deg": ("in_deg", "sum")})

    def total(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.append_column("deg", pc.add(t["out_deg"], t["in_deg"]))
        if as_u64:
            t = t.set_column(t.schema.get_field_index("vid"), "vid",
                             pa.array(np.asarray(t["vid"], np.int64).view(np.uint64),
                                      pa.uint64()))
        return t

    return agg.map_batches(total, batch_format="pyarrow")


def degree_top_k(edges_ds, k: int):
    """Top-k by (deg DESC, vid ASC) — the max-degree-vertex selection pattern
    of sssp.cpp:185-201 generalized. Partial top-k per block first (exact:
    vid-unique rows give a total order, so the global top-k is contained in
    the union of per-block top-ks), then the final sort+limit runs over
    blocks×k rows instead of |V|."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["deg", "vid"],
                                       ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (degree_table(edges_ds).map_batches(partial, batch_format="pyarrow")
            .sort(["deg", "vid"], descending=[True, False]).limit(k))


def degree_histogram(edges_ds):
    """Grouped histogram: (deg, n_vertices) — the ``size_counter`` aggregate
    shape of connected_component_stats.cpp:65-90."""
    return (bucketed_agg(degree_table(edges_ds), ["deg"],
                         {"n_vertices": (None, "count")})
            .sort("deg"))
