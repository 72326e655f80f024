"""Link prediction over the undirected simple graph: common-neighbor and
Adamic–Adar scores (Adamic & Adar 2003; Liben-Nowell & Kleinberg 2003) for
non-adjacent vertex pairs, exact top-k.

Scale shape (three bucketed shuffles, no broadcast of vertex-sized state):

1. distinct undirected adjacency — the same pair-dedup shuffle as the
   clustering-coefficient query; materialized once (it feeds both the
   wedge expansion and the edge markers — unmaterialized it would
   re-execute per consumer);
2. wedge expansion — adjacency bucketed by CENTER hash so each center's
   neighbor run lands whole in one group; one lexsort per group, then the
   (u, w) pairs among each run's sorted neighbors stream out through the
   triangle machinery's ``_chunked_expansion`` (≤ cap elements per emitted
   chunk — a hub's d² expansion never materializes at once). The center's
   Adamic–Adar term 1/ln(deg) needs NO degree table or join: the run
   length IS the distinct-neighbor degree. The wedge volume Σ deg² is the
   pipeline's fan-in, so the emit is already in the final shuffle layout:
   (u, w, aw, _bkt) with the pair bucket computed in the same pass
   (``bucketed_agg(pre_bucketed=True)`` — no second tag/copy pass over
   the 100M+-row stream), and edge EXCLUSION rides as ``aw = +inf``
   marker rows (pairs whose sum is inf are existing edges and drop) — no
   separate cn/edge integer columns through the shuffle;
3. per-pair sum — ONE pre-bucketed count+sum agg keyed by the pair;
   exact global top-k via per-block partial top-k on the (rounded aa, u,
   w) total order, then one small final sort.

Skew note (the power-law caveat the reference handles with vertex-cut
mirroring, powergraph OSDI'12 §3): the wedge OUTPUT is inherently
Σ deg(v)² — a super-hub center emits deg² candidate pairs no matter the
engine. ``max_center_degree`` (default 2000) drops centers above a degree
ceiling, with a warn-logged drop count (the standard production
mitigation — such centers contribute ≈1/ln(d)→0 per pair anyway, and an
uncapped hub is a quadratic bomb at corpus scale); ``None`` opts into the
exact uncut metric. The SQL oracles mirror the same cut
(oracle.sql_link_prediction_topk / sql_copurchase_topk) so parity holds
either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ids import integer_mix
from .triangles import _EXPANSION_CAP, _chunked_expansion

__all__ = ["link_prediction_topk"]


#: default center-degree ceiling — recall-safe skew cap (see module doc)
DEFAULT_MAX_CENTER_DEGREE = 2000


def link_prediction_topk(edges_ds, k: int = 20, n_buckets: int = 64,
                         max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
                         min_pair_vertex: int | None = None):
    """(src, dst) edge Dataset → top-``k`` non-adjacent pairs by
    Adamic–Adar, as (u, w, cn, aa) with u < w, cn = common-neighbor count,
    aa = Σ_{v ∈ Γ(u)∩Γ(w)} 1/ln(deg(v)) rounded half-away at 6 dp (the
    SQL-comparable form; the rounded value is also the sort key so the
    k-boundary is deterministic across engines). Exact, order
    (aa DESC, u ASC, w ASC).

    ``min_pair_vertex`` is the BIPARTITE-PROJECTION mode: namespace one
    side's ids above the other (e.g. part = raw + OFFSET > every order
    id) and pass the offset — only pairs with u ≥ offset survive, i.e.
    the side-2×side-2 projection (cn = shared side-1 neighbors, aa =
    rarity-weighted co-occurrence); side-1×side-1 wedge pairs drop."""
    from ..stages.agg import bucket_hash, bucketed_agg, coalesce_small

    def und(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.cast(t["src"].combine_chunks(), pa.int64())
        d = pc.cast(t["dst"].combine_chunks(), pa.int64())
        return pa.table({"a": pa.concat_arrays([s, d]),
                         "b": pa.concat_arrays([d, s])})

    adj = coalesce_small(
        bucketed_agg(edges_ds.map_batches(und, batch_format="pyarrow"),
                     ["a", "b"], {"_n": (None, "count")},
                     n_buckets=n_buckets).select_columns(["a", "b"]))

    def tag_center(b: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            bkt = integer_mix(b["a"].to_numpy(np.int64).view(np.uint64)) \
                % np.uint64(n_buckets)
        return pd.DataFrame({"a": b["a"].to_numpy(np.int64),
                             "b": b["b"].to_numpy(np.int64),
                             "bkt": bkt.astype(np.int64)})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        new = np.r_[True, a[1:] != a[:-1]]
        run_id = np.cumsum(new) - 1
        run_start = np.flatnonzero(new)
        run_len = np.diff(np.r_[run_start, len(a)])
        keep_run = run_len > 1
        if max_center_degree is not None:
            over = run_len > max_center_degree
            n_drop = int(over.sum())
            if n_drop:
                import logging

                logging.getLogger(__name__).warning(
                    "link_prediction: dropped %d wedge centers with "
                    "degree > max_center_degree=%d in bucket %s (skew cap; "
                    "pass max_center_degree=None for the exact uncut "
                    "metric)", n_drop, max_center_degree,
                    int(g["bkt"].iloc[0]))
            keep_run &= ~over
        if min_pair_vertex is not None:
            # bipartite mode: sides are strictly separated by the offset,
            # so a center ≥ offset has only < offset neighbors — its wedges
            # can never satisfy u ≥ offset. Skip them at the source instead
            # of discarding post-aggregation (measured ~10× wedge volume on
            # the lineitem projection, where the part side dominates Σd²).
            keep_run &= a[run_start] < min_pair_vertex
        with np.errstate(divide="ignore"):
            aw_run = np.where(keep_run, 1.0 / np.log(run_len), 0.0)
        # element p pairs with every LATER element of its run: u = b[p]
        # precedes w in run-sorted order, so u < w by construction
        starts = np.arange(len(a), dtype=np.int64) + 1
        ends = np.repeat(run_start + run_len, run_len)
        ends = np.where(keep_run[run_id], ends, starts)  # degenerate: empty
        outs = []
        for rep, pos in _chunked_expansion(starts, ends, _EXPANSION_CAP):
            outs.append((b[rep], b[pos], aw_run[run_id[rep]]))
        if not outs:
            return pd.DataFrame({"u": pd.array([], dtype="int64"),
                                 "w": pd.array([], dtype="int64"),
                                 "aw": pd.array([], dtype="float64"),
                                 "_bkt": pd.array([], dtype="int64")})
        # already in the pair shuffle's layout: the _bkt tag rides out of
        # this pass (pre_bucketed agg — no second copy of the Σdeg² stream)
        u = np.concatenate([o_[0] for o_ in outs])
        w = np.concatenate([o_[1] for o_ in outs])
        return pd.DataFrame({"u": u, "w": w,
                             "aw": np.concatenate([o_[2] for o_ in outs]),
                             "_bkt": bucket_hash([u, w], n_buckets)})

    wed = (adj.map_batches(tag_center, batch_format="pandas")
           .groupby("bkt").map_groups(wedges, batch_format="pandas"))

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        # +inf markers: an existing edge's pair sums to inf and is dropped
        # at the top-k stage — no separate cn/edge columns in the shuffle
        m = b["a"].to_numpy(np.int64) < b["b"].to_numpy(np.int64)
        u = b["a"].to_numpy(np.int64)[m]
        w = b["b"].to_numpy(np.int64)[m]
        return pd.DataFrame({"u": u, "w": w,
                             "aw": np.full(len(u), np.inf),
                             "_bkt": bucket_hash([u, w], n_buckets)})

    merged = bucketed_agg(
        wed.union(adj.map_batches(edge_rows, batch_format="pandas")),
        ["u", "w"], {"cn": (None, "count"), "aa": ("aw", "sum")},
        n_buckets=n_buckets, pre_bucketed=True)

    def partial_top(b: pd.DataFrame) -> pd.DataFrame:
        from ..ids import round_half_away

        aa = b["aa"].to_numpy(np.float64)
        b = b[np.isfinite(aa)]  # inf sum ⇔ the pair is an existing edge
        if min_pair_vertex is not None:
            b = b[b["u"] >= min_pair_vertex]
        out = pd.DataFrame({"u": b["u"].to_numpy(np.int64),
                            "w": b["w"].to_numpy(np.int64),
                            "cn": b["cn"].to_numpy(np.int64),
                            "aa": round_half_away(
                                b["aa"].to_numpy(np.float64), 6)})
        # exact: (aa, u, w) is a total order ((u, w) unique after the agg)
        return out.sort_values(["aa", "u", "w"],
                               ascending=[False, True, True]).head(k)

    return (merged.map_batches(partial_top, batch_format="pandas")
            .sort(["aa", "u", "w"], descending=[True, False, False])
            .limit(k))
