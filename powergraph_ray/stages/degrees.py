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


def degree_assortativity(edges_ds, n_buckets: int = 64):
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of the endpoint degrees over the ordered samples of the
    simple undirected graph (each distinct edge contributes both
    orientations). Computed from INTEGER sufficient statistics so the
    DuckDB twin reproduces the identical double:

    - ``M = Σ deg`` (ordered sample count), ``Sx = Σ deg²``,
      ``Sxx = Σ deg³`` — straight vertex-table sums (a source with degree
      d appears in d ordered samples);
    - ``Sxy = Σ_v deg(v)·t(v)`` with ``t(v) = Σ_{u∈N(v)} deg(u)`` — the
      one-hop degree gather, done as a coarse-bucket co-located join of
      the degree table onto the distinct ordered pairs (no broadcast of
      the vertex-sized table, no O(nv) driver state) + one bucketed sum;
    - ``r = (M·Sxy − Sx²) / (M·Sxx − Sx²)`` (the symmetric-sample
      reduction of Pearson's formula).

    int64 partials: a vertex of degree d contributes d³ to Sxx; batches
    whose len·max³ could wrap int64 fall back to exact big-int
    accumulation, and a partial that genuinely exceeds int64 raises
    (never a silent wrap). DuckDB's BIGINT sums promote to HUGEINT.
    → one-row DataFrame (assortativity, n_samples)."""
    import pandas as pd

    from ..ids import integer_mix

    def und_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t["src"].combine_chunks()
        d = t["dst"].combine_chunks()
        return pa.table({"a": pa.concat_arrays([pc.cast(s, pa.int64()),
                                                pc.cast(d, pa.int64())]),
                         "b": pa.concat_arrays([pc.cast(d, pa.int64()),
                                                pc.cast(s, pa.int64())])})

    # both tables feed TWO consumers below — materialize once (an
    # unmaterialized Dataset silently re-executes its whole shuffle DAG
    # per consumer; deg's two reads would re-run the upairs shuffle twice
    # more on top of upairs' own second read)
    from .agg import coalesce_small

    upairs = coalesce_small(bucketed_agg(
        edges_ds.map_batches(und_pairs, batch_format="pyarrow"),
        ["a", "b"], {"_n": (None, "count")}))
    deg = coalesce_small(bucketed_agg(upairs, ["a"],
                                      {"deg": (None, "count")}))

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        return pd.DataFrame({
            "_bkt": (integer_mix(a.view(np.uint64))
                     % np.uint64(n_buckets)).astype(np.int64),
            "a": a, "b": df["b"].to_numpy(np.int64),
            "deg": np.full(len(df), -1, np.int64)})

    def tag_deg(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        return pd.DataFrame({
            "_bkt": (integer_mix(a.view(np.uint64))
                     % np.uint64(n_buckets)).astype(np.int64),
            "a": a, "b": np.full(len(df), -1, np.int64),
            "deg": df["deg"].to_numpy(np.int64)})

    def join_emit(g: pd.DataFrame) -> pd.DataFrame:
        """Per bucket: searchsorted lookup of deg(a) for every pair row →
        (b, da) — C-level, no per-row Python."""
        dmask = g["deg"].to_numpy() >= 0
        dv = g.loc[dmask, "a"].to_numpy(np.int64)
        dd = g.loc[dmask, "deg"].to_numpy(np.int64)
        o = np.argsort(dv, kind="stable")
        dv, dd = dv[o], dd[o]
        pa_ = g.loc[~dmask, "a"].to_numpy(np.int64)
        pb_ = g.loc[~dmask, "b"].to_numpy(np.int64)
        pos = np.searchsorted(dv, pa_)
        bad = (pos >= len(dv)) | (dv[np.minimum(pos, max(len(dv) - 1, 0))]
                                  != pa_)
        if bad.any():
            # silent nearest-vertex degree attribution would corrupt r
            raise ValueError(f"{int(bad.sum())} pair endpoints missing a "
                             "degree row in their bucket (internal "
                             "invariant: deg is derived from the same pairs)")
        return pd.DataFrame({"b": pb_, "da": dd[pos]})

    emitted = (upairs.map_batches(tag_pairs, batch_format="pandas")
               .union(deg.map_batches(tag_deg, batch_format="pandas"))
               .groupby("_bkt").map_groups(join_emit, batch_format="pandas"))
    tsum = bucketed_agg(emitted, ["b"], {"t": ("da", "sum")})

    def deg_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": df["a"].to_numpy(np.int64),
                             "deg": df["deg"].to_numpy(np.int64),
                             "t": np.zeros(len(df), np.int64)})

    def t_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": df["b"].to_numpy(np.int64),
                             "deg": np.zeros(len(df), np.int64),
                             "t": df["t"].to_numpy(np.int64)})

    vt = bucketed_agg(deg.map_batches(deg_side, batch_format="pandas")
                      .union(tsum.map_batches(t_side, batch_format="pandas")),
                      ["v"], {"deg": ("deg", "sum"), "t": ("t", "sum")})

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        # int64 cube-overflow guard: len·max³ bounds the partial (checked in
        # Python ints — no wrap in the check itself). The rare giant-hub
        # batch falls back to exact big-int accumulation; a partial that
        # genuinely exceeds int64 cannot ship through Arrow — raise loudly
        # instead of silently wrapping r.
        if len(d) and len(d) * int(d.max()) ** 3 >= (1 << 62):
            sxx = sum(int(x) ** 3 for x in d)
            sxy = sum(int(x) * int(y) for x, y in zip(d, t))
            if max(abs(sxx), abs(sxy)) >= (1 << 63):
                raise OverflowError(
                    "degree_assortativity: Σdeg³ partial exceeds int64 "
                    f"(max degree {int(d.max())}) — partial sums cannot be "
                    "represented; subsample or bucket the hub vertices")
        else:
            sxx = int((d * d * d).sum())
            sxy = int((d * t).sum())
        return pd.DataFrame({"m": [int(d.sum())], "sx": [int((d * d).sum())],
                             "sxx": [sxx], "sxy": [sxy]})

    parts = vt.map_batches(stats, batch_format="pandas").to_pandas()
    m = int(parts["m"].sum())
    sx = int(parts["sx"].sum())
    sxx = int(parts["sxx"].sum())
    sxy = int(parts["sxy"].sum())
    denom = m * sxx - sx * sx
    r = float(m * sxy - sx * sx) / denom if denom else 0.0
    return pd.DataFrame({"assortativity": [r], "n_samples": [np.int64(m)]})


def edge_reciprocity(edges_ds):
    """Directed reciprocity: the fraction of distinct directed edges whose
    reverse edge also exists (self-edges dropped) → one-row DataFrame
    (reciprocity, n_directed). One canonical-pair bucketed count: a pair
    seen in both orientations contributes 2 reciprocal edges."""
    import pandas as pd
    import pyarrow.compute as pc

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"], np.int64)
        d = np.asarray(t["dst"], np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "a": pa.array(np.minimum(s, d)), "b": pa.array(np.maximum(s, d)),
            "fwd": pa.array((s < d).astype(np.int64)),
            "rev": pa.array((s > d).astype(np.int64))})

    pairs = bucketed_agg(edges_ds.map_batches(canon, batch_format="pyarrow"),
                         ["a", "b"], {"fwd": ("fwd", "max"),
                                      "rev": ("rev", "max")})

    def part(df: pd.DataFrame) -> pd.DataFrame:
        f = df["fwd"].to_numpy(np.int64)
        r = df["rev"].to_numpy(np.int64)
        both = int(((f == 1) & (r == 1)).sum())
        return pd.DataFrame({"n_recip": [2 * both],
                             "n_dir": [int(f.sum() + r.sum())]})

    parts = pairs.map_batches(part, batch_format="pandas").to_pandas()
    n_recip = int(parts["n_recip"].sum())
    n_dir = int(parts["n_dir"].sum())
    rec = float(n_recip) / n_dir if n_dir else 0.0
    return pd.DataFrame({"reciprocity": [rec],
                         "n_directed": [np.int64(n_dir)]})


def partition_modularity(edges_ds, labels_ds, n_buckets: int = 64):
    """Newman modularity ``Q = Σ_c [e_c/m − (d_c/(2m))²]`` of a vertex
    partition over the simple undirected graph — the quality metric for
    LPA / Louvain / spectral communities. ``labels_ds``: (vid, label)
    rows (int or string labels).

    Scale shape: two coarse-bucket co-located joins attach both endpoint
    labels to the distinct canonical pairs (the assortativity join pattern
    — no vertex-table broadcast), one bucketed_agg reduces to the
    community-sized (label, d_c, intra_c) table, and the Q fold is an O(C)
    driver epilogue over exact integer counts.
    → one-row DataFrame (modularity, n_edges, n_communities)."""
    import pandas as pd

    from ..ids import integer_mix

    def und_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t["src"].combine_chunks()
        d = t["dst"].combine_chunks()
        return pa.table({"a": pa.concat_arrays([pc.cast(s, pa.int64()),
                                                pc.cast(d, pa.int64())]),
                         "b": pa.concat_arrays([pc.cast(d, pa.int64()),
                                                pc.cast(s, pa.int64())])})

    # distinct ordered pairs (both orientations) — m = rows / 2
    upairs = bucketed_agg(edges_ds.map_batches(und_pairs,
                                               batch_format="pyarrow"),
                          ["a", "b"], {"_n": (None, "count")})

    def _bkt(ids: np.ndarray) -> np.ndarray:
        return (integer_mix(ids.view(np.uint64))
                % np.uint64(n_buckets)).astype(np.int64)

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        return pd.DataFrame({"_bkt": _bkt(a), "a": a,
                             "b": df["b"].to_numpy(np.int64),
                             "lab": pd.Series([None] * len(df))})

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        v = df["vid"].to_numpy(np.int64)
        return pd.DataFrame({"_bkt": _bkt(v), "a": v,
                             "b": np.full(len(df), -1, np.int64),
                             "lab": df["label"].astype(str)})

    def join_a(g: pd.DataFrame) -> pd.DataFrame:
        """Attach label(a) to each ordered pair → (b, la)."""
        lmask = g["b"].to_numpy() == -1
        lv = g.loc[lmask, "a"].to_numpy(np.int64)
        ll = g.loc[lmask, "lab"].to_numpy()
        o = np.argsort(lv, kind="stable")
        lv, ll = lv[o], ll[o]
        pa_ = g.loc[~lmask, "a"].to_numpy(np.int64)
        pb_ = g.loc[~lmask, "b"].to_numpy(np.int64)
        pos = np.searchsorted(lv, pa_)
        bad = (pos >= len(lv)) | (lv[np.minimum(pos, max(len(lv) - 1, 0))]
                                  != pa_)
        if bad.any():
            # silent nearest-label attribution would corrupt Q
            raise ValueError(f"{int(bad.sum())} edge endpoints missing from "
                             "labels_ds (labels must cover every vertex)")
        return pd.DataFrame({"_bkt2": _bkt(pb_), "b": pb_, "la": ll[pos],
                             "lb": pd.Series([None] * len(pb_))})

    half = (upairs.map_batches(tag_pairs, batch_format="pandas")
            .union(labels_ds.map_batches(tag_labels, batch_format="pandas"))
            .groupby("_bkt").map_groups(join_a, batch_format="pandas"))

    def tag_labels2(df: pd.DataFrame) -> pd.DataFrame:
        v = df["vid"].to_numpy(np.int64)
        return pd.DataFrame({"_bkt2": _bkt(v), "b": v,
                             "la": pd.Series([None] * len(df)),
                             "lb": df["label"].astype(str).to_numpy()})

    def join_b(g: pd.DataFrame) -> pd.DataFrame:
        """Attach label(b) → per-batch community partials (lab, d, intra)."""
        lmask = g["la"].isna().to_numpy()
        lv = g.loc[lmask, "b"].to_numpy(np.int64)
        ll = g.loc[lmask, "lb"].to_numpy()
        o = np.argsort(lv, kind="stable")
        lv, ll = lv[o], ll[o]
        la = g.loc[~lmask, "la"].to_numpy()
        pb_ = g.loc[~lmask, "b"].to_numpy(np.int64)
        pos = np.searchsorted(lv, pb_)
        bad = (pos >= len(lv)) | (lv[np.minimum(pos, max(len(lv) - 1, 0))]
                                  != pb_)
        if bad.any():
            raise ValueError(f"{int(bad.sum())} edge endpoints missing from "
                             "labels_ds (labels must cover every vertex)")
        lb = ll[pos]
        # each ordered pair contributes 1 to d_{la}; intra counted on the
        # a-side only (both orientations present ⇒ Σ intra = 2·e_c)
        part = pd.DataFrame({"lab": la, "intra": (la == lb).astype(np.int64)})
        gb = part.groupby("lab", sort=False)
        out = pd.DataFrame({"d_part": gb.size(),
                            "intra_part": gb["intra"].sum()}).reset_index()
        return out

    comm = bucketed_agg(
        half.union(labels_ds.map_batches(tag_labels2, batch_format="pandas"))
        .groupby("_bkt2").map_groups(join_b, batch_format="pandas"),
        ["lab"], {"d": ("d_part", "sum"), "intra": ("intra_part", "sum")})

    t = comm.to_pandas()
    d = t["d"].to_numpy(np.int64)
    intra = t["intra"].to_numpy(np.int64)
    two_m = int(d.sum())          # Σ d_c = 2m
    m = two_m // 2
    q = float(np.sum(intra / (2.0 * m) - (d / (2.0 * m)) ** 2)) if m else 0.0
    return pd.DataFrame({"modularity": [q], "n_edges": [np.int64(m)],
                         "n_communities": [np.int64(len(t))]})
