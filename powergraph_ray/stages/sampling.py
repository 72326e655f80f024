"""Sampling / top-k operators (SURVEY.md §2.7 "sorts / top-k / sampling").

- deterministic hash sampling (the multinomial-CDF sampling role of the
  synthetic generator, distributed_graph.hpp:2397, as a reusable stage):
  keep rows whose Knuth-mixed key falls under the fraction threshold —
  reproducible across runs/partitionings and SQL-expressible,
- stratified first-k per group (per-stratum ordered head),
- global top-k by a score column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ids import KNUTH_MIX

SAMPLE_MOD = 10_000


def deterministic_sample(ds, fraction: float, key: str = "doc_id"):
    """Rows with ``(key * 2654435761) % 10000 < fraction * 10000`` — a pure,
    vectorized filter (no RNG state, batching-invariant)."""
    thresh = int(round(fraction * SAMPLE_MOD))

    def flt(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key], np.int64)
        keep = (k * KNUTH_MIX) % SAMPLE_MOD < thresh
        return t.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")


def stratified_first_k(ds, stratum: str, order_by: list[str], k: int):
    """First k rows per stratum under the given ordering — per-group head
    after the stratum shuffle (groupby.map_groups; the per-group python is
    O(k + group) pandas, fine because groups are few)."""

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by).head(k)

    return ds.groupby(stratum).map_groups(head, batch_format="pandas")


def top_k_by(ds, score_col: str, k: int, tie_col: str):
    """Global top-k: per-batch partial top-k, then the tiny final sort —
    the max-degree-vertex pattern (sssp.cpp:185-201) generalized."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([score_col, tie_col],
                                       ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.sort_values([score_col, tie_col],
                             ascending=[False, True]).head(k).reset_index(drop=True)


def token_budget_sample(docs_ds, budget_tokens: int, by: str = "source",
                        salt: int = 0, n_pbuckets: int = 4096):
    """→ (doc_id, {by}, n_tokens, keep): deterministic per-group token-
    budget selection — the data-mixing step of a training pipeline (give
    every source/domain a token budget; keep a reproducible subsample that
    fills it). Rule: order each group's docs by (priority =
    splitmix64(doc_id ^ salt), doc_id) and keep a doc iff the running token
    total INCLUDING it is ≤ ``budget_tokens`` — the keep set is a hash-
    random prefix, so it is order-free, resumable, and SQL-replayable (a
    window cumsum; see oracle.sql_token_budget_sample).

    Scale shape (exact distributed selection, NO corpus-wide sort):
    1. one zero-copy counting pass → per-doc (group, n_tokens, priority),
       priority split into int64 halves (pandas-safe) and a coarse bucket
       b = top log2(n_pbuckets) bits;
    2. bucketed_agg → per-(group, b) token sums: a (groups × n_pbuckets)
       table the driver cumsums to find each group's boundary bucket b*
       and the token base below it (assumption: group cardinality is
       metadata-scale — sources/domains, not doc-scale);
    3. only boundary-bucket docs (≈ corpus/n_pbuckets rows) get the exact
       within-bucket sort, distributed per group via groupby().map_groups;
       every other doc is flagged by a broadcast (group → b*) merge.
    """
    import pyarrow.compute as pc
    import ray

    from ..ids import integer_mix
    from .agg import bucketed_agg

    assert n_pbuckets & (n_pbuckets - 1) == 0, "n_pbuckets must be 2^k"
    shift = np.uint64(64 - int(np.log2(n_pbuckets)))
    out_cols = ["doc_id", by, "n_tokens"]

    def meta(t: pa.Table) -> pd.DataFrame:
        ids = np.asarray(t["doc_id"], np.int64)
        n = np.asarray(pc.count_substring_regex(
            pc.utf8_lower(t["text"]), pattern="[a-z0-9_]+")).astype(np.int64)
        p = integer_mix(ids.view(np.uint64) ^ np.uint64(salt))
        return pd.DataFrame({
            "doc_id": ids, by: t[by].to_pandas().to_numpy(object),
            "n_tokens": n,
            "p_hi": (p >> np.uint64(32)).astype(np.int64),
            "p_lo": (p & np.uint64(0xFFFFFFFF)).astype(np.int64),
            "b": (p >> shift).astype(np.int64),
        })

    m = docs_ds.map_batches(meta, batch_format="pyarrow").materialize()
    hist = bucketed_agg(m, [by, "b"], {"tok": ("n_tokens", "sum")}).to_pandas()

    rows = []  # (group, b*, base); b* = n_pbuckets → whole group kept
    for s, g in hist.groupby(by, sort=False):
        g = g.sort_values("b")
        cum = g["tok"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, budget_tokens, side="right"))
        if i == len(cum):                      # total ≤ budget: keep all
            rows.append((s, n_pbuckets, 0))
        else:                                  # budget crossed inside b*
            rows.append((s, int(g["b"].iloc[i]),
                         int(cum[i - 1]) if i else 0))
    lut = pd.DataFrame(rows, columns=[by, "_bstar", "_base"])
    lut_ref = ray.put(lut)

    def flag_nonboundary(df: pd.DataFrame) -> pd.DataFrame:
        mg = df.merge(ray.get(lut_ref), on=by, how="left")
        bstar = mg["_bstar"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        out = df.loc[b != bstar, out_cols].copy()
        out["keep"] = (b[b != bstar] < bstar[b != bstar]).astype(np.int64)
        return out

    def boundary_only(df: pd.DataFrame) -> pd.DataFrame:
        mg = df.merge(ray.get(lut_ref), on=by, how="left")
        return df[df["b"].to_numpy(np.int64)
                  == mg["_bstar"].to_numpy(np.int64)]

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        lu = ray.get(lut_ref)
        base = int(lu.loc[lu[by] == g[by].iloc[0], "_base"].iloc[0])
        g = g.sort_values(["p_hi", "p_lo", "doc_id"],
                          kind="stable").reset_index(drop=True)
        cum = base + g["n_tokens"].cumsum().to_numpy()
        out = g[out_cols].copy()
        out["keep"] = (cum <= budget_tokens).astype(np.int64)
        return out

    non_boundary = m.map_batches(flag_nonboundary, batch_format="pandas")
    boundary = (m.map_batches(boundary_only, batch_format="pandas")
                .groupby(by).map_groups(resolve, batch_format="pandas"))
    return non_boundary.union(boundary)
