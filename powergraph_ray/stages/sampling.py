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
