"""Vectorized grouped aggregation for many-distinct-key inputs.

Ray Data's built-in ``groupby().aggregate(...)`` runs its AggregateMap /
AggregateReduce suboperators per ROW in Python (measured ~13k rows/s per
task on this host — a 500k-doc vocabulary sum took 3+ minutes) — fine for a
handful of groups, a scale bug when the key space is vocabulary- or
vertex-sized. ``bucketed_agg`` produces the same exact rows but shuffles
ONE coarse int bucket key and merges each bucket with pandas' C-level hash
groupby (millions of rows/s) — the same merge pattern the ngram /
boilerplate / minhash / edge-dedup stages already use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..ids import KNUTH_MIX, hash64_str_array, integer_mix

_KINDS = ("sum", "min", "max", "count")


def bucket_hash(cols, n_buckets: int) -> np.ndarray:
    """The shared key→bucket hash of :func:`bucketed_agg` (splitmix chain
    over the key tuple) — exposed so a producer stage can emit pre-bucketed
    rows (``pre_bucketed=True``) and skip the tag pass. ``cols`` is the
    ordered list of key arrays (int-like)."""
    h = np.zeros(len(cols[0]) if cols else 0, np.uint64)
    with np.errstate(over="ignore"):
        for a in cols:
            a = np.asarray(a)
            u = a if a.dtype == np.uint64 \
                else a.astype(np.int64, copy=False).view(np.uint64)
            h = integer_mix(h * np.uint64(KNUTH_MIX) ^ u)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_agg(ds, keys, aggs, n_buckets: int = 64,
                 pre_bucketed: bool = False):
    """``ds.groupby(keys).aggregate(...)`` as one coarse-bucket shuffle +
    a vectorized per-bucket merge → Dataset with ``keys + list(aggs)``
    columns, one row per distinct key tuple.

    ``aggs``: ``{out_col: (in_col, kind)}``, kind ∈ sum|min|max|count
    (count ignores ``in_col``; pass None). Key columns may be int-like
    (bucketed by splitmix64) or strings (bucketed by the dictionary-encoded
    md5 hash64_str_array). Partitioning assumption: one bucket's rows
    (input_rows/n_buckets before the merge) fit a worker — raise
    ``n_buckets`` for bigger inputs. Exactness: bucketing is a partition of
    the key space, and each group lands wholly in one bucket, so the merged
    rows equal the global groupby's.

    ``pre_bucketed=True``: ``ds`` already carries a ``_bkt`` column
    computed with :func:`bucket_hash` over the same ``keys`` (int keys
    only) — skips the tag pass, saving one full copy of the fan-in on
    high-volume producers (the wedge emit of link prediction).
    """
    keys = list(keys)
    for _, (in_col, kind) in aggs.items():
        assert kind in _KINDS, kind
        assert kind == "count" or in_col is not None
    need = keys + sorted({c for c, k in aggs.values()
                          if c is not None and c not in keys})

    def _u64(col: pd.Series) -> np.ndarray:
        a = col.to_numpy()
        if a.dtype == object or pd.api.types.is_string_dtype(col):
            return hash64_str_array(a)
        if a.dtype == np.uint64:
            return a
        return a.astype(np.int64, copy=False).view(np.uint64)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), np.uint64)
        with np.errstate(over="ignore"):
            for c in keys:
                h = integer_mix(h * np.uint64(KNUTH_MIX) ^ _u64(df[c]))
        out = df[need].copy()
        out["_bkt"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False)
        cols = {}
        for out_col, (in_col, kind) in aggs.items():
            cols[out_col] = gb.size() if kind == "count" \
                else getattr(gb[in_col], kind)()
        res = pd.DataFrame(cols).reset_index()
        return res[keys + list(aggs)]

    tagged = ds if pre_bucketed else ds.map_batches(tag,
                                                    batch_format="pandas")
    return tagged.groupby("_bkt").map_groups(merge, batch_format="pandas")


def coalesce_small(ds, target_bytes: int = 32 << 20, min_blocks: int = 8):
    """Materialize ``ds`` and, if its block count exceeds what its BYTE
    size warrants (~``target_bytes`` per block), repartition down — the
    shared guard against Ray's per-block scheduling floor: every
    sort/groupby costs ~0.1 s of scheduling per input block regardless of
    block size, so a small dataset fanned out over hundreds of near-empty
    blocks (a pruned read, a selective filter, a union of two pipelines)
    makes its next shuffle latency-dominated. At real scale the computed
    count exceeds the existing one and this is a materialize-only no-op
    (the downstream sort materializes anyway)."""
    ds = ds.materialize()
    nb = max(min_blocks, int(ds.size_bytes() // target_bytes) + 1)
    if nb < ds.num_blocks():
        ds = ds.repartition(nb).materialize()
    return ds
