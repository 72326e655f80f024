"""Sequence-packing manifest for LM training: GPT-style concat-and-chunk.

The last step between a curated corpus and a training loader: docs are
concatenated in a deterministic order and the token stream is sliced into
fixed-length training sequences. Order = (shard, doc_id) where shard is the
salted splitmix64 assignment shared with stages/export.export_shards — so a
corpus exported with export_shards is packed in exactly its on-disk order,
and each shard is an independent stream a loader host can consume without
coordination. Long docs span sequence boundaries (concat-and-chunk, as
described publicly for GPT-2/3-style pretraining); nothing is padded except
each shard's final partial sequence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .export import shard_of

__all__ = ["pack_manifest", "pack_manifest_from_counts"]

_TOKEN_PAT = "[a-z0-9_]+"


def pack_manifest(docs_ds, seq_len: int = 2048, n_shards: int = 64,
                  salt: int = 0):
    """→ (shard, doc_id, n_tokens, begin_tok, seq_id, seq_off) per doc:
    ``begin_tok`` is the doc's first-token offset in its shard's
    concatenated stream (docs ordered by doc_id within the shard),
    ``seq_id = begin_tok // seq_len`` the fixed-length training sequence it
    starts in, ``seq_off`` the offset inside that sequence.

    Scale shape: one zero-copy Arrow counting pass (RE2 token count +
    splitmix64 shard — no tokens materialized, no Python per row), then ONE
    ``groupby(shard)`` whose groups hold token COUNTS only (~40 B/doc, tiny
    even when the shard's text is not) with a vectorized cumsum. The
    prefix-sum over doc order is the one inherently sequential step of
    packing; sharding bounds it and keeps shards independent streams."""

    def counts(t: pa.Table) -> pd.DataFrame:
        # Arrow kernels on the zero-copy block, pandas block out: Ray's sort
        # under groupby warns on mixed pyarrow/pandas block schemas when a
        # sort partition lands empty, and the group stage is pandas anyway.
        ids = np.asarray(t["doc_id"], np.int64)
        n = np.asarray(pc.count_substring_regex(
            pc.utf8_lower(t["text"]), pattern=_TOKEN_PAT)).astype(np.int64)
        return pd.DataFrame({
            "shard": shard_of(ids, n_shards, salt).astype(np.int64),
            "doc_id": ids,
            "n_tokens": n,
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        begin = np.concatenate(([0], np.cumsum(n[:-1]))) if len(n) else n
        return g.assign(begin_tok=begin, seq_id=begin // seq_len,
                        seq_off=begin % seq_len)

    return (docs_ds.map_batches(counts, batch_format="pyarrow")
            .groupby("shard").map_groups(pack, batch_format="pandas"))


def pack_manifest_from_counts(counts_ds, seq_len: int = 2048,
                              n_shards: int = 64, salt: int = 0,
                              n_tokens_col: str = "n_bpe_tokens"):
    """``pack_manifest`` over PRECOMPUTED per-doc token counts — the
    tokenize-and-pack composition: feed it ``bpe_encode``'s
    (doc_id, n_bpe_tokens, …) output (or any (doc_id, count) table) so the
    manifest reflects the real tokenizer, not the regex proxy. Same shard
    assignment, ordering, and cumsum semantics as ``pack_manifest``; the
    input's other columns are dropped (list columns never shuffle)."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "shard": shard_of(ids, n_shards, salt).astype(np.int64),
            "doc_id": ids,
            "n_tokens": df[n_tokens_col].to_numpy(np.int64),
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        begin = np.concatenate(([0], np.cumsum(n[:-1]))) if len(n) else n
        return g.assign(begin_tok=begin, seq_id=begin // seq_len,
                        seq_off=begin % seq_len)

    return (counts_ds.map_batches(counts, batch_format="pandas")
            .groupby("shard").map_groups(pack, batch_format="pandas"))
