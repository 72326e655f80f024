"""End-to-end training-corpus preparation — the composition a 100-TB
pipeline actually runs before tokenization: quality gate + fuzzy dedup +
deterministic resumable shard export, in the minimum number of corpus-wide
passes.

Scale shape (three phases, two corpus passes + one small-side graph job):

1. **Drop set** — MinHash-LSH verified near-dup pairs
   (stages/dedup.minhash_near_dups: shingle → signature → band buckets →
   bucketed exact-Jaccard verify) → distributed min-id connected components
   (stages/dedup.dup_groups) → the set of NON-canonical doc_ids. Dup docs
   are the small side at corpus scale (dup rate ≪ 1), so the drop set is
   ``ray.put`` once and read zero-copy by every filter task — no corpus
   join.
2. **One fused filter pass** — the curate_corpus rules (length / Gopher
   repetition / PII, stages/curation.curate_stats) recomputed inline per
   batch AND the broadcast drop-set membership (sorted searchsorted), then
   ``batch[keep]``. No stats table is materialized and no shuffle happens
   in this pass.
3. **Resumable export** — stages/export.export_shards: ONE salted-hash
   shuffle into byte-stable, atomically-committed ``shard=K/`` Parquet;
   re-runs skip complete shards.

The phases mirror the reference's graph-construction discipline (parse →
dedup → partitioned durable layout, distributed_graph.hpp finalize) applied
to a document corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["prepare_corpus", "prepare_corpus_incremental"]


def prepare_corpus(docs_ds, out_dir: str, n_shards: int = 64, *,
                   min_tokens: int = 10, max_tokens: int = 100_000,
                   max_dup_word_frac: float = 0.35,
                   max_top_word_frac: float = 0.2, drop_pii: bool = True,
                   jaccard_threshold: float = 0.8, n_perm: int = 64,
                   bands: int = 16, k: int = 3, n_buckets: int = 16,
                   token_hash: str = "blake2", salt: int = 0,
                   index_path: str | None = None):
    """docs (doc_id, text, …) → curated + deduplicated + shard-exported
    corpus under ``out_dir/shard=K/``; returns the export manifest Dataset
    ``(shard, n_rows, skipped)``.

    Survivors are exactly ``curate_corpus(...).keep == 1 ∧
    fuzzy_dedup_keep(...).keep == 1`` (asserted row-for-row in
    tests/test_prepare.py), but computed without materializing either stats
    table: dedup contributes only its small drop set, quality rules are
    recomputed inline in the filter pass. All original columns survive.

    With ``index_path`` the survivors' banded MinHash index is also
    materialized there (stages/dedup.minhash_index, same (n_perm, bands,
    k, token_hash)) — the bootstrap for prepare_corpus_incremental.
    """
    import ray

    from ..stages.curation import curate_stats
    from ..stages.dedup import dup_groups, minhash_index, minhash_near_dups
    from ..stages.export import export_shards

    pairs = minhash_near_dups(docs_ds, threshold=jaccard_threshold,
                              n_perm=n_perm, bands=bands, k=k,
                              n_buckets=n_buckets, token_hash=token_hash)
    groups = dup_groups(pairs)
    drop = groups.loc[groups["doc_id"] != groups["canonical_id"], "doc_id"] \
        .to_numpy(np.int64)
    drop_ref = ray.put(np.sort(drop))

    def keep_batch(batch: pd.DataFrame) -> pd.DataFrame:
        *_, keep = curate_stats(batch["text"].tolist(), min_tokens,
                                max_tokens, max_dup_word_frac,
                                max_top_word_frac, drop_pii)
        dropped = ray.get(drop_ref)
        if len(dropped):
            ids = batch["doc_id"].to_numpy(np.int64)
            pos = np.clip(np.searchsorted(dropped, ids), 0, len(dropped) - 1)
            keep &= dropped[pos] != ids
        return batch[keep]

    kept = docs_ds.map_batches(keep_batch, batch_format="pandas")
    manifest = export_shards(kept, out_dir, n_shards=n_shards, salt=salt)
    if index_path is not None:
        # the export sink is lazy — execute it so the shards exist, then
        # index the DURABLE survivors (read back from the export, not the
        # lazy `kept` pipeline, so the filter pass is not re-executed)
        manifest = manifest.materialize()
        minhash_index(
            ray.data.read_parquet(out_dir, file_extensions=["parquet"],
                                  columns=["doc_id", "text"]),
            index_path, n_perm=n_perm, bands=bands, k=k,
            token_hash=token_hash)
    return manifest


def prepare_corpus_incremental(new_docs_ds, out_dir: str, index_path: str,
                               corpus_paths: str | list[str],
                               n_shards: int = 64, *,
                               min_tokens: int = 10, max_tokens: int = 100_000,
                               max_dup_word_frac: float = 0.35,
                               max_top_word_frac: float = 0.2,
                               drop_pii: bool = True,
                               jaccard_threshold: float = 0.8,
                               n_perm: int = 64, bands: int = 16, k: int = 3,
                               n_buckets: int = 16,
                               token_hash: str = "blake2", salt: int = 0,
                               corpus_n_shards: int | None = None,
                               corpus_salt: int = 0,
                               update_index: bool = True):
    """Fold ONE new document batch into an already-prepared corpus — the
    daily-ingestion step. The existing corpus (``corpus_paths`` export
    roots + the ``index_path`` MinHash index written by prepare_corpus /
    prior incremental runs) is never rescanned: corpus work is bounded by
    the index partitions and corpus shards the new batch actually hashes
    into.

    A new doc survives iff it (1) passes the curate_corpus quality rules,
    (2) has NO verified near-dup in the indexed corpus
    (stages/dedup.minhash_match_index), and (3) is the canonical (min id)
    of its within-batch dup group. (2) and (3) are computed independently
    over the whole batch — a doc dropped for a corpus match still counts
    as a within-batch dup witness, matching what batch-mode dedup over the
    union corpus would decide for direct pairs (transitive chains that
    only connect THROUGH the corpus are the documented incremental
    relaxation). New doc_ids must be disjoint from every corpus id.

    Survivors are exported under ``out_dir`` (a FRESH directory per batch
    — export_shards treats complete shards as resumable, so reusing a
    prior root would skip them) and, with ``update_index``, appended to
    ``index_path`` so the next batch dedups against them too. Returns the
    export manifest Dataset.
    """
    import ray

    from ..stages.curation import curate_stats
    from ..stages.dedup import (
        dup_groups,
        minhash_index,
        minhash_match_index,
        minhash_near_dups,
    )
    from ..stages.export import export_shards

    matches = minhash_match_index(
        new_docs_ds, index_path, corpus_paths, threshold=jaccard_threshold,
        n_perm=n_perm, bands=bands, k=k, token_hash=token_hash,
        n_buckets=n_buckets, corpus_n_shards=corpus_n_shards,
        corpus_salt=corpus_salt).to_pandas()
    matched = matches["doc_id"].to_numpy(np.int64) if len(matches) \
        else np.empty(0, np.int64)

    pairs = minhash_near_dups(new_docs_ds, threshold=jaccard_threshold,
                              n_perm=n_perm, bands=bands, k=k,
                              n_buckets=n_buckets, token_hash=token_hash)
    groups = dup_groups(pairs)
    internal = groups.loc[groups["doc_id"] != groups["canonical_id"],
                          "doc_id"].to_numpy(np.int64)
    drop_ref = ray.put(np.unique(np.concatenate([matched, internal])))

    def keep_batch(batch: pd.DataFrame) -> pd.DataFrame:
        *_, keep = curate_stats(batch["text"].tolist(), min_tokens,
                                max_tokens, max_dup_word_frac,
                                max_top_word_frac, drop_pii)
        dropped = ray.get(drop_ref)
        if len(dropped):
            ids = batch["doc_id"].to_numpy(np.int64)
            pos = np.clip(np.searchsorted(dropped, ids), 0, len(dropped) - 1)
            keep &= dropped[pos] != ids
        return batch[keep]

    kept = new_docs_ds.map_batches(keep_batch, batch_format="pandas")
    manifest = export_shards(kept, out_dir, n_shards=n_shards, salt=salt)
    if update_index:
        manifest = manifest.materialize()  # execute the lazy export sink
        minhash_index(
            ray.data.read_parquet(out_dir, file_extensions=["parquet"],
                                  columns=["doc_id", "text"]),
            index_path, n_perm=n_perm, bands=bands, k=k,
            token_hash=token_hash)
    return manifest
