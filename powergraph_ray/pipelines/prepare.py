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

__all__ = ["prepare_corpus"]


def prepare_corpus(docs_ds, out_dir: str, n_shards: int = 64, *,
                   min_tokens: int = 10, max_tokens: int = 100_000,
                   max_dup_word_frac: float = 0.35,
                   max_top_word_frac: float = 0.2, drop_pii: bool = True,
                   jaccard_threshold: float = 0.8, n_perm: int = 64,
                   bands: int = 16, k: int = 3, n_buckets: int = 16,
                   token_hash: str = "blake2", salt: int = 0):
    """docs (doc_id, text, …) → curated + deduplicated + shard-exported
    corpus under ``out_dir/shard=K/``; returns the export manifest Dataset
    ``(shard, n_rows, skipped)``.

    Survivors are exactly ``curate_corpus(...).keep == 1 ∧
    fuzzy_dedup_keep(...).keep == 1`` (asserted row-for-row in
    tests/test_prepare.py), but computed without materializing either stats
    table: dedup contributes only its small drop set, quality rules are
    recomputed inline in the filter pass. All original columns survive.
    """
    import ray

    from ..stages.curation import curate_stats
    from ..stages.dedup import dup_groups, minhash_near_dups
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
    return export_shards(kept, out_dir, n_shards=n_shards, salt=salt)
