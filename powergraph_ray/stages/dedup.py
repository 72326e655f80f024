"""Deduplication family over the ``documents`` table.

- exact: content-hash groupby, first(min doc_id) wins — hash-partition +
  per-group first (ray_guide pattern; the same shuffle shape as the edge
  dedup the reference's triangle count requires),
- MinHash + LSH near-dup: shingle → minhash signature → band buckets →
  ``groupby(band)`` candidate pairs → Jaccard verify,
- SimHash: 64-bit hyperplane-free simhash over token hashes,
- n-gram Jaccard verification kernel (shared with MinHash verify).

All per-batch work is numpy-vectorized over blake2-derived stable word
hashes; signatures are computed in an actor-pool stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ids import KNUTH_MIX, integer_mix
from .text import TOKEN_RE


def _word_hashes(text: str) -> np.ndarray:
    """Stable uint64 hash per token (vectorized mix over per-word blake2)."""
    from ..ids import hash64_str

    ws = TOKEN_RE.findall(text.lower())
    if not ws:
        return np.empty(0, np.uint64)
    return np.fromiter((hash64_str(w) for w in ws), np.uint64, len(ws))


def _shingle_hashes(wh: np.ndarray, k: int = 3) -> np.ndarray:
    """k-gram shingle hashes from word hashes (rolling combine + mix)."""
    if len(wh) < k:
        return np.unique(integer_mix(wh)) if len(wh) else np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        acc = wh[: len(wh) - k + 1].copy()
        for i in range(1, k):
            acc = acc * np.uint64(KNUTH_MIX) ^ wh[i: len(wh) - k + 1 + i]
    return np.unique(integer_mix(acc))


# -- exact dedup -------------------------------------------------------------

def exact_dedup(docs_ds):
    """→ (text_md5, keep_doc_id = min doc_id, n_copies). Per-batch partial
    min/count first, then the grouped final — the shuffle moves one row per
    distinct hash per batch."""

    def hash_batch(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"text_md5": pa.array(md5s, pa.string()), "doc_id": t["doc_id"]})

    from ray.data.aggregate import Count, Min

    return (
        docs_ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
    )


# -- MinHash + LSH -----------------------------------------------------------

class MinHasher:
    """Actor-pool stage: text → n_perm minhash values (one-permutation family
    via uint64 multiply-mix; Broder '97 / common public implementation shape)."""

    def __init__(self, n_perm: int = 64, k: int = 3, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 62, n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        self.b = rng.integers(0, 1 << 62, n_perm, dtype=np.uint64)
        self.k = k
        self.n_perm = n_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(_word_hashes(text), self.k)
        if len(sh) == 0:
            return np.full(self.n_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        with np.errstate(over="ignore"):
            m = sh[None, :] * self.a[:, None] + self.b[:, None]
        return m.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"]]
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "sig": [s.tolist() for s in sigs]})


def minhash_lsh_candidates(docs_ds, n_perm: int = 64, bands: int = 16, k: int = 3):
    """→ candidate near-dup pairs (doc_a < doc_b) via banded LSH:
    signature → (band_id, band_hash) rows → groupby → pairs within bucket."""
    rows_per_band = n_perm // bands

    sigs = docs_ds.map_batches(MinHasher, batch_format="pandas",
                               fn_constructor_kwargs={"n_perm": n_perm, "k": k},
                               concurrency=(1, 12))

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        # the 64-bit band hash rides as two 32-bit halves: Ray's
        # groupby-aggregate emits key columns via pandas blocks that can pass
        # through float64, which silently corrupts >53-bit integers — 32-bit
        # halves survive that conversion exactly
        doc_ids, band_ids, bh_hi, bh_lo = [], [], [], []
        for did, sig in zip(batch["doc_id"], batch["sig"]):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = s[b * rows_per_band:(b + 1) * rows_per_band]
                h = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little")
                doc_ids.append(did)
                band_ids.append(b)
                bh_hi.append(h >> 32)
                bh_lo.append(h & 0xFFFFFFFF)
        return pd.DataFrame({"doc_id": doc_ids, "band_id": band_ids,
                             "bh_hi": pd.array(bh_hi, dtype="int64"),
                             "bh_lo": pd.array(bh_lo, dtype="int64")})

    bands_ds = sigs.map_batches(to_bands, batch_format="pandas")

    # one shuffle: groupby bucket -> in-bucket pair expansion. Measured on
    # this Ray version, map_groups over all (mostly singleton) buckets beats
    # a groupby-count prefilter: the multi-key aggregate path costs ~3x the
    # per-group Python calls it would save, and a prefilter adds a second
    # full shuffle of the band table.
    from ray.data.aggregate import Count

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = (bands_ds.groupby(["band_id", "bh_hi", "bh_lo"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    # cross-band pair dedup as a vectorized aggregate (not head(1) per group)
    return (pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="_n"))
            .select_columns(["doc_a", "doc_b"]))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-gram Jaccard — the verification kernel for LSH candidates."""
    sa = _shingle_hashes(_word_hashes(text_a), k)
    sb = _shingle_hashes(_word_hashes(text_b), k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def minhash_near_dups(docs_ds, threshold: float = 0.8, n_perm: int = 64,
                      bands: int = 16, k: int = 3):
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify.

    The verify stage joins candidate pairs back to texts via a broadcast
    doc_id→text lookup (ray.put once, read per actor) — at 100 TB this
    becomes a bucketed join on doc_id ranges.
    """
    import ray
    import ray.data

    texts = {}
    for b in docs_ds.select_columns(["doc_id", "text"]).iter_batches(batch_format="pandas"):
        texts.update(zip(b["doc_id"], b["text"]))
    texts_ref = ray.put(texts)

    cands = minhash_lsh_candidates(docs_ds, n_perm=n_perm, bands=bands, k=k)

    class Verify:
        def __init__(self) -> None:
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = [ngram_jaccard(self.texts[a], self.texts[b], k)
                   for a, b in zip(batch["doc_a"], batch["doc_b"])]
            out = batch.assign(jaccard=np.round(jac, 6))
            return out[out["jaccard"] >= threshold]

    return cands.map_batches(Verify, batch_format="pandas", concurrency=(1, 12))


# -- SimHash -----------------------------------------------------------------

class SimHasher:
    """64-bit simhash over token hashes (Charikar '02): sign-sum of bits."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in batch["text"]:
            wh = _word_hashes(t)
            if len(wh) == 0:
                out.append(0)
                continue
            bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            score = (2 * bits - 1).sum(axis=0)
            out.append(int(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()))
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "simhash": pd.array(out, dtype="uint64")})


def simhash_codes(docs_ds):
    return docs_ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 12))
