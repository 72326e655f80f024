"""Deduplication family over the ``documents`` table.

- exact: content-hash groupby, first(min doc_id) wins — hash-partition +
  per-group first (ray_guide pattern; the same shuffle shape as the edge
  dedup the reference's triangle count requires),
- MinHash + LSH near-dup: shingle → minhash signature → band buckets →
  ``groupby(band)`` candidate pairs → Jaccard verify,
- SimHash: 64-bit hyperplane-free simhash over token hashes,
- n-gram Jaccard verification kernel (shared with MinHash verify).

All per-batch work is numpy-vectorized over blake2-derived stable word
hashes; signature stages run as task pools (constants-only state).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ids import KNUTH_MIX, integer_mix
from .text import TOKEN_RE


def _word_hashes(text: str, hasher=None) -> np.ndarray:
    """Stable uint64 hash per token — dictionary-encoded so the hash runs
    once per DISTINCT token (ids.hash64_str_array), not once per occurrence.
    ``hasher`` defaults to blake2; pass ids.hash64_str_md5 where a SQL
    oracle must recompute identical hashes."""
    from ..ids import hash64_str_array

    ws = TOKEN_RE.findall(text.lower())
    if not ws:
        return np.empty(0, np.uint64)
    return hash64_str_array(ws, hasher)


def _token_hasher(token_hash: str):
    """'blake2' (engine default) → None; 'md5' → ids.hash64_str_md5
    (≡ DuckDB ``md5_number_lower`` — the SQL-oracle-checkable variant)."""
    if token_hash not in ("blake2", "md5"):
        raise ValueError(f"unknown token_hash {token_hash!r}")
    from ..ids import hash64_str_md5

    return hash64_str_md5 if token_hash == "md5" else None


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
        import pyarrow.compute as pc

        # md5 once per DISTINCT text in the batch (exact dups are the point)
        enc = pc.dictionary_encode(t["text"].combine_chunks())
        uniq = [hashlib.md5(x.encode()).hexdigest()
                for x in enc.dictionary.to_pylist()]
        md5s = np.asarray(uniq, object)[np.asarray(enc.indices)]
        return pa.table({"text_md5": pa.array(md5s, pa.string()), "doc_id": t["doc_id"]})

    from .agg import bucketed_agg

    return bucketed_agg(
        docs_ds.map_batches(hash_batch, batch_format="pyarrow"),
        ["text_md5"], {"keep_doc_id": ("doc_id", "min"),
                       "n_copies": (None, "count")})


# -- MinHash + LSH -----------------------------------------------------------

def minhash_perm_params(n_perm: int = 64, seed: int = 7):
    """The (a, b) uint64 permutation constants of the one-permutation
    multiply-mix family — exposed so the SQL oracle embeds the exact same
    numbers (oracle.sql_minhash_near_dups)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 62, n_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Batch stage: text → n_perm minhash values (one-permutation family
    via uint64 multiply-mix; Broder '97 / common public implementation shape)."""

    def __init__(self, n_perm: int = 64, k: int = 3, seed: int = 7,
                 token_hash: str = "blake2") -> None:
        self.a, self.b = minhash_perm_params(n_perm, seed)
        self.k = k
        self.n_perm = n_perm
        self.hasher = _token_hasher(token_hash)

    def _sig_from_wh(self, wh: np.ndarray) -> np.ndarray:
        sh = _shingle_hashes(wh, self.k)
        if len(sh) == 0:
            return np.full(self.n_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        with np.errstate(over="ignore"):
            m = sh[None, :] * self.a[:, None] + self.b[:, None]
        return m.min(axis=1)

    def signature(self, text: str) -> np.ndarray:
        return self._sig_from_wh(_word_hashes(text))

    def _sig_chunk(self, whs: list) -> np.ndarray:
        """Signatures for a chunk of docs in ONE vectorized pass: batch-flat
        rolling shingles (windows confined to one doc) → one (n_perm × S)
        multiply-mix → per-doc ``np.minimum.reduceat``. Bit-identical to the
        per-doc ``_sig_from_wh``: min over the shingle multiset equals min
        over its distinct set, so the per-doc ``np.unique`` is unnecessary."""
        nd = len(whs)
        sigs = np.full((nd, self.n_perm), np.uint64(0xFFFFFFFFFFFFFFFF))
        lens = np.fromiter((len(w) for w in whs), np.int64, nd)
        if int(lens.sum()) == 0:
            return sigs
        flat = np.concatenate(whs)
        seg = np.repeat(np.arange(nd), lens)
        k, L = self.k, len(flat)
        parts_sh, parts_seg = [], []
        if L >= k:
            with np.errstate(over="ignore"):
                acc = flat[: L - k + 1].copy()
                for i in range(1, k):
                    acc = acc * np.uint64(KNUTH_MIX) ^ flat[i: L - k + 1 + i]
            valid = seg[: L - k + 1] == seg[k - 1:]
            parts_sh.append(integer_mix(acc[valid]))
            parts_seg.append(seg[: L - k + 1][valid])
        short = (lens > 0) & (lens < k)
        if short.any():  # <k tokens → mixed unigrams (_shingle_hashes)
            m = short[seg]
            parts_sh.append(integer_mix(flat[m]))
            parts_seg.append(seg[m])
        sh = np.concatenate(parts_sh)
        sseg = np.concatenate(parts_seg)
        if len(sh) == 0:
            return sigs
        if len(parts_sh) == 2:  # restore grouped-by-doc order for reduceat
            o = np.argsort(sseg, kind="stable")
            sh, sseg = sh[o], sseg[o]
        starts = np.flatnonzero(np.r_[True, sseg[1:] != sseg[:-1]])
        with np.errstate(over="ignore"):
            m = sh[None, :] * self.a[:, None] + self.b[:, None]
        sigs[sseg[starts]] = np.minimum.reduceat(m, starts, axis=1).T
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .text import batch_token_hashes

        # one hash pass over the batch vocabulary, then the vectorized
        # chunk kernel (chunked so the (n_perm × S) transient stays ~30 MB)
        whs = batch_token_hashes(batch["text"].tolist(), hasher=self.hasher)
        sigs = np.empty((len(whs), self.n_perm), np.uint64)
        CH = 1024
        for i in range(0, len(whs), CH):
            sigs[i: i + CH] = self._sig_chunk(whs[i: i + CH])
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "sig": [s.tolist() for s in sigs]})


def _band_rows(batch: pd.DataFrame, bands: int,
               rows_per_band: int) -> pd.DataFrame:
    """Signature batch → one (doc_id, band_id, bh_hi, bh_lo, bkt) row per
    band. Band hash = iterated multiply-mix over the band's signature
    chunk, fully vectorized over (docs × bands); it rides as two 32-bit
    halves because Ray's groupby-aggregate emits key columns via pandas
    blocks that can pass through float64, which silently corrupts >53-bit
    integers — 32-bit halves survive that conversion exactly. ``bkt`` is
    the coarse 64-way shuffle bucket of (band, hash)."""
    NBK = np.uint64(64)  # shuffle buckets — many (band, hash) buckets each
    n = len(batch)
    if n == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "band_id": pd.array([], dtype="int64"),
                             "bh_hi": pd.array([], dtype="int64"),
                             "bh_lo": pd.array([], dtype="int64"),
                             "bkt": pd.array([], dtype="int64")})
    S = np.stack([np.asarray(s, np.uint64) for s in batch["sig"]])
    S = S.reshape(n, bands, rows_per_band)
    with np.errstate(over="ignore"):
        h = integer_mix(S[:, :, 0])
        for r in range(1, rows_per_band):
            h = integer_mix(h * np.uint64(KNUTH_MIX) ^ S[:, :, r])
    band_id = np.tile(np.arange(bands, dtype=np.int64), n)
    with np.errstate(over="ignore"):
        bkt = integer_mix(h.ravel() + band_id.view(np.uint64)) % NBK
    return pd.DataFrame({
        "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
        "band_id": band_id,
        "bh_hi": (h >> np.uint64(32)).astype(np.int64).ravel(),
        "bh_lo": (h & np.uint64(0xFFFFFFFF)).astype(np.int64).ravel(),
        "bkt": bkt.astype(np.int64),
    })


def minhash_lsh_candidates(docs_ds, n_perm: int = 64, bands: int = 16, k: int = 3,
                           token_hash: str = "blake2"):
    """→ candidate near-dup pairs (doc_a < doc_b) via banded LSH:
    signature → (band_id, band_hash) rows → groupby → pairs within bucket."""
    rows_per_band = n_perm // bands

    # task pool: MinHasher state is the (a, b) permutation constants only
    # (see text.py note) — measured 1.7 s -> 0.8 s for the stage at sf0.1
    sigs = docs_ds.map_batches(
        MinHasher(n_perm=n_perm, k=k, token_hash=token_hash).__call__,
        batch_format="pandas")

    bands_ds = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows_per_band), batch_format="pandas")

    # ONE shuffle keyed on a coarse hash bucket (64 groups), then a
    # vectorized in-group expansion over ALL (band, hash) runs at once —
    # the per-(band,hash) map_groups alternative makes one Python/pandas
    # call per mostly-singleton bucket (~16×n_docs calls), which measured
    # ~4 s at 5k docs vs ~0.5 s for this run-segmented lexsort form.
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        e0 = pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                           "doc_b": pd.array([], dtype="int64")})
        did = g["doc_id"].to_numpy()
        band = g["band_id"].to_numpy()
        hi = g["bh_hi"].to_numpy()
        lo = g["bh_lo"].to_numpy()
        order = np.lexsort((did, lo, hi, band))
        did, band, hi, lo = did[order], band[order], hi[order], lo[order]
        new = np.r_[True, (band[1:] != band[:-1]) | (hi[1:] != hi[:-1])
                    | (lo[1:] != lo[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(did)]
        outs = []
        for s, e in zip(starts, ends):  # only runs (shared buckets) loop
            if e - s < 2:
                continue
            a, b = np.triu_indices(e - s, k=1)
            outs.append((did[s:e][a], did[s:e][b]))
        if not outs:
            return e0
        return pd.DataFrame({"doc_a": np.concatenate([o[0] for o in outs]),
                             "doc_b": np.concatenate([o[1] for o in outs])})

    pairs = bands_ds.groupby("bkt").map_groups(bucket_pairs,
                                               batch_format="pandas")
    # cross-band pair dedup: bucketed vectorized distinct (see agg.py)
    from .agg import bucketed_agg

    return bucketed_agg(pairs, ["doc_a", "doc_b"],
                        {"_n": (None, "count")}) \
        .select_columns(["doc_a", "doc_b"])


def ngram_jaccard(text_a: str, text_b: str, k: int = 3, hasher=None) -> float:
    """Exact k-gram Jaccard — the verification kernel for LSH candidates."""
    sa = _shingle_hashes(_word_hashes(text_a, hasher), k)
    sb = _shingle_hashes(_word_hashes(text_b, hasher), k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def _cand_doc_ids(*tables) -> np.ndarray:
    ids = [np.concatenate([np.asarray(t["doc_a"]), np.asarray(t["doc_b"])])
           for t in tables if t.num_columns]
    return np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int64)


def minhash_near_dups(docs_ds, threshold: float = 0.8, n_perm: int = 64,
                      bands: int = 16, k: int = 3, n_buckets: int = 16,
                      token_hash: str = "blake2"):
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify.

    The verify stage is a BUCKETED join — no driver-side corpus dict:
    (1) the distinct candidate doc-id set (small: only docs in ≥1 candidate
    pair) is built in a remote task and broadcast; (2) candidate-doc texts
    are semi-filtered and hash-bucketed by doc_id; (3) two
    ``groupby(bucket).map_groups`` rounds attach text_a then text_b to each
    pair (pandas merge inside the bucket); (4) a vectorized-hash Jaccard
    verify filters. Partitioning assumption: one bucket's candidate texts
    fit a worker (n_buckets sizes it)."""
    import ray
    import ray.data

    hasher = _token_hasher(token_hash)
    cands = minhash_lsh_candidates(docs_ds, n_perm=n_perm, bands=bands, k=k,
                                   token_hash=token_hash).materialize()
    return _verify_candidate_pairs(cands, docs_ds, threshold, k, hasher,
                                   n_buckets)


def _verify_candidate_pairs(cands, docs_ds, threshold: float, k: int,
                            hasher, n_buckets: int):
    """Exact-Jaccard verification of a MATERIALIZED candidate-pair Dataset
    (doc_a, doc_b) against a (doc_id, text) corpus view → (doc_a, doc_b,
    jaccard ≥ threshold). The bucketed join of minhash_near_dups' docstring:
    candidate ids broadcast → corpus semi-filter → two
    groupby(bucket).map_groups rounds attaching text_a then text_b →
    vectorized-hash Jaccard. No driver-side corpus state."""
    import ray
    import ray.data

    empty = pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                          "doc_b": pd.array([], dtype="int64"),
                          "jaccard": pd.array([], dtype="float64")})
    if cands.count() == 0:
        return ray.data.from_pandas(empty)
    ids_ref = ray.remote(num_cpus=1)(_cand_doc_ids).remote(*cands.to_arrow_refs())

    NB = np.int64(n_buckets)

    def _bkt(ids: np.ndarray) -> np.ndarray:
        return (integer_mix(ids.astype(np.int64).view(np.uint64)) % np.uint64(NB)) \
            .astype(np.int64)

    class CandTexts:
        """Semi-filter texts to candidate docs, keyed by doc_id bucket."""

        def __init__(self) -> None:
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            did = batch["doc_id"].to_numpy()
            pos = np.searchsorted(self.ids, did)
            hit = (pos < len(self.ids)) & (self.ids[np.minimum(pos, len(self.ids) - 1)] == did)
            b = batch[hit]
            return pd.DataFrame({"bucket": _bkt(b["doc_id"].to_numpy()),
                                 "role": np.ones(len(b), np.int8),
                                 "a": b["doc_id"].to_numpy(),
                                 "b": np.zeros(len(b), np.int64),
                                 "text": b["text"].to_numpy()})

    # the semi-filter scans the corpus with full read parallelism but emits
    # only candidate rows — coalesce the many near-empty blocks before the
    # bucket-join groupbys (a sort over 462 tiny blocks measured 51 s of
    # pure scheduling at 500k docs; over ~n_buckets blocks it is ~2 s)
    texts_b = (docs_ds.select_columns(["doc_id", "text"])
               .map_batches(CandTexts, batch_format="pandas",
                            concurrency=(1, 12))
               .repartition(n_buckets).materialize())

    def pair_rows(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy()
        return pd.DataFrame({"bucket": _bkt(a), "role": np.zeros(len(a), np.int8),
                             "a": a, "b": batch["doc_b"].to_numpy(),
                             "text": np.full(len(a), "", object)})

    def attach(g: pd.DataFrame, side: str) -> pd.DataFrame:
        tx = g[g["role"] == 1]
        pr = g[g["role"] == 0]
        if len(pr) == 0:
            # empty output must carry THIS round's output schema
            if side == "a":
                return pd.DataFrame({"bucket": pd.array([], dtype="int64"),
                                     "role": pd.array([], dtype="int8"),
                                     "a": pd.array([], dtype="int64"),
                                     "b": pd.array([], dtype="int64"),
                                     "text": pd.array([], dtype=object)})
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "text_a": pd.array([], dtype=object),
                                 "text_b": pd.array([], dtype=object)})
        lut = pd.Series(tx["text"].to_numpy(), index=tx["a"].to_numpy())
        if side == "a":
            # text column now carries text_a; re-bucket by doc_b for round 2
            return pd.DataFrame({"bucket": _bkt(pr["b"].to_numpy()),
                                 "role": np.zeros(len(pr), np.int8),
                                 "a": pr["a"].to_numpy(), "b": pr["b"].to_numpy(),
                                 "text": lut.reindex(pr["a"].to_numpy()).to_numpy()})
        return pd.DataFrame({"doc_a": pr["a"].to_numpy(), "doc_b": pr["b"].to_numpy(),
                             "text_a": pr["text"].to_numpy(),
                             "text_b": lut.reindex(pr["b"].to_numpy()).to_numpy()})

    round1 = (cands.repartition(n_buckets)
              .map_batches(pair_rows, batch_format="pandas").union(texts_b)
              .groupby("bucket").map_groups(lambda g: attach(g, "a"),
                                            batch_format="pandas"))
    joined = (round1.union(texts_b).groupby("bucket")
              .map_groups(lambda g: attach(g, "b"), batch_format="pandas"))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "doc_a" not in batch.columns:
            return empty
        from ..ids import round_half_away

        # filter on the RAW jaccard, round half-away for output — the SQL
        # oracle convention (same as ngram_jaccard_dups.finish)
        jac = np.array([ngram_jaccard(a, b, k, hasher=hasher)
                        for a, b in zip(batch["text_a"], batch["text_b"])])
        keep = jac >= threshold
        return pd.DataFrame({"doc_a": batch["doc_a"].to_numpy()[keep],
                             "doc_b": batch["doc_b"].to_numpy()[keep],
                             "jaccard": round_half_away(jac[keep], 6)})

    return joined.map_batches(verify, batch_format="pandas")


def ngram_jaccard_dups(docs_ds, threshold: float = 0.5, k: int = 3,
                       n_buckets: int = 64, max_df: int | None = 1000):
    """Exact all-pairs k-gram Jaccard near-dups via an inverted shingle
    index: doc → distinct shingle hashes → posting rows (shingle, doc_id,
    n_shingles) → ``groupby(shingle-bucket)`` pair expansion per posting
    list → ``groupby(pair)`` intersection count → Jaccard filter.
    → (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥ threshold.

    Unlike :func:`minhash_near_dups` there is no candidate-generation
    approximation: every pair sharing ≥1 shingle is scored, so the result is
    the exact Jaccard-closure (SQL-expressible — the driver oracle recomputes
    it over shingle *strings*; equal barring blake2-64 collisions). Scale
    note: a shingle appearing in m docs expands m(m−1)/2 pairs, so ubiquitous
    shingles blow up quadratically — ``max_df`` (default 1000: one
    stop-shingle at corpus scale is a quadratic bomb, so the SAFE bound is
    the default; ``max_df=None`` opts into the uncut closure) drops posting
    lists longer than that bound (a standard recall-safe cut for high
    thresholds: a pair at Jaccard ≥ t shares many *rare* shingles too) and
    warn-logs the dropped posting count per bucket (no silent caps). The
    driver oracle (oracle._ngram_pair_ctes) applies the identical cut. At
    corpus scale use the banded-LSH route — measured concretely: on a 500k-doc
    Zipf corpus even max_df=1000 admits ~Σdf²/2 pair expansions in the
    mid-frequency shingle band (runaway task queue; minhash_near_dups
    finishes the same corpus in 24 s). This is the exact baseline and
    its verifier."""
    from ..ids import round_half_away

    NB = np.uint64(n_buckets)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        from .text import batch_token_hashes

        whs = batch_token_hashes(batch["text"].tolist())
        shs = [_shingle_hashes(w, k) for w in whs]
        lens = np.fromiter((len(s) for s in shs), np.int64, len(shs))
        sh = (np.concatenate(shs) if lens.sum() else np.empty(0, np.uint64))
        return pd.DataFrame({
            "bucket": (sh % NB).astype(np.int64),
            "sh": sh.view(np.int64),  # int64 bit-cast: survives pandas blocks
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), lens),
            "n_sh": np.repeat(lens, lens),
        })

    def bucket_expand(g: pd.DataFrame) -> pd.DataFrame:
        """Pair expansion + IN-BUCKET partial aggregation: one row per
        distinct pair per bucket (packed a<<32|b for the in-bucket unique;
        doc ids are table indices < 2³¹), so the final shuffle moves partial
        intersection counts, not one row per shared shingle. Shuffle keys
        stay as two separate int64 doc ids — a packed 64-bit key would pass
        through pandas float64 blocks in the aggregate and corrupt above
        2⁵³."""
        e0 = pd.DataFrame({"pbucket": pd.array([], dtype="int64"),
                           "doc_a": pd.array([], dtype="int64"),
                           "doc_b": pd.array([], dtype="int64"),
                           "na": pd.array([], dtype="int64"),
                           "nb": pd.array([], dtype="int64"),
                           "i": pd.array([], dtype="int64")})
        order = np.lexsort((g["doc_id"].to_numpy(), g["sh"].to_numpy()))
        sh = g["sh"].to_numpy()[order]
        did = g["doc_id"].to_numpy()[order]
        nsh = g["n_sh"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        ends = np.r_[starts[1:], len(sh)]
        if max_df is not None:
            n_drop = int(((ends - starts) > max_df).sum())
            if n_drop:
                import logging

                logging.getLogger(__name__).warning(
                    "ngram_jaccard_dups: dropping %d posting list(s) with "
                    "df > max_df=%d in bucket %s (recall-safe cut; pass "
                    "max_df=None for the uncut closure)",
                    n_drop, max_df, int(g["bucket"].iloc[0]))
        outs = []
        for s, e in zip(starts, ends):  # only runs (shared shingles) loop
            if e - s < 2 or (max_df is not None and e - s > max_df):
                continue
            a, b = np.triu_indices(e - s, k=1)
            outs.append((did[s:e][a].astype(np.uint64) << np.uint64(32)
                         | did[s:e][b].astype(np.uint64),
                         nsh[s:e][a], nsh[s:e][b]))
        if not outs:
            return e0
        packed = np.concatenate([o[0] for o in outs])
        na = np.concatenate([o[1] for o in outs])
        nb = np.concatenate([o[2] for o in outs])
        uk, first, cnt = np.unique(packed, return_index=True, return_counts=True)
        return pd.DataFrame({"pbucket": (integer_mix(uk) % NB).astype(np.int64),
                             "doc_a": (uk >> np.uint64(32)).astype(np.int64),
                             "doc_b": (uk & np.uint64(0xFFFFFFFF)).astype(np.int64),
                             "na": na[first], "nb": nb[first],
                             "i": cnt.astype(np.int64)})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        """Per-pair-bucket final merge, fully vectorized (Ray's built-in
        multi-column aggregate costs minutes at ~10⁶ distinct keys — the
        same hash-bucket + np.unique segment-sum pattern as stage 1 costs
        seconds)."""
        packed = (g["doc_a"].to_numpy().astype(np.uint64) << np.uint64(32)
                  | g["doc_b"].to_numpy().astype(np.uint64))
        order = np.argsort(packed, kind="stable")
        packed = packed[order]
        iv = g["i"].to_numpy()[order]
        na = g["na"].to_numpy(np.float64)[order]
        nb = g["nb"].to_numpy(np.float64)[order]
        starts = np.flatnonzero(np.r_[True, packed[1:] != packed[:-1]])
        i = np.add.reduceat(iv, starts).astype(np.float64)
        jac = i / (na[starts] + nb[starts] - i)
        keep = jac >= threshold
        uk = packed[starts][keep]
        return pd.DataFrame({"doc_a": (uk >> np.uint64(32)).astype(np.int64),
                             "doc_b": (uk & np.uint64(0xFFFFFFFF)).astype(np.int64),
                             "jaccard": round_half_away(jac[keep], 6)})

    return (docs_ds.map_batches(postings, batch_format="pandas")
            .groupby("bucket").map_groups(bucket_expand, batch_format="pandas")
            .groupby("pbucket").map_groups(finish, batch_format="pandas"))


# -- SimHash -----------------------------------------------------------------

class SimHasher:
    """64-bit simhash over token hashes (Charikar '02): sign-sum of bits,
    vectorized across the whole batch via segment sums (np.add.reduceat).

    ``token_hash="blake2"`` (default) uses the engine's blake2 token hash;
    ``"md5"`` uses ids.hash64_str_md5 (≡ DuckDB ``md5_number_lower``) so the
    whole code computation is SQL-oracle-checkable — the banding / verify
    machinery downstream is identical either way."""

    def __init__(self, token_hash: str = "blake2") -> None:
        if token_hash not in ("blake2", "md5"):
            raise ValueError(f"unknown token_hash {token_hash!r}")
        from ..ids import hash64_str_md5

        self.hasher = hash64_str_md5 if token_hash == "md5" else None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .text import batch_token_hashes

        whs = batch_token_hashes(batch["text"].tolist(), hasher=self.hasher)
        lens = np.fromiter((len(w) for w in whs), np.int64, len(whs))
        out = np.zeros(len(whs), np.uint64)
        nz = np.nonzero(lens)[0]
        if len(nz):
            flat = np.concatenate([whs[i] for i in nz])
            shifts = np.arange(64, dtype=np.uint64)
            bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
            score = np.add.reduceat(2 * bits - 1, starts, axis=0)
            out[nz] = ((score > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1)
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "simhash": pd.array(out, dtype="uint64")})


def simhash_codes(docs_ds, token_hash: str = "blake2"):
    # task pool: constants-only state (see text.py note)
    return docs_ds.map_batches(SimHasher(token_hash=token_hash).__call__,
                               batch_format="pandas")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count): byte-view
    → unpackbits → per-word sum."""
    b = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
    return b.sum(axis=1).astype(np.int64)


def simhash_near_dups(docs_ds, max_hamming: int = 3, n_chunks: int = 4,
                      token_hash: str = "blake2"):
    """SimHash near-dup pairs → (doc_a, doc_b, hamming), doc_a < doc_b,
    hamming ≤ ``max_hamming``.

    Scale shape: codes → split each 64-bit code into ``n_chunks`` equal bit
    chunks → ``groupby((chunk_id, chunk_value))`` bucket join → in-bucket
    pair expansion + vectorized XOR-popcount verify → cross-chunk pair dedup
    (one aggregate). By pigeonhole, a pair at hamming ≤ n_chunks−1 differs in
    at most n_chunks−1 chunks and therefore *shares* at least one — recall is
    EXACT for ``max_hamming ≤ n_chunks − 1`` (the banded-signature trick of
    Manku et al. WWW'07 applied to Charikar '02 codes). One shuffle moves one
    row per (doc, chunk); hot buckets (common chunk values) are the skew
    spot — same quadratic caveat as any posting-list join."""
    if max_hamming > n_chunks - 1:
        raise ValueError("exact recall needs max_hamming <= n_chunks - 1")
    cw = 64 // n_chunks
    mask = np.uint64((1 << cw) - 1)

    NBK = np.uint64(64)  # coarse shuffle buckets — many (chunk,val) each;
    # grouping by (chunk_id, chunk_val) directly makes one Python/pandas
    # call per mostly-singleton bucket (4×65k groups at 16-bit chunks —
    # measured minutes at 500k docs); this run-segmented lexsort form is
    # the same fix the LSH band join uses.

    def to_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(np.uint64)
        n = len(h)
        cid = np.tile(np.arange(n_chunks, dtype=np.int64), n)
        vals = (np.repeat(h, n_chunks) >> (cid * cw).astype(np.uint64)) & mask
        with np.errstate(over="ignore"):
            bkt = integer_mix(vals * np.uint64(KNUTH_MIX)
                              ^ cid.view(np.uint64)) % NBK
        return pd.DataFrame({
            "bkt": bkt.astype(np.int64),
            "chunk_id": cid,
            "chunk_val": vals.astype(np.int64),  # ≤16 bits → exact everywhere
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), n_chunks),
            "code": np.repeat(h, n_chunks).view(np.int64),  # bit-cast rider
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        e0 = pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                           "doc_b": pd.array([], dtype="int64"),
                           "hamming": pd.array([], dtype="int64")})
        cid = g["chunk_id"].to_numpy()
        cval = g["chunk_val"].to_numpy()
        did = g["doc_id"].to_numpy()
        code = g["code"].to_numpy()
        order = np.lexsort((did, cval, cid))
        cid, cval, did = cid[order], cval[order], did[order]
        code = code[order].view(np.uint64)
        new = np.r_[True, (cid[1:] != cid[:-1]) | (cval[1:] != cval[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(did)]
        outs = []
        for s, e in zip(starts, ends):  # only shared-value runs loop
            if e - s < 2:
                continue
            a, b = np.triu_indices(e - s, k=1)
            ham = _popcount64(code[s:e][a] ^ code[s:e][b])
            keep = ham <= max_hamming
            if keep.any():
                outs.append((did[s:e][a][keep], did[s:e][b][keep], ham[keep]))
        if not outs:
            return e0
        return pd.DataFrame({
            "doc_a": np.concatenate([o[0] for o in outs]),
            "doc_b": np.concatenate([o[1] for o in outs]),
            "hamming": np.concatenate([o[2] for o in outs])})

    pairs = (simhash_codes(docs_ds, token_hash=token_hash)
             .map_batches(to_chunks, batch_format="pandas")
             .groupby("bkt")
             .map_groups(bucket_pairs, batch_format="pandas"))
    # a pair found in k shared chunks appears k times with the SAME hamming →
    # fold the duplicate rows with a bucketed vectorized distinct (agg.py)
    from .agg import bucketed_agg

    return bucketed_agg(pairs, ["doc_a", "doc_b", "hamming"],
                        {"_n": (None, "count")}) \
        .select_columns(["doc_a", "doc_b", "hamming"])


# ---------------------------------------------------------------------------
# shared dedup downstream: pairs → groups → corpus keep-list
# ---------------------------------------------------------------------------


def dup_groups(pairs_ds, num_partitions: int = 4) -> pd.DataFrame:
    """Dup-pair Dataset (doc_a, doc_b, …) → (doc_id, canonical_id,
    group_size) for every doc appearing in ≥1 pair: dup-pair edge table →
    vertex-cut graph → distributed min-id connected components (the GAS
    engine) → per-doc canonical assignment. The shared downstream of every
    dedup route — exact n-gram Jaccard (the SQL-oracled baseline, driver
    query ``dedup_groups``), MinHash-LSH, SimHash, embedding near-dups.
    Survivor selection = ``doc_id == canonical_id``. The result is dup-docs
    only (the small side at corpus scale); use :func:`fuzzy_dedup_keep` for
    the corpus-wide keep flag."""
    from ..graph.algorithms import run_connected_components
    from ..graph.gas import build_graph

    pairs = pairs_ds.materialize()
    if pairs.count() == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "canonical_id": pd.array([], dtype="int64"),
                             "group_size": pd.array([], dtype="int64")})

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.array(np.asarray(t["doc_a"], np.int64).astype(np.uint64),
                            pa.uint64()),
            "dst": pa.array(np.asarray(t["doc_b"], np.int64).astype(np.uint64),
                            pa.uint64()),
        })

    g = build_graph(pairs.map_batches(to_edges, batch_format="pyarrow"),
                    num_partitions=num_partitions, dedup=True)
    try:
        vids, labels, _ = run_connected_components(g)
    finally:
        g.close()
    uniq, inv, cnt = np.unique(labels, return_inverse=True, return_counts=True)
    return pd.DataFrame({"doc_id": vids.astype(np.int64),
                         "canonical_id": labels.astype(np.int64),
                         "group_size": cnt[inv].astype(np.int64)})


def fuzzy_dedup_keep(docs_ds, threshold: float = 0.8, n_perm: int = 64,
                     bands: int = 16, k: int = 3, n_buckets: int = 16,
                     token_hash: str = "blake2", num_partitions: int = 4):
    """End-to-end fuzzy dedup over the WHOLE corpus, the scale route the
    ``dedup_groups`` docstring prescribes: MinHash-LSH verified near-dup
    pairs (:func:`minhash_near_dups`) → distributed connected components
    (:func:`dup_groups`) → per-doc keep flag. → Dataset (doc_id,
    canonical_id, group_size, keep); keep = 1 for each group's canonical
    (min doc_id) and for every doc with no near-dup. The group table holds
    dup docs only (dup rate ≪ 1 at corpus scale), so it is broadcast once
    via ``ray.put`` and joined in one zero-copy searchsorted map_batches
    pass — no corpus-wide shuffle after the LSH stage."""
    import ray

    pairs = minhash_near_dups(docs_ds, threshold=threshold, n_perm=n_perm,
                              bands=bands, k=k, n_buckets=n_buckets,
                              token_hash=token_hash)
    groups = dup_groups(pairs, num_partitions=num_partitions)
    gid = groups["doc_id"].to_numpy()
    order = np.argsort(gid, kind="stable")
    gref = ray.put((gid[order],
                    groups["canonical_id"].to_numpy()[order],
                    groups["group_size"].to_numpy()[order]))

    def flag(t: pa.Table) -> pa.Table:
        sid, scanon, ssize = ray.get(gref)
        ids = np.asarray(t["doc_id"], np.int64)
        canon = ids.copy()
        size = np.ones(len(ids), np.int64)
        if len(sid):
            pos = np.clip(np.searchsorted(sid, ids), 0, len(sid) - 1)
            hit = sid[pos] == ids
            canon[hit] = scanon[pos[hit]]
            size[hit] = ssize[pos[hit]]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "canonical_id": pa.array(canon, pa.int64()),
            "group_size": pa.array(size, pa.int64()),
            "keep": pa.array((canon == ids).astype(np.int64), pa.int64()),
        })

    return docs_ds.select_columns(["doc_id"]).map_batches(
        flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental dedup: materialized band index + new-batch matching
# ---------------------------------------------------------------------------


def minhash_index(docs_ds, path: str, n_perm: int = 64, bands: int = 16,
                  k: int = 3, token_hash: str = "blake2",
                  n_dirs: int = 64) -> str:
    """Materialize a corpus's banded MinHash index as partition-pruned
    Parquet: one (doc_id, band_id, bh_hi, bh_lo) row per band, laid out
    under ``bucket_dir = band_id·n_dirs + band_hash % n_dirs`` hive
    directories (≤ bands × n_dirs of them). An incremental match against a
    new batch then lists ONLY the directories the new docs hash into —
    the corpus index is never rescanned, the ingestion pattern
    production dedup runs daily (same layout trick as ann.lsh_index).
    Calling it again with the same ``path`` APPENDS (new uniquely-named
    parquet files land inside the existing ``bucket_dir=`` directories) —
    how prepare_corpus_incremental folds each day's survivors in."""
    rows_per_band = n_perm // bands
    sigs = docs_ds.map_batches(
        MinHasher(n_perm=n_perm, k=k, token_hash=token_hash).__call__,
        batch_format="pandas")

    def rows(batch: pd.DataFrame) -> pd.DataFrame:
        r = _band_rows(batch, bands, rows_per_band).drop(columns=["bkt"])
        bh = (r["bh_hi"].to_numpy(np.int64).astype(np.uint64) << np.uint64(32)) \
            | r["bh_lo"].to_numpy(np.int64).astype(np.uint64)
        r["bucket_dir"] = (r["band_id"].to_numpy(np.int64) * n_dirs
                           + (bh % np.uint64(n_dirs)).astype(np.int64))
        return r

    from .export import write_partitioned

    write_partitioned(sigs.map_batches(rows, batch_format="pandas"),
                      path, "bucket_dir")
    return path


def _empty_match_result():
    """0-row (doc_id, dup_of, jaccard) Dataset. from_arrow (not
    from_pandas) so Dataset.schema() carries the column contract
    (to_pandas() of ANY 0-row dataset is columnless on Ray 2.49 — it
    builds from iter_batches, which yields nothing)."""
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "dup_of": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64())}))


def minhash_match_index(new_docs_ds, index_path: str,
                        corpus_path: str | list[str],
                        threshold: float = 0.8, n_perm: int = 64,
                        bands: int = 16, k: int = 3,
                        token_hash: str = "blake2", n_dirs: int = 64,
                        n_buckets: int = 16, corpus_n_shards: int | None = None,
                        corpus_salt: int = 0):
    """Incremental fuzzy dedup: match a NEW doc batch against an indexed
    corpus (minhash_index at the same (n_perm, bands, k, token_hash))
    without recomputing anything corpus-wide → (doc_id, dup_of, jaccard):
    each new doc × indexed doc pair whose exact k-gram Jaccard ≥ threshold.
    New and indexed doc_ids must be disjoint.

    Scale shape: new band rows are computed inline; the index read is
    partition-pruned to the ≤ bands × n_dirs directories the new batch
    hashes into; candidates are equal (band_id, band_hash) across sides
    (coarse-bucket shuffle + run-segmented cross join — never old×old);
    verification is the exact bucketed text join of minhash_near_dups,
    reading old texts from ``corpus_path`` — shard-PRUNED when the corpus
    was written by stages/export.export_shards (pass corpus_n_shards/salt;
    only shards holding a candidate are listed)."""
    import ray
    import ray.data

    from .agg import bucketed_agg

    rows_per_band = n_perm // bands
    hasher = _token_hasher(token_hash)
    new_rows = (new_docs_ds.map_batches(
        MinHasher(n_perm=n_perm, k=k, token_hash=token_hash).__call__,
        batch_format="pandas")
        .map_batches(lambda b: _band_rows(b, bands, rows_per_band),
                     batch_format="pandas")).materialize()

    # wanted dirs: ≤ bands × n_dirs distinct values. Raw tasks over the
    # materialized block refs, NOT map_batches(...).take_all(): a fresh
    # streaming execution costs ~0.15 s of scheduling per block (measured
    # 10.4 s vs 0.9 s on 64 blocks), and each task returns only its tiny
    # unique set so driver traffic stays ≤ bands × n_dirs ints per block.
    @ray.remote(num_cpus=1)
    def dirs_of(tbl) -> np.ndarray:
        bh = (np.asarray(tbl["bh_hi"], np.int64).astype(np.uint64)
              << np.uint64(32)) \
            | np.asarray(tbl["bh_lo"], np.int64).astype(np.uint64)
        d = np.asarray(tbl["band_id"], np.int64) * n_dirs \
            + (bh % np.uint64(n_dirs)).astype(np.int64)
        return np.unique(d)

    wanted = {int(d) for a in ray.get(
        [dirs_of.remote(r) for r in new_rows.to_arrow_refs()]) for d in a}
    from .ann import _pruned_read

    idx = _pruned_read(index_path, "bucket_dir", wanted)
    if idx is None:  # new batch shares no band directory with the corpus
        return _empty_match_result()
    idx = idx.select_columns(["doc_id", "band_id", "bh_hi", "bh_lo"])

    def tag(side: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            bh = (b["bh_hi"].to_numpy(np.int64).astype(np.uint64)
                  << np.uint64(32)) \
                | b["bh_lo"].to_numpy(np.int64).astype(np.uint64)
            with np.errstate(over="ignore"):
                bkt = integer_mix(
                    bh + b["band_id"].to_numpy(np.int64).view(np.uint64)) \
                    % np.uint64(64)
            return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                                 "band_id": b["band_id"].to_numpy(np.int64),
                                 "bh_hi": b["bh_hi"].to_numpy(np.int64),
                                 "bh_lo": b["bh_lo"].to_numpy(np.int64),
                                 "bkt": bkt.astype(np.int64),
                                 "side": np.full(len(b), side, np.int8)})
        return f

    from .agg import coalesce_small

    # the union inherits pruned-read + new-batch block counts (hundreds of
    # near-empty blocks at small batch sizes) — coalesce before the groupby
    # pays its per-block sort-scheduling floor
    both = coalesce_small(
        idx.map_batches(tag(0), batch_format="pandas")
        .union(new_rows.select_columns(
            ["doc_id", "band_id", "bh_hi", "bh_lo"])
            .map_batches(tag(1), batch_format="pandas")))

    def cross_pairs(g: pd.DataFrame) -> pd.DataFrame:
        e0 = pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                           "doc_b": pd.array([], dtype="int64")})
        did = g["doc_id"].to_numpy(np.int64)
        band = g["band_id"].to_numpy(np.int64)
        hi = g["bh_hi"].to_numpy(np.int64)
        lo = g["bh_lo"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int8)
        order = np.lexsort((did, side, lo, hi, band))
        did, band, hi, lo, side = (did[order], band[order], hi[order],
                                   lo[order], side[order])
        new = np.r_[True, (band[1:] != band[:-1]) | (hi[1:] != hi[:-1])
                    | (lo[1:] != lo[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(did)]
        outs = []
        for s, e in zip(starts, ends):  # only shared (band, hash) runs loop
            olds = did[s:e][side[s:e] == 0]
            news = did[s:e][side[s:e] == 1]
            if len(olds) and len(news):
                a, b = np.meshgrid(olds, news, indexing="ij")
                outs.append((a.ravel(), b.ravel()))
        if not outs:
            return e0
        return pd.DataFrame({"doc_a": np.concatenate([o[0] for o in outs]),
                             "doc_b": np.concatenate([o[1] for o in outs])})

    pairs = bucketed_agg(
        both.groupby("bkt").map_groups(cross_pairs, batch_format="pandas"),
        ["doc_a", "doc_b"], {"_n": (None, "count")}) \
        .select_columns(["doc_a", "doc_b"]).materialize()

    if pairs.count() == 0:
        return _empty_match_result()

    # old candidate texts: shard-pruned read when the corpus is an
    # export_shards layout, plain read otherwise (the verify join's
    # semi-filter drops non-candidates either way). corpus_path may be a
    # LIST of export roots (initial corpus + prior incremental batches);
    # each root is pruned independently and the reads unioned.
    roots = [corpus_path] if isinstance(corpus_path, str) else list(corpus_path)
    if corpus_n_shards is not None:
        from .export import shard_of

        old_ids = np.unique(np.concatenate(
            [np.asarray(t["doc_a"], np.int64)
             for t in ray.get(pairs.to_arrow_refs())
             if "doc_a" in t.schema.names]))  # map_groups emits 0-col empties
        wanted_shards = np.unique(shard_of(old_ids, corpus_n_shards,
                                           corpus_salt))
        # a root holding none of the wanted shards prunes to None — skip it
        reads = [d for r in roots
                 if (d := _pruned_read(r, "shard", wanted_shards)) is not None]
    else:
        reads = [ray.data.read_parquet(r) for r in roots]
    texts = new_docs_ds.select_columns(["doc_id", "text"])
    for r in reads:
        texts = texts.union(r.select_columns(["doc_id", "text"]))

    out = _verify_candidate_pairs(pairs, texts, threshold, k, hasher,
                                  n_buckets)

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_b"].to_numpy(),
                             "dup_of": b["doc_a"].to_numpy(),
                             "jaccard": b["jaccard"].to_numpy()})

    return out.map_batches(rename, batch_format="pandas")


def _md5_rows(t: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, h_hi, h_lo): the md5 of the text split
    into two int64 halves (the same pandas-float64-safe key split the
    MinHash band rows use); md5 once per DISTINCT text per batch."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(t["text"].combine_chunks())
    dig = [hashlib.md5(x.encode()).digest()
           for x in enc.dictionary.to_pylist()]
    if dig:
        raw = np.frombuffer(b"".join(dig), np.uint8).reshape(-1, 16)
        h = raw.astype(np.uint64)
        hi = (h[:, 0:8] << (np.uint64(8) * np.arange(8, dtype=np.uint64))).sum(
            axis=1, dtype=np.uint64)
        lo = (h[:, 8:16] << (np.uint64(8) * np.arange(8, dtype=np.uint64))).sum(
            axis=1, dtype=np.uint64)
    else:
        hi = lo = np.empty(0, np.uint64)
    idx = np.asarray(enc.indices)
    return pa.table({"doc_id": t["doc_id"],
                     "h_hi": pa.array((hi >> np.uint64(32)).astype(np.int64)[idx]),
                     "h_lo": pa.array((lo & np.uint64(0xFFFFFFFF)).astype(np.int64)[idx])})


def content_index(docs_ds, path: str, n_dirs: int = 256) -> str:
    """Materialize a corpus's exact-content index: one (doc_id, h_hi, h_lo)
    md5 row per doc under ``hash_dir = h_hi % n_dirs`` hive partitions —
    the exact-dup analogue of :func:`minhash_index` for daily ingestion:
    a new batch is checked for byte-identical corpus copies by listing
    ONLY the hash directories it hashes into. Re-calls APPEND (same
    consolidated write-once-per-partition layout)."""

    def rows(t: pa.Table) -> pa.Table:
        r = _md5_rows(t)
        d = np.asarray(r["h_hi"], np.int64).view(np.uint64) % np.uint64(n_dirs)
        return r.append_column("hash_dir", pa.array(d.astype(np.int64)))

    from .export import write_partitioned

    write_partitioned(docs_ds.map_batches(rows, batch_format="pyarrow"),
                      path, "hash_dir")
    return path


def exact_match_index(new_docs_ds, index_path: str, n_dirs: int = 256):
    """Incremental exact dedup: → (doc_id, dup_of) — every new doc whose
    md5 equals an indexed doc's, with ``dup_of`` = the smallest matching
    indexed doc_id (the keep-min-id convention of :func:`exact_dedup`).
    The index read is pruned to the ≤ n_dirs hash directories the batch
    hashes into; the join reduces the old side to min-doc-per-hash before
    matching, so no old×new expansion exists anywhere. New and indexed
    doc_ids must be disjoint (md5 equality is the same criterion
    exact_dedup groups by)."""
    import ray
    import ray.data

    new_rows = new_docs_ds.map_batches(_md5_rows,
                                       batch_format="pyarrow").materialize()

    @ray.remote(num_cpus=1)
    def dirs_of(tbl) -> np.ndarray:
        d = np.asarray(tbl["h_hi"], np.int64).view(np.uint64) \
            % np.uint64(n_dirs)
        return np.unique(d.astype(np.int64))

    wanted = {int(d) for a in ray.get(
        [dirs_of.remote(r) for r in new_rows.to_arrow_refs()]) for d in a}
    from .ann import _pruned_read

    idx = _pruned_read(index_path, "hash_dir", wanted)
    if idx is None:
        import pyarrow as _pa

        return ray.data.from_arrow(_pa.table({
            "doc_id": _pa.array([], _pa.int64()),
            "dup_of": _pa.array([], _pa.int64())}))

    from .agg import coalesce_small

    def tag(side: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            hi = b["h_hi"].to_numpy(np.int64)
            with np.errstate(over="ignore"):
                bkt = integer_mix(hi.view(np.uint64)
                                  ^ b["h_lo"].to_numpy(np.int64).view(np.uint64)) \
                    % np.uint64(64)
            return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                                 "h_hi": hi, "h_lo": b["h_lo"].to_numpy(np.int64),
                                 "bkt": bkt.astype(np.int64),
                                 "side": np.full(len(b), side, np.int8)})
        return f

    both = coalesce_small(
        idx.select_columns(["doc_id", "h_hi", "h_lo"])
        .map_batches(tag(0), batch_format="pandas")
        .union(new_rows.map_batches(tag(1), batch_format="pandas")))

    def match(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["side"] == 0]
        new = g[g["side"] == 1]
        if not len(old) or not len(new):
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "dup_of": pd.array([], dtype="int64")})
        keep = old.groupby(["h_hi", "h_lo"], sort=False)["doc_id"] \
            .min().reset_index().rename(columns={"doc_id": "dup_of"})
        out = new.merge(keep, on=["h_hi", "h_lo"], how="inner")
        return out[["doc_id", "dup_of"]]

    return both.groupby("bkt").map_groups(match, batch_format="pandas")
