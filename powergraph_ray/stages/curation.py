"""Corpus-curation operators for large-scale training-data pipelines:
repetition/boilerplate metrics (the Gopher repetition rules, Rae et al.
2021 §A1.1, adapted word-level to this corpus), PII detection/redaction,
corpus vocabulary document-frequency, benchmark decontamination
(n-gram-overlap test-set filtering as described publicly for GPT-3/PaLM
training sets), and semantic deduplication (SemDeDup, Abbas et al. 2023:
cluster embeddings, then near-cosine-dup within clusters).

All per-document math is vectorized over the batch (one lexsort / one
searchsorted per batch, no per-row Python in the hot loops); the PII stage
is pure Arrow RE2 kernels over zero-copy batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..ids import KNUTH_MIX, integer_mix, round_half_away
from .dedup import _shingle_hashes
from .text import TOKEN_RE, _flatten_hashes, _segment_membership_counts, batch_token_hashes

# ---------------------------------------------------------------------------
# repetition / boilerplate metrics
# ---------------------------------------------------------------------------


def _segment_distinct_top(flat: np.ndarray, seg: np.ndarray, nd: int):
    """Per-segment (distinct value count, max value multiplicity) in one
    batch-wide lexsort — the vectorized core of the repetition metrics.
    ``seg`` must hold values in [0, nd)."""
    distinct = np.zeros(nd, np.int64)
    top = np.zeros(nd, np.int64)
    if not len(flat):
        return distinct, top
    order = np.lexsort((flat, seg))
    fs, ss = flat[order], seg[order]
    new = np.empty(len(fs), bool)
    new[0] = True
    new[1:] = (fs[1:] != fs[:-1]) | (ss[1:] != ss[:-1])
    starts = np.flatnonzero(new)
    run_seg = ss[starts]                      # sorted non-decreasing
    distinct = np.bincount(run_seg, minlength=nd).astype(np.int64)
    run_len = np.diff(np.append(starts, len(fs)))
    # per-segment max run length: runs are grouped by segment, so reduceat
    # over the first-run index of each segment; empty segments (repeated /
    # clamped indices) are masked out afterwards
    first_run = np.searchsorted(run_seg, np.arange(nd))
    idx = np.minimum(first_run, len(starts) - 1)
    top = np.maximum.reduceat(run_len, idx)
    top[distinct == 0] = 0
    return distinct, top


def _ngram_combine(flat: np.ndarray, seg: np.ndarray, n: int):
    """Rolling-combined n-gram hashes of the batch-flat token hashes (same
    multiply-xor combine as dedup._shingle_hashes) restricted to windows
    that stay inside one document."""
    if len(flat) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        acc = flat[: len(flat) - n + 1].copy()
        for i in range(1, n):
            acc = acc * np.uint64(KNUTH_MIX) ^ flat[i: len(flat) - n + 1 + i]
    valid = seg[: len(flat) - n + 1] == seg[n - 1:]
    return acc[valid], seg[: len(flat) - n + 1][valid]


class RepetitionStats:
    """(doc_id, text) → word- and n-gram-level repetition fractions:

    - ``dup_word_frac``  = 1 − distinct_words / n_words
    - ``top_word_frac``  = count(most frequent word) / n_words
    - ``dup_2gram_frac`` = 1 − distinct_2grams / n_2grams
    - ``dup_3gram_frac`` = 1 − distinct_3grams / n_3grams

    (all 0.0 when the denominator is 0; fractions rounded half-away at 6
    decimals — the SQL ``round()`` convention). These are the word-level
    Gopher repetition rules (Rae et al. 2021 §A1.1); the line-based
    variants degenerate on single-line documents, so the word/n-gram forms
    are the operative ones here. Token = lowered ``[a-z0-9_]+`` — identical
    to the quality/langid/dedup tokenizer."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        flat, lens, nd = _flatten_hashes(whs)
        seg = np.repeat(np.arange(nd), lens)
        d1, top = _segment_distinct_top(flat, seg, nd)
        g2, s2 = _ngram_combine(flat, seg, 2)
        g3, s3 = _ngram_combine(flat, seg, 3)
        d2, _ = _segment_distinct_top(g2, s2, nd)
        d3, _ = _segment_distinct_top(g3, s3, nd)
        n1 = lens
        n2 = np.bincount(s2, minlength=nd).astype(np.int64)
        n3 = np.bincount(s3, minlength=nd).astype(np.int64)

        def frac(num, den):
            return round_half_away(
                np.divide(num, den, out=np.zeros(nd, np.float64),
                          where=den > 0), 6)

        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": pd.Series(n1, index=batch.index).astype("int64"),
            "dup_word_frac": frac(n1 - d1, n1),
            "top_word_frac": frac(top, n1),
            "dup_2gram_frac": frac(n2 - d2, n2),
            "dup_3gram_frac": frac(n3 - d3, n3),
        })


def repetition_stats(docs_ds):
    # task pool: the stage holds no state beyond hash constants (see
    # text.py note) — actor spin-up would be pure per-query overhead
    return docs_ds.map_batches(RepetitionStats().__call__, batch_format="pandas")


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# RE2-compatible patterns (pyarrow.compute and DuckDB both run RE2, so the
# SQL oracle recomputes byte-identical matches)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
_REDACT_ORDER = ((EMAIL_RE, "[EMAIL]"), (IPV4_RE, "[IP]"), (PHONE_RE, "[PHONE]"))


def pii_batch(t: pa.Table) -> pa.Table:
    """Zero-copy Arrow batch → per-doc PII match counts (each pattern
    counted on the ORIGINAL text, non-overlapping RE2 scan) plus the
    redacted-text length after applying email → IPv4 → phone replacement
    in that fixed order."""
    import pyarrow.compute as pc

    text = t["text"]
    red = text
    for pat, tag in _REDACT_ORDER:
        red = pc.replace_substring_regex(red, pattern=pat, replacement=tag)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_emails": pc.count_substring_regex(text, pattern=EMAIL_RE),
        "n_ipv4": pc.count_substring_regex(text, pattern=IPV4_RE),
        "n_phones": pc.count_substring_regex(text, pattern=PHONE_RE),
        "clean_chars": pc.utf8_length(red),
    })


def pii_stats(docs_ds):
    return docs_ds.map_batches(pii_batch, batch_format="pyarrow")


def redact_pii(docs_ds):
    """(doc_id, text) → (doc_id, text) with PII spans replaced — the
    scrubbing stage itself (counts are :func:`pii_stats`)."""
    import pyarrow.compute as pc

    def red(t: pa.Table) -> pa.Table:
        text = t["text"]
        for pat, tag in _REDACT_ORDER:
            text = pc.replace_substring_regex(text, pattern=pat, replacement=tag)
        return pa.table({"doc_id": t["doc_id"], "text": text})

    return docs_ds.map_batches(red, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus vocabulary document frequency
# ---------------------------------------------------------------------------


def token_df(docs_ds, min_df: int = 2):
    """→ (token, df): number of documents containing each distinct token,
    kept when df ≥ ``min_df`` — the vocabulary-building / IDF-table stage
    of a tokenizer-training pipeline. Partial-aggregated: each batch emits
    one (token, partial df) row per distinct token in the batch (documents
    are disjoint across batches), so the shuffle moves vocabulary-sized
    rows, not corpus-sized."""
    from collections import Counter

    import pyarrow.compute as pc

    from .agg import bucketed_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        c: Counter = Counter()
        for ws in toks:
            c.update(set(ws))
        return pd.DataFrame({"token": list(c.keys()),
                             "df_part": np.fromiter(c.values(), np.int64, len(c))})

    agg = bucketed_agg(docs_ds.map_batches(partial, batch_format="pandas"),
                       ["token"], {"df": ("df_part", "sum")})
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], pa.scalar(min_df))),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(docs_ds, bench_mod: int = 17, k: int = 3,
                  threshold: float = 0.5):
    """Test-set decontamination: score every training document by the
    fraction of its distinct k-gram shingles that appear anywhere in the
    held-out benchmark slice (here ``doc_id % bench_mod == 0`` stands in
    for the eval set). → (doc_id, n_shingles, n_hits, contam_frac,
    contaminated) over training docs with ≥1 shingle.

    Scale shape: the benchmark shingle set is collected ONCE (benchmarks
    are small by construction — MBs, not corpus-sized), broadcast via
    ``ray.put``, and every training batch does one sorted-membership
    searchsorted against it — no shuffle touches the corpus. If the
    benchmark side ever outgrew a broadcast, the fallback is the
    hash-bucket semi-join used by dedup.verify_candidates."""

    def is_bench(t: pa.Table, keep: bool) -> pa.Table:
        # (pyarrow.compute ships no modulo kernel — one zero-copy numpy view)
        m = (np.asarray(t["doc_id"].combine_chunks()) % bench_mod) == 0
        return t.filter(pa.array(m if keep else ~m))

    def bench_hashes(batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        shs = [_shingle_hashes(w, k) for w in whs]
        flat = np.concatenate(shs) if shs else np.empty(0, np.uint64)
        return pd.DataFrame({"h": np.unique(flat)})

    bench_ds = (docs_ds.map_batches(lambda t: is_bench(t, True), batch_format="pyarrow")
                .map_batches(bench_hashes, batch_format="pandas"))
    # numpy batch iterator, NOT take_all(): row-dict conversion costs ~4 s
    # per 15k uint64 rows while the block fetch is milliseconds
    parts = [np.asarray(b["h"], np.uint64)
             for b in bench_ds.iter_batches(batch_size=None, batch_format="numpy")]
    table = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, np.uint64))
    tref = ray.put(table)

    class Score:
        def __init__(self) -> None:
            self.table = ray.get(tref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            whs = batch_token_hashes(batch["text"].tolist())
            shs = [_shingle_hashes(w, k) for w in whs]
            flat, lens, nd = _flatten_hashes(shs)
            hits = _segment_membership_counts(flat, lens, nd, self.table)
            frac = np.divide(hits, lens, out=np.zeros(nd, np.float64),
                             where=lens > 0)
            out = pd.DataFrame({
                "doc_id": batch["doc_id"],
                "n_shingles": pd.Series(lens, index=batch.index).astype("int64"),
                "n_hits": pd.Series(hits, index=batch.index).astype("int64"),
                "contam_frac": round_half_away(frac, 6),
                "contaminated": pd.Series((frac >= threshold).astype(np.int64),
                                          index=batch.index),
            })
            return out[out["n_shingles"] > 0]

    return (docs_ds.map_batches(lambda t: is_bench(t, False), batch_format="pyarrow")
            .map_batches(Score, batch_format="pandas", concurrency=(1, 12)))


# ---------------------------------------------------------------------------
# semantic deduplication (SemDeDup)
# ---------------------------------------------------------------------------


def semantic_dedup(emb_ds, n_clusters: int = 8, iterations: int = 5,
                   threshold: float = 0.45, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """SemDeDup (Abbas et al. 2023): k-means over the embedding column,
    then near-cosine-duplicate pairs WITHIN each cluster, closed into
    groups → (vec_id, canonical_id = min id of the dup group, cluster) for
    every member of a multi-element group.

    Scale shape: cluster assignment is recomputed per batch from the
    broadcast (k, d) centroid matrix (no O(N) lookup table anywhere — same
    rule as the IVF index path, kmeans.nearest_cell); the only shuffle is
    the per-cluster groupby. Within-cluster pair scan is a chunked
    normalized matmul; at corpus scale a cluster that outgrows one group
    task sub-buckets through the ann.embedding_near_dups grid self-join
    with the cluster id folded into the cell key."""
    from .kmeans import _to_matrix, kmeans, nearest_cell

    cents, _assign, _inertia = kmeans(emb_ds, k=n_clusters,
                                      iterations=iterations,
                                      id_col=id_col, vec_col=vec_col)
    cref = ray.put(np.ascontiguousarray(cents))

    def tag(t: pa.Table) -> pa.Table:
        x = _to_matrix(t, vec_col)
        cell, _ = nearest_cell(x, ray.get(cref))
        return pa.table({id_col: t[id_col], vec_col: t[vec_col],
                         "cluster": pa.array(cell.astype(np.int64))})

    def group_dups(g: pd.DataFrame) -> pd.DataFrame:
        vid = g[id_col].to_numpy().astype(np.int64)
        m = np.stack([np.asarray(v, np.float64) for v in g[vec_col]])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        n = len(vid)
        parent = np.arange(n)

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        CH = 2048
        for s in range(0, n, CH):
            sims = mn[s: s + CH] @ mn.T
            ii, jj = np.nonzero(sims >= threshold)
            for a, b in zip(ii + s, jj):
                if a < b:
                    ra, rb = find(int(a)), find(int(b))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        roots = np.fromiter((find(int(i)) for i in range(n)), np.int64, n)
        # canonical = min vec_id within each root group
        canon = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(canon, roots, vid)
        size = np.bincount(roots, minlength=n)
        keep = size[roots] > 1
        return pd.DataFrame({
            "vec_id": vid[keep],
            "canonical_id": canon[roots[keep]],
            "cluster": np.repeat(np.int64(g["cluster"].iloc[0]), int(keep.sum())),
        })

    return (emb_ds.map_batches(tag, batch_format="pyarrow")
            .groupby("cluster").map_groups(group_dups, batch_format="pandas"))


# ---------------------------------------------------------------------------
# cross-document boilerplate fraction
# ---------------------------------------------------------------------------


def boilerplate_stats(docs_ds, k: int = 3, min_df: int = 5,
                      n_buckets: int = 64):
    """→ (doc_id, n_shingles, n_common, common_frac): fraction of each
    document's distinct k-gram shingles whose corpus document-frequency is
    ≥ ``min_df`` — the cross-document complement of RepetitionStats
    (within-doc repetition): a high common fraction marks boilerplate /
    template text repeated across the corpus.

    Scale shape: distinct (shingle, doc) posting rows are bucketed by
    shingle hash so every posting list lands in one group (same key layout
    as dedup.ngram_jaccard_dups); each group computes df per shingle with
    one lexsort and emits per-doc PARTIAL (n, n_common) rows, so the final
    ``groupby`` shuffle moves two ints per (doc, bucket) — never
    corpus-sized rows. Both reductions are hash-bucket ``map_groups`` with
    vectorized in-group sums: Ray's pandas ``aggregate()`` path measured
    ~25 s on the 320k partial rows at sf0.1 (per-row combine) vs ~0.3 s
    for the bincount form."""
    NB = np.uint64(n_buckets)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        shs = [_shingle_hashes(w, k) for w in whs]
        flat, lens, nd = _flatten_hashes(shs)
        return pd.DataFrame({
            "bucket": (flat % NB).astype(np.int64),
            "sh": flat.view(np.int64),
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), lens),
        })

    def bucket_df(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        did = g["doc_id"].to_numpy()
        order = np.argsort(sh, kind="stable")
        sh, did = sh[order], did[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        df = np.diff(np.append(starts, len(sh)))
        common = np.repeat(df >= min_df, df)
        uid, inv = np.unique(did, return_inverse=True)
        return pd.DataFrame({
            "dbkt": (uid % np.int64(n_buckets)),
            "doc_id": uid,
            "n_part": np.bincount(inv, minlength=len(uid)).astype(np.int64),
            "common_part": np.bincount(inv, weights=common,
                                       minlength=len(uid)).astype(np.int64),
        })

    def doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        uid, inv = np.unique(did, return_inverse=True)
        n = np.bincount(inv, weights=g["n_part"].to_numpy()).astype(np.int64)
        c = np.bincount(inv, weights=g["common_part"].to_numpy()).astype(np.int64)
        return pd.DataFrame({
            "doc_id": uid,
            "n_shingles": n,
            "n_common": c,
            "common_frac": round_half_away(c / np.maximum(n, 1), 6),
        })

    return (docs_ds.map_batches(postings, batch_format="pandas")
            .groupby("bucket").map_groups(bucket_df, batch_format="pandas")
            .groupby("dbkt").map_groups(doc_sum, batch_format="pandas"))


# ---------------------------------------------------------------------------
# unigram-LM quality scoring
# ---------------------------------------------------------------------------


def unigram_logprob(docs_ds, alpha: float = 1.0):
    """→ (doc_id, n_tokens, logprob): per-document mean token
    log-probability under the corpus unigram LM with add-``alpha``
    smoothing, ``p(w) = (c_w + alpha) / (N + alpha·V)`` — the CCNet-style
    LM-quality proxy (very low mean logprob = gibberish / OOD text; very
    high = boilerplate), over docs with ≥1 token.

    Scale shape: per-batch partial token counts shuffle vocabulary-sized
    rows into a ``groupby(hash).sum``; the resulting (hash → logprob) table
    is vocabulary-sized (MBs even at corpus scale — Heaps' law), collected
    via a numpy batch iterator and broadcast once via ``ray.put``; the
    scoring pass is one searchsorted + segment-sum per batch."""
    from .agg import bucketed_agg

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        flat, _, _ = _flatten_hashes(whs)
        h, c = np.unique(flat, return_counts=True)
        return pd.DataFrame({"h": h.view(np.int64),
                             "c_part": c.astype(np.int64)})

    cnt_ds = bucketed_agg(docs_ds.map_batches(counts, batch_format="pandas"),
                          ["h"], {"c": ("c_part", "sum")})
    hs, cs = [], []
    for b in cnt_ds.iter_batches(batch_size=None, batch_format="numpy"):
        hs.append(np.asarray(b["h"], np.int64).view(np.uint64))
        cs.append(np.asarray(b["c"], np.int64))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    c = np.concatenate(cs) if cs else np.empty(0, np.int64)
    order = np.argsort(h)
    h, c = h[order], c[order]
    N, V = int(c.sum()), len(h)
    logp = np.log((c + alpha) / (N + alpha * V))
    tref = ray.put((h, logp))

    class Score:
        def __init__(self) -> None:
            self.h, self.logp = ray.get(tref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            whs = batch_token_hashes(batch["text"].tolist())
            flat, lens, nd = _flatten_hashes(whs)
            seg = np.repeat(np.arange(nd), lens)
            pos = np.searchsorted(self.h, flat)  # every token is in-vocab
            sums = np.bincount(seg, weights=self.logp[pos], minlength=nd)
            out = pd.DataFrame({
                "doc_id": batch["doc_id"],
                "n_tokens": pd.Series(lens, index=batch.index).astype("int64"),
                "logprob": round_half_away(
                    np.divide(sums, lens, out=np.zeros(nd, np.float64),
                              where=lens > 0), 6),
            })
            return out[out["n_tokens"] > 0]

    return docs_ds.map_batches(Score, batch_format="pandas",
                               concurrency=(1, 12))


def bigram_logprob(docs_ds, alpha: float = 1.0):
    """→ (doc_id, n_bigrams, logprob): per-document mean BIGRAM conditional
    log-probability ``mean ln p(w_i | w_{i-1})`` with add-``alpha`` smoothing
    ``p(w2|w1) = (c(w1,w2) + alpha) / (ctx(w1) + alpha·V)`` (V = unigram
    vocabulary, ctx counts each token's occurrences as a bigram left
    context) — one LM order up from :func:`unigram_logprob`, the closer
    stand-in for CCNet's KenLM perplexity filter (a 5-gram LM with Kneser-
    Ney; add-α bigrams keep the table one shuffle and the SQL replay exact).
    Docs with < 2 tokens are dropped.

    Scale shape: identical to unigram_logprob — per-batch partial pair
    counts (pair key = ``h1·K ^ h2`` uint64 rolling combine) +
    vocabulary-sized context counts through ONE bucketed_agg each; both
    tables are Heaps-law-sized, broadcast once via ``ray.put``; scoring is
    one searchsorted + segment-sum per batch."""
    from ..ids import KNUTH_MIX
    from .agg import bucketed_agg
    from .text import _flatten_hashes, batch_token_hashes

    K = np.uint64(KNUTH_MIX)

    def pair_keys(wh: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (wh[:-1] * K) ^ wh[1:]

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        pairs = [pair_keys(wh) for wh in whs if len(wh) >= 2]
        ctxs = [wh[:-1] for wh in whs if len(wh) >= 2]
        uni = [wh for wh in whs]
        pk = (np.concatenate(pairs) if pairs else np.empty(0, np.uint64))
        ck = (np.concatenate(ctxs) if ctxs else np.empty(0, np.uint64))
        uk = (np.concatenate(uni) if uni else np.empty(0, np.uint64))
        hp, cp = np.unique(pk, return_counts=True)
        hc, cc = np.unique(ck, return_counts=True)
        hu = np.unique(uk)
        # one shuffle: kind 0 = bigram, 1 = context, 2 = vocab presence
        return pd.DataFrame({
            "kind": np.r_[np.zeros(len(hp), np.int64),
                          np.ones(len(hc), np.int64),
                          np.full(len(hu), 2, np.int64)],
            "h": np.r_[hp.view(np.int64), hc.view(np.int64),
                       hu.view(np.int64)],
            "c_part": np.r_[cp, cc, np.ones(len(hu), np.int64)].astype(np.int64),
        })

    cnt_ds = bucketed_agg(docs_ds.map_batches(counts, batch_format="pandas"),
                          ["kind", "h"], {"c": ("c_part", "sum")})
    kb, hb, cb = [], [], []
    for b in cnt_ds.iter_batches(batch_size=None, batch_format="numpy"):
        kb.append(np.asarray(b["kind"], np.int64))
        hb.append(np.asarray(b["h"], np.int64).view(np.uint64))
        cb.append(np.asarray(b["c"], np.int64))
    kind = np.concatenate(kb) if kb else np.empty(0, np.int64)
    h = np.concatenate(hb) if hb else np.empty(0, np.uint64)
    c = np.concatenate(cb) if cb else np.empty(0, np.int64)
    hp, cp = h[kind == 0], c[kind == 0]
    hc, cc = h[kind == 1], c[kind == 1]
    # vocab rows carry max-1 per batch? no — counts sum batch presence;
    # V = number of DISTINCT unigram hashes (the rows themselves)
    V = int((kind == 2).sum())
    op = np.argsort(hp)
    hp, cp = hp[op], cp[op]
    oc = np.argsort(hc)
    hc, cc = hc[oc], cc[oc]
    tref = ray.put((hp, cp, hc, cc, V))

    class Score:
        def __init__(self) -> None:
            self.hp, self.cp, self.hc, self.cc, self.V = ray.get(tref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            whs = batch_token_hashes(batch["text"].tolist())
            keep = [i for i, wh in enumerate(whs) if len(wh) >= 2]
            if not keep:
                return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                     "n_bigrams": pd.Series([], dtype="int64"),
                                     "logprob": pd.Series([], dtype="float64")})
            pairs = [pair_keys(whs[i]) for i in keep]
            ctxs = [whs[i][:-1] for i in keep]
            lens = np.fromiter((len(p) for p in pairs), np.int64, len(pairs))
            fp = np.concatenate(pairs)
            fc = np.concatenate(ctxs)
            seg = np.repeat(np.arange(len(keep)), lens)
            cpair = self.cp[np.searchsorted(self.hp, fp)]
            cctx = self.cc[np.searchsorted(self.hc, fc)]
            lp = np.log((cpair + alpha) / (cctx + alpha * self.V))
            sums = np.bincount(seg, weights=lp, minlength=len(keep))
            return pd.DataFrame({
                "doc_id": batch["doc_id"].iloc[keep].to_numpy(),
                "n_bigrams": lens,
                "logprob": round_half_away(sums / lens, 6),
            })

    return docs_ds.map_batches(Score, batch_format="pandas",
                               concurrency=(1, 12))


# ---------------------------------------------------------------------------
# DSIR importance scoring
# ---------------------------------------------------------------------------


def dsir_logratio(docs_ds, target_lang: str = "en", alpha: float = 1.0):
    """→ (doc_id, n_tokens, dsir_score): per-document mean token
    log-importance ``ln p_target(w) − ln p_raw(w)`` — the DSIR
    data-selection weight (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"; unigram features here), with the
    target LM estimated from the docs whose ``lang == target_lang``, the
    raw LM from the whole corpus, and add-``alpha`` smoothing over the
    shared corpus vocabulary. Docs with ≥1 token; 6-dp half-away rounding.

    Scale shape (same as unigram_logprob): ONE counting pass emits
    vocabulary-sized partial rows (hash, c_all, c_target) → groupby-sum →
    the (hash → log-ratio) table is vocabulary-sized (MBs at corpus scale,
    Heaps' law), collected via a numpy batch iterator and broadcast once
    via ``ray.put`` → scoring is one searchsorted + segment-sum per batch.
    ``docs_ds`` must carry (doc_id, text, lang).
    """
    from .agg import bucketed_agg

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        flat, lens, _ = _flatten_hashes(whs)
        is_tgt = np.repeat((batch["lang"] == target_lang).to_numpy(), lens)
        h, inv = np.unique(flat, return_inverse=True)
        return pd.DataFrame({
            "h": h.view(np.int64),
            "ca_part": np.bincount(inv, minlength=len(h)).astype(np.int64),
            "ct_part": np.bincount(inv[is_tgt],
                                   minlength=len(h)).astype(np.int64),
        })

    cnt_ds = bucketed_agg(docs_ds.map_batches(counts, batch_format="pandas"),
                          ["h"], {"ca": ("ca_part", "sum"),
                                  "ct": ("ct_part", "sum")})
    hs, cas, cts = [], [], []
    for b in cnt_ds.iter_batches(batch_size=None, batch_format="numpy"):
        hs.append(np.asarray(b["h"], np.int64).view(np.uint64))
        cas.append(np.asarray(b["ca"], np.int64))
        cts.append(np.asarray(b["ct"], np.int64))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    ca = np.concatenate(cas) if cas else np.empty(0, np.int64)
    ct = np.concatenate(cts) if cts else np.empty(0, np.int64)
    order = np.argsort(h)
    h, ca, ct = h[order], ca[order], ct[order]
    v = len(h)
    n_all, n_tgt = int(ca.sum()), int(ct.sum())
    lr = (np.log((ct + alpha) / (n_tgt + alpha * v))
          - np.log((ca + alpha) / (n_all + alpha * v)))
    tref = ray.put((h, lr))

    class Score:
        def __init__(self) -> None:
            self.h, self.lr = ray.get(tref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            whs = batch_token_hashes(batch["text"].tolist())
            flat, lens, nd = _flatten_hashes(whs)
            seg = np.repeat(np.arange(nd), lens)
            pos = np.searchsorted(self.h, flat)  # every token is in-vocab
            sums = np.bincount(seg, weights=self.lr[pos], minlength=nd)
            out = pd.DataFrame({
                "doc_id": batch["doc_id"],
                "n_tokens": pd.Series(lens, index=batch.index).astype("int64"),
                "dsir_score": round_half_away(
                    np.divide(sums, lens, out=np.zeros(nd, np.float64),
                              where=lens > 0), 6),
            })
            return out[out["n_tokens"] > 0]

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        Score, batch_format="pandas", concurrency=(1, 12))


# ---------------------------------------------------------------------------
# exact-substring duplicate spans
# ---------------------------------------------------------------------------


def duplicate_spans(docs_ds, k: int = 10, min_df: int = 2,
                    n_buckets: int = 64):
    """→ (doc_id, start, end): maximal token-index spans ``[start, end)``
    covered by k-gram windows that occur in ≥ ``min_df`` distinct documents
    — the span-level exact-substring-dedup view (Lee et al. 2022 use suffix
    arrays for ≥50-token matches; fixed-k windows are the standard
    distributed approximation: any cross-doc-shared run of ≥ k tokens is
    exactly the union of its shared k-windows, so spans are recall-exact at
    granularity k). Docs shorter than k tokens produce no spans.

    Shuffle shape (same as boilerplate_stats): one posting row per token
    position → ONE kgram-bucket shuffle → per-bucket distinct-doc df +
    duplicated-position emit → ONE doc-bucket shuffle → per-doc vectorized
    span merge (windows have fixed length k, so runs merge where adjacent
    start positions differ ≤ k — no sequential scan).
    """
    NBK = np.uint64(n_buckets)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({"bkt": pd.array([], dtype="int64"),
                          "kh": pd.array([], dtype="int64"),
                          "doc_id": pd.array([], dtype="int64"),
                          "pos": pd.array([], dtype="int64")})
        whs = batch_token_hashes(batch["text"].tolist())
        flat, lens, nd = _flatten_hashes(whs)
        L = len(flat)
        if L < k:
            return e
        seg = np.repeat(np.arange(nd), lens)
        with np.errstate(over="ignore"):
            acc = flat[: L - k + 1].copy()
            for i in range(1, k):
                acc = acc * np.uint64(KNUTH_MIX) ^ flat[i: L - k + 1 + i]
        valid = seg[: L - k + 1] == seg[k - 1:]
        if not valid.any():
            return e
        widx = np.flatnonzero(valid)
        wseg = seg[widx]
        kh = integer_mix(acc[widx])
        doc_start = np.concatenate([[0], np.cumsum(lens)])[wseg]
        return pd.DataFrame({
            "bkt": (kh % NBK).astype(np.int64),
            "kh": kh.view(np.int64),
            "doc_id": batch["doc_id"].to_numpy()[wseg],
            "pos": (widx - doc_start).astype(np.int64),
        })

    def bucket_mark(g: pd.DataFrame) -> pd.DataFrame:
        kh = g["kh"].to_numpy()
        did = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        order = np.lexsort((did, kh))
        khs, dids = kh[order], did[order]
        # distinct-doc df per kh from the sorted (kh, doc) pairs
        pair_new = np.r_[True, (khs[1:] != khs[:-1]) | (dids[1:] != dids[:-1])]
        pair_kh = khs[pair_new]
        kh_new = np.r_[True, pair_kh[1:] != pair_kh[:-1]]
        uniq_kh = pair_kh[kh_new]
        df = np.diff(np.append(np.flatnonzero(kh_new), len(pair_kh)))
        common = uniq_kh[df >= min_df]
        if len(common) == 0:
            return pd.DataFrame({"dbkt": pd.array([], dtype="int64"),
                                 "doc_id": pd.array([], dtype="int64"),
                                 "pos": pd.array([], dtype="int64")})
        p = np.searchsorted(common, kh)
        hit = (p < len(common)) & (common[np.minimum(p, len(common) - 1)] == kh)
        return pd.DataFrame({"dbkt": (did[hit] % np.int64(n_buckets)),
                             "doc_id": did[hit], "pos": pos[hit]})

    def doc_spans(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        order = np.lexsort((pos, did))
        did, pos = did[order], pos[order]
        # fixed-length windows: a run breaks on doc change or a gap > k
        new = np.r_[True, (did[1:] != did[:-1]) | (pos[1:] - pos[:-1] > k)]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(pos)]
        return pd.DataFrame({"doc_id": did[starts],
                             "start": pos[starts],
                             "end": pos[ends - 1] + k})

    return (docs_ds.map_batches(postings, batch_format="pandas")
            .groupby("bkt").map_groups(bucket_mark, batch_format="pandas")
            .groupby("dbkt").map_groups(doc_spans, batch_format="pandas"))


# ---------------------------------------------------------------------------
# end-to-end corpus quality gate
# ---------------------------------------------------------------------------


def curate_stats(texts: list, min_tokens: int = 10, max_tokens: int = 100_000,
                 max_dup_word_frac: float = 0.35,
                 max_top_word_frac: float = 0.2, drop_pii: bool = True):
    """Vectorized per-batch core of the quality gate → (n_tokens,
    dup_word_frac, top_word_frac, n_pii, keep) ndarrays for a list of texts
    — one tokenize/hash pass + Arrow RE2 PII counts. Shared by
    :func:`curate_corpus` (stats table) and ``pipelines.prepare``'s fused
    filter pass (no stats/corpus join needed: decisions recompute inline)."""
    import pyarrow.compute as pc

    whs = batch_token_hashes(texts)
    flat, lens, nd = _flatten_hashes(whs)
    seg = np.repeat(np.arange(nd), lens)
    d1, top = _segment_distinct_top(flat, seg, nd)
    dup = round_half_away(np.divide(
        (lens - d1).astype(np.float64), lens,
        out=np.zeros(nd), where=lens > 0), 6)
    topf = round_half_away(np.divide(
        top.astype(np.float64), lens, out=np.zeros(nd), where=lens > 0), 6)
    text = pa.array(texts, pa.string())
    npii = (np.asarray(pc.count_substring_regex(text, pattern=EMAIL_RE))
            + np.asarray(pc.count_substring_regex(text, pattern=IPV4_RE))
            + np.asarray(pc.count_substring_regex(text, pattern=PHONE_RE))
            ).astype(np.int64)
    keep = ((lens >= min_tokens) & (lens <= max_tokens)
            & (dup <= max_dup_word_frac) & (topf <= max_top_word_frac))
    if drop_pii:
        keep &= npii == 0
    return lens, dup, topf, npii, keep


def curate_corpus(docs_ds, min_tokens: int = 10, max_tokens: int = 100_000,
                  max_dup_word_frac: float = 0.35,
                  max_top_word_frac: float = 0.2, drop_pii: bool = True):
    """→ (doc_id, n_tokens, dup_word_frac, top_word_frac, n_pii, keep): the
    end-to-end quality gate a training pipeline applies before tokenization
    — Gopher-style length/repetition rules + a PII gate FUSED into one
    tokenize/hash pass per batch (no joins between rule stages; the PII
    scan is Arrow RE2 on the same zero-copy text column). ``keep`` = 1 iff
    every rule passes; rules compare the 6-dp-rounded fractions the SQL
    oracle also computes, so decisions are exact, not tolerance-matched."""

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        lens, dup, topf, npii, keep = curate_stats(
            batch["text"].tolist(), min_tokens, max_tokens,
            max_dup_word_frac, max_top_word_frac, drop_pii)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": pd.Series(lens, index=batch.index).astype("int64"),
            "dup_word_frac": dup,
            "top_word_frac": topf,
            "n_pii": pd.Series(npii, index=batch.index),
            "keep": pd.Series(keep.astype(np.int64), index=batch.index),
        })

    return docs_ds.map_batches(kernel, batch_format="pandas")


# ---------------------------------------------------------------------------
# cross-document line-level dedup (CCNet-style)
# ---------------------------------------------------------------------------

_LINE_TRIM = " \t\r\v\f"  # intra-line whitespace; '\n' is the separator


def _batch_line_hashes(texts: list):
    """Split a batch's texts on '\\n' and hash every line's NORMALIZED form
    (trim + lower, Arrow C kernels) in one dictionary-encoded pass →
    (flat raw lines, per-doc line counts, flat normalized-line hashes,
    flat is-empty-normalized mask)."""
    import pyarrow.compute as pc

    from ..ids import hash64_str_array

    lines = [t.split("\n") for t in texts]
    lens = np.fromiter((len(x) for x in lines), np.int64, len(lines))
    flat = [l for ls in lines for l in ls]
    if not flat:
        return flat, lens, np.empty(0, np.uint64), np.empty(0, bool)
    norm = pc.utf8_lower(pc.utf8_trim(pa.array(flat, pa.string()), _LINE_TRIM))
    lh = hash64_str_array(norm)
    empty = np.asarray(pc.equal(norm, "").to_numpy(zero_copy_only=False))
    return flat, lens, lh, empty


def line_dedup(docs_ds, min_df: int = 2, n_buckets: int = 64):
    """→ (doc_id, text, n_lines, n_dropped): cross-document line-level
    dedup — the CCNet preprocessing step (Wenzek et al. 2019): drop every
    line whose normalized form (trim + lowercase) occurs in ≥ ``min_df``
    DISTINCT documents (headers, nav bars, license banners), rebuilding
    each document from its surviving lines in original order.
    Whitespace-only lines are never counted or dropped (they are
    formatting, not boilerplate).

    Scale shape: pass 1 emits one (bucket, line-hash) row per DISTINCT
    (doc, line) — never duplicate lines within a doc — and computes
    per-hash document frequency inside ``n_buckets`` coarse hash buckets
    (one np.unique per bucket); the flagged table (hashes with df ≥
    min_df) is the corpus's *repeated-line* vocabulary — boilerplate is
    by construction a small distinct set (MBs at corpus scale; cf. the
    unigram_logprob vocabulary argument), collected once and broadcast
    via ``ray.put``. Pass 2 re-splits each batch, flags lines with one
    searchsorted, and rebuilds the kept text — no corpus-wide shuffle of
    line text ever happens."""
    NB = np.uint64(n_buckets)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        _, lens, lh, empty = _batch_line_hashes(batch["text"].tolist())
        nd = len(batch)
        if not len(lh):
            return pd.DataFrame({"bucket": pd.array([], dtype="int64"),
                                 "lh": pd.array([], dtype="int64")})
        seg = np.repeat(np.arange(nd), lens)
        seg, lh = seg[~empty], lh[~empty]
        if not len(lh):
            return pd.DataFrame({"bucket": pd.array([], dtype="int64"),
                                 "lh": pd.array([], dtype="int64")})
        # distinct (doc, line) pairs: each doc lives in exactly one batch
        order = np.lexsort((lh, seg))
        seg, lh = seg[order], lh[order]
        first = np.r_[True, (seg[1:] != seg[:-1]) | (lh[1:] != lh[:-1])]
        lh = lh[first]
        return pd.DataFrame({"bucket": (lh % NB).astype(np.int64),
                             "lh": lh.view(np.int64)})

    def bucket_flagged(g: pd.DataFrame) -> pd.DataFrame:
        h, c = np.unique(g["lh"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"lh": h[c >= min_df]})

    flagged_ds = (docs_ds.map_batches(postings, batch_format="pandas")
                  .groupby("bucket").map_groups(bucket_flagged,
                                                batch_format="pandas"))
    parts = [np.asarray(b["lh"], np.int64).view(np.uint64)
             for b in flagged_ds.iter_batches(batch_size=None,
                                              batch_format="numpy")
             if "lh" in b]
    flagged = np.sort(np.concatenate(parts)) if parts \
        else np.empty(0, np.uint64)
    fref = ray.put(flagged)

    class Rewrite:
        def __init__(self) -> None:
            self.flagged = ray.get(fref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            flat, lens, lh, empty = _batch_line_hashes(
                batch["text"].tolist())
            nd = len(batch)
            if not len(lh):
                return pd.DataFrame({
                    "doc_id": batch["doc_id"],
                    "text": batch["text"],
                    "n_lines": pd.Series(lens, index=batch.index,
                                         dtype="int64"),
                    "n_dropped": pd.Series(np.zeros(nd), index=batch.index,
                                           dtype="int64")})
            t = self.flagged
            pos = np.searchsorted(t, lh)
            hit = np.zeros(len(lh), bool)
            if len(t):
                inb = pos < len(t)
                hit[inb] = t[pos[inb]] == lh[inb]
            drop = hit & ~empty
            seg = np.repeat(np.arange(nd), lens)
            n_dropped = np.bincount(seg[drop], minlength=nd).astype(np.int64)
            texts, start = [], 0
            for L, ndrop in zip(lens, n_dropped):
                ls = flat[start:start + L]
                if ndrop:
                    m = drop[start:start + L]
                    ls = [l for l, d in zip(ls, m) if not d]
                texts.append("\n".join(ls))
                start += L
            return pd.DataFrame({
                "doc_id": batch["doc_id"],
                "text": pd.Series(texts, index=batch.index),
                "n_lines": pd.Series(lens, index=batch.index).astype("int64"),
                "n_dropped": pd.Series(n_dropped,
                                       index=batch.index).astype("int64"),
            })

    return docs_ds.map_batches(Rewrite, batch_format="pandas",
                               concurrency=(1, 12))
