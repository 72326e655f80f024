"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline companions to the link-graph engine (task brief):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All vectorized ``map_batches`` stages; the stateful ones
(compiled regexes, stopword tables) are callable classes run as actor pools.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ids import round_half_away

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
PUNCT_RE = re.compile(r"[.!?,;:]")
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "for")


def batch_token_hashes(texts, lowercase: bool = True, hasher=None) -> list[np.ndarray]:
    """Tokenize every text of a batch and hash ALL tokens in one
    dictionary-encoded pass over the batch vocabulary (ids.hash64_str_array)
    — the per-token cost collapses to per-distinct-token-per-batch, the
    dominant CPU saver for MinHash / fingerprints. ``hasher`` defaults to
    blake2 (ids.hash64_str); pass ids.hash64_str_md5 where a SQL oracle
    must recompute identical hashes."""
    from ..ids import hash64_str_array

    toks = [TOKEN_RE.findall(t.lower() if lowercase else t) for t in texts]
    if not toks:
        return []
    lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    flat = [w for ws in toks for w in ws]
    wh = hash64_str_array(flat, hasher) if flat else np.empty(0, np.uint64)
    return np.split(wh, np.cumsum(lens)[:-1])

def _flatten_hashes(whs: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-doc hash arrays → (flat concat, doc lengths, n_docs)."""
    nd = len(whs)
    lens = np.fromiter((len(w) for w in whs), np.int64, nd)
    flat = np.concatenate(whs) if nd and int(lens.sum()) else np.empty(0, np.uint64)
    return flat, lens, nd


def _segment_membership_counts(flat: np.ndarray, lens: np.ndarray, nd: int,
                               table: np.ndarray) -> np.ndarray:
    """Per-doc count of hashes present in the sorted ``table`` — one
    batch-wide searchsorted + segment bincount; no per-doc Python loop."""
    out = np.zeros(nd, np.int64)
    if not len(flat) or not len(table):
        return out
    pos = np.searchsorted(table, flat)
    hit = (pos < len(table)) & (table[np.minimum(pos, len(table) - 1)] == flat)
    seg = np.repeat(np.arange(nd), lens)
    return np.bincount(seg[hit], minlength=nd).astype(np.int64)


# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (public fastText-style idea, reduced to a deterministic table)
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "pour", "que", "une"},
    "es": {"el", "la", "de", "que", "los", "es", "una", "por", "con", "para"},
}


class TokenStats:
    """(doc_id, text) → (doc_id, n_tokens, n_chars): token = ``[A-Za-z0-9_]+``."""

    def __init__(self) -> None:
        self.tok = TOKEN_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.findall(self.tok)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": toks.str.len().astype("int64"),
            "n_chars": batch["text"].str.len().astype("int64"),
        })


class QualityScore:
    """Length / punctuation / stopword-ratio quality features
    (the standard pretraining-corpus quality heuristics, e.g. Gopher rules)."""

    def __init__(self) -> None:
        from ..ids import hash64_str

        self.tok = TOKEN_RE
        self.punct = PUNCT_RE
        self.stop_h = np.sort(np.fromiter((hash64_str(w) for w in STOPWORDS),
                                          np.uint64, len(STOPWORDS)))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        flat, lens, nd = _flatten_hashes(whs)
        n_words = pd.Series(lens, index=batch.index).astype("int64")
        # vectorized membership against the tiny sorted stopword-hash table
        n_stop = pd.Series(
            _segment_membership_counts(flat, lens, nd, self.stop_h),
            index=batch.index).astype("int64")
        n_punct = batch["text"].str.count(self.punct).astype("int64")
        stop_ratio = round_half_away((n_stop / n_words.clip(lower=1)).to_numpy(), 6)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "n_stopwords": n_stop,
            "n_punct": n_punct,
            "stop_ratio": stop_ratio,
        })


class LangId:
    """Stopword-profile language-ID heuristic; deterministic argmax with
    (score DESC, lang ASC) tie-break, 'und' when no profile word hits."""

    def __init__(self) -> None:
        from ..ids import hash64_str

        self.tok = TOKEN_RE
        self.langs = sorted(LANG_PROFILES)
        # per-language sorted profile-hash tables (once per actor)
        self.prof_h = [np.sort(np.fromiter((hash64_str(w) for w in LANG_PROFILES[l]),
                                           np.uint64, len(LANG_PROFILES[l])))
                       for l in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        flat, lens, nd = _flatten_hashes(whs)
        # occurrence counts per (doc, lang): one batch-wide searchsorted +
        # segment bincount per language (langs are few, docs are many);
        # argmax takes the first (lang ASC) maximum, 'und' when all zero
        scores = np.stack(
            [_segment_membership_counts(flat, lens, nd, ph)
             for ph in self.prof_h], axis=1) if nd else np.empty((0, len(self.langs)), np.int64)
        best = scores.argmax(axis=1) if nd else np.empty(0, np.int64)
        hit = scores.max(axis=1) > 0 if nd else np.empty(0, bool)
        langs = np.asarray(self.langs)
        preds = np.where(hit, langs[best], "und")
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


class Fingerprint:
    """64-bit rolling polynomial fingerprint of the token sequence (Rabin
    style, base 1099511628211 — the FNV prime):
    ``fp = OFFSET·B^n + Σ h(w_i)·B^(n-1-i) (mod 2^64)`` over blake2-derived
    word hashes — content identity robust to whitespace differences. The
    polynomial form makes the whole combine a vectorized power-weighted sum
    (no per-token Python loop)."""

    BASE = np.uint64(1099511628211)
    OFFSET = np.uint64(14695981039346656037)

    def __init__(self, token_hash: str = "blake2") -> None:
        if token_hash not in ("blake2", "md5"):
            raise ValueError(f"unknown token_hash {token_hash!r}")
        from ..ids import hash64_str_md5

        self.tok = TOKEN_RE
        # md5 ≡ DuckDB md5_number_lower → the fingerprint is SQL-oracle
        # recomputable (oracle.sql_doc_fingerprints); blake2 is the default
        self.hasher = hash64_str_md5 if token_hash == "md5" else None

    def _fp(self, wh: np.ndarray) -> int:
        n = len(wh)
        if n == 0:
            return int(self.OFFSET)
        with np.errstate(over="ignore"):
            # powers B^(n-1) ... B^0 (wraparound uint64 cumprod)
            pw = np.ones(n, np.uint64)
            pw[1:] = self.BASE
            pw = np.multiply.accumulate(pw)[::-1].copy()
            h = (wh * pw).sum(dtype=np.uint64) + self.OFFSET * pw[0] * self.BASE
        return int(h)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist(), lowercase=False,
                                 hasher=self.hasher)
        fps = [self._fp(wh) for wh in whs]
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "fingerprint": pd.array(fps, dtype="uint64")})


class DocProfile:
    """Single-pass per-document profile: token stats + quality features +
    language-ID in ONE map_batches stage (one tokenize/hash pass per batch
    instead of three) — the fused form the driver-facing ``doc_profile``
    query runs; the individual stages remain available for composition."""

    def __init__(self) -> None:
        self.quality = QualityScore()
        self.langid = LangId()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        whs = batch_token_hashes(batch["text"].tolist())
        flat, lens, nd = _flatten_hashes(whs)
        n_tokens = pd.Series(lens, index=batch.index).astype("int64")
        n_stop = pd.Series(
            _segment_membership_counts(flat, lens, nd, self.quality.stop_h),
            index=batch.index).astype("int64")
        n_punct = batch["text"].str.count(PUNCT_RE).astype("int64")
        stop_ratio = round_half_away(
            (n_stop / n_tokens.clip(lower=1)).to_numpy(), 6)
        li = self.langid
        scores = np.stack(
            [_segment_membership_counts(flat, lens, nd, ph)
             for ph in li.prof_h], axis=1) if nd else np.empty((0, len(li.langs)), np.int64)
        best = scores.argmax(axis=1) if nd else np.empty(0, np.int64)
        hit = scores.max(axis=1) > 0 if nd else np.empty(0, bool)
        preds = np.where(hit, np.asarray(li.langs)[best], "und")
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_chars": batch["text"].str.len().astype("int64"),
            "n_stopwords": n_stop,
            "n_punct": n_punct,
            "stop_ratio": stop_ratio,
            "lang_pred": preds,
        })


# These stage objects hold only a few KB of precomputed hash constants, so
# they run as TASK pools (instance built once on the driver, shipped in the
# task closure): an actor pool's per-query spin-up (~1 s for 12 actors) is
# pure overhead when __init__ does microseconds of work. Stages whose init
# fetches broadcast state (dedup.CandTexts, curation.Score) or that would
# load models stay actor pools.

def doc_profile(docs_ds):
    return docs_ds.map_batches(DocProfile().__call__, batch_format="pandas")


def token_stats(docs_ds):
    return docs_ds.map_batches(TokenStats().__call__, batch_format="pandas")


def quality_scores(docs_ds):
    return docs_ds.map_batches(QualityScore().__call__, batch_format="pandas")


def lang_id(docs_ds):
    return docs_ds.map_batches(LangId().__call__, batch_format="pandas")


def fingerprints(docs_ds, token_hash: str = "blake2"):
    return docs_ds.map_batches(Fingerprint(token_hash=token_hash).__call__,
                               batch_format="pandas")
