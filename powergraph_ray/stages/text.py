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
            "n_tokens": toks.map(len).astype("int64"),
            "n_chars": batch["text"].str.len().astype("int64"),
        })


class QualityScore:
    """Length / punctuation / stopword-ratio quality features
    (the standard pretraining-corpus quality heuristics, e.g. Gopher rules)."""

    def __init__(self) -> None:
        self.tok = TOKEN_RE
        self.punct = PUNCT_RE
        self.stops = set(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].str.lower()
        toks = low.str.findall(self.tok)
        n_words = toks.map(len).astype("int64")
        n_stop = toks.map(lambda ws: sum(w in self.stops for w in ws)).astype("int64")
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
        self.tok = TOKEN_RE
        self.profiles = sorted(LANG_PROFILES.items())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].str.lower()
        toks = low.str.findall(self.tok)
        preds = []
        for ws in toks:
            wset = {}
            for w in ws:
                wset[w] = wset.get(w, 0) + 1
            best, best_s = "und", 0
            for lang, prof in self.profiles:
                s = sum(c for w, c in wset.items() if w in prof)
                if s > best_s:
                    best, best_s = lang, s
            preds.append(best)
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


class Fingerprint:
    """64-bit rolling polynomial fingerprint of the token sequence (Rabin
    style, base 1099511628211 — the FNV prime) — content identity robust to
    whitespace differences."""

    BASE = np.uint64(1099511628211)
    OFFSET = np.uint64(14695981039346656037)

    def __init__(self) -> None:
        self.tok = TOKEN_RE

    def _fp(self, words: list[str]) -> int:
        # deterministic across processes: blake2-derived word hashes
        from ..ids import hash64_str, round_half_away

        h = int(self.OFFSET)
        for w in words:
            h = (h * int(self.BASE) ^ hash64_str(w)) & 0xFFFFFFFFFFFFFFFF
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.findall(self.tok)
        fps = [self._fp(ws) for ws in toks]
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "fingerprint": pd.array(fps, dtype="uint64")})


def token_stats(docs_ds):
    return docs_ds.map_batches(TokenStats, batch_format="pandas", concurrency=(1, 12))


def quality_scores(docs_ds):
    return docs_ds.map_batches(QualityScore, batch_format="pandas", concurrency=(1, 12))


def lang_id(docs_ds):
    return docs_ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 12))


def fingerprints(docs_ds):
    return docs_ds.map_batches(Fingerprint, batch_format="pandas", concurrency=(1, 12))
