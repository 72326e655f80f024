"""Byte-pair-encoding tokenizer: distributed training + vectorized encode.

The missing tokenization piece between a curated corpus and a training
loader (pack_manifest counts regex words; real LM pipelines pack BPE
tokens). Public algorithm: Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units"), greedy lowest-rank merge
encode as popularized by GPT-2's released ``bpe()``.

Scale shape (how real tokenizer training works at corpus scale):

1. ``word_counts`` — ONE distributed counting pass: per batch a pandas
   ``value_counts`` over the regex words, then ``bucketed_agg`` sums the
   per-batch partials per word. Corpus text is never shuffled; the exchange
   is (word, count) rows, bounded by the batch vocabularies.
2. ``bpe_train`` — the merge loop runs on the distinct-word FREQUENCY
   table, capped to the ``max_words`` most frequent words (count DESC,
   word ASC — deterministic). Training on a capped/sampled word-frequency
   table is the standard practice (SentencePiece / HF tokenizers do the
   same); the capped table is KB-to-MB sized, so the inherently sequential
   merge recurrence runs on the driver over partial-top-k-reduced counts
   while the corpus-wide work stays distributed.
3. ``bpe_encode`` — merges broadcast once (``ray.put``), applied per batch
   with the dictionary trick: each DISTINCT word is encoded once per actor
   (persistent cache) and the per-doc token streams are assembled by
   numpy repeat/concat. The merge recurrence per distinct word is the one
   Python loop, amortized across every occurrence in the corpus.

Determinism: merge choice is (count DESC, pair ASC); vocab ids are
``sorted(base symbols)`` then merged symbols in merge-rank order, with
id 0 reserved for UNK (symbols unseen at training time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import bucketed_agg, coalesce_small
from .text import TOKEN_RE

__all__ = ["word_counts", "bpe_train", "bpe_encode", "BPEModel"]

END = "</w>"  # end-of-word marker symbol (Sennrich 2016)


def word_counts(docs_ds, lowercase: bool = True, n_buckets: int = 64,
                text_col: str = "text"):
    """→ Dataset(word, n): corpus word frequencies in one counting pass +
    one bucketed (word)-keyed merge. The exchange holds per-batch DISTINCT
    words only."""

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col]
        if lowercase:
            texts = texts.str.lower()
        vc = texts.str.findall(TOKEN_RE).explode().dropna().value_counts()
        return pd.DataFrame({"word": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    part = docs_ds.map_batches(counts, batch_format="pandas")
    return bucketed_agg(part, ["word"], {"n": ("n", "sum")},
                        n_buckets=n_buckets)


def _top_words(wc_ds, max_words: int) -> pd.DataFrame:
    """The ``max_words`` most frequent words by (n DESC, word ASC) —
    per-block partial top-k before the driver's final cut, so the driver
    never sees the full vocabulary."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "word"], ascending=[False, True],
                              kind="stable").head(max_words)

    parts = wc_ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (parts.sort_values(["n", "word"], ascending=[False, True],
                              kind="stable").head(max_words)
            .reset_index(drop=True))


def _train_merges(words: list[str], counts: np.ndarray, n_merges: int,
                  min_count: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency table: pick the most
    frequent adjacent symbol pair (count DESC, pair ASC), merge it
    everywhere, repeat. Incremental pair-count maintenance — only words
    containing the chosen pair are touched per round."""
    from collections import Counter, defaultdict

    seqs = [tuple(w) + (END,) for w in words]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for i, s in enumerate(seqs):
        c = int(counts[i])
        for p in zip(s, s[1:]):
            pair_counts[p] += c
            pair_words[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best, best_n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_count:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_words[best]):
            s, c = seqs[i], int(counts[i])
            # remove this word's old pair contributions
            for p in zip(s, s[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            # apply the merge left-to-right
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and (s[j], s[j + 1]) == best:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s = seqs[i] = tuple(out)
            for p in zip(s, s[1:]):
                pair_counts[p] += c
                pair_words[p].add(i)
    return merges


class BPEModel:
    """Trained tokenizer: ``merges`` in rank order + the derived vocab.
    id 0 = UNK; base symbols (chars + ``</w>`` of the training words)
    sorted ASC, then one merged symbol per merge in rank order."""

    def __init__(self, merges: list[tuple[str, str]],
                 base_symbols: list[str], lowercase: bool = True) -> None:
        self.merges = [tuple(m) for m in merges]
        self.base_symbols = sorted(set(base_symbols))
        self.lowercase = lowercase
        self.ranks = {p: r for r, p in enumerate(self.merges)}
        syms = list(self.base_symbols) + [a + b for a, b in self.merges]
        self.vocab: dict[str, int] = {}
        for s in syms:  # merged symbol may collide with a base symbol
            if s not in self.vocab:
                self.vocab[s] = len(self.vocab) + 1  # 0 = UNK

    @property
    def vocab_size(self) -> int:
        return len(self.vocab) + 1

    def encode_word(self, word: str) -> tuple[str, ...]:
        """Greedy lowest-rank merge recurrence (GPT-2 ``bpe()`` shape)."""
        s = tuple(word) + (END,)
        while len(s) > 1:
            pairs = list(zip(s, s[1:]))
            ranked = [(self.ranks[p], p) for p in pairs if p in self.ranks]
            if not ranked:
                break
            _, best = min(ranked)
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and (s[j], s[j + 1]) == best:
                    out.append(s[j] + s[j + 1])
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s = tuple(out)
        return s

    def to_table(self) -> pa.Table:
        """Persistable form: one row per merge (rank, left, right) plus the
        base symbols as rank −1 rows (left = symbol, right = '')."""
        ranks = [-1] * len(self.base_symbols) + list(range(len(self.merges)))
        left = list(self.base_symbols) + [a for a, _ in self.merges]
        right = [""] * len(self.base_symbols) + [b for _, b in self.merges]
        return pa.table({"rank": pa.array(ranks, pa.int32()),
                         "left": left, "right": right,
                         "lowercase": [self.lowercase] * len(ranks)})

    @classmethod
    def from_table(cls, t: pa.Table) -> "BPEModel":
        df = t.to_pandas().sort_values("rank", kind="stable")
        base = df[df["rank"] < 0]["left"].tolist()
        m = df[df["rank"] >= 0]
        merges = list(zip(m["left"], m["right"]))
        lower = bool(df["lowercase"].iloc[0]) if len(df) else True
        return cls(merges, base, lowercase=lower)


def bpe_train(docs_ds, n_merges: int = 256, max_words: int = 65536,
              min_count: int = 2, lowercase: bool = True,
              text_col: str = "text") -> BPEModel:
    """Train a BPE tokenizer on the corpus: distributed word counts →
    capped frequency table → driver merge loop (see module docstring for
    why the cap is the honest scale knob)."""
    wc = word_counts(docs_ds, lowercase=lowercase, text_col=text_col)
    top = _top_words(wc, max_words)
    words = top["word"].tolist()
    base = sorted({ch for w in words for ch in w} | {END})
    merges = _train_merges(words, top["n"].to_numpy(np.int64),
                           n_merges, min_count)
    return BPEModel(merges, base, lowercase=lowercase)


class _Encoder:
    """Actor-pool encode stage: model fetched from plasma once per actor in
    ``__init__``; per batch, each DISTINCT word is encoded once (persistent
    cache) and per-doc streams assemble via numpy repeat/concat."""

    def __init__(self, model_ref) -> None:
        import ray

        self.model: BPEModel = ray.get(model_ref) \
            if not isinstance(model_ref, BPEModel) else model_ref
        self.cache: dict[str, np.ndarray] = {}

    def _ids(self, word: str) -> np.ndarray:
        ids = self.cache.get(word)
        if ids is None:
            v = self.model.vocab
            ids = np.fromiter((v.get(s, 0) for s in self.model.encode_word(word)),
                              np.int32)
            self.cache[word] = ids
        return ids

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        if self.model.lowercase:
            texts = texts.str.lower()
        words = texts.str.findall(TOKEN_RE)
        n_words = words.str.len().to_numpy(np.int64)
        flat = [w for ws in words for w in ws]
        nd = len(batch)
        if not flat:
            return pd.DataFrame({
                "doc_id": batch["doc_id"].to_numpy(),
                "n_bpe_tokens": np.zeros(nd, np.int64),
                "token_ids": [np.empty(0, np.int32)] * nd,
            })
        # dictionary trick: encode each distinct word of the batch once
        uniq, inv = np.unique(np.asarray(flat, object), return_inverse=True)
        enc = [self._ids(w) for w in uniq]
        lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
        ustream = np.concatenate(enc) if enc else np.empty(0, np.int32)
        uoff = np.concatenate(([0], np.cumsum(lens)))
        # vectorized ragged gather: token stream in corpus word order
        starts, wl = uoff[inv], lens[inv]
        ends = np.cumsum(wl)
        step = np.ones(int(ends[-1]), np.int64)
        step[0] = starts[0]
        step[ends[:-1]] = starts[1:] - (starts[:-1] + wl[:-1] - 1)
        stream = ustream[np.cumsum(step)]
        # per-doc token counts: segment-sum the per-word lengths
        seg = np.repeat(np.arange(nd), n_words)
        doc_len = np.bincount(seg, weights=wl, minlength=nd).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(doc_len)))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_bpe_tokens": doc_len,
            "token_ids": [stream[offs[i]:offs[i + 1]] for i in range(nd)],
        })


def bpe_encode(docs_ds, model: BPEModel, concurrency: int | None = None):
    """→ Dataset(doc_id, n_bpe_tokens, token_ids list<int32>): tokenize the
    corpus with a trained model. The model ships to each actor ONCE via
    ``ray.put`` (broadcast, not per batch)."""
    import ray

    model_ref = ray.put(model)
    kw = {"concurrency": concurrency} if concurrency else {"concurrency": (1, 8)}
    return docs_ds.map_batches(_Encoder, fn_constructor_args=(model_ref,),
                               batch_format="pandas", **kw)
