"""BPE tokenizer tests (stages/bpe.py): the distributed train + encode are
checked against an INDEPENDENT sequential oracle (from-scratch pair-count
recomputation each round, straight greedy encode), plus batching-invariance,
roundtrip, and persistence properties."""

import os
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data

from powergraph_ray.stages.bpe import (
    END,
    BPEModel,
    bpe_encode,
    bpe_train,
    word_counts,
)
from powergraph_ray.stages.text import TOKEN_RE

SF = "/root/testdata/sf0.001"


def _docs(sf=SF):
    return ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                 columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
# sequential oracle (independent of the implementation)
# ---------------------------------------------------------------------------


def oracle_word_counts(texts, lowercase=True):
    c = Counter()
    for t in texts:
        c.update(TOKEN_RE.findall(t.lower() if lowercase else t))
    return c


def oracle_train(word_freq: dict, n_merges: int, min_count: int):
    """From-scratch recomputation of all pair counts each round — O(rounds ×
    table), deliberately naive and loop-shaped so it shares nothing with the
    incremental implementation."""
    seqs = {w: tuple(w) + (END,) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, s in seqs.items():
            for p in zip(s, s[1:]):
                pc[p] += word_freq[w]
        if not pc:
            break
        best, n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append(best)
        for w, s in seqs.items():
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and (s[j], s[j + 1]) == best:
                    out.append(s[j] + s[j + 1])
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[w] = tuple(out)
    return merges


def oracle_encode(word: str, merges):
    s = tuple(word) + (END,)
    ranks = {p: i for i, p in enumerate(merges)}
    while True:
        cand = [(ranks[p], p) for p in zip(s, s[1:]) if p in ranks]
        if not cand:
            return s
        _, best = min(cand)
        out, j = [], 0
        while j < len(s):
            if j + 1 < len(s) and (s[j], s[j + 1]) == best:
                out.append(s[j] + s[j + 1])
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = tuple(out)


TINY = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a catalog of cats and mats",
    "low lower lowest newer newest",
    "low low low lower newer new",
]


def _tiny_ds(n_blocks=3):
    df = pd.DataFrame({"doc_id": np.arange(len(TINY), dtype=np.int64),
                       "text": TINY})
    return ray.data.from_pandas(df).repartition(n_blocks)


def test_word_counts_matches_counter():
    got = word_counts(_tiny_ds()).to_pandas()
    want = oracle_word_counts(TINY)
    assert dict(zip(got["word"], got["n"])) == dict(want)


def test_train_matches_sequential_oracle():
    model = bpe_train(_tiny_ds(), n_merges=40, max_words=1000, min_count=2)
    want = oracle_train(dict(oracle_word_counts(TINY)), 40, 2)
    assert model.merges == want
    assert len(model.merges) > 5  # the corpus really produces merges


def test_encode_matches_oracle_per_word():
    model = bpe_train(_tiny_ds(), n_merges=30, max_words=1000, min_count=2)
    for w in sorted(oracle_word_counts(TINY)):
        assert model.encode_word(w) == oracle_encode(w, model.merges), w


def test_encode_dataset_roundtrip_and_ids():
    model = bpe_train(_tiny_ds(), n_merges=30, max_words=1000, min_count=2)
    enc = bpe_encode(_tiny_ds(), model).to_pandas().sort_values("doc_id")
    inv = {i: s for s, i in model.vocab.items()}
    for did, row in enc.set_index("doc_id").iterrows():
        ids = np.asarray(row["token_ids"])
        assert row["n_bpe_tokens"] == len(ids)
        assert (ids > 0).all()  # training corpus == encode corpus: no UNK
        # decoding the symbols reconstructs the lowercased word sequence
        text = "".join(inv[i] for i in ids).replace(END, " ").strip()
        assert text == " ".join(TOKEN_RE.findall(TINY[did].lower()))


def test_encode_batching_invariance():
    model = bpe_train(_tiny_ds(), n_merges=25, max_words=1000, min_count=2)
    a = bpe_encode(_tiny_ds(1), model).to_pandas().sort_values("doc_id")
    b = bpe_encode(_tiny_ds(5), model).to_pandas().sort_values("doc_id")
    assert a["n_bpe_tokens"].tolist() == b["n_bpe_tokens"].tolist()
    for x, y in zip(a["token_ids"], b["token_ids"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_unknown_symbols_map_to_unk():
    model = bpe_train(_tiny_ds(), n_merges=10, max_words=1000, min_count=2)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["zzz 999 the"]}))  # 9/z unseen in training
    out = bpe_encode(ds, model).to_pandas()
    ids = np.asarray(out["token_ids"].iloc[0])
    assert (ids == 0).any() and (ids > 0).any()


def test_max_words_cap_is_deterministic_head():
    # capping to the top-k words == training the oracle on that same head
    full = oracle_word_counts(TINY)
    head = dict(sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:8])
    model = bpe_train(_tiny_ds(), n_merges=20, max_words=8, min_count=1)
    assert model.merges == oracle_train(head, 20, 1)


def test_model_table_roundtrip():
    model = bpe_train(_tiny_ds(), n_merges=15, max_words=1000, min_count=2)
    back = BPEModel.from_table(model.to_table())
    assert back.merges == model.merges
    assert back.vocab == model.vocab
    assert back.lowercase == model.lowercase
    w = "catalog"
    assert back.encode_word(w) == model.encode_word(w)


def test_pack_manifest_from_bpe_counts():
    """Tokenize-and-pack composition: the manifest over bpe_encode's real
    token counts matches a pandas recomputation (shard assignment + per-
    shard doc_id-ordered cumsum)."""
    from powergraph_ray.stages.export import shard_of
    from powergraph_ray.stages.pack import pack_manifest_from_counts

    docs = _docs()
    model = bpe_train(docs, n_merges=64, max_words=4096)
    enc = bpe_encode(docs, model)
    got = (pack_manifest_from_counts(enc, seq_len=128, n_shards=8)
           .to_pandas().sort_values(["shard", "doc_id"]).reset_index(drop=True))
    cnt = enc.to_pandas()[["doc_id", "n_bpe_tokens"]]
    cnt["shard"] = shard_of(cnt["doc_id"].to_numpy(np.int64), 8, 0).astype(np.int64)
    rows = []
    for s, g in cnt.groupby("shard"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        begin = np.concatenate(([0], np.cumsum(g["n_bpe_tokens"].to_numpy()[:-1])))
        rows.append(pd.DataFrame({
            "shard": s, "doc_id": g["doc_id"],
            "n_tokens": g["n_bpe_tokens"], "begin_tok": begin,
            "seq_id": begin // 128, "seq_off": begin % 128}))
    want = (pd.concat(rows).sort_values(["shard", "doc_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype("int64"), want.astype("int64"))


def test_train_encode_on_driver_corpus():
    """End-to-end on the driver-shaped documents table: every doc encodes,
    token counts are positive, and a re-train is deterministic."""
    docs = _docs()
    m1 = bpe_train(docs, n_merges=64, max_words=4096, min_count=2)
    m2 = bpe_train(docs, n_merges=64, max_words=4096, min_count=2)
    assert m1.merges == m2.merges
    enc = bpe_encode(docs, m1).to_pandas()
    n_docs = docs.count()
    assert len(enc) == n_docs
    assert (enc["n_bpe_tokens"] > 0).all()
    # BPE compresses: fewer tokens than characters, more than regex words
    chars = _docs().to_pandas()["text"].str.len().sum()
    assert enc["n_bpe_tokens"].sum() < chars
