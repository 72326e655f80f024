"""Incremental MinHash dedup: materialized band index + new-batch matching.

Oracle: `minhash_near_dups` over the UNION corpus, restricted to cross
(old x new) pairs, must equal `minhash_match_index` of the new batch
against the materialized index — same pairs, same exact Jaccard values.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from powergraph_ray.stages.dedup import (
    minhash_index,
    minhash_match_index,
    minhash_near_dups,
)
from powergraph_ray.stages.export import export_shards


def _docs(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


@pytest.fixture(scope="module")
def corpus_and_new():
    rng = np.random.default_rng(7)
    corpus_texts = [
        " ".join(f"w{i}_{d}" for i in range(100))
        for d in range(12)
    ]
    base0, base3 = corpus_texts[0], corpus_texts[3]
    new_texts = [
        base0.rsplit(" ", 1)[0] + " zzz",      # near-dup of corpus doc 0
        base3,                                  # exact dup of corpus doc 3
        " ".join(f"q{i}" for i in range(100)),  # unrelated
        " ".join(f"p{i}" for i in range(100)),  # near-dup pair WITHIN new...
        " ".join(f"p{i}" for i in range(99)) + " yy",  # ...must NOT match
    ]
    _ = rng  # determinism: no randomness actually used
    corpus = _docs(range(12), corpus_texts)
    new = _docs(range(100, 105), new_texts)
    return corpus, new, corpus_texts, new_texts


def _oracle_cross_pairs(corpus, new, threshold):
    """minhash_near_dups over the union, restricted to old x new pairs."""
    union = corpus.union(new)
    out = minhash_near_dups(union, threshold=threshold).to_pandas()
    cross = out[(out["doc_a"] < 100) & (out["doc_b"] >= 100)]
    return {(int(a), int(b)): float(j) for a, b, j in
            zip(cross["doc_a"], cross["doc_b"], cross["jaccard"])}


def test_match_index_equals_union_cross_pairs(tmp_path, corpus_and_new):
    corpus, new, corpus_texts, _ = corpus_and_new
    idx = str(tmp_path / "mh_index")
    cpath = str(tmp_path / "corpus_parquet")
    minhash_index(corpus, idx)
    corpus.write_parquet(cpath)

    got = minhash_match_index(new, idx, cpath, threshold=0.8).to_pandas()
    got_pairs = {(int(o), int(n)): float(j) for n, o, j in
                 zip(got["doc_id"], got["dup_of"], got["jaccard"])}

    want = _oracle_cross_pairs(corpus, new, 0.8)
    assert got_pairs == want
    assert (0, 100) in got_pairs            # planted near-dup
    assert got_pairs[(3, 101)] == 1.0       # planted exact dup
    assert all(o < 100 <= n for o, n in got_pairs)  # never new x new


def test_match_index_shard_pruned_corpus(tmp_path, corpus_and_new):
    corpus, new, _, _ = corpus_and_new
    idx = str(tmp_path / "mh_index2")
    cdir = str(tmp_path / "corpus_shards")
    minhash_index(corpus, idx)
    manifest = export_shards(corpus, cdir, n_shards=8).to_pandas()
    assert manifest["n_rows"].sum() == 12

    got = minhash_match_index(new, idx, cdir, threshold=0.8,
                              corpus_n_shards=8).to_pandas()
    got_pairs = {(int(o), int(n)): float(j) for n, o, j in
                 zip(got["doc_id"], got["dup_of"], got["jaccard"])}
    want = _oracle_cross_pairs(corpus, new, 0.8)
    assert got_pairs == want


def test_match_index_no_candidates(tmp_path):
    corpus = _docs(range(4), [" ".join(f"c{i}_{d}" for i in range(60))
                              for d in range(4)])
    new = _docs([500], [" ".join(f"z{i}" for i in range(60))])
    idx = str(tmp_path / "mh_index3")
    cpath = str(tmp_path / "corpus3")
    minhash_index(corpus, idx)
    corpus.write_parquet(cpath)
    got = minhash_match_index(new, idx, cpath, threshold=0.8)
    # Dataset.schema() carries the column contract even at 0 rows
    # (Ray's to_pandas() builds from iter_batches, which yields nothing
    # for an empty dataset — columns are only visible on the Dataset)
    assert got.schema().names == ["doc_id", "dup_of", "jaccard"]
    assert got.count() == 0


# -- incremental EXACT dedup (content_index / exact_match_index) -------------

from powergraph_ray.stages.dedup import (content_index, exact_dedup,
                                         exact_match_index)


def _oracle_exact_cross(corpus, new):
    """exact_dedup over the union, restricted to (old keep, new dup)."""
    out = exact_dedup(corpus.union(new)).to_pandas()
    dups = out[(out["n_copies"] > 1) & (out["keep_doc_id"] < 100)]
    # expand: every NEW doc whose md5 groups under an old keeper
    want = {}
    union_df = corpus.union(new).to_pandas()
    import hashlib as _h
    md5 = union_df["text"].map(lambda t: _h.md5(t.encode()).hexdigest())
    keep = dict(zip(out["text_md5"], out["keep_doc_id"]))
    for did, m in zip(union_df["doc_id"], md5):
        if did >= 100 and keep.get(m, did) < 100:
            want[int(did)] = int(keep[m])
    return want


def test_exact_match_index(tmp_path, corpus_and_new):
    corpus, new, corpus_texts, new_texts = corpus_and_new
    idx = str(tmp_path / "ex_index")
    content_index(corpus, idx, n_dirs=16)

    got = exact_match_index(new, idx, n_dirs=16).to_pandas()
    got_map = {int(n): int(o) for n, o in zip(got["doc_id"], got["dup_of"])}
    assert got_map == _oracle_exact_cross(corpus, new)
    assert got_map == {101: 3}  # the planted exact dup, and nothing else


def test_exact_match_index_append_and_min(tmp_path):
    """Appending a second batch to the index works, and dup_of is the MIN
    matching indexed id when several indexed docs share the content."""
    t = "the exact same document text repeated verbatim"
    corpus1 = _docs([5, 2], [t, "other text one"])
    corpus2 = _docs([9], [t])  # same content, bigger id, appended later
    idx = str(tmp_path / "ex_index2")
    content_index(corpus1, idx, n_dirs=16)
    content_index(corpus2, idx, n_dirs=16)  # APPEND

    new = _docs([100, 101], [t, "fresh content never seen"])
    got = exact_match_index(new, idx, n_dirs=16).to_pandas()
    assert {int(n): int(o) for n, o in zip(got["doc_id"], got["dup_of"])} \
        == {100: 5}


def test_exact_match_index_no_candidates(tmp_path):
    corpus = _docs([1], ["alpha beta gamma"])
    idx = str(tmp_path / "ex_index3")
    content_index(corpus, idx, n_dirs=16)
    got = exact_match_index(_docs([100], ["delta epsilon"]), idx, n_dirs=16)
    assert got.count() == 0
