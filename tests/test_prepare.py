"""End-to-end corpus preparation (pipelines/prepare.py): survivors are
exactly the conjunction of the two per-doc keep flags the standalone
operators compute (quality gate ∧ fuzzy dedup), every original column
survives, and the export is resumable."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from powergraph_ray.pipelines.prepare import prepare_corpus
from powergraph_ray.stages.curation import curate_corpus
from powergraph_ray.stages.dedup import fuzzy_dedup_keep


def _corpus():
    base = " ".join(f"w{i}" for i in range(120))
    texts = [
        base,                                            # canonical of group
        " ".join(f"w{i}" for i in range(119)) + " zz",   # near-dup → dropped
        base,                                            # exact dup → dropped
        " ".join(f"x{i}" for i in range(120)),           # good
        "too short",                                     # < min_tokens
        " ".join(f"y{i}" for i in range(60)) + " mail me a@b.com now",  # PII
        " ".join(["spam"] * 90),                         # repetitive
        " ".join(f"z{i}" for i in range(40)),            # good
    ]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array([f"s{i % 2}" for i in range(len(texts))],
                           pa.string()),
    }))


def test_prepare_corpus_is_conjunction_of_standalone_keeps(tmp_path):
    out = str(tmp_path / "prep")
    ds = _corpus()
    man = prepare_corpus(ds, out, n_shards=4, jaccard_threshold=0.8) \
        .to_pandas()

    q = curate_corpus(ds).to_pandas().set_index("doc_id")["keep"]
    d = fuzzy_dedup_keep(ds, threshold=0.8).to_pandas() \
        .set_index("doc_id")["keep"]
    expect = sorted(i for i in q.index if q[i] == 1 and d[i] == 1)
    assert expect  # the planted corpus must keep something
    assert 0 in expect and 1 not in expect and 2 not in expect
    assert 4 not in expect and 5 not in expect and 6 not in expect

    parts = [pq.read_table(p).to_pandas() for p in
             sorted(glob.glob(os.path.join(out, "shard=*", "part-000.parquet")))]
    got = pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
    assert sorted(got["doc_id"]) == expect
    assert list(got.columns) == ["doc_id", "text", "source"]  # cols survive
    assert int(man["n_rows"].sum()) == len(expect)
    assert not man["skipped"].any()

    # resume: a second run over the same out_dir skips every shard
    man2 = prepare_corpus(ds, out, n_shards=4, jaccard_threshold=0.8) \
        .to_pandas()
    assert man2["skipped"].all()
    assert int(man2["n_rows"].sum()) == len(expect)


# ---------------------------------------------------------------------------
# incremental preparation (daily-ingestion step)
# ---------------------------------------------------------------------------


def _batch(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["inc"] * len(ids), pa.string()),
    }))


def test_prepare_corpus_incremental_two_batches(tmp_path):
    from powergraph_ray.pipelines.prepare import prepare_corpus_incremental

    base0 = str(tmp_path / "day0")
    idx = str(tmp_path / "mh_idx")
    ds = _corpus()
    prepare_corpus(ds, base0, n_shards=4, jaccard_threshold=0.8,
                   index_path=idx)

    good = " ".join(f"x{i}" for i in range(120))  # survivor doc 3's text
    b1_texts = [
        " ".join(f"x{i}" for i in range(119)) + " qq",  # near-dup of corpus 3
        " ".join(f"n{i}" for i in range(80)),           # unique → kept
        " ".join(f"n{i}" for i in range(80)),           # exact dup of 101
        "tiny",                                          # quality fail
        good,                                            # exact dup of corpus 3
    ]
    day1 = str(tmp_path / "day1")
    man1 = prepare_corpus_incremental(
        _batch(range(100, 105), b1_texts), day1, idx, base0, n_shards=4,
        jaccard_threshold=0.8, corpus_n_shards=4).to_pandas()
    got1 = pd.concat([pq.read_table(p).to_pandas() for p in
                      sorted(glob.glob(os.path.join(day1, "shard=*", "*.parquet")))])
    # 100 matches corpus, 102 dups 101 in-batch, 103 fails quality,
    # 104 exact-dups corpus 3 → only 101 survives
    assert sorted(got1["doc_id"]) == [101]
    assert int(man1["n_rows"].sum()) == 1

    # batch 2 must see batch 1's survivor through the UPDATED index and
    # read its text from the day1 root (multi-root corpus_paths)
    b2_texts = [
        " ".join(f"n{i}" for i in range(79)) + " mm",   # near-dup of 101
        " ".join(f"m{i}" for i in range(70)),           # unique → kept
    ]
    day2 = str(tmp_path / "day2")
    man2 = prepare_corpus_incremental(
        _batch([200, 201], b2_texts), day2, idx, [base0, day1], n_shards=4,
        jaccard_threshold=0.8, corpus_n_shards=4).to_pandas()
    got2 = pd.concat([pq.read_table(p).to_pandas() for p in
                      sorted(glob.glob(os.path.join(day2, "shard=*", "*.parquet")))])
    assert sorted(got2["doc_id"]) == [201]
    assert int(man2["n_rows"].sum()) == 1
    assert list(got2.columns) == ["doc_id", "text", "source"]
