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
