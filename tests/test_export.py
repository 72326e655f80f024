"""Deterministic resumable shard export (stages/export.py): assignment
parity vs the DuckDB splitmix64 replay, read-back equality, byte-stable
output, and _COMPLETE-marker resume semantics."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from powergraph_ray.pipelines import oracle as osql
from powergraph_ray.stages.export import export_shards, shard_of
from tests.test_oracle_parity import SF, assert_match

N_SHARDS, SALT = 16, 7


def _docs():
    return ray.data.read_parquet(os.path.join(SF, "documents.parquet"),
                                 columns=["doc_id", "text"])


def _export(out_dir):
    return export_shards(_docs(), out_dir, n_shards=N_SHARDS, salt=SALT) \
        .to_pandas().sort_values("shard").reset_index(drop=True)


def test_export_shards_manifest_matches_sql_and_roundtrips(tmp_path):
    out = str(tmp_path / "shards")
    man = _export(out)
    assert not man["skipped"].any()

    # manifest (shard, n_rows) ≡ the DuckDB splitmix64 assignment replay
    assert_match(man[["shard", "n_rows"]],
                 osql.sql_export_shard_counts(N_SHARDS, SALT))

    # read-back: every input row exactly once, in its assigned shard,
    # sorted by key within each shard
    src = pq.read_table(os.path.join(SF, "documents.parquet"),
                        columns=["doc_id", "text"]).to_pandas()
    parts = []
    for d in sorted(glob.glob(os.path.join(out, "shard=*"))):
        t = pq.read_table(os.path.join(d, "part-000.parquet")).to_pandas()
        shard = int(os.path.basename(d).split("=")[1])
        np.testing.assert_array_equal(
            shard_of(t["doc_id"].to_numpy(), N_SHARDS, SALT), shard)
        assert (np.diff(t["doc_id"].to_numpy()) > 0).all()
        parts.append(t)
    got = pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, src.sort_values("doc_id").reset_index(drop=True))


def test_export_shards_resume_skips_complete_and_rebuilds_missing(tmp_path):
    out = str(tmp_path / "shards")
    first = _export(out)
    files = {d: open(os.path.join(d, "part-000.parquet"), "rb").read()
             for d in glob.glob(os.path.join(out, "shard=*"))}

    # full re-run: every shard skipped, counts preserved
    second = _export(out)
    assert second["skipped"].all()
    pd.testing.assert_frame_equal(first[["shard", "n_rows"]],
                                  second[["shard", "n_rows"]])

    # kill one shard → only it is rewritten, byte-identical
    victim = sorted(files)[3]
    shutil.rmtree(victim)
    third = _export(out)
    vshard = int(os.path.basename(victim).split("=")[1])
    assert (~third["skipped"]).sum() == 1
    assert third.loc[~third["skipped"], "shard"].item() == vshard
    assert open(os.path.join(victim, "part-000.parquet"), "rb").read() \
        == files[victim]


def test_write_partitioned_consolidates_appends_and_chunks(tmp_path):
    from powergraph_ray.stages.export import write_partitioned

    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                       "p": (np.arange(100) % 4).astype(np.int64)})
    out = str(tmp_path / "wp")
    n = write_partitioned(ray.data.from_pandas(df).repartition(8), out, "p")
    assert n == 4
    # ONE file per partition despite 8 input blocks
    for v in range(4):
        files = glob.glob(os.path.join(out, f"p={v}", "*.parquet"))
        assert len(files) == 1
    # read-back: hive layout re-derives the partition column
    back = ray.data.read_parquet(out, file_extensions=["parquet"]).to_pandas()
    assert sorted(back["doc_id"]) == list(range(100))
    assert (back["p"].astype(int) == back["doc_id"].astype(int) % 4).all()

    # append: a second call adds new uniquely-named files, keeps the old
    df2 = pd.DataFrame({"doc_id": np.arange(100, 120, dtype=np.int64),
                        "p": (np.arange(100, 120) % 4).astype(np.int64)})
    write_partitioned(ray.data.from_pandas(df2), out, "p")
    back2 = ray.data.read_parquet(out, file_extensions=["parquet"]).to_pandas()
    assert sorted(back2["doc_id"]) == list(range(120))

    # rows_per_file chunking: a large partition splits into multiple files
    out2 = str(tmp_path / "wp2")
    write_partitioned(ray.data.from_pandas(df), out2, "p", rows_per_file=10)
    files = glob.glob(os.path.join(out2, "p=0", "*.parquet"))
    assert len(files) == 3  # 25 rows / 10 per file
    back3 = ray.data.read_parquet(out2, file_extensions=["parquet"]).to_pandas()
    assert sorted(back3["doc_id"]) == list(range(100))
