"""Graph file formats: the reference's built-in loaders/savers re-expressed.

``load_format(path, fmt)`` / ``save_format(ds, prefix, fmt)`` cover the
reference's text formats (distributed_graph.hpp:2421-2447; builtin_parsers.hpp):

- ``tsv``  — whitespace-separated ``src dst`` (builtin_parsers.hpp:99-113)
- ``snap`` — like tsv with ``#`` comment lines (builtin_parsers.hpp:62-96)
- ``csv``  — ``src,dst`` (builtin_parsers.hpp:99-113)
- ``adj``  — ``src n t1 t2 … tn`` adjacency lines (builtin_parsers.hpp:119-142)
- ``bintsv4`` — raw little-endian ``(uint32 src, uint32 dst)`` pairs
  (graph_formats.dox:103-119)

Semantics: self-edges dropped at parse (builtin_parsers.hpp:74,94,137);
malformed / comment lines skipped. Parquet is this engine's native format —
these exist for conformance and migration (``format_convert``,
format_convert.cpp:24-81).

All parsers are ``read_text/read_binary_files → map_batches`` (vectorized
pandas ``str.extract`` / ``np.frombuffer``); writers format per batch and
write one shard per block task.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa


def _pairs_table(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    keep = src != dst
    return pa.table({"src": pa.array(src[keep].astype(np.uint64), pa.uint64()),
                     "dst": pa.array(dst[keep].astype(np.uint64), pa.uint64())})


def _parse_pairs(batch: pa.Table, sep_regex: str) -> pa.Table:
    lines = pd.Series(batch["text"].to_pylist(), dtype="string")
    ext = lines.str.extract(rf"^\s*(\d+){sep_regex}(\d+)")
    ok = ext[0].notna() & ext[1].notna()
    src = ext.loc[ok, 0].astype(np.uint64).to_numpy()
    dst = ext.loc[ok, 1].astype(np.uint64).to_numpy()
    return _pairs_table(src, dst)


def _parse_adj(batch: pa.Table) -> pa.Table:
    """``src n t1 … tn``; validates the count like adj_parser
    (builtin_parsers.hpp:119-142 skips malformed lines)."""
    srcs, dsts = [], []
    for line in batch["text"].to_pylist():
        parts = line.split()
        if len(parts) < 2:
            continue
        try:
            s, n = int(parts[0]), int(parts[1])
            ts = [int(x) for x in parts[2:]]
        except ValueError:
            continue
        if len(ts) != n:
            continue
        srcs.extend([s] * n)
        dsts.extend(ts)
    return _pairs_table(np.asarray(srcs, np.uint64), np.asarray(dsts, np.uint64))


def load_format(paths, fmt: str):
    """→ edge Dataset ``(src:uint64, dst:uint64)``
    (distributed_graph.hpp:2421-2447 dispatch)."""
    import ray.data

    if fmt == "parquet":
        return ray.data.read_parquet(paths)
    if fmt == "bintsv4":
        ds = ray.data.read_binary_files(paths)

        def blk(batch: pa.Table) -> pa.Table:
            src, dst = [], []
            for b in batch["bytes"].to_pylist():
                raw = np.frombuffer(b, dtype="<u4")
                raw = raw[: (len(raw) // 2) * 2].reshape(-1, 2)
                src.append(raw[:, 0])
                dst.append(raw[:, 1])
            src = np.concatenate(src) if src else np.empty(0, np.uint32)
            dst = np.concatenate(dst) if dst else np.empty(0, np.uint32)
            return _pairs_table(src.astype(np.uint64), dst.astype(np.uint64))

        return ds.map_batches(blk, batch_format="pyarrow")

    ds = ray.data.read_text(paths)
    if fmt in ("tsv", "snap"):
        # snap additionally allows '#' comments — the extract drops both
        # comments and malformed lines
        return ds.map_batches(lambda t: _parse_pairs(t, r"\s+"), batch_format="pyarrow")
    if fmt == "csv":
        return ds.map_batches(lambda t: _parse_pairs(t, r"\s*,\s*"), batch_format="pyarrow")
    if fmt == "adj":
        return ds.map_batches(_parse_adj, batch_format="pyarrow")
    raise ValueError(f"unknown graph format: {fmt}")


class _ShardWriter:
    """Per-block text/binary shard writer (one file per task, the
    files_per_machine sharding of distributed_graph.hpp:1836-2097)."""

    def __init__(self, out_dir: str, fmt: str) -> None:
        self.out_dir = out_dir
        self.fmt = fmt
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], np.uint64)
        dst = np.asarray(batch["dst"], np.uint64)
        name = f"part-{uuid.uuid4().hex}"
        path = os.path.join(self.out_dir, name)
        if self.fmt == "bintsv4":
            # the format is inherently 32-bit (graph_formats.dox:103-119);
            # hashed 64-bit ids would silently collide mod 2^32
            if len(src) and (src.max() >= (1 << 32) or dst.max() >= (1 << 32)):
                raise ValueError("bintsv4 stores uint32 vertex ids; this "
                                 "graph has ids >= 2^32 — use parquet/tsv")
            arr = np.empty((len(src), 2), dtype="<u4")
            arr[:, 0] = src.astype(np.uint32)
            arr[:, 1] = dst.astype(np.uint32)
            with open(path + ".bintsv4", "wb") as f:
                f.write(arr.tobytes())
        elif self.fmt == "adj":
            order = np.argsort(src, kind="stable")
            s, d = src[order], dst[order]
            cuts = np.flatnonzero(np.diff(s)) + 1
            groups = np.split(d, cuts)
            heads = s[np.concatenate([[0], cuts])] if len(s) else []
            with open(path + ".adj", "w") as f:
                for h, g in zip(heads, groups):
                    f.write(f"{h} {len(g)} " + " ".join(map(str, g.tolist())) + "\n")
        else:
            sep = {"tsv": "\t", "snap": "\t", "csv": ","}[self.fmt]
            with open(path + "." + self.fmt, "w") as f:
                for s, d in zip(src.tolist(), dst.tolist()):
                    f.write(f"{s}{sep}{d}\n")
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(src)], pa.int64())})


def save_format(edges_ds, out_dir: str, fmt: str) -> int:
    """Write the edge Dataset as format shards (save_format,
    distributed_graph.hpp:2142-2159); → total rows written."""
    if fmt == "parquet":
        edges_ds = edges_ds.materialize()  # count() must not re-run the pipeline
        edges_ds.write_parquet(out_dir)
        return edges_ds.count()
    stats = edges_ds.map_batches(_ShardWriter, batch_format="pyarrow",
                                 fn_constructor_args=(out_dir, fmt),
                                 concurrency=(1, 8))
    return int(stats.to_pandas()["rows"].sum())


def format_convert(in_paths, in_fmt: str, out_dir: str, out_fmt: str) -> int:
    """Read any format, write any format (format_convert.cpp:24-81)."""
    return save_format(load_format(in_paths, in_fmt), out_dir, out_fmt)
