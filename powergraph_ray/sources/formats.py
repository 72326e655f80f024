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


# -- graphjrl (builtin_parsers.hpp:196-313) ---------------------------------
# Line-oriented escaped-binary journal: each record is `entrytype byte (0 =
# vertex, 1 = edge)` + little-endian vid(s) + the POD payload bytes, newline
# terminated, with `\xff → \xff\x01` and `\n → \xff\x00` escaping
# (graphjrl_writer::escape_newline). The payload is whatever the C++
# VertexData/EdgeData memcpy'd — we decode the common POD cases and pass
# anything else through as opaque bytes.

_JRL_DTYPES = {"empty": 0, "f8": 8, "f4": 4, "u4": 4, "u8": 8}


def _jrl_escape(b: bytes) -> bytes:
    return b.replace(b"\xff", b"\xff\x01").replace(b"\n", b"\xff\x00")


def _jrl_unescape(b: bytes) -> bytes:
    parts = b.split(b"\xff")
    out = [parts[0]]
    for p in parts[1:]:
        out.append((b"\n" if p[:1] == b"\x00" else b"\xff") + p[1:])
    return b"".join(out)


def _jrl_payload_column(raw: list[bytes], dtype: str, name: str):
    if dtype == "bytes":
        return pa.array(raw, pa.binary())
    if dtype == "empty":
        return None
    np_dt = {"f8": "<f8", "f4": "<f4", "u4": "<u4", "u8": "<u8"}[dtype]
    vals = np.asarray([np.frombuffer(r, np_dt, count=1)[0] for r in raw])
    return pa.array(vals)


def load_graphjrl(paths, vid_bytes: int = 4, vdata: str = "bytes",
                  edata: str = "bytes"):
    """graphjrl journal → (vertices Dataset, edges Dataset) — the migration
    reader (graphjrl_parser, builtin_parsers.hpp:287-313). ``vid_bytes`` is
    the serialized vertex_id_type width (4 default; 8 for USE_VID64 builds);
    ``vdata``/``edata`` ∈ {'empty','f8','f4','u4','u8','bytes'} name the POD
    payload encoding. Per-record Python decode — this is a one-shot
    journal→Parquet migration path, parallel per journal shard file."""
    import ray.data

    if vdata not in _JRL_DTYPES and vdata != "bytes":
        raise ValueError(f"unknown vdata encoding {vdata!r}")
    if edata not in _JRL_DTYPES and edata != "bytes":
        raise ValueError(f"unknown edata encoding {edata!r}")
    ds = ray.data.read_binary_files(paths).materialize()
    vb = vid_bytes

    def parse(batch: pa.Table, want_edges: bool) -> pa.Table:
        vids, vpay, srcs, dsts, epay = [], [], [], [], []
        for blob in batch["bytes"].to_pylist():
            for line in blob.split(b"\n"):
                if not line:
                    continue
                rec = _jrl_unescape(line)
                kind = rec[0]
                if kind == 0:
                    vids.append(int.from_bytes(rec[1:1 + vb], "little"))
                    vpay.append(rec[1 + vb:])
                elif kind == 1:
                    srcs.append(int.from_bytes(rec[1:1 + vb], "little"))
                    dsts.append(int.from_bytes(rec[1 + vb:1 + 2 * vb], "little"))
                    epay.append(rec[1 + 2 * vb:])
                else:
                    raise ValueError("malformed graphjrl record "
                                     f"(entrytype {kind})")
        if want_edges:
            cols = {"src": pa.array(np.asarray(srcs, np.uint64), pa.uint64()),
                    "dst": pa.array(np.asarray(dsts, np.uint64), pa.uint64())}
            pc_ = _jrl_payload_column(epay, edata, "edata")
            if pc_ is not None:
                cols["edata"] = pc_
            return pa.table(cols)
        cols = {"vid": pa.array(np.asarray(vids, np.uint64), pa.uint64())}
        pc_ = _jrl_payload_column(vpay, vdata, "vdata")
        if pc_ is not None:
            cols["vdata"] = pc_
        return pa.table(cols)

    verts = ds.map_batches(lambda t: parse(t, False), batch_format="pyarrow")
    edges = ds.map_batches(lambda t: parse(t, True), batch_format="pyarrow")
    return verts, edges


class _JrlShardWriter:
    """graphjrl shard writer (graphjrl_writer, builtin_parsers.hpp:196-283):
    edge records only (vertex records need a vertex Dataset — see
    save_graphjrl_vertices)."""

    def __init__(self, out_dir: str, vid_bytes: int, edata: str) -> None:
        self.out_dir = out_dir
        self.vb = vid_bytes
        self.edata = edata
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], np.uint64)
        dst = np.asarray(batch["dst"], np.uint64)
        pay = (batch["edata"].to_pylist() if "edata" in batch.column_names
               and self.edata == "bytes" else None)
        np_dt = {"f8": "<f8", "f4": "<f4", "u4": "<u4", "u8": "<u8"}.get(self.edata)
        vals = (np.asarray(batch["edata"]).astype(np_dt)
                if np_dt and "edata" in batch.column_names else None)
        path = os.path.join(self.out_dir, f"part-{uuid.uuid4().hex}.graphjrl")
        with open(path, "wb") as f:
            for i in range(len(src)):
                rec = (b"\x01" + int(src[i]).to_bytes(self.vb, "little")
                       + int(dst[i]).to_bytes(self.vb, "little"))
                if pay is not None:
                    rec += pay[i]
                elif vals is not None:
                    rec += vals[i].tobytes()
                f.write(_jrl_escape(rec) + b"\n")
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(src)], pa.int64())})


def save_graphjrl(edges_ds, out_dir: str, vid_bytes: int = 4,
                  edata: str = "empty") -> int:
    """Edge Dataset → graphjrl shards; → rows written."""
    stats = edges_ds.map_batches(_JrlShardWriter, batch_format="pyarrow",
                                 fn_constructor_args=(out_dir, vid_bytes, edata),
                                 concurrency=(1, 8))
    return int(stats.to_pandas()["rows"].sum())


def load_format(paths, fmt: str):
    """→ edge Dataset ``(src:uint64, dst:uint64)``
    (distributed_graph.hpp:2421-2447 dispatch)."""
    import ray.data

    if fmt == "parquet":
        return ray.data.read_parquet(paths)
    if fmt == "graphjrl":
        return load_graphjrl(paths)[1].select_columns(["src", "dst"])
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
    if fmt == "graphjrl":
        return save_graphjrl(edges_ds, out_dir)
    stats = edges_ds.map_batches(_ShardWriter, batch_format="pyarrow",
                                 fn_constructor_args=(out_dir, fmt),
                                 concurrency=(1, 8))
    return int(stats.to_pandas()["rows"].sum())


def format_convert(in_paths, in_fmt: str, out_dir: str, out_fmt: str) -> int:
    """Read any format, write any format (format_convert.cpp:24-81)."""
    return save_format(load_format(in_paths, in_fmt), out_dir, out_fmt)
