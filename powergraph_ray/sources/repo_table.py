"""Deterministic synthetic source-code-repository table (the engine's input).

The engine's primary input (BASELINE.json input_hint) is a Parquet table
``(repo:string, path:string, commit:string, lang:string, content:string)``.
The reference has no document input at all — it reads edge lists — so this
module *synthesizes* the repo table deterministically from the driver's
``documents`` test table: every document row becomes one source file whose
``content`` is the document text plus a deterministic block of import
statements referencing other files.

The import targets are pure arithmetic in the doc index (the same
Knuth-multiplicative hash walk the reference's synthetic powerlaw generator
uses, distributed_graph.hpp:2393-2402), so the *ground-truth edge set* is
computable both in numpy and in ANSI SQL — which is exactly what makes the
regex-based edge builder (stages/edge_builder.py) oracle-checkable: the edges
it extracts from ``content`` must equal the closed-form edge set.

Generation rules (doc index ``i`` in ``[0, n)``, constants shared with the
DuckDB oracle in ``__ray_entry__.oracle_sql``):

- ``lang(i)   = ['py','js','java','go'][i % 4]``
- ``repo(i)   = f"org{i%7}/repo{i%101}"``
- ``path(i)   = f"src/m{i}" + ext(lang)``
- ``commit(i) = sha256(repo + '/' + path)[:40]`` (hex)
- out-degree ``k(i) = 1 + (i % 4) + (96 if (i*2654435761) % 97 == 0 else 0)``
  — every ~97th (mixed) file is a high-degree hub, giving the power-law-ish
  skew PowerGraph's vertex-cut exists for.
- targets ``t(i,j) = (i + j*2654435761 + (i*i % 1009)) % n`` for
  ``j = 1..k(i)``, self-references dropped, duplicates dropped.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..ids import KNUTH_MIX

LANGS = ["py", "js", "java", "go"]
EXTS = {"py": ".py", "js": ".js", "java": ".java", "go": ".go"}

# one import-statement template per language; {t} is the target doc index.
IMPORT_FMT = {
    "py": "import m{t}",
    "js": "const d{j} = require('./m{t}')",
    "java": "import src.m{t};",
    "go": 'import "src/m{t}"',
}

HUB_MOD = 97
HUB_EXTRA = 96
SQUARE_MOD = 1009


def lang_of(i: int) -> str:
    return LANGS[i % 4]


def repo_of(i: int) -> str:
    return f"org{i % 7}/repo{i % 101}"


def path_of(i: int) -> str:
    return f"src/m{i}{EXTS[lang_of(i)]}"


def commit_of(i: int) -> str:
    return hashlib.sha256(f"{repo_of(i)}/{path_of(i)}".encode()).hexdigest()[:40]


def out_degree(i: np.ndarray | int) -> np.ndarray | int:
    i = np.asarray(i, dtype=np.int64)
    k = 1 + (i % 4) + np.where((i * KNUTH_MIX) % HUB_MOD == 0, HUB_EXTRA, 0)
    return k


def targets_of(i: int, n: int) -> list[int]:
    """Closed-form import targets of doc i (dedup, no self)."""
    k = int(out_degree(i))
    seen: set[int] = set()
    out: list[int] = []
    base = i + (i * i) % SQUARE_MOD
    for j in range(1, k + 1):
        t = (base + j * KNUTH_MIX) % n
        if t != i and t not in seen:
            seen.add(t)
            out.append(t)
    return out


def doc_edge_ground_truth(n: int) -> np.ndarray:
    """The closed-form directed edge set over doc indices, shape (m, 2).

    Sorted by (src, dst); this is what the regex edge builder must recover
    from the generated ``content`` column.
    """
    i = np.arange(n, dtype=np.int64)
    k = out_degree(i)
    src = np.repeat(i, k)
    j = np.concatenate([np.arange(1, kk + 1) for kk in k]) if n else np.empty(0, np.int64)
    base = np.repeat(i + (i * i) % SQUARE_MOD, k)
    dst = (base + j * KNUTH_MIX) % n
    mask = src != dst
    e = np.unique(np.stack([src[mask], dst[mask]], axis=1), axis=0)
    return e


def _content_for(i: int, n: int, text: str) -> str:
    lang = lang_of(i)
    fmt = IMPORT_FMT[lang]
    lines = [fmt.format(t=t, j=j + 1) for j, t in enumerate(targets_of(i, n))]
    return text + "\n" + "\n".join(lines)


def make_repo_batch(doc_ids: np.ndarray, texts, n: int) -> pa.Table:
    """Build a repo-table batch from a documents batch (vectorizable core;
    the per-row string assembly is bounded by out-degree ~2.5)."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i, text in zip(doc_ids.tolist(), texts):
        repos.append(repo_of(i))
        paths.append(path_of(i))
        commits.append(commit_of(i))
        langs.append(lang_of(i))
        contents.append(_content_for(i, n, text))
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def repo_table_path(sf_dir: str) -> str:
    """Cache dir keyed by the *identity* of the source documents.parquet
    (absolute path + file size + mtime), not just the sf_dir basename — two
    different dirs named ``sf0.01``, or a regenerated table at the same
    path, must not collide on a stale cache."""
    import hashlib

    doc = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(doc)
        fp = f"{doc}|{st.st_size}|{int(st.st_mtime)}"
    except OSError:
        fp = doc
    tag = (os.path.basename(os.path.normpath(sf_dir)) or "sf") + "-" + \
        hashlib.blake2b(fp.encode(), digest_size=8).hexdigest()
    return f"/tmp/powergraph_ray/repo_table/{tag}"


def ensure_repo_table(sf_dir: str) -> str:
    """Materialize the synthetic repo table for ``sf_dir`` as Parquet (cached).

    Reads ``documents.parquet`` via Ray Data, maps each batch to repo-table
    rows, writes a Parquet directory under /tmp, and returns its path.
    Killed-run safe: a run dies mid-build → no ``_COMPLETE`` marker → the
    next run rebuilds into its own unique tmp dir. Concurrent builders race
    benignly: each builds a full copy in a private tmp; the first rename
    wins, later builders see the marker and discard their copy (no rmtree
    of a live output)."""
    import pyarrow.parquet as pq
    import ray.data

    out = repo_table_path(sf_dir)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out

    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def to_repo(batch: pa.Table) -> pa.Table:
        return make_repo_batch(np.asarray(batch["doc_id"], dtype=np.int64), batch["text"].to_pylist(), n)

    import shutil
    import uuid

    tmp = f"{out}.tmp-{uuid.uuid4().hex}"  # private per builder
    ds.map_batches(to_repo, batch_format="pyarrow").write_parquet(tmp)
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok\n")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.isdir(out) and not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)  # stale partial from a killed run
    try:
        os.rename(tmp, out)
    except OSError:
        # another builder won the race; keep theirs, drop ours
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    return out


def read_repo_table(sf_dir: str):
    """The engine-facing reader: Parquet repo table → Dataset."""
    import ray.data

    return ray.data.read_parquet(ensure_repo_table(sf_dir))
