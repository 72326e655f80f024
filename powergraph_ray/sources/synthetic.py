"""Deterministic synthetic power-law edge generator.

Re-expresses ``load_synthetic_powerlaw`` (distributed_graph.hpp:2380-2412):
each vertex draws an out-degree from a truncated Zipf(alpha) by inverse-CDF
sampling, then emits edges to a target walk ``t = (t + 2654435761) % nverts``
(the reference's Knuth-multiplicative stride, distributed_graph.hpp:2397-2402),
skipping self-edges. ``in_degree=True`` flips edge direction so the *in*
degrees are power-law (the reference's ``in_degree`` flag).

Unlike the reference (per-machine ``random::rand`` streams), every quantity
here is a pure function of ``(vid, seed)`` via the splitmix64 mix — the edge
set is bit-identical regardless of batching/parallelism, which checkpoint
resume and the two-parallelism scaling benchmark both require.

Produced as ``ray.data.range(nverts).map_batches(gen)`` — a streaming flat-map
whose output volume is ~``nverts * E[deg]`` rows; no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ids import KNUTH_MIX, integer_mix


def _zipf_cdf(alpha: float, truncate: int) -> np.ndarray:
    """CDF over out-degrees ``1..truncate`` with pmf ∝ d^-alpha (the
    reference's multinomial CDF built at distributed_graph.hpp:2390-2395)."""
    d = np.arange(1, truncate + 1, dtype=np.float64)
    pmf = d ** (-alpha)
    cdf = np.cumsum(pmf)
    return cdf / cdf[-1]


def powerlaw_degrees(vids: np.ndarray, alpha: float, truncate: int,
                     seed: int) -> np.ndarray:
    """Deterministic per-vertex out-degree: inverse-CDF at a uniform derived
    from ``integer_mix(vid ^ seed)``."""
    cdf = _zipf_cdf(alpha, truncate)
    u = integer_mix(np.asarray(vids, np.uint64) ^ np.uint64(seed)).astype(np.float64) / 2.0**64
    return (np.searchsorted(cdf, u, side="right") + 1).astype(np.int64)


def powerlaw_edges_batch(vids: np.ndarray, nverts: int, alpha: float,
                         truncate: int, in_degree: bool, seed: int) -> pa.Table:
    """Vectorized edge emission for one batch of source vertex ids."""
    vids = np.asarray(vids, np.int64)
    deg = powerlaw_degrees(vids, alpha, truncate, seed)
    src = np.repeat(vids, deg)
    # per-vertex walk start, then stride by KNUTH_MIX (dg.hpp:2397-2402)
    t0 = (integer_mix(vids.astype(np.uint64) + np.uint64(seed * 2 + 1))
          % np.uint64(nverts)).astype(np.int64)
    cs = np.cumsum(deg)
    total = int(cs[-1]) if len(deg) else 0
    j = np.arange(total, dtype=np.int64) - np.repeat(cs - deg, deg)
    base = np.repeat(t0, deg)
    dst = (base + j * KNUTH_MIX) % nverts
    keep = src != dst  # self-edges dropped (dg.hpp:2402 'if (target != vid)')
    src, dst = src[keep], dst[keep]
    if in_degree:
        src, dst = dst, src
    return pa.table({"src": pa.array(src.astype(np.uint64), pa.uint64()),
                     "dst": pa.array(dst.astype(np.uint64), pa.uint64())})


def load_synthetic_powerlaw(nverts: int, in_degree: bool = False,
                            alpha: float = 2.1, truncate: int = 100,
                            seed: int = 42, override_num_blocks: int | None = None):
    """→ edge Dataset ``(src:uint64, dst:uint64)``; duplicates possible, as in
    the reference (its generator does not dedup either)."""
    import ray.data

    ds = ray.data.range(nverts, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return powerlaw_edges_batch(np.asarray(batch["id"], np.int64), nverts,
                                    alpha, truncate, in_degree, seed)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=65536)


def synthetic_powerlaw_arrays(nverts: int, in_degree: bool = False,
                              alpha: float = 2.1, truncate: int = 100,
                              seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side closed form of the same edge set (tests / small graphs)."""
    t = powerlaw_edges_batch(np.arange(nverts, dtype=np.int64), nverts, alpha,
                             truncate, in_degree, seed)
    return np.asarray(t["src"], np.uint64), np.asarray(t["dst"], np.uint64)


# ---------------------------------------------------------------------------
# synthetic source-code repository table at scale (the flagship's input shape)
# ---------------------------------------------------------------------------

def synthetic_repo_table(nverts: int, alpha: float = 0.8, truncate: int = 100,
                         seed: int = 7, batch_size: int = 16384) -> str:
    """Materialize a deterministic Parquet repo table whose per-file import
    statements encode exactly the powerlaw edge set — the scaling benchmark's
    input (same (repo,path,commit,lang,content) shape as the input_hint).
    Cached under /tmp keyed by parameters; atomic rename + _COMPLETE marker.
    """
    import os
    import shutil

    import ray.data

    out = f"/tmp/powergraph_ray/scale_repo/n{nverts}_a{alpha}_t{truncate}_s{seed}"
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out

    def gen(batch: pa.Table) -> pa.Table:
        # same naming scheme as sources.repo_table so import targets resolve
        # to real files of the same table (no phantom vertices)
        from .repo_table import IMPORT_FMT, lang_of, path_of, repo_of

        vids = np.asarray(batch["id"], np.int64)
        t = powerlaw_edges_batch(vids, nverts, alpha, truncate, False, seed)
        src = np.asarray(t["src"], np.uint64).astype(np.int64)
        dst = np.asarray(t["dst"], np.uint64).astype(np.int64)
        # src is ascending (emitted per vid); group contiguous runs
        cut = np.searchsorted(src, vids, side="left")
        cut_hi = np.searchsorted(src, vids, side="right")
        contents, repos, paths, commits, langs = [], [], [], [], []
        for i, lo, hi in zip(vids.tolist(), cut.tolist(), cut_hi.tolist()):
            lang = lang_of(i)
            fmt = IMPORT_FMT[lang]
            contents.append("\n".join(fmt.format(t=t, j=j + 1)
                                      for j, t in enumerate(dst[lo:hi].tolist())))
            repos.append(repo_of(i))
            paths.append(path_of(i))
            commits.append(f"c{i:039d}")
            langs.append(lang)
        return pa.table({
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        })

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (ray.data.range(nverts)
     .map_batches(gen, batch_format="pyarrow", batch_size=batch_size)
     .write_parquet(tmp))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out
