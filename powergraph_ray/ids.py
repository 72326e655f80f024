"""Deterministic 64-bit vertex / edge hashing.

Mirrors the role of the reference's ``graph_hash`` (graph_hash.hpp:32-61):
``hash_vertex = integer_mix(vid)`` and ``hash_edge(pair, seed)`` are the
canonical placement hashes used for master assignment and edge partitioning.
We use the public splitmix64 finalizer (Steele et al., "Fast splittable
pseudorandom number generators") as the integer mix — vectorized over numpy
uint64 arrays — and blake2b-8 for string → uint64 file identity.

All functions are pure and deterministic so that partition assignment is
reproducible across runs (required for checkpoint resume and for the
replication-factor accounting in ``state.partition``).
"""

from __future__ import annotations

import os
from hashlib import blake2b

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

# Knuth's multiplicative constant — the reference's synthetic-powerlaw target
# walk uses `t = (t + 2654435761) % nverts` (distributed_graph.hpp:2397-2402).
KNUTH_MIX = 2654435761


def tune_malloc(threshold: int = 1 << 30) -> bool:
    """Keep large numpy buffers on the recycled heap instead of per-alloc
    mmap/munmap.

    glibc serves every allocation above M_MMAP_THRESHOLD (default 128 KiB)
    with a fresh ``mmap`` and returns it to the kernel on free — so a
    superstep kernel that allocates O(nv) arrays re-faults every page of
    them on EVERY superstep. On hosts with slow page-fault paths (this
    sandbox VM serves cold faults through a ~100-200 µs handler) that fault
    traffic is proportional to total allocation volume and independent of
    CPU count — it flat-lines superstep scaling. Raising M_MMAP_THRESHOLD
    (and M_TRIM_THRESHOLD, so the heap top is not returned either) makes
    repeated same-size large allocations reuse warm pages.

    Called at runtime via ``mallopt`` (ctypes) from the partition actors and
    the engine driver; Ray *Data* workers (ingest) are covered by exporting
    ``MALLOC_MMAP_THRESHOLD_``/``MALLOC_TRIM_THRESHOLD_`` before
    ``ray.init`` (bench.py / tests/conftest.py) since env propagates to
    spawned workers. No-op on non-glibc platforms.

    Also disables numpy's ``madvise(MADV_HUGEPAGE)`` on ≥4 MiB buffers (see
    ``disable_numpy_hugepage``), the other allocation-path fault tax."""
    disable_numpy_hugepage()
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(-3, ctypes.c_int(threshold))  # M_MMAP_THRESHOLD
        ok2 = libc.mallopt(-1, ctypes.c_int(threshold))  # M_TRIM_THRESHOLD
        return bool(ok1 and ok2)
    except Exception:
        return False


def tune_actor_threads(cpu: int = 1, io: int = 2) -> None:
    """Cap pyarrow's per-process thread pools inside partition actors.

    The P partition actors deliberately run at 0 scheduling CPUs and
    multiplex over the node's cores, so each is logically single-threaded.
    Ray already exports ``OMP_NUM_THREADS=1`` to workers (which pyarrow's
    CPU pool honors), so this is defense-in-depth for actors spawned under
    a foreign ``ray.init`` that overrides that env — without the cap, a
    shard read (``pq.read_table`` over a multi-fragment directory) from P
    actors at once would spawn P×ncores runnable decode threads. The IO
    pool (default 8) is trimmed to 2: enough for fragment prefetch without
    P×8 idle IO threads per node."""
    try:
        import pyarrow as pa

        pa.set_cpu_count(max(1, int(cpu)))
        pa.set_io_thread_count(max(1, int(io)))
    except Exception:
        pass


def disable_numpy_hugepage() -> bool:
    """Turn off numpy's automatic ``madvise(MADV_HUGEPAGE)`` on large buffers.

    numpy (≥1.19, with THP in madvise mode) marks every ≥4 MiB allocation
    huge-page-backed. On hosts whose hypervisor serves 2 MiB faults slowly
    (this sandbox VM: ~200 ms per 2 MiB fault ≈ 11 MB/s, vs ~2.6 µs per
    4 KiB fault ≈ 1.5 GB/s — measured with getrusage fault counters), that
    turns EVERY cold large-array allocation into a stall: a 25 MB
    ``ndarray.copy()`` costs 2.3 s cold and 0.023 s with the madvise off —
    100×. This tax hit ingest (shard load / vertex negotiation / CSR build)
    and every first-touch kernel buffer, and is paid again by every new
    worker process, which is why it also capped CPU scaling.

    Uses numpy's runtime toggle so it works in ANY process that imports this
    package — including Ray workers spawned by a foreign ``ray.init`` whose
    environment we don't control. Set ``GRAFT_NUMPY_HUGEPAGE=1`` to keep
    numpy's default (sensible on bare metal where THP faults are cheap)."""
    if os.environ.get("GRAFT_NUMPY_HUGEPAGE") == "1":
        return False
    if os.environ.get("NUMPY_MADVISE_HUGEPAGE") == "1":
        # the user explicitly opted into huge pages via numpy's own env var —
        # respect it (don't fight the runtime toggle either)
        return False
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # future numpy imports
    # numpy ≥2.0 moved the private module to numpy._core; try it first, fall
    # back to the 1.x location (env pins 1.26.4 today — this keeps the test
    # suite alive across a numpy upgrade)
    for modname in ("numpy._core.multiarray", "numpy.core.multiarray"):
        try:
            import importlib

            multiarray = importlib.import_module(modname)
            multiarray._set_madvise_hugepage(False)
            return True
        except Exception:
            continue
    return False


def integer_mix(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """splitmix64 finalizer over uint64 (vectorized).

    Role of graph_hash.hpp:32-34 ``hash_vertex(vid) = integer_mix(vid)``.
    """
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (z + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        z = z ^ (z >> np.uint64(31))
    return z if z.ndim else np.uint64(z)


def hash_vertex(vid: np.ndarray | int) -> np.ndarray | np.uint64:
    """Canonical vertex placement hash (graph_hash.hpp:32-34)."""
    return integer_mix(vid)


def hash_edge(src: np.ndarray, dst: np.ndarray, seed: int = 0x5BD1E995) -> np.ndarray:
    """Canonical edge hash over the *undirected* pair.

    The reference partitions an edge by ``hash_edge(min(s,t), max(s,t))``
    (ingress_edge_decision.hpp:49-56) so that the two directions of a pair
    land on the same partition. Same here: combine the mixed endpoints
    order-insensitively, then re-mix with a seed.
    """
    s = np.asarray(src, dtype=np.uint64)
    d = np.asarray(dst, dtype=np.uint64)
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    with np.errstate(over="ignore"):
        h = integer_mix(lo) ^ (integer_mix(hi) + _GOLDEN + np.uint64(seed))
    return integer_mix(h)


def edge_partition(src: np.ndarray, dst: np.ndarray, num_partitions: int) -> np.ndarray:
    """``part = hash_edge(min,max) % P`` (ingress_edge_decision.hpp:49-56)."""
    return (hash_edge(src, dst) % np.uint64(num_partitions)).astype(np.uint32)


def edge_partition_grid(src: np.ndarray, dst: np.ndarray, num_partitions: int) -> np.ndarray:
    """Grid-constrained edge placement (distributed_constrained_random_ingress
    + sharding_constraint.hpp grid mode, doc distributed_graph.hpp:193-202):
    arrange P = s*s partitions in an s×s grid and place edge (u,v) in cell
    (row ``hash(u) % s``, col ``hash(v) % s``). Every vertex's edges then
    touch at most ``2s-1`` partitions (its row + its column), bounding the
    vertex-cut replication factor at ``2*sqrt(P)-1`` instead of ~P for pure
    random hashing. Requires a square P.

    Note: both copies of a *directed* pair land on the same partition (the
    placement is a pure function of (u,v)), so ingress-local dedup stays
    valid; the reverse edge (v,u) may land elsewhere, as in the reference.
    """
    s = int(round(num_partitions ** 0.5))
    if s * s != num_partitions:
        raise ValueError(f"grid ingress needs a square partition count, got {num_partitions}")
    r = (integer_mix(np.asarray(src, np.uint64)) % np.uint64(s)).astype(np.uint32)
    c = (integer_mix(np.asarray(dst, np.uint64)) % np.uint64(s)).astype(np.uint32)
    return r * np.uint32(s) + c


from functools import lru_cache


@lru_cache(maxsize=None)
def pds_set(p: int) -> tuple[int, ...]:
    """Perfect difference set modulo p²+p+1 — the reference's LFSR search
    (generate_pds.hpp:29-104): find (a,b,c) whose cubic recurrence
    ``s_i = a·s_{i-1} + b·s_{i-2} + c·s_{i-3} (mod p)`` from (0,0,1) has
    period p²+p+1 with exactly p+1 zeros; those zero positions form the
    difference set. p=1 → (0,2) (sharding_constraint.hpp:147-152)."""
    if p == 1:
        return (0, 2)
    L = p * p + p + 1
    for a in range(p):
        for b in range(p):
            if a == 0 and b == 0:
                continue
            for c in range(1, p):
                seq = [0, 0, 1]
                zeros = [0, 1]
                ok = True
                for i in range(3, L + 2):
                    v = (a * seq[-1] + b * seq[-2] + c * seq[-3]) % p
                    seq.append(v)
                    if v == 0 and i < L:
                        zeros.append(i)
                        if len(zeros) > p + 1:
                            ok = False
                            break
                if not ok or seq[L] != 0 or seq[L + 1] != 0 or len(zeros) != p + 1:
                    continue
                # verify the difference-cover property (generate_pds.hpp:33-47)
                d = np.asarray(zeros, np.int64)
                diffs = (d[:, None] - d[None, :]) % L
                cnt = np.bincount(diffs.ravel(), minlength=L)
                if (cnt[1:] == 1).all():
                    return tuple(zeros)
    raise ValueError(f"no perfect difference set found for p={p}")


def is_pds_compatible(num_partitions: int) -> int | None:
    """→ p if num_partitions == p²+p+1 (sharding_constraint.hpp:74-77)."""
    p = int((num_partitions - 1) ** 0.5)
    return p if p > 0 and p * p + p + 1 == num_partitions else None


@lru_cache(maxsize=None)
def _pds_joint_table(num_partitions: int):
    """Flattened joint-neighbor cache: for shards (i,j), the sorted
    intersection A_i ∩ A_j where A_i = {(d+i) mod P} over the PDS
    (sharding_constraint.hpp:93-100,165-191). Returns (offsets, values,
    counts) ragged arrays indexed by i*P+j."""
    P = num_partitions
    p = is_pds_compatible(P)
    if p is None:
        raise ValueError(f"pds ingress needs p^2+p+1 partitions, p prime "
                         f"(3, 7, 13, 31, 57...), got {P}")
    D = np.asarray(pds_set(p), np.int64)
    A = np.sort((D[None, :] + np.arange(P)[:, None]) % P, axis=1)
    vals: list[np.ndarray] = []
    counts = np.empty(P * P, np.int64)
    for i in range(P):
        for j in range(P):
            inter = np.intersect1d(A[i], A[j], assume_unique=True)
            assert inter.size > 0  # guaranteed by the PDS property
            counts[i * P + j] = inter.size
            vals.append(inter)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return offsets, np.concatenate(vals), counts


def edge_partition_pds(src: np.ndarray, dst: np.ndarray, num_partitions: int) -> np.ndarray:
    """PDS-constrained edge placement
    (distributed_constrained_random_ingress.hpp + sharding_constraint.hpp
    "pds"): edge (u,v) may only land in A_{h(u)%P} ∩ A_{h(v)%P}; the pick
    among candidates is ``hash_edge % |candidates|``
    (ingress_edge_decision.hpp:59-66). Each vertex's edges touch at most
    |A_i| = p+1 ≈ √P shards — lower than grid's 2√P−1 bound, at the P
    values p²+p+1 supports. Pure function of (u,v) → both copies of a
    directed pair co-locate, so ingress-local dedup stays valid."""
    P = num_partitions
    offsets, values, counts = _pds_joint_table(P)
    i = (integer_mix(np.asarray(src, np.uint64)) % np.uint64(P)).astype(np.int64)
    j = (integer_mix(np.asarray(dst, np.uint64)) % np.uint64(P)).astype(np.int64)
    idx = i * P + j
    k = (hash_edge(src, dst) % counts[idx].astype(np.uint64)).astype(np.int64)
    return values[offsets[idx] + k].astype(np.uint32)


def hash64_str(s: str) -> int:
    """uint64 identity hash of a string (file identity ``repo:path``).

    blake2b with an 8-byte digest; collision probability over 10^12 files is
    ~2.7e-6 (birthday bound) — acceptable for link-graph vertex identity; a
    16-byte digest is a one-line change if not.
    """
    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def hash64_str_md5(s: str) -> int:
    """uint64 hash = little-endian of md5 digest bytes 8..16 — bit-for-bit
    equal to DuckDB's ``md5_number_lower()``. Used where a SQL oracle must
    recompute the exact same token hashes (e.g. the oracled SimHash query);
    blake2 (:func:`hash64_str`) stays the engine default."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def hash64_str_array(strs, hasher=None) -> np.ndarray:
    """Vectorized-ish uint64 hash of a sequence of strings.

    Per-row hashlib is the hot cost at ingest; at 10^12-file scale this stage
    would use a C-speed hash (e.g. pyarrow dictionary-encode unique paths
    first, hash only uniques) — here we hash uniques then take() back, which
    already collapses the per-row cost to per-distinct-file.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    hasher = hasher or hash64_str
    arr = pa.array(strs, type=pa.string()) if not isinstance(strs, (pa.Array, pa.ChunkedArray)) else strs
    enc = pc.dictionary_encode(arr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    lut = np.fromiter((hasher(u) for u in uniq), dtype=np.uint64, count=len(uniq))
    idx = np.asarray(enc.indices)
    return lut[idx]


def round_half_away(x, decimals: int = 6):
    """Round half-away-from-zero (ties like 0.1953125 → 0.195313) — the SQL
    ``round()`` convention, used wherever a float column is value-hash
    compared against a DuckDB oracle (np.round is half-to-even)."""
    import numpy as np

    s = 10.0 ** decimals
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s

def prob_threshold(p: float) -> np.uint64:
    """Exact uint64 threshold for ``hash_roll < p * 2**64`` comparisons
    (clamped to 2**64-1 for p=1 — a 2^-64 under-acceptance). Clamping runs
    in PYTHON ints: a float64 2**64 cast to uint64 is undefined behavior
    (wraps to 0 on x86). Used by the SIR cascade rolls and node2vec
    rejection acceptance."""
    t = int(p * (1 << 64))
    return np.uint64(min(max(t, 0), (1 << 64) - 1))
