"""The BSP Gather-Apply-Scatter superstep engine.

Re-expresses the reference's ``synchronous_engine`` (synchronous_engine.hpp:
62-205, 1271-1791) on Ray: one superstep = per-edge-partition vectorized
kernels (gather / scatter-message generation) producing *pre-reduced
partials* (the role of ``pre_local_gather``/local gather accumulation,
ivertex_program.hpp:729-765 and synchronous_engine.hpp:1564-1663), a
**sharded reduce-scatter** of the partials (the master-side ``+=`` merge,
parallelized over vertex-range chunks), and a vectorized ``apply`` executed
*inside each range reducer* (synchronous_engine.hpp:1668-1733) so no O(nv)
array ever crosses the driver during the loop.

Physical layout
---------------
- **Edges live in actor state.** Graph structure is static after build
  (distributed_graph.hpp "finalize" semantics); each of the P partitions is a
  Ray actor holding its edge block as dense-index numpy arrays, loaded once
  from hash-partitioned Parquet written by ``build_graph`` (the ingress
  shuffle, distributed_ingress_base.hpp:163-318). Edges are partitioned by
  ``hash_edge(min,max) % P`` (ingress_edge_decision.hpp:49-56) — a vertex-cut:
  a high-degree vertex's edges spread over *all* partitions, and its partial
  gathers are merged by the monoid, which is exactly PowerGraph's
  master/mirror trick re-expressed.
- **Vertex state is dense and range-sharded.** Global vids (uint64,
  arbitrary) are compacted to ``[0, nv)`` once at build. Per-superstep state
  is a dict of numpy arrays living in the object store as R vertex-range
  chunks (the "masters", range-partitioned). One superstep:

      actors:   partial(edges, state)  -> R range-chunked partials each
                                          (``num_returns=R`` → one ObjectRef
                                          per (partition, range) pair)
      reducers: chunk r of all P partials --monoid merge in fixed partition
                order--> total_r --apply--> new state chunk r  (+ tiny stats)
      driver:   collects ONLY the stats (n_active, l1_delta) — termination
                check (synchronous_engine.hpp:1341-1368)

  Actors re-assemble the full broadcast arrays from the R chunk refs at the
  start of the next superstep (zero-copy plasma reads + one concatenate) —
  the mirror-update broadcast of execute_applys (synchronous_engine.hpp:
  1668-1733). All communication is object-store peer-to-peer; the driver
  handles O(R) refs and O(1) floats per superstep, so the loop scales with
  cluster size.

Checkpoint / resume (north rule): every ``checkpoint_interval`` supersteps the
R state chunks are written as per-range Parquet (directly from the reducers'
output refs — no driver copy) plus ``metrics.json`` and ``lineage.json``
under ``iter=NNNNN/``, committed by an atomic rename + ``_COMPLETE`` marker;
``resume=True`` loads the latest complete superstep and replays identically
(all kernels are deterministic, including float summation order — per-
partition ``np.bincount`` in the partition's fixed edge order, chunks merged
in fixed partition order).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..ids import (edge_partition, edge_partition_grid, edge_partition_pds,
                   tune_actor_threads, tune_malloc)


class VertexProgram:
    """The user-extension surface (role of ``ivertex_program``,
    ivertex_program.hpp:276-348), vectorized over numpy arrays.

    ``partial`` runs inside every edge partition (gather + scatter-message
    generation, pre-reduced locally); ``merge`` is the commutative-associative
    monoid ``+=`` (ivertex_program.hpp:137-151); ``apply`` is the only hook
    that mutates vertex state (ivertex_program.hpp:648-650).

    Kernel contract (required for the range-restricted sharded path): a
    ``partial`` may index the broadcast arrays ONLY at the partition's local
    edge endpoints (untouched vertex ranges arrive zero-filled), and must
    leave the monoid identity at every non-local vertex of its output (this
    is already required for the cross-partition merge to be correct).

    A *shardable* program (``shardable = True``) additionally provides
    ``split_partial`` (cut one partial into R vertex-range chunks) and
    ``apply_chunk`` (apply restricted to a range) — chunk semantics must
    compose: merging/applying per chunk must equal the global merge/apply on
    the concatenation. All built-in programs are shardable; a custom program
    without these hooks still runs via the driver-merge fallback path.
    """

    name = "vp"
    #: bundle keys shipped to every partition each superstep (mirror update)
    broadcast_keys: tuple[str, ...] = ("value", "active")
    shardable = False
    #: set True to get a per-partition auxiliary structure (built once per
    #: actor by ``build_aux``, cached across supersteps — e.g. sorted-order
    #: segment indices for ``ufunc.reduceat`` message reduction, the CSR/CSC
    #: build of local_graph.hpp:266-273) passed to ``partial_aux``
    wants_aux = False
    #: set True to receive the partition's resident edge-payload columns
    #: (the ``EdgeData`` template of distributed_graph.hpp:164-177) — the
    #: kernel then runs via ``partial_edata(src, dst, edata, nv, it, aux,
    #: *arrays)`` where ``edata`` is a dict of numpy arrays aligned with the
    #: partition's (finalized) edge order
    wants_edata = False
    #: set True to receive the partition's dense→global vid table (a
    #: zero-copy plasma view) — the kernel then runs via
    #: ``partial_vids(src, dst, vids, nv, it, *arrays)``. Needed by programs
    #: whose per-edge work hashes the GLOBAL vertex ids (so a SQL replay
    #: over the original ids is bit-exact), e.g. the SIR cascade's
    #: deterministic per-edge infection rolls (apps/cascades/cascades.cpp).
    wants_vids = False

    def build_aux(self, src: np.ndarray, dst: np.ndarray, nv: int) -> Any:
        return None

    def partial_aux(self, src, dst, nv, iteration, aux, *arrays) -> Any:
        raise NotImplementedError

    def partial_edata(self, src, dst, edata, nv, iteration, aux, *arrays) -> Any:
        """Edge-payload kernel (``wants_edata = True``); ``aux`` is the cached
        ``build_aux`` result when ``wants_aux`` is also set, else None."""
        raise NotImplementedError

    def partial_vids(self, src, dst, vids, nv, iteration, *arrays) -> Any:
        """Global-vid kernel (``wants_vids = True``); ``vids`` is the full
        dense→global table resident in the partition actor."""
        raise NotImplementedError

    def prepare(self, graph: "Graph") -> None:
        """Called once per run (fresh AND resumed) before the loop; put
        shared aux state (degree arrays, …) into the object store here."""

    def init_bundle(self, graph: "Graph") -> dict[str, np.ndarray]:
        raise NotImplementedError

    #: set True when ``init_chunk`` is implemented: the sharded engine then
    #: builds the initial state as R range chunks in TASKS (each reading the
    #: plasma vid/degree tables zero-copy) — the driver never materializes
    #: an O(nv) bundle. Required for nv-independent driver RSS end-to-end.
    supports_chunk_init = False

    def init_chunk(self, lo: int, hi: int, nv: int, vids: np.ndarray,
                   out_deg: np.ndarray, in_deg: np.ndarray) -> dict[str, np.ndarray]:
        """Initial state for dense range [lo, hi) — must equal
        ``{k: v[lo:hi] for k, v in init_bundle(g).items()}``. ``vids`` /
        ``out_deg`` / ``in_deg`` are the FULL dense arrays (zero-copy plasma
        views inside the task); slice them."""
        raise NotImplementedError

    def partial(self, src: np.ndarray, dst: np.ndarray, nv: int, iteration: int, *arrays) -> Any:
        """Per-partition kernel: edge arrays (dense indices) + broadcast state
        → a pre-reduced partial (dense array or tuple of arrays)."""
        raise NotImplementedError

    @staticmethod
    def merge(a: Any, b: Any) -> Any:
        """Commutative-associative combine; must also work on range chunks."""
        raise NotImplementedError

    def apply(self, bundle: dict[str, np.ndarray], total: Any, iteration: int) -> tuple[dict[str, np.ndarray], int, float]:
        """→ (new bundle, n_active, l1_delta). n_active == 0 terminates."""
        raise NotImplementedError

    # -- sharded-reduce hooks (optional) ----------------------------------
    #: optional range-native kernel: ``partial_sharded(src, dst, nv,
    #: iteration, bounds, tidx, *arrays) -> {range: chunk}`` emits each
    #: touched reduce range's chunk directly (edges are (dst, src)-sorted,
    #: so each range is a contiguous slice of dst). When defined (non-None)
    #: the sharded superstep skips the full-O(nv) transient partial +
    #: ``split_partial`` copy. Chunks must equal ``split_partial(partial)``'s
    #: bit-for-bit (same per-element accumulation order). With
    #: ``wants_aux`` the cached ``build_aux`` structure is inserted after
    #: ``tidx``: ``partial_sharded(src, dst, nv, it, bounds, tidx, aux,
    #: *arrays)``; with ``wants_edata`` the edata dict is inserted after
    #: ``dst`` instead.
    partial_sharded = None

    def split_partial(self, partial: Any, bounds: np.ndarray) -> list[Any]:
        raise NotImplementedError

    def apply_chunk(self, bundle_chunk: dict[str, np.ndarray], total_chunk: Any,
                    iteration: int, lo: int, hi: int, nv: int) -> tuple[dict[str, np.ndarray], int, float]:
        raise NotImplementedError

    def max_iterations(self) -> int:
        return 1 << 30

    def result(self, bundle: dict[str, np.ndarray]) -> np.ndarray:
        return bundle["value"]


class VertexAggregator:
    """A named aggregate computed over vertex state during a run — the role
    of ``engine.add_vertex_aggregator`` + ``aggregate_periodic``
    (distributed_aggregator.hpp:396-612): ``map_chunk`` runs on each state
    chunk (inside a task, vectorized), partials are ``reduce``-merged in
    fixed order, ``finalize`` runs on the driver (the proc-0 role).

    Trigger: ``every`` = every k supersteps, or ``every_secs`` = wall-clock
    period (the reference's ``aggregate_periodic(key, seconds)`` semantics,
    distributed_aggregator.hpp:518-612 — checked between supersteps, so the
    effective period is rounded up to superstep boundaries; the first
    superstep always fires). ``every_secs`` takes precedence when set."""

    def __init__(self, map_chunk, reduce=None, finalize=None, every: int = 1,
                 every_secs: float | None = None) -> None:
        self.map_chunk = map_chunk
        self.reduce = reduce or (lambda a, b: a + b)
        self.finalize = finalize or (lambda v, it: v)
        self.every = max(1, every)
        self.every_secs = every_secs


class EdgeAggregator:
    """The edge-side named aggregate (``engine.add_edge_aggregator``,
    distributed_aggregator.hpp:396-514): ``map_part(src, dst, edata, nv)``
    runs on every resident edge partition (vectorized, where the edges
    live), partials ``reduce`` in fixed partition order, ``finalize`` on the
    driver. ``every``/``every_secs`` as in :class:`VertexAggregator`."""

    def __init__(self, map_part, reduce=None, finalize=None, every: int = 1,
                 every_secs: float | None = None) -> None:
        self.map_part = map_part
        self.reduce = reduce or (lambda a, b: a + b)
        self.finalize = finalize or (lambda v, it: v)
        self.every = max(1, every)
        self.every_secs = every_secs


@ray.remote
def _agg_chunk_task(agg: VertexAggregator, bundle_chunk, lo: int, hi: int):
    return agg.map_chunk(bundle_chunk, lo, hi)


def split_dense(arrays, bounds: np.ndarray) -> list[Any]:
    """Slice a dense array (or tuple of dense arrays) into range chunks —
    the default ``split_partial`` for dense partials."""
    if isinstance(arrays, tuple):
        per = [split_dense(a, bounds) for a in arrays]
        return [tuple(p[r] for p in per) for r in range(len(bounds) - 1)]
    if arrays is None:
        return [None] * (len(bounds) - 1)
    return [arrays[bounds[r]:bounds[r + 1]] for r in range(len(bounds) - 1)]


@ray.remote
class EdgePartitionActor:
    """One graph partition: resident edge block in dense-index space.

    The analogue of ``local_graph`` (local_graph.hpp:69, 266-273): edges are
    loaded once from this partition's Parquet shard, global ids mapped to
    dense indices against the broadcast sorted-vid array, then every
    superstep is pure numpy over the resident arrays. The actor is
    program-agnostic — the (small) vertex-program object rides along on each
    superstep call, so one pool serves every algorithm on the graph.
    """

    def __init__(self, part_id: int, parquet_dir: str, dedup: bool = False,
                 edata_cols: tuple = (), vids_ref_holder: list | None = None,
                 vids_path: str | None = None, vids_sorted: bool = True,
                 vid_buckets: int = 0) -> None:
        """A constructor-complete bootstrap makes the actor **restart-safe**:
        a Ray-restarted instance lazily rebuilds its edge block from its
        Parquet shard + the negotiated vid table on the next call
        (``_ensure``) — the scale-path answer to a lost worker mid-run.
        The vid table comes from ``vids_ref_holder`` (a 1-list wrapping an
        ObjectRef, wrapped so Ray does NOT deref it into the constructor) or
        from ``vids_path`` (Parquet written by ``build_graph`` after vertex
        negotiation — the durable variant used on the primary build path).
        ``vids_sorted=False`` marks a bucket-ordered vid table (see
        ``build_graph(vid_order="bucket")``); ``vid_buckets`` is its bucket
        count nb (lets a restarted actor rebuild the bucket-aware global→dense
        map without an O(nv log nv) argsort)."""
        self.part_id = part_id
        self.dir = parquet_dir
        self.gsrc: np.ndarray | None = None  # global ids (pre-finalize)
        self.gdst: np.ndarray | None = None
        self.src: np.ndarray | None = None   # dense indices (post-finalize)
        self.dst: np.ndarray | None = None
        self.edata: dict[str, np.ndarray] = {}  # edge payload columns
        self.nv = 0
        self._aux: dict[str, Any] = {}       # per-program cached structures
        self._local_dense: np.ndarray | None = None  # sorted local dense vids
        self._touch_cache: dict[bytes, np.ndarray] = {}
        self._bcast_buf: dict[tuple, np.ndarray] = {}  # reused O(nv) buffers
        self._prof = {"fetch": 0.0, "assemble": 0.0, "kernel": 0.0,
                      "reduce": 0.0, "apply": 0.0, "n_steps": 0,
                      "ts_init": time.time()}
        tune_malloc()  # recycle large kernel buffers (see ids.tune_malloc)
        tune_actor_threads()  # arrow pools: 1 CPU / 2 IO per 0-CPU actor (ids.py)
        self._bucket_bounds: np.ndarray | None = None
        self._boot = (dedup, tuple(edata_cols),
                      vids_ref_holder[0] if vids_ref_holder else None,
                      vids_path, vids_sorted, vid_buckets)

    def _ensure(self) -> None:
        """Rebuild resident state after an actor restart (no-op when live)."""
        if self.src is None:
            dedup, edata_cols, vids_ref, vids_path, vids_sorted, vid_buckets = self._boot
            if vids_ref is not None:
                vids = ray.get(vids_ref)
            elif vids_path is not None and os.path.exists(vids_path):
                vids = np.asarray(pq.read_table(vids_path)["vid"], np.uint64)
            else:
                raise RuntimeError(
                    f"partition {self.part_id} has no resident edges and no "
                    "bootstrap vid table (restarted before vertex "
                    "negotiation completed — rerun the build)")
            self.load_raw(edata_cols)
            self.finalize(vids, dedup, vids_sorted, vid_buckets)

    def load_raw(self, edata_cols: tuple = ()) -> dict:
        """Read this partition's edge shard; → stats + local vid universe
        participation (the vertex-negotiation partial,
        distributed_ingress_base.hpp:86-109). ``edata_cols`` are extra edge
        payload columns (the EdgeData template) kept resident alongside."""
        t0 = time.perf_counter()
        self._prof.setdefault("ts_read0", time.time())
        path = os.path.join(self.dir, f"part={self.part_id}")
        if os.path.isdir(path):
            t = pq.read_table(path, columns=["src", "dst", *edata_cols])
            self.gsrc = np.asarray(t["src"], dtype=np.uint64)
            self.gdst = np.asarray(t["dst"], dtype=np.uint64)
            self.edata = {c: np.asarray(t[c]) for c in edata_cols}
        else:
            self.gsrc = np.empty(0, np.uint64)
            self.gdst = np.empty(0, np.uint64)
            self.edata = {c: np.empty(0, np.float64) for c in edata_cols}
        self._prof["ing_read"] = self._prof.get("ing_read", 0.0) + \
            (time.perf_counter() - t0)
        self._prof["ts_read1"] = time.time()
        return {"part": self.part_id, "num_edges": len(self.gsrc)}

    # -- streaming ingress (in-memory buffered exchange,
    # distributed_ingress_base.hpp:130-140) ------------------------------
    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        """Receive a buffered edge slice pushed by an ingest task."""
        if self.gsrc is None:
            self._buf: list[tuple[np.ndarray, np.ndarray]] = []
            self.gsrc = np.empty(0, np.uint64)  # marks streaming mode
        self._buf.append((np.asarray(src, np.uint64), np.asarray(dst, np.uint64)))
        return len(src)

    def flush_buffers(self) -> dict:
        """End of streaming ingress: concatenate buffered slices."""
        bufs = getattr(self, "_buf", [])
        if bufs:
            self.gsrc = np.concatenate([b[0] for b in bufs])
            self.gdst = np.concatenate([b[1] for b in bufs])
            self._buf = []
        elif self.gsrc is None:
            self.gsrc = np.empty(0, np.uint64)
            self.gdst = np.empty(0, np.uint64)
        return {"part": self.part_id, "num_edges": len(self.gsrc)}

    def dump_shard(self, out_dir: str) -> None:
        """Persist this partition's edges as its Parquet shard (makes a
        stream-built graph durable / reloadable)."""
        if self.gsrc is not None:
            src, dst = self.gsrc, self.gdst
        else:  # post-finalize: re-globalize from dense indices
            src, dst = self.vids[self.src], self.vids[self.dst]
        d = os.path.join(out_dir, f"part={self.part_id}")
        os.makedirs(d, exist_ok=True)
        cols = {"src": pa.array(src, pa.uint64()), "dst": pa.array(dst, pa.uint64())}
        for c, v in self.edata.items():
            cols[c] = pa.array(v)
        pq.write_table(pa.table(cols), os.path.join(d, "edges.parquet"))

    def local_vids(self) -> np.ndarray:
        if self.gsrc is None and self.src is None:  # retried after a restart
            self.load_raw(self._boot[1])
        return np.union1d(self.gsrc, self.gdst)

    def local_vids_bucketed(self, nb: int) -> tuple:
        """Vertex-negotiation partial, sharded by ingress bucket: nb arrays
        (``num_returns=nb``), each the partition's sorted-unique vids whose
        ``integer_mix(vid) % nb`` == bucket. For grid ingress only ~2 of the
        nb slots are non-empty (partition (i,j) touches buckets i and j), so
        the per-bucket union tasks each merge ~2√P small partials instead of
        a log-depth tree over O(nv) arrays — the bucket-sharded analogue of
        the vid all-reduce (distributed_ingress_base.hpp:181-318).

        Fast path: a grid cell (i,j)'s src endpoints are ALL bucket i and its
        dst ALL bucket j (edge_partition_grid is (bucket(u), bucket(v))), so
        each endpoint array sorts whole — two |E_p| uniques instead of one
        2|E_p| union plus a bucket argsort. The sorts are the DRAM-heaviest
        part of ingress; halving their footprint matters at full node load."""
        from ..ids import integer_mix

        if self.gsrc is None and self.src is None:  # retried after a restart
            self.load_raw(self._boot[1])
        t0 = time.perf_counter()
        pieces: dict[int, list] = {}
        for arr in (self.gsrc, self.gdst):
            if arr is None or not len(arr):
                continue
            b = (integer_mix(arr) % np.uint64(nb)).astype(np.int64)
            mn, mx = int(b.min()), int(b.max())
            if mn == mx:  # homogeneous (grid) — no per-element split needed
                pieces.setdefault(mn, []).append(arr)
            else:  # pds / general: split by bucket — no cache for this side
                order = np.argsort(b, kind="stable")
                sb, sa = b[order], arr[order]
                cuts = np.searchsorted(sb, np.arange(nb + 1))
                for k in range(nb):
                    if cuts[k + 1] > cuts[k]:
                        pieces.setdefault(k, []).append(sa[cuts[k]:cuts[k + 1]])
        out = tuple(
            (np.unique(np.concatenate(pieces[k])) if len(pieces[k]) > 1
             else np.unique(pieces[k][0]))
            if k in pieces else np.empty(0, np.uint64)
            for k in range(nb))
        self._prof["ing_vids"] = self._prof.get("ing_vids", 0.0) + \
            (time.perf_counter() - t0)
        self._prof["ts_vids1"] = time.time()
        return out

    def run_edge_agg(self, fn) -> Any:
        """Run an EdgeAggregator map over this partition's resident edges."""
        self._ensure()
        return fn(self.src, self.dst, self.edata, self.nv)

    def dense_edges(self) -> tuple[np.ndarray, np.ndarray]:
        """This partition's resident (src, dst) dense-index edge block —
        the small-graph local-path fetch (callers gate on num_edges)."""
        self._ensure()
        return self.src, self.dst

    def degree_partials(self) -> tuple[np.ndarray, np.ndarray]:
        """This partition's degree contribution (post-finalize) — merged by
        the distributed tree-sum, not on the driver."""
        self._ensure()
        return (np.bincount(self.src, minlength=self.nv).astype(np.int64),
                np.bincount(self.dst, minlength=self.nv).astype(np.int64))

    def degree_partials_bucketed(self) -> tuple:
        """Degree partials sharded by ingress bucket (``num_returns=nb``):
        slot k is ``(out[lo:hi], in[lo:hi])`` for bucket k's dense range, or
        ``None`` when this partition touches no vertex in that bucket. Cuts
        shipped bytes from P×nv to ~2√P×(nv/√P) per build (grid)."""
        self._ensure()
        bounds = self._bucket_bounds
        nb = len(bounds) - 1
        ld = self._local_dense if self._local_dense is not None \
            else np.empty(0, np.int64)
        out = []
        for k in range(nb):
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            touched = np.searchsorted(ld, lo) < np.searchsorted(ld, hi)
            if not touched:
                out.append(None)
                continue
            # per-bucket bincounts over the touched ranges only: a grid
            # partition touches ≤2 of the nb buckets, so this allocates
            # ~2·nv/√P per actor instead of two full O(nv) arrays. dst is
            # sorted post-finalize → its bucket run is a slice; src needs
            # one range mask per touched bucket.
            m = (self.src >= lo) & (self.src < hi)
            o = np.bincount(self.src[m] - lo, minlength=hi - lo).astype(np.int64)
            j0, j1 = np.searchsorted(self.dst, [lo, hi])
            i = np.bincount(self.dst[j0:j1] - lo, minlength=hi - lo).astype(np.int64)
            out.append((o, i))
        return tuple(out)

    def finalize(self, vids, dedup: bool = False, presorted: bool = True,
                 vid_buckets: int = 0,
                 bucket_bounds=None) -> tuple[np.ndarray, np.ndarray, int, int]:
        """Map global→dense against the negotiated vid table, optionally
        dedup exact (src,dst) pairs *locally* (valid because the ingress
        partitioner ``hash_edge(min,max)`` colocates every copy of a pair,
        ingress_edge_decision.hpp:49-56), fix the edge order (deterministic
        float reductions), → degree partials + retained edge count.

        ``presorted=False``: the vid table is bucket-ordered (not globally
        sorted). With ``vid_buckets=nb`` the global→dense map goes through a
        per-bucket ``searchsorted`` (the partition's endpoints hit ~2 of the
        nb bucket ranges — no O(nv log nv) argsort per actor); with
        ``vid_buckets=0`` it falls back to the full sort permutation.

        ``bucket_bounds``: the dense bucket offsets, passed by the driver
        (it already holds them from the sharded negotiation) so each actor
        skips rehashing the whole vid table; when None (actor restart) they
        are re-derived from the table itself.

        (A unique+inverse negotiation cache that turned this map into a
        sorted-query searchsorted was tried and REVERTED: the
        ``return_inverse`` argsort+scatter under P concurrent actors
        measured ~8× slower than the |E| random probes it replaced on this
        host — random probes into the ≤nv/√P bucket slice are the cheaper
        contention profile.)"""
        if self.gsrc is None and self.src is None:  # retried after a restart
            self.load_raw(self._boot[1])
        elif self.src is not None:  # duplicate retry post-finalize: idempotent
            return (int(len(self._local_dense)), len(self.src))
        t0 = time.perf_counter()
        self._prof.setdefault("ts_fin0", time.time())
        self.nv = len(vids)
        self.vids = vids  # zero-copy plasma view; lets dump_shard re-globalize
        idx_t = np.int32 if self.nv < (1 << 31) else np.int64
        if presorted:
            src = np.searchsorted(vids, self.gsrc).astype(idx_t)
            dst = np.searchsorted(vids, self.gdst).astype(idx_t)
        elif vid_buckets:
            from ..ids import integer_mix

            nb = int(vid_buckets)
            if bucket_bounds is not None:
                bounds = np.asarray(bucket_bounds, np.int64)
            else:
                # bucket offsets derivable from the table itself: vids is
                # (bucket, vid)-ordered, so its bucket column is nondecreasing
                vb = (integer_mix(np.asarray(vids)) % np.uint64(nb)).astype(np.int64)
                bounds = np.searchsorted(vb, np.arange(nb + 1)).astype(np.int64)
            self._bucket_bounds = bounds

            def _map(g: np.ndarray) -> np.ndarray:
                gb = (integer_mix(g) % np.uint64(nb)).astype(np.int64)
                # bucket census via bincount (O(E)) — np.unique here cost a
                # full O(E log E) sort per endpoint array
                touched = np.flatnonzero(np.bincount(gb, minlength=nb))
                if len(touched) == 1:  # grid fast path: one bucket per side
                    k = int(touched[0])
                    lo, hi = int(bounds[k]), int(bounds[k + 1])
                    return (lo + np.searchsorted(vids[lo:hi], g)).astype(idx_t)
                out = np.empty(len(g), idx_t)
                for k in touched:  # ~2 buckets per pds partition side
                    m = gb == k
                    lo, hi = int(bounds[k]), int(bounds[k + 1])
                    out[m] = lo + np.searchsorted(vids[lo:hi], g[m])
                return out

            src, dst = _map(self.gsrc), _map(self.gdst)
        else:
            perm = np.argsort(vids, kind="stable").astype(idx_t)
            sv = vids[perm]
            src = perm[np.searchsorted(sv, self.gsrc)]
            dst = perm[np.searchsorted(sv, self.gdst)]
        t1 = time.perf_counter()
        self._prof["fin_map"] = self._prof.get("fin_map", 0.0) + (t1 - t0)
        # fix the (dst, src) edge order with ONE sort of a combined 64-bit
        # key instead of np.lexsort's two stable argsort passes; with no
        # edge payload the sorted key is decoded directly (no permutation
        # gather at all). Stable argsort of the key == lexsort((src, dst)),
        # so dedup keep-first semantics are unchanged.
        if len(src) and self.nv < (1 << 31):
            key = (dst.astype(np.uint64) << np.uint64(32)) | src.astype(np.uint64)
            if self.edata:
                order = np.argsort(key, kind="stable")
                src, dst = src[order], dst[order]
                self.edata = {c: v[order] for c, v in self.edata.items()}
            else:
                key.sort()
                src = (key & np.uint64(0xFFFFFFFF)).astype(idx_t)
                dst = (key >> np.uint64(32)).astype(idx_t)
        else:
            order = np.lexsort((src, dst))
            src, dst = src[order], dst[order]
            self.edata = {c: v[order] for c, v in self.edata.items()}
        t2 = time.perf_counter()
        self._prof["fin_sort"] = self._prof.get("fin_sort", 0.0) + (t2 - t1)
        if dedup and len(src):
            keep = np.ones(len(src), bool)
            keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            src, dst = src[keep], dst[keep]
            # duplicate resolution = keep-first in sorted order (the default
            # of set_duplicate_vertex_strategy, distributed_ingress_base.hpp:155)
            self.edata = {c: v[keep] for c, v in self.edata.items()}
        self.src, self.dst = src, dst
        self.gsrc = self.gdst = None
        # the partition's dense vertex footprint — drives the touched-range
        # restriction of the sharded superstep (emit/read only ranges this
        # partition's edges reference)
        # O(E + nv) flag scan instead of union1d's two O(E log E) sorts —
        # same O(nv)-bytes/actor footprint class as the degree bincounts
        flags = np.zeros(self.nv, np.bool_)
        flags[self.src] = True
        flags[self.dst] = True
        self._local_dense = np.flatnonzero(flags).astype(idx_t)
        self._touch_cache = {}
        self._prof["fin_dense"] = self._prof.get("fin_dense", 0.0) + \
            (time.perf_counter() - t2)
        self._prof["ts_fin1"] = time.time()
        # scalars only — the O(nv) degree arrays go through degree_partials()
        # + the distributed tree-sum, never in bulk through the driver
        return (int(len(self._local_dense)), len(self.src))

    def _partial(self, vp, iteration: int, arrays) -> Any:
        aux = None
        if vp.wants_aux:
            aux = self._aux.get(vp.name)
            if aux is None:
                aux = vp.build_aux(self.src, self.dst, self.nv)
                self._aux[vp.name] = aux
        if getattr(vp, "wants_edata", False):
            return vp.partial_edata(self.src, self.dst, self.edata, self.nv,
                                    iteration, aux, *arrays)
        if getattr(vp, "wants_vids", False):
            return vp.partial_vids(self.src, self.dst, self.vids, self.nv,
                                   iteration, *arrays)
        if vp.wants_aux:
            return vp.partial_aux(self.src, self.dst, self.nv, iteration, aux, *arrays)
        return vp.partial(self.src, self.dst, self.nv, iteration, *arrays)

    def superstep(self, vp, iteration: int, *arrays) -> Any:
        """Legacy whole-partial path (driver-merge fallback)."""
        self._ensure()
        return self._partial(vp, iteration, arrays)

    def _touched_mask(self, b: np.ndarray) -> np.ndarray:
        """Which vertex ranges of ``b`` this partition's edges reference —
        cached per bounds. Empty ranges count as touched (their zero-length
        chunks are free and guarantee every range gets ≥1 real chunk)."""
        key = b.tobytes()
        m = self._touch_cache.get(key)
        if m is None:
            R = len(b) - 1
            m = np.zeros(R, bool)
            ld = self._local_dense
            if ld is not None and len(ld):
                r = np.searchsorted(b, ld, side="right") - 1
                m[np.minimum(np.maximum(r, 0), R - 1)] = True
            m |= b[1:] == b[:-1]
            self._touch_cache[key] = m
        return m

    def touched_ranges(self, bounds) -> np.ndarray:
        """Static per-(graph, bounds) touch mask, fetched ONCE per engine run
        by the driver so reducers are wired only to the partitions that feed
        them (the mirror map of distributed_graph.hpp's vertex records)."""
        self._ensure()
        return self._touched_mask(np.asarray(bounds, np.int64))

    def superstep_sharded(self, vp, iteration: int, bounds: np.ndarray,
                          tidx: np.ndarray, *got) -> dict:
        """Sharded path, **range-restricted**: re-assemble broadcast state
        from ONLY the range chunks this partition's edges touch (zero-copy
        plasma reads; untouched ranges are zero-filled — kernels only index
        broadcast arrays at local vertex indices), run the kernel, and return
        the touched range chunks as ONE ``{range: chunk}`` object (untouched
        ranges are the monoid identity by construction — a partition writes
        only at local indices — and are simply absent). One return object per
        partition per superstep keeps driver object-ownership bookkeeping at
        O(P + R), not O(P×R) — with P=36, R=16 the per-range-object protocol's
        ~600 tiny plasma objects per superstep cost a fixed ~0.15 s of
        owner-side processing that no amount of CPUs removes. Multi-node
        note: a reducer pulls its feeder partitions' whole dicts (~2 buckets
        under grid ingress) to read one range — a ≤2× over-fetch, still
        O(nv/√P) per partition, and zero-copy on co-located reads.
        With bucket-aligned vid ordering (``build_graph(vid_order="bucket")``)
        a grid/pds partition touches ~2/√P of the ranges, cutting the P×nv
        superstep partial+broadcast traffic by ~√P/2 — the mirror-locality
        the reference gets from its constrained ingress
        (distributed_constrained_random_ingress.hpp).

        ``tidx``/``got`` are this partition's touched range indices and the
        matching chunk objects, sent by the driver as DIRECT task args (the
        driver wires them from the same static ``touched_ranges`` masks that
        wire the reducers). Direct args keep every cross-superstep dependency
        visible to Ray's scheduler — an in-body ``ray.get`` of refs hidden in
        a list is invisible, and with supersteps pipelined ahead it head-of-
        line-deadlocks a restarted pool: a reducer's feeder partial is delayed
        by the restart, the host actor skips ahead into the next superstep's
        "ready-looking" partial task, and blocks forever inside it on the very
        chunk its skipped reduce would have produced (observed as all-actors-
        wedged under the mid-run ray.kill test)."""
        self._ensure()
        t0 = time.perf_counter()
        b = np.asarray(bounds, np.int64)
        tidx = np.asarray(tidx, np.int64)
        # an edgeless partition is still sent one chunk for dtypes/shapes
        fetch = tidx if len(tidx) else np.arange(len(got))
        t1 = time.perf_counter()
        arrays = []
        for k in vp.broadcast_keys:
            c0 = got[0][k]
            shape = (self.nv,) + c0.shape[1:]
            # persistent per-(program, key) buffer: a fresh O(nv) allocation
            # here would be mmap'd+munmap'd by glibc EVERY superstep and
            # re-fault all its pages — a cost proportional to nv·P and
            # independent of CPU count (the measured flat-scaling culprit on
            # fault-bound hosts). Stale bytes in untouched ranges are never
            # read: kernels only index broadcast arrays at local vertex
            # indices, which all lie inside touched ranges.
            bk = (vp.name, k)
            arr = self._bcast_buf.get(bk)
            if arr is None or arr.shape != shape or arr.dtype != c0.dtype:
                # empty, not zeros: untouched ranges are never read (kernels
                # index only local vertex positions), and the O(nv) memset
                # per key per actor was pure cold-start fault/bandwidth cost
                arr = np.empty(shape, c0.dtype)
                self._bcast_buf[bk] = arr
            for r, c in zip(fetch, got):
                arr[b[r]:b[r + 1]] = c[k]
            arrays.append(arr)
        t2 = time.perf_counter()
        ps = getattr(vp, "partial_sharded", None)
        if ps is not None:
            # range-native kernel: the VP emits each touched reduce range's
            # chunk directly (dst is (dst, src)-sorted, so a range is a
            # contiguous edge slice). Avoids the full-O(nv) transient partial
            # (~nv·8B per actor per superstep of alloc+zero-fill+slice-copy
            # garbage) that split_partial would carve up — the transient was
            # the dominant cold-start fault volume of the first supersteps
            # (P actors × W pipelined supersteps of fresh O(nv) buffers).
            if getattr(vp, "wants_edata", False):
                # edata-aware range kernel: ``partial_sharded(src, dst,
                # edata, nv, it, bounds, tidx, *arrays)``
                chunks = ps(self.src, self.dst, self.edata, self.nv,
                            iteration, b, tidx, *arrays)
            elif vp.wants_aux:
                # aux-aware range kernel: ``partial_sharded(src, dst, nv,
                # it, bounds, tidx, aux, *arrays)`` — the cached build_aux
                # structure (segment indices for reduceat) rides along
                aux = self._aux.get(vp.name)
                if aux is None:
                    aux = vp.build_aux(self.src, self.dst, self.nv)
                    self._aux[vp.name] = aux
                chunks = ps(self.src, self.dst, self.nv, iteration, b, tidx,
                            aux, *arrays)
            else:
                chunks = ps(self.src, self.dst, self.nv, iteration, b, tidx,
                            *arrays)
            t3 = time.perf_counter()
            self._prof["fetch"] += t1 - t0
            self._prof["assemble"] += t2 - t1
            self._prof["kernel"] += t3 - t2
            self._prof["n_steps"] += 1
            return {int(r): chunks[int(r)] for r in tidx}
        p = self._partial(vp, iteration, arrays)
        t3 = time.perf_counter()
        out = vp.split_partial(p, b)
        self._prof["fetch"] += t1 - t0
        self._prof["assemble"] += t2 - t1
        self._prof["kernel"] += t3 - t2
        self._prof["n_steps"] += 1
        return {int(r): out[r] for r in tidx}

    def profile(self) -> dict:
        """Accumulated per-phase superstep seconds on this actor (since
        construction) — the engine-side ``ds.stats()`` equivalent."""
        return dict(self._prof)

    def reduce_apply_chunk(self, vp, iteration: int, r: int, lo: int, hi: int, nv: int,
                           bundle_chunk, *partial_dicts):
        """Range reducer, co-hosted on the partition actors (keeps the worker
        process count at P — important on memory-fault-bound hosts): monoid-
        merge range ``r``'s chunks out of the feeder partitions' partial
        dicts in fixed partition order (deterministic float order; a feeder
        whose dict lacks ``r`` contributed the untouched-range identity and
        is skipped — bit-identical because merging an identity chunk is
        exact for +/min/max/or), then apply — the master-side merge +
        execute_applys of synchronous_engine.hpp:1564-1733. Called with
        ``num_returns=2`` so the driver only ever touches the stats."""
        self._ensure()
        t0 = time.perf_counter()
        present = [d[r] for d in partial_dicts if r in d]
        total = present[0]
        for c in present[1:]:
            total = vp.merge(total, c)
        t1 = time.perf_counter()
        new_chunk, n_active, l1 = vp.apply_chunk(bundle_chunk, total, iteration, lo, hi, nv)
        self._prof["reduce"] += t1 - t0
        self._prof["apply"] += time.perf_counter() - t1
        return new_chunk, (int(n_active), float(l1))


@ray.remote
def _union2_task(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.union1d(a, b)


@ray.remote
def _degsum2_task(a, b):
    return a[0] + b[0], a[1] + b[1]


@ray.remote
def _union_concat_task(*parts):
    """Merge one bucket's vertex-negotiation partials (most are empty —
    grid partition (i,j) contributes only to buckets i and j)."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


@ray.remote
def _degsum_bucket_task(size: int, *parts):
    """Sum one bucket's degree partials; ``None`` slots = untouched."""
    o = np.zeros(size, np.int64)
    i = np.zeros(size, np.int64)
    for p in parts:
        if p is not None:
            o += p[0]
            i += p[1]
    return o, i


def _tree_binary_ref(task, refs: list):
    """Parallel pairwise tree-reduce of ObjectRefs with a binary remote op —
    keeps the O(data) merge work off the single-threaded driver (the
    vertex-negotiation all-reduce of distributed_ingress_base.hpp:181-318).
    Returns the final ObjectRef (never gathered here — the scale path hands
    it straight to Graph as plasma-backed vertex metadata)."""
    refs = list(refs)
    while len(refs) > 1:
        nxt = [task.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return refs[0]


def _tree_binary(task, refs: list) -> Any:
    return ray.get(_tree_binary_ref(task, refs))


@ray.remote
def _concat_task(*parts):
    return np.concatenate(parts) if parts else np.empty(0, np.uint64)


@ray.remote
def _concat_pick_task(i: int, *tups):
    """Concatenate element ``i`` of each (out, in)-style tuple partial."""
    return np.concatenate([t[i] for t in tups])


@ray.remote
def _pick_task(i: int, tup):
    return tup[i]


@ray.remote
def _arr_len_task(a) -> int:
    return len(a)


@ray.remote
def _write_vids_task(path: str, vids) -> None:
    pq.write_table(pa.table({"vid": pa.array(vids, pa.uint64())}), path)


@ray.remote
def _read_vertex_table_task(path: str):
    t = pq.read_table(path)
    return (np.asarray(t["vid"], np.uint64),
            np.asarray(t["out_deg"], np.int64),
            np.asarray(t["in_deg"], np.int64))


@ray.remote
def _write_vertex_table_task(path: str, vids, out_deg, in_deg) -> None:
    pq.write_table(pa.table({
        "vid": pa.array(vids, pa.uint64()),
        "out_deg": pa.array(out_deg, pa.int64()),
        "in_deg": pa.array(in_deg, pa.int64()),
    }), path)


@ray.remote
def _merge_task(vp_cls, a, b):
    return vp_cls.merge(a, b)


def _tree_reduce(vp, parts: list) -> Any:
    """Monoid tree-reduce of per-partition partials (ObjectRefs) — fallback
    path for non-shardable programs."""
    vp_cls = type(vp)
    refs = list(parts)
    while len(refs) > 1:
        nxt = []
        for i in range(0, len(refs) - 1, 2):
            nxt.append(_merge_task.remote(vp_cls, refs[i], refs[i + 1]))
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return ray.get(refs[0])


@ray.remote
def _write_shard(path: str, vids, lo: int, hi: int, bundle_chunk) -> None:
    cols = {"vid": pa.array(vids[lo:hi], pa.uint64())}
    for k, v in bundle_chunk.items():
        cols[k] = pa.array(v)
    pq.write_table(pa.table(cols), path)


@ray.remote
def _init_chunk_task(vp, lo: int, hi: int, nv: int, vids, out_deg, in_deg):
    return vp.init_chunk(lo, hi, nv, vids, out_deg, in_deg)


@ray.remote
def _read_chunk_task(path: str, expect_n: int) -> dict:
    """One checkpoint state shard → its range's bundle chunk."""
    t = pq.read_table(path)
    if len(t) != expect_n:
        raise ValueError(f"checkpoint shard {path}: {len(t)} rows, "
                         f"expected {expect_n}")
    return {name: np.asarray(t[name]) for name in t.column_names
            if name != "vid"}


@ray.remote
def _chunk_table_task(vids, lo: int, hi: int, chunk, cols_fn) -> pa.Table:
    """(vid-range chunk of final state) → Arrow block for a result Dataset.
    ``cols_fn(chunk_dict) -> {col: array}`` picks/renames the outputs
    (default: every bundle array as-is)."""
    data = cols_fn(chunk) if cols_fn is not None else chunk
    cols = {"vid": pa.array(vids[lo:hi], pa.uint64())}
    for k, v in data.items():
        cols[k] = pa.array(v)
    return pa.table(cols)


@ray.remote
def _vertex_block_task(vids, out_deg, in_deg, lo: int, hi: int) -> pa.Table:
    return pa.table({"vid": pa.array(vids[lo:hi], pa.uint64()),
                     "out_deg": pa.array(out_deg[lo:hi], pa.int64()),
                     "in_deg": pa.array(in_deg[lo:hi], pa.int64())})


def vertex_table_dataset(graph: "Graph", num_blocks: int | None = None):
    """Graph → Dataset of (vid, out_deg, in_deg), blocks built by tasks from
    the plasma-backed vid/degree refs — no driver-side O(nv) arrays."""
    import ray.data

    nv = graph.nv
    nb = num_blocks or max(1, min(64, -(-nv // 500_000)))
    b = np.linspace(0, nv, nb + 1).astype(np.int64)
    refs = [_vertex_block_task.remote(graph.vids_ref(), graph.out_deg_ref(),
                                      graph.in_deg_ref(), int(b[r]), int(b[r + 1]))
            for r in range(nb)]
    return ray.data.from_arrow_refs(refs)


def chunks_to_dataset(graph: "Graph", bounds: np.ndarray, chunk_refs: list,
                      cols_fn=None):
    """Final engine state (R plasma chunk refs) → ``ray.data.Dataset`` of
    ``(vid, <state columns>)`` — one Arrow block per range, built in tasks
    straight from the refs. The driver never holds an O(nv) array; consume
    with ``write_parquet`` / further ``map_batches`` to stay streaming.
    (The vid table is read zero-copy from plasma by each block task.)"""
    import ray.data

    refs = [_chunk_table_task.remote(graph.vids_ref(), int(bounds[r]),
                                     int(bounds[r + 1]), chunk_refs[r], cols_fn)
            for r in range(len(chunk_refs))]
    return ray.data.from_arrow_refs(refs)


class Graph:
    """A finalized distributed graph (vertex-cut edge partitions + degrees).

    Holds a lazily-created persistent actor pool (one actor per partition,
    edge blocks resident) reused by every engine run in the session; handles
    are dropped (actors die) when the Graph is garbage-collected or
    ``close()``d.

    The O(nv) vertex metadata (vid table, degree arrays) lives in PLASMA:
    the primary build path negotiates it entirely in tasks and hands the
    driver only ObjectRefs + the count, so driver RSS is independent of nv.
    ``g.vids`` / ``g.out_deg`` / ``g.in_deg`` are lazy properties that
    gather on first *driver-side* access — the legacy array-returning API —
    while the scale path (chunked engine init, ``result="chunks"``/Dataset
    results, checkpoints) only ever touches the refs."""

    def __init__(self, vids=None, num_edges: int = 0, parquet_dir: str = "",
                 num_partitions: int = 0, out_deg=None, in_deg=None,
                 replication_factor: float = 0.0, dedup: bool = False,
                 edata_cols: tuple = (), vid_order: str = "sorted",
                 bucket_bounds=None, build_profile: dict | None = None,
                 vids_ref=None, nv_count: int | None = None,
                 out_deg_ref=None, in_deg_ref=None) -> None:
        self.num_edges = num_edges
        self.parquet_dir = parquet_dir
        self.num_partitions = num_partitions
        self.replication_factor = replication_factor
        self.dedup = dedup
        #: edge payload columns resident in the partition actors (EdgeData)
        self.edata_cols = edata_cols
        #: "sorted" (default: dense order == sorted vid order) or "bucket"
        #: (dense order == (ingress bucket, vid) — grid/pds mirror locality)
        self.vid_order = vid_order
        #: dense-index offsets of the nb ingress buckets (len nb+1)
        self.bucket_bounds = bucket_bounds
        #: per-phase seconds of the primary build path — bench attribution
        self.build_profile = build_profile
        self._vids_cache = vids
        self._vids_ref = vids_ref
        self._nv = nv_count if nv_count is not None else (
            len(vids) if vids is not None else 0)
        self._out_deg_cache = out_deg
        self._out_deg_ref = out_deg_ref
        self._in_deg_cache = in_deg
        self._in_deg_ref = in_deg_ref
        self._pool = None
        self._sorted_cache = None
        #: cached deduped-shard dir (dedup=True graphs; see dedup_shard_dir)
        self._dedup_dir = None

    # -- lazy plasma-backed vertex metadata -------------------------------
    @property
    def nv(self) -> int:
        return self._nv

    def _lazy(self, cache_attr: str, ref_attr: str):
        val = getattr(self, cache_attr)
        if val is None and getattr(self, ref_attr) is not None:
            val = ray.get(getattr(self, ref_attr))
            setattr(self, cache_attr, val)
        return val

    @property
    def vids(self) -> np.ndarray:
        """uint64 global ids, len nv (dense order) — driver-side gather on
        first access; scale paths use :meth:`vids_ref` instead."""
        v = self._lazy("_vids_cache", "_vids_ref")
        return v if v is not None else np.empty(0, np.uint64)

    @vids.setter
    def vids(self, v) -> None:
        self._vids_cache = v
        self._vids_ref = None
        self._sorted_cache = None
        self._nv = len(v) if v is not None else 0

    @property
    def out_deg(self):
        return self._lazy("_out_deg_cache", "_out_deg_ref")

    @out_deg.setter
    def out_deg(self, v) -> None:
        self._out_deg_cache = v
        self._out_deg_ref = None

    @property
    def in_deg(self):
        return self._lazy("_in_deg_cache", "_in_deg_ref")

    @in_deg.setter
    def in_deg(self, v) -> None:
        self._in_deg_cache = v
        self._in_deg_ref = None

    def _has_degrees(self) -> bool:
        return (self._out_deg_cache is not None
                or self._out_deg_ref is not None)

    def out_deg_ref(self):
        if self._out_deg_ref is None:
            self._out_deg_ref = ray.put(self._out_deg_cache)
        return self._out_deg_ref

    def in_deg_ref(self):
        if self._in_deg_ref is None:
            self._in_deg_ref = ray.put(self._in_deg_cache)
        return self._in_deg_ref

    def _sorted_view(self) -> tuple[np.ndarray, np.ndarray | None]:
        """(sorted vids, perm sorted-pos → dense idx); perm None when the
        dense order is already sorted."""
        if self._sorted_cache is None:
            if self.vid_order == "sorted":
                self._sorted_cache = (self.vids, None)
            else:
                perm = np.argsort(self.vids, kind="stable")
                self._sorted_cache = (self.vids[perm], perm)
        return self._sorted_cache

    def dense(self, gids: np.ndarray) -> np.ndarray:
        """Global vids → dense indices (positions in ``self.vids``).
        For absent vids the returned position is arbitrary — callers that
        must detect absence use :meth:`dense_checked`."""
        sv, perm = self._sorted_view()
        pos = np.searchsorted(sv, np.asarray(gids, dtype=np.uint64))
        if perm is None:
            return pos
        return perm[np.minimum(pos, max(len(perm) - 1, 0))] if len(perm) else pos

    def dense_checked(self, gids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """→ (dense idx, hit mask); misses get an arbitrary in-range idx."""
        g = np.asarray(gids, dtype=np.uint64)
        sv, perm = self._sorted_view()
        if not len(sv):
            return np.zeros(len(g), np.int64), np.zeros(len(g), bool)
        pos = np.searchsorted(sv, g)
        safe = np.minimum(pos, len(sv) - 1)
        hit = (pos < len(sv)) & (sv[safe] == g)
        return (safe if perm is None else perm[safe]), hit

    def vids_ref(self):
        if self._vids_ref is None:
            self._vids_ref = ray.put(self.vids)
        return self._vids_ref

    def sorted_view_refs(self):
        """Task-side global→dense map: (sorted-vid-table ref, perm ref or
        None when dense order is already sorted). The bucket-order perm is
        built ONCE in a task and cached — the driver never holds it."""
        if self.vid_order == "sorted":
            return self.vids_ref(), None
        cached = getattr(self, "_sorted_refs", None)
        if cached is None:
            cached = _sorted_view_task.remote(self.vids_ref())
            self._sorted_refs = cached
        return cached

    def pool(self) -> list:
        """The persistent edge-partition actor pool (built on first use)."""
        if self._pool is None:
            if not self.parquet_dir:
                raise RuntimeError(
                    "stream-built graph has no durable shards and its actor "
                    "pool is gone; call save_graph() while the pool is alive")
            # restart-safe pool: a Ray-restarted actor rebuilds its edge
            # block lazily from (shard Parquet + plasma vid table) via
            # _ensure — lost-worker recovery without restarting the run
            nb = (len(self.bucket_bounds) - 1
                  if self.vid_order == "bucket" and self.bucket_bounds is not None
                  else 0)
            acts = [EdgePartitionActor.options(
                        max_restarts=-1, max_task_retries=-1).remote(
                        p, self.parquet_dir, self.dedup, self.edata_cols,
                        [self.vids_ref()],
                        vids_sorted=self.vid_order == "sorted",
                        vid_buckets=nb)
                    for p in range(self.num_partitions)]
            ray.get([a.load_raw.remote(self.edata_cols) for a in acts])
            fin = ray.get([a.finalize.remote(self.vids_ref(), self.dedup,
                                             self.vid_order == "sorted", nb,
                                             self.bucket_bounds)
                           for a in acts])
            if not self._has_degrees() and nb > 1 and acts:
                dp = [a.degree_partials_bucketed.options(num_returns=nb).remote()
                      for a in acts]
                bb = self.bucket_bounds
                slices = ray.get([_degsum_bucket_task.remote(
                    int(bb[b + 1] - bb[b]), *[d[b] for d in dp])
                    for b in range(nb)])
                self.out_deg = np.concatenate([s[0] for s in slices])
                self.in_deg = np.concatenate([s[1] for s in slices])
            elif not self._has_degrees() and acts:
                self.out_deg, self.in_deg = _tree_binary(
                    _degsum2_task, [a.degree_partials.remote() for a in acts])
            elif not self._has_degrees():
                self.out_deg = np.zeros(self.nv, np.int64)
                self.in_deg = np.zeros(self.nv, np.int64)
            distinct = sum(f[0] for f in fin)
            self.num_edges = sum(f[1] for f in fin)
            # replication factor = Σ_p |V(p)| / |V| — the reference's
            # vertex-cut quality metric (distributed_graph.hpp:251-274).
            self.replication_factor = distinct / max(1, self.nv)
            self._pool = acts
        return self._pool

    def dedup_shard_dir(self) -> str:
        """Directory of *deduped* edge shards, dumped once from the resident
        (post-finalize) partition actors on first use.

        For ``dedup=True`` graphs the raw ingress shards still hold
        duplicate pairs; re-deduping them per ``edge_table()`` call would be
        a wide shuffle each time. Instead each actor writes its own already
        deduped, re-globalized shard (``dump_shard``) exactly once —
        parallel, no driver traffic — and every later reader just
        ``read_parquet``s the cache. The leading underscore keeps the cache
        dir invisible to raw-shard readers of ``parquet_dir``."""
        if not self.dedup:
            return self.parquet_dir
        if self._dedup_dir is None:
            base = self.parquet_dir or tempfile.mkdtemp(prefix="pg_ray_stream_")
            self._dedup_dir = os.path.join(base, "_dedup_shards")
        d = self._dedup_dir
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            tmp = d + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)
            ray.get([a.dump_shard.remote(tmp) for a in self.pool()])
            with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
                f.write("ok\n")
            shutil.rmtree(d, ignore_errors=True)
            os.rename(tmp, d)
        return d

    def close(self) -> None:
        if self._pool:
            for a in self._pool:
                ray.kill(a)
        self._pool = None


def build_graph(edges_ds, num_partitions: int, work_dir: str | None = None,
                dedup: bool = False, ingress: str = "auto",
                edata_cols: tuple = (), vid_order: str = "auto") -> Graph:
    """Ingress: edge Dataset ``(src:uint64, dst:uint64)`` → finalized Graph.

    The reference's ``finalize()`` (distributed_ingress_base.hpp:163-318)
    re-expressed: (1) assign ``part = hash_edge(min,max) % P`` in a
    ``map_batches`` pass, (2) shuffle edges to their partitions by writing
    hash-partitioned Parquet **once** (each partition actor then reads only
    its own shard — no driver bottleneck), (3) negotiate the vertex universe
    (sorted unique vids — the master table) from per-partition unions and the
    degree arrays from per-partition ``bincount`` partials.

    ``vid_order="bucket"`` (grid/pds ingress only) orders the dense vertex
    space by ``(ingress bucket, vid)`` instead of plain sorted vid: a grid
    partition (i,j)'s endpoints then occupy the two contiguous bucket blocks
    i and j (pds: the p+1 blocks of A_i ∪ A_j), so the range-restricted
    sharded superstep broadcasts/emits only ~2/√P of the vertex state per
    partition instead of all of it — the Ray-side payoff of the reference's
    constrained sharding (sharding_constraint.hpp), which there bounds mirror
    fan-out the same way.

    Defaults are the DEPLOYMENT config: ``ingress="auto"`` picks grid when
    the partition count is a deployment-sized square (P ≥ 16 — the regime
    where random hashing's ~P replication hurts and every measured scale
    number here uses grid+bucket; the reference's own recommendation,
    distributed_graph.hpp:193-209) and random hashing otherwise;
    ``vid_order="auto"`` follows with bucket under grid/pds, sorted
    otherwise. Pass ``ingress="random"`` / ``vid_order="sorted"``
    explicitly to opt out.
    """
    if ingress == "auto":
        s = int(round(num_partitions ** 0.5))
        ingress = "grid" if (num_partitions >= 16
                             and s * s == num_partitions) else "random"
    if vid_order == "auto":
        vid_order = "bucket" if ingress in ("grid", "pds") else "sorted"
    if vid_order not in ("sorted", "bucket"):
        raise ValueError(f"unknown vid_order {vid_order!r}")
    if vid_order == "bucket" and ingress not in ("grid", "pds"):
        raise ValueError('vid_order="bucket" requires grid or pds ingress '
                         "(random placement has no bucket structure)")
    work_dir = work_dir or f"/tmp/powergraph_ray/graph/{os.getpid()}_{int(time.time()*1000)}"

    shutil.rmtree(work_dir, ignore_errors=True)
    if ingress == "identity":
        # trust the input's own layout (identity_ingress semantics,
        # distributed_identity_ingress.hpp: edges stay where they were
        # loaded): the edge Dataset carries its own `part` column.
        names = edges_ds.schema().names
        if "part" not in names:
            raise ValueError('identity ingress needs a "part" column on the '
                             "edge Dataset (the trusted input layout); use "
                             "random/grid/pds to have one assigned")
        if dedup:
            raise ValueError("identity ingress cannot guarantee duplicate "
                             "pairs colocate; dedup_edges() first")

        def assign_identity(t: pa.Table) -> pa.Table:
            cols = {"src": pa.array(np.asarray(t["src"], np.uint64), pa.uint64()),
                    "dst": pa.array(np.asarray(t["dst"], np.uint64), pa.uint64()),
                    "part": pa.array((np.asarray(t["part"]).astype(np.uint64)
                                      % np.uint64(num_partitions)).astype(np.uint32),
                                     pa.uint32())}
            for c in edata_cols:
                cols[c] = t[c]
            return pa.table(cols)

        parted = edges_ds.map_batches(assign_identity, batch_format="pyarrow")
    elif ingress in ("oblivious", "hdrf"):
        if dedup:
            raise ValueError("greedy ingress does not colocate duplicate "
                             "pairs; dedup_edges() first or use random/grid")
        if edata_cols:
            raise ValueError("edata_cols not supported with greedy ingress")
        from .ingress import greedy_partition_stage

        parted = greedy_partition_stage(edges_ds, num_partitions, ingress)
    else:
        part_fn = {"random": edge_partition, "grid": edge_partition_grid,
                   "pds": edge_partition_pds}[ingress]
        if ingress == "pds":
            from ..ids import _pds_joint_table

            _pds_joint_table(num_partitions)  # validate P eagerly on the driver

        def assign_part(t: pa.Table) -> pa.Table:
            src = np.asarray(t["src"], dtype=np.uint64)
            dst = np.asarray(t["dst"], dtype=np.uint64)
            part = part_fn(src, dst, num_partitions)
            cols = {
                "src": pa.array(src, pa.uint64()),
                "dst": pa.array(dst, pa.uint64()),
                "part": pa.array(part, pa.uint32()),
            }
            for c in edata_cols:
                cols[c] = t[c]
            return pa.table(cols)

        parted = edges_ds.map_batches(assign_part, batch_format="pyarrow")
    # single streaming pass: generate → assign → hash-partitioned Parquet
    prof: dict[str, float] = {}
    vids_path = os.path.join(work_dir, "_vids.parquet")
    presorted = vid_order == "sorted"
    nb = 0
    if vid_order == "bucket":
        nb = int(round(num_partitions ** 0.5)) if ingress == "grid" else num_partitions
    # actors submitted BEFORE the shuffle write: worker-process spawn +
    # module imports (~100 CPU-s for P=64) overlap the write instead of
    # serializing after it (measured ~6 s of the negotiate wall at 32
    # cores). Their first task (load_raw) is only sent post-write.
    acts = [EdgePartitionActor.options(max_restarts=-1, max_task_retries=-1)
            .remote(p, work_dir, dedup, tuple(edata_cols), None, vids_path,
                    presorted, nb)
            for p in range(num_partitions)]
    # first-call ping, harvested after the write: forces actor scheduling +
    # driver→actor connection setup to happen DURING the write instead of
    # serializing in front of the first load_raw (measured ~3-5 s at P=64)
    ping_refs = [a.profile.remote() for a in acts]
    t0 = time.perf_counter()
    parted.write_parquet(work_dir, partition_cols=["part"])
    prof["shuffle_write"] = time.perf_counter() - t0
    ray.get(ping_refs)
    if os.environ.get("GRAFT_PROF_PING2"):  # dispatch-stall bisection probe
        t0 = time.perf_counter()
        ray.get([a.profile.remote() for a in acts])
        prof["ping2"] = time.perf_counter() - t0

    g = Graph(num_edges=0, parquet_dir=work_dir,
              num_partitions=num_partitions, dedup=dedup,
              edata_cols=tuple(edata_cols), vid_order=vid_order)
    # vertex negotiation from the loaded shards themselves (no second pass
    # over the input): per-partition sorted-unique union → master vid table.
    t0 = time.perf_counter()
    # no barrier: negotiation calls queue behind load_raw on each actor's
    # own task queue, so shard reads overlap the first sorts
    load_refs = [a.load_raw.remote(tuple(edata_cols)) for a in acts]
    prof["load_raw_submit"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    # vertex negotiation as a parallel reduce (the all-reduce of
    # distributed_ingress_base.hpp:181-318) — O(nv) merge work runs in
    # tasks, the driver only receives the final arrays. With bucket vid
    # ordering the reduce is sharded by ingress bucket: per-actor partials
    # are emitted per-bucket (num_returns=nb, ~2 non-empty for grid), one
    # merge task per bucket, and the driver concatenation directly yields
    # the (bucket, vid) order — no driver-side lexsort of the vid table.
    # the negotiated table goes to PLASMA, not the driver: merge tasks emit
    # bucket arrays, a concat task builds the dense table in the object
    # store, and the driver keeps the ObjectRef + per-bucket lengths only —
    # driver RSS stays independent of nv (legacy callers that index
    # ``g.vids`` trigger a lazy gather on first access).
    if nb > 1 and acts:
        per = [a.local_vids_bucketed.options(num_returns=nb).remote(nb)
               for a in acts]
        bucket_refs = [_union_concat_task.remote(*[pr[b] for pr in per])
                       for b in range(nb)]
        lens = np.array(ray.get([_arr_len_task.remote(r) for r in bucket_refs]),
                        np.int64)
        g._vids_ref = _concat_task.remote(*bucket_refs)
        g._nv = int(lens.sum())
        g.bucket_bounds = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    elif acts:
        g._vids_ref = _tree_binary_ref(
            _union2_task, [a.local_vids.remote() for a in acts])
        g._nv = int(ray.get(_arr_len_task.remote(g._vids_ref)))
        if vid_order == "bucket":  # nb == 1: single bucket, already sorted
            g.bucket_bounds = np.array([0, g.nv], np.int64)
    else:
        g.vids = np.empty(0, np.uint64)
        if vid_order == "bucket":
            g.bucket_bounds = np.array([0, 0], np.int64)
    ray.get(load_refs)  # surfaces read errors; negotiation is already queued
    prof["negotiate"] = time.perf_counter() - t0
    # durable vid table: lets a Ray-restarted partition actor rebuild
    # (`_ensure`) even on this primary build path. Written by a task from
    # the plasma ref; awaited at the end of the build.
    t0 = time.perf_counter()
    wv_ref = _write_vids_task.remote(vids_path, g.vids_ref())
    fin_refs = [a.finalize.remote(g.vids_ref(), dedup, presorted, nb,
                                  g.bucket_bounds)
                for a in acts]
    if nb > 1 and acts:
        # degree merge sharded the same way: one sum task per bucket over
        # the ~2√P partitions that touch it; the per-bucket (out, in)
        # slices are concatenated by tasks into two plasma arrays — the
        # driver holds refs. Submitted before ray.get(fin_refs): each
        # actor's degree call queues behind its own finalize, so the two
        # phases pipeline.
        dp = [a.degree_partials_bucketed.options(num_returns=nb).remote()
              for a in acts]
        bb = g.bucket_bounds
        deg_refs = [_degsum_bucket_task.remote(
            int(bb[b + 1] - bb[b]), *[d[b] for d in dp]) for b in range(nb)]
        fin = ray.get(fin_refs)
        prof["finalize"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        g._out_deg_ref = _concat_pick_task.remote(0, *deg_refs)
        g._in_deg_ref = _concat_pick_task.remote(1, *deg_refs)
    elif acts:
        dref = [a.degree_partials.remote() for a in acts]
        fin = ray.get(fin_refs)
        prof["finalize"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        dfinal = _tree_binary_ref(_degsum2_task, dref)
        g._out_deg_ref = _pick_task.remote(0, dfinal)
        g._in_deg_ref = _pick_task.remote(1, dfinal)
    else:
        fin = []
        g.out_deg = np.zeros(g.nv, np.int64)
        g.in_deg = np.zeros(g.nv, np.int64)
    if acts:
        # barrier + error surfacing for the async degree/vid-table tasks
        # (lengths only — no O(nv) fetch to the driver)
        ray.get([_arr_len_task.remote(g._out_deg_ref),
                 _arr_len_task.remote(g._in_deg_ref), wv_ref])
    else:
        ray.get(wv_ref)
    prof["degrees"] = time.perf_counter() - t0
    g.build_profile = {k: round(v, 3) for k, v in prof.items()}
    g.replication_factor = sum(f[0] for f in fin) / max(1, g.nv)
    g.num_edges = sum(f[1] for f in fin)
    g._pool = acts
    return g


def build_graph_streaming(edges_ds, num_partitions: int, dedup: bool = False,
                          ingress: str = "random", push_batch: int = 1 << 17) -> Graph:
    """In-memory streaming ingress: the reference's buffered-exchange shuffle
    (distributed_ingress_base.hpp:130-140) re-expressed as object-store
    pushes — ingest ``map_batches`` tasks split each batch by partition and
    push slices straight into the partition actors; no disk round-trip.

    Trade-off vs :func:`build_graph` (the default): faster ingress, but the
    edge shards are not durable until :func:`save_graph` is called (which
    dumps them from the actors); prefer the Parquet path when the partitioned
    edge table should double as a resumable artifact.
    """
    part_fn = {"random": edge_partition, "grid": edge_partition_grid,
               "pds": edge_partition_pds}[ingress]
    if ingress == "pds":
        from ..ids import _pds_joint_table

        _pds_joint_table(num_partitions)  # validate P eagerly on the driver
    acts = [EdgePartitionActor.remote(p, "") for p in range(num_partitions)]

    def push(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"], dtype=np.uint64)
        dst = np.asarray(t["dst"], dtype=np.uint64)
        part = part_fn(src, dst, num_partitions)
        order = np.argsort(part, kind="stable")
        ps, ss, ds_ = part[order], src[order], dst[order]
        cuts = np.searchsorted(ps, np.arange(num_partitions + 1))
        refs = [acts[p].add_edges.remote(ss[cuts[p]:cuts[p + 1]],
                                         ds_[cuts[p]:cuts[p + 1]])
                for p in range(num_partitions) if cuts[p + 1] > cuts[p]]
        ray.get(refs)  # delivered before this ingest task completes
        return pa.table({"n": pa.array([len(src)], pa.int64())})

    edges_ds.map_batches(push, batch_format="pyarrow",
                         batch_size=push_batch).count()
    ray.get([a.flush_buffers.remote() for a in acts])

    g = Graph(num_edges=0, parquet_dir="",
              num_partitions=num_partitions, dedup=dedup)
    if acts:
        # same plasma-resident negotiation as the primary path: the driver
        # holds refs + the count only
        g._vids_ref = _tree_binary_ref(
            _union2_task, [a.local_vids.remote() for a in acts])
        g._nv = int(ray.get(_arr_len_task.remote(g._vids_ref)))
    else:
        g.vids = np.empty(0, np.uint64)
    fin = ray.get([a.finalize.remote(g.vids_ref(), dedup) for a in acts])
    if acts:
        dfinal = _tree_binary_ref(
            _degsum2_task, [a.degree_partials.remote() for a in acts])
        g._out_deg_ref = _pick_task.remote(0, dfinal)
        g._in_deg_ref = _pick_task.remote(1, dfinal)
        ray.get(_arr_len_task.remote(g._out_deg_ref))  # barrier + errors
    else:
        g.out_deg = np.zeros(g.nv, np.int64)
        g.in_deg = np.zeros(g.nv, np.int64)
    g.replication_factor = sum(f[0] for f in fin) / max(1, g.nv)
    g.num_edges = sum(f[1] for f in fin)
    g._pool = acts
    return g


def build_graph_from_arrays(src: np.ndarray, dst: np.ndarray, num_partitions: int,
                            work_dir: str | None = None,
                            edata: dict[str, np.ndarray] | None = None, **kwargs) -> Graph:
    """Convenience for tests/bench: numpy edge arrays (+ optional edge
    payload columns) → Graph via the same hash-partitioned Parquet ingress."""
    import ray.data

    cols = {"src": pa.array(np.asarray(src, np.uint64), pa.uint64()),
            "dst": pa.array(np.asarray(dst, np.uint64), pa.uint64())}
    for c, v in (edata or {}).items():
        cols[c] = pa.array(v)
    if edata:
        kwargs.setdefault("edata_cols", tuple(edata))
    t = pa.table(cols)
    return build_graph(ray.data.from_arrow(t), num_partitions, work_dir, **kwargs)


def range_bounds(graph: Graph, reduce_shards: int | None = None) -> np.ndarray:
    """Dense-index reduce-range offsets (len R+1) for a graph — the shard
    layout shared by the GAS engine and every other sharded-state consumer
    (spectral mat-vecs, chunked warm starts). With a bucket-ordered graph
    the ranges are aligned to the ingress buckets (each bucket split into
    ~R/nb equal pieces) so a range never straddles two buckets; R is capped
    by vertex count (~1 range per 100k vertices) because every range costs
    a reducer task + state/stat objects per round."""
    env_r = os.environ.get("GRAFT_REDUCE_SHARDS")
    if reduce_shards is None and env_r:
        reduce_shards = int(env_r)
    target = reduce_shards or max(1, min(graph.num_partitions, 16,
                                         -(-graph.nv // 100_000)))
    if graph.bucket_bounds is not None and graph.nv:
        bb = np.asarray(graph.bucket_bounds, np.int64)
        nb = len(bb) - 1
        k = max(1, int(round(target / nb)))
        pieces = [np.linspace(bb[i], bb[i + 1], k + 1).astype(np.int64)[:-1]
                  for i in range(nb)]
        return np.concatenate(pieces + [np.array([graph.nv], np.int64)])
    return np.linspace(0, graph.nv, target + 1).astype(np.int64)


class GASEngine:
    """The superstep driver loop (role of synchronous_engine::start,
    synchronous_engine.hpp:1271-1452)."""

    def __init__(
        self,
        graph: Graph,
        vp: VertexProgram,
        checkpoint_path: str | None = None,
        checkpoint_interval: int = 1,
        max_iterations: int | None = None,
        resume: bool = False,
        lineage_extra: dict | None = None,
        init_bundle: dict | None = None,
        reduce_shards: int | None = None,
        aggregators: dict[str, VertexAggregator] | None = None,
        pipeline_width: int | None = None,
    ) -> None:
        tune_malloc()  # driver allocates O(nv) bundle chunks per superstep
        self.graph = graph
        self.vp = vp
        self.checkpoint_path = checkpoint_path
        self.checkpoint_interval = checkpoint_interval
        self.max_iterations = max_iterations if max_iterations is not None else vp.max_iterations()
        self.resume = resume
        #: pipelined-superstep window override: 1 = strict lockstep (big
        #: 2-D bundles — fewer state versions pinned in plasma); None =
        #: engine default (4, or 1 under checkpoints/aggregators)
        self.pipeline_width = pipeline_width
        self.lineage_extra = lineage_extra or {}
        self.init_bundle_override = init_bundle
        #: optional initial state as R ObjectRefs of range bundle chunks
        #: aligned with ``self.bounds`` (set AFTER construction, when the
        #: caller has built chunks against these bounds — e.g. warm starts
        #: via ``load_vertex_value_chunks``); takes precedence over
        #: ``init_bundle``/``init_chunk`` and never touches the driver heap
        self.init_chunks: list | None = None
        self.metrics: list[dict] = []
        self.aggregators = aggregators or {}
        #: per-aggregator history of (iteration, finalized value)
        self.aggregates: dict[str, list] = {k: [] for k in self.aggregators}
        #: wall-clock last-fire times for every_secs aggregators
        self._agg_last_fire: dict[str, float] = {}
        #: optional custom termination: fn(prev_l1_delta, cur_l1_delta) → stop?
        self.stop_fn = None
        # R range chunks; reducers are co-hosted on the partition actors
        # (see range_bounds for the layout rules).
        self.bounds = range_bounds(graph, reduce_shards)
        self.nshards = len(self.bounds) - 1

    # -- checkpointing ----------------------------------------------------
    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.checkpoint_path, f"iter={it:05d}")

    def _write_checkpoint(self, it: int, chunk_refs: list, n_active: int, delta: float, secs: float) -> None:
        d = self._iter_dir(it)
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        b = self.bounds
        ray.get([
            _write_shard.remote(
                os.path.join(tmp, f"state-{s:05d}.parquet"),
                self.graph.vids_ref(), int(b[s]), int(b[s + 1]), chunk_refs[s])
            for s in range(self.nshards)
        ])
        metrics = {
            "iteration": it,
            "n_active": int(n_active),
            "l1_delta": float(delta),
            "edges_processed": int(self.graph.num_edges),
            "superstep_seconds": secs,
            "edges_per_second": self.graph.num_edges / secs if secs > 0 else None,
        }
        with open(os.path.join(tmp, "metrics.json"), "w") as f:
            json.dump(metrics, f)
        lineage = {
            "algorithm": self.vp.name,
            "num_partitions": self.graph.num_partitions,
            "num_vertices": int(self.graph.nv),
            "num_edges": int(self.graph.num_edges),
            "edge_parquet_dir": self.graph.parquet_dir,
            "replication_factor": self.graph.replication_factor,
            **self.lineage_extra,
        }
        with open(os.path.join(tmp, "lineage.json"), "w") as f:
            json.dump(lineage, f)
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        with open(os.path.join(d, "_COMPLETE"), "w") as f:
            f.write("ok\n")

    def _latest_checkpoint(self) -> int | None:
        if not self.checkpoint_path or not os.path.isdir(self.checkpoint_path):
            return None
        its = []
        for name in os.listdir(self.checkpoint_path):
            if name.startswith("iter=") and os.path.exists(os.path.join(self.checkpoint_path, name, "_COMPLETE")):
                its.append(int(name.split("=")[1]))
        return max(its) if its else None

    def _load_checkpoint(self, it: int) -> dict[str, np.ndarray]:
        import glob

        files = sorted(glob.glob(os.path.join(self._iter_dir(it), "state-*.parquet")))
        t = pa.concat_tables([pq.read_table(f) for f in files])
        # scatter rows back to their dense positions (robust to shard file
        # order AND to bucket-ordered dense vid spaces, where dense order is
        # not sorted-vid order)
        pos = self.graph.dense(np.asarray(t["vid"], np.uint64))
        bundle = {}
        for name in t.column_names:
            if name == "vid":
                continue
            col = np.asarray(t[name])
            arr = np.empty(len(pos), col.dtype)
            arr[pos] = col
            bundle[name] = arr
        return bundle

    def _load_checkpoint_chunks(self, it: int) -> list | None:
        """Resume without the driver ever holding O(nv): one task per state
        shard rebuilds its range chunk (shards are written per range by
        ``_write_checkpoint``, so no scatter is needed). Returns None —
        caller falls back to the legacy dense load — when the shard layout
        doesn't match this engine's bounds (e.g. resumed with a different
        ``reduce_shards``); validation reads Parquet footers only."""
        import glob

        files = sorted(glob.glob(os.path.join(self._iter_dir(it), "state-*.parquet")))
        if len(files) != self.nshards:
            return None
        b = self.bounds
        for s, f in enumerate(files):
            if pq.read_metadata(f).num_rows != int(b[s + 1] - b[s]):
                return None
        return [_read_chunk_task.remote(f, int(b[s + 1] - b[s]))
                for s, f in enumerate(files)]

    # -- bundle <-> chunks ------------------------------------------------
    def _put_chunks(self, bundle: dict[str, np.ndarray]) -> list:
        b = self.bounds
        return [ray.put({k: v[b[r]:b[r + 1]] for k, v in bundle.items()})
                for r in range(self.nshards)]

    def _gather_chunks(self, chunk_refs: list) -> dict[str, np.ndarray]:
        chunks = ray.get(chunk_refs)
        return {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}

    # -- main loop --------------------------------------------------------
    def profile(self) -> dict:
        """Aggregate per-phase superstep seconds across the partition actors
        (fetch / assemble / kernel / reduce / apply, summed over actors and
        supersteps since actor construction) — where the wall time goes."""
        profs = ray.get([a.profile.remote() for a in self.graph.pool()])
        agg = {k: round(sum(p[k] for p in profs), 3) for k in profs[0]}
        agg["n_actors"] = len(profs)
        return agg

    def _init_chunk_refs(self) -> list:
        """Initial state as R chunk refs built in tasks from the plasma
        vid/degree tables — no O(nv) bundle ever touches the driver."""
        g, b = self.graph, self.bounds
        return [_init_chunk_task.remote(self.vp, int(b[r]), int(b[r + 1]),
                                        g.nv, g.vids_ref(), g.out_deg_ref(),
                                        g.in_deg_ref())
                for r in range(self.nshards)]

    def run(self, result: str = "bundle"):
        """``result="bundle"`` (default): gather the final state to the
        driver as dense arrays — the legacy API. ``result="chunks"``: return
        the R final chunk ObjectRefs (driver O(R), nv-independent); turn
        them into a Dataset with :func:`chunks_to_dataset`."""
        if result not in ("bundle", "chunks"):
            raise ValueError(f"unknown result mode {result!r}")
        g = self.graph
        self.vp.prepare(g)
        start_it = 0
        bundle = None
        chunk_refs = None
        if self.resume:
            latest = self._latest_checkpoint()
            if latest is not None:
                if self.vp.shardable:
                    chunk_refs = self._load_checkpoint_chunks(latest)
                if chunk_refs is None:
                    bundle = self._load_checkpoint(latest)
                start_it = latest + 1
        if bundle is None and chunk_refs is None:
            if self.init_chunks is not None:
                if len(self.init_chunks) != self.nshards:
                    raise ValueError(
                        f"init_chunks has {len(self.init_chunks)} refs, "
                        f"engine has {self.nshards} ranges — build the "
                        "chunks against this engine's .bounds")
                chunk_refs = list(self.init_chunks)
            elif self.init_bundle_override is not None:
                bundle = self.init_bundle_override
            elif self.vp.supports_chunk_init and self.vp.shardable:
                chunk_refs = self._init_chunk_refs()
            else:
                bundle = self.vp.init_bundle(g)
            if not self.resume and self.checkpoint_path:
                shutil.rmtree(self.checkpoint_path, ignore_errors=True)
        actors = g.pool()
        if self.vp.shardable:
            if chunk_refs is None:
                chunk_refs = self._put_chunks(bundle)
            final = self._run_sharded(actors, chunk_refs, start_it)
            if result == "chunks":
                return final
            return self._gather_chunks(final)
        if bundle is None:
            bundle = (self._gather_chunks(chunk_refs) if chunk_refs is not None
                      else self.vp.init_bundle(g))
        bundle = self._run_driver_merge(actors, bundle, start_it)
        if result == "chunks":
            return self._put_chunks(bundle)
        return bundle

    def _run_sharded(self, actors: list, chunk_refs: list, start_it: int) -> list:
        """Scale path: range-sharded reduce-scatter; the driver touches only
        per-chunk stats and refs, never an O(nv) array. Returns the final
        chunk refs (``run`` gathers them only in legacy bundle mode)."""
        g, vp, R, b = self.graph, self.vp, self.nshards, self.bounds
        # static reducer wiring: feeders[r] = partitions whose edges touch
        # range r (every non-empty range has ≥1 — its vertices come from some
        # partition's edges; empty ranges are marked touched by every
        # partition, see _touched_mask). Fetched once, reused every superstep.
        masks = ray.get([a.touched_ranges.remote(b) for a in actors])
        feeders = [[p for p in range(len(actors)) if masks[p][r]]
                   for r in range(R)]
        # per-partition touched ranges; the partial task receives exactly
        # these chunks as DIRECT args (scheduler-visible dependencies — see
        # superstep_sharded's docstring). An edgeless partition is sent
        # range 0 as a dtype/shape probe (its tidx stays empty).
        tranges = [np.flatnonzero(m) for m in masks]
        tsend = [t if len(t) else np.zeros(min(1, R), np.int64) for t in tranges]
        # Pipelined submission: the per-superstep wall has a fixed driver
        # floor (serially dispatching P partial + R reduce task specs and a
        # stats round-trip, ~tens of ms) that does not shrink with CPUs and
        # caps weak scaling on fast kernels. Superstep it+1's inputs are the
        # ObjectRef futures of it's reduce outputs, so up to W supersteps are
        # submitted ahead and stats are drained lagged — dispatch overlaps
        # execution and wall/superstep = max(dispatch, compute), not the sum.
        # W=1 (the old strict loop) when per-iteration side effects must stay
        # in lockstep (checkpoints, aggregators). On early termination the
        # stopping iteration's chunk refs are returned; the ≤W-1 supersteps
        # submitted past it are discarded (idempotent: they only produce
        # objects we drop).
        W = 1 if (self.checkpoint_path or self.aggregators) \
            else (self.pipeline_width or 4)
        from collections import deque

        pending: deque = deque()  # (iteration, stat_refs, chunk_refs, part_refs)
        final_chunks = chunk_refs
        stop_at: int | None = None
        last_t = time.perf_counter()
        debug_wedge = os.environ.get("GRAFT_DEBUG_WEDGE")

        def drain_one() -> None:
            nonlocal stop_at, final_chunks, last_t
            jit, srefs, crefs, prefs = pending.popleft()
            if debug_wedge:
                _done, _nd = ray.wait(list(srefs), num_returns=len(srefs),
                                      timeout=float(debug_wedge))
                if _nd:
                    stuck = [i for i, s in enumerate(srefs) if s in set(_nd)]
                    print(f"[wedge] it={jit} stat ranges stuck={stuck}", flush=True)
                    _, pnd = ray.wait(list(prefs), num_returns=len(prefs), timeout=1)
                    print(f"[wedge] partials stuck="
                          f"{[i for i, p in enumerate(prefs) if p in set(pnd)]}", flush=True)
                    for ai, a in enumerate(actors):
                        d, _ = ray.wait([a.profile.remote()], timeout=3)
                        print(f"[wedge] actor {ai} {'ok' if d else 'WEDGED'}", flush=True)
                    raise RuntimeError("superstep pipeline wedged")
            stats = ray.get(srefs)
            now = time.perf_counter()
            secs = now - last_t
            last_t = now
            n_active = sum(s[0] for s in stats)
            delta = float(sum(s[1] for s in stats))
            self.metrics.append({"iteration": jit, "n_active": int(n_active),
                                 "l1_delta": delta, "seconds": secs,
                                 "edges_per_second": g.num_edges / secs if secs > 0 else None})
            self._tick_aggregators(jit, crefs)
            if self.checkpoint_path and (jit % self.checkpoint_interval == 0):
                self._write_checkpoint(jit, crefs, n_active, delta, secs)
            if n_active == 0 or self._custom_stop():
                stop_at = jit
                final_chunks = crefs

        for it in range(start_it, self.max_iterations):
            part_refs = [a.superstep_sharded.remote(
                vp, it, b, tranges[p], *[chunk_refs[int(r)] for r in tsend[p]])
                for p, a in enumerate(actors)]
            new_refs, stat_refs = [], []
            for r in range(R):
                nc, st = actors[r % len(actors)].reduce_apply_chunk.options(
                    num_returns=2).remote(
                    vp, it, r, int(b[r]), int(b[r + 1]), g.nv,
                    chunk_refs[r], *[part_refs[p] for p in feeders[r]])
                new_refs.append(nc)
                stat_refs.append(st)
            chunk_refs = new_refs
            # part_refs (P partial dicts, O(nv/√P) bytes each) are only read
            # back under GRAFT_DEBUG_WEDGE — don't pin them in plasma for up
            # to W in-flight supersteps otherwise (capped object stores spill)
            pending.append((it, stat_refs, new_refs,
                            part_refs if debug_wedge else None))
            while len(pending) >= W and stop_at is None:
                drain_one()
            if stop_at is not None:
                break
        while pending and stop_at is None:
            drain_one()
        return final_chunks if stop_at is not None else chunk_refs

    def _agg_due(self, name: str, agg, it: int) -> bool:
        """Iteration-count trigger, or wall-clock trigger when ``every_secs``
        is set (aggregate_periodic seconds semantics: fire when the period
        elapsed since the last fire; always fires on the first check)."""
        if agg.every_secs is None:
            return it % agg.every == 0
        now = time.monotonic()
        last = self._agg_last_fire.get(name)
        if last is not None and now - last < agg.every_secs:
            return False
        self._agg_last_fire[name] = now
        return True

    def _tick_aggregators(self, it: int, chunk_refs: list) -> None:
        """aggregate_periodic probe (distributed_aggregator.hpp:518-612,
        synchronous_engine.hpp tick_synchronous): chunk partials in tasks,
        fixed-order reduce, finalize on the driver."""
        b = self.bounds
        for name, agg in self.aggregators.items():
            if not self._agg_due(name, agg, it):
                continue
            if isinstance(agg, EdgeAggregator):
                vals = ray.get([a.run_edge_agg.remote(agg.map_part)
                                for a in self.graph.pool()])
            else:
                vals = ray.get([
                    _agg_chunk_task.remote(agg, chunk_refs[r], int(b[r]), int(b[r + 1]))
                    for r in range(self.nshards)
                ])
            total = vals[0]
            for v in vals[1:]:
                total = agg.reduce(total, v)
            self.aggregates[name].append((it, agg.finalize(total, it)))

    def _custom_stop(self) -> bool:
        return (self.stop_fn is not None and len(self.metrics) >= 2
                and self.stop_fn(self.metrics[-2]["l1_delta"], self.metrics[-1]["l1_delta"]))

    def run_until(self, stop_fn) -> dict:
        """Run with a custom termination predicate over consecutive global
        aggregate values (the role of aggregate-driven ``context.stop()``,
        icontext.hpp:100-193)."""
        self.stop_fn = stop_fn
        return self.run()

    def _run_driver_merge(self, actors: list, bundle: dict, start_it: int) -> dict:
        """Fallback for custom programs without chunk hooks: tree-reduce to
        the driver, apply driver-side (fine for small graphs)."""
        g, vp = self.graph, self.vp
        for it in range(start_it, self.max_iterations):
            t0 = time.perf_counter()
            refs = [ray.put(bundle[k]) for k in vp.broadcast_keys]
            partials = [a.superstep.remote(vp, it, *refs) for a in actors]
            total = _tree_reduce(vp, partials)
            bundle, n_active, delta = vp.apply(bundle, total, it)
            secs = time.perf_counter() - t0
            self.metrics.append({"iteration": it, "n_active": int(n_active),
                                 "l1_delta": float(delta), "seconds": secs,
                                 "edges_per_second": g.num_edges / secs if secs > 0 else None})
            for name, agg in self.aggregators.items():
                if self._agg_due(name, agg, it):
                    if isinstance(agg, EdgeAggregator):
                        vals = ray.get([a.run_edge_agg.remote(agg.map_part)
                                        for a in actors])
                        v = vals[0]
                        for x in vals[1:]:
                            v = agg.reduce(v, x)
                    else:
                        v = agg.map_chunk(bundle, 0, len(next(iter(bundle.values()))))
                    self.aggregates[name].append((it, agg.finalize(v, it)))
            if self.checkpoint_path and (it % self.checkpoint_interval == 0):
                self._write_checkpoint(it, self._put_chunks(bundle), n_active, delta, secs)
            if n_active == 0 or self._custom_stop():
                break
        return bundle


def omni_engine(graph: Graph, vp: VertexProgram,
                engine_type: str = "synchronous", **kwargs) -> GASEngine:
    """Runtime engine selection (omni_engine.hpp:41-80, the ``--engine``
    flag): "synchronous"/"sync" builds the BSP engine. "asynchronous"/
    "async" also executes as BSP with a warning — the async scheduler is
    documented out (SURVEY.md §2.4): every toolkit program here has a
    schedule-independent fixed point (commutative-monoid gathers + monotone
    applies), so BSP reaches identical results."""
    et = engine_type.lower()
    if et in ("asynchronous", "async"):
        import warnings

        warnings.warn("async engine executes as BSP supersteps here: "
                      "schedule-independent fixed points (SURVEY.md §2.4)",
                      stacklevel=2)
    elif et not in ("synchronous", "sync"):
        raise ValueError(f"unknown engine type {engine_type!r} "
                         "(synchronous/sync/asynchronous/async)")
    return GASEngine(graph, vp, **kwargs)


# ---------------------------------------------------------------------------
# graph snapshots (role of save_binary/load_binary,
# distributed_graph.hpp:1700-1830 — but machine-count independent: the
# snapshot is P hash-partitioned Parquet shards + a JSON manifest, reloadable
# under any actor-pool size)
# ---------------------------------------------------------------------------

@ray.remote(num_returns=2)
def _sorted_view_task(vids):
    """(sorted vid table, perm sorted-pos → dense idx) built in a task —
    the global→dense map for bucket-ordered graphs without an O(nv log nv)
    argsort (or any O(nv) array) on the driver."""
    perm = np.argsort(vids, kind="stable")
    return vids[perm], perm


@ray.remote
def _split_values_block_task(block: pa.Table, svids, perm, bounds):
    """One aggregated (vid, value) Arrow block → per-reduce-range pieces.
    Returns R ``(local_pos, values)`` tuples (None where the block touches
    no row of that range) followed by this block's unmatched-vid count —
    ``num_returns=R+1``. ``svids``/``perm`` are the plasma sorted-vid view
    (perm None when dense order is already sorted)."""
    b = np.asarray(bounds, np.int64)
    R = len(b) - 1
    if len(block) == 0 or "vid" not in block.schema.names:
        # empty shuffle blocks can surface with an empty schema
        return (*[None] * R, 0)
    g = np.asarray(block["vid"], np.int64).view(np.uint64)
    vals = np.asarray(block["value"])
    if len(svids):
        pos = np.searchsorted(svids, g)
        safe = np.minimum(pos, len(svids) - 1)
        hit = (pos < len(svids)) & (svids[safe] == g)
        dense = safe if perm is None else perm[safe]
    else:
        hit = np.zeros(len(g), bool)
        dense = np.zeros(len(g), np.int64)
    unmatched = int((~hit).sum())
    dense, vals = dense[hit], vals[hit]
    r = np.searchsorted(b, dense, side="right") - 1
    order = np.argsort(r, kind="stable")
    rs, ds_, vs = r[order], dense[order], vals[order]
    cuts = np.searchsorted(rs, np.arange(R + 1))
    out = [((ds_[cuts[k]:cuts[k + 1]] - b[k], vs[cuts[k]:cuts[k + 1]])
            if cuts[k + 1] > cuts[k] else None) for k in range(R)]
    return (*out, unmatched)


@ray.remote
def _assemble_values_task(lo: int, hi: int, default, dtype_str: str, *pieces):
    """Merge one range's pieces into its dense value chunk. The aggregated
    table has one row per distinct vid (bucketed_agg), so positions never
    collide across pieces; missing vertices get ``default`` (required —
    raises when None and any position is unfilled)."""
    n = hi - lo
    dt = np.dtype(dtype_str)
    if default is not None:
        arr = np.full(n, default, dt)
        filled = None
    else:
        arr = np.empty(n, dt)
        filled = np.zeros(n, bool)
    for p in pieces:
        if p is None:
            continue
        pos, vals = p
        arr[pos] = vals
        if filled is not None:
            filled[pos] = True
    if filled is not None and not filled.all():
        raise ValueError(
            f"{int(n - filled.sum())} vertices in dense range [{lo},{hi}) "
            "missing from vertex-data table and no default given")
    return arr


def load_vertex_value_chunks(g: Graph, vdata_ds, value_col: str,
                             bounds: np.ndarray, combine: str = "min",
                             default=None) -> list:
    """Scale-path vertex-data ingestion: a ``(vid, <value_col>)`` Dataset →
    R ObjectRefs, chunk r the dense value slice for range
    ``[bounds[r], bounds[r+1])`` — duplicate vids resolved by ``combine``
    exactly as :func:`load_vertex_values`, but the table only ever exists
    as plasma range chunks: the driver touches O(R) refs and one small
    unmatched count, never an O(nv) array. Feed the refs to per-range
    bundle-builder tasks + ``GASEngine.init_chunks`` (the warm-start path
    of run_pagerank / run_connected_components) so daily-refresh driver
    RSS stays independent of nv end-to-end.

    Flow: the same bucketed_agg duplicate-resolution shuffle as the dense
    loader → each aggregated Arrow block is split into its touched ranges
    by a task (global→dense via the plasma sorted-vid view,
    ``num_returns=R+1``) → one assembly task per range scatters the
    pieces. Unknown vids raise (finalized graph, same contract as the
    dense loader); so does a missing vertex when ``default`` is None."""
    from ..stages.agg import bucketed_agg

    if combine not in ("min", "max", "sum"):
        raise ValueError(f"unknown combine {combine!r} (use min/max/sum)")
    b = np.asarray(bounds, np.int64)
    R = len(b) - 1

    def vid_i64(t: pa.Table) -> pa.Table:
        # bit-cast uint64 vids around the shuffle (cast back after)
        cols = {c: (pa.array(np.asarray(t[c], np.uint64).view(np.int64))
                    if c == "vid" else t[c]) for c in t.column_names}
        return pa.table(cols)

    agg = bucketed_agg(vdata_ds.map_batches(vid_i64, batch_format="pyarrow"),
                       ["vid"], {"value": (value_col, combine)})
    sch = agg.schema().base_schema
    if hasattr(sch, "field"):  # pyarrow schema
        dt = np.dtype(sch.field("value").type.to_pandas_dtype())
    else:  # PandasBlockSchema: parallel names/types lists
        dt = np.dtype(dict(zip(sch.names, sch.types))["value"])
    dtype_str = dt.name
    svids_ref, perm_ref = g.sorted_view_refs()
    block_refs = agg.to_arrow_refs()
    per_block = [_split_values_block_task.options(num_returns=R + 1)
                 .remote(br, svids_ref, perm_ref, b) for br in block_refs]
    unmatched = sum(ray.get([pb[R] for pb in per_block])) if per_block else 0
    if unmatched:
        # the reference's loader would ADD unknown vids to the graph
        # (distributed_graph.hpp vertex-data load); our graph is finalized, so
        # a mismatched/typo'd vertex file must fail loudly, not silently drop
        raise ValueError(
            f"{unmatched} vertex-data rows reference vids not in the graph "
            "(vertex table is finalized; check the vid column / id space)")
    return [_assemble_values_task.remote(
        int(b[r]), int(b[r + 1]), default, dtype_str,
        *[pb[r] for pb in per_block]) for r in range(R)]


def load_vertex_values(g: Graph, vdata_ds, value_col: str,
                       combine: str = "min", default=None) -> np.ndarray:
    """Load per-vertex payloads from a ``(vid, <value_col>)`` Dataset into an
    array aligned with ``g.vids`` — the reference's vertex-data ingestion
    with ``set_duplicate_vertex_strategy`` (distributed_ingress_base.hpp:
    155-159): rows sharing a vid are resolved by ``combine`` ∈
    {'min', 'max', 'sum'} — the commutative choices that stay deterministic
    under distributed row order (dataset "first" is not; the reference's
    arbitrary-last-writer default is likewise order-dependent and is NOT
    reproduced). Vertices absent from the table get ``default`` (required
    if any are missing).

    This is the LEGACY dense API (the return value itself is O(nv) on the
    driver); the resolution + alignment all run distributed via
    :func:`load_vertex_value_chunks`, which engine warm starts use
    directly without ever gathering."""
    target = max(1, min(64, -(-g.nv // 100_000)))
    bounds = np.linspace(0, g.nv, target + 1).astype(np.int64)
    refs = load_vertex_value_chunks(g, vdata_ds, value_col, bounds,
                                    combine=combine, default=default)
    return np.concatenate(ray.get(refs)) if refs else np.empty(0)


def save_graph(g: Graph, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    edir = os.path.join(path, "edges")
    if not g.parquet_dir:
        # stream-built graph: dump shards from the live actor pool
        shutil.rmtree(edir, ignore_errors=True)
        os.makedirs(edir, exist_ok=True)
        ray.get([a.dump_shard.remote(edir) for a in g.pool()])
        g.parquet_dir = edir
    elif os.path.abspath(edir) != os.path.abspath(g.parquet_dir):
        shutil.rmtree(edir, ignore_errors=True)
        shutil.copytree(g.parquet_dir, edir)
    # vertex table written by a task from the plasma refs — no driver gather
    ray.get(_write_vertex_table_task.remote(
        os.path.join(path, "vertices.parquet"),
        g.vids_ref(), g.out_deg_ref(), g.in_deg_ref()))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"num_partitions": g.num_partitions, "num_edges": g.num_edges,
                   "dedup": g.dedup, "replication_factor": g.replication_factor,
                   "edata_cols": list(g.edata_cols),
                   "vid_order": g.vid_order,
                   "bucket_bounds": (None if g.bucket_bounds is None
                                     else [int(x) for x in g.bucket_bounds])},
                  f)
    with open(os.path.join(path, "_COMPLETE"), "w") as f:
        f.write("ok\n")


def load_graph(path: str) -> Graph:
    if not os.path.exists(os.path.join(path, "_COMPLETE")):
        raise FileNotFoundError(f"no complete graph snapshot at {path}")
    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    vt_path = os.path.join(path, "vertices.parquet")
    nv = int(pq.read_metadata(vt_path).num_rows)  # count from footer only
    v_ref, o_ref, i_ref = _read_vertex_table_task.options(
        num_returns=3).remote(vt_path)
    bb = m.get("bucket_bounds")
    return Graph(vids_ref=v_ref, nv_count=nv,
                 num_edges=int(m["num_edges"]),
                 parquet_dir=os.path.join(path, "edges"),
                 num_partitions=int(m["num_partitions"]),
                 out_deg_ref=o_ref,
                 in_deg_ref=i_ref,
                 replication_factor=float(m["replication_factor"]),
                 dedup=bool(m["dedup"]),
                 edata_cols=tuple(m.get("edata_cols", ())),
                 vid_order=m.get("vid_order", "sorted"),
                 bucket_bounds=None if bb is None else np.asarray(bb, np.int64))
