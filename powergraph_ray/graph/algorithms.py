"""The toolkit vertex programs (graph_analytics re-expressed).

Each class implements the :class:`~powergraph_ray.graph.gas.VertexProgram`
protocol with numpy-vectorized kernels; semantics cite the reference file
they reproduce. Partition kernels return *pre-reduced* dense partials
(``np.bincount`` / ``np.minimum.at`` in the partition's fixed CSR edge
order); all programs are *shardable*: partials split into vertex-range
chunks merged+applied by parallel range reducers (gas.py sharded path).
"""

from __future__ import annotations

import numpy as np
import ray

from .gas import (GASEngine, Graph, VertexProgram, chunks_to_dataset,
                  load_vertex_value_chunks, load_vertex_values, split_dense)

RESET_PROB = 0.15  # pagerank.cpp:31


def segment_aux(src: np.ndarray, dst: np.ndarray):
    """Per-partition segment structure for ``ufunc.reduceat`` message
    reduction (built once per actor): the edge block is stored sorted by dst
    (gas.py finalize), so dst segments are direct; src needs a cached sort
    order. → (dst_uniq, dst_starts, src_order, src_uniq, src_starts)."""
    if len(dst):
        d_starts = np.concatenate([[0], np.flatnonzero(np.diff(dst)) + 1])
        d_uniq = dst[d_starts]
    else:
        d_starts = np.empty(0, np.int64)
        d_uniq = np.empty(0, dst.dtype)
    s_order = np.argsort(src, kind="stable")
    ss = src[s_order]
    if len(ss):
        s_starts = np.concatenate([[0], np.flatnonzero(np.diff(ss)) + 1])
        s_uniq = ss[s_starts]
    else:
        s_starts = np.empty(0, np.int64)
        s_uniq = np.empty(0, src.dtype)
    return d_uniq, d_starts, s_order, s_uniq, s_starts


class PageRankVP(VertexProgram):
    """PageRank, reference semantics (pagerank.cpp):

    - vertex init 1.0 (pagerank.cpp:52 ``init_vertex``),
    - gather over IN_EDGES of ``src.data()/src.num_out_edges()``
      (pagerank.cpp:85-95), summed,
    - apply ``new = 0.85*total + 0.15`` — the *unnormalized* formulation:
      total mass sums to ~N, dangling mass is NOT redistributed
      (pagerank.cpp:101-103),
    - fixed-iteration mode (``--iterations``): every vertex re-signals itself,
      no scatter (pagerank.cpp:104,109-111) — runs exactly K supersteps;
    - dynamic mode: scatter OUT_EDGES signals targets while ``|Δ|>tol``
      (pagerank.cpp:113-133) — the frontier shrinks as ranks converge.

    The bundle carries ``winv = value / max(out_deg, 1)`` (maintained by the
    range reducers at apply time) so the per-partition gather is a single
    fancy-index + ``bincount`` — no O(nv) work in the edge actors.
    """

    name = "pagerank"
    broadcast_keys = ("winv", "delta")
    shardable = True

    def __init__(self, tol: float = 1e-6, iterations: int = 0, out_deg_ref=None,
                 use_cache: bool = False) -> None:
        self.tol = tol
        self.iterations = iterations
        self.out_deg_ref = out_deg_ref  # ObjectRef to the dense out-degree array
        # gather/delta caching (pagerank.cpp:37,200 use_cache;
        # synchronous_engine.hpp:1568-1596): per-partition actors keep the
        # cached gather accumulator and apply only the *changed* source
        # contributions each superstep — dynamic mode only
        self.use_cache = bool(use_cache and not iterations)
        if not self.use_cache:
            # range-native kernel (no O(nv) transient per actor per
            # superstep); the cached mode keeps the full-nv accumulator path
            self.partial_sharded = self._partial_sharded
        if self.use_cache:
            self.wants_aux = True
            self.broadcast_keys = ("winv", "dwinv", "delta")
            import uuid

            self.run_token = uuid.uuid4().hex  # actor cache invalidation key

    def build_aux(self, src, dst, nv):
        return {"token": self.run_token, "acc": None}

    def partial_aux(self, src, dst, nv, iteration, aux, winv, dwinv, delta):
        if aux.get("token") != self.run_token:
            aux["token"] = self.run_token
            aux["acc"] = None
        if aux["acc"] is None:
            aux["acc"] = np.bincount(dst, weights=winv[src], minlength=nv)
        else:
            m = dwinv[src] != 0.0
            if m.any():
                aux["acc"] = aux["acc"] + np.bincount(dst[m], weights=dwinv[src][m],
                                                      minlength=nv)
        sums = aux["acc"]
        sig_src = np.abs(delta[src]) > self.tol
        signal = np.zeros(nv, bool)
        signal[dst[sig_src]] = True
        return sums, signal

    def prepare(self, graph: Graph) -> None:
        if self.out_deg_ref is None:
            # plasma-backed degree ref — no driver-side gather
            self.out_deg_ref = graph.out_deg_ref()

    supports_chunk_init = True

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        n = hi - lo
        value = np.ones(n, np.float64)
        out = {
            "value": value,
            "winv": value / np.maximum(out_deg[lo:hi], 1),
            "delta": np.full(n, np.inf, np.float64),
        }
        if self.use_cache:
            out["dwinv"] = np.zeros(n, np.float64)
        return out

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        nv = graph.nv
        value = np.ones(nv, np.float64)
        out = {
            "value": value,
            "winv": value / np.maximum(graph.out_deg, 1),
            # delta drives signalling in dynamic mode; inf ⇒ signal_all on
            # the first superstep (engine.signal_all()).
            "delta": np.full(nv, np.inf, np.float64),
        }
        if self.use_cache:
            out["dwinv"] = np.zeros(nv, np.float64)
        return out

    def partial(self, src, dst, nv, iteration, winv, delta):
        sums = np.bincount(dst, weights=winv[src], minlength=nv)
        if self.iterations:
            return sums, None
        # scatter of the PREVIOUS superstep: sources whose last Δ exceeded
        # tol signalled their out-targets — that is THIS superstep's active
        # set (pagerank.cpp:113-133 + synchronous_engine receive_messages).
        sig_src = np.abs(delta[src]) > self.tol
        signal = np.zeros(nv, bool)
        signal[dst[sig_src]] = True
        return sums, signal

    def _partial_sharded(self, src, dst, nv, iteration, bounds, tidx,
                         winv, delta):
        """Range-native gather (see VertexProgram.partial_sharded): per-range
        bincounts over the contiguous (dst-sorted) edge slices. Identical
        accumulation order per output element as the full-nv ``partial`` —
        bincount adds weights in edge order and the edge subsequence per dst
        is unchanged — so results are bit-for-bit equal, without the O(nv)
        transient sums/signal arrays per actor per superstep (the dominant
        cold-start fault volume at P=64)."""
        b = np.asarray(bounds)
        cuts = np.searchsorted(dst, b)
        out = {}
        for r in np.asarray(tidx, np.int64):
            lo, hi = int(b[r]), int(b[r + 1])
            j0, j1 = int(cuts[r]), int(cuts[r + 1])
            d = dst[j0:j1]
            s = src[j0:j1]
            sums = np.bincount(d - lo, weights=winv[s], minlength=hi - lo)
            if self.iterations:
                out[int(r)] = (sums, None)
            else:
                sig_src = np.abs(delta[s]) > self.tol
                signal = np.zeros(hi - lo, bool)
                signal[d[sig_src] - lo] = True
                out[int(r)] = (sums, signal)
        return out

    @staticmethod
    def merge(a, b):
        sa, ga = a
        sb, gb = b
        return sa + sb, (None if ga is None else ga | gb)

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def _inv(self, lo, hi):
        """Per-chunk 1/out-normalizer (out-degree here; out-strength in the
        weighted subclass). Zero-out-edge vertices divide by 1 — their winv
        is never read because they have no outgoing edges."""
        return 1.0 / np.maximum(ray.get(self.out_deg_ref)[lo:hi], 1)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        sums, signal = total
        value = bundle["value"]
        inv = self._inv(lo, hi)
        if self.iterations:
            newval = (1.0 - RESET_PROB) * sums + RESET_PROB
            delta = newval - value
            n_active = (hi - lo) if iteration + 1 < self.iterations else 0
            return ({"value": newval, "winv": newval * inv, "delta": delta},
                    n_active, float(np.abs(delta).sum()))
        active = signal if iteration > 0 else np.ones(hi - lo, bool)
        newval = np.where(active, (1.0 - RESET_PROB) * sums + RESET_PROB, value)
        delta = newval - value
        # termination: nobody will signal next superstep
        n_active = int((np.abs(delta) > self.tol).sum())
        winv_new = newval * inv
        out = {"value": newval, "winv": winv_new, "delta": delta}
        if self.use_cache:
            out["dwinv"] = winv_new - bundle["winv"]
        return out, n_active, float(np.abs(delta).sum())

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


class ConnectedComponentsVP(VertexProgram):
    """Min-id label propagation (connected_component.cpp):

    - label init = vid (connected_component.cpp:51-53),
    - message monoid = min (min_message, :56-75), gather NO_EDGES,
    - apply: adopt received label if smaller (:105-113); first superstep's
      empty-message sentinel forces everyone to scatter (:107-108),
    - scatter ALL_EDGES: signal either endpoint whose label exceeds mine with
      my label (:124-134).

    Dense form: messages[v] = min over edges incident to scatter-active u with
    label[u] < label[v]; converges to min global vid per weakly-connected
    component. Labels here are the global vids themselves.
    """

    name = "connected_components"
    broadcast_keys = ("value", "active")
    shardable = True
    wants_aux = True
    SENTINEL = np.iinfo(np.uint64).max

    supports_chunk_init = True

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        return {"value": vids[lo:hi].copy(),
                "active": np.ones(hi - lo, bool)}

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        nv = graph.nv
        return {
            "value": graph.vids.copy(),          # label = own global vid
            "active": np.ones(nv, bool),         # signal_all
        }

    def build_aux(self, src, dst, nv):
        return segment_aux(src, dst)

    def partial_aux(self, src, dst, nv, iteration, aux, value, active):
        """Min-message reduction via cached segment indices + ``reduceat``
        (the per-partition CSC/CSR reduce of local gather accumulation) —
        masked-out edges contribute the monoid identity (SENTINEL)."""
        d_uniq, d_starts, s_order, s_uniq, s_starts = aux
        msgs = np.full(nv, self.SENTINEL, np.uint64)
        lv_s, lv_d = value[src], value[dst]
        cand = np.where(active[src] & (lv_s < lv_d), lv_s, self.SENTINEL)
        if len(cand):
            np.minimum.at(msgs, d_uniq, np.minimum.reduceat(cand, d_starts))
        cand = np.where(active[dst] & (lv_d < lv_s), lv_d, self.SENTINEL)[s_order]
        if len(cand):
            np.minimum.at(msgs, s_uniq, np.minimum.reduceat(cand, s_starts))
        return msgs

    def partial(self, src, dst, nv, iteration, value, active):
        msgs = np.full(nv, self.SENTINEL, np.uint64)
        lv_s, lv_d = value[src], value[dst]
        m = active[src] & (lv_s < lv_d)
        np.minimum.at(msgs, dst[m], lv_s[m])
        m = active[dst] & (lv_d < lv_s)
        np.minimum.at(msgs, src[m], lv_d[m])
        return msgs

    @staticmethod
    def merge(a, b):
        return np.minimum(a, b)

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        value = bundle["value"]
        improved = total < value
        newval = np.where(improved, total, value)
        return {"value": newval, "active": improved}, int(improved.sum()), float(improved.sum())

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


class CommunityLPAVP(VertexProgram):
    """Community label propagation (apps/label_propagation/label_propagation.cpp):

    - vertex data = string label (dictionary-encoded to int32 codes here; the
      code order IS lexicographic label order, enforced at build),
    - gather ALL_EDGES → ``label_counter`` map merged by ``+=`` (:23-45,86-99),
    - apply iterates the std::map in ascending key order taking strictly
      greater counts (:101-125) ⇒ winner = (count DESC, label ASC); the own
      label only survives when the vertex has no gathered neighbors,
    - scatter ALL_EDGES when changed → signal all neighbors (:127-140).

    Partition partial = sparse sorted (center*L + label_code) count vector via
    np.unique — the two-level ``groupby((vid,label)).count`` trick; sorted
    keys make the range split a pair of ``searchsorted`` cuts.
    """

    name = "community_lpa"
    broadcast_keys = ("value", "changed")
    shardable = True

    def __init__(self, num_labels: int, max_iter: int = 100, frontier: bool = True,
                 vidmod: int | None = None) -> None:
        self.L = num_labels
        self._max_iter = max_iter
        self.frontier = frontier
        # vidmod: init label of vertex v is f"c{v % vidmod}" computed
        # per-chunk in tasks — the scale path for the standard hash-mod
        # seeding (no O(nv) driver label array). The label CODE keeps the
        # run_lpa contract: rank of the string in lexicographic vocab order.
        self.vidmod = vidmod
        if vidmod is not None:
            if num_labels != vidmod:
                raise ValueError("vidmod implies num_labels == vidmod")
            order = sorted(range(vidmod), key=lambda i: f"c{i}")
            m2c = np.empty(vidmod, np.int32)
            for rank, m in enumerate(order):
                m2c[m] = rank
            self._mod2code = m2c
            self.supports_chunk_init = True

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        if self.vidmod is None:
            raise RuntimeError("chunk init needs vidmod seeding")
        codes = self._mod2code[(vids[lo:hi] % np.uint64(self.vidmod)).astype(np.int64)]
        return {"value": codes, "changed": np.ones(hi - lo, bool)}

    def max_iterations(self) -> int:
        return self._max_iter

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        if self.vidmod is not None:
            nv = graph.nv
            return self.init_chunk(0, nv, nv, graph.vids, None, None)
        raise RuntimeError("CommunityLPAVP needs init labels; use run_lpa()")

    def partial(self, src, dst, nv, iteration, value, changed):
        L = np.int64(self.L)
        # the gather is computed for every center (cheap, branch-free); the
        # active mask is assembled GLOBALLY (merged across partitions — a
        # partition only sees its own edges, so frontier expansion must be
        # part of the monoid) and applied at apply time.
        if iteration == 0 or not self.frontier:
            act = np.ones(nv, bool)  # signal_all
        else:
            # scatter of the previous superstep: changed vertices signalled
            # ALL their neighbors (label_propagation.cpp:127-140) — those
            # neighbors are this superstep's gather set.
            act = np.zeros(nv, bool)
            act[dst[changed[src]]] = True
            act[src[changed[dst]]] = True
        keys = np.concatenate([
            dst.astype(np.int64) * L + value[src],
            src.astype(np.int64) * L + value[dst],
        ])
        uk, cnt = np.unique(keys, return_counts=True)
        return uk, cnt.astype(np.int64), act

    @staticmethod
    def merge(a, b):
        uk = np.concatenate([a[0], b[0]])
        cnt = np.concatenate([a[1], b[1]])
        order = np.argsort(uk, kind="stable")
        uk, cnt = uk[order], cnt[order]
        new_key = np.ones(len(uk), bool)
        new_key[1:] = uk[1:] != uk[:-1]
        idx = np.cumsum(new_key) - 1
        out_k = uk[new_key]
        out_c = np.bincount(idx, weights=cnt).astype(np.int64)
        return out_k, out_c, a[2] | b[2]

    def split_partial(self, partial, bounds):
        uk, cnt, act = partial
        cuts = np.searchsorted(uk, np.asarray(bounds, np.int64) * np.int64(self.L))
        return [(uk[cuts[r]:cuts[r + 1]], cnt[cuts[r]:cuts[r + 1]],
                 act[bounds[r]:bounds[r + 1]])
                for r in range(len(bounds) - 1)]

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        value = bundle["value"]
        uk, cnt, act = total
        center = (uk // self.L).astype(np.int64) - lo     # chunk-local
        label = (uk % self.L).astype(np.int32)
        newval = value.copy()
        if len(uk):
            # winner per center = (count DESC, label ASC): lexsort ascending by
            # (-count, label) within center, take first row per center — the
            # std::map ascending iteration with strict-greater update of
            # label_propagation.cpp:101-125.
            order = np.lexsort((label, -cnt, center))
            c_s, l_s = center[order], label[order]
            first = np.ones(len(c_s), bool)
            first[1:] = c_s[1:] != c_s[:-1]
            winners_c, winners_l = c_s[first], l_s[first]
            upd = act[winners_c]
            newval[winners_c[upd]] = winners_l[upd]
        changed = newval != value
        n_active = 0 if iteration + 1 >= self._max_iter else int(changed.sum())
        return {"value": newval, "changed": changed}, n_active, float(changed.sum())

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


class SSSPVP(VertexProgram):
    """Single-source shortest paths, message-based Bellman-Ford (sssp.cpp):

    - msg monoid = min distance (sssp.cpp:82-90), apply adopt-if-smaller
      (:133-140), scatter relax ``dist + edge.dist`` signalling improved
      neighbors (:155-163); ``--directed`` restricts scatter to OUT_EDGES
      (:145-150). Unit edge weights (the reference's default edge data = 1).
    """

    name = "sssp"
    broadcast_keys = ("value", "active")
    shardable = True
    wants_aux = True
    INF = np.float64(np.inf)

    def __init__(self, source_dense: int, directed: bool = False, max_iter: int = 10_000) -> None:
        self.source = source_dense
        self.directed = directed
        self._max_iter = max_iter

    def build_aux(self, src, dst, nv):
        return segment_aux(src, dst)

    def partial_aux(self, src, dst, nv, iteration, aux, value, active):
        return self._relax(src, dst, nv, aux, value, active, 1.0)

    def _relax(self, src, dst, nv, aux, value, active, w):
        """Shared min-distance relaxation kernel; ``w`` is a scalar (unit
        weights) or the per-edge weight array in partition edge order."""
        d_uniq, d_starts, s_order, s_uniq, s_starts = aux
        msgs = np.full(nv, self.INF, np.float64)
        cand = np.where(active[src], value[src] + w, self.INF)
        if len(cand):
            np.minimum.at(msgs, d_uniq, np.minimum.reduceat(cand, d_starts))
        if not self.directed:
            cand = np.where(active[dst], value[dst] + w, self.INF)
            cand = cand[s_order]
            if len(cand):
                np.minimum.at(msgs, s_uniq, np.minimum.reduceat(cand, s_starts))
        return msgs

    def max_iterations(self) -> int:
        return self._max_iter

    supports_chunk_init = True

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        n = hi - lo
        dist = np.full(n, self.INF, np.float64)
        active = np.zeros(n, bool)
        if lo <= self.source < hi:
            dist[self.source - lo] = 0.0
            active[self.source - lo] = True
        return {"value": dist, "active": active}

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        nv = graph.nv
        dist = np.full(nv, self.INF, np.float64)
        dist[self.source] = 0.0
        active = np.zeros(nv, bool)
        active[self.source] = True
        return {"value": dist, "active": active}

    def partial(self, src, dst, nv, iteration, value, active):
        msgs = np.full(nv, self.INF, np.float64)
        w = 1.0
        m = active[src]
        np.minimum.at(msgs, dst[m], value[src][m] + w)
        if not self.directed:
            m = active[dst]
            np.minimum.at(msgs, src[m], value[dst][m] + w)
        return msgs

    @staticmethod
    def merge(a, b):
        return np.minimum(a, b)

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        value = bundle["value"]
        improved = total < value
        newval = np.where(improved, total, value)
        return {"value": newval, "active": improved}, int(improved.sum()), float(improved.sum())

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


class WeightedSSSPVP(SSSPVP):
    """Weighted single-source shortest paths — the reference's actual SSSP
    semantics (sssp.cpp:48-52: ``edge_data { distance_type dist; }`` default
    1) and the Dijkstra-tree cost relaxation of
    graph_algorithms/djikstra.cpp: scatter relaxes ``dist + edge.dist`` with
    a min-distance message monoid (sssp.cpp:82-90, 155-163). BSP iterated
    relaxation (Bellman-Ford style) converges to the identical fixed point as
    the reference's async priority schedule — distances are a min monoid.

    The edge weight rides as a resident edge-payload column (``weight``),
    the Ray-side analogue of the EdgeData template: partitioned once at
    ingress, permuted into the partition's fixed edge order at finalize.
    """

    name = "sssp_w"
    wants_edata = True

    def partial_edata(self, src, dst, edata, nv, iteration, aux, *arrays):
        value, active = arrays
        return self._relax(src, dst, nv, aux, value, active, edata["weight"])


# ---------------------------------------------------------------------------
# driver-facing runners
# ---------------------------------------------------------------------------

def _rank_cols(chunk):
    return {"rank": chunk["value"]}


@ray.remote
def _pr_warm_chunk_task(warm_vals, out_deg, lo: int, hi: int,
                        use_cache: bool) -> dict:
    """One range's warm PageRank init bundle, built from its
    load_vertex_value_chunks slice + the plasma degree table."""
    warm = np.asarray(warm_vals, np.float64)
    out = {"value": warm,
           "winv": warm / np.maximum(out_deg[lo:hi], 1),
           "delta": np.full(hi - lo, np.inf, np.float64)}
    if use_cache:
        out["dwinv"] = np.zeros(hi - lo, np.float64)
    return out


@ray.remote
def _cc_warm_chunk_task(warm_vals, vids, lo: int, hi: int) -> dict:
    """One range's warm CC init bundle: sentinel rows (vertices absent
    from the warm table — new in this graph version) fall back to their
    own vid."""
    w = np.asarray(warm_vals, np.uint64).copy()
    miss = w == ConnectedComponentsVP.SENTINEL
    w[miss] = vids[lo:hi][miss]
    return {"value": w, "active": np.ones(hi - lo, bool)}


def _label_cols(chunk):
    return {"label": chunk["value"]}


def _dist_cols(chunk):
    return {"dist": chunk["value"]}


def run_pagerank(graph: Graph, tol: float = 1e-6, iterations: int = 0,
                 checkpoint_path: str | None = None, resume: bool = False,
                 max_iterations: int = 500, checkpoint_interval: int = 1,
                 use_cache: bool = False, result: str = "arrays",
                 warm_ranks_ds=None):
    """→ (vids, ranks, engine). Fixed-iteration mode when ``iterations`` > 0;
    ``use_cache`` enables delta/gather caching (dynamic mode).

    ``result="dataset"`` → (Dataset of (vid, rank), engine): the final state
    stays as R plasma chunks turned into Arrow blocks by tasks — with the
    chunked init path this keeps driver RSS independent of nv end-to-end
    (consume with ``write_parquet`` / aggregates to stay streaming).

    ``warm_ranks_ds``: a ``(vid, rank)`` Dataset (a previous graph
    version's ``result="dataset"`` output, or its Parquet re-read) used as
    the initial rank vector — the daily-refresh pattern: re-ingest the
    grown corpus, then converge FROM yesterday's fixed point instead of
    from 1.0. The fixed point is unique, so the answer is unchanged; the
    win is WORK, not superstep count — the dynamic frontier stays
    concentrated near the perturbed region (Σ n_active drops; the
    tol-crossing tail still needs the perturbation's own decay path, so
    wall supersteps can tie on small graphs). Vids are matched by value
    (load_vertex_value_chunks, combine='max'); vertices new to this graph
    version start at the cold 1.0. The warm table only ever exists as
    plasma range chunks fed to ``GASEngine.init_chunks`` — driver RSS
    stays independent of nv on the daily-refresh path."""
    vp = PageRankVP(tol=tol, iterations=iterations, use_cache=use_cache)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume,
                    checkpoint_interval=checkpoint_interval,
                    max_iterations=iterations or max_iterations,
                    lineage_extra={"tol": tol, "iterations": iterations})
    if warm_ranks_ds is not None:
        warm_refs = load_vertex_value_chunks(graph, warm_ranks_ds, "rank",
                                             eng.bounds, combine="max",
                                             default=1.0)
        b = eng.bounds
        eng.init_chunks = [
            _pr_warm_chunk_task.remote(warm_refs[r], graph.out_deg_ref(),
                                       int(b[r]), int(b[r + 1]), vp.use_cache)
            for r in range(eng.nshards)]
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return chunks_to_dataset(graph, eng.bounds, chunks, _rank_cols), eng
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


class WeightedPageRankVP(PageRankVP):
    """PageRank over weighted edges — the natural generalization of
    pagerank.cpp's ``rank/num_out_edges`` gather: each in-edge contributes
    ``rank(src) · w / strength(src)`` with ``strength = Σ out-edge weights``
    (zero-strength vertices contribute nothing, reset term unchanged, still
    the reference's unnormalized formulation). The per-edge weight rides as
    a resident edge-payload column (``edata_cols=("weight",)``); the
    1/strength normalizer lives as RANGE CHUNK refs aligned with the
    engine bounds (per-reducer zero-copy reads of only their own range —
    no full-array fetch per apply, no dense driver gather; the legacy
    single-ref form is still accepted)."""

    name = "pagerank_w"
    wants_edata = True

    def __init__(self, sinv_ref, tol: float = 1e-6, iterations: int = 0,
                 bounds=None) -> None:
        super().__init__(tol=tol, iterations=iterations)
        self.sinv_ref = sinv_ref      # ObjectRef | list of range-chunk refs
        self.bounds = None if bounds is None else np.asarray(bounds, np.int64)
        # edata-aware range-native kernel (the engine passes edata to
        # partial_sharded when wants_edata is set)
        self.partial_sharded = self._partial_sharded_w

    def prepare(self, graph: Graph) -> None:  # out_deg_ref not needed
        return None

    def _sinv(self, lo, hi):
        if isinstance(self.sinv_ref, list):
            r = int(np.searchsorted(self.bounds, lo, side="right")) - 1
            chunk = ray.get(self.sinv_ref[r])
            return chunk[lo - int(self.bounds[r]):hi - int(self.bounds[r])]
        return ray.get(self.sinv_ref)[lo:hi]

    def _inv(self, lo, hi):
        return self._sinv(lo, hi)

    def _init_winv(self, value, lo, hi):
        return value * self._sinv(lo, hi)

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        n = hi - lo
        value = np.ones(n, np.float64)
        return {"value": value,
                "winv": self._init_winv(value, lo, hi),
                "delta": np.full(n, np.inf, np.float64)}

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        nv = graph.nv
        value = np.ones(nv, np.float64)
        return {"value": value,
                "winv": self._init_winv(value, 0, nv),
                "delta": np.full(nv, np.inf, np.float64)}

    def partial_edata(self, src, dst, edata, nv, iteration, aux, winv, delta):
        w = edata["weight"]
        sums = np.bincount(dst, weights=winv[src] * w, minlength=nv)
        if self.iterations:
            return sums, None
        sig_src = np.abs(delta[src]) > self.tol
        signal = np.zeros(nv, bool)
        signal[dst[sig_src]] = True
        return sums, signal

    def _partial_sharded_w(self, src, dst, edata, nv, iteration, bounds,
                           tidx, winv, delta):
        """Range-native weighted gather — PageRankVP._partial_sharded with
        the per-edge weight slice folded into the bincount weights (edata is
        permuted into the partition's fixed (dst, src)-sorted edge order at
        finalize, so ``w[j0:j1]`` aligns with the range's edge slice)."""
        w = edata["weight"]
        b = np.asarray(bounds)
        cuts = np.searchsorted(dst, b)
        out = {}
        for r in np.asarray(tidx, np.int64):
            lo, hi = int(b[r]), int(b[r + 1])
            j0, j1 = int(cuts[r]), int(cuts[r + 1])
            d = dst[j0:j1]
            s = src[j0:j1]
            sums = np.bincount(d - lo, weights=winv[s] * w[j0:j1],
                               minlength=hi - lo)
            if self.iterations:
                out[int(r)] = (sums, None)
            else:
                sig_src = np.abs(delta[s]) > self.tol
                signal = np.zeros(hi - lo, bool)
                signal[d[sig_src] - lo] = True
                out[int(r)] = (sums, signal)
        return out


class _OutStrengthVP(VertexProgram):
    """One-superstep per-vertex out-strength (Σ outgoing edge weights):
    bincount over each partition's RESIDENT edges — the graph's actor pool
    already holds them, so no re-read/shuffle of the edge table."""

    name = "out_strength"
    broadcast_keys = ("value",)
    wants_edata = True
    shardable = True

    def __init__(self, weight_col: str = "weight") -> None:
        self.weight_col = weight_col

    def max_iterations(self) -> int:
        return 1

    supports_chunk_init = True

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        return {"value": np.zeros(hi - lo, np.float64)}

    def init_bundle(self, graph: Graph):
        return {"value": np.zeros(graph.nv, np.float64)}

    def partial_edata(self, src, dst, edata, nv, iteration, aux, value):
        return np.bincount(src, weights=edata[self.weight_col], minlength=nv)

    @staticmethod
    def merge(a, b):
        return a + b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        return {"value": total}, 0, float(np.abs(total).sum())

    def apply(self, bundle, total, iteration):
        n = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, n, n)


def out_strength_dense(graph: Graph, weight_col: str = "weight") -> np.ndarray:
    """Dense per-vertex out-strength aligned to the graph's dense vid order,
    computed in ONE superstep over the resident edge partitions and cached
    on the graph (static for a built graph)."""
    cached = getattr(graph, "_out_strength", None)
    if cached is not None:
        return cached
    eng = GASEngine(graph, _OutStrengthVP(weight_col))
    s = eng.run()["value"]
    graph._out_strength = s
    return s


@ray.remote
def _sinv_chunk_task(chunk) -> np.ndarray:
    s = chunk["value"]
    return np.where(s > 0, 1.0 / np.where(s > 0, s, 1.0), 0.0)


def _out_sinv_chunks(graph: Graph, weight_col: str = "weight"):
    """(bounds, R refs of the 1/out-strength range chunks) — the strength
    superstep's final chunks mapped through per-range tasks; cached on the
    graph. No O(nv) array touches the driver."""
    cached = getattr(graph, "_out_sinv_chunks", None)
    if cached is not None:
        return cached
    eng = GASEngine(graph, _OutStrengthVP(weight_col))
    chunks = eng.run(result="chunks")
    refs = [_sinv_chunk_task.remote(c) for c in chunks]
    graph._out_sinv_chunks = (eng.bounds, refs)
    return graph._out_sinv_chunks


def run_weighted_pagerank(graph: Graph, tol: float = 1e-6, iterations: int = 0,
                          max_iterations: int = 500,
                          checkpoint_path: str | None = None,
                          resume: bool = False, result: str = "arrays"):
    """→ (vids, ranks, engine): PageRank with per-edge weights (the graph
    must be built with ``edata_cols=("weight",)``). The 1/strength
    normalizer stays as plasma range chunks end-to-end (one strength
    superstep → per-range inversion tasks → per-reducer range reads);
    ``result="dataset"`` → ((vid, rank) Dataset, engine) with the final
    state going straight from chunks to Arrow blocks, so driver RSS is
    independent of nv like unweighted run_pagerank's dataset mode."""
    bounds, sinv_refs = _out_sinv_chunks(graph)
    vp = WeightedPageRankVP(sinv_refs, tol=tol, iterations=iterations,
                            bounds=bounds)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume,
                    max_iterations=iterations or max_iterations,
                    lineage_extra={"tol": tol, "iterations": iterations,
                                   "weighted": True})
    if not np.array_equal(eng.bounds, bounds):
        # different reduce_shards between the two engines (env override
        # mid-session): fall back to one joined ref
        vp.sinv_ref = _concat_sinv_task.remote(*sinv_refs)
        vp.bounds = None
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return chunks_to_dataset(graph, eng.bounds, chunks, _rank_cols), eng
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


@ray.remote
def _concat_sinv_task(*chunks):
    return np.concatenate(chunks)


def run_connected_components(graph: Graph, checkpoint_path: str | None = None,
                             resume: bool = False, max_iterations: int = 10_000,
                             checkpoint_interval: int = 1, result: str = "arrays",
                             warm_labels_ds=None):
    """``warm_labels_ds``: a ``(vid, label)`` Dataset from a PREVIOUS graph
    version — valid because v1 labels are vids inside their own (subset)
    v2 component, so min-propagation from them still converges to the v2
    minima; adding edges only merges components (edge REMOVAL invalidates
    warm labels — rebuild cold). New vertices start at their own vid; the
    frontier then touches only the merge seams. The warm table stays in
    plasma range chunks (load_vertex_value_chunks + init_chunks) — no
    O(nv) driver array."""
    vp = ConnectedComponentsVP()
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume,
                    checkpoint_interval=checkpoint_interval,
                    max_iterations=max_iterations)
    if warm_labels_ds is not None:
        import pyarrow as pa
        import pyarrow.compute as pc

        def to_u64(t: pa.Table) -> pa.Table:
            # loud integral cast: a float label column (easy via pandas /
            # Parquet NaN coercion) would silently wrap the uint64-max
            # sentinel to 0 downstream and seed every new vertex with
            # label 0; pc.cast raises on NaN / non-integral floats
            return pa.table({"vid": t["vid"],
                             "label": pc.cast(t["label"], pa.uint64())})

        warm_labels_ds = warm_labels_ds.map_batches(to_u64,
                                                    batch_format="pyarrow")
        sent = np.uint64(ConnectedComponentsVP.SENTINEL)
        warm_refs = load_vertex_value_chunks(graph, warm_labels_ds, "label",
                                             eng.bounds, combine="min",
                                             default=sent)
        b = eng.bounds
        eng.init_chunks = [
            _cc_warm_chunk_task.remote(warm_refs[r], graph.vids_ref(),
                                       int(b[r]), int(b[r + 1]))
            for r in range(eng.nshards)]
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return chunks_to_dataset(graph, eng.bounds, chunks, _label_cols), eng
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


def run_lpa(graph: Graph, init_labels: np.ndarray, max_iter: int = 20,
            frontier: bool = True, checkpoint_path: str | None = None,
            resume: bool = False):
    """Community LPA over string labels.

    ``init_labels``: array of strings aligned with ``graph.vids``. Labels are
    dictionary-encoded so that code order == lexicographic order (the
    std::map-ascending tie-break of label_propagation.cpp:108-114 becomes
    "smallest code wins ties").
    → (vids, final string labels, engine)
    """
    uniq = np.unique(np.asarray(init_labels, dtype=object).astype(str))
    code = {s: i for i, s in enumerate(uniq)}
    codes = np.fromiter((code[s] for s in np.asarray(init_labels).astype(str)), np.int32, len(init_labels))
    vp = CommunityLPAVP(num_labels=len(uniq), max_iter=max_iter, frontier=frontier)
    init = {"value": codes, "changed": np.ones(graph.nv, bool)}
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume,
                    max_iterations=max_iter, init_bundle=init)
    bundle = eng.run()
    return graph.vids, uniq[bundle["value"]], eng


def _lpa_label_cols(vocab, chunk):
    return {"label": vocab[chunk["value"]]}


def run_lpa_vidmod(graph: Graph, mod: int, max_iter: int = 20,
                   frontier: bool = True, result: str = "arrays",
                   checkpoint_path: str | None = None, resume: bool = False):
    """Community LPA with the standard hash-mod seeding (vertex v starts as
    label ``f"c{{v % mod}}"``) — identical output to ``run_lpa`` with that
    init array, but the seeding happens per range chunk in tasks, so no
    O(nv) label array ever touches the driver. ``result="dataset"`` → a
    (vid, label) Dataset built straight from the final chunk refs."""
    import functools

    vocab = np.array(sorted(f"c{i}" for i in range(mod)))
    vp = CommunityLPAVP(num_labels=mod, max_iter=max_iter, frontier=frontier,
                        vidmod=mod)
    eng = GASEngine(graph, vp, max_iterations=max_iter,
                    checkpoint_path=checkpoint_path, resume=resume)
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return chunks_to_dataset(graph, eng.bounds, chunks,
                                 functools.partial(_lpa_label_cols, vocab)), eng
    bundle = eng.run()
    return graph.vids, vocab[bundle["value"]], eng


@ray.remote
def _find_vid_task(vids: np.ndarray, gid: int) -> int:
    """Dense index of one vid, computed against the plasma vid table —
    O(log nv) for sorted tables, one scan for bucket-ordered; returns -1
    when absent. Keeps single-source lookups off the driver heap."""
    g = np.uint64(gid)
    pos = int(np.searchsorted(vids, g))
    if pos < len(vids) and vids[pos] == g:
        return pos
    hits = np.flatnonzero(vids == g)  # bucket order: not globally sorted
    return int(hits[0]) if len(hits) else -1


def _dense_source(graph: Graph, source_vid: int) -> int:
    """Validated vid → dense index (a bare searchsorted would silently pick
    a neighboring vertex for an absent source)."""
    if graph._vids_cache is None:
        # plasma path: probe in a task instead of gathering O(nv)
        pos = ray.get(_find_vid_task.remote(graph.vids_ref(), int(source_vid)))
        if pos < 0:
            raise ValueError(f"source vertex {source_vid} is not in the graph")
        return pos
    pos = int(graph.dense(np.array([source_vid], np.uint64))[0])
    if pos >= graph.nv or int(graph.vids[pos]) != int(source_vid):
        raise ValueError(f"source vertex {source_vid} is not in the graph")
    return pos


def run_sssp(graph: Graph, source_vid: int, directed: bool = False,
             checkpoint_path: str | None = None, resume: bool = False,
             result: str = "arrays"):
    src_dense = _dense_source(graph, source_vid)
    vp = SSSPVP(src_dense, directed=directed)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume)
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return chunks_to_dataset(graph, eng.bounds, chunks, _dist_cols), eng
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


def run_sssp_weighted(graph: Graph, source_vid: int, directed: bool = False,
                      checkpoint_path: str | None = None, resume: bool = False):
    """Weighted SSSP over a graph built with ``edata_cols=("weight",)``."""
    if "weight" not in graph.edata_cols:
        raise ValueError('graph has no "weight" edge column; build with '
                         'edata_cols=("weight",)')
    src_dense = _dense_source(graph, source_vid)
    vp = WeightedSSSPVP(src_dense, directed=directed)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume)
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


class HITSVP(VertexProgram):
    """HITS hubs & authorities (Kleinberg 1999), simultaneous-update BSP
    over the directed edge set — the same gather discipline as PageRankVP
    but in BOTH directions per superstep:

    - ``auth_{t+1}[v] = Σ hub_t[u] over in-edges (u→v)``  (dst-keyed gather),
    - ``hub_{t+1}[u]  = Σ auth_t[v] over out-edges (u→v)`` (src-keyed gather),

    run UNNORMALIZED for a fixed K supersteps; callers normalize the final
    vectors (L1) — per-iteration normalization needs a global reduce inside
    apply, which would break range-chunk composition, and for fixed small K
    float64 carries the unnormalized magnitudes exactly as a SQL replay
    does. Each partition owns each edge exactly once (vertex-cut), so the
    two per-partition bincounts merge to exact global sums. Shardable via
    the generic dense-split path: the hub output is src-keyed, so there is
    no range-native kernel (a range's hub sums draw from dst-sorted edge
    order), but ``split_dense`` chunking composes exactly.
    """

    name = "hits"
    broadcast_keys = ("hub", "auth")
    shardable = True
    supports_chunk_init = True

    def __init__(self, iterations: int = 5) -> None:
        assert iterations > 0
        self.iterations = int(iterations)

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        n = hi - lo
        return {"hub": np.ones(n, np.float64),
                "auth": np.ones(n, np.float64)}

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        return self.init_chunk(0, graph.nv, graph.nv, None, None, None)

    def partial(self, src, dst, nv, iteration, hub, auth):
        auth_sums = np.bincount(dst, weights=hub[src], minlength=nv)
        hub_sums = np.bincount(src, weights=auth[dst], minlength=nv)
        return auth_sums, hub_sums

    @staticmethod
    def merge(a, b):
        return a[0] + b[0], a[1] + b[1]

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        auth_sums, hub_sums = total
        delta = float(np.abs(auth_sums - bundle["auth"]).sum())
        n_active = (hi - lo) if iteration + 1 < self.iterations else 0
        return {"hub": hub_sums, "auth": auth_sums}, n_active, delta

    def apply(self, bundle, total, iteration):
        nv = len(bundle["hub"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


@ray.remote
def _hits_l1_chunk(chunk):
    return float(chunk["hub"].sum()), float(chunk["auth"].sum())


def run_hits(graph: Graph, iterations: int = 5,
             checkpoint_path: str | None = None, resume: bool = False,
             result: str = "arrays"):
    """→ (vids, hub, auth, engine): L1-normalized hub/authority scores
    after ``iterations`` simultaneous HITS supersteps.

    ``result="dataset"`` → ((vid, hub, auth) Dataset, engine): the L1
    normalizers come from per-chunk sum tasks folded in fixed range order
    (within ~1e-15 of the dense path's pairwise sum; same distributed
    two-pass epilogue as run_eigencentrality) and the scale happens inside
    each block task — no O(nv) driver arrays."""
    vp = HITSVP(iterations=iterations)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume,
                    max_iterations=iterations)
    if result == "dataset":
        chunks = eng.run(result="chunks")
        parts = ray.get([_hits_l1_chunk.remote(c) for c in chunks])
        hs = sum(p[0] for p in parts) or 1.0
        as_ = sum(p[1] for p in parts) or 1.0

        def cols(chunk, _hs=hs, _as=as_):
            return {"hub": chunk["hub"] / _hs, "auth": chunk["auth"] / _as}

        return chunks_to_dataset(graph, eng.bounds, chunks, cols), eng
    bundle = eng.run()
    hub, auth = bundle["hub"], bundle["auth"]
    hs, as_ = hub.sum(), auth.sum()
    return (graph.vids, hub / (hs if hs else 1.0), auth / (as_ if as_ else 1.0),
            eng)


class PersonalizedPageRankVP(PageRankVP):
    """Personalized PageRank: PageRankVP's gather/winv machinery with the
    teleport mass concentrated on one source vertex —
    ``new[v] = 0.85·Σ winv[in] + 0.15·[v == source]`` (the reference's
    unnormalized formulation, pagerank.cpp:101-103, with e_s replacing the
    uniform reset). Fixed-iteration mode only (the dynamic frontier's
    tol-vs-mass semantics differ under a point reset; K supersteps is also
    what the SQL replay unrolls). Initial state = e_s."""

    name = "ppr"

    def __init__(self, source_idx: int, iterations: int = 10,
                 out_deg_ref=None) -> None:
        assert iterations > 0
        super().__init__(iterations=iterations, out_deg_ref=out_deg_ref)
        self.source_idx = int(source_idx)

    def _reset(self, lo: int, hi: int) -> np.ndarray:
        r = np.zeros(hi - lo, np.float64)
        if lo <= self.source_idx < hi:
            r[self.source_idx - lo] = RESET_PROB
        return r

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        value = self._reset(lo, hi) / RESET_PROB
        return {"value": value,
                "winv": value / np.maximum(out_deg[lo:hi], 1),
                "delta": np.full(hi - lo, np.inf, np.float64)}

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        return self.init_chunk(0, graph.nv, graph.nv, None, graph.out_deg,
                               None)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        sums, _signal = total
        inv = 1.0 / np.maximum(ray.get(self.out_deg_ref)[lo:hi], 1)
        newval = (1.0 - RESET_PROB) * sums + self._reset(lo, hi)
        delta = newval - bundle["value"]
        n_active = (hi - lo) if iteration + 1 < self.iterations else 0
        return ({"value": newval, "winv": newval * inv, "delta": delta},
                n_active, float(np.abs(delta).sum()))


class KatzVP(VertexProgram):
    """Katz centrality (Katz 1953), fixed-K BSP power recurrence:
    ``x_{t+1}[v] = α·Σ x_t[u] over in-edges (u→v) + β``, x_0 = 0 — the
    attenuation-weighted count of all inbound walks (PageRank's gather
    discipline without the degree normalization; pagerank.cpp:92-103 is the
    same dst-keyed bincount shape). Unnormalized through the iterations so
    range-chunk apply composes; α must be < 1/λ_max for the infinite series
    to converge, but any fixed K is well-defined (and is what the SQL
    replay unrolls)."""

    name = "katz"
    broadcast_keys = ("value",)
    shardable = True
    supports_chunk_init = True

    def __init__(self, alpha: float = 1 / 16, beta: float = 1.0,
                 iterations: int = 5) -> None:
        assert iterations > 0
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.iterations = int(iterations)

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        return {"value": np.zeros(hi - lo, np.float64)}

    def init_bundle(self, graph: Graph) -> dict[str, np.ndarray]:
        return self.init_chunk(0, graph.nv, graph.nv, None, None, None)

    def partial(self, src, dst, nv, iteration, value):
        return np.bincount(dst, weights=value[src], minlength=nv)

    @staticmethod
    def merge(a, b):
        return a + b

    def split_partial(self, partial, bounds):
        return split_dense(partial, bounds)

    def apply_chunk(self, bundle, total, iteration, lo, hi, nv):
        newval = self.alpha * total + self.beta
        delta = float(np.abs(newval - bundle["value"]).sum())
        n_active = (hi - lo) if iteration + 1 < self.iterations else 0
        return {"value": newval}, n_active, delta

    def apply(self, bundle, total, iteration):
        nv = len(bundle["value"])
        return self.apply_chunk(bundle, total, iteration, 0, nv, nv)


def _katz_cols(chunk):
    return {"katz": chunk["value"]}


def run_katz(graph: Graph, alpha: float = 1 / 16, beta: float = 1.0,
             iterations: int = 5, checkpoint_path: str | None = None,
             resume: bool = False, result: str = "arrays"):
    """→ (vids, katz scores, engine) after K fixed supersteps;
    ``result="dataset"`` → ((vid, katz) Dataset, engine) — final state
    stays as range chunks turned into Arrow blocks by tasks (driver RSS
    independent of nv, like run_pagerank's dataset mode)."""
    vp = KatzVP(alpha=alpha, beta=beta, iterations=iterations)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path,
                    resume=resume, max_iterations=iterations)
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return chunks_to_dataset(graph, eng.bounds, chunks, _katz_cols), eng
    bundle = eng.run()
    return graph.vids, bundle["value"], eng


class EigenvectorCentralityVP(KatzVP):
    """Eigenvector centrality by K unnormalized power-iteration supersteps:
    ``x_{t+1}[v] = Σ x_t[u] over in-edges``, x_0 = 1; callers L2-normalize
    the final vector (per-step normalization needs a global reduce inside
    apply — same composition argument as HITSVP's L1 epilogue)."""

    name = "eigencentrality"

    def __init__(self, iterations: int = 5) -> None:
        super().__init__(alpha=1.0, beta=0.0, iterations=iterations)

    def init_chunk(self, lo, hi, nv, vids, out_deg, in_deg):
        return {"value": np.ones(hi - lo, np.float64)}


@ray.remote
def _sumsq_chunk(chunk) -> float:
    x = chunk["value"]
    return float((x * x).sum())


def run_eigencentrality(graph: Graph, iterations: int = 5,
                        checkpoint_path: str | None = None,
                        resume: bool = False, result: str = "arrays"):
    """→ (vids, L2-normalized eigenvector-centrality scores, engine);
    ``result="dataset"`` → ((vid, eigen) Dataset, engine) — the global L2
    normalizer is a distributed two-pass epilogue (per-chunk sum-of-squares
    tasks reduced to ONE scalar on the driver, then a scale inside each
    block task), so the driver never holds an O(nv) array. The scalar
    reduce sums R chunk partials in fixed range order — deterministic, and
    within ~1e-15 of the dense path's sum order.

    Exact-integer precondition (cross-engine 6-dp parity, same class as
    sql_katz_k's dyadic-alpha note): the unnormalized scores are K-step
    walk counts — integers — and parity with the SQL replay relies on
    every count AND the Σx² normalizer staying ≤ 2^53 (exactly
    representable in float64). On hub-heavy graphs the counts grow like
    λ_max^K, so at large K or high max-degree the last float64 ulps can
    diverge between engines; keep K small (default 5) or compare at
    coarser rounding there."""
    vp = EigenvectorCentralityVP(iterations=iterations)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path,
                    resume=resume, max_iterations=iterations)
    if result == "dataset":
        chunks = eng.run(result="chunks")
        ss = sum(ray.get([_sumsq_chunk.remote(c) for c in chunks]))
        inv = 1.0 / np.sqrt(ss) if ss else 1.0

        def cols(chunk, _inv=inv):
            return {"eigen": chunk["value"] * _inv}

        return chunks_to_dataset(graph, eng.bounds, chunks, cols), eng
    bundle = eng.run()
    x = bundle["value"]
    nrm = float(np.sqrt((x * x).sum()))
    return graph.vids, x / (nrm if nrm else 1.0), eng


def _ppr_cols(chunk):
    return {"ppr": chunk["value"]}


def run_ppr(graph: Graph, source_vid: int, iterations: int = 10,
            checkpoint_path: str | None = None, resume: bool = False,
            result: str = "arrays"):
    """→ (vids, scores, engine): K fixed personalized-PageRank supersteps
    from ``source_vid``; ``result="dataset"`` → ((vid, ppr) Dataset,
    engine) built straight from the final range chunks."""
    vp = PersonalizedPageRankVP(_dense_source(graph, source_vid),
                                iterations=iterations)
    eng = GASEngine(graph, vp, checkpoint_path=checkpoint_path, resume=resume,
                    max_iterations=iterations)
    if result == "dataset":
        chunks = eng.run(result="chunks")
        return chunks_to_dataset(graph, eng.bounds, chunks, _ppr_cols), eng
    bundle = eng.run()
    return graph.vids, bundle["value"], eng
