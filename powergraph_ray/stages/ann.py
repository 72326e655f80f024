"""Similarity search over the ``embeddings`` table (vec_id, embedding:
list<float>, label).

- brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (``ray.put`` once, read zero-copy in every task) — the exact
  baseline,
- LSH-bucketed variant (random hyperplane signs): candidates restricted to
  matching buckets — the documented scale path (each batch only scores
  vectors whose bucket matches a query bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..ids import round_half_away


def _mat(batch_embeddings) -> np.ndarray:
    return np.asarray([np.asarray(e, np.float64) for e in batch_embeddings])


def _qnormalize(q: np.ndarray) -> np.ndarray:
    """Unit-normalize query rows with the same zero-norm guard as data rows
    (an all-zero embedding must score 0, not NaN)."""
    return q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)


def _finalize_topk(df: pd.DataFrame, k: int, include_self: bool = False) -> pd.DataFrame:
    """Shared top-k epilogue: drop self-pairs, order by (sim DESC,
    neighbor_id ASC) per query, keep k, round half-away."""
    if not include_self:
        df = df[df["query_id"] != df["neighbor_id"]]
    df = df.sort_values(["query_id", "sim", "neighbor_id"],
                        ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["sim"] = round_half_away(out["sim"], 6)
    return out[["query_id", "neighbor_id", "sim"]]


def _select_queries(emb_ds, query_ids) -> pd.DataFrame:
    """Vectorized semi-filter: broadcast the small query-id set into a
    pyarrow is_in mask per batch (no row-wise python filter)."""
    import pyarrow.compute as pc

    ids = pa.array(sorted(int(x) for x in query_ids), pa.int64())
    q = emb_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=ids)),
        batch_format="pyarrow",
    ).to_pandas()
    return q.sort_values("vec_id")


class BruteForceTopK:
    """Per-batch exact cosine scores vs the broadcast query matrix; emits the
    per-batch top-k per query (partial top-k) — final top-k is a small
    groupby on the driver-side aggregate stage."""

    def __init__(self, queries_ref, k: int) -> None:
        self.qids, q = ray.get(queries_ref)
        self.qn = _qnormalize(q)
        # +1 so a query's own vector (sim 1.0) can be dropped downstream
        # without costing a real neighbor slot
        self.k = k + 1

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _mat(batch["embedding"])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = self.qn @ mn.T  # (nq, nb)
        vec_ids = batch["vec_id"].to_numpy()
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = {"query_id": np.repeat(self.qids, k),
                "neighbor_id": vec_ids[idx].ravel(),
                "sim": np.take_along_axis(sims, idx, axis=1).ravel()}
        return pd.DataFrame(rows)


def brute_force_topk(emb_ds, query_ids: list[int], k: int = 5,
                     include_self: bool = False) -> pd.DataFrame:
    """Exact cosine top-k for the given query vec_ids → DataFrame
    (query_id, neighbor_id, sim rounded 1e-6), ties broken by vec_id ASC."""
    q = _select_queries(emb_ds, query_ids)
    qids = q["vec_id"].to_numpy()
    qmat = _mat(q["embedding"])
    queries_ref = ray.put((qids, qmat))

    partial = emb_ds.map_batches(BruteForceTopK, batch_format="pandas",
                                 fn_constructor_args=(queries_ref, k),
                                 concurrency=(1, 12), batch_size=4096)
    return _finalize_topk(partial.to_pandas(), k, include_self=include_self)


class LshBuckets:
    """Random-hyperplane signature (b bits) per vector."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 11) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((bits, dim))
        self.weights = (1 << np.arange(bits)).astype(np.int64)

    def code(self, m: np.ndarray) -> np.ndarray:
        return ((m @ self.planes.T) > 0).astype(np.int64) @ self.weights

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _mat(batch["embedding"])
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(),
                             "bucket": self.code(m)})


def lsh_topk(emb_ds, query_ids: list[int], k: int = 5, bits: int = 8) -> pd.DataFrame:
    """Approximate top-k: only candidates sharing the query's hyperplane
    bucket are scored (recall < 1; the scale path for 10^12 rows).
    Returns the same schema as brute_force_topk."""
    q = _select_queries(emb_ds, query_ids)
    qmat = _mat(q["embedding"])
    lsh = LshBuckets(dim=qmat.shape[1], bits=bits)
    qcodes = lsh.code(qmat)
    qn = _qnormalize(qmat)
    qids = q["vec_id"].to_numpy()
    bundle_ref = ray.put((qids, qn, qcodes, lsh.planes, lsh.weights))

    class BucketScore:
        def __init__(self) -> None:
            self.qids, self.qn, self.qcodes, self.planes, self.weights = ray.get(bundle_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _mat(batch["embedding"])
            codes = ((m @ self.planes.T) > 0).astype(np.int64) @ self.weights
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            vec_ids = batch["vec_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = codes == self.qcodes[qi]
                if not mask.any():
                    continue
                sims = mn[mask] @ self.qn[qi]
                out_q.extend([self.qids[qi]] * int(mask.sum()))
                out_n.extend(vec_ids[mask].tolist())
                out_s.extend(sims.tolist())
            return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "sim": out_s})

    return _finalize_topk(
        emb_ds.map_batches(BucketScore, batch_format="pandas",
                           concurrency=(1, 12), batch_size=4096).to_pandas(), k)


def _pair_block(ids_a, mn_a, ids_b, mn_b, threshold, same):
    """Chunked block matmul → qualifying (vec_a < vec_b, sim) pairs."""
    frames = []
    step = max(1, int(4_000_000 // max(1, len(ids_b))))
    for s in range(0, len(ids_a), step):
        sims = mn_a[s:s + step] @ mn_b.T
        ai, bi = np.nonzero(sims >= threshold)
        a, b = ids_a[s + ai], ids_b[bi]
        keep = a < b if same else a != b
        va, vb = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
        frames.append(pd.DataFrame({
            "vec_a": va, "vec_b": vb,
            "sim": round_half_away(sims[ai, bi][keep], 6)}))
    return pd.concat(frames) if frames else pd.DataFrame(
        {"vec_a": pd.array([], dtype="int64"), "vec_b": pd.array([], dtype="int64"),
         "sim": pd.array([], dtype="float64")})


def embedding_near_dups(emb_ds, threshold: float = 0.45,
                        n_buckets: int | None = None) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim >= t) —
    EXACT, via a bucketed grid self-join (no driver materialization, no
    whole-matrix broadcast):

    vectors hash into B buckets by vec_id; each vector is replicated to the
    B unordered bucket-pair cells ``(min(b,j), max(b,j))``; per cell a
    chunked block matmul scores bucket-i × bucket-j (triangular within the
    diagonal cell). Total exchange O(B·N) rows, per-cell memory O(2N/B·d).
    The work is the unavoidable O(N²) of an exact threshold self-join —
    distributed across B(B+1)/2 cells; the sub-quadratic approximate path is
    ``lsh_topk`` / ``ivf_topk`` bucketing."""
    from ..ids import integer_mix

    N = emb_ds.count()
    B = n_buckets or int(max(2, min(32, -(-N // 100_000))))

    def emit(t: pa.Table) -> pa.Table:
        vid = np.asarray(t["vec_id"]).astype(np.int64, copy=False)
        bkt = (integer_mix(vid.view(np.uint64)) % np.uint64(B)).astype(np.int64)
        jj = np.arange(B, dtype=np.int64)[None, :]
        lo = np.minimum(bkt[:, None], jj)
        hi = np.maximum(bkt[:, None], jj)
        cells = (lo * B + hi).ravel()
        idx = np.repeat(np.arange(len(vid), dtype=np.int64), B)
        rep = t.take(pa.array(idx))
        return rep.append_column("cell", pa.array(cells))

    grid = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        emit, batch_format="pyarrow")

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        i, j = divmod(cell, B)
        vid = g["vec_id"].to_numpy()
        bkt = (integer_mix(vid.astype(np.int64).view(np.uint64))
               % np.uint64(B)).astype(np.int64)
        m = _mat(g["embedding"])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        if i == j:
            return _pair_block(vid, mn, vid, mn, threshold, same=True)
        si, sj = bkt == i, bkt == j
        return _pair_block(vid[si], mn[si], vid[sj], mn[sj], threshold, same=False)

    df = (grid.groupby("cell").map_groups(cell_pairs, batch_format="pandas")
          .to_pandas())
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def ivf_topk(emb_ds, query_ids: list[int], k: int = 5, n_cells: int = 16,
             n_probe: int = 4, kmeans_iters: int = 5) -> pd.DataFrame:
    """IVF approximate top-k — the classic two-level scale path (coarse
    k-means quantizer + inverted cells): every vector is assigned to its
    nearest centroid's cell; a query scores ONLY vectors in its ``n_probe``
    nearest cells, so the scored fraction is ~n_probe/n_cells. Same output
    schema/ordering contract as :func:`brute_force_topk`.

    Physical plan: the deterministic distributed k-means (stages/kmeans.py)
    builds the quantizer; only the (k, d) centroid matrix and the probe sets
    ride as one broadcast (``ray.put``) — each batch recomputes its rows'
    cells from the centroids (``nearest_cell``, a cheap argmin identical to
    the kmeans assignment rule), so NO O(N) (vec_id → cell) lookup table
    exists anywhere; one vectorized ``map_batches`` pass scores per-batch
    candidates; the small partial-top-k frames reduce on the driver.
    """
    from .kmeans import kmeans, nearest_cell

    cents, _, _ = kmeans(emb_ds, k=n_cells, iterations=kmeans_iters)

    q = _select_queries(emb_ds, query_ids)
    qids = q["vec_id"].to_numpy()
    qmat = _mat(q["embedding"])
    qn = _qnormalize(qmat)
    # n_probe nearest cells per query (euclidean to centroids)
    d2 = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1)[:, :n_probe]
    bundle_ref = ray.put((qids, qn, probes, cents))

    class CellScore:
        def __init__(self) -> None:
            (self.qids, self.qn, self.probes,
             self.cents) = ray.get(bundle_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _mat(batch["embedding"])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            vec_ids = batch["vec_id"].to_numpy()
            cells, _ = nearest_cell(m, self.cents)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(cells, self.probes[qi])
                if not mask.any():
                    continue
                sims = mn[mask] @ self.qn[qi]
                out_q.extend([self.qids[qi]] * int(mask.sum()))
                out_n.extend(vec_ids[mask].tolist())
                out_s.extend(sims.tolist())
            return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                 "sim": out_s})

    return _finalize_topk(
        emb_ds.map_batches(CellScore, batch_format="pandas",
                           concurrency=(1, 12), batch_size=4096).to_pandas(), k)


# ---------------------------------------------------------------------------
# materialized indexes: bucket/cell-partitioned Parquet with pruned reads
# ---------------------------------------------------------------------------
# The inline lsh_topk/ivf_topk still stream EVERY row through a map_batches
# pass (codes recomputed per batch, non-candidates dropped after decode).
# At 10^12 rows the win is refusing to READ non-candidate rows at all: the
# code/cell assignment is materialized ONCE as the Parquet partition column,
# and a query reads only its matching partition directories (pyarrow
# partition pruning — non-candidate files never leave storage).

def lsh_index(emb_ds, path: str, bits: int = 8, seed: int = 11) -> str:
    """Materialize (vec_id, embedding, bucket) as bucket-partitioned Parquet.
    Planes are deterministic in (bits, dim, seed), so a reader reconstructs
    them without a sidecar."""
    def add_bucket(t: pa.Table) -> pa.Table:
        m = _mat(t["embedding"].to_pylist())
        code = LshBuckets(m.shape[1], bits, seed).code(m)
        # the code rides BOTH as the hive partition dir (file-listing-level
        # pruning via partition_filter) and as a physical column (per-row
        # query matching without re-hashing)
        return pa.table({"vec_id": t["vec_id"], "embedding": t["embedding"],
                         "bucket": pa.array(code, pa.int64()),
                         "bucket_dir": pa.array(code, pa.int64())})

    from .export import write_partitioned

    write_partitioned(emb_ds.map_batches(add_bucket, batch_format="pyarrow"),
                      path, "bucket_dir")
    return path


_EMPTY_TOPK = pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                            "neighbor_id": pd.array([], dtype="int64"),
                            "sim": pd.array([], dtype="float64")})


def _pruned_read(index_path: str, field: str, wanted):
    """Partition-pruned read: only ``<field>=<v>`` directories in ``wanted``
    are even listed — non-candidate files never leave storage. Returns
    ``None`` when NO partition matches (ray.data.read_parquet cannot
    construct a 0-file dataset) — callers that can legitimately hit that
    (multi-root corpus reads) skip the root."""
    import ray.data
    from ray.data.datasource.partitioning import PathPartitionFilter

    keep = {int(v) for v in wanted}

    def _hit(parts: dict) -> bool:
        try:
            return int(parts.get(field)) in keep
        except (TypeError, ValueError):  # zero-padded dirs parse; junk doesn't
            return False

    try:
        return ray.data.read_parquet(
            index_path, file_extensions=["parquet"],  # skip _COMPLETE markers
            partition_filter=PathPartitionFilter.of(
                _hit, field_names=[field], base_dir=index_path))
    except ValueError:  # "not enough values to unpack": zero files matched
        return None


def lsh_topk_indexed(index_path: str, query_ids: list[int], k: int = 5,
                     bits: int = 8, seed: int = 11) -> pd.DataFrame:
    """lsh_topk over a materialized index: reads ONLY the partitions whose
    bucket matches a query code (partition-pruned ``read_parquet``), scores
    each candidate against the queries sharing its bucket. Identical output
    to the inline ``lsh_topk`` with the same (bits, seed)."""
    import ray.data

    q = _select_queries(
        ray.data.read_parquet(index_path, columns=["vec_id", "embedding"]),
        query_ids)
    qmat = _mat(q["embedding"])
    lsh = LshBuckets(dim=qmat.shape[1], bits=bits, seed=seed)
    qcodes = lsh.code(qmat)
    qn = _qnormalize(qmat)
    qids = q["vec_id"].to_numpy()
    bundle_ref = ray.put((qids, qn, qcodes))

    cand = _pruned_read(index_path, "bucket_dir", np.unique(qcodes))
    if cand is None:  # unreachable for in-index queries; defensive
        return _finalize_topk(_EMPTY_TOPK.copy(), k)

    class IndexedScore:
        def __init__(self) -> None:
            self.qids, self.qn, self.qcodes = ray.get(bundle_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _mat(batch["embedding"])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            vec_ids = batch["vec_id"].to_numpy()
            codes = batch["bucket"].to_numpy().astype(np.int64)
            out = []
            for qi in range(len(self.qids)):
                mask = codes == self.qcodes[qi]
                if not mask.any():
                    continue
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    "neighbor_id": vec_ids[mask],
                    "sim": mn[mask] @ self.qn[qi]}))
            return pd.concat(out) if out else pd.DataFrame(
                {"query_id": pd.array([], dtype="int64"),
                 "neighbor_id": pd.array([], dtype="int64"),
                 "sim": pd.array([], dtype="float64")})

    return _finalize_topk(
        cand.map_batches(IndexedScore, batch_format="pandas",
                         concurrency=(1, 12), batch_size=4096).to_pandas(), k)


def ivf_index(emb_ds, path: str, n_cells: int = 16,
              kmeans_iters: int = 5) -> str:
    """Materialize the IVF inverted file: (vec_id, embedding) partitioned by
    the k-means cell, plus a ``_centroids.parquet`` sidecar."""
    import os

    import pyarrow.parquet as pq

    from .kmeans import kmeans, nearest_cell

    cents, _, _ = kmeans(emb_ds, k=n_cells, iterations=kmeans_iters)
    # cells are recomputed per batch from the broadcast (k, d) centroids
    # (identical argmin rule as the kmeans assignment) — no O(N) lut
    cents_ref = ray.put(cents)

    def add_cell(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # Ray Data can emit zero-row blocks
            empty = pa.array([], pa.int64())
            return pa.table({"vec_id": t["vec_id"], "embedding": t["embedding"],
                             "cell": empty, "cell_dir": empty})
        C = ray.get(cents_ref)
        cell, _ = nearest_cell(_mat(t["embedding"].to_pylist()), C)
        return pa.table({"vec_id": t["vec_id"], "embedding": t["embedding"],
                         "cell": pa.array(cell.astype(np.int64)),
                         "cell_dir": pa.array(cell.astype(np.int64))})

    from .export import write_partitioned

    write_partitioned(emb_ds.map_batches(add_cell, batch_format="pyarrow"),
                      path, "cell_dir")
    pq.write_table(pa.table({"cell": pa.array(np.arange(len(cents)), pa.int64()),
                             "centroid": pa.array(list(cents))}),
                   os.path.join(path, "_centroids.parquet"))
    return path


def ivf_topk_indexed(index_path: str, query_ids: list[int], k: int = 5,
                     n_probe: int = 4) -> pd.DataFrame:
    """ivf_topk over a materialized inverted file: reads ONLY the n_probe
    nearest cells' partitions per query."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    ct = pq.read_table(os.path.join(index_path, "_centroids.parquet"))
    cents = _mat(ct["centroid"].to_pylist())
    q = _select_queries(
        ray.data.read_parquet(index_path, columns=["vec_id", "embedding"]),
        query_ids)
    qids = q["vec_id"].to_numpy()
    qmat = _mat(q["embedding"])
    qn = _qnormalize(qmat)
    d2 = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1)[:, :n_probe]
    bundle_ref = ray.put((qids, qn, probes))

    cand = _pruned_read(index_path, "cell_dir", np.unique(probes))
    if cand is None:  # unreachable for in-index queries; defensive
        return _finalize_topk(_EMPTY_TOPK.copy(), k)

    class IndexedCellScore:
        def __init__(self) -> None:
            self.qids, self.qn, self.probes = ray.get(bundle_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _mat(batch["embedding"])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            vec_ids = batch["vec_id"].to_numpy()
            cells = batch["cell"].to_numpy().astype(np.int64)
            out = []
            for qi in range(len(self.qids)):
                mask = np.isin(cells, self.probes[qi])
                if not mask.any():
                    continue
                out.append(pd.DataFrame({
                    "query_id": self.qids[qi],
                    "neighbor_id": vec_ids[mask],
                    "sim": mn[mask] @ self.qn[qi]}))
            return pd.concat(out) if out else pd.DataFrame(
                {"query_id": pd.array([], dtype="int64"),
                 "neighbor_id": pd.array([], dtype="int64"),
                 "sim": pd.array([], dtype="float64")})

    return _finalize_topk(
        cand.map_batches(IndexedCellScore, batch_format="pandas",
                         concurrency=(1, 12), batch_size=4096).to_pandas(), k)


def knn_graph(emb_ds, k: int = 10, n_buckets: int | None = None):
    """EXACT cosine k-nearest-neighbor graph → Dataset (vec_id, nbr_id,
    sim, rank): the similarity-search ↔ graph-engine bridge (feed the edges
    to ``build_graph`` and every toolkit algorithm runs on the semantic
    graph).

    Same bucketed grid self-join as :func:`embedding_near_dups` — each cell
    scores bucket-i × bucket-j with a chunked block matmul — but instead of
    thresholding, each cell emits a per-ROW partial top-k for BOTH sides
    (≤ k rows per vector per cell), and one bucketed per-vec merge reduces
    the B partials to the global top-k. Exchange O(B·N + N·B·k) rows; no
    driver state. Determinism: candidates are ranked by
    ``(-round6(sim), nbr_id)`` at BOTH the cell and merge stages, so the
    result is independent of bucket count and block order.
    """
    from ..ids import integer_mix, round_half_away
    from .agg import coalesce_small

    # Total matmul work is N²·D/2 regardless of B, but parallelism equals
    # the number of grid cells B(B+1)/2 — so B floors at 12 (78 cells keep a
    # 32-core node saturated) and grows with N to bound per-cell memory
    # ((N/B)·D·8 bytes per side).
    N = emb_ds.count()
    B = n_buckets or int(max(12, min(64, -(-N // 50_000))))

    def emit(t: pa.Table) -> pa.Table:
        vid = np.asarray(t["vec_id"]).astype(np.int64, copy=False)
        bkt = (integer_mix(vid.view(np.uint64)) % np.uint64(B)).astype(np.int64)
        jj = np.arange(B, dtype=np.int64)[None, :]
        lo = np.minimum(bkt[:, None], jj)
        hi = np.maximum(bkt[:, None], jj)
        cells = (lo * B + hi).ravel()
        idx = np.repeat(np.arange(len(vid), dtype=np.int64), B)
        rep = t.take(pa.array(idx))
        return rep.append_column("cell", pa.array(cells))

    grid = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        emit, batch_format="pyarrow")

    def _side_topk(ids_q, mn_q, ids_c, mn_c, drop_self):
        """Per-row partial top-k of queries vs candidates. The ranking key
        ``(-round6(sim), nbr_id)`` is packed EXACTLY into one int64
        (``(1.1e6 - sim*1e6) << 32 | candidate_index``; candidates are
        pre-sorted by id so index order == id order), so an O(m)
        ``argpartition`` + an O(k log k) sort of the survivors replaces the
        full-width O(m log m) argsort — the matmul, not the selection, now
        dominates each cell."""
        frames = []
        kk = min(k, len(ids_c) - (1 if drop_self else 0))
        if kk <= 0:
            return frames
        SENT = np.int64(1) << np.int64(62)
        jcol = np.arange(len(ids_c), dtype=np.int64)
        step = max(1, int(4_000_000 // max(1, len(ids_c))))
        for s in range(0, len(ids_q), step):
            sims = round_half_away(mn_q[s:s + step] @ mn_c.T, 6)
            s6 = np.rint(sims * 1e6).astype(np.int64)
            keys = ((np.int64(1_100_000) - s6) << np.int64(32)) | jcol
            if drop_self:
                self_pos = np.searchsorted(ids_c, ids_q[s:s + step])
                rows = np.arange(keys.shape[0])
                ok = (self_pos < len(ids_c)) & (ids_c[np.minimum(
                    self_pos, len(ids_c) - 1)] == ids_q[s:s + step])
                keys[rows[ok], self_pos[ok]] = SENT
            cand = np.argpartition(keys, kk - 1, axis=1)[:, :kk]
            ck = np.take_along_axis(keys, cand, axis=1)
            order = np.argsort(ck, axis=1, kind="stable")
            cols = np.take_along_axis(cand, order, axis=1).ravel()
            rows = np.repeat(np.arange(keys.shape[0]), kk)
            good = keys[rows, cols] < SENT
            frames.append(pd.DataFrame({
                "vec_id": ids_q[s:s + step][rows[good]],
                "nbr_id": ids_c[cols[good]],
                "sim": sims[rows[good], cols[good]]}))
        return frames

    def cell_topk(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        i, j = divmod(cell, B)
        vid = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(vid, kind="stable")
        vid = vid[order]
        m = _mat(g["embedding"].iloc[order])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        bkt = (integer_mix(vid.view(np.uint64)) % np.uint64(B)).astype(np.int64)
        if i == j:
            frames = _side_topk(vid, mn, vid, mn, drop_self=True)
        else:
            si, sj = bkt == i, bkt == j
            frames = (_side_topk(vid[si], mn[si], vid[sj], mn[sj], False)
                      + _side_topk(vid[sj], mn[sj], vid[si], mn[si], False))
        return pd.concat(frames) if frames else pd.DataFrame(
            {"vec_id": pd.array([], dtype="int64"),
             "nbr_id": pd.array([], dtype="int64"),
             "sim": pd.array([], dtype="float64")})

    part = grid.groupby("cell").map_groups(cell_topk, batch_format="pandas")
    nb = max(8, B)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bkt"] = (integer_mix(df["vec_id"].to_numpy().astype(np.int64)
                                  .view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vec_id", "sim", "nbr_id"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby("vec_id", sort=False).head(k).reset_index(drop=True)
        g["rank"] = g.groupby("vec_id", sort=False).cumcount().astype(np.int64)
        return g[["vec_id", "nbr_id", "sim", "rank"]]

    return (coalesce_small(part.map_batches(tag, batch_format="pandas"))
            .groupby("_bkt").map_groups(merge, batch_format="pandas"))


def semantic_clusters(emb_ds, k: int = 10, threshold: float = 0.6,
                      n_buckets: int | None = None,
                      num_partitions: int = 8, result: str = "pandas"):
    """Semantic clustering = connected components of the thresholded kNN
    graph → (vec_id, cluster) with cluster = min member vec_id; vectors
    with no qualifying neighbor come back as singletons.

    Scale shape: the knn edges stream into the graph ingress as a
    Dataset; the CC labels come back as a Dataset built straight from the
    engine's final range chunks (``run_connected_components(result=
    "dataset")``), and the singleton fill-in is a hash-bucketed co-located
    join of the id column against the label table — no O(N) id or label
    array ever touches the driver. ``result="dataset"`` returns the
    joined (vec_id, cluster) Dataset; the default ``"pandas"`` gathers it
    sorted by vec_id (legacy small-result API)."""
    import pyarrow.compute as pc

    from ..graph.algorithms import run_connected_components
    from ..graph.gas import build_graph
    from ..ids import integer_mix

    knn = knn_graph(emb_ds, k=k, n_buckets=n_buckets)

    def to_edges(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t["sim"], pa.scalar(threshold)))
        a = np.asarray(keep["vec_id"], np.int64)
        b = np.asarray(keep["nbr_id"], np.int64)
        m = a != b
        return pa.table({"src": pa.array(a[m].astype(np.uint64), pa.uint64()),
                         "dst": pa.array(b[m].astype(np.uint64), pa.uint64())})

    # materialized: both the emptiness check and build_graph consume it —
    # unmaterialized, the whole kNN grid self-join would re-execute twice
    edges = knn.map_batches(to_edges, batch_format="pyarrow").materialize()
    ids_ds = emb_ds.select_columns(["vec_id"])
    if edges.count() == 0:
        def singletons(t: pa.Table) -> pa.Table:
            v = np.asarray(t["vec_id"], np.int64)
            return pa.table({"vec_id": pa.array(v), "cluster": pa.array(v)})

        out = ids_ds.map_batches(singletons, batch_format="pyarrow")
        return (out.to_pandas().sort_values("vec_id")
                .reset_index(drop=True) if result == "pandas" else out)
    g = build_graph(edges, num_partitions=num_partitions, dedup=True)
    labels_ds, _ = run_connected_components(g, result="dataset")
    nb = 16

    def tag_ids(t: pa.Table) -> pa.Table:
        v = np.asarray(t["vec_id"], np.int64)
        return pa.table({
            "_bkt": pa.array((integer_mix(v.view(np.uint64))
                              % np.uint64(nb)).astype(np.int64)),
            "v": pa.array(v),
            "lab": pa.array(np.full(len(v), -1, np.int64))})

    def tag_labels(t: pa.Table) -> pa.Table:
        v = np.asarray(t["vid"], np.uint64).astype(np.int64)
        return pa.table({
            "_bkt": pa.array((integer_mix(v.view(np.uint64))
                              % np.uint64(nb)).astype(np.int64)),
            "v": pa.array(v),
            "lab": pa.array(np.asarray(t["label"], np.uint64).astype(np.int64))})

    def join(gdf: pd.DataFrame) -> pd.DataFrame:
        lmask = gdf["lab"].to_numpy() >= 0
        lv = gdf.loc[lmask, "v"].to_numpy(np.int64)
        ll = gdf.loc[lmask, "lab"].to_numpy(np.int64)
        o = np.argsort(lv, kind="stable")
        lv, ll = lv[o], ll[o]
        qv = gdf.loc[~lmask, "v"].to_numpy(np.int64)
        out = qv.copy()  # default: own singleton cluster
        if len(lv):
            pos = np.searchsorted(lv, qv)
            ok = (pos < len(lv)) & (lv[np.minimum(pos, len(lv) - 1)] == qv)
            out[ok] = ll[pos[ok]]
        return pd.DataFrame({"vec_id": qv, "cluster": out})

    joined = (ids_ds.map_batches(tag_ids, batch_format="pyarrow")
              .union(labels_ds.map_batches(tag_labels, batch_format="pyarrow"))
              .groupby("_bkt").map_groups(join, batch_format="pandas"))
    if result == "pandas":
        return joined.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return joined
