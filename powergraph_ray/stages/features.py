"""Graph × embedding feature fusion — GNN-prep aggregation stages.

``neighborhood_mean_embedding`` is the one-hop GraphSAGE-mean aggregation
(Hamilton et al. 2017): each vertex's feature becomes the mean of its
neighbors' embedding vectors — the standard "feature smoothing" /
message-passing precompute for training GNNs or for propagating document
embeddings along a link graph.

Scale shape: NO broadcast of the embedding table (it is corpus-sized).
Stage 1 is a bucket join — edges and embedding rows are co-bucketed by the
join-side vertex hash, and each bucket emits one pre-reduced partial-sum
vector per (bucket, target) pair (searchsorted lookup + lexsort +
``add.reduceat``, all C-level). Stage 2 is a second bucketed merge keyed by
the target vertex that sums the ≤ n_buckets partials and divides by the
neighbor count. Exchange is O(E + N·d) rows; a hot (high in-degree) target
receives at most n_buckets partial rows, mirroring the vertex-cut
pre-reduction of the GAS gather (pre_local_gather,
ivertex_program.hpp:729-765). Vectors ride the shuffles as raw float64
bytes (uniform object columns, the dedup bucket-join encoding) because
mixed None/ndarray object columns break the pandas-block sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..ids import integer_mix, round_half_away

__all__ = ["neighborhood_mean_embedding"]


def _bkt(ids: np.ndarray, n: int) -> np.ndarray:
    return (integer_mix(ids.astype(np.int64).view(np.uint64))
            % np.uint64(n)).astype(np.int64)


def _unpack(col: pd.Series) -> np.ndarray:
    """bytes column (one float64-packed vector per row) → (n, d) matrix."""
    return np.stack([np.frombuffer(b, np.float64) for b in col.to_numpy()])


def neighborhood_mean_embedding(edges_ds, emb_ds, direction: str = "in",
                                n_buckets: int = 32, id_col: str = "vec_id"):
    """→ Dataset (vid, i, val): per-vertex mean of neighbor embeddings,
    unnested to (vertex, 1-based dim, round6(mean)) rows (the
    embedding_rownorm output convention).

    ``direction="in"``: vid = edge dst, averaged over its in-neighbors'
    (src) embeddings; ``"out"``: vid = src over out-neighbors (dst).
    Edges whose neighbor has no embedding row contribute nothing; vertices
    with zero matched neighbors are absent from the output.
    """
    join_key, out_key = ("src", "dst") if direction == "in" else ("dst", "src")

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        j = df[join_key].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "bucket": _bkt(j, n_buckets), "jid": j,
            "oid": df[out_key].to_numpy().astype(np.int64),
            "vec": np.full(len(j), b"", object)})

    def tag_emb(df: pd.DataFrame) -> pd.DataFrame:
        j = df[id_col].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "bucket": _bkt(j, n_buckets), "jid": j,
            "oid": np.full(len(j), -1, np.int64),
            "vec": [np.asarray(v, np.float64).tobytes()
                    for v in df["embedding"]]})

    tagged = (edges_ds.map_batches(tag_edges, batch_format="pandas")
              .union(emb_ds.map_batches(tag_emb, batch_format="pandas")))

    _EMPTY = pd.DataFrame({"oid": pd.array([], dtype="int64"),
                           "psum": pd.array([], dtype=object),
                           "cnt": pd.array([], dtype="int64")})

    def partial_sums(g: pd.DataFrame) -> pd.DataFrame:
        is_emb = g["oid"].to_numpy() == -1
        if not is_emb.any() or is_emb.all():
            return _EMPTY
        eids = g["jid"].to_numpy()[is_emb].astype(np.int64)
        mat = _unpack(g["vec"][is_emb])
        order = np.argsort(eids, kind="stable")
        eids, mat = eids[order], mat[order]
        jid = g["jid"].to_numpy()[~is_emb].astype(np.int64)
        oid = g["oid"].to_numpy()[~is_emb].astype(np.int64)
        pos = np.searchsorted(eids, jid)
        ok = (pos < len(eids)) & (eids[np.minimum(pos, len(eids) - 1)] == jid)
        rows, oid = pos[ok], oid[ok]
        if not len(rows):
            return _EMPTY
        so = np.lexsort((rows, oid))  # fixed order → deterministic sums
        rows, oid = rows[so], oid[so]
        starts = np.flatnonzero(np.r_[True, oid[1:] != oid[:-1]])
        sums = np.add.reduceat(mat[rows], starts, axis=0)
        cnts = np.diff(np.r_[starts, len(oid)])
        return pd.DataFrame({"oid": oid[starts],
                             "psum": [s.tobytes() for s in sums],
                             "cnt": cnts.astype(np.int64)})

    part = tagged.groupby("bucket").map_groups(partial_sums,
                                               batch_format="pandas")

    def tag_out(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket2"] = _bkt(df["oid"].to_numpy().astype(np.int64), n_buckets)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        oid = g["oid"].to_numpy().astype(np.int64)
        mat = _unpack(g["psum"])
        cnt = g["cnt"].to_numpy().astype(np.int64)
        order = np.argsort(oid, kind="stable")
        oid, mat, cnt = oid[order], mat[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, oid[1:] != oid[:-1]])
        sums = np.add.reduceat(mat, starts, axis=0)
        n = np.add.reduceat(cnt, starts)
        mean = round_half_away(sums / n[:, None], 6)
        u, d = mean.shape
        return pd.DataFrame({
            "vid": np.repeat(oid[starts], d),
            "i": np.tile(np.arange(1, d + 1, dtype=np.int64), u),
            "val": mean.ravel()})

    return (part.map_batches(tag_out, batch_format="pandas")
            .groupby("bucket2").map_groups(merge, batch_format="pandas"))
