"""Windowed aggregates over the ``events`` stream table.

Ray Data is a batch engine (the reference is batch-only too, SURVEY.md §2.7);
stream-shaped operators are expressed as partial-aggregated groupbys over
(key, window-bucket): per-batch partial sums inside ``map_batches``, then the
small grouped final — only one row per (key, window) per batch crosses the
shuffle. Ordering assumption: tumbling windows need no intra-window order;
session windows (not needed by the reference) would sort within groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import bucketed_agg


def tumbling_window_agg(events_ds, window: str = "1h"):
    """→ (event_type, window_start, n_events, sum_value) per tumbling window."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({
            "event_type": batch["event_type"],
            "window_start": batch["ts"].dt.floor(window),
            "value": batch["value"],
        })
        g = b.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        return g

    return bucketed_agg(
        events_ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "window_start"],
        {"n_events": ("n_events", "sum"), "sum_value": ("sum_value", "sum")})


def sessionize(events_ds, gap_minutes: int = 30):
    """Session windows per user: events sorted by (ts, event_id) within each
    user; a new session starts when the gap to the previous event exceeds
    ``gap_minutes``. → (user_id, n_sessions, longest_session_events,
    max_session_minutes) — a streaming-window custom operator expressed as
    ONE coarse user-bucket shuffle + a run-segmented lexsort kernel per
    bucket (one Python call per BUCKET, not per user — millions of users
    would otherwise mean millions of singleton-group calls). Partitioning
    assumption: one bucket's events fit a worker; raise the bucket count
    for bigger streams."""
    gap = np.timedelta64(gap_minutes * 60, "s")
    NBK = np.uint64(64)  # coarse user buckets: one vectorized kernel per
    # bucket instead of one Python call per user (the singleton-group trap)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        from ..ids import integer_mix

        uid = b["user_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "bkt": (integer_mix(uid.view(np.uint64)) % NBK).astype(np.int64),
            "user_id": uid, "ts": b["ts"].to_numpy(),
            "event_id": b["event_id"].to_numpy(np.int64)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        # session runs: break on user change or gap > threshold
        new = np.r_[True, (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap)]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(ts)]
        run_user = uid[starts]
        run_len = (ends - starts).astype(np.int64)
        dur_min = ((ts[ends - 1] - ts[starts])
                   / np.timedelta64(60, "s")).astype(np.float64)
        # per-user reductions over the user-contiguous session runs
        ustarts = np.flatnonzero(np.r_[True, run_user[1:] != run_user[:-1]])
        return pd.DataFrame({
            "user_id": run_user[ustarts],
            "n_sessions": np.diff(np.append(ustarts, len(run_user))).astype(np.int64),
            "longest_session_events": np.maximum.reduceat(run_len, ustarts),
            "max_session_minutes": np.maximum.reduceat(dur_min, ustarts),
        })

    return (events_ds.map_batches(tag, batch_format="pandas")
            .groupby("bkt").map_groups(per_bucket, batch_format="pandas"))


def asof_join(events_ds, left_type: str = "click", right_type: str = "purchase"):
    """Per-key as-of join expressed inside one keyed shuffle: for every
    ``left_type`` event, attach the most recent ``right_type`` event of the
    same user at-or-before its timestamp (ties: highest event_id wins, the
    deterministic "latest" row).

    → (event_id, user_id, ts, asof_event_id, asof_value) — sentinel
    (-1, 0.0) when no prior right-side event exists (a null-free contract so
    results value-hash cleanly). One coarse user-bucket shuffle; each bucket
    joins ALL its users in one C-level ``pd.merge_asof(by=user)`` call —
    not one Python call per user. Partitioning assumption: one bucket's
    events fit a worker.
    """

    NBK = np.uint64(64)  # coarse user buckets (not one Python call per user)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        from ..ids import integer_mix

        uid = b["user_id"].to_numpy(np.int64)
        out = b[["event_id", "user_id", "ts", "event_type", "value"]].copy()
        out["bkt"] = (integer_mix(uid.view(np.uint64)) % NBK).astype(np.int64)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(
            ["ts", "event_id"], kind="stable")
        right = g[g["event_type"] == right_type].sort_values(
            ["ts", "event_id"], kind="stable")
        if len(left) == 0:
            return pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                                 "user_id": pd.array([], dtype="int64"),
                                 "ts": pd.array([], dtype="datetime64[us]"),
                                 "asof_event_id": pd.array([], dtype="int64"),
                                 "asof_value": pd.array([], dtype="float64")})
        # pandas' C as-of kernel joins EVERY user in the bucket in one call;
        # right sorted by (ts, event_id) → backward match at equal ts picks
        # the last row = highest event_id, the deterministic "latest"
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["user_id", "ts", "event_id", "value"]].rename(
                columns={"event_id": "asof_event_id", "value": "asof_value"}),
            on="ts", by="user_id", direction="backward")
        return pd.DataFrame({
            "event_id": m["event_id"].to_numpy(np.int64),
            "user_id": m["user_id"].to_numpy(np.int64),
            "ts": m["ts"].to_numpy(),
            "asof_event_id": m["asof_event_id"].fillna(-1).to_numpy(np.int64),
            "asof_value": m["asof_value"].fillna(0.0).to_numpy(np.float64),
        })

    return (events_ds.map_batches(tag, batch_format="pandas")
            .groupby("bkt").map_groups(per_bucket, batch_format="pandas"))


def time_range_count(events_ds, window_s: int = 120):
    """Banded range join (non-equi): for every event, the number of OTHER
    events (any user) with |Δts| <= window, inclusive.

    The scale pattern for range joins without an equi key: time is cut into
    buckets of width 2·window; each event probes from its own bucket and is
    replicated as a candidate into the bucket and both neighbors (≤3×
    replication, independent of data size), so every |Δts| <= window pair
    co-locates in exactly one probe bucket. The in-bucket kernel is a sorted
    searchsorted window count — no pairwise materialization.

    → (event_id, n_nearby int64).
    """
    W = 2 * window_s
    w_us = np.int64(window_s * 1_000_000)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = batch["event_id"].to_numpy(np.int64)
        b = ts // (W * 1_000_000)
        frames = [pd.DataFrame({"bucket": b, "role": np.int64(0),
                                "event_id": eid, "ts_us": ts})]
        for db in (-1, 0, 1):
            frames.append(pd.DataFrame({"bucket": b + db, "role": np.int64(1),
                                        "event_id": eid, "ts_us": ts}))
        return pd.concat(frames, ignore_index=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        probes = g[g["role"] == 0]
        if len(probes) == 0:
            return pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                                 "n_nearby": pd.array([], dtype="int64")})
        cand = np.sort(g.loc[g["role"] == 1, "ts_us"].to_numpy(np.int64))
        t = probes["ts_us"].to_numpy(np.int64)
        n = (np.searchsorted(cand, t + w_us, side="right")
             - np.searchsorted(cand, t - w_us, side="left")
             - 1)  # each event is its own candidate exactly once
        return pd.DataFrame({"event_id": probes["event_id"].to_numpy(np.int64),
                             "n_nearby": n.astype(np.int64)})

    return (events_ds.map_batches(explode, batch_format="pandas")
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))


def user_activity(events_ds):
    """Per-user grouped aggregate: (user_id, n_events, sum_value, first_ts, last_ts)."""
    return bucketed_agg(events_ds, ["user_id"], {
        "n_events": (None, "count"),
        "sum_value": ("value", "sum"),
        "first_ts": ("ts", "min"),
        "last_ts": ("ts", "max"),
    })
