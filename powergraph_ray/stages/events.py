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
    ``groupby(user).map_groups`` with a vectorized in-group kernel (the
    partitioning assumption: one user's events fit in one group, which holds
    because sessions are per-entity and entities are small relative to the
    stream — the standard sessionization contract)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy()
        new = np.ones(len(ts), bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        sizes = np.bincount(sid)
        start = ts[new]                      # first event of each session
        end = ts[np.append(new[1:], True)]   # last event (ts sorted in-group)
        dur_min = ((end - start) / np.timedelta64(60, "s")).astype(np.float64)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": np.int64(len(sizes)),
            "longest_session_events": np.int64(sizes.max()),
            "max_session_minutes": np.float64(dur_min.max()),
        })

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def asof_join(events_ds, left_type: str = "click", right_type: str = "purchase"):
    """Per-key as-of join expressed inside one keyed shuffle: for every
    ``left_type`` event, attach the most recent ``right_type`` event of the
    same user at-or-before its timestamp (ties: highest event_id wins, the
    deterministic "latest" row).

    → (event_id, user_id, ts, asof_event_id, asof_value) — sentinel
    (-1, 0.0) when no prior right-side event exists (a null-free contract so
    results value-hash cleanly). The in-group kernel is a vectorized merge
    (sort + searchsorted), not a row loop; the partitioning assumption is
    the sessionization contract (one user's events fit in a group).
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
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
        lt = left["ts"].to_numpy()
        rt = right["ts"].to_numpy()
        # index of last right row with rt <= lt (rows sorted by (ts, id) so
        # the last one in a tie run has the highest event_id)
        idx = np.searchsorted(rt, lt, side="right") - 1
        has = idx >= 0
        aid = np.full(len(lt), -1, np.int64)
        aval = np.zeros(len(lt), np.float64)
        if has.any():
            aid[has] = right["event_id"].to_numpy()[idx[has]]
            aval[has] = right["value"].to_numpy()[idx[has]]
        return pd.DataFrame({
            "event_id": left["event_id"].to_numpy(),
            "user_id": left["user_id"].to_numpy(),
            "ts": left["ts"].to_numpy(),
            "asof_event_id": aid,
            "asof_value": aval,
        })

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


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
