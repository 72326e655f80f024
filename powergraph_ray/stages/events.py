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
from ray.data.aggregate import Count, Max, Min, Sum


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

    return (
        events_ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    )


def user_activity(events_ds):
    """Per-user grouped aggregate: (user_id, n_events, sum_value, first_ts, last_ts)."""
    return events_ds.groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Min("ts", alias_name="first_ts"),
        Max("ts", alias_name="last_ts"),
    )
