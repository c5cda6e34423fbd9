"""Stream-shaped aggregates over an ordered event log.

Ray Data is a batch engine with no event-time watermarks (the reference is
strictly batch too — SURVEY.md §2.12); stream semantics are expressed as
partition-by-key + sort-within-group over the ``ts`` column:

- ``tumbling_window``: floor(ts, size) per key — a pure groupby aggregate
  (each window is closed because the input is a complete log);
- ``sessionize``: gap-based sessions per user via ``groupby(user).map_groups``
  over the ts-sorted group (state never crosses the key boundary, so this
  parallelizes per user).

Ordering assumption: within one group, events are sorted by ``ts`` inside the
kernel itself — no global sort needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data
from bluegraph_ray.util import hash_aggregate


def tumbling_window(
    events: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    freq: str = "h",
) -> "ray.data.Dataset":
    """-> (key, window_start, n_events, sum_value) per tumbling window."""

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: batch[key_col],
                "window_start": batch[ts_col].dt.floor(freq),
                value_col: batch[value_col],
            }
        )

    w = events.select_columns([ts_col, key_col, value_col]).map_batches(
        assign, batch_format="pandas", batch_size=None)
    out = hash_aggregate(
        w, [key_col, "window_start"],
        {"n_events": (None, "count"), "sum_value": (value_col, "sum")},
    )

    def round_sum(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_value"] = np.round(batch["sum_value"], 6)
        return batch

    return out.map_batches(round_sum, batch_format="pandas", batch_size=None)


def sessionize(
    events: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> "ray.data.Dataset":
    """-> (user_id, session_id, n_events, session_start, session_end).

    A new session starts when the gap to the previous event of the same user
    exceeds ``gap_minutes``. session_id is 1-based per user in ts order
    (deterministic)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col, kind="mergesort")
        new = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        sid = new.cumsum()
        agg = g.groupby(sid).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        )
        agg = agg.reset_index(drop=True)
        agg.insert(0, "session_id", np.arange(1, len(agg) + 1, dtype=np.int64))
        agg.insert(0, key_col, g[key_col].iloc[0])
        return agg

    return events.select_columns([key_col, ts_col]).groupby(key_col).map_groups(
        per_user, batch_format="pandas"
    )
