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
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """-> (user_id, session_id, n_events, session_start, session_end).

    A new session starts when the gap to the previous event of the same user
    exceeds ``gap_minutes``. session_id is 1-based per user in ts order
    (deterministic).

    Keys co-locate by hash(key) % num_buckets (a key's events meet in exactly
    one bucket) and each bucket sessionizes ALL its users in one vectorized
    pass — sort by (key, ts), one diff, one cumsum, one groupby-agg — so the
    work per group is O(bucket), not O(users) Python calls. Ray's per-group
    Python groupby would be the bottleneck at 10^9-user scale.
    ``num_buckets`` is the reduce parallelism — size it to the cluster,
    same dial as asof_join/interval_join."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[key_col], index=False).to_numpy()
        return pd.DataFrame({
            key_col: batch[key_col],
            ts_col: batch[ts_col],
            "_bucket": (h % num_buckets).astype(np.int64),
        })

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col], kind="mergesort")
        ts = g[ts_col]
        key = g[key_col].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[:1] = True
        new_key[1:] = key[1:] != key[:-1]
        new = new_key | (ts.diff() > gap).to_numpy()
        sid = np.cumsum(new)  # global session index within the bucket
        frame = pd.DataFrame({key_col: key, "_sid": sid, ts_col: ts.to_numpy()})
        agg = frame.groupby("_sid", sort=True).agg(
            **{key_col: (key_col, "first")},
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index()
        # per-user 1-based ids: global sid minus the user's first sid
        first = agg.groupby(key_col, sort=False)["_sid"].transform("min")
        agg.insert(1, "session_id",
                   (agg["_sid"] - first + 1).astype(np.int64))
        return agg.drop(columns=["_sid"])[
            [key_col, "session_id", "n_events", "session_start", "session_end"]]

    tagged = events.select_columns([key_col, ts_col]).map_batches(
        tag, batch_format="pandas", batch_size=None)
    return tagged.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def sliding_window(
    events: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    size: str = "1h",
    slide: str = "15min",
) -> "ray.data.Dataset":
    """-> (key, window_start, n_events, sum_value) per SLIDING window
    [window_start, window_start + size), stepping by ``slide``.

    ``slide`` must divide ``size``; each event belongs to exactly
    size/slide windows, materialized map-side as k rows per event (a pure
    vectorized repeat — no state), then the same partial-aggregating
    shuffle as tumbling_window. At scale the map-side combine collapses the
    k-fold blow-up to at most (keys x windows) rows per batch before the
    exchange."""
    size_td, slide_td = pd.Timedelta(size), pd.Timedelta(slide)
    k = size_td // slide_td
    if k * slide_td != size_td:
        raise ValueError(f"slide {slide!r} must divide size {size!r}")
    offsets = slide_td * np.arange(k)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch[ts_col].dt.floor(slide).to_numpy()
        n = len(batch)
        # timedelta arithmetic promotes to ns; keep the input's unit so the
        # output dtype round-trips (parquet timestamps are us)
        ws = (np.repeat(base, k) - np.tile(offsets, n)).astype(base.dtype)
        return pd.DataFrame(
            {
                key_col: np.repeat(batch[key_col].to_numpy(), k),
                "window_start": ws,
                value_col: np.repeat(batch[value_col].to_numpy(), k),
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


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    num_buckets: int = 64,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Partitioned as-of join: each left row picks the latest right row with
    ``right.on <= left.on`` (direction="backward"; "forward" = earliest
    right.on >= left.on) within the same ``by`` key — DuckDB `ASOF JOIN`
    semantics, oracle-verified.

    Layout mirrors util.hash_join: tag side -> bucket by hash(by) -> one
    ``pandas.merge_asof`` per bucket over the on-sorted halves. A key's rows
    always meet in exactly one bucket, so only one bucket pair is in memory
    per task and both inputs stream. Right-side ties on (by, on) should be
    pre-aggregated away by the caller (the match among equal timestamps is
    otherwise positional)."""
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)

    def tag(side: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            h = pd.util.hash_pandas_object(batch[by], index=False).to_numpy()
            batch["_bucket"] = (h % num_buckets).astype(np.int64)
            batch["_side"] = side
            return batch

        return f

    both = left.map_batches(tag("l"), batch_format="pandas", batch_size=None).union(
        right.map_batches(tag("r"), batch_format="pandas", batch_size=None)
    )

    rename = {c: c + suffix for c in right_cols
              if c in left_cols and c not in (on, by)}
    out_cols = left_cols + [rename.get(c, c) for c in right_cols
                            if c not in (on, by)]

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        l = (group[group["_side"] == "l"].reindex(columns=left_cols)
             .sort_values(on, kind="mergesort"))
        r = (group[group["_side"] == "r"].reindex(columns=right_cols)
             .sort_values(on, kind="mergesort"))
        if not len(l):
            # schema must be stable across groups even when a bucket holds
            # only right-side rows
            return pd.DataFrame(columns=out_cols)
        if not len(r):
            # reindex gave the empty right half object dtypes, which
            # merge_asof rejects; the join result is just left + NaNs
            return l.reindex(columns=out_cols)
        return pd.merge_asof(l, r.rename(columns=rename), on=on, by=by,
                             direction=direction)[out_cols]

    return both.groupby("_bucket").map_groups(merge, batch_format="pandas")


def interval_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str = "ts",
    by: str = "user_id",
    start: str = "session_start",
    end: str = "session_end",
    how: str = "inner",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Range join: each left row matches the right interval [start, end]
    containing ``on``, within the same ``by`` key. Intervals must be
    non-overlapping per key (session tables are by construction).

    Reduction: the containing interval is exactly the LATEST interval whose
    ``start <= on`` (as-of backward match), kept only if ``on <= end`` —
    so the whole range join rides the hash-partitioned merge_asof and adds
    one vectorized containment filter. ``how="left"`` keeps unmatched left
    rows with nulls."""
    renamed = right.map_batches(
        lambda b: b.rename(columns={start: on}) if start != on else b,
        batch_format="pandas", batch_size=None)
    out = asof_join(left, renamed, on=on, by=by, direction="backward",
                    num_buckets=num_buckets)

    left_cols = set(left.schema().names)

    def contain(batch: pd.DataFrame) -> pd.DataFrame:
        ok = batch[end].notna() & (batch[on] <= batch[end])
        if how == "inner":
            return batch[ok]
        # left join: blank the right-side columns of non-contained rows
        right_side = [c for c in batch.columns if c not in left_cols]
        batch = batch.copy()
        batch.loc[~ok, right_side] = pd.NA
        return batch

    return out.map_batches(contain, batch_format="pandas", batch_size=None)


def rolling_window(
    events: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 5,
) -> "ray.data.Dataset":
    """Per-key ROW-based rolling aggregate over the last ``k`` rows ordered
    by (ts, id): -> (key, id, roll_n, roll_sum, roll_avg). The streaming
    analog of SQL's ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` window —
    the per-entity feature (EWMA/rolling-rate) shape a training-data
    pipeline derives from event logs.

    Distribution: one shuffle keyed by ``key_col`` (groupby.map_groups);
    each group sorts locally and computes the rolling sums vectorized.
    Partitioning assumption (documented per the custom-operator contract):
    a single key's history fits one worker — event logs with bounded
    per-entity cardinality. Floats rounded to 6 decimals at emit.
    """
    def roll(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, id_col], kind="mergesort")
        v = g[value_col].to_numpy(dtype=np.float64)
        c = np.concatenate(([0.0], np.cumsum(v)))
        n = len(v)
        lo = np.maximum(0, np.arange(1, n + 1) - k)
        rs = c[1:] - c[lo]
        rn = np.minimum(np.arange(1, n + 1), k)
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "roll_n": rn.astype(np.int64),
            "roll_sum": np.round(rs, 6),
            "roll_avg": np.round(rs / rn, 6),
        })

    return (events.select_columns([key_col, ts_col, id_col, value_col])
            .groupby(key_col).map_groups(roll, batch_format="pandas"))


def funnel(
    events: "ray.data.Dataset",
    steps: list[str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> "ray.data.Dataset":
    """Ordered conversion funnel: per key, the earliest strictly-increasing
    chain of ``steps`` timestamps (step i+1 must occur at a ts STRICTLY
    after step i's match). -> Dataset(key, reached, t_<step>_us...) where
    ``reached`` counts completed steps and each ``t_<step>_us`` is the
    matched epoch-microsecond timestamp (int64, -1 when the chain broke
    before that step — integer sentinels so the result round-trips through
    any engine without NULL-timestamp comparison issues).

    Distribution: one shuffle keyed by ``key_col`` (the same
    groupby.map_groups contract as rolling_window — per-entity history fits
    one worker); inside a group each step is a vectorized searchsorted over
    that step's sorted event times."""
    if not steps:
        raise ValueError("steps must be non-empty")

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        ts = group[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        et = group[type_col].to_numpy()
        cur = np.int64(-1)  # strictly-after threshold; -1 < all real ts
        vals: list = []
        broken = False
        for s in steps:
            if broken:
                vals.append(np.int64(-1))
                continue
            t = np.sort(ts[et == s])
            i = np.searchsorted(t, cur, side="right")
            if i < len(t):
                cur = t[i]
                vals.append(cur)
            else:
                broken = True
                vals.append(np.int64(-1))
        res = {key_col: group[key_col].iloc[:1].to_numpy(),
               "reached": np.asarray([sum(1 for v in vals if v >= 0)],
                                     dtype=np.int64)}
        for s, v in zip(steps, vals):
            res[f"t_{s}_us"] = np.asarray([v], dtype=np.int64)
        return pd.DataFrame(res)

    return (events.select_columns([key_col, ts_col, type_col])
            .groupby(key_col).map_groups(per_key, batch_format="pandas"))


def event_gaps(
    events: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> "ray.data.Dataset":
    """Per-key ordered rank + inter-arrival gap: -> (key, id, rnk, gap_us)
    where ``rnk`` is the 1-based position in the key's (ts, id)-ordered
    history and ``gap_us`` the epoch-microsecond distance to the previous
    event (-1 sentinel for the first). The ROW_NUMBER + LAG feature pair a
    sessionization / burst-detection pipeline derives from event logs.

    Distribution: identical contract to ``rolling_window`` — one shuffle
    keyed by ``key_col``, per-group vectorized diff; a single key's history
    fits one worker."""
    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, id_col], kind="mergesort")
        us = g[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        gap = np.empty(len(us), dtype=np.int64)
        if len(us):
            gap[0] = -1
            gap[1:] = us[1:] - us[:-1]
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "rnk": np.arange(1, len(us) + 1, dtype=np.int64),
            "gap_us": gap,
        })

    return (events.select_columns([key_col, ts_col, id_col])
            .groupby(key_col).map_groups(per_key, batch_format="pandas"))


def running_totals(
    events: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """Per-key RUNNING total: -> (key, id, cum_n, cum_micro) where ``cum_n``
    is the 1-based position in the key's (ts, id)-ordered history and
    ``cum_micro`` the prefix sum of the value in fixed-point micro-units
    (``rint(value * scale)`` int64). The cumulative-spend / cumulative-usage
    feature over an event log, kept INTEGER-EXACT so the prefix sums replay
    bit-for-bit in SQL no matter what summation tree the other engine uses
    (float prefix sums are order- and tree-shape-dependent; int64 isn't).

    Distribution: identical contract to ``rolling_window`` — one shuffle
    keyed by ``key_col``, per-group vectorized ``np.cumsum``; a single key's
    history fits one worker."""
    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, id_col], kind="mergesort")
        micro = np.rint(
            g[value_col].to_numpy(np.float64) * scale).astype(np.int64)
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "cum_n": np.arange(1, len(g) + 1, dtype=np.int64),
            "cum_micro": np.cumsum(micro),
        })

    return (events.select_columns([key_col, ts_col, id_col, value_col])
            .groupby(key_col).map_groups(per_key, batch_format="pandas"))


def user_retention(
    events: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Cohort retention table: cohort = the calendar DAY of a user's FIRST
    event; -> DataFrame(cohort, offset_days, n_users) counting the distinct
    users of each cohort active ``offset_days`` days after their first day
    (offset 0 = the cohort size itself). Day granularity matches the
    one-month span of the synthetic event log; the month variant is the
    same pipeline with a coarser index.

    Scale shape: first-day per user via one ``hash_aggregate`` min (the
    only user-grain exchange), a partitioned ``hash_join`` back onto the
    event stream, then a distinct + count over (cohort, offset, user) —
    bounded by users x active-days, never events. Days are integer
    epoch-day indices, so offsets replay exactly as SQL
    DATEDIFF('day')."""
    from bluegraph_ray.util import hash_aggregate, hash_distinct, hash_join

    def d_idx(batch: pd.DataFrame) -> pd.DataFrame:
        days = batch[ts_col].to_numpy().astype(
            "datetime64[D]").astype(np.int64)
        return pd.DataFrame({key_col: batch[key_col], "d": days})

    days = events.select_columns([key_col, ts_col]).map_batches(
        d_idx, batch_format="pandas", batch_size=None)
    first = hash_aggregate(days, key_col, {"d0": ("d", "min")},
                           num_buckets=num_buckets)
    # state the aggregate's schema: hash_join would otherwise resolve it by
    # executing the shuffle (and its events scan) a second time
    from bluegraph_ray.util import schema_dict

    key_dtype = schema_dict(days)[key_col]
    joined = hash_join(days, first, on=key_col, num_buckets=num_buckets,
                       right_schema={key_col: key_dtype, "d0": np.int64})

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "d0" not in batch.columns:
            return pd.DataFrame({
                key_col: pd.Series([], dtype=np.int64),
                "cohort": pd.Series([], dtype=np.int64),
                "offset_days": pd.Series([], dtype=np.int64)})
        d0 = batch["d0"].to_numpy(np.int64)
        dt = pd.Series(d0.astype("datetime64[D]")).dt
        cohort = (dt.year * 10000 + dt.month * 100 + dt.day).to_numpy(
            np.int64)
        return pd.DataFrame({
            key_col: batch[key_col].to_numpy(),
            "cohort": cohort,
            "offset_days": batch["d"].to_numpy(np.int64) - d0,
        }).drop_duplicates()

    triples = hash_distinct(
        joined.map_batches(fold, batch_format="pandas", batch_size=None),
        [key_col, "cohort", "offset_days"], num_buckets=num_buckets)
    counts = hash_aggregate(
        triples, ["cohort", "offset_days"],
        {"n_users": (None, "count")}, num_buckets=num_buckets).to_pandas()
    counts["n_users"] = counts["n_users"].astype(np.int64)
    return counts.sort_values(["cohort", "offset_days"]).reset_index(
        drop=True)


def event_zscores(
    events: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-key standardized values: -> (key, id, n, z) with
    z = (x - mean) / sqrt(E[x^2] - E[x]^2) over the key's own history
    (population moments; z = 0 when the variance is 0, including
    single-event keys) — the per-entity anomaly feature.

    Scale shape: one pass folds (n, sum, sum of squares) per key inside
    each batch, one bucketed combine, then a partitioned ``hash_join``
    back onto the stream — events are touched exactly twice, moments
    travel once. The E[x^2]-E[x]^2 form is used verbatim so SQL replays
    to rounding."""
    from bluegraph_ray.util import hash_aggregate, hash_join

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[value_col].to_numpy(np.float64)
        return pd.DataFrame({
            key_col: batch[key_col], id_col: batch[id_col],
            "x": x, "x2": x * x})

    prepped = events.select_columns(
        [key_col, id_col, value_col]).map_batches(
        prep, batch_format="pandas", batch_size=None)
    stats = hash_aggregate(
        prepped, key_col,
        {"n": (None, "count"), "s": ("x", "sum"), "ss": ("x2", "sum")},
        num_buckets=num_buckets)
    from bluegraph_ray.util import schema_dict

    key_dtype = schema_dict(prepped)[key_col]
    joined = hash_join(
        prepped.select_columns([key_col, id_col, "x"]), stats,
        on=key_col, num_buckets=num_buckets,
        right_schema={key_col: key_dtype, "n": np.int64,
                      "s": np.float64, "ss": np.float64})

    def z(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "x" not in batch.columns:
            return pd.DataFrame({
                key_col: pd.Series([], dtype=np.int64),
                id_col: pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "z": pd.Series([], dtype=np.float64)})
        n = batch["n"].to_numpy(np.float64)
        mean = batch["s"].to_numpy(np.float64) / n
        var = batch["ss"].to_numpy(np.float64) / n - mean * mean
        x = batch["x"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            zz = np.where(var > 0.0, (x - mean) / np.sqrt(var), 0.0)
        return pd.DataFrame({
            key_col: batch[key_col].to_numpy(),
            id_col: batch[id_col].to_numpy(),
            "n": batch["n"].to_numpy(np.int64),
            "z": np.round(zz, 6)})

    return joined.map_batches(z, batch_format="pandas", batch_size=None)


_NULL_KEY = "\x00<null>"  # sentinel for null keys inside the keyed sweeps:
# NaN/None can't survive as dict keys across serialization (the driver-side
# entering/nxt_first tables) nor pandas/Ray groupby folds consistently, so
# nulls ride as this string and are restored to None at emit — matching the
# oracles, which keep NULL as a group (code-review r5 findings 1-2).


def _null_to_sentinel(k: np.ndarray) -> np.ndarray:
    # key columns are assumed categorical strings (event types, sources —
    # see the operator docstrings); numeric keys ride as boxed objects,
    # which is a perf note, not a correctness one
    k = np.asarray(k, dtype=object)
    if (k == _NULL_KEY).any():
        raise ValueError(
            "keyed sweep: a key equals the internal null sentinel "
            f"{_NULL_KEY!r}; rename that key or extend the sentinel")
    mask = pd.isna(k)
    if mask.any():
        k = k.copy()
        k[mask] = _NULL_KEY
    return k


def _sentinel_to_null(arr) -> np.ndarray:
    a = np.asarray(arr, dtype=object)
    a[a == _NULL_KEY] = None
    return a


def _guarded_span(lo: int, hi: int, num_bins: int) -> int:
    """``hi - lo + 1`` with an overflow guard: ``to_bin`` computes
    ``(t - lo) * num_bins`` in int64, so a span wider than
    ``int64max / num_bins`` (one corrupt far-future timestamp ≈ 1100 years
    at 256 bins) would silently wrap to negative bin indices and corrupt
    every result via ``np.add.at`` wraparound (ADVICE r4) — fail loudly
    instead."""
    span = hi - lo + 1
    if span > np.iinfo(np.int64).max // num_bins:
        raise ValueError(
            f"timestamp span of {span} us ({span / 31_557_600_000_000:.0f} "
            f"years) overflows int64 bin math at num_bins={num_bins}; "
            "check for corrupt timestamps or lower num_bins")
    return span


def _key_pa_type(ds, col: str):
    """pyarrow type of ``col`` for the empty-result schema — the non-empty
    path's key dtype flows from the input, so the empty path must match it
    rather than hardcode string (ADVICE r4)."""
    import pyarrow as pa

    try:
        sch = ds.schema(fetch_if_missing=True)
        t = dict(zip(sch.names, sch.types))[col]
        if not isinstance(t, pa.DataType):
            t = pa.from_numpy_dtype(t)
        return t
    except Exception:
        return pa.string()


def concurrency_profile(
    events: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    dur_col: str = "value",
    num_bins: int = 256,
) -> "ray.data.Dataset":
    """Sweep-line concurrency profile: -> (t_us, concurrent) with one row per
    distinct interval boundary and ``concurrent`` = number of open intervals
    in [t_us, next boundary).

    Each event opens ``[epoch_us(ts), epoch_us(ts) + floor(dur * 1e6))``
    (``floor`` on both engine and oracle side — DuckDB's double->BIGINT cast
    rounds-to-nearest, numpy truncates, floor is the one expression both
    evaluate identically); zero/negative-duration intervals are dropped.

    Distributed prefix sum, not a global sort: boundary deltas get a
    map-side (t, Σd) combine, per-time-bin delta totals fold to a
    ``num_bins``-int driver table whose exclusive scan is the concurrency
    ENTERING each bin, then one bin-keyed shuffle finishes the cumulative
    sum locally per bin (same range-partition trick as
    ``functions/ranking.global_rank``; reference has no streaming engine —
    SURVEY.md §2.12 extension). Equal boundary times always share a bin, so
    no tie straddles a partition."""

    def bounds(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        dur = np.floor(
            batch[dur_col].to_numpy(np.float64) * 1e6).astype(np.int64)
        keep = dur > 0
        s = s[keep]
        t = np.concatenate([s, s + dur[keep]])
        d = np.concatenate([np.ones(len(s), dtype=np.int64),
                            np.full(len(s), -1, dtype=np.int64)])
        # map-side combine: distinct t with summed delta
        ut, inv = np.unique(t, return_inverse=True)
        dd = np.zeros(len(ut), dtype=np.int64)
        np.add.at(dd, inv, d)
        return pd.DataFrame({"t": ut, "d": dd})

    # materialize: consumed three times (min/max scan, per-bin totals, final
    # tagged shuffle) — pay the read + boundary extraction once (ADVICE r4)
    deltas = events.select_columns([ts_col, dur_col]).map_batches(
        bounds, batch_format="pandas", batch_size=None).materialize()

    mm = deltas.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [np.int64(b["t"].min()) if len(b) else np.iinfo(np.int64).max],
             "hi": [np.int64(b["t"].max()) if len(b) else np.iinfo(np.int64).min]}),
        batch_format="pandas", batch_size=None).to_pandas()
    if len(mm) == 0 or int(mm["lo"].min()) > int(mm["hi"].max()):
        import pyarrow as pa
        return ray.data.from_arrow(pa.table(
            {"t_us": pa.array([], pa.int64()),
             "concurrent": pa.array([], pa.int64())}))
    lo = int(mm["lo"].min())
    hi = int(mm["hi"].max())
    span = _guarded_span(lo, hi, num_bins)  # +1 so hi maps inside last bin

    def to_bin(t: np.ndarray) -> np.ndarray:
        # pure int64 arithmetic: equal t -> equal bin, monotone in t
        return (t - lo) * num_bins // span

    def bin_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = to_bin(batch["t"].to_numpy(np.int64))
        bins = np.zeros(num_bins, dtype=np.int64)
        np.add.at(bins, b, batch["d"].to_numpy(np.int64))
        nz = np.nonzero(bins)[0]
        return pd.DataFrame({"bin": nz.astype(np.int64), "d": bins[nz]})

    per_bin = deltas.map_batches(
        bin_partial, batch_format="pandas", batch_size=None).to_pandas()
    totals = np.zeros(num_bins, dtype=np.int64)
    if len(per_bin):
        agg = per_bin.groupby("bin", sort=True)["d"].sum()
        totals[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    entering = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_bin"] = to_bin(batch["t"].to_numpy(np.int64))
        return out

    def scan_bin(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["_bin"].iloc[0])
        g = group.groupby("t", sort=True)["d"].sum()
        return pd.DataFrame({
            "t_us": g.index.to_numpy(np.int64),
            "concurrent": entering[b] + np.cumsum(g.to_numpy(np.int64))})

    return (deltas.map_batches(tag, batch_format="pandas", batch_size=None)
            .groupby("_bin").map_groups(scan_bin, batch_format="pandas"))


def concurrency_peaks(
    events: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    dur_col: str = "value",
    key_col: str = "event_type",
    num_bins: int = 64,
) -> "ray.data.Dataset":
    """Grouped sweep-line peak: -> (key, peak_concurrent, peak_t_us) with
    ``peak_concurrent`` the maximum number of simultaneously open intervals
    of that key and ``peak_t_us`` the earliest boundary reaching it.

    Same boundary-delta / bin-offset machinery as ``concurrency_profile``
    but keyed: per-(key, bin) delta totals fold to a driver table bounded
    by #keys x ``num_bins`` ints (key is assumed CATEGORICAL — event
    types, sources — not an id column), one (key, bin)-keyed shuffle
    finishes the prefix sums, and the per-key argmax folds from per-batch
    partials bounded by #keys x blocks."""

    def bounds(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        dur = np.floor(
            batch[dur_col].to_numpy(np.float64) * 1e6).astype(np.int64)
        keep = dur > 0
        s = s[keep]
        k = _null_to_sentinel(batch[key_col].to_numpy()[keep])
        kk = np.concatenate([k, k])
        t = np.concatenate([s, s + dur[keep]])
        d = np.concatenate([np.ones(len(s), dtype=np.int64),
                            np.full(len(s), -1, dtype=np.int64)])
        out = pd.DataFrame({"k": kk, "t": t, "d": d})
        return out.groupby(["k", "t"], sort=False, as_index=False,
                           dropna=False)["d"].sum()

    # materialize: the boundary table is consumed three times (bounds scan,
    # per-bin totals, final tagged shuffle) — pay the parquet read + boundary
    # extraction once, not per consumption (ADVICE r4). Deltas are the
    # map-side-combined boundary rows, far smaller than the input.
    deltas = events.select_columns([ts_col, dur_col, key_col]).map_batches(
        bounds, batch_format="pandas", batch_size=None).materialize()

    mm = deltas.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [np.int64(b["t"].min()) if len(b) else np.iinfo(np.int64).max],
             "hi": [np.int64(b["t"].max()) if len(b) else np.iinfo(np.int64).min]}),
        batch_format="pandas", batch_size=None).to_pandas()
    if len(mm) == 0 or int(mm["lo"].min()) > int(mm["hi"].max()):
        import pyarrow as pa
        return ray.data.from_arrow(pa.table(
            {key_col: pa.array([], _key_pa_type(events, key_col)),
             "peak_concurrent": pa.array([], pa.int64()),
             "peak_t_us": pa.array([], pa.int64())}))
    lo = int(mm["lo"].min())
    hi = int(mm["hi"].max())
    span = _guarded_span(lo, hi, num_bins)

    def to_bin(t: np.ndarray) -> np.ndarray:
        return (t - lo) * num_bins // span

    kb = deltas.map_batches(
        lambda b: (lambda g: g)(
            pd.DataFrame({"k": b["k"],
                          "bin": to_bin(b["t"].to_numpy(np.int64)),
                          "d": b["d"]})
            .groupby(["k", "bin"], sort=False, as_index=False,
                      dropna=False)["d"].sum()),
        batch_format="pandas", batch_size=None).to_pandas()
    kb = kb.groupby(["k", "bin"], sort=True, as_index=False,
                    dropna=False)["d"].sum()
    # per-key exclusive scan over bins -> concurrency entering each bin
    kb["enter"] = (kb.groupby("k", sort=False, dropna=False)["d"].cumsum()
                   - kb["d"].to_numpy())
    entering = {(r.k, int(r.bin)): int(r.enter) for r in kb.itertuples()}

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_bin"] = to_bin(batch["t"].to_numpy(np.int64))
        return out

    def scan_group(group: pd.DataFrame) -> pd.DataFrame:
        k = group["k"].iloc[0]
        b = int(group["_bin"].iloc[0])
        g = group.groupby("t", sort=True)["d"].sum()
        cc = entering.get((k, b), 0) + np.cumsum(g.to_numpy(np.int64))
        i = int(np.argmax(cc))  # first index at the max: earliest boundary
        return pd.DataFrame({"k": [k],
                             "c": np.asarray([cc[i]], dtype=np.int64),
                             "t": np.asarray([g.index[i]], dtype=np.int64)})

    cand = (deltas.map_batches(tag, batch_format="pandas", batch_size=None)
            .groupby(["k", "_bin"]).map_groups(
                scan_group, batch_format="pandas")).to_pandas()
    # final fold: one candidate per (key, bin) reached the driver
    cand = cand.sort_values(["k", "c", "t"],
                            ascending=[True, False, True], kind="mergesort")
    best = cand.groupby("k", sort=True, as_index=False).first()
    return ray.data.from_pandas(pd.DataFrame({
        key_col: _sentinel_to_null(best["k"]),
        "peak_concurrent": best["c"].astype(np.int64),
        "peak_t_us": best["t"].astype(np.int64)}))


def interval_coverage(
    events: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    dur_col: str = "value",
    key_col: str = "event_type",
    num_bins: int = 64,
) -> "ray.data.Dataset":
    """Interval-union length per key: -> (key, covered_us) where
    ``covered_us`` is the total time at least one interval of that key is
    open (overlaps counted once — the measure of the union).

    Sweep-line identity: sum of (next_boundary - boundary) over boundaries
    whose running concurrency is > 0. Same keyed bin-offset machinery as
    ``concurrency_peaks``; the one extra piece is the segment that CROSSES
    a bin edge — its length is (next bin's first boundary - this bin's
    last), and its concurrency is the bin's exit count, so each bin task
    only needs the next non-empty bin's first boundary, broadcast from a
    per-(key, bin) min-t partial (driver state bounded by
    #keys x ``num_bins``; key assumed categorical)."""

    def bounds(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        dur = np.floor(
            batch[dur_col].to_numpy(np.float64) * 1e6).astype(np.int64)
        keep = dur > 0
        s = s[keep]
        k = _null_to_sentinel(batch[key_col].to_numpy()[keep])
        out = pd.DataFrame({
            "k": np.concatenate([k, k]),
            "t": np.concatenate([s, s + dur[keep]]),
            "d": np.concatenate([np.ones(len(s), dtype=np.int64),
                                 np.full(len(s), -1, dtype=np.int64)])})
        return out.groupby(["k", "t"], sort=False, as_index=False,
                           dropna=False)["d"].sum()

    # materialize: the boundary table is consumed three times (bounds scan,
    # per-bin totals, final tagged shuffle) — pay the parquet read + boundary
    # extraction once, not per consumption (ADVICE r4). Deltas are the
    # map-side-combined boundary rows, far smaller than the input.
    deltas = events.select_columns([ts_col, dur_col, key_col]).map_batches(
        bounds, batch_format="pandas", batch_size=None).materialize()

    mm = deltas.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [np.int64(b["t"].min()) if len(b) else np.iinfo(np.int64).max],
             "hi": [np.int64(b["t"].max()) if len(b) else np.iinfo(np.int64).min]}),
        batch_format="pandas", batch_size=None).to_pandas()
    if len(mm) == 0 or int(mm["lo"].min()) > int(mm["hi"].max()):
        import pyarrow as pa
        return ray.data.from_arrow(pa.table(
            {key_col: pa.array([], _key_pa_type(events, key_col)),
             "covered_us": pa.array([], pa.int64())}))
    lo = int(mm["lo"].min())
    hi = int(mm["hi"].max())
    span = _guarded_span(lo, hi, num_bins)

    def to_bin(t: np.ndarray) -> np.ndarray:
        return (t - lo) * num_bins // span

    kb = deltas.map_batches(
        lambda b: (lambda g: g)(
            pd.DataFrame({"k": b["k"],
                          "bin": to_bin(b["t"].to_numpy(np.int64)),
                          "d": b["d"], "t": b["t"]})
            .groupby(["k", "bin"], sort=False, as_index=False, dropna=False)
            .agg(d=("d", "sum"), mt=("t", "min"))),
        batch_format="pandas", batch_size=None).to_pandas()
    kb = kb.groupby(["k", "bin"], sort=True, as_index=False, dropna=False).agg(
        d=("d", "sum"), mt=("mt", "min"))
    kb["enter"] = (kb.groupby("k", sort=False, dropna=False)["d"].cumsum()
                   - kb["d"].to_numpy())
    # next non-empty bin's first boundary, per key (NaN -> key's last bin)
    kb["nxt"] = kb.groupby("k", sort=False, dropna=False)["mt"].shift(-1)
    entering = {(r.k, int(r.bin)): int(r.enter) for r in kb.itertuples()}
    nxt_first = {(r.k, int(r.bin)): (None if pd.isna(r.nxt) else int(r.nxt))
                 for r in kb.itertuples()}

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_bin"] = to_bin(batch["t"].to_numpy(np.int64))
        return out

    def cover_bin(group: pd.DataFrame) -> pd.DataFrame:
        k = group["k"].iloc[0]
        b = int(group["_bin"].iloc[0])
        g = group.groupby("t", sort=True)["d"].sum()
        t = g.index.to_numpy(np.int64)
        cc = entering.get((k, b), 0) + np.cumsum(g.to_numpy(np.int64))
        covered = int(np.sum((t[1:] - t[:-1]) * (cc[:-1] > 0)))
        nf = nxt_first.get((k, b))
        if cc[-1] > 0:
            # open interval crosses the bin edge; a key's global last
            # boundary always closes everything, so a next bin exists
            assert nf is not None, "positive exit count in the last bin"
            covered += nf - int(t[-1])
        return pd.DataFrame({"k": [k],
                             "covered_us": np.asarray([covered], np.int64)})

    per_bin = (deltas.map_batches(tag, batch_format="pandas", batch_size=None)
               .groupby(["k", "_bin"]).map_groups(
                   cover_bin, batch_format="pandas"))
    out = hash_aggregate(per_bin, "k", {"covered_us": ("covered_us", "sum")},
                         num_buckets=4)

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key_col: _sentinel_to_null(batch["k"]),
                             "covered_us": batch["covered_us"].astype(np.int64)})

    return out.map_batches(rename, batch_format="pandas", batch_size=None)


def concurrency_histogram(
    events: "ray.data.Dataset",
    *,
    ts_col: str = "ts",
    dur_col: str = "value",
    key_col: str = "event_type",
    num_bins: int = 64,
) -> "ray.data.Dataset":
    """Dwell-time distribution: -> (key, concurrent, dwell_us) — the total
    time the key's running concurrency equals each observed level
    (level 0 measured between the key's first and last boundary only, so
    every key's histogram sums to last_boundary - first_boundary).

    The full distribution behind ``concurrency_profile`` (the trace),
    ``concurrency_peaks`` (its max) and ``interval_coverage`` (its > 0
    mass): the same keyed bin-offset scan emits per-bin (level, dwell)
    partials — bounded by levels-present-in-bin, not boundaries — and one
    small aggregate folds them; segments crossing a bin edge are charged
    to the bin they start in, at the bin's exit level, using the broadcast
    successor-first-boundary table."""

    def bounds(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        dur = np.floor(
            batch[dur_col].to_numpy(np.float64) * 1e6).astype(np.int64)
        keep = dur > 0
        s = s[keep]
        k = _null_to_sentinel(batch[key_col].to_numpy()[keep])
        out = pd.DataFrame({
            "k": np.concatenate([k, k]),
            "t": np.concatenate([s, s + dur[keep]]),
            "d": np.concatenate([np.ones(len(s), dtype=np.int64),
                                 np.full(len(s), -1, dtype=np.int64)])})
        return out.groupby(["k", "t"], sort=False, as_index=False,
                           dropna=False)["d"].sum()

    # materialize: the boundary table is consumed three times (bounds scan,
    # per-bin totals, final tagged shuffle) — pay the parquet read + boundary
    # extraction once, not per consumption (ADVICE r4). Deltas are the
    # map-side-combined boundary rows, far smaller than the input.
    deltas = events.select_columns([ts_col, dur_col, key_col]).map_batches(
        bounds, batch_format="pandas", batch_size=None).materialize()

    mm = deltas.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [np.int64(b["t"].min()) if len(b) else np.iinfo(np.int64).max],
             "hi": [np.int64(b["t"].max()) if len(b) else np.iinfo(np.int64).min]}),
        batch_format="pandas", batch_size=None).to_pandas()
    if len(mm) == 0 or int(mm["lo"].min()) > int(mm["hi"].max()):
        import pyarrow as pa
        return ray.data.from_arrow(pa.table(
            {key_col: pa.array([], _key_pa_type(events, key_col)),
             "concurrent": pa.array([], pa.int64()),
             "dwell_us": pa.array([], pa.int64())}))
    lo = int(mm["lo"].min())
    hi = int(mm["hi"].max())
    span = _guarded_span(lo, hi, num_bins)

    def to_bin(t: np.ndarray) -> np.ndarray:
        return (t - lo) * num_bins // span

    kb = deltas.map_batches(
        lambda b: (lambda g: g)(
            pd.DataFrame({"k": b["k"],
                          "bin": to_bin(b["t"].to_numpy(np.int64)),
                          "d": b["d"], "t": b["t"]})
            .groupby(["k", "bin"], sort=False, as_index=False, dropna=False)
            .agg(d=("d", "sum"), mt=("t", "min"))),
        batch_format="pandas", batch_size=None).to_pandas()
    kb = kb.groupby(["k", "bin"], sort=True, as_index=False, dropna=False).agg(
        d=("d", "sum"), mt=("mt", "min"))
    kb["enter"] = (kb.groupby("k", sort=False, dropna=False)["d"].cumsum()
                   - kb["d"].to_numpy())
    kb["nxt"] = kb.groupby("k", sort=False, dropna=False)["mt"].shift(-1)
    entering = {(r.k, int(r.bin)): int(r.enter) for r in kb.itertuples()}
    nxt_first = {(r.k, int(r.bin)): (None if pd.isna(r.nxt) else int(r.nxt))
                 for r in kb.itertuples()}

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_bin"] = to_bin(batch["t"].to_numpy(np.int64))
        return out

    def hist_bin(group: pd.DataFrame) -> pd.DataFrame:
        k = group["k"].iloc[0]
        b = int(group["_bin"].iloc[0])
        g = group.groupby("t", sort=True)["d"].sum()
        t = g.index.to_numpy(np.int64)
        cc = entering.get((k, b), 0) + np.cumsum(g.to_numpy(np.int64))
        lv = cc[:-1]
        dw = t[1:] - t[:-1]
        nf = nxt_first.get((k, b))
        if nf is not None:
            lv = np.concatenate([lv, cc[-1:]])
            dw = np.concatenate([dw, np.asarray([nf - t[-1]], np.int64)])
        levels, inv = np.unique(lv, return_inverse=True)
        agg = np.zeros(len(levels), dtype=np.int64)
        np.add.at(agg, inv, dw)
        keep = agg > 0
        return pd.DataFrame({"k": np.repeat(k, int(keep.sum())),
                             "concurrent": levels[keep],
                             "dwell_us": agg[keep]})

    per_bin = (deltas.map_batches(tag, batch_format="pandas", batch_size=None)
               .groupby(["k", "_bin"]).map_groups(
                   hist_bin, batch_format="pandas"))
    out = hash_aggregate(per_bin, ["k", "concurrent"],
                         {"dwell_us": ("dwell_us", "sum")}, num_buckets=4)

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key_col: _sentinel_to_null(batch["k"]),
                             "concurrent": batch["concurrent"].astype(np.int64),
                             "dwell_us": batch["dwell_us"].astype(np.int64)})

    return out.map_batches(rename, batch_format="pandas", batch_size=None)
