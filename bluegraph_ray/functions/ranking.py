"""Distributed order statistics: exact global ROW_NUMBER / NTILE without a
single-node sort.

Ray Data's ``Dataset.sort`` range-partitions, but exposes no global row
offsets; driver-side ranking (``to_pandas`` then ``rank()``) is the
anti-pattern this module exists to avoid. The algorithm is the classic
range-partitioned rank:

1. one streaming pass folds (min, max, count) per batch — three scalars per
   block reach the driver;
2. each row maps to an equi-width bin over the value (the same IEEE bin
   expression ``functions/quantiles.binned_quantiles`` uses, so the bin id
   replays exactly in SQL); equal values always share a bin, so no tie
   crosses a partition boundary;
3. bin counts aggregate to a driver-side prefix-offset table (bounded by
   ``num_bins``, broadcast by closure);
4. one shuffle keyed by bin; each bin sorts locally by (value, id) and emits
   ``rank = offset[bin] + local position``.

Scale note: bins are equi-width, so a pathological value distribution can
skew one bin; raise ``num_bins`` (cost is #bins driver ints) or pre-hash
heavy point masses. The per-bin sort is the only superlinear step and is
bounded by the largest bin, not the dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def global_rank(
    ds: "ray.data.Dataset",
    *,
    value_col: str = "value",
    id_col: str = "event_id",
    ntiles: int = 100,
    num_bins: int = 256,
) -> "ray.data.Dataset":
    """-> Dataset(id, rnk, ntile): exact 1-based global rank under
    ``ORDER BY (value, id)`` plus the SQL-definition NTILE(``ntiles``)
    bucket (first ``total % ntiles`` tiles get the extra row)."""
    if ntiles < 1:
        raise ValueError("ntiles must be >= 1")

    def mm_partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(np.float64)
        if len(v) == 0:
            return pd.DataFrame({"lo": [np.inf], "hi": [-np.inf], "n": [0]})
        return pd.DataFrame({"lo": [float(v.min())], "hi": [float(v.max())],
                             "n": [len(v)]})

    mm = ds.select_columns([value_col]).map_batches(
        mm_partial, batch_format="pandas", batch_size=None).to_pandas()
    total = int(mm["n"].sum())
    if total == 0:
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "rnk": pd.Series([], dtype=np.int64),
            "ntile": pd.Series([], dtype=np.int64)}))
    lo = float(mm["lo"].min())
    hi = float(mm["hi"].max())
    width = hi - lo

    def to_bin(v: np.ndarray) -> np.ndarray:
        if width <= 0.0:
            return np.zeros(len(v), dtype=np.int64)
        # same IEEE expression as binned_quantiles: floor((v-lo)*B/(hi-lo))
        b = np.floor((v - lo) * num_bins / width).astype(np.int64)
        return np.minimum(b, num_bins - 1)

    def cnt_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = to_bin(batch[value_col].to_numpy(np.float64))
        bins, counts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": bins.astype(np.int64),
                             "n": counts.astype(np.int64)})

    cnts = ds.select_columns([value_col]).map_batches(
        cnt_partial, batch_format="pandas", batch_size=None).to_pandas()
    cnts = cnts.groupby("bin", sort=True)["n"].sum()
    full = np.zeros(num_bins, dtype=np.int64)
    full[cnts.index.to_numpy(np.int64)] = cnts.to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(full)[:-1]))

    # NTILE(t) per the SQL definition: the first (total % t) tiles hold
    # ceil(total/t) rows, the rest floor(total/t).
    q, r = divmod(total, ntiles)
    cut = r * (q + 1)

    def ntile_of(rnk: np.ndarray) -> np.ndarray:
        z = rnk - 1
        big = z < cut
        out = np.empty(len(rnk), dtype=np.int64)
        out[big] = z[big] // (q + 1) + 1
        if q > 0:
            out[~big] = r + (z[~big] - cut) // q + 1
        else:
            out[~big] = 0  # unreachable: q == 0 implies cut == total
        return out

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[value_col, id_col]].copy()
        out["_bin"] = to_bin(out[value_col].to_numpy(np.float64))
        return out

    def rank_bin(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([value_col, id_col], kind="mergesort")
        b = int(g["_bin"].iloc[0])
        rnk = offsets[b] + np.arange(1, len(g) + 1, dtype=np.int64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "rnk": rnk,
            "ntile": ntile_of(rnk)})

    return (ds.select_columns([value_col, id_col])
            .map_batches(tag, batch_format="pandas", batch_size=None)
            .groupby("_bin").map_groups(rank_bin, batch_format="pandas"))
