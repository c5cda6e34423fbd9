"""Exact distributed quantiles via value-histogram aggregation.

The classic scalable exact-quantile shape when the DISTINCT value set is
much smaller than the row count (prices, durations, scores, token counts —
true of every numeric TPC-H-ish column and most telemetry): per-batch
value_counts (map-side combine), one bucketed hash aggregate over distinct
values, then an O(|distinct|) driver-side cumulative scan. No sort of the
data, no sampling error — the histogram IS the full distribution. When the
distinct set itself is unbounded (raw floats), pre-round/bin in a map stage
and the same machinery yields fixed-precision quantiles.

Rule (replayed exactly by the SQL oracle): quantile(q) = the smallest value
whose cumulative count reaches ceil(q·N).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.util import hash_aggregate


def value_histogram(ds: "ray.data.Dataset", column: str, *,
                    num_buckets: int = 16) -> pd.DataFrame:
    """-> DataFrame(value, n) sorted by value: the full exact histogram."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[column].value_counts()
        return pd.DataFrame({"value": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype(np.int64)})

    hist = hash_aggregate(
        ds.select_columns([column]).map_batches(
            partial, batch_format="pandas", batch_size=None),
        "value", {"n": ("n", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    return hist.sort_values("value").reset_index(drop=True)


def quantiles(ds: "ray.data.Dataset", column: str, qs, *,
              num_buckets: int = 16) -> pd.DataFrame:
    """-> DataFrame(q, value): exact discrete quantiles (smallest value with
    cumulative count >= ceil(q·N))."""
    hist = value_histogram(ds, column, num_buckets=num_buckets)
    cum = hist["n"].to_numpy().cumsum()
    total = int(cum[-1])
    vals = hist["value"].to_numpy()
    out_q, out_v = [], []
    for q in qs:
        rank = int(np.ceil(q * total))
        ix = int(np.searchsorted(cum, max(rank, 1)))
        out_q.append(float(q))
        out_v.append(vals[ix])
    return pd.DataFrame({"q": out_q, "value": out_v})


def binned_quantiles(ds: "ray.data.Dataset", column: str, qs, *,
                     num_bins: int = 1024,
                     num_buckets: int = 8) -> pd.DataFrame:
    """Fixed-memory approximate quantiles for UNBOUNDED distinct values —
    the mergeable-sketch path when ``value_histogram``'s distinct set would
    itself be corpus-sized (raw floats, latencies).

    Two streaming passes: (1) exact global min/max (one-row partials);
    (2) equi-width bin counts — every partial and the combine are bounded by
    ``num_bins``, never the input. quantile(q) = UPPER edge of the smallest
    bin whose cumulative count reaches ceil(q·N): a one-sided estimate with
    error ≤ (max-min)/num_bins, deterministic (no sampling), and replayed
    exactly in SQL because the bin index is the same IEEE expression
    ``floor((v - lo) * num_bins / (hi - lo))`` on both sides.

    -> DataFrame(q, value) with value rounded to 9 decimals.
    """
    def mm_partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[column].to_numpy(dtype=np.float64)
        if len(v) == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.float64),
                                 "hi": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"lo": [float(v.min())], "hi": [float(v.max())]})

    sel = ds.select_columns([column])
    mm = sel.map_batches(mm_partial, batch_format="pandas",
                         batch_size=None).to_pandas()
    if len(mm) == 0:
        raise ValueError("binned_quantiles on an empty dataset")
    lo = float(mm["lo"].min())
    hi = float(mm["hi"].max())
    width = hi - lo

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[column].to_numpy(dtype=np.float64)
        if len(v) == 0 or width == 0.0:
            b = np.zeros(len(v), dtype=np.int64)
        else:
            b = np.floor((v - lo) * num_bins / width).astype(np.int64)
            b = np.minimum(b, num_bins - 1)
        vc = pd.Series(b).value_counts()
        return pd.DataFrame({"bin": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    hist = hash_aggregate(
        sel.map_batches(hist_partial, batch_format="pandas",
                        batch_size=None),
        "bin", {"n": ("n", "sum")}, num_buckets=num_buckets,
    ).to_pandas().sort_values("bin").reset_index(drop=True)

    bins = hist["bin"].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        rank = max(int(np.ceil(q * total)), 1)
        ix = int(np.searchsorted(cum, rank))
        edge = hi if width == 0.0 else lo + (bins[ix] + 1) * width / num_bins
        out_q.append(float(q))
        out_v.append(np.round(min(edge, hi), 9))
    return pd.DataFrame({"q": out_q, "value": out_v})
