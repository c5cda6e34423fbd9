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
