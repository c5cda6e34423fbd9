"""Relational report pipelines over the fact tables.

Showcases the engine's join strategies end-to-end (TPC-H-Q3-shaped): a
partial-aggregated fact-side rollup feeding the partitioned ``hash_join``
(both sides stream, co-partitioned by key hash), followed by a bounded
top-k and a BROADCAST small-side enrichment (the k winning keys are the
small side — shipped once, never shuffled). The reference has no relational
engine; this module exists for the data-pipeline charter the same way the
windows/selection modules do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.util import hash_aggregate, hash_join


def top_revenue_orders(
    lineitem: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    customer: "ray.data.Dataset",
    *,
    k: int = 10,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Top-``k`` orders by revenue = SUM(l_extendedprice * (1 - l_discount)),
    enriched with order metadata and the customer's nation.

    Plan (each stage named by its scale property):
      1. map-side partial revenue per (orderkey) inside each lineitem batch,
         then one bucketed exact combine — the shuffle moves order-level
         partials, never lineitems;
      2. partitioned ``hash_join`` of the rollup with ``orders`` on
         o_orderkey — both sides stream through hash buckets;
      3. map-side per-batch top-k, then a global sort+limit over at most
         batches x k rows (revenue rounded to 4 decimals BEFORE ordering so
         the ordering is reproducible across partitionings);
      4. the k winners are collected (bounded: k rows) and their custkeys
         broadcast as a filter over ``customer`` — the small side ships
         once; customer never shuffles.

    Returns a k-row pandas DataFrame (o_orderkey, o_orderdate,
    o_orderpriority, revenue, c_custkey, c_nationkey) ordered by
    (revenue DESC, o_orderkey ASC).
    """
    def rev_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": batch["l_orderkey"],
            "revenue": batch["l_extendedprice"] * (1 - batch["l_discount"]),
        })

    rollup = hash_aggregate(
        lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
            rev_partial, batch_format="pandas", batch_size=None),
        "o_orderkey", {"revenue": ("revenue", "sum")},
        num_buckets=num_buckets)

    joined = hash_join(
        rollup,
        orders.select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]),
        on="o_orderkey", how="inner", num_buckets=num_buckets)

    def pre_topk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["revenue"] = np.round(batch["revenue"].to_numpy(), 4)
        batch["_neg"] = -batch["revenue"]
        return batch.sort_values(["_neg", "o_orderkey"]).head(k)

    top = (joined.map_batches(pre_topk, batch_format="pandas",
                              batch_size=None)
           .sort(["_neg", "o_orderkey"]).limit(k).to_pandas()
           .drop(columns=["_neg"]))

    keys = set(top["o_custkey"].tolist())
    keys_ref = ray.put(keys)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(keys_ref)
        return batch[batch["c_custkey"].isin(want)]

    cust = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        pick, batch_format="pandas", batch_size=None).to_pandas()

    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey",
                    how="left").drop(columns=["o_custkey"])
    return out[["o_orderkey", "o_orderdate", "o_orderpriority", "revenue",
                "c_custkey", "c_nationkey"]].reset_index(drop=True)
