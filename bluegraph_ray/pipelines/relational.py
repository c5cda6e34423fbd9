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

from bluegraph_ray.util import broadcast_get, hash_aggregate, hash_join


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


def _rename(ds: "ray.data.Dataset", mapping: dict) -> "ray.data.Dataset":
    """Zero-copy column rename so two sides of a ``hash_join`` share key
    names (the join buckets by column name)."""
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns=mapping)

    return ds.map_batches(f, batch_format="pandas", batch_size=None)


def regional_nation_revenue(
    lineitem: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    customer: "ray.data.Dataset",
    supplier: "ray.data.Dataset",
    nation: pd.DataFrame,
    region: pd.DataFrame,
    *,
    region_name: str,
    date_lo: str,
    date_hi: str,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """TPC-H-Q5-shaped report: revenue per nation inside one region for
    orders in ``[date_lo, date_hi)``, counting only lineitems whose supplier
    sits in the customer's own nation.

    Join plan by side size (the point of the query):
      1. ``nation``/``region`` are O(10) rows — driver-held pandas, folded
         into a nationkey set + name map (broadcast by closure);
      2. orders (date-pruned at the scan) ⋈ customer on custkey is a
         partitioned ``hash_join`` — both sides stream, nothing broadcast;
         rows outside the region's nations are cut BEFORE the fact join;
      3. lineitem ⋈ (2) on orderkey is the big partitioned join — lineitem
         never moves twice: revenue is projected per batch first;
      4. supplier's (s_suppkey -> s_nationkey) map ships once via
         ``ray.put`` (searchsorted lookup per batch). At TPC-H geometry
         supplier is 1e-4 of lineitem; if the supplier side ever outgrew
         worker heaps this step becomes a third hash_join instead.
      5. the surviving (nationkey, revenue) partials combine driver-side —
         bounded by #nations × #blocks.
    """
    nset = set(
        nation[nation["n_regionkey"].isin(
            region.loc[region["r_name"] == region_name, "r_regionkey"]
        )]["n_nationkey"].tolist())
    name_of = dict(zip(nation["n_nationkey"].tolist(),
                       nation["n_name"].tolist()))

    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)

    def o_prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["o_orderdate"] >= lo) & (batch["o_orderdate"] < hi)
        out = batch.loc[m, ["o_orderkey", "o_custkey"]].rename(
            columns={"o_custkey": "c_custkey"})
        return out

    def c_prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["c_nationkey"].isin(nset)
        return batch.loc[m, ["c_custkey", "c_nationkey"]]

    oc = hash_join(
        orders.map_batches(o_prep, batch_format="pandas", batch_size=None),
        customer.map_batches(c_prep, batch_format="pandas", batch_size=None),
        on="c_custkey", how="inner", num_buckets=num_buckets,
    ).select_columns(["o_orderkey", "c_nationkey"])

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "rev": batch["l_extendedprice"] * (1 - batch["l_discount"]),
        })

    fact = hash_join(
        lineitem.map_batches(li_prep, batch_format="pandas", batch_size=None),
        oc, on="o_orderkey", how="inner", num_buckets=num_buckets)

    sup = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    skeys = np.ascontiguousarray(sup["s_suppkey"].to_numpy(np.int64))
    snat = np.ascontiguousarray(sup["s_nationkey"].to_numpy(np.int64))
    skeys_ref = ray.put(skeys)
    snat_ref = ray.put(snat)

    def local_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"c_nationkey": pd.Series([], dtype=np.int64),
                                 "revenue": pd.Series([], dtype=np.float64)})
        sk = broadcast_get(skeys_ref)
        sn = broadcast_get(snat_ref)
        lsk = batch["l_suppkey"].to_numpy(np.int64)
        idx = np.searchsorted(sk, lsk)
        idx = np.clip(idx, 0, len(sk) - 1)
        found = sk[idx] == lsk
        local = found & (sn[idx] == batch["c_nationkey"].to_numpy(np.int64))
        sub = batch.loc[local]
        g = sub.groupby("c_nationkey", sort=False)["rev"].sum()
        return pd.DataFrame({"c_nationkey": g.index.to_numpy(np.int64),
                             "revenue": g.to_numpy(np.float64)})

    parts = fact.map_batches(local_partial, batch_format="pandas",
                             batch_size=None).to_pandas()
    out = parts.groupby("c_nationkey", sort=False)["revenue"].sum().reset_index()
    out["n_name"] = out["c_nationkey"].map(name_of)
    out["revenue"] = np.round(out["revenue"].to_numpy(), 2)
    out = out.sort_values(["revenue", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["n_name", "revenue"]]


def returned_customer_revenue(
    lineitem: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    customer: "ray.data.Dataset",
    nation: pd.DataFrame,
    *,
    k: int = 20,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """TPC-H-Q10-shaped report: top-``k`` customers by revenue from RETURNED
    lineitems (``l_returnflag == 'R'``), enriched with name/balance/nation.

    Scale shape: returned-lineitem revenue is partial-aggregated to order
    grain inside each batch (the shuffle moves order partials), joined with
    orders via partitioned ``hash_join``, re-aggregated to customer grain,
    then a map-side top-k bounds the global sort to batches × k rows. Only
    the k winning custkeys touch the customer table (broadcast filter)."""
    def rev_partial(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch["l_returnflag"] == "R"]
        return pd.DataFrame({
            "o_orderkey": sub["l_orderkey"],
            "revenue": sub["l_extendedprice"] * (1 - sub["l_discount"]),
        })

    rollup = hash_aggregate(
        lineitem.select_columns(
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
        ).map_batches(rev_partial, batch_format="pandas", batch_size=None),
        "o_orderkey", {"revenue": ("revenue", "sum")},
        num_buckets=num_buckets)

    joined = hash_join(
        rollup, orders.select_columns(["o_orderkey", "o_custkey"]),
        on="o_orderkey", how="inner", num_buckets=num_buckets)

    by_cust = hash_aggregate(
        _rename(joined.select_columns(["o_custkey", "revenue"]),
                {"o_custkey": "c_custkey"}),
        "c_custkey", {"revenue": ("revenue", "sum")},
        num_buckets=num_buckets)

    def pre_topk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["revenue"] = np.round(batch["revenue"].to_numpy(), 4)
        batch["_neg"] = -batch["revenue"]
        return batch.sort_values(["_neg", "c_custkey"]).head(k)

    top = (by_cust.map_batches(pre_topk, batch_format="pandas",
                               batch_size=None)
           .sort(["_neg", "c_custkey"]).limit(k).to_pandas()
           .drop(columns=["_neg"]))

    keys_ref = ray.put(set(top["c_custkey"].tolist()))

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        want = broadcast_get(keys_ref)
        return batch[batch["c_custkey"].isin(want)]

    cust = customer.select_columns(
        ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]).map_batches(
        pick, batch_format="pandas", batch_size=None).to_pandas()
    name_of = dict(zip(nation["n_nationkey"].tolist(),
                       nation["n_name"].tolist()))
    cust["n_name"] = cust["c_nationkey"].map(name_of)

    out = top.merge(cust.drop(columns=["c_nationkey"]),
                    on="c_custkey", how="left")
    out = out.sort_values(["revenue", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["c_custkey", "c_name", "c_acctbal", "n_name", "revenue"]]


def promo_revenue_share(
    lineitem: "ray.data.Dataset",
    part: "ray.data.Dataset",
    *,
    date_lo: str,
    date_hi: str,
) -> pd.DataFrame:
    """TPC-H-Q14-shaped single-row report: percentage of shipped revenue in
    ``[date_lo, date_hi)`` coming from parts whose type starts with PROMO.

    The part table folds to a (p_partkey -> is_promo) pair of arrays shipped
    once via ``ray.put`` — one bit of payload per part, so even a 100 TB
    geometry's part side broadcasts in MBs (pack to a bitset if it ever
    matters). Lineitem streams once; the shuffle is #blocks one-row partials.
    Lineitems whose partkey is absent from part are excluded from BOTH sums
    (inner-join semantics)."""
    pt = part.select_columns(["p_partkey", "p_type"]).to_pandas()
    pt = pt.sort_values("p_partkey")
    pkeys = np.ascontiguousarray(pt["p_partkey"].to_numpy(np.int64))
    promo = np.ascontiguousarray(
        pt["p_type"].str.startswith("PROMO").to_numpy(np.bool_))
    pkeys_ref = ray.put(pkeys)
    promo_ref = ray.put(promo)

    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["l_shipdate"] >= lo) & (batch["l_shipdate"] < hi)
        sub = batch.loc[m]
        if len(sub) == 0:
            return pd.DataFrame({"promo_rev": [0.0], "total_rev": [0.0]})
        pk = broadcast_get(pkeys_ref)
        pr = broadcast_get(promo_ref)
        lpk = sub["l_partkey"].to_numpy(np.int64)
        idx = np.searchsorted(pk, lpk)
        idx = np.clip(idx, 0, len(pk) - 1)
        found = pk[idx] == lpk
        rev = (sub["l_extendedprice"] * (1 - sub["l_discount"])).to_numpy()
        rev = np.where(found, rev, 0.0)
        is_promo = found & pr[idx]
        return pd.DataFrame({"promo_rev": [float(rev[is_promo].sum())],
                             "total_rev": [float(rev.sum())]})

    parts = lineitem.select_columns(
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pandas",
                  batch_size=None).to_pandas()
    promo_rev = float(parts["promo_rev"].sum())
    total_rev = float(parts["total_rev"].sum())
    share = 0.0 if total_rev == 0 else 100.0 * promo_rev / total_rev
    return pd.DataFrame({"promo_share": [np.round(share, 6)]})


def large_orders(
    lineitem: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    customer: "ray.data.Dataset",
    *,
    min_qty: float = 300.0,
    limit: int = 100,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """TPC-H-Q18-shaped report: orders whose total lineitem quantity exceeds
    ``min_qty``, with the buying customer, ordered by totalprice.

    The quantity rollup is the only full-fact shuffle (order-grain partials);
    the HAVING filter runs distributed so only ~the top percentile of orders
    reaches the join with ``orders``. The winner set is bounded, so customer
    enrichment is a broadcast filter, never a shuffle."""
    rollup = hash_aggregate(
        lineitem.select_columns(["l_orderkey", "l_quantity"]),
        "l_orderkey", {"sum_qty": ("l_quantity", "sum")},
        num_buckets=num_buckets)

    def keep_big(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["sum_qty"] > min_qty].rename(
            columns={"l_orderkey": "o_orderkey"})
        return out

    big = rollup.map_batches(keep_big, batch_format="pandas",
                             batch_size=None)

    joined = hash_join(
        big,
        orders.select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        on="o_orderkey", how="inner", num_buckets=num_buckets).to_pandas()

    keys_ref = ray.put(set(joined["o_custkey"].tolist()))

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        want = broadcast_get(keys_ref)
        return batch[batch["c_custkey"].isin(want)]

    cust = customer.select_columns(["c_custkey", "c_name"]).map_batches(
        pick, batch_format="pandas", batch_size=None).to_pandas()

    out = joined.merge(cust, left_on="o_custkey", right_on="c_custkey",
                       how="left")
    out["o_totalprice"] = np.round(out["o_totalprice"].to_numpy(), 2)
    out["sum_qty"] = np.round(out["sum_qty"].to_numpy(), 2)
    out["_neg"] = -out["o_totalprice"]
    out = out.sort_values(["_neg", "o_orderkey"]).head(limit).reset_index(
        drop=True)
    return out[["c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]]


def revenue_rollup(orders: "ray.data.Dataset") -> pd.DataFrame:
    """ROLLUP(year, priority) order report — grouping sets derived from ONE
    pass over the fact table.

    The engine aggregates only the finest grain distributed (map-side
    partials, driver combine bounded by #years × #priorities × #blocks);
    the (year, ALL) and (ALL, ALL) levels re-aggregate from those ~35
    combined rows, so coarser levels cost zero extra scans — the classic
    partial-reuse argument for rollup trees. NULL grouping keys are
    sentinel-encoded (-1 / 'ALL') so schemas stay non-nullable."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_year": batch["o_orderdate"].dt.year.to_numpy(np.int64),
            "o_orderpriority": batch["o_orderpriority"],
            "o_totalprice": batch["o_totalprice"],
        }).groupby(["o_year", "o_orderpriority"], sort=False).agg(
            n_orders=("o_totalprice", "size"),
            total_price=("o_totalprice", "sum")).reset_index()
        return g

    fine = orders.select_columns(
        ["o_orderdate", "o_orderpriority", "o_totalprice"]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    fine = fine.groupby(["o_year", "o_orderpriority"], sort=False).agg(
        n_orders=("n_orders", "sum"),
        total_price=("total_price", "sum")).reset_index()

    mid = fine.groupby("o_year", sort=False).agg(
        n_orders=("n_orders", "sum"),
        total_price=("total_price", "sum")).reset_index()
    mid["o_orderpriority"] = "ALL"
    top = pd.DataFrame({
        "o_year": np.asarray([-1], dtype=np.int64),
        "o_orderpriority": ["ALL"],
        "n_orders": [int(fine["n_orders"].sum())],
        "total_price": [float(fine["total_price"].sum())],
    })

    out = pd.concat(
        [fine, mid[fine.columns.tolist()], top[fine.columns.tolist()]],
        ignore_index=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["total_price"] = np.round(out["total_price"].to_numpy(), 2)
    return out.sort_values(["o_year", "o_orderpriority"]).reset_index(
        drop=True)


def customers_without_orders(
    customer: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    *,
    date_lo: str,
    date_hi: str,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Distributed ANTI-join: customers with NO order in ``[date_lo,
    date_hi)``.

    The order side is first crushed to distinct custkeys (order-grain
    partial distinct inside each batch, then the bucketed combine), so the
    anti-join's right side is customer-grain, not fact-grain. The join
    itself is the partitioned ``hash_join`` with how='left'; rows whose
    probe found no match keep a NaN counter and survive the filter. Both
    sides stream — nothing is broadcast, so the pattern holds when BOTH
    sides are huge (the true anti-join case a Bloom side-filter can't
    serve exactly)."""
    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)

    def o_prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["o_orderdate"] >= lo) & (batch["o_orderdate"] < hi)
        out = batch.loc[m, ["o_custkey"]].drop_duplicates()
        return out.rename(columns={"o_custkey": "c_custkey"})

    active = hash_aggregate(
        orders.select_columns(["o_custkey", "o_orderdate"]).map_batches(
            o_prep, batch_format="pandas", batch_size=None),
        "c_custkey", {"n_orders": (None, "count")},
        num_buckets=num_buckets)

    joined = hash_join(
        customer.select_columns(
            ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]),
        active, on="c_custkey", how="left", num_buckets=num_buckets)

    def keep_idle(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["n_orders"].isna()]
        return out[["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]]

    return joined.map_batches(keep_idle, batch_format="pandas",
                              batch_size=None)
