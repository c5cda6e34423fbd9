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

from bluegraph_ray.util import (broadcast_get, duckdb_round_even,
                                hash_aggregate, hash_distinct, hash_join)


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
        on="o_orderkey", how="inner", num_buckets=num_buckets,
        # known intermediate schema: without it the join resolves the
        # rollup's schema by EXECUTING the aggregate a second time
        left_schema={"o_orderkey": np.int64, "revenue": np.float64})

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
        oc, on="o_orderkey", how="inner", num_buckets=num_buckets,
        # oc is itself a join output — resolving its schema would re-run it
        right_schema={"o_orderkey": np.int64, "c_nationkey": np.int64})

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
        on="o_orderkey", how="inner", num_buckets=num_buckets,
        left_schema={"o_orderkey": np.int64, "revenue": np.float64})

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
            return pd.DataFrame({"promo_u": [np.int64(0)],
                                 "total_u": [np.int64(0)]})
        pk = broadcast_get(pkeys_ref)
        pr = broadcast_get(promo_ref)
        lpk = sub["l_partkey"].to_numpy(np.int64)
        idx = np.searchsorted(pk, lpk)
        idx = np.clip(idx, 0, len(pk) - 1)
        found = pk[idx] == lpk
        # EXACT int64 micro-unit revenue (cents x (100-pct)): the partials
        # sum order-independently, so the final ratio rounds identically
        # on engine and oracle (round-5 tie-risk closure)
        cents = np.rint(
            sub["l_extendedprice"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        pct = np.rint(
            sub["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        rev_u = np.where(found, cents * (100 - pct), 0)
        is_promo = found & pr[idx]
        return pd.DataFrame({"promo_u": [int(rev_u[is_promo].sum())],
                             "total_u": [int(rev_u.sum())]})

    parts = lineitem.select_columns(
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pandas",
                  batch_size=None).to_pandas()
    promo_u = int(parts["promo_u"].sum())
    total_u = int(parts["total_u"].sum())
    # same expression text as the SQL (100.0 * Sp) / St -> identical double
    share = 0.0 if total_u == 0 else 100.0 * float(promo_u) / float(total_u)
    return pd.DataFrame({"promo_share": duckdb_round_even(
        np.asarray([share]), 6)})


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
        on="o_orderkey", how="inner", num_buckets=num_buckets,
        left_schema={"o_orderkey": np.int64,
                     "sum_qty": np.float64}).to_pandas()

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
        active, on="c_custkey", how="left", num_buckets=num_buckets,
        right_schema={"c_custkey": np.int64, "n_orders": np.int64})

    def keep_idle(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["n_orders"].isna()]
        return out[["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]]

    return joined.map_batches(keep_idle, batch_format="pandas",
                              batch_size=None)


def nation_pair_volume(
    lineitem: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    customer: "ray.data.Dataset",
    supplier: "ray.data.Dataset",
    nation: pd.DataFrame,
    *,
    nation_a: str,
    nation_b: str,
    date_lo: str,
    date_hi: str,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """TPC-H-Q7-shaped report: shipping volume between a nation PAIR — for
    lineitems shipped in ``[date_lo, date_hi)``, revenue per
    (supp_nation, cust_nation, ship year) where one side is ``nation_a``
    and the other ``nation_b``.

    Join plan (same side-size discipline as regional_nation_revenue):
    nation folds driver-side to the two keys; customer is pre-filtered to
    the pair's nations BEFORE its partitioned ``hash_join`` with orders (the
    filter kills ~23/25 of the build side at TPC-H geometry); lineitem is
    date-pruned and projected per batch, then one partitioned join on
    orderkey; the supplier (suppkey -> nationkey) map ships once via
    ``ray.put``. The cross-nation predicate (supp != cust side) is applied
    per batch, so the final shuffle carries (2 pairs x years x #blocks)
    one-row partials only."""
    key_of = dict(zip(nation["n_name"].tolist(),
                      nation["n_nationkey"].tolist()))
    if nation_a not in key_of or nation_b not in key_of:
        raise ValueError(f"unknown nation in pair ({nation_a}, {nation_b})")
    na, nb = int(key_of[nation_a]), int(key_of[nation_b])
    name_of = {na: nation_a, nb: nation_b}

    def c_prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["c_nationkey"].isin((na, nb))
        return batch.loc[m, ["c_custkey", "c_nationkey"]]

    oc = hash_join(
        _rename(orders.select_columns(["o_orderkey", "o_custkey"]),
                {"o_custkey": "c_custkey"}),
        customer.map_batches(c_prep, batch_format="pandas", batch_size=None),
        on="c_custkey", how="inner", num_buckets=num_buckets,
    ).select_columns(["o_orderkey", "c_nationkey"])

    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["l_shipdate"] >= lo) & (batch["l_shipdate"] < hi)
        sub = batch.loc[m]
        return pd.DataFrame({
            "o_orderkey": sub["l_orderkey"],
            "l_suppkey": sub["l_suppkey"],
            "l_year": sub["l_shipdate"].dt.year.to_numpy(np.int64),
            "rev": sub["l_extendedprice"] * (1 - sub["l_discount"]),
        })

    fact = hash_join(
        lineitem.select_columns(
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
             "l_discount"]).map_batches(
            li_prep, batch_format="pandas", batch_size=None),
        oc, on="o_orderkey", how="inner", num_buckets=num_buckets,
        right_schema={"o_orderkey": np.int64, "c_nationkey": np.int64})

    sup = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    skeys_ref = ray.put(
        np.ascontiguousarray(sup["s_suppkey"].to_numpy(np.int64)))
    snat_ref = ray.put(
        np.ascontiguousarray(sup["s_nationkey"].to_numpy(np.int64)))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "supp_nat": pd.Series([], dtype=np.int64),
            "cust_nat": pd.Series([], dtype=np.int64),
            "l_year": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64)})
        if len(batch) == 0:
            return empty
        sk = broadcast_get(skeys_ref)
        sn = broadcast_get(snat_ref)
        lsk = batch["l_suppkey"].to_numpy(np.int64)
        idx = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
        found = sk[idx] == lsk
        supp_nat = sn[idx]
        cust_nat = batch["c_nationkey"].to_numpy(np.int64)
        keep = found & (
            ((supp_nat == na) & (cust_nat == nb))
            | ((supp_nat == nb) & (cust_nat == na)))
        if not keep.any():
            return empty
        sub = pd.DataFrame({
            "supp_nat": supp_nat[keep],
            "cust_nat": cust_nat[keep],
            "l_year": batch["l_year"].to_numpy(np.int64)[keep],
            "rev": batch["rev"].to_numpy(np.float64)[keep]})
        g = sub.groupby(["supp_nat", "cust_nat", "l_year"],
                        sort=False)["rev"].sum()
        out = g.reset_index().rename(columns={"rev": "revenue"})
        return out.astype({"supp_nat": np.int64, "cust_nat": np.int64,
                           "l_year": np.int64})

    parts = fact.map_batches(partial, batch_format="pandas",
                             batch_size=None).to_pandas()
    if parts.empty:
        # zero matches: Ray's to_pandas drops the typed columns too
        parts = pd.DataFrame({"supp_nat": pd.Series([], dtype=np.int64),
                              "cust_nat": pd.Series([], dtype=np.int64),
                              "l_year": pd.Series([], dtype=np.int64),
                              "revenue": pd.Series([], dtype=np.float64)})
    out = parts.groupby(["supp_nat", "cust_nat", "l_year"],
                        sort=False)["revenue"].sum().reset_index()
    out["supp_nation"] = out["supp_nat"].map(name_of)
    out["cust_nation"] = out["cust_nat"].map(name_of)
    out["revenue"] = np.round(out["revenue"].to_numpy(), 2)
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"])
    return out[["supp_nation", "cust_nation", "l_year",
                "revenue"]].reset_index(drop=True)


def min_unit_price_supplier(
    lineitem: "ray.data.Dataset",
    supplier: "ray.data.Dataset",
    *,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """TPC-H-Q2-shaped groupwise ARGMIN: per part, the supplier offering the
    lowest observed unit price (l_extendedprice / l_quantity), ties broken
    by the smaller suppkey, enriched with the supplier's name and balance.

    The argmin is lexicographic on (unit_price, suppkey): each batch
    pre-reduces to one candidate row per partkey (sort + drop_duplicates),
    then ONE bucketed exact combine repeats the same fold — only per-part
    candidates ride the shuffle, never lineitems. Unit price stays the raw
    IEEE double through both folds (bit-identical to the SQL replay's
    division); rounding happens only at emit. Supplier enrichment is a
    broadcast lookup (suppkey-sorted arrays via ``ray.put``) — at TPC-H
    geometry supplier is 1e-4 of lineitem; swap for a ``hash_join`` if the
    dimension ever outgrows worker heaps."""
    def candidate(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_partkey": batch["l_partkey"],
            "s_suppkey": batch["l_suppkey"],
            "unit_price": (batch["l_extendedprice"].to_numpy(np.float64)
                           / batch["l_quantity"].to_numpy(np.float64)),
        })
        out = out.sort_values(["unit_price", "s_suppkey"]).drop_duplicates(
            "l_partkey")
        h = pd.util.hash_pandas_object(
            out["l_partkey"], index=False).to_numpy()
        out["_bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop(columns=["_bucket"])
                .sort_values(["unit_price", "s_suppkey"])
                .drop_duplicates("l_partkey"))

    winners = (
        lineitem.select_columns(
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
        .map_batches(candidate, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas"))

    sup = supplier.select_columns(
        ["s_suppkey", "s_name", "s_acctbal"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    skeys_ref = ray.put(
        np.ascontiguousarray(sup["s_suppkey"].to_numpy(np.int64)))
    sname_ref = ray.put(sup["s_name"].to_numpy())
    sbal_ref = ray.put(
        np.ascontiguousarray(sup["s_acctbal"].to_numpy(np.float64)))

    def enrich(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({
                "l_partkey": pd.Series([], dtype=np.int64),
                "s_suppkey": pd.Series([], dtype=np.int64),
                "s_name": pd.Series([], dtype=object),
                "s_acctbal": pd.Series([], dtype=np.float64),
                "unit_price": pd.Series([], dtype=np.float64)})
        sk = broadcast_get(skeys_ref)
        idx = np.clip(np.searchsorted(
            sk, batch["s_suppkey"].to_numpy(np.int64)), 0, len(sk) - 1)
        return pd.DataFrame({
            "l_partkey": batch["l_partkey"].to_numpy(np.int64),
            "s_suppkey": batch["s_suppkey"].to_numpy(np.int64),
            "s_name": broadcast_get(sname_ref)[idx],
            "s_acctbal": broadcast_get(sbal_ref)[idx],
            # duckdb_round_even, not np.round: the winning unit price is an
            # exact rational (cents / (100*qty)) that can land on a true
            # ...5e-7 tie, where np.round's float tie-break diverges from
            # the oracle's round_even macro (round-5 drive INEXACT finding)
            "unit_price": duckdb_round_even(
                batch["unit_price"].to_numpy(np.float64), 6)})

    return winners.map_batches(enrich, batch_format="pandas",
                               batch_size=None)


def late_shipment_priority(
    lineitem: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    *,
    date_lo: str,
    date_hi: str,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """TPC-H-Q4-shaped EXISTS semi-join: per order priority, how many orders
    placed in ``[date_lo, date_hi)`` had at least one lineitem shipped
    AFTER the order date.

    The correlated EXISTS folds into an order-grain MAX(l_shipdate) rollup
    (map-side partials, one bucketed combine) — a semi-join expressed as an
    aggregate, so the probe side never sees lineitem grain. The rollup then
    hash_joins the date-pruned orders; ``max_ship > o_orderdate`` replays
    the EXISTS exactly because MAX over the group is > iff any element is.
    The count per priority is #priorities x #blocks one-row partials."""
    rollup = hash_aggregate(
        lineitem.select_columns(["l_orderkey", "l_shipdate"]),
        "l_orderkey", {"max_ship": ("l_shipdate", "max")},
        num_buckets=num_buckets)

    lo = pd.Timestamp(date_lo)
    hi = pd.Timestamp(date_hi)

    def o_prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = (batch["o_orderdate"] >= lo) & (batch["o_orderdate"] < hi)
        return batch.loc[m, ["o_orderkey", "o_orderdate", "o_orderpriority"]]

    joined = hash_join(
        _rename(rollup, {"l_orderkey": "o_orderkey"}),
        orders.map_batches(o_prep, batch_format="pandas", batch_size=None),
        on="o_orderkey", how="inner", num_buckets=num_buckets,
        left_schema={"o_orderkey": np.int64,
                     "max_ship": np.dtype("datetime64[us]")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        late = batch[batch["max_ship"] > batch["o_orderdate"]]
        g = late.groupby("o_orderpriority", sort=False).size()
        return pd.DataFrame({
            "o_orderpriority": g.index.to_numpy(),
            "n_late_orders": g.to_numpy(np.int64)})

    parts = joined.map_batches(partial, batch_format="pandas",
                               batch_size=None).to_pandas()
    if parts.empty:
        parts = pd.DataFrame({
            "o_orderpriority": pd.Series([], dtype=object),
            "n_late_orders": pd.Series([], dtype=np.int64)})
    out = parts.groupby("o_orderpriority", sort=False)[
        "n_late_orders"].sum().reset_index()
    out["n_late_orders"] = out["n_late_orders"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def rich_idle_segments(
    customer: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    *,
    since: str,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """TPC-H-Q22-shaped report: per market segment, the count and total
    balance of customers whose balance beats the global positive-balance
    average AND who have placed no order since ``since``.

    The global scalar is computed INTEGER-EXACT: balances carry two
    decimals, so each batch emits (sum of balance-cents, count) partials
    and the threshold test is ``bal_cents * n_pos > sum_cents`` — pure
    int64 arithmetic that replays bit-for-bit in SQL regardless of float
    summation order. The order side is crushed to distinct custkeys before
    the anti ``hash_join`` (left + NaN filter), so the exchange is
    customer-grain on both sides."""
    def bal_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bal = batch["c_acctbal"].to_numpy(np.float64)
        pos = bal > 0.0
        cents = np.rint(bal[pos] * 100.0).astype(np.int64)
        return pd.DataFrame({"sum_cents": [int(cents.sum())],
                             "n_pos": [int(pos.sum())]})

    scal = customer.select_columns(["c_acctbal"]).map_batches(
        bal_partial, batch_format="pandas", batch_size=None).to_pandas()
    sum_cents = int(scal["sum_cents"].sum())
    n_pos = int(scal["n_pos"].sum())
    if n_pos == 0:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                             "n_custs": pd.Series([], dtype=np.int64),
                             "total_bal": pd.Series([], dtype=np.float64)})

    def c_prep(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(
            batch["c_acctbal"].to_numpy(np.float64) * 100.0).astype(np.int64)
        m = cents * n_pos > sum_cents
        return batch.loc[m, ["c_custkey", "c_acctbal", "c_mktsegment"]]

    lo = pd.Timestamp(since)

    def o_prep(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["o_orderdate"] >= lo
        out = batch.loc[m, ["o_custkey"]].drop_duplicates()
        return out.rename(columns={"o_custkey": "c_custkey"})

    active = hash_aggregate(
        orders.select_columns(["o_custkey", "o_orderdate"]).map_batches(
            o_prep, batch_format="pandas", batch_size=None),
        "c_custkey", {"n_orders": (None, "count")},
        num_buckets=num_buckets)

    joined = hash_join(
        customer.select_columns(
            ["c_custkey", "c_acctbal", "c_mktsegment"]).map_batches(
            c_prep, batch_format="pandas", batch_size=None),
        active, on="c_custkey", how="left", num_buckets=num_buckets,
        right_schema={"c_custkey": np.int64, "n_orders": np.int64})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "c_mktsegment" not in batch.columns:
            # filter stages upstream can emit zero-row, zero-column blocks
            return pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype=object),
                "n_custs": pd.Series([], dtype=np.int64),
                "cents": pd.Series([], dtype=np.int64)})
        idle = batch[batch["n_orders"].isna()]
        g = idle.groupby("c_mktsegment", sort=False).agg(
            n_custs=("c_custkey", "size"),
            cents=("c_acctbal", lambda s: int(
                np.rint(s.to_numpy(np.float64) * 100.0).astype(
                    np.int64).sum())))
        return g.reset_index()

    parts = joined.map_batches(partial, batch_format="pandas",
                               batch_size=None).to_pandas()
    if parts.empty:
        parts = pd.DataFrame({
            "c_mktsegment": pd.Series([], dtype=object),
            "n_custs": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64)})
    out = parts.groupby("c_mktsegment", sort=False).agg(
        n_custs=("n_custs", "sum"), cents=("cents", "sum")).reset_index()
    out["n_custs"] = out["n_custs"].astype(np.int64)
    out["total_bal"] = np.round(out["cents"].to_numpy(np.float64) / 100.0, 2)
    return out.drop(columns=["cents"]).sort_values(
        "c_mktsegment").reset_index(drop=True)


def brand_supplier_counts(
    lineitem: "ray.data.Dataset",
    part: "ray.data.Dataset",
    supplier: "ray.data.Dataset",
    *,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """TPC-H-Q16-shaped report: COUNT(DISTINCT supplier) per
    (p_brand, p_size), excluding suppliers with a negative balance (the
    'customer complaints' NOT-IN stand-in).

    Distributed COUNT DISTINCT done right: lineitem first collapses to
    distinct (partkey, suppkey) via ``hash_distinct`` (the only fact-grain
    exchange), the part dimension's (brand, size) attributes ship once via
    ``ray.put`` sorted arrays, the NOT-IN set is a broadcast isin filter,
    and the final distinct + count move (brand x size x supplier)-grain
    rows only."""
    excl = supplier.select_columns(["s_suppkey", "s_acctbal"]).to_pandas()
    excl_ref = ray.put(
        set(excl.loc[excl["s_acctbal"] < 0.0, "s_suppkey"].tolist()))

    pt = part.select_columns(["p_partkey", "p_brand", "p_size"]).to_pandas()
    pt = pt.sort_values("p_partkey")
    pkeys_ref = ray.put(
        np.ascontiguousarray(pt["p_partkey"].to_numpy(np.int64)))
    pbrand_ref = ray.put(pt["p_brand"].to_numpy())
    psize_ref = ray.put(
        np.ascontiguousarray(pt["p_size"].to_numpy(np.int64)))

    ps = hash_distinct(
        lineitem.select_columns(["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"], num_buckets=num_buckets)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "p_brand": pd.Series([], dtype=object),
            "p_size": pd.Series([], dtype=np.int64),
            "s_suppkey": pd.Series([], dtype=np.int64)})
        if len(batch) == 0:
            return empty
        bad = broadcast_get(excl_ref)
        keep = ~batch["l_suppkey"].isin(bad).to_numpy()
        sub = batch.loc[keep]
        if len(sub) == 0:
            return empty
        pk = broadcast_get(pkeys_ref)
        idx = np.clip(np.searchsorted(
            pk, sub["l_partkey"].to_numpy(np.int64)), 0, len(pk) - 1)
        found = pk[idx] == sub["l_partkey"].to_numpy(np.int64)
        sub = sub.loc[found]
        idx = idx[found]
        return pd.DataFrame({
            "p_brand": broadcast_get(pbrand_ref)[idx],
            "p_size": broadcast_get(psize_ref)[idx],
            "s_suppkey": sub["l_suppkey"].to_numpy(np.int64)})

    triples = hash_distinct(
        ps.map_batches(attach, batch_format="pandas", batch_size=None),
        ["p_brand", "p_size", "s_suppkey"], num_buckets=num_buckets)

    counts = hash_aggregate(
        triples, ["p_brand", "p_size"],
        {"supplier_cnt": (None, "count")},
        num_buckets=num_buckets).to_pandas()
    counts["supplier_cnt"] = counts["supplier_cnt"].astype(np.int64)
    counts["p_size"] = counts["p_size"].astype(np.int64)
    return counts.sort_values(
        ["supplier_cnt", "p_brand", "p_size"],
        ascending=[False, True, True]).reset_index(drop=True)
