"""Per-vertex triangle counting: degree-ordered orientation + wedge closing.

The reference reaches triangle counts only through its backend ecosystems
(``nx.triangles`` is the exact oracle — SURVEY.md §2.5). Algorithm (the
standard distributed formulation):

1. canonicalize undirected edges (u < v, self-loops dropped, deduped);
2. orient each edge from the endpoint that is smaller under (degree, id)
   ordering — every out-adjacency then has size O(sqrt(m)), which bounds the
   wedge explosion regardless of hub vertices (this IS the skew handling);
3. bucket oriented edges by hash(source); per bucket, vectorized emission of
   all out-neighbour pairs (wedges) per source run — a wedge is 16 bytes:
   (apex rank, endpoint pair code = wb*n + wc);
4. close wedges with a HASH-PARTITIONED SEMI-JOIN against the oriented edge
   set: both streams are bucketed by ``pair code % num_buckets`` and meet in
   per-bucket ``map_groups`` tasks (sorted-code ``np.searchsorted``
   membership inside each bucket). Neither the wedge stream nor the edge
   list is ever materialized on the driver or broadcast — the only driver
   state is the O(n) (degree, id) rank map, the same contract as the dense
   vertex-id map. Pair codes need n^2 < 2^63, i.e. n < ~3e9 vertices;
5. every closed wedge (a; b, c) is one triangle {a, b, c}: emit a count for
   each corner, ``groupby(node).sum``.

Exact per-vertex counts vs ``nx.triangles`` (tests/test_graph_stages.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data
from bluegraph_ray.util import hash_aggregate, hash_distinct


def _canonical_edges(edges: "ray.data.Dataset", src: str, dst: str,
                     num_buckets: int) -> "ray.data.Dataset":
    """Simple undirected edge set: u < v, self-loops dropped, deduped."""
    from bluegraph_ray.util import rename_columns

    e = rename_columns(edges.select_columns([src, dst]), {src: "u", dst: "v"})

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        return pd.DataFrame({"u": lo[keep], "v": hi[keep]}).drop_duplicates()

    return hash_distinct(
        e.map_batches(canon, batch_format="pandas", batch_size=None), ["u", "v"],
        num_buckets=num_buckets,
    ).materialize()


def triangle_counts(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    canonical: bool = False,
    per_edge: bool = False,
) -> "ray.data.Dataset":
    """Undirected edge table -> Dataset(node, triangles). Exact. Pass
    ``canonical=True`` when the input is already the simple (u < v, deduped)
    edge set under columns (u, v) to skip the dedup shuffle.

    ``per_edge=True`` returns Dataset(u, v, support) instead — each edge's
    triangle count (its truss support): every closed wedge (a; b, c) is one
    triangle whose three edges (a,b), (a,c), (b,c) each gain one count. Same
    two-shuffle pipeline; only the closure emission differs."""
    canon_edges = (edges if canonical
                   else _canonical_edges(edges, src, dst, num_buckets))

    # degrees of the simple graph (small result: one row per vertex)
    from bluegraph_ray.stages.degree import degree_centrality

    deg = degree_centrality(canon_edges, src="u", dst="v").to_pandas()
    # (degree, id) total order -> rank; ids may be strings or ints
    deg = deg.sort_values(["degree", "node"], kind="mergesort").reset_index(drop=True)
    rank = pd.Series(np.arange(len(deg), dtype=np.int64), index=deg["node"])
    rank_ref = ray.put(rank)

    # orient by rank and encode pair codes for the closure check
    def orient(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rank_ref)
        ru = r.reindex(batch["u"]).to_numpy()
        rv = r.reindex(batch["v"]).to_numpy()
        a = np.where(ru < rv, ru, rv)  # lower-rank endpoint becomes source
        b = np.where(ru < rv, rv, ru)
        return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})

    oriented = canon_edges.map_batches(orient, batch_format="pandas", batch_size=None).materialize()

    n = len(rank)
    inv_rank_ref = ray.put(pd.Series(rank.index.to_numpy(), index=rank.to_numpy()))

    def add_src_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_bucket"] = (
            pd.util.hash_array(batch["a"].to_numpy()) % num_buckets
        ).astype(np.int64)
        return batch

    def emit_wedges(group: pd.DataFrame) -> pd.DataFrame:
        """All out-neighbour pairs per source run -> (apex, pair code)."""
        group = group.sort_values(["a", "b"], kind="mergesort")
        a = group["a"].to_numpy()
        b = group["b"].to_numpy()
        change = np.flatnonzero(np.diff(a)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(a)]))
        apexes, codes = [], []
        for s, epos in zip(starts, ends):
            f = epos - s
            if f < 2:
                continue
            iu, ju = np.triu_indices(f, k=1)
            wb = b[s + iu]  # wedge endpoints, wb < wc in rank order
            wc = b[s + ju]
            apexes.append(np.full(len(wb), a[s], dtype=np.int64))
            codes.append(wb * n + wc)
        if not apexes:
            return pd.DataFrame({"apex": np.array([], dtype=np.int64),
                                 "code": np.array([], dtype=np.int64)})
        return pd.DataFrame({"apex": np.concatenate(apexes),
                             "code": np.concatenate(codes)})

    wedges = (
        oriented.map_batches(add_src_bucket, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(lambda g: emit_wedges(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
    )

    # semi-join side: oriented edges as pair codes, apex = -1 sentinel
    def edge_codes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "apex": np.full(len(batch), -1, dtype=np.int64),
            "code": batch["a"].to_numpy() * n + batch["b"].to_numpy(),
        })

    def add_code_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_cb"] = (
            pd.util.hash_array(batch["code"].to_numpy()) % num_buckets
        ).astype(np.int64)
        return batch

    tagged = wedges.union(
        oriented.map_batches(edge_codes, batch_format="pandas", batch_size=None)
    ).map_batches(add_code_bucket, batch_format="pandas", batch_size=None)

    def close_bucket(group: pd.DataFrame) -> pd.DataFrame:
        """Per code-hash bucket: sorted-edge-code membership test for the
        bucket's wedges; every closed wedge contributes one count to each of
        its three corners (apex, code//n, code%n) — or, per_edge, to each of
        its three edges' pair codes (ranks satisfy apex < b < c, so all
        three codes are canonically ordered)."""
        apex = group["apex"].to_numpy()
        code = group["code"].to_numpy()
        is_edge = apex < 0
        ecodes = np.sort(code[is_edge])
        wapex = apex[~is_edge]
        wcode = code[~is_edge]
        if not len(wcode) or not len(ecodes):
            return pd.DataFrame({"vrank": np.array([], dtype=np.int64),
                                 "partial": np.array([], dtype=np.int64)})
        pos = np.searchsorted(ecodes, wcode)
        ok = (pos < len(ecodes)) & (ecodes[np.minimum(pos, len(ecodes) - 1)] == wcode)
        if not ok.any():
            return pd.DataFrame({"vrank": np.array([], dtype=np.int64),
                                 "partial": np.array([], dtype=np.int64)})
        closed = wcode[ok]
        if per_edge:
            b = closed // n
            c = closed % n
            a = wapex[ok]
            keys = np.concatenate([a * n + b, a * n + c, closed])
        else:
            keys = np.concatenate([wapex[ok], closed // n, closed % n])
        uniq, cnt = np.unique(keys, return_counts=True)
        return pd.DataFrame({"vrank": uniq, "partial": cnt.astype(np.int64)})

    counts = (
        tagged.groupby("_cb")
        .map_groups(lambda g: close_bucket(g.drop(columns=["_cb"])),
                    batch_format="pandas")
    )
    counts = hash_aggregate(counts, "vrank", {"triangles": ("partial", "sum")},
                            num_buckets=num_buckets)

    def back_to_names(batch: pd.DataFrame) -> pd.DataFrame:
        inv = ray.get(inv_rank_ref)
        return pd.DataFrame(
            {"node": inv.reindex(batch["vrank"]).to_numpy(), "triangles": batch["triangles"]}
        )

    def edges_to_names(batch: pd.DataFrame) -> pd.DataFrame:
        inv = ray.get(inv_rank_ref)
        code = batch["vrank"].to_numpy()
        a = inv.reindex(code // n).to_numpy()
        b = inv.reindex(code % n).to_numpy()
        # rank-ordered pair back to name-ordered (u < v) canonical form
        return pd.DataFrame({"u": np.minimum(a, b), "v": np.maximum(a, b),
                             "support": batch["triangles"].to_numpy()})

    return counts.map_batches(edges_to_names if per_edge else back_to_names,
                              batch_format="pandas", batch_size=None)


def k_truss(
    edges: "ray.data.Dataset",
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    max_rounds: int = 10_000,
) -> "ray.data.Dataset":
    """nx.k_truss semantics: the maximal subgraph whose every edge sits in
    at least k−2 triangles OF THAT SUBGRAPH. Iterative edge peeling — each
    round is one per-edge triangle-support pass (the same two-shuffle wedge
    pipeline as triangle_counts, per_edge=True) followed by a streaming
    filter; support is monotone under edge removal, so the fixpoint is
    confluent (round count only affects wall time, not the answer — which
    is what the unrolled-CTE oracle relies on). Converges when a round
    removes nothing; rounds are O(peel depth), each O(wedges/P) per task.

    -> the surviving canonical edge set Dataset(u, v)."""
    if k < 2:
        raise ValueError("k-truss needs k >= 2")
    current = _canonical_edges(edges, src, dst, num_buckets)
    if k == 2:
        # every edge has >= 0 triangles; the support pass only emits
        # triangle-participating edges, so short-circuit the degenerate case
        return current
    n_edges = current.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        sup = triangle_counts(current, canonical=True,
                              num_buckets=num_buckets, per_edge=True)
        survivors = sup.filter(expr=f"support >= {k - 2}")
        keep = survivors.select_columns(["u", "v"]).materialize()
        m = keep.count()
        if m == n_edges:
            break
        current, n_edges = keep, m
    else:
        raise RuntimeError("k_truss failed to converge within max_rounds")
    return current


def clustering_coefficient(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    canonical: bool = False,
) -> "ray.data.Dataset":
    """Per-vertex local clustering coefficient, ``nx.clustering`` semantics:
    cc(v) = 2·T(v) / (d(v)·(d(v)−1)) over the simple undirected graph, 0 when
    d(v) < 2. Every vertex of the edge set gets a row (zero-triangle vertices
    included — the triangle stream is LEFT-joined onto the degree table, both
    computed from one shared canonical edge set, one dedup shuffle total;
    ``canonical=True`` skips even that, as in :func:`triangle_counts`).
    Exact vs nx.clustering (tests/test_graph_stages.py)."""
    from bluegraph_ray.stages.degree import degree_centrality
    from bluegraph_ray.util import hash_join

    canon_edges = (edges if canonical
                   else _canonical_edges(edges, src, dst, num_buckets))
    deg = degree_centrality(canon_edges, src="u", dst="v",
                            num_buckets=num_buckets)
    tri = triangle_counts(canon_edges, canonical=True, num_buckets=num_buckets)
    joined = hash_join(deg, tri, on="node", how="left",
                       num_buckets=num_buckets)

    def cc(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["degree"].to_numpy(dtype=np.float64)
        t = batch["triangles"].fillna(0).to_numpy(dtype=np.float64)
        denom = d * (d - 1.0)
        out = np.where(denom > 0, 2.0 * t / np.where(denom > 0, denom, 1.0), 0.0)
        return pd.DataFrame({"node": batch["node"], "clustering": out})

    return joined.map_batches(cc, batch_format="pandas", batch_size=None)
