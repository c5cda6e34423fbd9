"""Link-prediction scores: common-neighbors / Jaccard / Adamic-Adar /
preferential-attachment over candidate pairs.

The reference predicts links with trained classifiers over embeddings
(``bluegraph/downstream/link_prediction.py`` — covered by
pipelines/downstream.py); these are the classic structural scores
(``nx.jaccard_coefficient`` / ``nx.adamic_adar_index`` /
``nx.preferential_attachment`` are the exact oracles) that a large-scale
pipeline computes as candidate features BEFORE any model sees a pair.

Distributed shape (one wedge pass, no all-pairs anything):

1. canonical simple edge set (shared with triangle counting);
2. bucket symmetric arcs by hash(center); per center run of length d, emit
   all C(d, 2) neighbour pairs carrying (cn=1, aa=1/ln(d)) — a common
   neighbour of (u, v) emits the pair exactly once, so the per-pair sums
   are exact;
3. the edge set itself rides the SAME shuffle as sentinel rows
   (is_edge=1, cn=0) — ``max(is_edge)`` in the pair aggregate replaces a
   whole anti-join exchange (nx's default ebunch is non-edges), the same
   fold triangle counting uses for its closure semi-join;
4. one hash aggregate by pair, then the derived scores:
   jaccard = cn / (d_u + d_v − cn), pa = d_u · d_v.

Endpoint degrees: below ``deg_broadcast_rows`` the (node, degree) table is
``ray.put`` once and looked up at finalize (small-side broadcast — zero
extra exchanges); above it the degree is hash-JOINED onto the arc stream and
carried through the wedge shuffle (du/dv via max), so nothing ever has to
fit on one machine. The cutover default (20M rows ≈ a few hundred MB)
errs toward the join on billion-vertex graphs.

Output space is pairs with >= 1 common neighbour (the only pairs with
non-zero cn/jaccard/aa; materializing pa over ALL non-edges is O(V²) and
deliberately out of contract). Hub centers emit C(d, 2) pairs — the same
quadratic wedge mass triangle counting bounds by orientation; here every
wedge is a genuine output candidate, so ``max_center_degree`` instead skips
ultra-hub centers (the standard estimator: a hub shared by everything
carries ~zero AA signal, 1/ln(d) → 0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.stages.degree import degree_centrality
from bluegraph_ray.stages.triangles import _canonical_edges
from bluegraph_ray.util import hash_aggregate, hash_join, rename_columns


def link_prediction_scores(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    max_center_degree: int | None = None,
    include_edges: bool = False,
    deg_broadcast_rows: int = 20_000_000,
) -> "ray.data.Dataset":
    """Edge table -> Dataset(u, v, cn, jaccard, adamic_adar, pref_attach,
    salton, sorensen) over candidate pairs (u < v, >= 1 common neighbour,
    non-adjacent unless ``include_edges``). Exact vs the nx trio (plus the
    closed-form Salton cosine / Sørensen-Dice) on that pair space."""
    canon = _canonical_edges(edges, src, dst, num_buckets)
    deg = degree_centrality(canon, src="u", dst="v", num_buckets=num_buckets)
    deg = deg.materialize()
    n_vertices = deg.count()
    broadcast = n_vertices <= deg_broadcast_rows
    if include_edges and not broadcast:
        raise ValueError(
            "include_edges=True needs the broadcast degree path; raise "
            "deg_broadcast_rows or score edges separately")

    fwd = rename_columns(canon, {"u": "center", "v": "nbr"})
    rev = rename_columns(canon, {"v": "center", "u": "nbr"})
    arcs = fwd.union(rev)
    if broadcast:
        deg_ref = ray.put(
            pd.Series(deg.to_pandas().set_index("node")["degree"]))
    else:
        arcs = hash_join(
            arcs, rename_columns(deg, {"node": "nbr", "degree": "nbr_deg"}),
            on="nbr", num_buckets=num_buckets)

    def add_center_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_bucket"] = (
            pd.util.hash_pandas_object(batch["center"], index=False).to_numpy()
            % num_buckets
        ).astype(np.int64)
        return batch

    def _empty(dtype) -> pd.DataFrame:
        return pd.DataFrame({
            "u": np.array([], dtype=dtype), "v": np.array([], dtype=dtype),
            "cn": np.array([], dtype=np.int64),
            "aa": np.array([], dtype=np.float64),
            "du": np.array([], dtype=np.float64),
            "dv": np.array([], dtype=np.float64),
            "is_edge": np.array([], dtype=np.int64),
        })

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["center", "nbr"], kind="mergesort")
        c = group["center"].to_numpy()
        nbr = group["nbr"].to_numpy()
        nd = (group["nbr_deg"].to_numpy(dtype=np.float64)
              if not broadcast else None)
        change = np.flatnonzero(c[1:] != c[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(c)]))
        us, vs, dus, dvs, aas = [], [], [], [], []
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2 or (max_center_degree is not None and d > max_center_degree):
                continue
            iu, ju = np.triu_indices(d, k=1)
            us.append(nbr[s + iu])  # nbr sorted within run -> u < v
            vs.append(nbr[s + ju])
            if nd is not None:
                dus.append(nd[s + iu])
                dvs.append(nd[s + ju])
            aas.append(np.full(d * (d - 1) // 2, 1.0 / np.log(d)))
        if not us:
            return _empty(nbr.dtype)
        m = sum(len(x) for x in us)
        return pd.DataFrame({
            "u": np.concatenate(us), "v": np.concatenate(vs),
            "cn": np.ones(m, dtype=np.int64),
            "aa": np.concatenate(aas),
            "du": np.concatenate(dus) if dus else np.zeros(m),
            "dv": np.concatenate(dvs) if dvs else np.zeros(m),
            "is_edge": np.zeros(m, dtype=np.int64),
        })

    wedge_pairs = (
        arcs.map_batches(add_center_bucket, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(lambda g: emit_pairs(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
    )

    # the edge set rides the same pair shuffle as sentinel rows: one
    # max(is_edge) per pair replaces an anti-join exchange
    def edge_markers(batch: pd.DataFrame) -> pd.DataFrame:
        m = len(batch)
        return pd.DataFrame({
            "u": batch["u"].to_numpy(), "v": batch["v"].to_numpy(),
            "cn": np.zeros(m, dtype=np.int64), "aa": np.zeros(m),
            "du": np.zeros(m), "dv": np.zeros(m),
            "is_edge": np.ones(m, dtype=np.int64),
        })

    tagged = wedge_pairs.union(
        canon.map_batches(edge_markers, batch_format="pandas", batch_size=None))
    pair_scores = hash_aggregate(
        tagged, ["u", "v"],
        {"cn": ("cn", "sum"), "adamic_adar": ("aa", "sum"),
         "du": ("du", "max"), "dv": ("dv", "max"),
         "is_edge": ("is_edge", "max")},
        num_buckets=num_buckets,
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["cn"] > 0]  # edge-only rows carry no signal
        if not include_edges:
            batch = batch[batch["is_edge"] == 0]
        if broadcast:
            dmap = ray.get(deg_ref)
            du = dmap.reindex(batch["u"].to_numpy()).to_numpy(dtype=np.float64)
            dv = dmap.reindex(batch["v"].to_numpy()).to_numpy(dtype=np.float64)
        else:
            du = batch["du"].to_numpy(dtype=np.float64)
            dv = batch["dv"].to_numpy(dtype=np.float64)
        cn = batch["cn"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "u": batch["u"], "v": batch["v"],
            "cn": batch["cn"].astype(np.int64),
            "jaccard": cn / (du + dv - cn),
            "adamic_adar": batch["adamic_adar"],
            "pref_attach": (du * dv).astype(np.int64),
            # cosine and Dice variants of the same common-neighbour signal
            "salton": cn / np.sqrt(du * dv),
            "sorensen": 2.0 * cn / (du + dv),
        })

    return pair_scores.map_batches(finalize, batch_format="pandas",
                                   batch_size=None)
