"""Graph contraction and k-hop subgraph extraction.

- ``contract_graph``: edges + a vertex→label map → the supergraph edge
  table (the reference's ``merge_nodes`` collapses explicit node lists,
  core/io.py:1263-1343; this is the label-partition form every multilevel
  algorithm needs — Louvain's aggregation step, community-level rollups).
  One streaming relabel pass + one bucketed hash aggregate; the label map
  is an O(n) broadcast (the vertex-name-array contract — at billions of
  vertices swap for two hash joins like stages/linkpred.py's join regime).
  Intra-community edges become self-loops carrying the internal weight.

- ``ego_network``: all edges within ``radius`` hops of a seed — BFS
  supersteps on the CSR actors (stages/sssp.bfs_hops), then one streaming
  edge filter against the broadcast reachable set (O(|ball|) driver state,
  not O(n): only vertices within the radius are shipped).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.stages.build import GraphHandle
from bluegraph_ray.util import hash_aggregate


def contract_graph(
    edges: "ray.data.Dataset",
    labels,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    num_buckets: int = 64,
    drop_unlabeled: bool = False,
) -> "ray.data.Dataset":
    """-> Dataset(cu, cv, weight, n_edges) with cu <= cv; ``labels`` is a
    dict or pd.Series mapping vertex -> community label. Unweighted edges
    count 1 each. Edges with an endpoint missing from ``labels`` raise
    (a partial label map silently shrinking the supergraph is a bug);
    pass ``drop_unlabeled=True`` to filter them instead."""
    lab = labels if isinstance(labels, pd.Series) else pd.Series(labels)
    ref = ray.put(lab)
    cols = [src, dst] + ([weight] if weight else [])

    def relabel(batch: pd.DataFrame) -> pd.DataFrame:
        lm = ray.get(ref)
        cu = lm.reindex(batch[src].to_numpy()).to_numpy()
        cv = lm.reindex(batch[dst].to_numpy()).to_numpy()
        miss = pd.isna(cu) | pd.isna(cv)
        if miss.any():
            if not drop_unlabeled:
                bad = batch.loc[miss, [src, dst]].head(3).to_dict("records")
                raise ValueError(
                    f"contract_graph: {int(miss.sum())} edge(s) have an "
                    f"endpoint missing from labels (e.g. {bad}); pass "
                    "drop_unlabeled=True to filter them")
            keep = ~miss
            # reindex promoted to float to hold the NaNs — restore the label
            # dtype so blocks with and without misses agree
            batch = batch[keep]
            cu = cu[keep].astype(lm.dtype, copy=False)
            cv = cv[keep].astype(lm.dtype, copy=False)
            if not len(batch):
                return pd.DataFrame({
                    "cu": np.array([], dtype=lm.dtype),
                    "cv": np.array([], dtype=lm.dtype),
                    "weight": np.array([], dtype=np.float64),
                    "n_edges": np.array([], dtype=np.int64)})
        lo = np.minimum(cu, cv)
        hi = np.maximum(cu, cv)
        w = (batch[weight].to_numpy(dtype=np.float64) if weight
             else np.ones(len(batch)))
        part = pd.DataFrame({"cu": lo, "cv": hi, "weight": w,
                             "n_edges": np.ones(len(batch), dtype=np.int64)})
        return part.groupby(["cu", "cv"], sort=False).sum().reset_index()

    partials = edges.select_columns(cols).map_batches(
        relabel, batch_format="pandas", batch_size=None)
    return hash_aggregate(
        partials, ["cu", "cv"],
        {"weight": ("weight", "sum"), "n_edges": ("n_edges", "sum")},
        num_buckets=num_buckets)


def ego_network(
    handle: GraphHandle,
    edges: "ray.data.Dataset",
    seed: int,
    *,
    radius: int = 2,
    src: str = "src",
    dst: str = "dst",
    actors=None,
) -> "ray.data.Dataset":
    """-> the rows of ``edges`` whose BOTH endpoints lie within ``radius``
    hops of dense vertex id ``seed`` in ``handle``'s graph. ``edges`` must
    be the same edge table the handle was built from (names must match)."""
    from bluegraph_ray.stages.sssp import bfs_hops

    res = bfs_hops(handle, seed, actors, max_iter=max(radius + 1, 4))
    # bfs to convergence is wasteful for small radii: distances beyond the
    # radius are irrelevant, so cap supersteps at radius (+1 safety) — every
    # vertex within the ball has its exact distance by then
    within = np.asarray(handle.names)[
        np.isfinite(res.values) & (res.values <= radius)]
    ball_ref = ray.put(set(within.tolist()))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        ball = ray.get(ball_ref)
        m = batch[src].isin(ball).to_numpy() & batch[dst].isin(ball).to_numpy()
        return batch[m]

    return edges.map_batches(keep, batch_format="pandas", batch_size=None)
