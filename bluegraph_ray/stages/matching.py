"""Maximal matching via hash-priority edge supersteps (greedy-parallel).

The edge analog of stages/mis.py: every canonical edge gets a static
priority h(u, v) = ((u·C1 xor v·C3)·C4) mod 2^64 (the walk-hash constant
family — replayable in SQL by the same split-multiply arithmetic); per
round, an undecided edge joins the matching iff its priority is the
minimum among ALL undecided edges touching either endpoint, then every
edge incident to a newly matched vertex drops out. Expected O(log m)
rounds for hash-random priorities; with FIXED priorities the result is a
pure function of the edge set — bitwise identical across partition
layouts and exactly replayable by an unrolled-CTE oracle
(__ray_entry__.oracle_sql()["matching_parts"]).

Distributed shape per round: one bucketed min-aggregate of (endpoint,
priority) pairs (the per-vertex min incident priority), the resulting
O(V)-row vertex-min map broadcast back (the vertex-state contract), one
streaming filter. The undecided edge set only shrinks; matched edges
accumulate driver-side (O(V/2) rows total — a matching never exceeds
half the vertices).

Result properties (tests/test_graph_stages.py): no two matched edges
share a vertex; every unmatched edge of the input touches a matched
vertex (maximality); layout invariance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.stages.build import _WALK_C1, _WALK_C3, _WALK_C4
from bluegraph_ray.stages.triangles import _canonical_edges
from bluegraph_ray.util import hash_aggregate


def _edge_priority(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Static uint64 edge priorities from integer endpoint names."""
    with np.errstate(over="ignore"):
        return ((u.astype(np.uint64) * _WALK_C1)
                ^ (v.astype(np.uint64) * _WALK_C3)) * _WALK_C4


def maximal_matching(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    max_rounds: int = 10_000,
) -> pd.DataFrame:
    """-> DataFrame(u, v) of matched edges (canonical u < v). Requires
    integer vertex names when oracle replay matters; any hashable names
    work otherwise (priorities then use pandas hashing, still
    deterministic)."""
    und = _canonical_edges(edges, src, dst, num_buckets)

    def add_h(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["u"].to_numpy()
        if np.issubdtype(np.asarray(u).dtype, np.integer):
            h = _edge_priority(batch["u"].to_numpy(), batch["v"].to_numpy())
        else:
            h = pd.util.hash_pandas_object(
                batch[["u", "v"]], index=False).to_numpy()
        batch = batch.copy()
        batch["h"] = h.astype(np.uint64)
        return batch

    und = und.map_batches(add_h, batch_format="pandas",
                          batch_size=None).materialize()
    matched: list[pd.DataFrame] = []
    for _ in range(max_rounds):
        if und.count() == 0:
            break

        def unpivot(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": np.concatenate([batch["u"].to_numpy(),
                                        batch["v"].to_numpy()]),
                "h": np.concatenate([batch["h"].to_numpy()] * 2),
            })

        vmin = hash_aggregate(
            und.map_batches(unpivot, batch_format="pandas", batch_size=None),
            "node", {"h": ("h", "min")}, num_buckets=num_buckets,
        ).to_pandas()
        vref = ray.put(pd.Series(vmin.set_index("node")["h"]))

        def pick(batch: pd.DataFrame) -> pd.DataFrame:
            vm = ray.get(vref)
            h = batch["h"].to_numpy()
            win = ((vm.reindex(batch["u"].to_numpy()).to_numpy() == h)
                   & (vm.reindex(batch["v"].to_numpy()).to_numpy() == h))
            return batch[win]

        new = und.map_batches(pick, batch_format="pandas",
                              batch_size=None).to_pandas()
        if not len(new):
            # no local minimum edge can fail to win on BOTH endpoints only
            # if und is empty; guard anyway
            break
        matched.append(new[["u", "v"]])
        taken = ray.put(set(new["u"]).union(new["v"]))

        def drop(batch: pd.DataFrame) -> pd.DataFrame:
            t = ray.get(taken)
            keep = (~batch["u"].isin(t)).to_numpy() & (
                ~batch["v"].isin(t)).to_numpy()
            return batch[keep]

        und = und.map_batches(drop, batch_format="pandas",
                              batch_size=None).materialize()
    else:
        raise RuntimeError("maximal_matching failed to converge")
    if not matched:
        return pd.DataFrame({"u": [], "v": []})
    return pd.concat(matched, ignore_index=True)
