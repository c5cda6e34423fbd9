"""Distributed greedy graph coloring (Jones & Plassmann 1993, "A Parallel
Graph Coloring Heuristic") over the CSR partition actors.

Static hash priorities (the MIS priority family — a pure function of the
vertex name, so a SQL oracle replays them); in round ``c`` every uncolored
vertex whose priority is the MINIMUM of its uncolored closed neighbourhood
takes color ``c`` — one ``min_label_gather`` broadcast per round, the same
superstep shape as connected components / MIS. Adjacent vertices can never
win the same round (one of them has the smaller priority and sits in the
other's closed neighbourhood), so the partial coloring is always proper.

Fixed round count, leftovers = -1: the fixed-``K`` convention the unrolled
SQL oracles rely on (kcore 16 / MIS 10 / ktruss 10 rounds). With hash-random
priorities the expected rounds to fully color is the longest decreasing-
priority path, O(log n); pick ``rounds`` accordingly and treat -1 rows as
"re-run with more rounds" at production scale.

The reference reaches coloring only via ``nx.greedy_color`` (sequential,
order-dependent); this is the distributed-standard equivalent with a
deterministic, replayable result.
"""

from __future__ import annotations

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors
from bluegraph_ray.stages.mis import _SENTINEL, _priorities


def jp_coloring(
    handle: GraphHandle,
    actors=None,
    *,
    rounds: int = 16,
) -> np.ndarray:
    """-> dense int64 color vector: 1-based color per vertex, -1 if still
    uncolored after ``rounds`` rounds (exactly ``rounds`` synchronous
    supersteps, early-exit when everything is colored — a no-op for the
    replay since an empty residual stays empty)."""
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        n = handle.n
        prio = _priorities(handle)
        color = np.full(n, -1, dtype=np.int64)
        for c in range(1, rounds + 1):
            uncol = color < 0
            if not uncol.any():
                break
            key = np.where(uncol, prio, _SENTINEL)
            ref = ray.put(key)
            gmin = np.concatenate(
                ray.get([a.min_label_gather.remote(ref) for a in actors]))
            new = uncol & (key == gmin) & (key != _SENTINEL)
            color[new] = c
        return color
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)
