"""Single-source shortest paths via distributed Bellman-Ford supersteps.

The reference computes shortest paths only through its backends'
single-machine algorithms (NetworkX Dijkstra behind
``core/analyse/paths.py:shortest_path`` — see SURVEY.md §2.7); those stay
available for per-pair queries in stages/paths.py. This stage is the scale
path: one distance vector, O(shortest-path-hop-bound) supersteps, each a
tropical-semiring gather (``min over in-arcs of dist[u] + w``) on the same
CsrPartition actors PageRank and connected components ride — so SSSP over a
100 TB arc set reuses the degree-balanced on-disk partitioning and the
checkpointed superstep loop unchanged.

``weighted=False`` gives BFS hop counts (every arc costs 1) and converges
in eccentricity(source)+1 supersteps; ``weighted=True`` uses the graph's
weight column as the arc length (build the handle with the distance-valued
column, e.g. 1/frequency as in minimum_spanning_tree) and converges in at
most n-1 relaxation rounds, in practice the hop length of the longest
shortest path. Distances are exact floats: each superstep takes elementwise
minima of identical candidate sums, so results are reproducible bit for bit
across partition layouts and replayable by a fixed-depth recursive-CTE
oracle (__ray_entry__.oracle_sql()["bfs_hops_parts" / "sssp_parts"]).
"""

from __future__ import annotations

import time

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors
from bluegraph_ray.stages.pagerank import SuperstepResult


def sssp(
    handle: GraphHandle,
    source: int,
    actors=None,
    *,
    weighted: bool = True,
    max_iter: int = 200,
    iters: int | None = None,
) -> SuperstepResult:
    """-> per-vertex distance from dense vertex id ``source`` (np.inf =
    unreachable). ``iters`` forces an exact superstep count (fixed-depth
    oracle replay); otherwise runs to convergence (no distance improved).
    """
    if not (0 <= source < handle.n):
        raise ValueError(f"source {source} out of range [0, {handle.n})")
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        dist = np.full(handle.n, np.inf)
        dist[source] = 0.0
        err_history: list[float] = []
        step_secs: list[float] = []
        converged = False
        limit = iters if iters is not None else max_iter
        it = 0
        for it in range(1, limit + 1):
            t0 = time.perf_counter()
            ref = ray.put(dist)
            parts = ray.get(
                [a.min_plus_gather.remote(ref, weighted) for a in actors])
            new = np.minimum(dist, np.concatenate(parts))
            changed = int((new < dist).sum())
            dist = new
            step_secs.append(time.perf_counter() - t0)
            err_history.append(float(changed))
            if iters is None and changed == 0:
                converged = True
                break
        total = sum(step_secs) or 1e-12
        return SuperstepResult(
            values=dist,
            iterations=it,
            converged=converged or iters is not None,
            err_history=err_history,
            superstep_seconds=step_secs,
            edges_per_sec=handle.m * len(step_secs) / total,
        )
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)


def bfs_hops(handle: GraphHandle, source: int, actors=None,
             *, max_iter: int = 200) -> SuperstepResult:
    """Unweighted hop distances from ``source`` (BFS; every arc costs 1)."""
    return sssp(handle, source, actors, weighted=False, max_iter=max_iter)


def pseudo_diameter(handle: GraphHandle, actors=None, *,
                    source: int | None = None,
                    max_iter: int = 200) -> dict:
    """Double-sweep diameter lower bound (the standard graph-tool
    ``pseudo_diameter`` estimator, exact on trees and usually tight in
    practice): BFS from ``source`` (default dense id 0 = the minimum vertex
    name, names are sorted at build), hop to the farthest reached vertex
    (ties -> smallest dense id, i.e. smallest name), BFS again; the second
    sweep's eccentricity is the bound. Two full BFS runs = two O(ecc)
    superstep sequences on the shared CSR actors — deterministic, so a
    two-recursion SQL replay reproduces it exactly."""
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        src = int(source) if source is not None else 0
        r1 = bfs_hops(handle, src, actors, max_iter=max_iter)
        d1 = np.where(np.isfinite(r1.values), r1.values, -1.0)
        far = int(np.argmax(d1))  # first max -> smallest dense id on ties
        r2 = bfs_hops(handle, far, actors, max_iter=max_iter)
        d2 = np.where(np.isfinite(r2.values), r2.values, -1.0)
        end = int(np.argmax(d2))
        return {
            "source": src,
            "far_node": far,
            "end_node": end,
            "pseudo_diameter": int(d2.max()),
            "supersteps": len(r1.superstep_seconds) + len(r2.superstep_seconds),
        }
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)
