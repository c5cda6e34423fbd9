"""k-core decomposition via distributed peeling supersteps.

The reference reaches cores only through its backend ecosystems
(``nx.k_core`` / ``nx.core_number`` are the exact oracles — the same
SURVEY.md §2.5 contract as components/triangles). Distributed shape: the
survivors are one dense boolean vector; each peel round is ONE gather on the
same CsrPartition actors PageRank rides — alive-degree(v) = Σ over in-arcs of
alive[u] (the unit-weight ``unit_gather`` kernel) —
followed by an O(n) driver-side mask update ``alive &= deg >= k``. Peeling is
monotone (survivor set only shrinks) and confluent, so the fixpoint is
independent of round count beyond convergence — which is what lets a
fixed-round chained-CTE SQL replay reproduce the converged membership
(__ray_entry__.oracle_sql()["kcore_parts"]).

``core_number`` runs the same loop with k escalating: the k-core peel starts
from the (k-1)-core's survivors (strictly less work per level than fresh
peels), and a vertex's coreness is the largest k it survives. Total gathers =
Σ_k rounds_k — O(max-core · peel-depth) supersteps, each O(m/P) per
partition.

Weighted handles peel identically to unweighted ones: the alive-degree
gather uses UNIT arc weights (CsrPartition.unit_gather) regardless of the
graph's weight column.
"""

from __future__ import annotations

import time

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors
from bluegraph_ray.stages.pagerank import SuperstepResult


def _alive_degree(actors, alive: np.ndarray) -> np.ndarray:
    ref = ray.put(alive)
    return np.concatenate(ray.get([a.unit_gather.remote(ref) for a in actors]))


def k_core(
    handle: GraphHandle,
    k: int,
    actors=None,
    *,
    max_iter: int = 10_000,
    _start: np.ndarray | None = None,
) -> SuperstepResult:
    """-> per-vertex membership (values[v] = 1.0 iff v is in the k-core).

    ``_start``: survivor mask to peel from (internal — ``core_number``'s
    incremental escalation); defaults to all vertices.
    """
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        alive = (np.ones(handle.n) if _start is None
                 else _start.astype(np.float64, copy=True))
        err_history: list[float] = []
        step_secs: list[float] = []
        converged = False
        it = 0
        for it in range(1, max_iter + 1):
            t0 = time.perf_counter()
            deg = _alive_degree(actors, alive)
            new_alive = alive * (deg >= k)
            changed = int((new_alive != alive).sum())
            alive = new_alive
            step_secs.append(time.perf_counter() - t0)
            err_history.append(float(changed))
            if changed == 0:
                converged = True
                break
        total = sum(step_secs) or 1e-12
        return SuperstepResult(
            values=alive,
            iterations=it,
            converged=converged,
            err_history=err_history,
            superstep_seconds=step_secs,
            edges_per_sec=handle.m * len(step_secs) / total,
        )
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)


def core_number(handle: GraphHandle, actors=None, *,
                max_iter: int = 10_000) -> SuperstepResult:
    """-> per-vertex core number (largest k whose k-core contains the
    vertex; isolated vertices get 0). nx.core_number parity."""
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        coreness = np.zeros(handle.n, dtype=np.int64)
        alive = np.ones(handle.n)
        iters = 0
        err_history: list[float] = []
        step_secs: list[float] = []
        k = 1
        while alive.any():
            res = k_core(handle, k, actors, max_iter=max_iter, _start=alive)
            alive = res.values
            coreness[alive > 0] = k
            iters += res.iterations
            err_history.extend(res.err_history)
            step_secs.extend(res.superstep_seconds)
            k += 1
        total = sum(step_secs) or 1e-12
        return SuperstepResult(
            values=coreness,
            iterations=iters,
            converged=True,
            err_history=err_history,
            superstep_seconds=step_secs,
            edges_per_sec=handle.m * len(step_secs) / total,
        )
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)
