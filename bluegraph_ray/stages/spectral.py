"""Eigenvector and Katz centrality — spectral power-iteration supersteps.

The reference reaches these only through its backend ecosystems
(``nx.eigenvector_centrality`` / ``nx.katz_centrality`` are the exact
oracles, the same SURVEY.md §2.5 contract as PageRank). Both are one
weighted gather per superstep on the shared CsrPartition actors plus an
O(n) driver-side vector update:

- eigenvector: x' = x + A·x (nx's (I + A) iteration — the +x term damps the
  bipartite odd/even oscillation of the plain power method), then L2
  normalization; converges to the principal eigenvector.
- Katz: x' = α·A·x + β (α below 1/λ_max for convergence, nx defaults
  α=0.1, β=1), L2-normalized once at the end.

Convergence rule matches nx: L1(x' − x) < n·tol on the working vector
(post-normalization for eigenvector, raw for Katz). Fixed ``iters`` counts
replay exactly in SQL (window-normalized recursive CTE —
__ray_entry__.oracle_sql()["eigenvector_power12"]).
"""

from __future__ import annotations

import time

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors
from bluegraph_ray.stages.pagerank import SuperstepResult


def _power_loop(handle, actors, update, x0, max_iter, iters, thresh,
                finalize=None):
    """Shared superstep loop: gather -> update(x, gathered) -> (x', err);
    stop at err < thresh (or after exactly ``iters`` steps when given)."""
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        x = x0
        err_history: list[float] = []
        step_secs: list[float] = []
        converged = False
        limit = iters if iters is not None else max_iter
        it = 0
        for it in range(1, limit + 1):
            t0 = time.perf_counter()
            xref = ray.put(x)  # one object-store copy per superstep, shared
            gathered = np.concatenate(
                ray.get([a.pr_gather.remote(xref) for a in actors]))
            x, err = update(x, gathered)
            step_secs.append(time.perf_counter() - t0)
            err_history.append(err)
            if iters is None and err < thresh:
                converged = True
                break
        if finalize is not None:
            x = finalize(x)
        total = sum(step_secs) or 1e-12
        return SuperstepResult(
            values=x, iterations=it,
            converged=converged or iters is not None,
            err_history=err_history, superstep_seconds=step_secs,
            edges_per_sec=handle.m * len(step_secs) / total,
        )
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)


def eigenvector_centrality(
    handle: GraphHandle,
    actors=None,
    *,
    max_iter: int = 1000,
    tol: float = 1e-6,
    iters: int | None = None,
) -> SuperstepResult:
    """nx.eigenvector_centrality parity: (I + A) power iteration, L2
    normalization per step, stop at L1 change < n·tol."""
    def update(x, gathered):
        y = x + gathered
        y /= np.sqrt((y * y).sum()) or 1.0
        return y, float(np.abs(y - x).sum())

    x0 = np.full(handle.n, 1.0 / handle.n, dtype=np.float64)
    return _power_loop(handle, actors, update, x0, max_iter, iters,
                       handle.n * tol)


def katz_centrality(
    handle: GraphHandle,
    actors=None,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-6,
    iters: int | None = None,
) -> SuperstepResult:
    """nx.katz_centrality parity: x' = α·A·x + β from x0 = 0, stop at
    L1 change < n·tol, one final L2 normalization."""
    def update(x, gathered):
        y = alpha * gathered + beta
        return y, float(np.abs(y - x).sum())

    def finalize(x):
        return x / (np.sqrt((x * x).sum()) or 1.0)

    x0 = np.zeros(handle.n, dtype=np.float64)
    return _power_loop(handle, actors, update, x0, max_iter, iters,
                       handle.n * tol, finalize)
