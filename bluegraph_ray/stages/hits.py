"""HITS hubs & authorities via distributed half-step supersteps.

The reference reaches HITS only through its backend ecosystems (``nx.hits``
is the oracle — the same SURVEY.md §2.5 contract as PageRank). Each
half-step is one weighted gather on the shared CsrPartition actors
(``y(v) = Σ over in-arcs of w(u,v)·x(u)`` — the raw ``pr_gather`` kernel fed
the UN-normalized vector, no out-weight scaling) followed by an O(n)
driver-side L1 normalization. Alternating half-steps produce
authorities (odd) and hubs (even); the update is linear, so per-half-step
L1 normalization yields the same normalized sequence as nx's
normalize-by-max-then-sum — converged vectors agree with ``nx.hits`` to
the shared tolerance, and a fixed half-step count is exactly replayable by
a recursive-CTE window normalization (oracle_sql()["hits_power8"]).

Undirected handles only: their CSR stores both arc directions, so the one
forward gather IS both A·x and Aᵀ·x (hubs == authorities at the fixpoint,
as nx gives on undirected graphs). A directed HITS needs the transpose
graph's CSR for the hub half-step — build a second handle with src/dst
swapped and pass it as ``transpose``.
"""

from __future__ import annotations

import time

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors
from bluegraph_ray.stages.pagerank import SuperstepResult


def hits(
    handle: GraphHandle,
    actors=None,
    *,
    max_iter: int = 100,
    tol: float = 1e-8,
    iters: int | None = None,
    transpose: GraphHandle | None = None,
    transpose_actors=None,
) -> tuple[SuperstepResult, SuperstepResult]:
    """-> (hubs, authorities), each L1-normalized. ``iters`` forces an exact
    full-iteration count (two half-steps each — the fixed-depth oracle
    replay); otherwise runs until L1(h' − h) < n·tol."""
    if handle.directed and transpose is None:
        raise ValueError(
            "directed HITS needs the transpose graph's CSR for the hub "
            "half-step; build a handle with src/dst swapped and pass it "
            "as transpose=")
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    own_t = transpose is not None and transpose_actors is None
    if transpose is not None and transpose_actors is None:
        transpose_actors = make_partition_actors(transpose)
    fwd = actors                      # auth half-step: Aᵀ·h (in-arcs)
    bwd = transpose_actors or actors  # hub half-step: A·a
    try:
        n = handle.n
        h = np.full(n, 1.0 / n, dtype=np.float64)
        a = np.zeros(n, dtype=np.float64)
        err_history: list[float] = []
        step_secs: list[float] = []
        converged = False
        limit = iters if iters is not None else max_iter
        it = 0
        for it in range(1, limit + 1):
            t0 = time.perf_counter()
            href = ray.put(h)  # one object-store copy per half-step, shared
            a = np.concatenate(
                ray.get([p.pr_gather.remote(href) for p in fwd]))
            a /= a.sum() or 1.0
            aref = ray.put(a)
            h_new = np.concatenate(
                ray.get([p.pr_gather.remote(aref) for p in bwd]))
            h_new /= h_new.sum() or 1.0
            err = float(np.abs(h_new - h).sum())
            h = h_new
            step_secs.append(time.perf_counter() - t0)
            err_history.append(err)
            if iters is None and err < n * tol:
                converged = True
                break
        total = sum(step_secs) or 1e-12
        mk = lambda v: SuperstepResult(  # noqa: E731 — two mirrored results
            values=v, iterations=it,
            converged=converged or iters is not None,
            err_history=err_history, superstep_seconds=step_secs,
            edges_per_sec=2 * handle.m * len(step_secs) / total,
        )
        return mk(h), mk(a)
    finally:
        if own_actors:
            for p in actors:
                ray.kill(p)
        if own_t:
            for p in transpose_actors:
                ray.kill(p)
