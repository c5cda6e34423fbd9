"""Maximal independent set via hash-priority supersteps (greedy-parallel).

The reference reaches MIS only through its backend ecosystems
(``nx.maximal_independent_set`` — randomized, so the reference itself gives
no replayable oracle; the tests assert the defining properties instead).
Distributed shape — the classic greedy-by-random-priority rounds with FIXED
priorities, which makes the result a pure function of the graph:

- every vertex gets a static 64-bit priority h(v) (splitmix-style mix of the
  vertex name — the walk_step constant family, so a SQL oracle replays it);
- per round, an undecided vertex joins the MIS iff its priority is the
  minimum of its undecided closed neighbourhood (one ``min_label_gather``
  over the priority-or-sentinel vector — own value included, which IS the
  closed-neighbourhood min);
- undecided neighbours of new MIS members drop out (a second min-gather over
  a 0/sentinel membership vector);
- repeat until no vertex is undecided. Expected O(log n) rounds for
  hash-random priorities.

Result properties (asserted in tests/test_graph_stages.py): no two MIS
vertices adjacent; every non-MIS vertex has a MIS neighbour; bitwise
identical across partition layouts. The greedy-by-priority fixpoint is
confluent, so a fixed-round unrolled-CTE SQL replay matches the converged
membership exactly (__ray_entry__.oracle_sql()["mis_parts"]).
"""

from __future__ import annotations

import time

import numpy as np

import ray

from bluegraph_ray.stages.build import (_WALK_C3, _WALK_C4, GraphHandle,
                                        make_partition_actors)
from bluegraph_ray.stages.pagerank import SuperstepResult

_SENTINEL = np.iinfo(np.int64).max


def _priorities(handle: GraphHandle) -> np.ndarray:
    """Static int64 priorities, order-isomorphic to the oracle's unsigned
    hashes: h = (name·C3)·C4 mod 2^64 for integer vertex names (the SQL
    replay hashes the same values), dense ids otherwise. The uint64 order is
    mapped to int64 by flipping the sign bit (monotone), so the int64
    min-gather compares exactly like the oracle's unsigned MIN."""
    names = np.asarray(handle.names)
    base = (names if np.issubdtype(names.dtype, np.integer)
            else np.arange(handle.n))
    with np.errstate(over="ignore"):
        h = (base.astype(np.uint64) * _WALK_C3) * _WALK_C4
    return (h ^ np.uint64(1 << 63)).view(np.int64)


def maximal_independent_set(
    handle: GraphHandle,
    actors=None,
    *,
    max_iter: int = 10_000,
) -> SuperstepResult:
    """-> per-vertex membership (values[v] = 1.0 iff v is in the MIS)."""
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        n = handle.n
        prio = _priorities(handle)
        und = np.ones(n, dtype=bool)
        mis = np.zeros(n, dtype=bool)
        err_history: list[float] = []
        step_secs: list[float] = []
        converged = False
        it = 0
        for it in range(1, max_iter + 1):
            t0 = time.perf_counter()
            key = np.where(und, prio, _SENTINEL)
            ref = ray.put(key)
            gmin = np.concatenate(
                ray.get([a.min_label_gather.remote(ref) for a in actors]))
            new_mis = und & (key == gmin) & (key != _SENTINEL)
            mis |= new_mis
            marker = np.where(new_mis, np.int64(0), _SENTINEL)
            mref = ray.put(marker)
            amin = np.concatenate(
                ray.get([a.min_label_gather.remote(mref) for a in actors]))
            und &= ~new_mis & (amin != 0)
            step_secs.append(time.perf_counter() - t0)
            err_history.append(float(int(new_mis.sum())))
            if not und.any():
                converged = True
                break
        total = sum(step_secs) or 1e-12
        return SuperstepResult(
            values=mis.astype(np.float64),
            iterations=it,
            converged=converged,
            err_history=err_history,
            superstep_seconds=step_secs,
            edges_per_sec=2 * handle.m * len(step_secs) / total,
        )
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)
