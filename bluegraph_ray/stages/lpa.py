"""Community detection via semi-synchronous weighted label propagation.

The reference's ``lpa`` strategy calls NetworkX ``asyn_lpa_communities``
(/root/reference/bluegraph/backends/networkx/analyse/communities.py:116-119) —
asynchronous with RANDOM vertex order, hence nondeterministic; its own tests
assert only that the result is a full partition
(/root/reference/tests/analyse/test_communities.py:108-114). This engine runs
the distributed-standard semi-synchronous variant with a deterministic
tie-break (max total incident weight, then min label), documented divergence:
same algorithm family, deterministic and partition-parallel.

Oscillation (possible in bipartite-ish structures under synchronous updates)
is damped the standard way: a vertex only changes label when the challenger's
weight strictly exceeds the weight of its current label in its neighbourhood;
hard stop at ``max_iter``.

Message combine = per-partition weighted label histogram per dst (pandas
groupby inside the CSR actor — each dst is fully local to one partition).
"""

from __future__ import annotations

import time

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors
from bluegraph_ray.stages.pagerank import SuperstepResult
from bluegraph_ray.state.checkpoint import SuperstepCheckpoint


def label_propagation_communities(
    handle: GraphHandle,
    actors=None,
    *,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
) -> SuperstepResult:
    """-> per-vertex community label (a vertex id; canonicalize before compare)."""
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        n = handle.n
        labels = np.arange(n, dtype=np.int64)
        start_iter = 0
        ckpt = None
        err_history: list[float] = []
        step_secs: list[float] = []
        if checkpoint_dir:
            ckpt = SuperstepCheckpoint(checkpoint_dir, "lpa")
            if resume:
                latest = ckpt.latest()
                if latest is not None:
                    start_iter, state, manifest = latest
                    labels = state["label"]
                    err_history = list(manifest.get("err_history", []))
                    step_secs = list(manifest.get("superstep_seconds", []))

        converged = False
        it = start_iter
        for it in range(start_iter + 1, max_iter + 1):
            t0 = time.perf_counter()
            ref = ray.put(labels)
            parts = ray.get([a.mode_label_gather.remote(ref) for a in actors])
            new_labels = labels.copy()
            for dst_ids, winners in parts:
                new_labels[dst_ids] = winners
            changed = int((new_labels != labels).sum())
            labels = new_labels
            dt = time.perf_counter() - t0
            err_history.append(float(changed))
            step_secs.append(dt)
            if ckpt and (it % checkpoint_every == 0):
                ckpt.save(it, {"label": labels}, {"err_history": err_history,
                                                  "superstep_seconds": step_secs,
                                                  "graph_path": handle.path})
            if changed == 0:
                converged = True
                break
        if ckpt:
            ckpt.save(it, {"label": labels}, {"err_history": err_history,
                                              "superstep_seconds": step_secs,
                                              "graph_path": handle.path})
        total = sum(step_secs) or 1e-12
        return SuperstepResult(
            values=labels,
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
