"""Connected components via hash-min label propagation supersteps.

The reference exposes components only through its backends' ecosystems
(NetworkX ``connected_components`` — the exact-agreement oracle per
SURVEY.md §2.5). Here: every vertex starts with label = own dense id; each
superstep every vertex takes the min of its label and its incoming neighbours'
labels (arcs are bidirected for undirected graphs, so this is the full
neighbourhood); converges when no label changes — at that point each
component's label is the minimum vertex id in the component.

Message combine = per-partition ``np.minimum.reduceat`` on the CSR actors;
O(diameter) supersteps. Checkpoint/resume identical in shape to PageRank.
"""

from __future__ import annotations

import time

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors
from bluegraph_ray.stages.pagerank import SuperstepResult
from bluegraph_ray.state.checkpoint import SuperstepCheckpoint


def connected_components(
    handle: GraphHandle,
    actors=None,
    *,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
) -> SuperstepResult:
    """-> per-vertex component label (min dense vertex id of the component)."""
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
            ckpt = SuperstepCheckpoint(checkpoint_dir, "components")
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
            parts = ray.get([a.min_label_gather.remote(ref) for a in actors])
            new_labels = np.concatenate(parts)
            changed = int((new_labels != labels).sum())
            labels = new_labels
            dt = time.perf_counter() - t0
            err_history.append(float(changed))
            step_secs.append(dt)
            if ckpt and (it % checkpoint_every == 0):
                ckpt.save(it, {"label": labels}, _manifest(err_history, step_secs, handle))
            if changed == 0:
                converged = True
                break
        if ckpt:
            ckpt.save(it, {"label": labels}, _manifest(err_history, step_secs, handle))
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


def _manifest(errs, secs, handle):
    return {
        "err_history": errs,
        "superstep_seconds": secs,
        "graph_path": handle.path,
        "n": handle.n,
        "m": handle.m,
        "partition_sizes": handle.partition_sizes,
    }
