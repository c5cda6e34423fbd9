"""Distributed PageRank supersteps with NetworkX-parity semantics.

Semantics match ``nx.pagerank`` exactly (the reference's backend call,
/root/reference/bluegraph/backends/networkx/analyse/metrics.py:36-41;
graph-tool variant at backends/graph_tool/analyse/metrics.py:46-56):

- undirected graphs are treated as bidirected (nx ``stochastic_graph`` over
  ``G.to_directed()``), handled at build time by arc duplication;
- arc weights normalized by the source's total out-weight;
- start vector 1/n; per superstep
  ``x'(v) = α·Σ_u x(u)·ŵ(u,v) + α·(Σ_dangling x)/n + (1-α)/n``;
- convergence when L1(x' - x) < n·tol (α=0.85, tol=1e-6, max_iter=100
  defaults, matching the reference oracle).

Execution: one gather per superstep across the CSR partition actors (message
combine = per-partition ``np.add.reduceat`` — each dst lives in exactly one
partition so no cross-partition reduce is needed), then a driver-side O(n)
vector update (the vertex-state join). The rank vector is broadcast once per
superstep via ``ray.put`` (plasma shared memory; at multi-node scale the
vector shards along the same dst ranges and the broadcast becomes a key-aligned
join — see stages/build.py docstring).

Determinism: partition boundaries depend only on (n, n_partitions), reduceat
order is storage order, and slices are assembled in fixed partition order —
results are bitwise identical across num_cpus settings, which is what makes
resume-from-checkpoint equal a fresh run.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors, out_weights
from bluegraph_ray.state.checkpoint import SuperstepCheckpoint


class _PlasmaExchange:
    """Default rank-vector exchange: ``ray.put`` broadcast + per-actor dense
    slices gathered and concatenated in fixed partition order. This is the
    path that generalizes to multi-node (plasma replicates the object per
    node on first access)."""

    def __init__(self, n: int):
        self.n = n

    def superstep(self, actors, xw: np.ndarray) -> np.ndarray:
        ref = ray.put(xw)
        return np.concatenate(ray.get([a.pr_gather.remote(ref) for a in actors]))

    def close(self) -> None:
        pass


class _ShmExchange:
    """Node-local shared-segment exchange: the broadcast vector and the
    contribution vector live in two /dev/shm mappings; a superstep is one
    0.5·n-word write, a barrier of tiny RPCs, and disjoint [lo,hi) slice
    writes by the actors. Bitwise-identical results to _PlasmaExchange
    (same kernels, same order) at a fraction of the per-superstep IPC cost —
    in this sandbox plasma object creation/mapping dominates small-superstep
    wall time. Single-node only by construction: it is the degenerate case of
    the per-node collective (on a cluster, each node holds these segments and
    plasma/ray-collective moves the cross-node shards)."""

    def __init__(self, n: int):
        import tempfile

        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        self.dir = tempfile.mkdtemp(prefix="bgray_exch_", dir=base)
        self.path_in = os.path.join(self.dir, "xw.f64")
        self.path_out = os.path.join(self.dir, "contrib.f64")
        self.n = n
        self._in = np.memmap(self.path_in, dtype=np.float64, mode="w+", shape=(n,))
        self._out = np.memmap(self.path_out, dtype=np.float64, mode="w+", shape=(n,))

    def superstep(self, actors, xw: np.ndarray) -> np.ndarray:
        self._in[:] = xw
        ray.get([a.pr_gather_shm.remote(self.path_in, self.path_out, self.n)
                 for a in actors])
        return np.array(self._out)

    def close(self) -> None:
        import shutil

        shutil.rmtree(self.dir, ignore_errors=True)


def _make_exchange(n: int, exchange: str):
    """exchange: "plasma" | "shm" | "auto" (shm when /dev/shm exists)."""
    if exchange == "shm" or (exchange == "auto" and os.path.isdir("/dev/shm")):
        return _ShmExchange(n)
    return _PlasmaExchange(n)


@dataclass
class SuperstepResult:
    values: np.ndarray              # per-vertex result, index = dense vertex id
    iterations: int
    converged: bool
    err_history: list = field(default_factory=list)
    superstep_seconds: list = field(default_factory=list)
    edges_per_sec: float = 0.0

    def as_dict(self, handle: GraphHandle) -> dict:
        return {str(k): v for k, v in zip(handle.names, self.values)}


def _teleport_vector(n: int, personalization) -> np.ndarray | None:
    """Normalize a personalization spec to an L1-unit dense vector, or None
    for the uniform teleport. Accepts a dense array (sparse seeds as zeros)
    or an iterable of seed vertex ids (uniform over the seed set) — the
    nx.pagerank ``personalization`` semantics on dense ids.

    Ambiguous specs raise instead of guessing: pass an explicit
    ``{"weights": arr}`` / ``{"seeds": ids}`` dict to disambiguate (an
    integer array is ALWAYS a seed list; a dense weight vector must be
    float-typed and exactly length n)."""
    if personalization is None:
        return None
    p = np.zeros(n, dtype=np.float64)
    if isinstance(personalization, dict):
        if set(personalization) == {"weights"}:
            arr = np.asarray(personalization["weights"], dtype=np.float64)
            if arr.shape != (n,):
                raise ValueError(
                    f"weights must have shape ({n},), got {arr.shape}")
            p[:] = arr
        elif set(personalization) == {"seeds"}:
            p[_checked_seed_ids(personalization["seeds"], n)] = 1.0
        else:
            raise ValueError(
                "personalization dict must have exactly one key, "
                "'weights' or 'seeds'")
    else:
        arr = np.asarray(personalization)
        if np.issubdtype(arr.dtype, np.integer):
            p[_checked_seed_ids(arr, n)] = 1.0  # uniform over the seed set
        elif arr.shape == (n,) and np.issubdtype(arr.dtype, np.floating):
            p[:] = arr  # dense weight vector
        else:
            raise ValueError(
                "ambiguous personalization: pass integer seed ids, a "
                f"float array of shape ({n},), or an explicit "
                "{'weights': ...} / {'seeds': ...} dict "
                f"(got dtype={arr.dtype}, shape={arr.shape})")
    s = p.sum()
    if s <= 0:
        raise ValueError("personalization must have positive total mass")
    return p / s


def _checked_seed_ids(seeds, n: int) -> np.ndarray:
    ids = np.asarray(seeds)
    if ids.size and not np.issubdtype(ids.dtype, np.integer):
        if not np.all(ids == np.floor(ids)):
            raise ValueError("seed ids must be integers")
    ids = ids.astype(np.int64)
    if ids.size and (ids.min() < 0 or ids.max() >= n):
        raise ValueError(
            f"seed ids out of range [0, {n}): min={ids.min()}, "
            f"max={ids.max()}")
    return ids


def pagerank(
    handle: GraphHandle,
    actors=None,
    *,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    personalization=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    exchange: str = "plasma",
) -> SuperstepResult:
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    exch = _make_exchange(handle.n, exchange)
    try:
        n = handle.n
        outw = out_weights(handle, actors)
        dangling = outw == 0.0
        inv_outw = np.where(dangling, 0.0, 1.0 / np.where(dangling, 1.0, outw))

        p = _teleport_vector(n, personalization)
        # nx parity: the START vector stays uniform even when the teleport
        # is personalized (nstart defaults to 1/n in nx.pagerank)
        x = np.full(n, 1.0 / n, dtype=np.float64)
        start_iter = 0
        ckpt = None
        err_history: list[float] = []
        step_secs: list[float] = []
        if checkpoint_dir:
            ckpt = SuperstepCheckpoint(checkpoint_dir, "pagerank")
            if resume:
                latest = ckpt.latest()
                if latest is not None:
                    start_iter, state, manifest = latest
                    x = state["rank"]
                    err_history = list(manifest.get("err_history", []))
                    step_secs = list(manifest.get("superstep_seconds", []))
                    if manifest.get("converged"):
                        # the job already finished: re-running must return
                        # the converged state verbatim, not advance it
                        # another superstep past the stop rule
                        return SuperstepResult(
                            values=x,
                            iterations=start_iter,
                            converged=True,
                            err_history=err_history,
                            superstep_seconds=step_secs,
                            edges_per_sec=handle.m * len(step_secs)
                            / (sum(step_secs) or 1e-12),
                        )

        converged = False
        it = start_iter
        for it in range(start_iter + 1, max_iter + 1):
            t0 = time.perf_counter()
            contrib = exch.superstep(actors, x * inv_outw)
            danglesum = alpha * float(x[dangling].sum())
            if p is None:
                x_new = alpha * contrib + danglesum / n + (1.0 - alpha) / n
            else:
                # nx semantics: dangling mass and teleport both follow p
                x_new = alpha * contrib + (danglesum + (1.0 - alpha)) * p
            err = float(np.abs(x_new - x).sum())
            x = x_new
            dt = time.perf_counter() - t0
            err_history.append(err)
            step_secs.append(dt)
            if ckpt and (it % checkpoint_every == 0):
                _save(ckpt, it, x, err_history, step_secs, handle)
            if err < n * tol:
                converged = True
                break
        if ckpt:
            _save(ckpt, it, x, err_history, step_secs, handle,
                  converged=converged)
        total = sum(step_secs) or 1e-12
        return SuperstepResult(
            values=x,
            iterations=it,
            converged=converged,
            err_history=err_history,
            superstep_seconds=step_secs,
            edges_per_sec=handle.m * len(step_secs) / total,
        )
    finally:
        exch.close()
        if own_actors:
            for a in actors:
                ray.kill(a)


def power_iterations(handle: GraphHandle, actors, *, iters: int = 20,
                     alpha: float = 0.85, personalization=None,
                     exchange: str = "plasma") -> dict:
    """Run exactly ``iters`` PageRank supersteps (no convergence check) and
    report sustained throughput — the bench's measurement loop. Semantics per
    superstep are identical to :func:`pagerank` (incl. ``personalization``
    teleport); only the stop rule differs, so the measured cost per superstep
    is the real one."""
    n = handle.n
    outw = out_weights(handle, actors)
    dangling = outw == 0.0
    inv_outw = np.where(dangling, 0.0, 1.0 / np.where(dangling, 1.0, outw))
    p = _teleport_vector(n, personalization)
    x = np.full(n, 1.0 / n, dtype=np.float64)  # uniform start, nx parity
    exch = _make_exchange(n, exchange)
    step_secs = []
    try:
        t0 = time.perf_counter()
        for _ in range(iters):
            t1 = time.perf_counter()
            contrib = exch.superstep(actors, x * inv_outw)
            danglesum = alpha * float(x[dangling].sum())
            if p is None:
                x = alpha * contrib + danglesum / n + (1.0 - alpha) / n
            else:
                x = alpha * contrib + (danglesum + (1.0 - alpha)) * p
            step_secs.append(time.perf_counter() - t1)
        dt = time.perf_counter() - t0
    finally:
        exch.close()
    med = float(np.median(step_secs))
    return {
        "iters": iters,
        "seconds": dt,
        "sec_per_superstep": dt / iters,
        # median is the sustained-throughput estimator: robust to the
        # sandbox's CPU-throttle spikes (individual supersteps vary several x
        # on identical work); mean-based numbers are kept alongside
        "sec_per_superstep_median": med,
        "edges_per_sec_per_superstep": handle.m * iters / dt,
        "edges_per_sec_per_superstep_median": handle.m / med if med > 0 else 0.0,
        "superstep_seconds": [round(s, 4) for s in step_secs],
        "values": x,
    }


def _save(ckpt, it, x, errs, secs, handle, converged=False):
    ckpt.save(
        it,
        {"rank": x},
        {
            "err_history": errs,
            "superstep_seconds": secs,
            "converged": converged,
            "graph_path": handle.path,
            "n": handle.n,
            "m": handle.m,
            "partition_sizes": handle.partition_sizes,
        },
    )
