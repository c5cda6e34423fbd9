"""Standalone (no-Ray) scaling ceiling probe for the PageRank gather kernel.

Measures the aggregate arcs/s of the cache-blocked gather (the engine's
stages/build.gather_chunked: int32 src, f32 integer-exact weights, dst-run-
aligned chunks) under plain multiprocessing at several process counts,
each level OS-confined with sched_setaffinity to exactly that many cores —
the same confinement bench.py --scaling applies via taskset. The ratio
between levels is the HARDWARE ceiling (memory bandwidth) any
implementation of this kernel can reach on this box; the engine's BSP
efficiency is judged against it, not against 1.0, because on a real
multi-node cluster every node contributes its own memory bandwidth.

Usage: python bench_results/kernel_scale.py [arcs_per_proc] [levels...]
"""
import sys, time, os
import numpy as np
import multiprocessing as mp


def chunk_bounds(starts, total, chunk_arcs=131_072):
    targets = np.arange(chunk_arcs, total, chunk_arcs)
    cuts = np.searchsorted(starts, targets, side="left")
    return np.unique(np.concatenate(([0], cuts, [len(starts)]))).astype(np.int64)


def worker(arcs, n, out_q, reps, cores):
    os.sched_setaffinity(0, cores)
    rng = np.random.default_rng(os.getpid())
    src = rng.integers(0, n, arcs).astype(np.int32)
    dst = np.sort(rng.integers(0, n, arcs))
    w = rng.integers(1, 50, arcs).astype(np.float32)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(dst)) + 1))
    uniq = dst[starts]
    cb = chunk_bounds(starts, arcs)
    xw = rng.random(n)
    scratch = np.empty(arcs)
    out = np.zeros(n)

    def gather():
        nruns = len(starts)
        for ci in range(len(cb) - 1):
            a, b = int(cb[ci]), int(cb[ci + 1])
            lo = int(starts[a])
            hi = int(starts[b]) if b < nruns else arcs
            v = scratch[: hi - lo]
            np.take(xw, src[lo:hi], out=v)
            np.multiply(v, w[lo:hi], out=v)
            out[uniq[a:b]] = np.add.reduceat(v, starts[a:b] - lo)

    gather()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        gather()
    out_q.put(reps * arcs / (time.perf_counter() - t0))


if __name__ == "__main__":
    n = 61_615
    arcs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_400_000
    levels = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8, 16, 32]
    for procs in levels:
        cores = set(range(procs))  # confine the level to exactly N cores
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(arcs, n, q, 6, cores))
              for _ in range(procs)]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        agg = sum(rates)
        print(f"procs={procs:3d} aggregate={agg / 1e6:8.0f}M arcs/s "
              f"per-proc={agg / procs / 1e6:.0f}M", flush=True)
