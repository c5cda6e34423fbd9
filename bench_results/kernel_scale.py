import sys, time, os
import numpy as np
import multiprocessing as mp
import ctypes
def worker(arcs, n, out_q, reps):
    libc = ctypes.CDLL("libc.so.6"); libc.mallopt(-3, 1<<30); libc.mallopt(-1, 1<<30)
    rng = np.random.default_rng(os.getpid())
    src = rng.integers(0, n, arcs)
    dst = np.sort(rng.integers(0, n, arcs))
    w = rng.integers(1,5,arcs).astype(np.float64)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(dst))+1))
    xw = rng.random(n)
    vals = np.empty(arcs)
    # warm
    np.take(xw, src, out=vals); np.multiply(vals, w, out=vals); s=np.add.reduceat(vals, starts)
    t0=time.perf_counter()
    for _ in range(reps):
        np.take(xw, src, out=vals)
        np.multiply(vals, w, out=vals)
        s = np.add.reduceat(vals, starts)
    out_q.put(reps*arcs/(time.perf_counter()-t0))
if __name__ == "__main__":
    n = 61615
    arcs = 8_400_000
    for procs in (1, 4, 8, 16, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(arcs, n, q, 6)) for _ in range(procs)]
        t0=time.perf_counter()
        for p in ps: p.start()
        rates = [q.get() for _ in ps]
        for p in ps: p.join()
        agg = sum(rates)
        print(f"procs={procs:3d} aggregate={agg/1e6:８.0f}M arcs/s per-proc={agg/procs/1e6:.0f}M", flush=True)
