"""bluegraph_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the query / data-processing capabilities of
BlueBrain/BlueGraph (reference at /root/reference, snapshot 2024-08-07) on top of
``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches`` stages, actor pools
for stateful supersteps, ``groupby``/``aggregate`` for the wide shuffles.

Layout
------
- ``functions``  — pure vectorized kernels (PMI family, set ops, text stats, hashing)
- ``sources``    — input readers + the deterministic synthetic source-code table
- ``pipelines``  — end-to-end dataset pipelines (co-occurrence edge build, dedup,
                   similarity search, windowed aggregates, text quality)
- ``stages``     — graph operators (degree, PageRank, connected components, LPA,
                   triangles, paths, modularity) over the edge table
- ``state``      — superstep checkpoint/resume with per-partition lineage

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions are owned
by the caller (tests' conftest fixture, ``bench.py``, or the driver).
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large allocations on the sbrk heap instead of per-call mmap.

    glibc services allocations above M_MMAP_THRESHOLD (default 128 KiB) with a
    fresh ``mmap`` and releases them with ``munmap`` on free.  Under this VM
    every such cycle re-faults the whole buffer, so numpy temporaries in hot
    vectorized loops (pair generation, gather-scatter supersteps) spend most of
    their wall time in page faults rather than compute — measured 19.3 s → 1.3 s
    on the co-occurrence pair loop.  Raising the threshold (and disabling heap
    trimming) makes freed large buffers reusable without re-faulting.  Applied
    at import time so every Ray worker that deserializes one of our map
    functions inherits it without env plumbing.
    """
    import ctypes
    import ctypes.util

    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:  # non-glibc platform — harmless to skip
        pass


_tune_malloc()
