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
