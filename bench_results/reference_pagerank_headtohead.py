"""Head-to-head: this engine's PageRank supersteps vs the reference's
NetworkX backend (its analytics engine when graph-tool is absent:
/root/reference/bluegraph/backends/networkx/analyse/metrics.py:36-41 calls
nx.pagerank, which without scipy resolves to the pure-Python implementation)
on the same weighted co-occurrence graph, scores allclose 1e-6 asserted
before timing is reported.

Usage: python bench_results/reference_pagerank_headtohead.py [n_files] [cpus]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    import networkx as nx
    import ray
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    from bluegraph_ray.pipelines.cooccurrence import (
        cooccurrence_edges, occurrences_from_source)
    from bluegraph_ray.sources.synthetic import source_code_table
    from bluegraph_ray.stages.build import build_graph, make_partition_actors
    from bluegraph_ray.stages.pagerank import pagerank
    from bluegraph_ray.util import tune_context

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False)
    tune_context()
    src = source_code_table(N_FILES, seed=42, parallelism=CPUS * 4)
    edges = cooccurrence_edges(
        occurrences_from_source(src, entity="stem", factor="dir"),
        statistics=("frequency",), max_factor_entities=4000,
        num_buckets=max(16, CPUS * 2),
    ).materialize()
    epdf = edges.to_pandas()

    # ---- this engine -------------------------------------------------------
    t0 = time.perf_counter()
    handle = build_graph(edges, weight="frequency", directed=False,
                         n_partitions=CPUS)
    actors = make_partition_actors(handle, num_cpus=0.9)
    pr = pagerank(handle, actors, exchange="shm")
    t_engine = time.perf_counter() - t0
    ours = dict(zip(handle.names, pr.values))
    for a in actors:
        ray.kill(a)
    ray.shutdown()

    # ---- reference backend (pure-python nx.pagerank, alpha/tol defaults) ---
    t0 = time.perf_counter()
    g = nx.Graph()
    for s, d, w in zip(epdf["src"], epdf["dst"], epdf["frequency"]):
        g.add_edge(s, d, frequency=float(w))
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    want = _pagerank_python(g, alpha=0.85, tol=1e-6, weight="frequency")
    t_ref = time.perf_counter() - t0

    errs = np.array([abs(ours[k] - v) for k, v in want.items()])
    assert len(want) == len(ours) and errs.max() < 1e-6, errs.max()

    print(json.dumps({
        "metric": "pagerank_headtohead_seconds",
        "n_files": N_FILES, "n_vertices": len(ours),
        "n_edges_undirected": int(len(epdf)), "cpus": CPUS,
        "reference_pagerank_sec": round(t_ref, 2),
        "reference_graph_build_sec": round(t_build, 2),
        "engine_sec_incl_graph_build": round(t_engine, 2),
        "engine_iterations": pr.iterations,
        "speedup_pagerank_only": round(t_ref / t_engine, 2),
        "max_abs_err": float(errs.max()),
        "results_allclose_1e6": True,
    }))


if __name__ == "__main__":
    main()
