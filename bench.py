"""Benchmark harness — headline: PageRank edges/sec per superstep on the
source-code co-occurrence graph (the BASELINE.json target metric), plus the
pipeline stage timings.

Plain run:     prints ONE JSON line with per-query seconds.
--scaling:     runs the same job in two fresh processes (RAY_GRAFT_CPUS=8 and
               =32) and reports both throughputs + scaling efficiency — the
               in-sandbox evidence for the N -> 4N cluster-size criterion
               (ray job submit on a real multi-node cluster would use the same
               entry point; parallelism here maps to partition count).

The graph input is the deterministic synthetic source-code table (seed 42)
sized from GRAFT_SF_DIR's sf suffix (sf0.1 -> 200k files); the relational
queries run over $GRAFT_SF_DIR parquet.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from bluegraph_ray.util import tune_context

    tune_context(num_cpus)

    import ray.data

    from bluegraph_ray.pipelines.cooccurrence import (
        cooccurrence_edges,
        occurrences_from_source,
    )
    from bluegraph_ray.sources.synthetic import source_code_table, with_sha256
    from bluegraph_ray.stages.build import build_graph, make_partition_actors, out_weights
    from bluegraph_ray.stages.components import connected_components
    from bluegraph_ray.stages.degree import degree_centrality
    from bluegraph_ray.stages.lpa import label_propagation_communities
    from bluegraph_ray.stages.pagerank import pagerank

    sf = _sf_of(sf_dir)
    n_files = max(2000, int(sf * 2_000_000))
    queries: dict[str, float] = {}
    extra: dict = {}
    t_all = time.perf_counter()

    # ---- source table -> sha256 -> occurrences -> edge table -------------
    t0 = time.perf_counter()
    src = with_sha256(source_code_table(n_files, seed=42, parallelism=num_cpus * 4))
    occ = occurrences_from_source(src, entity="stem", factor="dir")
    edges = cooccurrence_edges(
        occ,
        statistics=("frequency", "ppmi", "npmi"),
        max_factor_entities=4000,
        num_buckets=max(64, num_cpus * 4),
    )
    edges = edges.filter(expr="ppmi > 0").materialize()
    m_undirected = edges.count()
    queries["cooc_build"] = round(time.perf_counter() - t0, 3)

    # ---- graph build (ids + CSR partitions) ------------------------------
    t0 = time.perf_counter()
    import tempfile

    gpath = tempfile.mkdtemp(prefix=f"bgray_bench_{num_cpus}_")
    handle = build_graph(
        edges, weight="frequency", directed=False,
        n_partitions=num_cpus, path=gpath,
    )
    actors = make_partition_actors(handle, num_cpus=0.9)
    out_weights(handle, actors)  # warm the actors (parquet load happens here)
    queries["graph_build"] = round(time.perf_counter() - t0, 3)

    # ---- headline: PageRank supersteps -----------------------------------
    t0 = time.perf_counter()
    pr = pagerank(handle, actors)
    queries["pagerank"] = round(time.perf_counter() - t0, 3)
    extra["pagerank_iterations"] = pr.iterations
    extra["pagerank_converged"] = pr.converged
    extra["edges_per_sec_per_superstep"] = round(pr.edges_per_sec, 1)
    extra["n_vertices"] = handle.n
    extra["n_arcs"] = handle.m
    extra["n_edges_undirected"] = m_undirected

    t0 = time.perf_counter()
    cc = connected_components(handle, actors)
    queries["connected_components"] = round(time.perf_counter() - t0, 3)
    extra["cc_iterations"] = cc.iterations

    t0 = time.perf_counter()
    lpa = label_propagation_communities(handle, actors, max_iter=20)
    queries["lpa"] = round(time.perf_counter() - t0, 3)
    extra["lpa_iterations"] = lpa.iterations

    for a in actors:
        ray.kill(a)

    # ---- degree (pure Ray Data shuffle) ----------------------------------
    t0 = time.perf_counter()
    degree_centrality(edges, weight="frequency").materialize()
    queries["degree"] = round(time.perf_counter() - t0, 3)

    # ---- relational stages over $GRAFT_SF_DIR ----------------------------
    if os.path.isdir(sf_dir):
        import __ray_entry__ as entrymod

        for name in ("pricing_summary", "events_hourly", "dedup_exact"):
            t0 = time.perf_counter()
            res = entrymod.queries()[name](sf_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            queries[name] = round(time.perf_counter() - t0, 3)

    total = round(time.perf_counter() - t_all, 3)
    out = {
        "metric": "flagship_pipeline_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        **extra,
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    import subprocess

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    one(lo)  # untimed warm-up: page cache + parquet footer caches
    r_lo = one(lo)
    r_hi = one(hi)
    thr_lo = r_lo["edges_per_sec_per_superstep"]
    thr_hi = r_hi["edges_per_sec_per_superstep"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "edges_per_sec_per_superstep_lo": thr_lo,
        "edges_per_sec_per_superstep_hi": thr_hi,
        "pagerank_sec_lo": r_lo["queries"]["pagerank"],
        "pagerank_sec_hi": r_hi["queries"]["pagerank"],
        "total_sec_lo": r_lo["value"],
        "total_sec_hi": r_hi["value"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
