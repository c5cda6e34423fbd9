"""Job entrypoints for ``ray job submit`` / ``python -m bluegraph_ray``.

On a fixed-size multi-node cluster the intended invocation is

    ray job submit --working-dir . -- \
        python -m bluegraph_ray flagship \
            --input s3://bucket/source_code/ --output s3://bucket/out/run1 \
            --factor repo --n-partitions 256 --num-buckets 1024 \
            --checkpoint-dir s3://bucket/out/run1/ckpt

The driver-side process only coordinates: reads stream through Ray Data,
supersteps run on the CSR partition actor pool, and output is partitioned
Parquet (one file per block / key range) so a re-run with the same
``--checkpoint-dir`` resumes mid-iteration and skips finished stages.

``ray.init`` is guarded — under ``ray job submit`` the cluster connection
already exists; standalone it auto-connects to ``RAY_ADDRESS`` (or local).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    from bluegraph_ray.util import tune_context

    tune_context()


def _cmd_flagship(args: argparse.Namespace) -> dict:
    import ray.data

    from bluegraph_ray.pipelines.flagship import run_flagship
    from bluegraph_ray.sources.synthetic import source_code_table

    t0 = time.perf_counter()
    if args.input:
        # prune at the read: content only enters the sha256 invariant stage
        src = ray.data.read_parquet(
            args.input, columns=["repo", "path", "lang", "content"])
    else:
        src = source_code_table(args.synthetic, seed=args.seed)
    res = run_flagship(
        src,
        entity=args.entity,
        factor=args.factor,
        min_frequency=args.min_frequency,
        max_factor_entities=args.max_factor_entities,
        num_buckets=args.num_buckets,
        n_partitions=args.n_partitions,
        checkpoint_dir=args.checkpoint_dir,
        graph_path=args.graph_path,
    )
    if args.output:
        res.edges.write_parquet(f"{args.output}/edges")
        ray.data.from_pandas(res.vertex_table).repartition(1).write_parquet(
            f"{args.output}/vertices")
    return {
        "job": "flagship",
        "n_vertices": res.n,
        "n_arcs": res.m_arcs,
        "pagerank_iterations": res.pagerank_iterations,
        "pagerank_edges_per_sec": res.pagerank_edges_per_sec,
        "seconds": round(time.perf_counter() - t0, 3),
        "output": args.output,
    }


def _cmd_pagerank(args: argparse.Namespace) -> dict:
    import ray
    import ray.data

    from bluegraph_ray.stages.build import build_graph, make_partition_actors
    from bluegraph_ray.stages.pagerank import pagerank

    t0 = time.perf_counter()
    edges = ray.data.read_parquet(args.edges)
    handle = build_graph(
        edges,
        src=args.src,
        dst=args.dst,
        weight=args.weight,
        directed=args.directed,
        n_partitions=args.n_partitions,
        path=args.graph_path,
    )
    actors = make_partition_actors(handle, num_cpus=args.actor_cpus)
    try:
        pr = pagerank(
            handle,
            actors,
            alpha=args.alpha,
            tol=args.tol,
            max_iter=args.max_iters,
            checkpoint_dir=args.checkpoint_dir,
            resume=bool(args.checkpoint_dir),
        )
    finally:
        for a in actors:
            ray.kill(a)
    if args.output:
        import pandas as pd

        out = pd.DataFrame({"node": handle.names, "pagerank": pr.values})
        ray.data.from_pandas(out).write_parquet(args.output)
    return {
        "job": "pagerank",
        "n_vertices": handle.n,
        "n_arcs": handle.m,
        "iterations": pr.iterations,
        "converged": pr.converged,
        "edges_per_sec_per_superstep": pr.edges_per_sec,
        "seconds": round(time.perf_counter() - t0, 3),
        "output": args.output,
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m bluegraph_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="source table -> co-occurrence graph "
                       "-> PageRank/CC/LPA vertex table")
    f.add_argument("--input", help="parquet of (repo,path,commit,lang,content)")
    f.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic source files instead of --input")
    f.add_argument("--seed", type=int, default=42)
    f.add_argument("--entity", default="stem")
    f.add_argument("--factor", default="repo", choices=["repo", "dir", "lang"])
    f.add_argument("--min-frequency", type=int, default=1)
    f.add_argument("--max-factor-entities", type=int, default=2000)
    f.add_argument("--num-buckets", type=int, default=64)
    f.add_argument("--n-partitions", type=int, default=8)
    f.add_argument("--checkpoint-dir")
    f.add_argument("--graph-path")
    f.add_argument("--output")
    f.set_defaults(fn=_cmd_flagship)

    g = sub.add_parser("pagerank", help="edge parquet -> pagerank parquet")
    g.add_argument("--edges", required=True)
    g.add_argument("--src", default="src")
    g.add_argument("--dst", default="dst")
    g.add_argument("--weight", default=None)
    g.add_argument("--directed", action="store_true")
    g.add_argument("--alpha", type=float, default=0.85)
    g.add_argument("--tol", type=float, default=1e-6)
    g.add_argument("--max-iters", type=int, default=100)
    g.add_argument("--n-partitions", type=int, default=16)
    g.add_argument("--actor-cpus", type=float, default=0.5)
    g.add_argument("--checkpoint-dir")
    g.add_argument("--graph-path")
    g.add_argument("--output")
    g.set_defaults(fn=_cmd_pagerank)

    args = p.parse_args(argv)
    if args.cmd == "flagship" and not args.input and not args.synthetic:
        p.error("flagship needs --input or --synthetic N")
    _ensure_ray()
    print(json.dumps(args.fn(args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
