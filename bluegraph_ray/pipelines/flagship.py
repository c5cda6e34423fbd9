"""The flagship end-to-end pipeline (SURVEY.md §3.1 re-expressed on Ray Data).

Mirrors the reference's ``generate_cooccurrence_analysis``
(/root/reference/cord19kg/utils.py:544-734): occurrence table -> co-occurrence
edges with frequency/PPMI/NPMI -> positive-PMI filter -> graph metrics
(degree, PageRank) -> communities (LPA) -> components -> per-stage outputs —
but streaming, partitioned, and checkpointable.

Input is the source-code table (repo, path, commit, lang, content); the
``sha256(content)`` invariant is attached before any transform and verified by
the caller after the run (tests/test_flagship.py).
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.pipelines.cooccurrence import (
    cooccurrence_edges,
    occurrences_from_source,
)
from bluegraph_ray.sources.synthetic import with_sha256
from bluegraph_ray.stages.build import build_graph, make_partition_actors
from bluegraph_ray.stages.components import connected_components
from bluegraph_ray.stages.degree import degree_centrality
from bluegraph_ray.stages.lpa import label_propagation_communities
from bluegraph_ray.stages.pagerank import pagerank


@dataclass
class FlagshipResult:
    edges: "ray.data.Dataset"
    vertex_table: pd.DataFrame  # node, pagerank, component, community, degree
    n: int
    m_arcs: int
    pagerank_iterations: int
    pagerank_edges_per_sec: float
    superstep_seconds: list


def run_flagship(
    source: "ray.data.Dataset",
    *,
    entity: str = "stem",
    factor: str = "repo",
    min_frequency: int = 1,
    max_factor_entities: int | None = 2000,
    num_buckets: int = 64,
    n_partitions: int = 8,
    actor_num_cpus: float = 0.5,
    checkpoint_dir: str | None = None,
    graph_path: str | None = None,
) -> FlagshipResult:
    # 1. invariant stage + occurrence extraction (content is dropped right after)
    src = with_sha256(source)
    occ = occurrences_from_source(src, entity=entity, factor=factor)
    # the source table fans out over many small generation/read blocks while
    # the occurrence table is ~1 row/file — coalesce before the shuffles
    # (groupby cost scales with input-block x reduce-partition count)
    occ = occ.materialize().repartition(max(4, num_buckets // 2)).materialize()

    # 2. co-occurrence edge table (3 shuffles, see pipelines/cooccurrence.py).
    # decode_names=False: edges stay dense int ids end-to-end — no string
    # ever enters the graph build or the shuffles (SURVEY §7.4: "never
    # shuffle content"; same logic for vertex names).
    info: dict = {}
    edges = cooccurrence_edges(
        occ,
        statistics=("frequency", "ppmi", "npmi"),
        min_frequency=min_frequency,
        max_factor_entities=max_factor_entities,
        num_buckets=num_buckets,
        decode_names=False,
        info_out=info,
    )
    # 3. positive-PMI filter (the reference's remove_zero_mi,
    #    /root/reference/cord19kg/utils.py:661-662)
    edges = edges.filter(expr="ppmi > 0").materialize()

    # 4. graph build + iterative metrics over one shared actor pool
    handle = build_graph(
        edges, weight="frequency", directed=False,
        n_partitions=n_partitions, path=graph_path,
        names=info["names"], pre_encoded=True,
    )
    actors = make_partition_actors(handle, num_cpus=actor_num_cpus)
    try:
        pr = pagerank(handle, actors, checkpoint_dir=checkpoint_dir,
                      exchange="auto")
        cc = connected_components(handle, actors, checkpoint_dir=checkpoint_dir)
        lpa = label_propagation_communities(handle, actors, checkpoint_dir=checkpoint_dir)
    finally:
        import ray as _ray

        for a in actors:
            _ray.kill(a)

    deg = degree_centrality(edges, weight="frequency").to_pandas()
    deg["node"] = info["names"][deg["node"].to_numpy(dtype=np.int64)]
    vt = pd.DataFrame(
        {
            "node": handle.names,
            "pagerank": pr.values,
            "component": cc.values,
            "community": lpa.values,
        }
    ).merge(deg, on="node", how="left")

    # user-facing edge table: decode int ids -> names lazily (only pays the
    # string materialization if a consumer actually reads it)
    names_ref = ray.put(info["names"])

    def _decode(batch: pd.DataFrame) -> pd.DataFrame:
        from bluegraph_ray.util import broadcast_get

        nm = broadcast_get(names_ref)
        batch = batch.copy()
        batch["src"] = nm[batch["src"].to_numpy(dtype=np.int64)]
        batch["dst"] = nm[batch["dst"].to_numpy(dtype=np.int64)]
        return batch

    edges_named = edges.map_batches(_decode, batch_format="pandas",
                                    batch_size=262_144)

    return FlagshipResult(
        edges=edges_named,
        vertex_table=vt,
        n=handle.n,
        m_arcs=handle.m,
        pagerank_iterations=pr.iterations,
        pagerank_edges_per_sec=pr.edges_per_sec,
        superstep_seconds=pr.superstep_seconds,
    )
