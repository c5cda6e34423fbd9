"""MetricProcessor-style orchestration + write-back.

Reference: ``compute_all_node_metrics`` loops weight configs and returns a
nested dict (/root/reference/bluegraph/core/analyse/metrics.py:66-96); with
``write=True`` results attach as node properties via
``_dispatch_processing_result`` (core/io.py:1450-1461). Here the "write" mode
joins each score table onto the vertex Dataset of a :class:`RayPGFrame`.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from bluegraph_ray.pgframe import ID, RayPGFrame
from bluegraph_ray.stages.build import build_graph, make_partition_actors
from bluegraph_ray.stages.degree import degree_centrality
from bluegraph_ray.stages.pagerank import pagerank


def compute_all_node_metrics(
    edges: "ray.data.Dataset",
    *,
    degree_weights: list | None = None,
    pagerank_weights: list | None = None,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int = 8,
) -> dict:
    """-> {"degree": {weight_or_None: {node: score}},
           "pagerank": {weight_or_None: {node: score}}} — the reference's
    nested result shape (core/analyse/metrics.py:66-96)."""
    out: dict = {"degree": {}, "pagerank": {}}
    for w in degree_weights if degree_weights is not None else [None]:
        deg = degree_centrality(edges, src=src, dst=dst, weight=w).to_pandas()
        out["degree"][w] = dict(zip(deg["node"], deg["degree"]))
    for w in pagerank_weights if pagerank_weights is not None else [None]:
        handle = build_graph(edges, src=src, dst=dst, weight=w,
                             directed=False, n_partitions=n_partitions)
        res = pagerank(handle)
        out["pagerank"][w] = {n: float(v) for n, v in zip(handle.names, res.values)}
    return out


def write_node_metric(frame: RayPGFrame, scores: dict, property_name: str) -> RayPGFrame:
    """Attach a {node: score} result as a node property (write=True mode)."""
    df = pd.DataFrame({ID: list(scores), property_name: list(scores.values())})
    return frame.add_node_properties(df)
