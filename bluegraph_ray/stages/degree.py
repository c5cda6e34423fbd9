"""Degree centrality — raw (weighted) degree, NetworkX semantics.

Reference: ``dict(graph.degree(weight=...))`` — NOT normalized
(/root/reference/bluegraph/backends/networkx/analyse/metrics.py:29-34; the
graph-tool backend uses out-degree on the bidirected view,
backends/graph_tool/analyse/metrics.py:34-44).

One shuffle: union of (src, w) and (dst, w) rows -> bucketed hash aggregate
(util.hash_aggregate — per-key cardinality is O(V), far too high for Ray's
per-group-Python native aggregate). For a directed graph this is total degree
(in + out), matching ``nx.DiGraph.degree``. Vertices with no incident edges
don't appear; join against the vertex table to zero-fill when needed.
"""

from __future__ import annotations

import ray.data

from bluegraph_ray.util import hash_aggregate, rename_columns


def degree_centrality(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Edge table -> Dataset(node, degree). Assumes deduped (src, dst) rows."""
    cols_s = [src] + ([weight] if weight else [])
    cols_t = [dst] + ([weight] if weight else [])
    s = rename_columns(edges.select_columns(cols_s), {src: "node"})
    t = rename_columns(edges.select_columns(cols_t), {dst: "node"})
    both = s.union(t)
    if weight:
        return hash_aggregate(
            both, "node", {"degree": (weight, "sum")}, num_buckets=num_buckets
        )
    return hash_aggregate(
        both, "node", {"degree": (None, "count")}, num_buckets=num_buckets
    )
