"""Degree centrality — raw (weighted) degree, NetworkX semantics.

Reference: ``dict(graph.degree(weight=...))`` — NOT normalized
(/root/reference/bluegraph/backends/networkx/analyse/metrics.py:29-34; the
graph-tool backend uses out-degree on the bidirected view,
backends/graph_tool/analyse/metrics.py:34-44).

One pass + one shuffle: each batch pre-aggregates BOTH endpoints' partial
degrees locally (map-side combine — shuffle input shrinks from 2|E| rows to
at most |V| per block), then a bucketed hash aggregate sums the partials
(util.hash_aggregate — per-key cardinality is O(V), far too high for Ray's
per-group-Python native aggregate). For a directed graph this is total degree
(in + out), matching ``nx.DiGraph.degree``. Vertices with no incident edges
don't appear; join against the vertex table to zero-fill when needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.util import hash_aggregate


def degree_centrality(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Edge table -> Dataset(node, degree). Assumes deduped (src, dst) rows."""
    cols = [src, dst] + ([weight] if weight else [])

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([batch[src].to_numpy(), batch[dst].to_numpy()])
        if weight:
            w = batch[weight].to_numpy()
            ww = np.concatenate([w, w])  # dtype preserved (int stays int)
        else:
            ww = np.ones(2 * len(batch), dtype=np.int64)
        part = pd.DataFrame({"node": nodes, "degree": ww})
        return part.groupby("node", sort=False).sum().reset_index()

    partials = edges.select_columns(cols).map_batches(
        local, batch_format="pandas", batch_size=None
    )
    return hash_aggregate(
        partials, "node", {"degree": ("degree", "sum")}, num_buckets=num_buckets
    )
