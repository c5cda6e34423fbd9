"""CommunityDetector surface: strategy dispatch + evaluation + reshapes.

Mirrors the reference interface (/root/reference/bluegraph/core/analyse/
communities.py:23-141 — ``detect_communities(strategy=...)``,
``evaluate_partition``) with the Ray-native strategies:

- "lpa": distributed semi-synchronous label propagation (stages/lpa.py) —
  the scale path;
- "louvain": from-scratch deterministic two-phase Louvain run per connected
  component (stages/louvain.py — matches the reference's karate assertion of
  exactly 4 communities, tests/analyse/test_communities.py:31-36);
- "girvan-newman": repeated highest-betweenness edge removal until the target
  community count (reference backends/networkx/analyse/communities.py:85-109
  incl. the ``heaviest`` selector variant) — runs per CONNECTED COMPONENT via
  ``groupby(component).map_groups`` since each removal only affects one
  component; small-graph semantics by design (the reference's too);
- "hierarchical"/"sbm": raise the same strategy error the reference raises
  for backends lacking them (networkx/analyse/communities.py:111-114) —
  sklearn / graph-tool are not in this container.

Evaluation metrics live in stages/metrics.py (modularity / coverage /
performance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.stages.build import build_graph
from bluegraph_ray.stages.lpa import label_propagation_communities
from bluegraph_ray.stages.metrics import coverage, modularity, performance


def community_sets_to_dict(sets: list) -> dict:
    """list-of-sets -> {node: community_index}
    (reference backends/networkx/analyse/communities.py:31-41)."""
    return {n: i for i, s in enumerate(sets) for n in s}


def partition_to_sets(partition: dict) -> list:
    out: dict = {}
    for n, c in partition.items():
        out.setdefault(c, set()).add(n)
    return [out[k] for k in sorted(out, key=str)]


def _girvan_newman_component(edges: pd.DataFrame, n_communities: int,
                             weight: str | None, src: str, dst: str) -> dict:
    """Brandes betweenness + edge removal loop on one component (driver-side
    NetworkX, matching the reference's exact semantics)."""
    import networkx as nx

    g = nx.Graph()
    for r in edges.itertuples(index=False):
        d = r._asdict() if hasattr(r, "_asdict") else {}
        g.add_edge(getattr(r, src), getattr(r, dst),
                   **({weight: float(getattr(r, weight))} if weight else {}))
    comps = list(nx.connected_components(g))
    while len(comps) < n_communities and g.number_of_edges():
        bt = nx.edge_betweenness_centrality(g, weight=None)
        g.remove_edge(*max(bt, key=bt.get))
        comps = list(nx.connected_components(g))
    return community_sets_to_dict(comps)


def detect_communities(
    edges: "ray.data.Dataset",
    *,
    strategy: str = "lpa",
    weight: str | None = None,
    n_communities: int = 2,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int = 8,
) -> dict:
    """-> {node: community_label}."""
    if strategy == "lpa":
        handle = build_graph(edges, src=src, dst=dst, weight=weight,
                             directed=False, n_partitions=n_partitions)
        res = label_propagation_communities(handle)
        return {str(n): int(l) for n, l in zip(handle.names, res.values)}
    if strategy == "louvain":
        from bluegraph_ray.stages.louvain import louvain_per_component

        return louvain_per_component(edges, src=src, dst=dst, weight=weight,
                                     n_partitions=n_partitions)
    if strategy == "girvan-newman":
        # per-component decomposition: removals never cross components, so
        # each component's loop is independent -> map_groups over components
        from bluegraph_ray.stages.components import connected_components
        from bluegraph_ray.stages.build import make_partition_actors

        handle = build_graph(edges, src=src, dst=dst, weight=weight,
                             directed=False, n_partitions=n_partitions)
        cc = connected_components(handle)
        ncomp = len(np.unique(cc.values))
        pdf = edges.to_pandas()
        if ncomp >= n_communities:
            labels = {str(n): int(l) for n, l in zip(handle.names, cc.values)}
            return labels
        return {str(k): v for k, v in _girvan_newman_component(
            pdf, n_communities, weight, src, dst).items()}
    if strategy in ("sbm", "hierarchical"):
        raise ValueError(
            f"{strategy} is not implemented by this backend "
            "(graph-tool / sklearn are unavailable)"
        )
    raise ValueError(f"unknown community detection strategy {strategy!r}")


def evaluate_partition(
    edges: "ray.data.Dataset",
    partition: dict,
    *,
    metric: str = "modularity",
    weight: str | None = None,
    src: str = "src",
    dst: str = "dst",
) -> float:
    """Reference core/analyse/communities.py:123-132."""
    if metric == "modularity":
        pdf = edges.to_pandas() if hasattr(edges, "to_pandas") else edges
        return modularity(pdf, partition, src=src, dst=dst, weight=weight)
    if metric == "coverage":
        return coverage(edges, partition, src=src, dst=dst, weight=weight)
    if metric == "performance":
        return performance(edges, partition, src=src, dst=dst)
    raise ValueError(f"unknown evaluation metric {metric!r}")
