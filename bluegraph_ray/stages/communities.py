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
- "hierarchical": from-scratch connectivity-constrained agglomerative
  clustering (reference core/analyse/communities.py:88-108 wraps sklearn
  AgglomerativeClustering with the graph adjacency as the connectivity
  matrix; sklearn is not in this container, so the Lance-Williams merge
  loop is implemented directly in numpy). Small-graph point query by
  design — agglomerative clustering is inherently O(n^2) memory;
- "sbm": raises the same strategy error the reference raises for backends
  lacking it (networkx/analyse/communities.py:111-114) — graph-tool is not
  in this container.

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


def _agglomerative_constrained(features: np.ndarray, conn: np.ndarray,
                               n_clusters: int, linkage: str = "average"):
    """Connectivity-constrained agglomerative clustering (Lance-Williams).

    Merges the closest CONNECTED pair of clusters each step (euclidean
    feature distance; linkage in {"average", "single", "complete"}), merged
    clusters inheriting the union of their neighbourhoods — the from-scratch
    equivalent of sklearn AgglomerativeClustering(connectivity=adjacency)
    used by the reference. When no connected pair remains (more components
    than clusters), falls back to unconstrained merges, matching sklearn's
    connectivity-fixing behavior. Deterministic: ties break on the smallest
    (i, j) cluster index pair. O(n^2) memory, O(n^3) time — a small-graph
    point query by nature.
    Returns labels 0..k-1, numbered by each cluster's smallest member.
    """
    n = len(features)
    x = np.asarray(features, dtype=np.float64)
    d = np.sqrt(np.maximum(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1), 0.0))
    conn = conn.astype(bool).copy()
    np.fill_diagonal(conn, False)
    active = np.ones(n, dtype=bool)
    sizes = np.ones(n)
    members: list[list[int]] = [[i] for i in range(n)]
    for _ in range(max(0, n - n_clusters)):
        ai = np.flatnonzero(active)
        cand = conn[np.ix_(ai, ai)]
        if not cand.any():
            cand = np.ones((len(ai), len(ai)), dtype=bool)
            np.fill_diagonal(cand, False)
        dd = np.where(cand, d[np.ix_(ai, ai)], np.inf)
        flat = np.argmin(dd)  # first occurrence = smallest (i, j) on ties
        i, j = ai[flat // len(ai)], ai[flat % len(ai)]
        if i > j:
            i, j = j, i
        si, sj = sizes[i], sizes[j]
        if linkage == "average":
            d[i, :] = (si * d[i, :] + sj * d[j, :]) / (si + sj)
        elif linkage == "single":
            d[i, :] = np.minimum(d[i, :], d[j, :])
        elif linkage == "complete":
            d[i, :] = np.maximum(d[i, :], d[j, :])
        else:
            raise ValueError(f"unknown linkage {linkage!r}")
        d[:, i] = d[i, :]
        conn[i, :] |= conn[j, :]
        conn[:, i] |= conn[:, j]
        conn[i, i] = False
        sizes[i] += sizes[j]
        members[i].extend(members[j])
        active[j] = False
    labels = np.empty(n, dtype=np.int64)
    roots = sorted(np.flatnonzero(active), key=lambda r: min(members[r]))
    for lab, r in enumerate(roots):
        labels[np.asarray(members[r])] = lab
    return labels


def detect_communities(
    edges: "ray.data.Dataset",
    *,
    strategy: str = "lpa",
    weight: str | None = None,
    n_communities: int = 2,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int = 8,
    feature_vectors=None,
    linkage: str = "average",
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
    if strategy == "hierarchical":
        pdf = edges.to_pandas() if hasattr(edges, "to_pandas") else edges
        nodes = np.sort(pd.unique(pd.concat([pdf[src], pdf[dst]]).to_numpy()))
        pos = {n: i for i, n in enumerate(nodes)}
        adj = np.zeros((len(nodes), len(nodes)), dtype=np.float64)
        s = pdf[src].map(pos).to_numpy()
        t = pdf[dst].map(pos).to_numpy()
        w = pdf[weight].to_numpy(dtype=np.float64) if weight else np.ones(len(pdf))
        adj[s, t] = w
        adj[t, s] = w
        if feature_vectors is None:
            # engine convenience (the reference demands explicit node feature
            # vectors, utils: feature_vector_prop): default to the weighted
            # adjacency rows — clusters then group nodes with similar
            # neighbourhood profiles
            feats = adj
        elif isinstance(feature_vectors, dict):
            feats = np.stack([np.asarray(feature_vectors[n], dtype=np.float64)
                              for n in nodes])
        else:
            fv = feature_vectors
            feats = np.stack([np.asarray(fv.loc[n], dtype=np.float64)
                              for n in nodes])
        labels = _agglomerative_constrained(feats, adj > 0, n_communities,
                                            linkage=linkage)
        return {str(n): int(l) for n, l in zip(nodes, labels)}
    if strategy == "sbm":
        raise ValueError(
            f"{strategy} is not implemented by this backend "
            "(graph-tool is unavailable)"
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
