"""Louvain community detection — from-scratch, deterministic.

The reference's primary strategy calls python-louvain ``best_partition``
(/root/reference/bluegraph/backends/networkx/analyse/communities.py:78-83);
its test asserts louvain finds exactly 4 communities covering all 34 karate
nodes (/root/reference/tests/analyse/test_communities.py:31-36). This is the
standard two-phase algorithm re-derived:

- phase 1: greedy modularity-gain node moves (nodes visited in sorted order —
  deterministic, unlike python-louvain's randomized order);
- phase 2: community aggregation into a weighted super-graph; repeat until no
  modularity gain.

Scale disposition: Louvain's first phase is sequential-greedy by nature; the
distributed-native strategy in this engine is LPA (stages/lpa.py). Louvain
runs per CONNECTED COMPONENT — components are independent, so
``louvain_per_component`` fans components out via ``groupby(component)``
``map_groups`` (each group is one component's edge list; driver-grade work per
group). The same decomposition the reference relies on implicitly (one
NetworkX graph per process).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

import ray.data


def _louvain_pass(adj: dict, m2: float, partition: dict) -> tuple[dict, bool]:
    """One phase-1 sweep; returns (partition, any_moved)."""
    # community aggregates
    comm_tot = defaultdict(float)   # Σ_tot: total degree of community
    deg = {}
    for u, nbrs in adj.items():
        deg[u] = sum(nbrs.values())
        comm_tot[partition[u]] += deg[u]
    moved_any = False
    improved = True
    while improved:
        improved = False
        for u in sorted(adj, key=str):
            cu = partition[u]
            ku = deg[u]
            # weights from u to each neighbouring community
            links = defaultdict(float)
            for v, w in adj[u].items():
                if v != u:
                    links[partition[v]] += w
            comm_tot[cu] -= ku
            best_c, best_gain = cu, 0.0
            base = links.get(cu, 0.0) - comm_tot[cu] * ku / m2
            for c, w_in in sorted(links.items(), key=lambda kv: str(kv[0])):
                gain = (w_in - comm_tot[c] * ku / m2) - base
                if gain > best_gain + 1e-12:
                    best_gain, best_c = gain, c
            comm_tot[best_c] += ku
            if best_c != cu:
                partition[u] = best_c
                improved = True
                moved_any = True
    return partition, moved_any


def _aggregate(adj: dict, partition: dict) -> dict:
    new_adj: dict = defaultdict(lambda: defaultdict(float))
    for u, nbrs in adj.items():
        cu = partition[u]
        for v, w in nbrs.items():
            new_adj[cu][partition[v]] += w
    return {c: dict(n) for c, n in new_adj.items()}


def louvain(edges: pd.DataFrame, *, src: str = "src", dst: str = "dst",
            weight: str | None = None, max_levels: int = 20,
            m2: float | None = None) -> dict:
    """-> {node: community_label} (labels canonicalized to min member name).

    ``m2`` (= 2m, twice the total edge weight) may be passed in when the
    edge frame is one component of a larger graph: python-louvain (the
    reference's backend) normalizes the Σ_tot·k/2m penalty by the GLOBAL 2m
    of the whole graph, not the component-local one, so per-component
    fan-out must inject the global value (see ``louvain_per_component``).
    """
    adj: dict = defaultdict(dict)
    for r in edges.itertuples(index=False):
        u, v = getattr(r, src), getattr(r, dst)
        w = float(getattr(r, weight)) if weight else 1.0
        if u == v:
            continue
        adj[u][v] = adj[u].get(v, 0.0) + w
        adj[v][u] = adj[v].get(u, 0.0) + w
    if not adj:
        return {}
    if m2 is None:
        m2 = sum(sum(n.values()) for n in adj.values())  # = 2m
    # node -> current top-level community through the hierarchy
    mapping = {u: u for u in adj}
    level_adj = dict(adj)
    for _ in range(max_levels):
        partition = {u: u for u in level_adj}
        partition, moved = _louvain_pass(level_adj, m2, partition)
        if not moved:
            break
        mapping = {node: partition[c] for node, c in mapping.items()}
        level_adj = _aggregate(level_adj, partition)
    # canonical labels: min member name per community
    members: dict = defaultdict(list)
    for node, c in mapping.items():
        members[c].append(node)
    canon = {c: min(ms, key=str) for c, ms in members.items()}
    return {node: canon[c] for node, c in mapping.items()}


def louvain_per_component(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_partitions: int = 8,
    max_component_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """Distributed decomposition: CC first, then one louvain task per
    component via groupby(component).map_groups. -> Dataset(node, community).

    Real graphs have one giant component, and Louvain's greedy phase-1 is
    sequential — that component lands on a SINGLE worker. The
    ``max_component_edges`` guard fails fast with a pointer at LPA
    (stages/lpa.py, this engine's distributed-native community strategy)
    instead of silently running a week-long single-core job."""
    import ray as _ray

    from bluegraph_ray.stages.build import build_graph
    from bluegraph_ray.stages.components import connected_components

    handle = build_graph(edges, src=src, dst=dst, weight=weight,
                         directed=False, n_partitions=n_partitions)
    # Global 2m of the WHOLE graph, computed once before the fan-out —
    # python-louvain normalizes every component's gain by this, not by the
    # component-local total (see louvain() docstring).
    if weight is not None:
        total_w = float(edges.sum(weight))
    else:
        total_w = float(edges.count())
    global_m2 = 2.0 * total_w
    cc = connected_components(handle)
    # label map stays numpy — a pd.Series keyed by node name (values int64,
    # index the existing names array), broadcast once; NO O(n) Python dict
    comp_of = pd.Series(cc.values.astype(np.int64),
                        index=np.asarray([str(n) for n in handle.names]))
    ref = _ray.put(comp_of)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        co = _ray.get(ref)
        batch = batch.copy()
        comp = co.reindex(batch[src].astype(str).to_numpy()).to_numpy()
        batch["_comp"] = comp.astype(np.int64)
        return batch

    def per_component(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > max_component_edges:
            raise ValueError(
                f"louvain_per_component: component {int(group['_comp'].iloc[0])} "
                f"has {len(group)} edges > max_component_edges="
                f"{max_component_edges}. Louvain's greedy phase is "
                "single-worker per component; for graphs with a giant "
                "component use the distributed LPA strategy "
                "(detect_communities(strategy='lpa') / stages/lpa.py) or "
                "raise max_component_edges explicitly.")
        part = louvain(group.drop(columns=["_comp"]), src=src, dst=dst,
                       weight=weight, m2=global_m2)
        return pd.DataFrame({"node": list(part), "community": list(part.values())})

    return (
        edges.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_comp")
        .map_groups(per_component, batch_format="pandas")
    )
