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
                             weight: str | None, src: str, dst: str,
                             intermediate: bool = False) -> dict:
    """Brandes betweenness + edge removal loop (driver-side NetworkX,
    matching the reference's exact semantics,
    backends/networkx/analyse/communities.py:83-109): with ``weight`` set
    the most-valuable edge is the HEAVIEST one (reference ``heaviest``
    selector, :42-44), else the highest-betweenness one.

    ``intermediate=False`` -> {node: community} at the last layer with
    <= n_communities communities; ``intermediate=True`` -> {node: [community
    per layer]} across every layer up to that bound (reference :99-107)."""
    import itertools
    from operator import itemgetter

    import networkx as nx

    g = nx.Graph()
    for r in edges.itertuples(index=False):
        g.add_edge(getattr(r, src), getattr(r, dst),
                   **({weight: float(getattr(r, weight))} if weight else {}))

    def heaviest(graph):
        u, v, _w = max(graph.edges(data=weight), key=itemgetter(2))
        return (u, v)

    gen = nx.algorithms.community.centrality.girvan_newman(
        g, most_valuable_edge=heaviest if weight is not None else None)
    layers = list(itertools.takewhile(
        lambda c: len(c) <= n_communities, gen))
    nodes = list(g.nodes())
    if not intermediate:
        return community_sets_to_dict(layers[-1]) if layers else {
            n: 0 for n in nodes}
    partition: dict = {n: [] for n in nodes}
    for layer in layers:
        for i, community in enumerate(layer):
            for el in community:
                partition[el].append(i)
    return partition


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


def _dcsbm_loglike(m: np.ndarray, kappa: np.ndarray) -> float:
    """Degree-corrected SBM log-likelihood (Karrer & Newman 2011):
    L = sum_rs m_rs * log(m_rs / (kappa_r * kappa_s)) over ordered block
    pairs (m symmetric with diagonal double-counted — the directed-sum
    convention; constant terms dropped)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        kk = np.outer(kappa, kappa)
        terms = np.where(m > 0, m * np.log(np.where(m > 0, m, 1.0)
                                           / np.where(kk > 0, kk, 1.0)), 0.0)
    return float(terms.sum())


def _dcsbm_dl(m: np.ndarray, kappa: np.ndarray, n: int, n_edges: float) -> float:
    """Description length = -logL + MDL penalty (B(B+1)/2 block-pair params
    at log E nats each + n block assignments at log B nats). Minimizing this
    over B is the from-scratch analog of graph-tool's
    ``minimize_blockmodel_dl`` model selection."""
    b = len(kappa)
    penalty = (b * (b + 1) / 2.0) * np.log(max(n_edges, 2.0)) \
        + n * np.log(max(b, 2))
    return -_dcsbm_loglike(m, kappa) + penalty


def _fit_dcsbm(adj: np.ndarray, b_min: int, b_max: int):
    """Deterministic DC-SBM fit: agglomerative block merges (greedy best
    delta-likelihood, ties to the smallest pair) from B=n down to b_min,
    with a greedy node-move sweep at each candidate B; the B in
    [b_min, b_max] with the smallest description length wins.
    O(n^3)-ish — a small-graph point query like the other non-LPA
    strategies (the reference's graph-tool call is also single-machine)."""
    n = len(adj)
    labels = np.arange(n)
    best = None

    def blocks_state(lab):
        codes, inv = np.unique(lab, return_inverse=True)
        b = len(codes)
        onehot = np.zeros((n, b))
        onehot[np.arange(n), inv] = 1.0
        m = onehot.T @ adj @ onehot
        kappa = m.sum(axis=1)
        return inv, b, m, kappa

    inv, b, m, kappa = blocks_state(labels)
    if b <= b_max:  # the B=n (or already-coarse) starting state is a candidate
        dl = _dcsbm_dl(m, kappa, n, adj.sum() / 2.0)
        best = (dl, inv.copy())
    while b > max(b_min, 1):
        # merge the pair with the best (max) delta log-likelihood
        base = _dcsbm_loglike(m, kappa)
        best_delta, best_pair = -np.inf, None
        for r in range(b):
            for s in range(r + 1, b):
                m2 = np.delete(np.delete(m, s, 0), s, 1).copy()
                row = m[r] + m[s]
                row2 = np.delete(row, s)
                m2[r, :] = row2
                m2[:, r] = row2
                m2[r, r] = m[r, r] + m[s, s] + m[r, s] + m[s, r]
                k2 = np.delete(kappa, s).copy()
                k2[r] = kappa[r] + kappa[s]
                d = _dcsbm_loglike(m2, k2) - base
                if d > best_delta + 1e-12:
                    best_delta, best_pair = d, (r, s)
        r, s = best_pair
        inv = np.where(inv == s, r, inv)
        inv = np.where(inv > s, inv - 1, inv)
        inv, b, m, kappa = blocks_state(inv)
        if b <= b_max:
            ref = _refine_dcsbm(adj, inv.copy(), b)
            _, b2, m2, k2 = _sbm_counts(adj, ref)
            dl = _dcsbm_dl(m2, k2, n, adj.sum() / 2.0)
            if best is None or dl < best[0] - 1e-12:
                best = (dl, ref)
    return best[1]


def _sbm_counts(adj, lab):
    n = len(adj)
    codes, inv = np.unique(lab, return_inverse=True)
    b = len(codes)
    onehot = np.zeros((n, b))
    onehot[np.arange(n), inv] = 1.0
    m = onehot.T @ adj @ onehot
    return inv, b, m, m.sum(axis=1)


def _refine_dcsbm(adj, labels, b, sweeps: int = 3):
    """Greedy node moves: sweep nodes in index order, move each to the block
    that maximizes the DC-SBM likelihood; stop when a sweep changes
    nothing. Never empties a block."""
    n = len(adj)
    for _ in range(sweeps):
        moved = False
        for v in range(n):
            cur = labels[v]
            if (labels == cur).sum() == 1:
                continue  # keep all B blocks populated
            best_l, best_score = cur, -np.inf
            for cand in range(b):
                labels[v] = cand
                _, _, m, k = _sbm_counts(adj, labels)
                sc = _dcsbm_loglike(m, k)
                if sc > best_score + 1e-12:
                    best_score, best_l = sc, cand
            labels[v] = best_l
            if best_l != cur:
                moved = True
        if not moved:
            break
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
    min_communities: int | None = None,
    max_communities: int | None = None,
    intermediate: bool = False,
) -> dict:
    """-> {node: community_label}; with ``intermediate=True``
    (girvan-newman only, reference
    backends/networkx/analyse/communities.py:99-107) -> {node: [label per
    GN layer]}."""
    if intermediate and strategy != "girvan-newman":
        raise ValueError("intermediate=True is a girvan-newman option")
    if strategy == "lpa":
        handle = build_graph(edges, src=src, dst=dst, weight=weight,
                             directed=False, n_partitions=n_partitions)
        res = label_propagation_communities(handle)
        return {str(n): int(l) for n, l in zip(handle.names, res.values)}
    if strategy == "louvain":
        from bluegraph_ray.stages.louvain import louvain_per_component

        out = louvain_per_component(edges, src=src, dst=dst, weight=weight,
                                    n_partitions=n_partitions).to_pandas()
        return dict(zip(out["node"], out["community"]))
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
        if ncomp >= n_communities and not intermediate:
            labels = {str(n): int(l) for n, l in zip(handle.names, cc.values)}
            return labels
        return {str(k): v for k, v in _girvan_newman_component(
            pdf, n_communities, weight, src, dst,
            intermediate=intermediate).items()}
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
        # from-scratch degree-corrected SBM with MDL model selection — the
        # engine's analog of the reference's graph-tool
        # ``minimize_blockmodel_dl(B_min=min_communities,
        # B_max=max_communities)`` (backends/graph_tool/analyse/
        # communities.py:51-86). Karrer-Newman likelihood, deterministic
        # agglomerative merges + greedy node-move refinement.
        pdf = edges.to_pandas() if hasattr(edges, "to_pandas") else edges
        nodes = np.sort(pd.unique(pd.concat([pdf[src], pdf[dst]]).to_numpy()))
        pos = {nd: i for i, nd in enumerate(nodes)}
        adj = np.zeros((len(nodes), len(nodes)), dtype=np.float64)
        s = pdf[src].map(pos).to_numpy()
        t = pdf[dst].map(pos).to_numpy()
        w = (pdf[weight].to_numpy(dtype=np.float64) if weight
             else np.ones(len(pdf)))
        adj[s, t] += w
        adj[t, s] += w
        b_min = max(1, min_communities or 1)
        b_max = min(len(nodes), max_communities or len(nodes))
        labels = _fit_dcsbm(adj, b_min, b_max)
        # relabel by each block's smallest member for determinism
        order = {}
        for i in np.argsort(nodes, kind="stable"):
            order.setdefault(labels[i], len(order))
        return {str(nd): order[l] for nd, l in zip(nodes, labels)}
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
