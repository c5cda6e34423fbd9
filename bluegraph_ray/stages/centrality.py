"""Closeness / betweenness centrality — per-source SSSP fan-out.

Reference semantics: ``nx.closeness_centrality`` / ``nx.betweenness_centrality``
(/root/reference/bluegraph/backends/networkx/analyse/metrics.py:43-57). These
are inherently all-pairs computations; the distributed shape is a fan-out of
independent single-source traversals (one task per source batch via
``map_batches`` over the source list), each against a broadcast CSR of the
graph, partial results summed — embarrassingly parallel per source, O(V+E)
memory per task. ``sample_sources`` bounds cost on big graphs (approximate
betweenness by source sampling, the standard estimator — results are then
scaled by n/sample as in nx's ``k`` sampling).

Scale contract: the CSR is assembled by a WORKER task straight from the
(streamed, pre-encoded) edge Dataset blocks and lives only in the object
store — the driver holds the O(n) vertex-name array, never the edge list.
The one-graph-per-task broadcast model still caps graph size at a single
worker's RAM; that is inherent to all-pairs SSSP — beyond it, use
``sample_sources`` (estimator) or the per-component fan-out in
stages/communities.py to shrink each CSR.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

import ray
import ray.data


def _csr_from_edges(pdf: pd.DataFrame, src: str, dst: str, weight: str | None):
    names = np.sort(pd.unique(pd.concat([pdf[src], pdf[dst]]).to_numpy()))
    idx = {n: i for i, n in enumerate(names)}
    s = pdf[src].map(idx).to_numpy()
    d = pdf[dst].map(idx).to_numpy()
    w = pdf[weight].to_numpy(dtype=np.float64) if weight else np.ones(len(pdf))
    # undirected: both directions
    s2 = np.concatenate([s, d])
    d2 = np.concatenate([d, s])
    w2 = np.concatenate([w, w])
    order = np.argsort(s2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]
    indptr = np.searchsorted(s2, np.arange(len(names) + 1))
    return names, indptr, d2, w2


@ray.remote
def _assemble_csr(block_refs: list, weighted: bool):
    """Build the undirected CSR from pre-encoded edge blocks INSIDE a worker —
    the arrays never touch the driver heap; callers get back an ObjectRef to
    (indptr, nbrs, w) living in the object store."""
    tables = ray.get(list(block_refs))
    # empty blocks (e.g. from an upstream filter) arrive schema-less — skip
    tables = [t for t in tables if t.num_rows and "s" in t.schema.names]
    if tables:
        s = np.concatenate([t.column("s").to_numpy() for t in tables])
        d = np.concatenate([t.column("d").to_numpy() for t in tables])
        w = (np.concatenate([t.column("w").to_numpy() for t in tables])
             if weighted else np.ones(len(s)))
    else:
        s = d = np.empty(0, dtype=np.int64)
        w = np.empty(0)
    n = int(max(s.max(initial=-1), d.max(initial=-1))) + 1
    s2 = np.concatenate([s, d])
    d2 = np.concatenate([d, s])
    w2 = np.concatenate([w, w])
    order = np.argsort(s2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]
    indptr = np.searchsorted(s2, np.arange(n + 1))
    return indptr, d2, w2


def _distributed_csr(edges, src: str, dst: str, weight: str | None):
    """(names, graph_ref): names = sorted distinct vertex set (O(n), driver);
    graph_ref -> (indptr, nbrs, w) assembled worker-side. DataFrame inputs
    take the local build."""
    if not isinstance(edges, ray.data.Dataset):
        names, indptr, nbrs, w = _csr_from_edges(edges, src, dst, weight)
        return names, ray.put((indptr, nbrs, w))

    from bluegraph_ray.util import cached_name_index, distinct_values, rename_columns

    srcs = rename_columns(edges.select_columns([src]), {src: "v"})
    dsts = rename_columns(edges.select_columns([dst]), {dst: "v"})
    names = distinct_values(srcs.union(dsts), "v")
    names_ref = ray.put(names)
    cols = [src, dst] + ([weight] if weight else [])

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        idx = cached_name_index(names_ref)
        out = pd.DataFrame({
            "s": idx.get_indexer(batch[src].to_numpy()).astype(np.int64),
            "d": idx.get_indexer(batch[dst].to_numpy()).astype(np.int64),
        })
        if weight:
            out["w"] = batch[weight].to_numpy(dtype=np.float64)
        return out

    enc = edges.select_columns(cols).map_batches(
        encode, batch_format="pandas", batch_size=None)
    graph_ref = _assemble_csr.remote(enc.to_arrow_refs(), weight is not None)
    return names, graph_ref


def _sssp(indptr, nbrs, w, source, n):
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    pq = [(0.0, source)]
    # predecessor lists + visit order for Brandes accumulation
    sigma = np.zeros(n)
    sigma[source] = 1.0
    preds: list = [[] for _ in range(n)]
    order = []
    seen = np.zeros(n, dtype=bool)
    while pq:
        dcur, u = heapq.heappop(pq)
        if seen[u]:
            continue
        seen[u] = True
        order.append(u)
        for k in range(indptr[u], indptr[u + 1]):
            v = nbrs[k]
            nd = dcur + w[k]
            if nd < dist[v] - 1e-15:
                dist[v] = nd
                preds[v] = [u]
                sigma[v] = sigma[u]
                heapq.heappush(pq, (nd, v))
            elif abs(nd - dist[v]) <= 1e-15 and not seen[v]:
                preds[v].append(u)
                sigma[v] += sigma[u]
    return dist, sigma, preds, order


def _expand_frontier(indptr, nbrs, frontier):
    """All (src, neighbour) arcs of a frontier in one shot: concatenated CSR
    adjacency ranges via the repeat/cumsum trick (no per-node Python loop,
    zero-length ranges handled). Returns (srcs, targets)."""
    st = indptr[frontier]
    en = indptr[frontier + 1]
    lens = en - st
    total = int(lens.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    reps = np.repeat(np.arange(len(frontier)), lens)
    pos = np.ones(total, dtype=np.int64)
    seg = np.cumsum(lens) - lens
    nzf = np.flatnonzero(lens)
    first = seg[nzf]
    pos[first] = st[nzf]
    pos[first[1:]] = st[nzf[1:]] - (en[nzf[:-1]] - 1)
    pos = np.cumsum(pos)
    return frontier[reps], nbrs[pos]


def _bfs_levels(indptr, nbrs, source, n):
    """Unweighted SSSP: frontier-at-a-time BFS over the CSR, fully
    vectorized per level (no per-node Python). Returns (dist int32 with -1
    unreachable, sigma path counts float64, levels list of frontier arrays).
    """
    dist = np.full(n, -1, dtype=np.int32)
    sigma = np.zeros(n)
    dist[source] = 0
    sigma[source] = 1.0
    frontier = np.array([source], dtype=np.int64)
    levels = [frontier]
    d = 0
    while True:
        srcs, targets = _expand_frontier(indptr, nbrs, frontier)
        if not len(targets):
            break
        d += 1
        new_mask = dist[targets] == -1
        if new_mask.any():
            dist[targets[new_mask]] = d
        # σ(v) += σ(u) over tree arcs u->v with dist v == d
        tree = dist[targets] == d
        np.add.at(sigma, targets[tree], sigma[srcs[tree]])
        frontier = np.unique(targets[new_mask]) if new_mask.any() else np.empty(0, dtype=np.int64)
        if not len(frontier):
            break
        levels.append(frontier)
    return dist, sigma, levels


def _brandes_unweighted(indptr, nbrs, source, n, acc):
    """One Brandes source: BFS + level-by-level dependency accumulation,
    vectorized with np.add.at over the CSR (identical δ recurrence to the
    predecessor-list form; tree arcs are dist[v] == dist[u]+1)."""
    dist, sigma, levels = _bfs_levels(indptr, nbrs, source, n)
    delta = np.zeros(n)
    for frontier in reversed(levels[1:]):
        vs, us = _expand_frontier(indptr, nbrs, frontier)
        if not len(us):
            continue
        pred = dist[us] == dist[vs] - 1     # undirected CSR: u->v arc exists
        contrib = sigma[us[pred]] / sigma[vs[pred]] * (1.0 + delta[vs[pred]])
        np.add.at(delta, us[pred], contrib)
    delta[source] = 0.0
    acc += delta
    return dist


def closeness_centrality(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    distance: str | None = None,
) -> "ray.data.Dataset":
    """nx semantics incl. the Wasserman-Faust component scaling:
    C(u) = (r-1)/Σd * (r-1)/(n-1), r = |reachable(u)|."""
    names, graph_ref = _distributed_csr(edges, src, dst, distance)
    n = len(names)
    names_ref = ray.put(names)

    unweighted = distance is None

    def per_sources(batch: pd.DataFrame) -> pd.DataFrame:
        from bluegraph_ray.util import broadcast_get

        nm = broadcast_get(names_ref)
        ip, nb, ww = broadcast_get(graph_ref)
        out_nodes, out_scores = [], []
        for sid in batch["source"]:
            if unweighted:
                di, _, _ = _bfs_levels(ip, nb, int(sid), n)
                reach = di >= 0
                tot = float(di[reach].sum())
            else:
                dist, _, _, _ = _sssp(ip, nb, ww, int(sid), n)
                reach = np.isfinite(dist)
                tot = float(dist[reach].sum())
            r = int(reach.sum())
            if r > 1 and tot > 0:
                c = (r - 1) / tot * ((r - 1) / (n - 1))
            else:
                c = 0.0
            out_nodes.append(nm[int(sid)])
            out_scores.append(c)
        return pd.DataFrame({"node": out_nodes, "closeness": out_scores})

    sources = ray.data.from_pandas(pd.DataFrame({"source": np.arange(n)}))
    return sources.map_batches(per_sources, batch_format="pandas",
                               batch_size=max(1, n // 64))


def harmonic_centrality(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    distance: str | None = None,
    exact_denom: int | None = None,
) -> "ray.data.Dataset":
    """nx.harmonic_centrality semantics: H(u) = Σ_{v≠u reachable} 1/d(u, v),
    unnormalized (disconnected vertices contribute 0). Same per-source
    fan-out / worker-assembled CSR contract as :func:`closeness_centrality`.

    ``exact_denom`` (unweighted only): a common multiple of every hop
    distance in the graph (e.g. LCM(1..16) = 720720 when the diameter is
    ≤ 16). The per-source sum then folds EXACT int64 numerators
    ``Σ exact_denom // d`` and divides once — Σ 1/d as floats depends on
    summation order, which differs between the engine and the oracle's SQL
    SUM and flips a round(·, 9) on boundary values (round-5 drive INEXACT
    finding on harmonic_parts). Raises if a distance doesn't divide
    ``exact_denom`` (diameter grew past the assumption — fail loudly)."""
    names, graph_ref = _distributed_csr(edges, src, dst, distance)
    n = len(names)
    names_ref = ray.put(names)

    unweighted = distance is None
    if exact_denom is not None and not unweighted:
        raise ValueError("exact_denom requires the unweighted (hop) path")

    def per_sources(batch: pd.DataFrame) -> pd.DataFrame:
        from bluegraph_ray.util import broadcast_get

        nm = broadcast_get(names_ref)
        ip, nb, ww = broadcast_get(graph_ref)
        out_nodes, out_scores = [], []
        for sid in batch["source"]:
            if unweighted:
                di, _, _ = _bfs_levels(ip, nb, int(sid), n)
                pos = di > 0
                if exact_denom is not None:
                    d = di[pos].astype(np.int64)
                    if len(d) and (exact_denom % d != 0).any():
                        raise ValueError(
                            f"distance beyond exact_denom={exact_denom} "
                            f"divisibility (max hop {int(d.max())})")
                    h = float(np.sum(exact_denom // d)) / exact_denom
                else:
                    h = float((1.0 / di[pos]).sum())
            else:
                dist, _, _, _ = _sssp(ip, nb, ww, int(sid), n)
                pos = np.isfinite(dist) & (dist > 0)
                h = float((1.0 / dist[pos]).sum())
            out_nodes.append(nm[int(sid)])
            out_scores.append(h)
        return pd.DataFrame({"node": out_nodes, "harmonic": out_scores})

    sources = ray.data.from_pandas(pd.DataFrame({"source": np.arange(n)}))
    return sources.map_batches(per_sources, batch_format="pandas",
                               batch_size=max(1, n // 64))


def betweenness_centrality(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
    distance: str | None = None,
    sample_sources: int | None = None,
    seed: int = 0,
    sources: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """Brandes fan-out: each source task computes its dependency accumulation;
    partial vectors sum. Exact when sample_sources is None; normalized like
    nx (undirected: 2/((n-1)(n-2))). ``sources``: explicit source vertex
    NAMES — returns the UNSCALED dependency sums from exactly those sources
    (a deterministic estimator; pick sources by a replayable hash rule to
    make the result oracle-checkable, as q_betweenness_sampled does)."""
    names, graph_ref = _distributed_csr(edges, src, dst, distance)
    n = len(names)

    if sources is not None:
        srcs = np.searchsorted(names, np.sort(np.asarray(sources)))
        if not np.array_equal(names[srcs], np.sort(np.asarray(sources))):
            raise ValueError("sources contains vertices absent from the graph")
        scale_extra = 1.0
    elif sample_sources is not None and sample_sources < n:
        rng = np.random.default_rng(seed)
        srcs = np.sort(rng.choice(n, size=sample_sources, replace=False))
        scale_extra = n / sample_sources
    else:
        srcs = np.arange(n)
        scale_extra = 1.0

    unweighted = distance is None

    def per_sources(batch: pd.DataFrame) -> pd.DataFrame:
        from bluegraph_ray.util import broadcast_get

        ip, nb, ww = broadcast_get(graph_ref)
        acc = np.zeros(n)
        for sid in batch["source"]:
            sid = int(sid)
            if unweighted:
                _brandes_unweighted(ip, nb, sid, n, acc)
                continue
            dist, sigma, preds, order = _sssp(ip, nb, ww, sid, n)
            delta = np.zeros(n)
            for v in reversed(order):
                for u in preds[v]:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
                if v != sid:
                    acc[v] += delta[v]
            # (partial accumulation; summed across source batches below)
        return pd.DataFrame({"partial": [acc]})

    sources = ray.data.from_pandas(pd.DataFrame({"source": srcs}))
    parts = sources.map_batches(per_sources, batch_format="pandas",
                                batch_size=max(1, len(srcs) // 64)).to_pandas()
    total = np.sum(np.stack(parts["partial"].to_numpy()), axis=0)
    total *= scale_extra / 2.0  # undirected: each pair counted from both ends
    if n > 2:
        total *= 2.0 / ((n - 1) * (n - 2))  # nx normalized=True
    return ray.data.from_pandas(pd.DataFrame({"node": names, "betweenness": total}))
