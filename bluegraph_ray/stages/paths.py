"""Path search — PathFinder-parity operators (SURVEY.md §2.7).

The reference's path API (/root/reference/bluegraph/core/analyse/paths.py:96-509)
is a set of POINT queries (single source/target); they are not wide transforms.
Here each query gathers the adjacency it needs from the edge Dataset once
(driver-side dict — the analog of the reference building a whole NetworkX graph
per processor, backends/networkx/analyse/paths.py:23-48) and runs the classic
algorithm; `top_neighbors` and MST are the two that stay distributed:

- ``top_neighbors``: grouped top-k over the edge table (sort+limit per node) —
  reference core/analyse/paths.py:150-159;
- ``minimum_spanning_tree``: distributed Borůvka rounds over the edge
  Dataset — per round, every batch emits its per-component minimum edge
  under the strict total order (distance, src, dst); a bucketed combine
  reduces to one min edge per component; the driver merges components with
  an O(#chosen) union-by-min (total O(V) work across all rounds, never a
  per-edge loop) and re-broadcasts the O(V) component vector. Distinct edge
  keys make the MST unique, so the result equals Kruskal's under the same
  tie-break (verified against the minimax-path oracle). The local-DataFrame
  path keeps classic Kruskal — reference nx backend paths.py:100-131.

Semantics notes (matching the nx backend):
- ``exclude_edge=True`` removes the direct s-t edge before searching
  (backends/networkx/analyse/paths.py:23-48);
- ``n_shortest_paths(strategy="naive")`` ranks all UNWEIGHTED shortest paths
  by cumulative distance and keeps the top-n smallest
  (core/analyse/paths.py:217-298 + core/utils.py:98-105);
- ``strategy="yen"`` = k-shortest simple paths by distance (nx
  shortest_simple_paths).
"""

from __future__ import annotations

import heapq
from itertools import islice

import numpy as np
import pandas as pd

import ray.data


def _adjacency(edges: pd.DataFrame, *, src="src", dst="dst", distance=None,
               directed=False) -> dict:
    adj: dict = {}
    for r in edges.itertuples(index=False):
        s, t = getattr(r, src), getattr(r, dst)
        w = float(getattr(r, distance)) if distance else 1.0
        adj.setdefault(s, {})[t] = w
        if not directed:
            adj.setdefault(t, {})[s] = w
    return adj


def _as_pdf(edges) -> pd.DataFrame:
    return edges.to_pandas() if hasattr(edges, "to_pandas") else edges


def shortest_path(edges, source, target, *, distance=None, exclude_edge=False,
                  directed=False, src="src", dst="dst") -> tuple:
    """Dijkstra (uniform weights when distance is None). Returns the node tuple."""
    adj = _adjacency(_as_pdf(edges), src=src, dst=dst, distance=distance,
                     directed=directed)
    if exclude_edge:
        adj.get(source, {}).pop(target, None)
        if not directed:
            adj.get(target, {}).pop(source, None)
    dist = {source: 0.0}
    prev: dict = {}
    pq = [(0.0, source)]
    seen = set()
    while pq:
        d, u = heapq.heappop(pq)
        if u in seen:
            continue
        seen.add(u)
        if u == target:
            break
        for v, w in adj.get(u, {}).items():
            nd = d + w
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                prev[v] = u
                heapq.heappush(pq, (nd, v))
    if target not in dist:
        raise ValueError(f"no path {source} -> {target}")
    path = [target]
    while path[-1] != source:
        path.append(prev[path[-1]])
    return tuple(reversed(path))


def all_shortest_paths(edges, source, target, *, exclude_edge=False,
                       directed=False, src="src", dst="dst") -> list:
    """All unweighted shortest paths (BFS DAG enumeration)."""
    adj = _adjacency(_as_pdf(edges), src=src, dst=dst, directed=directed)
    if exclude_edge:
        adj.get(source, {}).pop(target, None)
        if not directed:
            adj.get(target, {}).pop(source, None)
    from collections import deque

    dist = {source: 0}
    preds: dict = {source: []}
    q = deque([source])
    while q:
        u = q.popleft()
        for v in adj.get(u, {}):
            if v not in dist:
                dist[v] = dist[u] + 1
                preds[v] = [u]
                q.append(v)
            elif dist[v] == dist[u] + 1:
                preds[v].append(u)
    if target not in dist:
        raise ValueError(f"no path {source} -> {target}")
    out: list = []

    def walk(node, suffix):
        if node == source:
            out.append((source, *suffix))
            return
        for p in preds[node]:
            walk(p, (node, *suffix))

    walk(target, ())
    return out


def n_shortest_paths(edges, source, target, n, *, distance=None,
                     strategy="naive", exclude_edge=False, directed=False,
                     src="src", dst="dst") -> list:
    pdf = _as_pdf(edges)
    if n == 1:
        return [shortest_path(pdf, source, target, distance=distance,
                              exclude_edge=exclude_edge, directed=directed,
                              src=src, dst=dst)]
    if strategy == "naive":
        # Reference semantics (core/analyse/paths.py:226-245): enumerate all
        # UNWEIGHTED shortest paths with the direct s-t edge removed, rank by
        # cumulative distance, and — when exclude_edge is False — add the
        # direct path back into the ranking if the edge exists.
        paths = all_shortest_paths(pdf, source, target, exclude_edge=True,
                                   directed=directed, src=src, dst=dst)
        adj = _adjacency(pdf, src=src, dst=dst, distance=distance,
                         directed=directed)

        def score(p):
            return (sum(adj[a][b] for a, b in zip(p, p[1:]))
                    if distance else float(len(p) - 1))

        ranking = {p: score(p) for p in paths}
        if not exclude_edge and target in adj.get(source, {}):
            ranking[(source, target)] = adj[source][target] if distance else 1.0
        ordered = sorted(ranking.items(), key=lambda kv: (kv[1], kv[0]))
        return [p for p, _ in ordered[:n]]
    if strategy == "yen":
        import networkx as nx

        g = nx.DiGraph() if directed else nx.Graph()
        for r in pdf.itertuples(index=False):
            g.add_edge(getattr(r, src), getattr(r, dst),
                       **({"w": float(getattr(r, distance))} if distance else {}))
        if exclude_edge and g.has_edge(source, target):
            g.remove_edge(source, target)
        gen = nx.shortest_simple_paths(g, source, target,
                                       weight="w" if distance else None)
        return [tuple(p) for p in islice(gen, n)]
    raise ValueError(f"unknown strategy {strategy!r}")


def nested_shortest_path(edges, source, target, *, depth=1, distance=None,
                         directed=False, **kw) -> list:
    """Expand each consecutive pair of the s-t path into its own shortest path
    (reference core/analyse/paths.py:300-343)."""
    path = list(shortest_path(edges, source, target, distance=distance,
                              directed=directed, **kw))
    for _ in range(depth - 1):
        nxt: list = [path[0]]
        for a, b in zip(path, path[1:]):
            sub = shortest_path(edges, a, b, distance=distance,
                                directed=directed, exclude_edge=True)
            nxt.extend(sub[1:])
        path = nxt
    return path


def n_nested_shortest_paths(edges, source, target, top_level_n, *,
                            nested_n=None, depth=1, distance=None,
                            strategy="naive", exclude_edge=False,
                            directed=False, src="src", dst="dst") -> list:
    """Top-n nested paths, accumulated across depth levels (reference
    core/analyse/paths.py:324-379): level 0 finds top_level_n s-t paths,
    each deeper level expands every consecutive node pair of the previous
    level's paths into nested_n sub-paths; a visited (s, t) pair is searched
    only once; the union of all discovered paths is returned."""
    pdf = _as_pdf(edges)
    if nested_n is None:
        nested_n = top_level_n
    current: list = [[source, target]]
    all_paths: set = set()
    visited: set = set()
    for level in range(depth):
        new_paths: list = []
        for path in current:
            for i in range(1, len(path)):
                s, t = path[i - 1], path[i]
                if (s, t) in visited or (t, s) in visited:
                    continue
                visited.add((s, t))
                found = n_shortest_paths(
                    pdf, s, t, top_level_n if level == 0 else nested_n,
                    distance=distance, strategy=strategy,
                    exclude_edge=exclude_edge, directed=directed,
                    src=src, dst=dst)
                all_paths.update(found)
                new_paths += [list(p) for p in found]
        current = new_paths
    return list(all_paths)


def shortest_tripath(edges, a, b, c, *, distance=None, overlap=True,
                     directed=False, **kw) -> tuple:
    """A->B then B->C; ``overlap=False`` excludes A->B interior nodes from the
    B->C search (reference core/analyse/paths.py:381-438)."""
    p1 = shortest_path(edges, a, b, distance=distance, directed=directed, **kw)
    pdf = _as_pdf(edges)
    if not overlap:
        interior = set(p1[1:-1])
        mask = ~(pdf["src"].isin(interior) | pdf["dst"].isin(interior))
        pdf = pdf[mask]
    p2 = shortest_path(pdf, b, c, distance=distance, directed=directed, **kw)
    return p1, p2


def n_shortest_tripaths(edges, a, b, c, n, *, distance=None, strategy="naive",
                        exclude_edge=False, overlap=True, directed=False,
                        src="src", dst="dst") -> tuple:
    """n shortest A->B paths, then n shortest B->C paths (reference
    core/analyse/paths.py:435-497). ``overlap=False`` removes every interior
    node seen on ANY A->B path (except the intermediary/target themselves)
    before the B->C search."""
    pdf = _as_pdf(edges)
    a_b_paths = n_shortest_paths(pdf, a, b, n, distance=distance,
                                 strategy=strategy, exclude_edge=exclude_edge,
                                 directed=directed, src=src, dst=dst)
    sub = pdf
    if not overlap:
        seen: set = set()
        for p in a_b_paths:
            seen.update(el for el in list(p)[1:-1] if el != b and el != c)
        if seen:
            mask = ~(pdf[src].isin(seen) | pdf[dst].isin(seen))
            sub = pdf[mask]
    try:
        b_c_paths = n_shortest_paths(sub, b, c, n, distance=distance,
                                     strategy=strategy,
                                     exclude_edge=exclude_edge,
                                     directed=directed, src=src, dst=dst)
    except ValueError as e:
        raise ValueError(
            "no paths satisfying the constraints from the intermediary "
            f"{b!r} to the target {c!r} exist") from e
    return a_b_paths, b_c_paths


def top_neighbors(edges, node, n, *, weight="frequency", src="src", dst="dst"):
    """Top-n incident edges by weight — distributed sort+limit."""
    if hasattr(edges, "to_pandas") and isinstance(edges, ray.data.Dataset):
        inc = edges.filter(expr=f"{src} == {node!r} or {dst} == {node!r}")
        pdf = inc.to_pandas()
    else:
        pdf = _as_pdf(edges)
        pdf = pdf[(pdf[src] == node) | (pdf[dst] == node)]
    pdf = pdf.assign(neighbor=np.where(pdf[src] == node, pdf[dst], pdf[src]))
    pdf = pdf.sort_values([weight, "neighbor"], ascending=[False, True]).head(n)
    return dict(zip(pdf["neighbor"], pdf[weight]))


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a, b) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.parent[ra] = rb
        return True


def minimum_spanning_tree(edges, *, distance, src="src", dst="dst",
                          num_buckets: int = 32) -> pd.DataFrame:
    """Minimum spanning forest (undirected). Returns the MST edge rows.

    Dataset input -> distributed Borůvka; DataFrame input -> local Kruskal.
    Both use the strict total order (distance, src, dst) on edges —
    (src, dst) pairs are unique, so edge keys are distinct, the MST/forest
    is unique, and the two algorithms provably agree (equal-weight ties
    resolve identically run to run and across block layouts).

    Borůvka round = one streaming pass over the edge Dataset (per-batch
    vectorized min edge per component: sort + drop_duplicates), one bucketed
    combine shuffle of <= 2*#components candidate rows, and an O(#chosen)
    driver union-by-min over component labels. Rounds halve the component
    count, so O(log V) passes; driver state is the O(V) component vector
    (the same contract as the dense vertex-id map), never the edge list.
    """
    if not isinstance(edges, ray.data.Dataset):
        pdf = _as_pdf(edges).sort_values([distance, src, dst], kind="mergesort")
        uf = _UnionFind()
        kept = [r for r in pdf.itertuples(index=False)
                if uf.union(getattr(r, src), getattr(r, dst))]
        return pd.DataFrame(kept)

    import ray as _ray
    from bluegraph_ray.util import broadcast_get, cached_name_index, distinct_values, rename_columns

    srcs = rename_columns(edges.select_columns([src]), {src: "v"})
    dsts = rename_columns(edges.select_columns([dst]), {dst: "v"})
    names = distinct_values(srcs.union(dsts), "v")
    n = len(names)
    names_ref = _ray.put(names)

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        idx = cached_name_index(names_ref)
        batch = batch.copy()
        batch["_sid"] = idx.get_indexer(batch[src].to_numpy()).astype(np.int64)
        batch["_did"] = idx.get_indexer(batch[dst].to_numpy()).astype(np.int64)
        return batch

    enc = edges.map_batches(encode, batch_format="pandas",
                            batch_size=None).materialize()

    comp = np.arange(n, dtype=np.int64)
    chosen_frames: list[pd.DataFrame] = []
    order_cols = [distance, src, dst]

    for _ in range(max(1, 2 * int(np.ceil(np.log2(max(n, 2)))))):
        comp_ref = _ray.put(comp)

        def min_edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
            c = broadcast_get(comp_ref)
            ca = c[batch["_sid"].to_numpy()]
            cb = c[batch["_did"].to_numpy()]
            keep = ca != cb
            if not keep.any():
                return batch.iloc[:0].assign(_comp=np.array([], dtype=np.int64),
                                             _bucket=np.array([], dtype=np.int64))
            sub = batch[keep]
            cand = pd.concat(
                [sub.assign(_comp=ca[keep]), sub.assign(_comp=cb[keep])],
                ignore_index=True)
            cand = cand.sort_values(["_comp", *order_cols],
                                    kind="mergesort").drop_duplicates("_comp")
            cand["_bucket"] = (cand["_comp"].to_numpy() % num_buckets).astype(np.int64)
            return cand

        def combine(group: pd.DataFrame) -> pd.DataFrame:
            return (group.drop(columns=["_bucket"])
                    .sort_values(["_comp", *order_cols], kind="mergesort")
                    .drop_duplicates("_comp"))

        mins = (enc.map_batches(min_edge_partial, batch_format="pandas",
                                batch_size=None)
                .groupby("_bucket").map_groups(combine, batch_format="pandas")
                .to_pandas())
        if mins.empty:
            break

        new_edges = mins.drop_duplicates([src, dst])
        chosen_frames.append(new_edges.drop(columns=["_comp"]))

        # contract: union-by-min over the chosen edges' component labels —
        # O(#chosen) per round, summing to O(V) across the whole run
        parent: dict = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        ca = comp[new_edges["_sid"].to_numpy()]
        cb = comp[new_edges["_did"].to_numpy()]
        touched = set()
        for a, b in zip(ca.tolist(), cb.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
            touched.add(a)
            touched.add(b)
        lab_map = np.arange(n, dtype=np.int64)
        for l in touched:
            lab_map[l] = find(l)
        comp = lab_map[comp]
    if not chosen_frames:
        return pd.DataFrame(columns=list(edges.schema().names))
    out = pd.concat(chosen_frames, ignore_index=True)
    return out.drop(columns=["_sid", "_did"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Path-set utilities (reference core/analyse/paths.py:24-93)
# ---------------------------------------------------------------------------

def graph_elements_from_paths(paths) -> tuple[set, set]:
    """Node and edge sets visited by a collection of paths
    (reference core/analyse/paths.py:79-93)."""
    nodes: set = set()
    edges: set = set()
    for p in paths:
        nodes.update(p)
        edges.update(zip(p[:-1], p[1:]))
    return nodes, edges


def subgraph_from_paths(edge_table, paths, *, src: str = "src", dst: str = "dst"):
    """Edge rows touched by the paths — the semi-join form of the reference's
    ``get_subgraph_from_paths``. Accepts a Dataset (broadcast filter) or a
    DataFrame."""
    _, eset = graph_elements_from_paths(paths)
    pairs = {frozenset(e) for e in eset}

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        mask = [frozenset((s, d)) in pairs
                for s, d in zip(batch[src], batch[dst])]
        return batch[np.asarray(mask, dtype=bool)]

    if isinstance(edge_table, ray.data.Dataset):
        return edge_table.map_batches(keep, batch_format="pandas", batch_size=None)
    return keep(_as_pdf(edge_table))


def pretty_print_paths(paths, as_repr: bool = False):
    """Console rendering of same-endpoint paths: the shared source/target on
    the first line, one interior route per following line (matches the
    reference's layout, core/analyse/paths.py:24-41)."""
    first, last = paths[0][0], paths[0][-1]
    head = f"{first} <-> "
    routes = [" <-> ".join(p[1:-1]) for p in paths]
    width = max(len(r) for r in routes)
    lines = [f"{head}{' ' * width} <-> {last}"]
    lines += [f"{' ' * len(head)}{r}" for r in routes]
    text = "\n".join(lines)
    if as_repr:
        return text
    print(text)


def pretty_print_tripaths(a, b, c, n, a_b_paths, b_c_paths, as_repr: bool = False):
    """Console rendering of A->B->C tripaths: two aligned route columns
    (reference core/analyse/paths.py:43-76)."""
    left = [" -> ".join(p[1:-1]) for p in a_b_paths]
    right = [" -> ".join(p[1:-1]) for p in b_c_paths]
    wl = max(len(r) for r in left) if left else 0
    wr = max(len(r) for r in right) if right else 0
    a_repr, b_repr = f"{a} ->", f"-> {b} ->"
    lines = [f"{a_repr}{' ' * wl}{b_repr}{' ' * wr}-> {c}"]
    for i in range(n):
        if i >= len(left) and i >= len(right):
            break
        lt = left[i] if i < len(left) else ""
        rt = right[i] if i < len(right) else ""
        lines.append(f"{' ' * len(a_repr)}{lt:<{wl}}{' ' * len(b_repr)}{rt}")
    text = "\n".join(lines)
    if as_repr:
        return text
    print(text)
