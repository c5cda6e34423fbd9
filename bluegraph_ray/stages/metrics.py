"""Graph-level metrics & partition-quality evaluation.

- ``density``: m / n(n-1), halved denominator for undirected — reference
  /root/reference/bluegraph/core/io.py:610-615 and
  backends/networkx/analyse/metrics.py:26-27.
- ``modularity`` / ``coverage`` / ``performance``: partition quality, the
  evaluation half of the reference's CommunityDetector
  (/root/reference/bluegraph/core/analyse/communities.py:123-132; Cypher
  re-implementations at backends/neo4j/analyse/communities.py:99-187 define
  the exact formulas used here). Implemented as one broadcast-join of the
  partition onto the edge table + global sums — no shuffle beyond the
  aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def density(edges: "ray.data.Dataset", *, directed=False, src="src", dst="dst") -> float:
    from bluegraph_ray.util import distinct_values, rename_columns

    m = edges.count()
    s = rename_columns(edges.select_columns([src]), {src: "v"})
    d = rename_columns(edges.select_columns([dst]), {dst: "v"})
    n = len(distinct_values(s.union(d), "v"))
    if n < 2:
        return 0.0
    dens = m / (n * (n - 1))
    return dens if directed else 2 * dens


def degree_assortativity(
    edges: "ray.data.Dataset",
    *,
    src: str = "src",
    dst: str = "dst",
) -> float:
    """Pearson degree assortativity (``nx.degree_pearson_correlation_coefficient``
    semantics): correlation of (deg(u), deg(v)) over the bidirected arc list.
    One degree aggregate + one streaming pass of scalar partials (count, Σx,
    Σy, Σxy, Σx², Σy² per batch — six numbers, no shuffle). The degree map is
    an O(n) broadcast, the same driver-state contract as the vertex-name
    array; at billion-vertex scale swap it for a hash join like
    stages/linkpred.py's join regime."""
    from bluegraph_ray.stages.degree import degree_centrality

    deg = degree_centrality(edges, src=src, dst=dst).to_pandas()
    ref = ray.put(pd.Series(deg.set_index("node")["degree"]))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dmap = ray.get(ref)
        du = dmap.reindex(batch[src].to_numpy()).to_numpy(dtype=np.float64)
        dv = dmap.reindex(batch[dst].to_numpy()).to_numpy(dtype=np.float64)
        # undirected: every edge contributes both orientations -> x/y sums
        # are symmetric, matching the nx mixing-matrix construction
        x = np.concatenate([du, dv])
        y = np.concatenate([dv, du])
        return pd.DataFrame({
            "cnt": [len(x)], "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()], "sxx": [(x * x).sum()],
            "syy": [(y * y).sum()],
        })

    t = edges.select_columns([src, dst]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas().sum()
    n, sx, sy = t["cnt"], t["sx"], t["sy"]
    cov = n * t["sxy"] - sx * sy
    varx = n * t["sxx"] - sx * sx
    vary = n * t["syy"] - sy * sy
    denom = np.sqrt(varx * vary)
    return float(cov / denom) if denom > 0 else float("nan")


def rich_club_coefficient(
    edges: "ray.data.Dataset",
    ks,
    *,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """nx.rich_club_coefficient semantics (unnormalized): for each degree
    threshold k, φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k = vertices with
    degree > k and E_k = edges with BOTH endpoints above k. One degree
    aggregate + one streaming edge pass that counts E_k for every k at once
    (a len(ks)-column boolean reduction per batch — no per-k rescans).
    -> DataFrame(k, n_nodes, n_edges, rich_club); NaN where N_k < 2."""
    from bluegraph_ray.stages.degree import degree_centrality

    ks = sorted(int(k) for k in ks)
    deg = degree_centrality(edges, src=src, dst=dst).to_pandas()
    dmap = pd.Series(deg.set_index("node")["degree"])
    ref = ray.put(dmap)
    n_k = np.array([(dmap > k).sum() for k in ks], dtype=np.int64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dm = ray.get(ref)
        du = dm.reindex(batch[src].to_numpy()).to_numpy(dtype=np.int64)
        dv = dm.reindex(batch[dst].to_numpy()).to_numpy(dtype=np.int64)
        both_min = np.minimum(du, dv)
        return pd.DataFrame(
            {f"e{k}": [int((both_min > k).sum())] for k in ks})

    t = edges.select_columns([src, dst]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas().sum()
    e_k = np.array([int(t[f"e{k}"]) for k in ks], dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(n_k >= 2,
                       2.0 * e_k / np.maximum(n_k * (n_k - 1), 1), np.nan)
    return pd.DataFrame({"k": ks, "n_nodes": n_k, "n_edges": e_k,
                         "rich_club": phi})


def _edge_stats(edges, partition: dict, *, src, dst, weight) -> dict:
    """One pass over the edge Dataset: total weight, intra-community weight,
    intra/inter edge counts. Partition broadcast via ray.put."""
    ref = ray.put(partition)

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        part = ray.get(ref)
        cs = batch[src].map(part)
        ct = batch[dst].map(part)
        w = batch[weight].astype(float) if weight else pd.Series(1.0, index=batch.index)
        same = (cs == ct).to_numpy()
        return pd.DataFrame(
            {
                "w_total": [float(w.sum())],
                "w_intra": [float(w[same].sum())],
                "m_total": [len(batch)],
                "m_intra": [int(same.sum())],
            }
        )

    parts = edges.map_batches(per_batch, batch_format="pandas", batch_size=None).to_pandas()
    return parts.sum().to_dict()


def modularity(edges, partition: dict, *, src="src", dst="dst", weight=None) -> float:
    """Newman modularity of an undirected partition.

    Q = Σ_c [ Σ_in_c / (2m) − (Σ_deg_c / (2m))² ] over communities c, with
    Σ_in_c counting each intra edge twice (both arc directions) — identical to
    python-louvain's ``modularity`` used by the reference
    (backends/networkx/analyse/communities.py:121-129).
    """
    pdf = edges.to_pandas() if hasattr(edges, "to_pandas") else edges
    w = pdf[weight].astype(float) if weight else pd.Series(1.0, index=pdf.index)
    two_m = 2.0 * w.sum()
    if two_m == 0:
        return 0.0
    cs = pdf[src].map(partition)
    ct = pdf[dst].map(partition)
    intra = pd.Series(np.where((cs == ct).to_numpy(), w, 0.0)).groupby(cs.to_numpy()).sum()
    deg = pd.concat([
        pd.DataFrame({"c": cs, "w": w}),
        pd.DataFrame({"c": ct, "w": w}),
    ]).groupby("c")["w"].sum()
    q = 0.0
    for c, dc in deg.items():
        q += (2.0 * intra.get(c, 0.0)) / two_m - (dc / two_m) ** 2
    return float(q)


def coverage(edges, partition: dict, *, src="src", dst="dst", weight=None) -> float:
    """intra-community weight / total weight (nx.community.coverage)."""
    s = _edge_stats(edges, partition, src=src, dst=dst, weight=weight)
    return float(s["w_intra"] / s["w_total"]) if s["w_total"] else 0.0


def performance(edges, partition: dict, *, src="src", dst="dst") -> float:
    """(intra edges + absent inter pairs) / (n(n-1)/2) (nx.community.performance)."""
    s = _edge_stats(edges, partition, src=src, dst=dst, weight=None)
    nodes = set(partition)
    n = len(nodes)
    sizes = pd.Series(list(partition.values())).value_counts()
    intra_pairs = float((sizes * (sizes - 1) / 2).sum())
    total_pairs = n * (n - 1) / 2
    inter_pairs = total_pairs - intra_pairs
    m_inter = s["m_total"] - s["m_intra"]
    absent_inter = inter_pairs - m_inter
    return float((s["m_intra"] + absent_inter) / total_pairs) if total_pairs else 0.0
