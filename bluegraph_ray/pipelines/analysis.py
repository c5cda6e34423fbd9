"""`generate_cooccurrence_analysis` — the reference's flagship batch
composition (/root/reference/cord19kg/utils.py:544-734, SURVEY.md §3.1),
re-expressed over the engine's own operators.

Per factor: derive {factor}_frequency -> optional global top-k (+ keep set)
-> explode factor sets back to (entity, factor) rows -> distributed
co-occurrence edges (frequency/PPMI/NPMI) -> optional positive-PMI filter ->
``distance_npmi = 1/npmi`` (inf when npmi <= 0, reference compute_distance)
-> degree/PageRank (weight=frequency) -> communities on frequency AND npmi
weights -> minimum spanning tree over distance_npmi -> (graph, tree)
RayPGFrames, optionally dumped as JSON.

Differences from ``pipelines/flagship.run_flagship`` (the scale-path
flagship): this operator keeps the reference's exact surface — per-factor
loop, top-k node selection, louvain default, MST stage, node-property
write-back into a PGFrame — while the flagship streams one factor through
the shared CSR actor pool. Both are compositions of the same stage
operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.pgframe import ID, RayPGFrame
from bluegraph_ray.pipelines.cooccurrence import cooccurrence_edges
from bluegraph_ray.stages.communities import detect_communities
from bluegraph_ray.stages.metricsproc import compute_all_node_metrics
from bluegraph_ray.stages.paths import minimum_spanning_tree


def generate_cooccurrence_analysis(
    occurrence_data: "ray.data.Dataset",
    factor_counts: dict,
    *,
    type_data=None,
    min_occurrences: int = 1,
    n_most_frequent: int | None = None,
    keep=None,
    factors=("paper",),
    communities: bool = True,
    remove_zero_mi: bool = False,
    community_strategy: str = "louvain",
    entity_col: str = "entity",
    graph_dump_prefix: str | None = None,
    num_buckets: int = 16,
    n_partitions: int = 8,
) -> tuple[dict, dict]:
    """-> ({factor: graph RayPGFrame}, {factor: tree RayPGFrame})."""
    factors = list(factors)
    keep = set(keep) if keep else set()

    def add_freqs(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        for f in factors:
            out[f"{f}_frequency"] = out[f].map(len).astype(np.int64)
        return out

    occ = occurrence_data.map_batches(add_freqs, batch_format="pandas",
                                      batch_size=None)
    if "paragraph" in factors and min_occurrences > 1:
        occ = occ.filter(expr=f"paragraph_frequency >= {min_occurrences}")
    occ = occ.materialize()

    graphs: dict = {}
    trees: dict = {}
    for f in factors:
        sub = occ
        if n_most_frequent is not None:
            # distributed top-k: sort desc + limit, then broadcast the
            # included entity set (ties broken by entity for determinism)
            top = (occ.select_columns([entity_col, f"{f}_frequency"])
                   .sort([f"{f}_frequency", entity_col], descending=[True, False])
                   .limit(n_most_frequent).to_pandas())
            include = set(top[entity_col]) | keep
            inc_ref = ray.put(include)

            def keep_top(batch: pd.DataFrame) -> pd.DataFrame:
                return batch[batch[entity_col].isin(ray.get(inc_ref))]

            sub = occ.map_batches(keep_top, batch_format="pandas",
                                  batch_size=None).materialize()

        def explode_factor(batch: pd.DataFrame, f=f) -> pd.DataFrame:
            ent = batch[entity_col].to_numpy()
            cells = batch[f].to_numpy()
            lens = np.fromiter((len(c) for c in cells), count=len(cells),
                               dtype=np.int64)
            return pd.DataFrame({
                "entity": np.repeat(ent, lens),
                "factor": [x for c in cells for x in c],
            })

        pairs = sub.map_batches(explode_factor, batch_format="pandas",
                                batch_size=None)
        edges = cooccurrence_edges(
            pairs, statistics=("frequency", "ppmi", "npmi"),
            total_factor_instances=factor_counts[f],
            num_buckets=num_buckets)
        if remove_zero_mi:
            edges = edges.filter(expr="ppmi > 0")

        def add_distance(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            npmi = out["npmi"].to_numpy(dtype=np.float64)
            with np.errstate(divide="ignore"):
                out["distance_npmi"] = np.where(npmi > 0, 1.0 / npmi, np.inf)
            return out

        edges = edges.map_batches(add_distance, batch_format="pandas",
                                  batch_size=None).materialize()

        # node table: entity, @type, factor set (paper), frequency
        def node_props(batch: pd.DataFrame, f=f) -> pd.DataFrame:
            out = pd.DataFrame({ID: batch[entity_col]})
            out["@type"] = "Entity"
            out[f"{f}_frequency"] = batch[f"{f}_frequency"]
            if "paper" in batch.columns:
                out["paper"] = batch["paper"].map(list)
            return out

        nodes = sub.map_batches(node_props, batch_format="pandas",
                                batch_size=None)
        graph = RayPGFrame(nodes=nodes, edges=rename_edges(edges))
        for p in ("frequency", "ppmi", "npmi", "distance_npmi"):
            graph.edge_prop_as_numeric(p)
        if type_data is not None:
            graph = graph.add_node_properties(
                type_data.rename(columns={"entity": ID,
                                          "type": "entity_type"}))

        # centralities (weight=frequency), written back as node properties
        all_metrics = compute_all_node_metrics(
            edges, degree_weights=["frequency"],
            pagerank_weights=["frequency"], n_partitions=n_partitions)
        for metric, data in all_metrics.items():
            for weight, values in data.items():
                prop = pd.DataFrame({ID: list(values),
                                     f"{metric}_{weight}": list(values.values())})
                graph = graph.add_node_properties(prop)

        if communities:
            for w in ("frequency", "npmi"):
                part = detect_communities(edges, strategy=community_strategy,
                                          weight=w, n_partitions=n_partitions)
                prop = pd.DataFrame({ID: list(part),
                                     f"community_{w}": list(part.values())})
                graph = graph.add_node_properties(prop)

        graphs[f] = graph
        tree_edges = minimum_spanning_tree(edges, distance="distance_npmi",
                                           num_buckets=num_buckets)
        trees[f] = RayPGFrame(nodes=graph._nodes,
                              edges=rename_edges_pdf(tree_edges))

        if graph_dump_prefix:
            import json as _json

            for name, frame in (("graph", graph), ("tree", trees[f])):
                with open(f"{graph_dump_prefix}_{f}_{name}.json", "w") as fh:
                    _json.dump(frame.to_json(), fh, default=str)
    return graphs, trees


def rename_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    from bluegraph_ray.pgframe import DST, SRC
    from bluegraph_ray.util import rename_columns

    return rename_columns(edges, {"src": SRC, "dst": DST})


def rename_edges_pdf(edges: pd.DataFrame) -> pd.DataFrame:
    from bluegraph_ray.pgframe import DST, SRC

    return edges.rename(columns={"src": SRC, "dst": DST})
