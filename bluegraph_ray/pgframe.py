"""RayPGFrame — the PGFrame API surface over two Ray Datasets.

A property graph as two tables, exactly the reference's data model
(/root/reference/bluegraph/core/io.py:36-53): a node table keyed by ``@id``
and an edge table keyed by ``(@source_id, @target_id)``, properties as
columns, types as the reserved ``@type`` column with subset semantics.
The reference's only implementation is pandas (``PandasPGFrame``,
core/io.py:714) with an empty ``SparkPGFrame`` stub (core/io.py:1340-1345);
this class is that missing distributed implementation, Ray-Data-first:

- property upserts are partitioned hash joins (util.hash_join);
- subgraph / filters are broadcast semi-joins inside ``map_batches``;
- node/edge dedup-merge is a bucketed hash aggregate;
- nothing materializes unless the caller asks for small results.

Set-valued "category" cells are canonical sorted-unique lists
(functions/setops.canonical_list); ``@type`` membership uses subset
semantics (core/utils.py:82-87).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.functions.setops import normalize_to_set
from bluegraph_ray.util import (
    distinct_values,
    hash_aggregate,
    hash_join,
    rename_columns,
)

ID = "@id"
SRC = "@source_id"
DST = "@target_id"
TYPE = "@type"


def _to_ds(obj) -> "ray.data.Dataset":
    if isinstance(obj, ray.data.Dataset):
        return obj
    if isinstance(obj, pd.DataFrame):
        return ray.data.from_pandas(obj.reset_index(drop=True))
    raise TypeError(type(obj))


class RayPGFrame:
    """Property graph = node Dataset (keyed by @id) + edge Dataset
    (keyed by @source_id, @target_id)."""

    def __init__(self, nodes=None, edges=None):
        if nodes is None:
            nodes = pd.DataFrame({ID: pd.Series([], dtype=object)})
        elif isinstance(nodes, (list, tuple, np.ndarray)):
            nodes = pd.DataFrame({ID: list(nodes)})
        if edges is None:
            edges = pd.DataFrame({SRC: pd.Series([], dtype=object),
                                  DST: pd.Series([], dtype=object)})
        elif isinstance(edges, (list, tuple)):
            edges = pd.DataFrame(edges, columns=[SRC, DST])
        self._nodes = _to_ds(nodes)
        self._edges = _to_ds(edges)
        self._node_prop_types: dict = {}
        self._edge_prop_types: dict = {}

    # -- basic accessors ----------------------------------------------------

    def number_of_nodes(self) -> int:
        return self._nodes.count()

    def number_of_edges(self) -> int:
        return self._edges.count()

    def nodes(self) -> list:
        return list(distinct_values(self._nodes, ID))

    def edges(self) -> list:
        pdf = self._edges.select_columns([SRC, DST]).to_pandas()
        return list(zip(pdf[SRC], pdf[DST]))

    def nodes_df(self) -> pd.DataFrame:
        return self._nodes.to_pandas()

    def edges_df(self) -> pd.DataFrame:
        return self._edges.to_pandas()

    def node_properties(self) -> list:
        return [c for c in self._nodes.schema().names if c != ID]

    def edge_properties(self) -> list:
        return [c for c in self._edges.schema().names if c not in (SRC, DST)]

    # -- per-property type system (reference core/io.py:248-346) -----------
    # Three declared-or-inferred types per property: "numeric" | "text" |
    # "category". Declared via ``*_prop_as_*`` (validated against the Arrow
    # schema — no data scan); inferred default = numeric for Arrow numeric
    # columns, category otherwise (reference ``_set_default_prop_types``,
    # core/io.py:262-275). The registry is metadata on this frame object;
    # derived frames re-infer unless re-declared.

    def _col_kind(self, which: str, prop: str) -> str:
        """-> "numeric" | "text" | "other" from the schema (Arrow type or
        numpy dtype depending on the block format — no data scan)."""
        import pyarrow as pa
        import pyarrow.types as pt

        ds = self._nodes if which == "node" else self._edges
        schema = ds.schema()
        t = schema.types[schema.names.index(prop)]
        if isinstance(t, pa.DataType):
            if pt.is_integer(t) or pt.is_floating(t) or pt.is_decimal(t):
                return "numeric"
            if pt.is_string(t) or pt.is_large_string(t):
                return "text"
            if pt.is_null(t):
                return "unknown"
            return "other"
        try:
            dt = np.dtype(t)
        except TypeError:
            return "unknown"
        if np.issubdtype(dt, np.number):
            return "numeric"
        if np.issubdtype(dt, np.str_):
            return "text"
        # object dtype: pandas stores strings (and set-cells) as object —
        # the schema can't distinguish, so validation is best-effort
        if dt == object:
            return "unknown"
        return "other"

    def _prop_type_valid(self, which: str, prop: str, prop_type: str) -> bool:
        """Best-effort schema validation: reject only when the schema
        CONTRADICTS the declaration (the reference scans values,
        core/io.py:248-260; a lazy Dataset's schema may be object/unknown —
        then the declaration is trusted)."""
        if prop_type == "category":
            return True
        if prop_type not in ("numeric", "text"):
            raise ValueError(f"unknown property type {prop_type!r}")
        kind = self._col_kind(which, prop)
        return kind in (prop_type, "unknown")

    def _set_prop_type(self, which: str, prop: str, prop_type: str) -> None:
        props = self.node_properties() if which == "node" else self.edge_properties()
        if prop not in props:
            raise ValueError(f"unknown {which} property {prop!r}")
        if not self._prop_type_valid(which, prop, prop_type):
            raise ValueError(
                f"Cannot cast the values of the {which} property "
                f"{prop!r} to {prop_type!r}")
        reg = self._node_prop_types if which == "node" else self._edge_prop_types
        reg[prop] = prop_type

    def _get_prop_type(self, which: str, prop: str) -> str:
        reg = self._node_prop_types if which == "node" else self._edge_prop_types
        if prop in reg:
            return reg[prop]
        if prop == TYPE:
            return "category"
        # inferred default: numeric columns are numeric, all else category
        # (reference _set_default_prop_types, core/io.py:262-275)
        return "numeric" if self._col_kind(which, prop) == "numeric" else "category"

    def node_prop_type(self, prop: str) -> str:
        return self._get_prop_type("node", prop)

    def edge_prop_type(self, prop: str) -> str:
        return self._get_prop_type("edge", prop)

    def node_prop_as_category(self, prop: str) -> None:
        self._set_prop_type("node", prop, "category")

    def node_prop_as_text(self, prop: str) -> None:
        self._set_prop_type("node", prop, "text")

    def node_prop_as_numeric(self, prop: str) -> None:
        self._set_prop_type("node", prop, "numeric")

    def edge_prop_as_category(self, prop: str) -> None:
        self._set_prop_type("edge", prop, "category")

    def edge_prop_as_text(self, prop: str) -> None:
        self._set_prop_type("edge", prop, "text")

    def edge_prop_as_numeric(self, prop: str) -> None:
        self._set_prop_type("edge", prop, "numeric")

    def is_numeric_node_prop(self, prop: str) -> bool:
        return self.node_prop_type(prop) == "numeric"

    def is_text_node_prop(self, prop: str) -> bool:
        return self.node_prop_type(prop) == "text"

    def is_categorical_node_prop(self, prop: str) -> bool:
        return self.node_prop_type(prop) == "category"

    def is_numeric_edge_prop(self, prop: str) -> bool:
        return self.edge_prop_type(prop) == "numeric"

    def is_text_edge_prop(self, prop: str) -> bool:
        return self.edge_prop_type(prop) == "text"

    def is_categorical_edge_prop(self, prop: str) -> bool:
        return self.edge_prop_type(prop) == "category"

    # -- construction / mutation (returns new frames; Datasets are immutable)

    def add_nodes(self, node_ids: Iterable) -> "RayPGFrame":
        new = ray.data.from_pandas(pd.DataFrame({ID: list(node_ids)}))
        merged = _dedup_nodes(self._nodes.union(new))
        return RayPGFrame(merged, self._edges)

    def add_edges(self, edges: Iterable[tuple]) -> "RayPGFrame":
        new = ray.data.from_pandas(pd.DataFrame(list(edges), columns=[SRC, DST]))
        merged = _dedup_edges(self._edges.union(new))
        return RayPGFrame(self._nodes, merged)

    def add_node_properties(self, props, prop_type: str | None = None) -> "RayPGFrame":
        """Outer-join upsert of a property table keyed by @id
        (reference core/io.py:792-835). New ids are added; existing columns
        are overwritten where the new table has values."""
        props_ds = _to_ds(props)
        new_cols = [c for c in props_ds.schema().names if c != ID]
        joined = hash_join(self._nodes, props_ds, ID, how="outer", suffix="_new")

        def resolve(batch: pd.DataFrame) -> pd.DataFrame:
            for c in new_cols:
                cn = c + "_new"
                if cn in batch.columns:
                    batch[c] = batch[cn].where(batch[cn].notna(), batch.get(c))
                    batch = batch.drop(columns=[cn])
            return batch

        out = RayPGFrame(joined.map_batches(resolve, batch_format="pandas", batch_size=None),
                         self._edges)
        out._node_prop_types = dict(self._node_prop_types)
        out._edge_prop_types = dict(self._edge_prop_types)
        if prop_type is not None:
            # declared at ingest time (reference add_node_properties,
            # core/io.py:300-320) — recorded directly: the post-join schema
            # may show float64 for all-NaN blocks of a text column
            for c in new_cols:
                out._node_prop_types[c] = prop_type
        return out

    def add_edge_properties(self, props, prop_type: str | None = None) -> "RayPGFrame":
        props_ds = _to_ds(props)
        new_cols = [c for c in props_ds.schema().names if c not in (SRC, DST)]
        joined = hash_join(self._edges, props_ds, [SRC, DST], how="outer",
                           suffix="_new")

        def resolve(batch: pd.DataFrame) -> pd.DataFrame:
            for c in new_cols:
                cn = c + "_new"
                if cn in batch.columns:
                    batch[c] = batch[cn].where(batch[cn].notna(), batch.get(c))
                    batch = batch.drop(columns=[cn])
            return batch

        out = RayPGFrame(self._nodes,
                         joined.map_batches(resolve, batch_format="pandas", batch_size=None))
        out._node_prop_types = dict(self._node_prop_types)
        out._edge_prop_types = dict(self._edge_prop_types)
        if prop_type is not None:
            for c in new_cols:
                out._edge_prop_types[c] = prop_type
        return out

    def add_node_types(self, mapping: dict) -> "RayPGFrame":
        df = pd.DataFrame({ID: list(mapping), TYPE: list(mapping.values())})
        return self.add_node_properties(df)

    def add_edge_types(self, mapping: dict) -> "RayPGFrame":
        rows = [(s, t, ty) for (s, t), ty in mapping.items()]
        df = pd.DataFrame(rows, columns=[SRC, DST, TYPE])
        return self.add_edge_properties(df)

    def rename_nodes(self, mapping: dict) -> "RayPGFrame":
        """Apply id remap to nodes and both edge endpoints
        (reference core/io.py:840-857) — broadcast dict lookup."""
        ref = ray.put(mapping)

        def remap_nodes(batch: pd.DataFrame) -> pd.DataFrame:
            mp = ray.get(ref)
            batch[ID] = batch[ID].map(lambda x: mp.get(x, x))
            return batch

        def remap_edges(batch: pd.DataFrame) -> pd.DataFrame:
            mp = ray.get(ref)
            batch[SRC] = batch[SRC].map(lambda x: mp.get(x, x))
            batch[DST] = batch[DST].map(lambda x: mp.get(x, x))
            return batch

        return RayPGFrame(
            self._nodes.map_batches(remap_nodes, batch_format="pandas", batch_size=None),
            self._edges.map_batches(remap_edges, batch_format="pandas", batch_size=None),
        )

    def rename_node_properties(self, mapping: dict) -> "RayPGFrame":
        return RayPGFrame(rename_columns(self._nodes, mapping), self._edges)

    def rename_edge_properties(self, mapping: dict) -> "RayPGFrame":
        return RayPGFrame(self._nodes, rename_columns(self._edges, mapping))

    # -- filters / subgraphs (broadcast semi-joins) -------------------------

    def filter_nodes(self, node_ids: Iterable) -> "RayPGFrame":
        keep = ray.put(set(node_ids))

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[ID].isin(ray.get(keep))]

        return RayPGFrame(self._nodes.map_batches(f, batch_format="pandas", batch_size=None),
                          self._edges)

    def filter_edges(self, edge_pairs: Iterable[tuple]) -> "RayPGFrame":
        keep = ray.put({tuple(e) for e in edge_pairs})

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keep)
            mask = [
                (s, t) in ks for s, t in zip(batch[SRC], batch[DST])
            ]
            return batch[np.asarray(mask, dtype=bool)]

        return RayPGFrame(self._nodes,
                          self._edges.map_batches(f, batch_format="pandas", batch_size=None))

    def subgraph(self, nodes_to_include: Iterable) -> "RayPGFrame":
        """Node-induced subgraph (reference core/io.py:1164-1199): keep listed
        nodes and edges with BOTH endpoints inside."""
        keep = ray.put(set(nodes_to_include))

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[ID].isin(ray.get(keep))]

        def fe(batch: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keep)
            return batch[batch[SRC].isin(ks) & batch[DST].isin(ks)]

        return RayPGFrame(self._nodes.map_batches(fn, batch_format="pandas", batch_size=None),
                          self._edges.map_batches(fe, batch_format="pandas", batch_size=None))

    def remove_nodes(self, node_ids: Iterable) -> "RayPGFrame":
        """Delete nodes and any incident edge (reference core/io.py:906-914)
        — anti-join on src AND dst."""
        drop = ray.put(set(node_ids))

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[~batch[ID].isin(ray.get(drop))]

        def fe(batch: pd.DataFrame) -> pd.DataFrame:
            ds_ = ray.get(drop)
            return batch[~(batch[SRC].isin(ds_) | batch[DST].isin(ds_))]

        return RayPGFrame(self._nodes.map_batches(fn, batch_format="pandas", batch_size=None),
                          self._edges.map_batches(fe, batch_format="pandas", batch_size=None))

    def isolated_nodes(self) -> list:
        """Nodes with no incident edge (reference core/io.py:1237-1252)."""
        s = rename_columns(self._edges.select_columns([SRC]), {SRC: "v"})
        d = rename_columns(self._edges.select_columns([DST]), {DST: "v"})
        connected = set(distinct_values(s.union(d), "v"))
        return [n for n in self.nodes() if n not in connected]

    def remove_isolated_nodes(self) -> "RayPGFrame":
        return self.remove_nodes(self.isolated_nodes())

    def density(self, directed: bool = False) -> float:
        n = self.number_of_nodes()
        m = self.number_of_edges()
        if n < 2:
            return 0.0
        d = m / (n * (n - 1))
        return d if directed else 2 * d

    # -- type queries -------------------------------------------------------

    def nodes_of_type(self, type_name: str) -> list:
        """Subset-semantics membership (core/utils.py:82-87)."""
        if TYPE not in self._nodes.schema().names:
            return []

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            mask = batch[TYPE].map(
                lambda t: type_name in normalize_to_set(t)
            )
            return batch[mask.to_numpy(dtype=bool)][[ID]]

        return list(self._nodes.map_batches(f, batch_format="pandas", batch_size=None).to_pandas()[ID])

    # -- point lookups / typing / convenience surface -----------------------
    # (reference core/io.py PandasPGFrame method-for-method; point lookups
    # are broadcast-filter + small take, never a full materialize)

    def get_node(self, n) -> dict:
        """Node properties as a dict (reference core/io.py get_node)."""
        ref = ray.put(n)

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[ID] == ray.get(ref)]

        rows = self._nodes.map_batches(f, batch_format="pandas",
                                       batch_size=None).take(1)
        if not rows:
            raise KeyError(n)
        d = dict(rows[0])
        d.pop(ID)
        return d

    def get_edge(self, source, target) -> dict:
        ref = ray.put((source, target))

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            s, t = ray.get(ref)
            return batch[(batch[SRC] == s) & (batch[DST] == t)]

        rows = self._edges.map_batches(f, batch_format="pandas",
                                       batch_size=None).take(1)
        if not rows:
            raise KeyError((source, target))
        d = dict(rows[0])
        d.pop(SRC)
        d.pop(DST)
        return d

    def neighbors(self, node_id) -> list:
        """Neighbor ids over the undirected view (both endpoint roles)."""
        ref = ray.put(node_id)

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            n = ray.get(ref)
            out = pd.concat([batch.loc[batch[SRC] == n, DST],
                             batch.loc[batch[DST] == n, SRC]])
            return pd.DataFrame({"n": out})

        hits = self._edges.select_columns([SRC, DST]).map_batches(
            f, batch_format="pandas", batch_size=None).to_pandas()
        return sorted(set(hits["n"]))

    def remove_edges(self, edge_pairs: Iterable[tuple]) -> "RayPGFrame":
        drop = ray.put({tuple(e) for e in edge_pairs})

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(drop)
            keep = [
                (s, t) not in ks
                for s, t in zip(batch[SRC], batch[DST])
            ]
            return batch[np.asarray(keep, dtype=bool)]

        return RayPGFrame(self._nodes,
                          self._edges.map_batches(f, batch_format="pandas",
                                                  batch_size=None))

    def remove_node_properties(self, prop_column: str) -> "RayPGFrame":
        keep = [c for c in self._nodes.schema().names if c != prop_column]
        return RayPGFrame(self._nodes.select_columns(keep), self._edges)

    def remove_edge_properties(self, prop_column: str) -> "RayPGFrame":
        keep = [c for c in self._edges.schema().names if c != prop_column]
        return RayPGFrame(self._nodes, self._edges.select_columns(keep))

    def has_node_types(self) -> bool:
        return TYPE in self._nodes.schema().names

    def has_edge_types(self) -> bool:
        return TYPE in self._edges.schema().names

    def node_types(self, flatten: bool = False) -> list:
        """Distinct @type values; flatten=True unpacks set-valued cells
        (reference core/io.py node_types)."""
        if not self.has_node_types():
            return []
        vals = self._nodes.select_columns([TYPE]).to_pandas()[TYPE]
        if flatten:
            out: list = []
            for el in vals:
                for t in sorted(normalize_to_set(el)):
                    if t not in out:
                        out.append(t)
            return out
        seen: list = []
        for el in vals:
            key = tuple(el) if isinstance(el, (list, set, np.ndarray)) else el
            if key not in seen:
                seen.append(key)
        return seen

    def edge_types(self, flatten: bool = False) -> list:
        if not self.has_edge_types():
            return []
        vals = self._edges.select_columns([TYPE]).to_pandas()[TYPE]
        if flatten:
            out: list = []
            for el in vals:
                for t in sorted(normalize_to_set(el)):
                    if t not in out:
                        out.append(t)
            return out
        seen: list = []
        for el in vals:
            key = tuple(el) if isinstance(el, (list, set, np.ndarray)) else el
            if key not in seen:
                seen.append(key)
        return seen

    def get_node_typing(self, as_dict: bool = False):
        if not self.has_node_types():
            raise ValueError("Graph nodes are not typed")
        pdf = self._nodes.select_columns([ID, TYPE]).to_pandas()
        ser = pdf.set_index(ID)[TYPE]
        return ser.to_dict() if as_dict else ser

    def get_edge_typing(self, as_dict: bool = False):
        if not self.has_edge_types():
            raise ValueError("Graph edges are not typed")
        pdf = self._edges.select_columns([SRC, DST, TYPE]).to_pandas()
        ser = pdf.set_index([SRC, DST])[TYPE]
        return ser.to_dict() if as_dict else ser

    def edges_of_type(self, type_name: str) -> list:
        """Subset-semantics membership over edge @type."""
        if not self.has_edge_types():
            return []

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            mask = batch[TYPE].map(lambda t: type_name in normalize_to_set(t))
            return batch[mask.to_numpy(dtype=bool)][[SRC, DST]]

        pdf = self._edges.map_batches(f, batch_format="pandas",
                                      batch_size=None).to_pandas()
        return list(zip(pdf[SRC], pdf[DST]))

    # reference aliases (core/io.py assign_*_types delegate to add_*)
    def assign_node_types(self, mapping: dict) -> "RayPGFrame":
        return self.add_node_types(mapping)

    def assign_edge_types(self, mapping: dict) -> "RayPGFrame":
        return self.add_edge_types(mapping)

    def aggregate_node_properties(self, func, into: str = "aggregation_result"
                                  ) -> "RayPGFrame":
        """Row-wise aggregate of all non-@ node property columns into one
        column (reference core/io.py aggregate_properties), as a vectorized
        map_batches — never a driver-side apply."""
        props = [c for c in self._nodes.schema().names if c not in (ID, TYPE)]
        keep = [c for c in (ID, TYPE) if c in self._nodes.schema().names]

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[keep].copy()
            out[into] = batch[props].aggregate(func, axis=1)
            return out

        return RayPGFrame(self._nodes.map_batches(f, batch_format="pandas",
                                                  batch_size=None), self._edges)

    def aggregate_edge_properties(self, func, into: str = "aggregation_result"
                                  ) -> "RayPGFrame":
        props = [c for c in self._edges.schema().names
                 if c not in (SRC, DST, TYPE)]
        keep = [c for c in (SRC, DST, TYPE)
                if c in self._edges.schema().names]

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[keep].copy()
            out[into] = batch[props].aggregate(func, axis=1)
            return out

        return RayPGFrame(self._nodes, self._edges.map_batches(
            f, batch_format="pandas", batch_size=None))

    def copy(self) -> "RayPGFrame":
        out = RayPGFrame(self._nodes, self._edges)
        out._node_prop_types = dict(self._node_prop_types)
        out._edge_prop_types = dict(self._edge_prop_types)
        return out

    # -- contraction (reference cord19kg/utils.py:1026-1108) ----------------

    def merge_nodes(self, nodes_to_merge: Iterable, new_name,
                    attr_resolver: dict | None = None) -> "RayPGFrame":
        """Contract a node set into one node: re-point incident edges, merge
        parallel edges (sum numeric weights by default), drop merged nodes.
        ``attr_resolver``: {column: op} with op in {"sum","min","max","count"}
        for the parallel-edge merge (CORD_ATTRS_RESOLVER analog,
        /root/reference/cord19kg/utils.py:964-976)."""
        group = set(nodes_to_merge)
        mapping = {n: new_name for n in group}
        remapped = self.rename_nodes(mapping)
        nodes = _dedup_nodes(remapped._nodes)
        edge_cols = [c for c in remapped._edges.schema().names if c not in (SRC, DST)]
        resolver = attr_resolver or {}

        def drop_selfloops(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[SRC] != batch[DST]]

        edges = remapped._edges.map_batches(drop_selfloops, batch_format="pandas", batch_size=None)
        aggs = {}
        for c in edge_cols:
            op = resolver.get(c, "sum")
            aggs[c] = (c, op)
        if aggs:
            edges = hash_aggregate(edges, [SRC, DST], aggs)
        else:
            edges = _dedup_edges(edges)
        return RayPGFrame(nodes, edges)

    # -- io -----------------------------------------------------------------

    def to_parquet(self, path: str) -> None:
        import os

        self._nodes.write_parquet(os.path.join(path, "nodes"))
        self._edges.write_parquet(os.path.join(path, "edges"))

    @classmethod
    def from_parquet(cls, path: str) -> "RayPGFrame":
        import os

        return cls(
            ray.data.read_parquet(os.path.join(path, "nodes")),
            ray.data.read_parquet(os.path.join(path, "edges")),
        )

    def to_json(self) -> dict:
        """Whole-graph JSON (small graphs; reference core/io.py:1254-1283)."""
        return {
            "nodes": self._nodes.to_pandas().to_dict("records"),
            "edges": self._edges.to_pandas().to_dict("records"),
        }

    @classmethod
    def from_json(cls, doc: dict) -> "RayPGFrame":
        return cls(pd.DataFrame(doc["nodes"]), pd.DataFrame(doc["edges"]))

    def to_triples(self, predicate_prop: str = TYPE) -> list:
        """Edges + literal props -> (s, p, o) rows
        (reference core/io.py:1144-1162)."""
        rows = []
        epdf = self._edges.to_pandas()
        for d in epdf.to_dict("records"):  # "@"-columns break itertuples names
            pred = d.get(predicate_prop) or "edge"
            rows.append((d[SRC], pred, d[DST]))
        npdf = self._nodes.to_pandas()
        for d in npdf.to_dict("records"):
            for k, v in d.items():
                if k not in (ID,) and v is not None and not (
                    isinstance(v, float) and np.isnan(v)
                ):
                    rows.append((d[ID], k, v))
        return rows


def _dedup_nodes(nodes: "ray.data.Dataset") -> "ray.data.Dataset":
    from bluegraph_ray.util import hash_distinct

    return hash_distinct(nodes, ID)


def _dedup_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    from bluegraph_ray.util import hash_distinct

    return hash_distinct(edges, [SRC, DST])
