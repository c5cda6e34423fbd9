"""Neo4j sink / source (SURVEY.md §2.1), server-optional.

Parity with the reference's Neo4j io surface
(/root/reference/bluegraph/backends/neo4j/io.py:109-280): the same batched
``UNWIND`` Cypher statement shapes (CREATE+SET for nodes at io.py:160-175,
MATCH/OPTIONAL MATCH/FOREACH guarded edge creation at io.py:225-237, 10k rows
per statement at io.py:117), the same property rendering rules
(string-quote + escape, list cells, NaN dropped, numeric unquoted —
``_generate_property_repr`` io.py:66-101) and the same read-back queries
(io.py:246-279).

Ray-Data-first split of responsibilities:

- **Statement generation is distributed**: ``cypher_statements`` renders one
  UNWIND statement per ≤``batch_size``-row Arrow batch inside ``map_batches``
  — at 10^9 nodes the driver never sees a row, only the statement stream.
- **Execution is an actor-pool stage**: each actor opens ONE connection in
  ``__init__`` (``driver_factory`` — the ``neo4j.GraphDatabase.driver`` call
  for a real server, anything session-shaped for tests) and runs its
  partition's statements through it. Nodes are fully consumed before edges
  start (edge MATCH requires the nodes to exist).

No Neo4j server exists in this container, so the default transport is gated
behind an import-try of the ``neo4j`` package with a clear error; everything
up to the wire protocol — statement text, batching, phase ordering, label
application, read-back frame fold — is real and tested against an injected
fake driver.
"""

from __future__ import annotations

import math
import numbers
import warnings
from collections.abc import Iterable

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.functions.setops import normalize_to_set
from bluegraph_ray.pgframe import DST, ID, SRC, TYPE, RayPGFrame

NEO4J_BATCH_SIZE = 10_000  # reference io.py:117 (batch_size=10000)


# -- value / key rendering (reference io.py:48-101) --------------------------

def preprocess_value(v):
    """Infinities render as Cypher division expressions (io.py:48-53; the
    reference's ``"-s1.0 / 0.0"`` for -inf is a typo producing invalid
    Cypher — rendered here as the intended ``-1.0 / 0.0``)."""
    if isinstance(v, float):
        if v == float("inf"):
            return "1.0 / 0.0"
        if v == float("-inf"):
            return "-1.0 / 0.0"
    return v


def preprocess_key(key: str) -> str:
    return key.replace(".", "_").replace(":", "_")


def safe_node_id(index) -> str:
    if isinstance(index, str):
        return index.replace("'", "\\'")
    return index


def _is_missing(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def property_repr(properties: dict, prop_types: dict | None = None) -> list[str]:
    """``key: value`` Cypher fragments for one row (io.py:66-101): strings
    quoted + escaped, iterables become list literals with NaN members dropped
    (empty list omitted), numerics unquoted, NaN omitted."""
    if prop_types is None:
        prop_types = {
            k: "numeric" if isinstance(v, numbers.Number) else "category"
            for k, v in properties.items()
        }
    props = []
    for k, v in properties.items():
        if k in (ID, TYPE):
            continue
        if isinstance(v, str):
            props.append("{}: '{}'".format(
                preprocess_key(k), str(preprocess_value(v)).replace("'", "\\'")))
        elif isinstance(v, Iterable):
            values = ["'{}'".format(str(preprocess_value(vv)).replace("'", "\\'"))
                      for vv in v if not _is_missing(vv)]
            if values:
                props.append("{}: [{}]".format(preprocess_key(k), ", ".join(values)))
        elif prop_types.get(k) == "numeric" and not _is_missing(v):
            props.append("{}: {}".format(preprocess_key(k), preprocess_value(v)))
        elif not _is_missing(v):
            props.append("{}: {}".format(preprocess_key(k), v))
    return props


def labels_from_types(type_cell) -> list[str]:
    return sorted(normalize_to_set(type_cell))


# -- distributed statement generation ----------------------------------------

def _node_statement(rows: list[dict], node_label: str | None,
                    prop_types: dict) -> str:
    node_repr = []
    for properties in rows:
        node_dict = ["id: '{}'".format(safe_node_id(properties[ID]))]
        node_dict += property_repr(properties, prop_types)
        node_repr.append("{" + ", ".join(node_dict) + "}")
    label = f":{node_label}" if node_label else ""
    return (
        f"WITH [{', '.join(node_repr)}] AS batch\n"
        f"UNWIND batch as individual\n"
        f"CREATE (n{label})\n"
        f"SET n += individual"
    )


def _edge_statement(rows: list[dict], edge_label: str,
                    prop_types: dict) -> str:
    edge_repr = []
    for properties in rows:
        edge_dict = [
            "source: '{}'".format(safe_node_id(properties[SRC])),
            "target: '{}'".format(safe_node_id(properties[DST])),
        ]
        edge_dict.append("props: {{{}}}".format(
            ", ".join(property_repr(
                {k: v for k, v in properties.items() if k not in (SRC, DST)},
                prop_types))))
        edge_repr.append("{" + ", ".join(edge_dict) + "}")
    return (
        f"WITH [{', '.join(edge_repr)}] AS batch\n"
        f"UNWIND batch as individual\n"
        f'MATCH (n {{id: individual["source"]}})\n'
        f"WITH individual, n\n"
        f'OPTIONAL MATCH (m {{id: individual["target"]}})\n'
        f"FOREACH (dummy in CASE WHEN m IS NULL THEN [] ELSE [1] END |\n"
        f"    CREATE (n)-[r:{edge_label}]->(m)\n"
        f'    SET r += individual["props"]\n'
        f")"
    )


def cypher_statements(frame: RayPGFrame, *, node_label: str | None = None,
                      edge_label: str | None = None,
                      node_types_as_labels: bool = False,
                      edge_types_as_labels: bool = False,
                      batch_size: int = NEO4J_BATCH_SIZE):
    """-> (node_statements, edge_statements) Datasets, each with a single
    ``statement`` column, rendered distributed (one statement per
    ≤batch_size-row batch — reference loops the same chunks on the driver,
    io.py:149-175/203-237). Node-label SET statements (io.py:179-188) ride
    the node stream after the CREATE statement of their batch, preserving
    the reference's nodes-then-labels order per node."""
    node_ptypes = dict(frame._node_prop_types)
    edge_ptypes = dict(frame._edge_prop_types)
    for p in frame.node_properties():
        node_ptypes.setdefault(p, frame.node_prop_type(p))
    for p in frame.edge_properties():
        edge_ptypes.setdefault(p, frame.edge_prop_type(p))

    def gen_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        stmts = [_node_statement(batch.to_dict("records"), node_label,
                                 node_ptypes)]
        if node_types_as_labels and TYPE in batch.columns:
            for _, row in batch.iterrows():
                labels = labels_from_types(row[TYPE])
                if labels:
                    stmts.append(
                        "MATCH (n {{id: '{}'}})\nSET n:{}".format(
                            safe_node_id(row[ID]), ":".join(labels)))
        return pd.DataFrame({"statement": stmts})

    custom_rel = edge_types_as_labels and frame.has_edge_types()

    def gen_edges(batch: pd.DataFrame) -> pd.DataFrame:
        stmts = []
        if custom_rel:
            # relationship type lives in the CREATE clause -> one statement
            # per (type, batch-slice); set-typed edges replicate per member
            # (reference iterates edge_types and re-selects, io.py:203-210).
            labels = batch[TYPE].map(labels_from_types)
            for label in sorted({l for ls in labels for l in ls}):
                sub = batch[[label in ls for ls in labels]]
                stmts.append(_edge_statement(
                    sub.to_dict("records"), label, edge_ptypes))
        else:
            stmts.append(_edge_statement(
                batch.to_dict("records"), edge_label, edge_ptypes))
        return pd.DataFrame({"statement": stmts})

    nodes = frame._nodes.map_batches(gen_nodes, batch_format="pandas",
                                     batch_size=batch_size)
    edges = frame._edges.map_batches(gen_edges, batch_format="pandas",
                                     batch_size=batch_size)
    return nodes, edges


# -- execution ---------------------------------------------------------------

class FileStatementDriver:
    """Offline driver-shaped transport: every ``session().run(query)``
    appends the statement to ``path`` (O_APPEND — safe under concurrent
    actors). Useful to export the Cypher stream for later ``cypher-shell``
    replay, and as the test transport in server-less environments."""

    def __init__(self, path: str):
        self._path = path

    class _Session:
        def __init__(self, path):
            self._path = path

        def run(self, query: str):
            with open(self._path, "a") as f:
                f.write(query.replace("\n", " ") + ";\n")
            return []

        def close(self):
            pass

    def session(self):
        return FileStatementDriver._Session(self._path)


def _default_driver_factory(uri, username, password):
    try:
        from neo4j import GraphDatabase  # gated: not in this container
    except ImportError as e:
        raise ImportError(
            "pgframe_to_neo4j needs either a `driver_factory` (any object "
            "whose .session().run(query) works) or the `neo4j` package for "
            "uri/username/password connections; neither is available."
        ) from e
    return GraphDatabase.driver(uri, auth=(username, password))


def execute(driver, query: str):
    """Reference io.py:30-35: one session per statement, data() out."""
    session = driver.session()
    response = session.run(query)
    result = response.data() if hasattr(response, "data") else response
    if hasattr(session, "close"):
        session.close()
    return result


class _ExecuteStage:
    """Actor-pool statement executor: ONE connection per actor
    (``driver_factory()`` in __init__), statements run per batch in
    __call__. This is the scale shape: N actors = N connections, each
    writing its partition of the statement stream."""

    def __init__(self, driver_factory):
        self._driver = driver_factory()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        for stmt in batch["statement"]:
            execute(self._driver, stmt)
        return pd.DataFrame({"executed": [len(batch)]})


def pgframe_to_neo4j(frame: RayPGFrame | None = None, *, uri=None,
                     username=None, password=None, driver_factory=None,
                     node_label: str | None = None,
                     edge_label: str | None = None,
                     node_types_as_labels: bool = False,
                     edge_types_as_labels: bool = False,
                     batch_size: int = NEO4J_BATCH_SIZE,
                     concurrency: int = 4) -> dict:
    """Write the property graph to Neo4j (reference io.py:109-240).

    Label validation mirrors the reference (io.py:119-139). Node statements
    are fully executed before any edge statement starts (the edge MATCH
    needs the endpoint nodes); within each phase execution is an actor pool
    of ``concurrency`` connections. Returns executed-statement counts.
    """
    if node_label is None and (
            not node_types_as_labels or frame is None
            or not frame.has_node_types()):
        raise ValueError(
            "Cannot create a Neo4j graph without node labels: node label is "
            "not provided and 'node_types_as_labels' is either set to False "
            "or the nodes do not have types")
    if edge_label is None:
        if not edge_types_as_labels or frame is None or not frame.has_edge_types():
            raise ValueError(
                "Cannot create a Neo4j graph without edge labels: edge label "
                "is not provided and 'edge_types_as_labels' is either set to "
                "False or the edges do not have types")
    elif edge_types_as_labels and frame.has_edge_types():
        warnings.warn("Edge types are used as Neo4j relationship types, "
                      "provided edge label will be ignored")

    if driver_factory is None:
        if uri is None:
            raise ValueError("provide driver_factory or uri/username/password")
        def driver_factory():  # noqa: F811 — closure over connection params
            return _default_driver_factory(uri, username, password)

    node_stmts, edge_stmts = cypher_statements(
        frame, node_label=node_label, edge_label=edge_label,
        node_types_as_labels=node_types_as_labels,
        edge_types_as_labels=edge_types_as_labels, batch_size=batch_size)

    counts = {}
    for phase, stmts in (("nodes", node_stmts), ("edges", edge_stmts)):
        done = stmts.map_batches(
            _ExecuteStage, fn_constructor_args=(driver_factory,),
            batch_format="pandas", concurrency=concurrency,
            batch_size=None).to_pandas()
        counts[phase] = int(done["executed"].sum()) if len(done) else 0
    return counts


def neo4j_to_pgframe(*, uri=None, username=None, password=None,
                     driver_factory=None, execute_fn=None,
                     node_label: str, edge_label: str,
                     node_prop_types: dict | None = None,
                     edge_prop_types: dict | None = None) -> RayPGFrame:
    """Read a PGFrame back from Neo4j (reference io.py:245-280): node query
    returns each node's property map, edge query returns endpoint ids +
    ``properties(r)``; ids are stringified. ``execute_fn(query) ->
    list[dict]`` is the injectable transport."""
    if execute_fn is None:
        if driver_factory is None:
            if uri is None:
                raise ValueError(
                    "provide execute_fn, driver_factory or uri/credentials")
            driver = _default_driver_factory(uri, username, password)
        else:
            driver = driver_factory()
        execute_fn = lambda q: execute(driver, q)  # noqa: E731

    result = execute_fn(f"MATCH (n:{node_label}) RETURN n as node")
    nodes = pd.DataFrame([r["node"] for r in result]).rename(columns={"id": ID})
    nodes[ID] = nodes[ID].astype(str)

    result = execute_fn(
        f"MATCH (n:{node_label})-[r:{edge_label}]->(m:{node_label})\n"
        f"RETURN n.id as source_id, m.id as target_id, properties(r) as edge")
    edges = pd.DataFrame([
        {**r["edge"], SRC: str(r["source_id"]), DST: str(r["target_id"])}
        for r in result
    ]) if result else None

    frame = RayPGFrame(nodes, edges)
    for p, t in (node_prop_types or {}).items():
        frame._set_prop_type("node", p, t)
    for p, t in (edge_prop_types or {}).items():
        frame._set_prop_type("edge", p, t)
    return frame
