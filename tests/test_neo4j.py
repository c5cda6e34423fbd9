"""Neo4j sink/source parity (reference backends/neo4j/io.py) without a
server: statement text, batching, phase ordering and read-back fold are
exercised against an injected fake driver."""

import functools
import os

import numpy as np
import pandas as pd
import pytest

from bluegraph_ray.pgframe import DST, ID, SRC, RayPGFrame
from bluegraph_ray.sources.neo4j import (
    cypher_statements,
    neo4j_to_pgframe,
    pgframe_to_neo4j,
    property_repr,
)


def _frame():
    nodes = pd.DataFrame({
        ID: ["a", "b'q", "c"],
        "@type": ["Person", "Person", "Org"],
        "score": [1.5, float("nan"), 3.0],
        "name": ["Ann", "Bob", None],
        "tags": [["x", "y"], [], ["z"]],
    })
    edges = pd.DataFrame({
        SRC: ["a", "b'q"],
        DST: ["b'q", "c"],
        "@type": ["KNOWS", "WORKS_AT"],
        "weight": [0.25, 4.0],
    })
    return RayPGFrame(nodes, edges)


def test_property_repr_rules():
    props = property_repr(
        {"name": "O'Hara", "score": 2.5, "bad": float("nan"),
         "tags": ["u", float("nan")], "inf": float("inf")},
        {"name": "category", "score": "numeric", "bad": "numeric",
         "tags": "category", "inf": "numeric"})
    assert "name: 'O\\'Hara'" in props          # escaped string
    assert "score: 2.5" in props                 # numeric unquoted
    assert not any(p.startswith("bad") for p in props)   # NaN dropped
    assert "tags: ['u']" in props                # NaN list member dropped
    assert "inf: 1.0 / 0.0" in props             # io.py:48-53 rendering


def test_statement_shapes_and_batching(ray_session):
    frame = _frame()
    node_ds, edge_ds = cypher_statements(
        frame, node_label="Entity", edge_label="REL", batch_size=2)
    node_stmts = [r["statement"] for r in node_ds.take_all()]
    edge_stmts = [r["statement"] for r in edge_ds.take_all()]
    # 3 nodes / batch_size 2 -> 2 statements; 2 edges -> 1 statement
    assert len(node_stmts) == 2 and len(edge_stmts) == 1
    joined = "\n".join(node_stmts)
    assert "UNWIND batch as individual" in joined
    assert "CREATE (n:Entity)" in joined
    assert "id: 'b\\'q'" in joined               # escaped node id
    assert "score: 1.5" in joined and "score: nan" not in joined
    e = edge_stmts[0]
    assert 'MATCH (n {id: individual["source"]})' in e
    assert "CREATE (n)-[r:REL]->(m)" in e
    assert "FOREACH (dummy in CASE WHEN m IS NULL" in e  # io.py:230-236 guard
    assert "source: 'a'" in e and "target: 'b\\'q'" in e
    assert "weight: 0.25" in e


def test_types_as_labels(ray_session):
    frame = _frame()
    node_ds, edge_ds = cypher_statements(
        frame, node_label="Entity", node_types_as_labels=True,
        edge_types_as_labels=True, batch_size=10)
    node_stmts = [r["statement"] for r in node_ds.take_all()]
    # 1 CREATE batch + 3 per-node label SETs (io.py:179-188)
    assert len(node_stmts) == 4
    assert any("SET n:Person" in s for s in node_stmts)
    assert any("SET n:Org" in s for s in node_stmts)
    edge_stmts = [r["statement"] for r in edge_ds.take_all()]
    # one statement per relationship type present in the batch
    assert sorted("KNOWS" if "[r:KNOWS]" in s else "WORKS_AT"
                  for s in edge_stmts) == ["KNOWS", "WORKS_AT"]


def test_sink_executes_nodes_before_edges(ray_session, tmp_path):
    # The factory must be importable from Ray workers (tests/ is not on the
    # worker sys.path), so the library's offline transport is the fixture.
    from bluegraph_ray.sources.neo4j import FileStatementDriver

    log = str(tmp_path / "stmts.cypher")
    frame = _frame()
    counts = pgframe_to_neo4j(
        frame, driver_factory=functools.partial(FileStatementDriver, log),
        node_label="Entity", edge_label="REL", batch_size=2, concurrency=2)
    assert counts == {"nodes": 2, "edges": 1}
    lines = open(log).read().strip().split("\n")
    kinds = ["EDGE" if 'individual["source"]' in ln else "NODE"
             for ln in lines]
    assert kinds.count("NODE") == 2 and kinds.count("EDGE") == 1
    # every node statement ran before any edge statement (phase barrier)
    assert max(i for i, k in enumerate(kinds) if k == "NODE") < \
        min(i for i, k in enumerate(kinds) if k == "EDGE")
    assert all(ln.endswith(";") for ln in lines)  # cypher-shell replayable


def test_sink_label_validation():
    frame = _frame()
    with pytest.raises(ValueError, match="node label"):
        pgframe_to_neo4j(RayPGFrame(["x"]), driver_factory=lambda: None,
                         edge_label="REL")
    with pytest.raises(ValueError, match="edge label"):
        pgframe_to_neo4j(frame, driver_factory=lambda: None,
                         node_label="Entity")


def test_source_fold(ray_session):
    def execute_fn(query):
        if query.startswith("MATCH (n:Entity) RETURN"):
            return [{"node": {"id": "a", "score": 1.5}},
                    {"node": {"id": "b", "score": 2.0}}]
        return [{"source_id": "a", "target_id": "b", "edge": {"weight": 3.0}}]

    frame = neo4j_to_pgframe(execute_fn=execute_fn, node_label="Entity",
                             edge_label="REL",
                             node_prop_types={"score": "numeric"})
    ndf = frame.nodes_df().sort_values(ID)
    assert list(ndf[ID]) == ["a", "b"]
    assert list(ndf["score"]) == [1.5, 2.0]
    edf = frame.edges_df()
    assert list(zip(edf[SRC], edf[DST])) == [("a", "b")]
    assert list(edf["weight"]) == [3.0]
    assert frame.node_prop_type("score") == "numeric"


def test_uri_path_gated_without_neo4j_package():
    try:
        import neo4j  # noqa: F401
        pytest.skip("neo4j package present")
    except ImportError:
        pass
    from bluegraph_ray.sources.neo4j import _default_driver_factory
    with pytest.raises(ImportError, match="driver_factory"):
        _default_driver_factory("bolt://localhost", "u", "p")


# ---------------------------------------------------------------------------
# live-server integration (env-gated — closes SURVEY §2.1's last "partial")
# ---------------------------------------------------------------------------

_LIVE_URI = os.environ.get("GRAFT_NEO4J_URI")


def _have_neo4j_pkg() -> bool:
    try:
        import neo4j  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _LIVE_URI or not _have_neo4j_pkg(),
    reason="live Neo4j integration: set GRAFT_NEO4J_URI (plus optional "
           "GRAFT_NEO4J_USER/GRAFT_NEO4J_PASS) and install the `neo4j` "
           "package — neither exists in this container, so the statement "
           "layer is covered by the fake-driver tests above and this test "
           "documents + exercises the wire path when a server IS available")
def test_live_neo4j_round_trip():
    """Full wire round-trip against a real server: write the property graph
    through the actor-pool executor, read it back, compare node/edge sets
    and properties. DESTRUCTIVE on the target database (deletes Entity/
    RELATED subgraph first) — point GRAFT_NEO4J_URI at a scratch instance."""
    from bluegraph_ray.sources.neo4j import _default_driver_factory, execute

    user = os.environ.get("GRAFT_NEO4J_USER", "neo4j")
    pw = os.environ.get("GRAFT_NEO4J_PASS", "neo4j")

    def factory():
        return _default_driver_factory(_LIVE_URI, user, pw)

    drv = factory()
    execute(drv, "MATCH (n:Entity) DETACH DELETE n")

    frame = _frame()
    counts = pgframe_to_neo4j(
        frame, driver_factory=factory, node_label="Entity",
        edge_label="RELATED", batch_size=2)
    assert counts["nodes"] >= 1 and counts["edges"] >= 1

    back = neo4j_to_pgframe(
        execute_fn=functools.partial(execute, drv),
        node_label="Entity", edge_label="RELATED")
    assert sorted(back.nodes()) == sorted(frame.nodes())
    assert sorted(map(tuple, back.edges())) == sorted(map(tuple, frame.edges()))
    # property round-trip on one typed node
    orig = frame.nodes_df().set_index(ID)
    got = back.nodes_df().set_index(ID)
    assert float(got.loc["a", "score"]) == float(orig.loc["a", "score"])
