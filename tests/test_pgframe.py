"""RayPGFrame facade vs the reference's PGFrame semantics
(/root/reference/tests/io/test_pgframes.py is the behavioural model)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from bluegraph_ray.pgframe import DST, ID, SRC, TYPE, RayPGFrame
from bluegraph_ray.util import hash_join


def small_frame() -> RayPGFrame:
    f = RayPGFrame(nodes=["a", "b", "c", "d"],
                   edges=[("a", "b"), ("b", "c"), ("a", "c")])
    return f


def test_basic_counts_and_lists():
    f = small_frame()
    assert f.number_of_nodes() == 4
    assert f.number_of_edges() == 3
    assert f.nodes() == ["a", "b", "c", "d"]
    assert set(f.edges()) == {("a", "b"), ("b", "c"), ("a", "c")}


def test_add_node_properties_upsert():
    f = small_frame()
    f2 = f.add_node_properties(pd.DataFrame({ID: ["a", "b"], "w": [1.0, 2.0]}))
    f3 = f2.add_node_properties(pd.DataFrame({ID: ["b", "c"], "w": [9.0, 3.0]}))
    df = f3.nodes_df().set_index(ID)
    assert df.loc["a", "w"] == 1.0
    assert df.loc["b", "w"] == 9.0  # overwritten
    assert df.loc["c", "w"] == 3.0
    assert np.isnan(df.loc["d", "w"])
    assert f3.node_properties() == ["w"]


def test_edge_properties_and_types():
    f = small_frame()
    f = f.add_edge_properties(
        pd.DataFrame({SRC: ["a", "b"], DST: ["b", "c"], "weight": [0.5, 1.5]})
    )
    f = f.add_edge_types({("a", "b"): "Likes", ("b", "c"): "Likes",
                          ("a", "c"): "Knows"})
    df = f.edges_df().set_index([SRC, DST])
    assert df.loc[("a", "b"), "weight"] == 0.5
    assert df.loc[("a", "c"), TYPE] == "Knows"


def test_rename_filter_subgraph_remove():
    f = small_frame()
    g = f.rename_nodes({"a": "A"})
    assert "A" in g.nodes() and "a" not in g.nodes()
    assert ("A", "b") in g.edges()

    sub = f.subgraph(["a", "b", "c"])
    assert sub.number_of_nodes() == 3 and sub.number_of_edges() == 3
    sub2 = f.subgraph(["a", "b"])
    assert set(sub2.edges()) == {("a", "b")}

    rm = f.remove_nodes(["c"])
    assert rm.number_of_nodes() == 3
    assert set(rm.edges()) == {("a", "b")}


def test_isolated_and_density():
    f = small_frame()
    assert f.isolated_nodes() == ["d"]
    f2 = f.remove_isolated_nodes()
    assert f2.number_of_nodes() == 3
    # undirected density 2m/(n(n-1)) (reference core/io.py:610-615)
    assert f.density() == pytest.approx(2 * 3 / (4 * 3))


def test_types_subset_semantics():
    f = small_frame().add_node_types({"a": "Person", "b": "Person", "c": "Org"})
    assert set(f.nodes_of_type("Person")) == {"a", "b"}
    assert f.nodes_of_type("Org") == ["c"]


def test_merge_nodes_contraction():
    """cord19kg merge_nodes analog (/root/reference/cord19kg/utils.py:1026-1108):
    merging b,c re-points edges, merges parallel edges, drops self-loops."""
    f = small_frame().add_edge_properties(
        pd.DataFrame({SRC: ["a", "b", "a"], DST: ["b", "c", "c"],
                      "frequency": [1.0, 2.0, 5.0]})
    )
    g = f.merge_nodes(["b", "c"], "bc", attr_resolver={"frequency": "sum"})
    assert set(g.nodes()) == {"a", "bc", "d"}
    edf = g.edges_df()
    assert len(edf) == 1
    r = edf.iloc[0]
    assert {r[SRC], r[DST]} == {"a", "bc"}
    assert r["frequency"] == 6.0  # parallel a-b(1) + a-c(5) merged; b-c self-loop dropped


def test_parquet_roundtrip(tmp_path):
    f = small_frame().add_node_properties(
        pd.DataFrame({ID: ["a", "b"], "score": [0.1, 0.2]})
    )
    f.to_parquet(str(tmp_path))
    g = RayPGFrame.from_parquet(str(tmp_path))
    assert g.number_of_nodes() == 4 and g.number_of_edges() == 3
    assert g.nodes_df().set_index(ID).loc["a", "score"] == pytest.approx(0.1)


def test_json_and_triples():
    f = small_frame().add_node_properties(pd.DataFrame({ID: ["a"], "p": ["x"]}))
    doc = f.to_json()
    g = RayPGFrame.from_json(doc)
    assert set(g.nodes()) == set(f.nodes())
    triples = f.to_triples()
    assert ("a", "p", "x") in triples
    assert ("a", "edge", "b") in triples


def test_hash_join_basic():
    l = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [2, 3, 4], "b": [20, 30, 40]}))
    inner = hash_join(l, r, "k").to_pandas().sort_values("k")
    assert list(inner["k"]) == [2, 3]
    outer = hash_join(l, r, "k", how="outer").to_pandas().sort_values("k")
    assert list(outer["k"]) == [1, 2, 3, 4]
    assert outer["a"].isna().sum() == 1 and outer["b"].isna().sum() == 1


def test_property_type_system():
    """Per-property declared-or-inferred types (reference core/io.py:248-346):
    numeric inferred from Arrow schema, category default, text validated."""
    nodes = pd.DataFrame({"@id": ["a", "b"], "score": [1.0, 2.0],
                          "label": ["x", "y"]})
    g = RayPGFrame(nodes, pd.DataFrame({"@source_id": ["a"], "@target_id": ["b"],
                                        "w": [3]}))
    # inferred
    assert g.is_numeric_node_prop("score")
    assert g.node_prop_type("label") == "category"
    assert g.edge_prop_type("w") == "numeric"
    # declared + validated
    g.node_prop_as_text("label")
    assert g.is_text_node_prop("label")
    g.node_prop_as_category("score")
    assert g.is_categorical_node_prop("score")
    with pytest.raises(ValueError):
        g.node_prop_as_text("score")  # float column cannot be text
    with pytest.raises(ValueError):
        g.edge_prop_as_numeric("nope")  # unknown property
    # declaration at add time propagates to the derived frame
    g2 = g.add_node_properties(pd.DataFrame({"@id": ["a"], "desc": ["hi"]}),
                               prop_type="text")
    assert g2.is_text_node_prop("desc")
    assert g2.is_text_node_prop("label")  # registry carried over


def test_lookup_typing_and_property_surface():
    nodes = pd.DataFrame({ID: ["a", "b", "c"], "w": [1.0, 2.0, 3.0],
                          "v": [10.0, 20.0, 30.0]})
    edges = pd.DataFrame({SRC: ["a", "a", "b"], DST: ["b", "c", "c"],
                          "f": [5, 6, 7]})
    g = RayPGFrame(nodes, edges)
    g = g.add_node_types({"a": "T1", "b": "T2", "c": "T1"})
    g = g.add_edge_types({("a", "b"): "E1", ("a", "c"): "E2", ("b", "c"): "E1"})

    assert g.get_node("b")["w"] == 2.0
    assert g.get_edge("a", "c")["f"] == 6
    with pytest.raises(KeyError):
        g.get_node("zz")
    assert g.neighbors("a") == ["b", "c"]
    assert g.neighbors("c") == ["a", "b"]

    assert g.has_node_types() and g.has_edge_types()
    assert set(g.node_types(flatten=True)) == {"T1", "T2"}
    assert set(g.edge_types(flatten=True)) == {"E1", "E2"}
    assert g.get_node_typing(as_dict=True)["a"] == "T1"
    assert g.get_edge_typing(as_dict=True)[("b", "c")] == "E1"
    assert g.edges_of_type("E1") == [("a", "b"), ("b", "c")]

    # removal surfaces
    g2 = g.remove_edges([("a", "b")])
    assert g2.number_of_edges() == 2
    g3 = g.remove_node_properties("v")
    assert "v" not in g3.node_properties()
    g4 = g.remove_edge_properties("f")
    assert "f" not in g4.edge_properties()

    # row-wise aggregation
    agg = g.aggregate_node_properties("sum", into="total")
    got = {r[ID]: r["total"] for r in agg._nodes.to_pandas().to_dict("records")}
    assert got == {"a": 11.0, "b": 22.0, "c": 33.0}

    # copy is independent metadata-wise
    c = g.copy()
    assert c.number_of_nodes() == 3 and c.number_of_edges() == 3
