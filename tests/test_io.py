"""Graph io round-trips (SURVEY.md §2.1)."""

from __future__ import annotations

import pandas as pd
import pytest

from bluegraph_ray.pgframe import DST, ID, SRC, TYPE, RayPGFrame
from bluegraph_ray.sources import io as gio


def frame():
    f = RayPGFrame(nodes=["a", "b", "c"], edges=[("a", "b"), ("b", "c")])
    return f.add_node_properties(
        pd.DataFrame({ID: ["a", "b"], "papers": [{"p1", "p2"}, {"p2"}]})
    )


def test_csv_roundtrip_set_cells(tmp_path):
    f = frame()
    gio.frame_to_csv(f, str(tmp_path / "nodes"), str(tmp_path / "edges"))
    g = gio.frame_from_csv(str(tmp_path / "nodes"), str(tmp_path / "edges"))
    df = g.nodes_df().set_index(ID)
    assert df.loc["a", "papers"] == {"p1", "p2"}
    assert set(g.edges()) == {("a", "b"), ("b", "c")}


def test_jsonld_fold_and_dump():
    resources = [
        {"@id": "x", "@type": "Person", "name": "X",
         "knows": {"@id": "y", "@type": "Person"}},
        {"@id": "z", "@type": "Org",
         "members": [{"@id": "x"}, {"@id": "y"}]},
    ]
    f = gio.frame_from_jsonld(resources)
    assert set(f.nodes()) == {"x", "y", "z"}
    pairs = {(s, t) for s, t in f.edges()}
    assert ("x", "y") in pairs and ("z", "x") in pairs and ("z", "y") in pairs
    docs = gio.frame_to_jsonld(f)
    byid = {d["@id"]: d for d in docs}
    assert {e["@id"] for e in byid["z"]["edges"]} == {"x", "y"}


def test_gephi_export(tmp_path):
    f = frame()
    gio.export_to_gephi(f, str(tmp_path / "n"), str(tmp_path / "e"))
    import ray.data

    nodes = ray.data.read_csv(str(tmp_path / "n")).to_pandas()
    edges = ray.data.read_csv(str(tmp_path / "e")).to_pandas()
    assert set(nodes.columns) == {"Id", "Label"}
    assert set(edges.columns) == {"Source", "Target"}
    idmap = dict(zip(nodes["Label"], nodes["Id"]))
    assert {(idmap["a"], idmap["b"]), (idmap["b"], idmap["c"])} == set(
        zip(edges["Source"], edges["Target"])
    )


def test_ontology_gated():
    with pytest.raises(NotImplementedError):
        gio.frame_from_ontology("/tmp/nope.ttl")
