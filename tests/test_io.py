"""Graph io round-trips (SURVEY.md §2.1)."""

from __future__ import annotations

import os

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


def test_ontology_non_native_formats_gated():
    # json-ld still requires rdflib (absent here); N-Triples, the Turtle
    # subset and the RDF/XML subset parse natively
    with pytest.raises(NotImplementedError):
        gio.frame_from_ontology("/tmp/nope.jsonld", format="json-ld")


_ONTO_NT = """
<http://ex.org/onto#Cell> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> .
<http://ex.org/onto#Cell> <http://www.w3.org/2000/01/rdf-schema#label> "Cell" .
<http://ex.org/onto#Cell> <http://ex.org/onto#definition> "Basic unit \\"of\\" life" .
<http://ex.org/onto#Cell> <http://ex.org/onto#synonym> "cellule"@fr .
<http://ex.org/onto#Cell> <http://ex.org/onto#synonym> "zelle" .
<http://ex.org/onto#Neuron> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> .
<http://ex.org/onto#Neuron> <http://www.w3.org/2000/01/rdf-schema#label> "Neuron" .
<http://ex.org/onto#Neuron> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://ex.org/onto#Cell> .
<http://ex.org/onto#Neuron> <http://www.w3.org/2000/01/rdf-schema#subClassOf> _:b0 .
_:b0 <http://www.w3.org/2002/07/owl#someValuesFrom> <http://ex.org/onto#Brain> .
_:b0 <http://www.w3.org/2002/07/owl#onProperty> <http://ex.org/onto#partOf> .
<http://ex.org/onto#Brain> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> .
<http://ex.org/onto#Brain> <http://www.w3.org/2000/01/rdf-schema#label> "Brain" .
<http://ex.org/onto#partOf> <http://www.w3.org/2000/01/rdf-schema#label> "part_of" .
<http://ex.org/onto#n1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#NamedIndividual> .
<http://ex.org/onto#n1> <http://www.w3.org/2000/01/rdf-schema#label> "my neuron" .
<http://ex.org/onto#Unlabeled> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> .
"""


def test_from_ontology_ntriples(tmp_path):
    """from_ontology folding semantics (reference core/io.py:617-708) over
    the native N-Triples path: labeled classes/individuals as nodes,
    IS_SUBCLASS_OF + OWL-restriction edges, literal props (multi-valued ->
    collection), unlabeled classes skipped, uri prop names shortened."""
    p = tmp_path / "onto.nt"
    p.write_text(_ONTO_NT)
    f = gio.frame_from_ontology(str(p), remove_prop_uris=True)
    assert sorted(f.nodes()) == ["Brain", "Cell", "Neuron", "my neuron"]
    nd = f.nodes_df().set_index("@id")
    assert nd.loc["Cell", "definition"] == 'Basic unit "of" life'
    assert sorted(nd.loc["Cell", "synonym"]) == ["cellule", "zelle"]
    types = {(r["@source_id"], r["@target_id"]): list(r["@type"])
             for r in f.edges_df().to_dict("records")}
    assert types == {("Neuron", "Cell"): ["IS_SUBCLASS_OF"],
                     ("Neuron", "Brain"): ["part_of"]}


_ONTO_TTL = """
@prefix : <http://ex.org/onto#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@base <http://ex.org/onto> .

<http://ex.org/onto> rdf:type owl:Ontology .

:partOf rdf:type owl:ObjectProperty ;
        rdfs:label "part_of"@en .

:Cell rdf:type owl:Class ;
      rdfs:label "Cell"@en ;
      :definition "Basic unit \\"of\\" life"^^xsd:string ;
      :synonym "cellule"@fr , "zelle" .

# nested anonymous restriction + plain superclass in one predicate list
:Neuron rdf:type owl:Class ;
        rdfs:subClassOf :Cell ,
                        [ rdf:type owl:Restriction ;
                          owl:onProperty :partOf ;
                          owl:someValuesFrom :Brain
                        ] ;
        rdfs:label "Neuron"@en .

:Brain a owl:Class ;
       rdfs:label "Brain"@en .

:n1 rdf:type owl:NamedIndividual ;
    rdfs:label "my neuron" .

:Unlabeled rdf:type owl:Class .
"""


def test_from_ontology_turtle(tmp_path):
    """Native Turtle-subset path (sources/io.parse_turtle) must fold to the
    exact same frame as the equivalent N-Triples (reference core/io.py:617,
    whose default format is turtle)."""
    p = tmp_path / "onto.ttl"
    p.write_text(_ONTO_TTL)
    f = gio.frame_from_ontology(str(p), format="turtle",
                                remove_prop_uris=True)
    assert sorted(f.nodes()) == ["Brain", "Cell", "Neuron", "my neuron"]
    nd = f.nodes_df().set_index("@id")
    assert nd.loc["Cell", "definition"] == 'Basic unit "of" life'
    assert sorted(nd.loc["Cell", "synonym"]) == ["cellule", "zelle"]
    types = {(r["@source_id"], r["@target_id"]): list(r["@type"])
             for r in f.edges_df().to_dict("records")}
    assert types == {("Neuron", "Cell"): ["IS_SUBCLASS_OF"],
                     ("Neuron", "Brain"): ["part_of"]}


_ONTO_XML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:ex="http://ex.org/onto#"
         xml:base="http://ex.org/onto">
  <owl:Ontology rdf:about="http://ex.org/onto"/>
  <owl:ObjectProperty rdf:about="#partOf">
    <rdfs:label xml:lang="en">part_of</rdfs:label>
  </owl:ObjectProperty>
  <owl:Class rdf:about="#Cell">
    <rdfs:label xml:lang="en">Cell</rdfs:label>
    <ex:definition rdf:datatype="http://www.w3.org/2001/XMLSchema#string"
      >Basic unit "of" life</ex:definition>
    <ex:synonym xml:lang="fr">cellule</ex:synonym>
    <ex:synonym>zelle</ex:synonym>
  </owl:Class>
  <owl:Class rdf:about="#Neuron">
    <rdfs:subClassOf rdf:resource="#Cell"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="#partOf"/>
        <owl:someValuesFrom rdf:resource="#Brain"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <rdfs:label xml:lang="en">Neuron</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="#Brain">
    <rdfs:label xml:lang="en">Brain</rdfs:label>
  </owl:Class>
  <owl:NamedIndividual rdf:about="#n1">
    <rdfs:label>my neuron</rdfs:label>
  </owl:NamedIndividual>
  <owl:Class rdf:about="#Unlabeled"/>
</rdf:RDF>
"""


def test_from_ontology_rdfxml(tmp_path):
    """Native RDF/XML-subset path (sources/io.parse_rdfxml) must fold to
    the exact same frame as the N-Triples / Turtle equivalents (reference
    core/io.py:617 parses the same serializations via rdflib)."""
    p = tmp_path / "onto.owl"
    p.write_text(_ONTO_XML)
    f = gio.frame_from_ontology(str(p), format="xml", remove_prop_uris=True)
    assert sorted(f.nodes()) == ["Brain", "Cell", "Neuron", "my neuron"]
    nd = f.nodes_df().set_index("@id")
    assert nd.loc["Cell", "definition"] == 'Basic unit "of" life'
    assert sorted(nd.loc["Cell", "synonym"]) == ["cellule", "zelle"]
    types = {(r["@source_id"], r["@target_id"]): list(r["@type"])
             for r in f.edges_df().to_dict("records")}
    assert types == {("Neuron", "Cell"): ["IS_SUBCLASS_OF"],
                     ("Neuron", "Brain"): ["part_of"]}


def test_parse_rdfxml_forms():
    t = gio.parse_rdfxml(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://e/">'
        '<rdf:Description rdf:about="http://a" ex:name="lit-attr">'
        '<ex:p rdf:resource="http://b"/>'
        '<ex:q rdf:parseType="Resource"><ex:r>7</ex:r></ex:q>'
        '<ex:s rdf:nodeID="z"/>'
        '</rdf:Description>'
        '<ex:Thing rdf:nodeID="z"><ex:v>x</ex:v></ex:Thing>'
        '</rdf:RDF>')
    assert ("http://a", "http://e/name", "lit-attr", True) in t
    assert ("http://a", "http://e/p", "http://b", False) in t
    bn = [o for s, p, o, l in t
          if s == "http://a" and p == "http://e/q"][0]
    assert bn.startswith("_:") and (bn, "http://e/r", "7", True) in t
    assert ("http://a", "http://e/s", "_:z", False) in t
    assert ("_:z", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://e/Thing", False) in t
    assert ("_:z", "http://e/v", "x", True) in t
    with pytest.raises(ValueError):
        gio.parse_rdfxml("<unqualified><also/></unqualified>")


_REF_TTL = "/root/reference/tests/test_ontology.ttl"


@pytest.mark.skipif(not os.path.exists(_REF_TTL),
                    reason="reference fixture not present")
def test_from_ontology_reference_fixture():
    """Mirror the reference's own test_from_ontology assertions
    (tests/io/test_pgframes.py:198-210) on its fixture: 10 nodes, 14 edges,
    annotation props a/b resolved to their labeled names."""
    f = gio.frame_from_ontology(_REF_TTL, format="turtle")
    assert len(f.nodes()) == 10
    assert len(f.edges()) == 14
    nd = f.nodes_df().set_index("@id")
    assert nd.loc["Agent", "a"] == "hello"
    assert nd.loc["Action", "a"] == "Lala"
    assert nd.loc["Agent", "b"] == "bye"
    assert nd.loc["Action", "b"] == "Lblb"


def test_parse_turtle_forms():
    t = gio.parse_turtle(
        '@prefix ex: <http://e/> .\n'
        'ex:s a ex:C ; ex:p "x"@en , "1.5"^^ex:dt ; ex:q 2.5 , true .\n'
        '<http://a> ex:p [ ex:r ex:o ] .\n')
    assert ("http://e/s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://e/C", False) in t
    assert ("http://e/s", "http://e/p", "x", True) in t
    assert ("http://e/s", "http://e/p", "1.5", True) in t
    assert ("http://e/s", "http://e/q", "2.5", True) in t
    assert ("http://e/s", "http://e/q", "true", True) in t
    bn = [o for s, p, o, l in t if s == "http://a" and p == "http://e/p"][0]
    assert bn.startswith("_:")
    assert (bn, "http://e/r", "http://e/o", False) in t
    with pytest.raises(ValueError):
        gio.parse_turtle("und:efined ex:p ex:o .")


def test_parse_ntriples_forms():
    t = gio.parse_ntriples(
        '<http://a> <http://p> <http://b> .\n'
        '# comment\n'
        '_:x <http://p> "lit with \\u00e9"^^<http://www.w3.org/2001/XMLSchema#string> .\n')
    assert t[0] == ("http://a", "http://p", "http://b", False)
    assert t[1] == ("_:x", "http://p", "lit with \u00e9", True)
    with pytest.raises(ValueError):
        gio.parse_ntriples("not a triple\n")
