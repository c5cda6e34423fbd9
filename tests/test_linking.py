"""Ontology linking operators (pipelines/linking.py) vs reference semantics
(cord19kg/utils.py:415-490, 737-819)."""

from __future__ import annotations

import pandas as pd

import ray
import ray.data

from bluegraph_ray.pipelines.linking import (
    merge_with_ontology_linking,
    resolve_taxonomy_to_types,
)


def test_resolve_taxonomy_rule_cascade_and_vote():
    df = pd.DataFrame({
        "entity": ["a", "b", "c", "d", "e"],
        # (uid, class) pairs like the reference's NCIT hierarchies
        "taxonomy": [
            [("u1", "Chemical"), ("u2", "Drug")],        # include drug
            [("u3", "Drug"), ("u4", "Banned")],          # excluded -> fallback
            [("u5", "Organism")],                        # second rule
            None,                                        # no taxonomy -> vote
            [("u6", "Unmapped")],                        # no rule -> vote
        ],
        "raw_entity_types": [
            ["X"], ["Y", "Z", "Y"], ["X"], ["P", "Q", "Q", "P"], ["W", "V", "W"],
        ],
    })
    mapping = {
        "drug": {"include": ["Drug"], "exclude": ["Banned"]},
        "organism": {"include": ["Organism"]},
    }
    out = resolve_taxonomy_to_types(
        ray.data.from_pandas(df), mapping).to_pandas()
    got = dict(zip(out["entity"], out["type"]))
    assert got == {
        "a": "drug",
        "b": "Y",          # majority vote (Y twice)
        "c": "organism",
        "d": "P",          # tie P/Q -> smallest value (documented tie-break)
        "e": "W",
    }


def test_merge_with_ontology_linking_resolvers():
    occ = pd.DataFrame({
        "entity": ["aspirin", "acetylsalicylic acid", "ibuprofen", "zinc"],
        "paper": [["p1", "p2"], ["p2", "p3"], ["p4"], ["p5"]],
        "frequency": [2, 2, 1, 1],
        "definition": ["d-asp", "d-asa", "d-ibu", "d-zn"],
    })
    linking = pd.DataFrame({
        # upper-case on purpose: the operator lower-cases the linking side
        "entity": ["ASPIRIN", "ACETYLSALICYLIC ACID", "IBUPROFEN"],
        "concept": ["ASA", "ASA", "IBU"],
    })
    out = merge_with_ontology_linking(
        ray.data.from_pandas(occ), ray.data.from_pandas(linking),
        factor_columns=["paper"], first_columns=["definition"],
        sum_columns=["frequency"], num_buckets=4,
    ).to_pandas().set_index("entity")
    assert set(out.index) == {"asa", "ibu", "zinc"}
    asa = out.loc["asa"]
    # entity list sorted; factor sets unioned; first = smallest entity's value
    assert asa["aggregated_entities"] == ["acetylsalicylic acid", "aspirin"]
    assert asa["paper"] == ["p1", "p2", "p3"]
    assert asa["frequency"] == 4
    assert asa["definition"] == "d-asa"
    # unlinked entity keeps itself as concept
    assert out.loc["zinc"]["aggregated_entities"] == ["zinc"]
    assert out.loc["zinc"]["frequency"] == 1


def test_prepare_occurrence_and_curation_table():
    """Curation prepare path (reference cord19kg/utils.py:270-413): factor
    derivation from '<paper>:<section>:<paragraph>' ids, cleanup + filters,
    per-entity sets (+ entity_type list), single-paragraph entities dropped,
    curation columns derived."""
    from bluegraph_ray.pipelines import curation

    rows = [
        # GLUCOSE. cleans to 'glucose'; appears in 2 paragraphs of 2 papers
        ("GLUCOSE.", "CHEMICAL", "p1:intro:0"),
        ("glucose", "CHEMICAL", "p2:results:3"),
        ("glucose", "DRUG", "p2:results:4"),
        # covid appears in 2 paragraphs but one mention is in a methods
        # section (filtered) - still 2 paragraphs via others
        ("covid", "DISEASE", "p1:intro:1"),
        ("covid", "DISEASE", "p1:methods:2"),
        ("covid", "DISEASE", "p2:discussion:9"),
        # 'na' is too short (min length 3 chars keeps >=3)
        ("na", "CHEMICAL", "p1:intro:0"),
        # 'ace2' occurs in only ONE paragraph -> dropped as noise
        ("ace2", "PROTEIN", "p1:intro:5"),
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        rows, columns=["entity", "entity_type", "occurrence"]))
    occ, counts = curation.prepare_occurrence_data(ds, num_buckets=4)
    pdf = occ.to_pandas().set_index("entity")
    assert set(pdf.index) == {"glucose", "covid"}
    assert sorted(pdf.loc["glucose", "paper"]) == ["p1", "p2"]
    assert sorted(pdf.loc["glucose", "paragraph"]) == [
        "p1:intro:0", "p2:results:3", "p2:results:4"]
    assert sorted(pdf.loc["glucose", "entity_type"]) == [
        "CHEMICAL", "CHEMICAL", "DRUG"]  # list mode keeps multiplicity
    # methods-section mention filtered: covid has 2 paragraphs, both papers
    assert sorted(pdf.loc["covid", "paragraph"]) == [
        "p1:intro:1", "p2:discussion:9"]
    assert counts["paper"] == 2
    assert counts["paragraph"] >= 4

    cur, _ = curation.generate_curation_table(ds, num_buckets=4)
    cpdf = cur.to_pandas().set_index("entity")
    assert cpdf.loc["glucose", "paper_frequency"] == 2
    assert cpdf.loc["glucose", "raw_frequency"] == 3
    assert cpdf.loc["glucose", "entity_type"] == "CHEMICAL, DRUG"


def test_link_ontology_and_cytoscape():
    """link_ontology (utils.py:822-881): synonyms group under the linked
    concept, paper_frequency recomputed, entity_type resolved from the
    taxonomy rule cascade with raw-type majority fallback."""
    from bluegraph_ray.pipelines import curation
    from bluegraph_ray.pgframe import RayPGFrame

    mentions = [
        ("glucose", "CHEMICAL", "p1:intro:0"),
        ("glucose", "CHEMICAL", "p2:results:1"),
        ("d-glucose", "CHEMICAL", "p3:intro:0"),
        ("d-glucose", "SUGAR", "p3:intro:1"),
        ("covid", "DISEASE", "p1:intro:2"),
        ("covid", "DISEASE", "p2:results:5"),
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        mentions, columns=["entity", "entity_type", "occurrence"]))
    cur, _ = curation.generate_curation_table(ds, num_buckets=4)
    linking = ray.data.from_pandas(pd.DataFrame({
        "mention": ["glucose", "d-glucose"],
        "concept": ["Glucose", "Glucose"],
        "uid": ["C1", "C1"],
        "taxonomy": [["carbohydrate", "chemical"], ["carbohydrate"]],
    }))
    mapping = {"sugarlike": {"include": ["carbohydrate"]},
               "other_chem": {"include": ["chemical"]}}
    out = curation.link_ontology(linking, mapping, cur, num_buckets=4).to_pandas()
    out = out.set_index("entity")
    assert set(out.index) == {"glucose", "covid"}
    g = out.loc["glucose"]
    assert sorted(g["aggregated_entities"]) == ["d-glucose", "glucose"]
    assert g["paper_frequency"] == 3
    assert g["entity_type"] == "sugarlike"       # taxonomy rule cascade
    assert g["entity_type_label"] == "sugarlike"
    assert sorted(g["raw_entity_types"]) == ["CHEMICAL", "CHEMICAL", "CHEMICAL", "SUGAR"]
    c = out.loc["covid"]
    assert c["entity_type"] == "DISEASE"         # majority fallback
    assert c["paper_frequency"] == 2

    # cytoscape export over a tiny PGFrame with a paper property
    nodes = pd.DataFrame({"@id": ["glucose", "covid"],
                          "paper": [["p1", "p2", "p3"], ["p1", "p2"]],
                          "w": [1.0, 2.0]})
    edges = pd.DataFrame({"@source_id": ["glucose"], "@target_id": ["covid"],
                          "frequency": [2]})
    pg = RayPGFrame(nodes=nodes, edges=edges)
    els = curation.build_cytoscape_data(pg, positions={"covid": {"x": 1, "y": 2}})
    by_id = {e["data"]["id"]: e for e in els}
    assert by_id["glucose"]["data"]["paper_frequency"] == 3
    assert "paper" not in by_id["glucose"]["data"]
    assert by_id["covid"]["position"] == {"x": 1, "y": 2}
    assert by_id["glucose_covid"]["data"]["frequency"] == 2
    assert by_id["glucose_covid"]["data"]["type"] == "edge"
    lookup = curation.generate_paper_lookup(pg)
    assert sorted(lookup["covid"]) == ["p1", "p2"]
