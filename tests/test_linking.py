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
