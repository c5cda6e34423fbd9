"""Curation-path operators — the cord19kg prepare pipeline re-expressed on
Ray Data (reference /root/reference/cord19kg/utils.py:93-160, 270-414,
822-957; SURVEY.md §2.2/§2.3/§3.1).

- ``clean_up_entity`` / ``has_min_length`` / ``is_experiment_related``: the
  reference's NER-cleanup UDF trio, same observable behavior, exposed as
  plain functions so they plug into ``mentions_to_occurrence``'s hook
  surface (term_cleanup / term_filter / mention_filter).
- ``prepare_occurrence_data``: mentions (entity, entity_type, occurrence
  "<paper>:<section>:<paragraph>") -> per-entity occurrence table with
  paper/section/paragraph factor sets + entity_type list, entities occurring
  in >1 paragraph kept (utils.py:270-366). Factor derivation is one
  vectorized ``map_batches`` (``str.partition``-style splits); aggregation
  is the existing hash-bucketed ``mentions_to_occurrence`` shuffle.
- ``generate_curation_table``: prepare + the derived curation columns
  (paper_frequency, raw_entity_types, raw_frequency, comma-joined distinct
  entity_type — utils.py:367-413). Distinct-type join is SORTED (the
  reference iterates a Python set, nondeterministic under distribution).
- ``link_ontology``: linking merge + taxonomy type resolution composed
  exactly as utils.py:822-881 from the two named operators in
  ``pipelines/linking``.
- ``generate_paper_lookup`` / ``build_cytoscape_data``: small export
  helpers over RayPGFrame (utils.py:884-957) — point queries by nature
  (UI payloads), like the Gephi exporter in sources/io.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.pipelines.cooccurrence import mentions_to_occurrence
from bluegraph_ray.pipelines.linking import (
    merge_with_ontology_linking,
    resolve_taxonomy_to_types,
)

_GREEK_ASCII = {"α": "alpha", "β": "beta", "γ": "gamma", "κ": "kappa",
                "’": "'", "–": "-", "‐": "-", "é": "e", "ó": "o"}


def clean_up_entity(s) -> str:
    """NER cleanup (reference utils.py:106-123): lowercase, strip wrapping
    quotes/&/#, drop periods, join hyphen splits, transliterate the known
    non-ascii symbols and drop the rest."""
    out = str(s).lower().strip().strip('"').strip("'").strip("&").strip("#")
    out = out.replace(".", "").replace("- ", "-")
    cleaned = []
    for ch in out:
        if ord(ch) < 128:
            cleaned.append(ch)
        else:
            cleaned.append(_GREEK_ASCII.get(ch, ""))
    return "".join(cleaned)


def has_min_length(entities: pd.Series, length: int) -> pd.Series:
    """Vectorized term filter: keep terms with >= ``length`` characters."""
    return entities.str.len() >= length


def is_experiment_related(section_title: str) -> bool:
    """True when the section name (after the paper id prefix) is a
    methods/materials/experimental section (reference utils.py:131-160)."""
    name = section_title.split(":")[1].lower()
    return any(k in name for k in ("method", "material", "experimental"))


FACTORS = ("paper", "section", "paragraph")


def prepare_occurrence_data(mentions: "ray.data.Dataset", *,
                            num_buckets: int = 64):
    """-> (occurrence Dataset indexed by entity, factor-count dict).

    Derives paper (= first ':'-field) and section (= first two fields) from
    the paragraph-level ``occurrence`` id, then aggregates per cleaned
    entity: factor columns as sets, raw entity types as a list; entities
    seen in only one paragraph are dropped (noise, utils.py:344-346)."""

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        occ = batch["occurrence"].astype(str)
        parts = occ.str.split(":")
        return pd.DataFrame({
            "entity": batch["entity"],
            "entity_type": batch["entity_type"],
            "paper": parts.str[0],
            "section": parts.str[0] + ":" + parts.str[1],
            "paragraph": occ,
        })

    mentions = mentions.map_batches(derive, batch_format="pandas",
                                    batch_size=None)
    occurrence, counts = mentions_to_occurrence(
        mentions,
        term_column="entity",
        factor_columns=[*FACTORS, "entity_type"],
        term_cleanup=clean_up_entity,
        term_filter=lambda s: has_min_length(s, 3),
        mention_filter=lambda df: ~df["section"].map(is_experiment_related),
        aggregation={"paper": "set", "section": "set", "paragraph": "set",
                     "entity_type": "list"},
        num_buckets=num_buckets,
    )
    counts.pop("entity_type", None)

    def keep_multi_paragraph(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["paragraph"].map(len) > 1]

    occurrence = occurrence.map_batches(keep_multi_paragraph,
                                        batch_format="pandas",
                                        batch_size=None)
    return occurrence, counts


def generate_curation_table(mentions: "ray.data.Dataset", *,
                            num_buckets: int = 64):
    """-> (curation Dataset, factor-count dict) — utils.py:367-413."""
    occurrence, counts = prepare_occurrence_data(mentions,
                                                 num_buckets=num_buckets)

    def enrich(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["paper_frequency"] = out["paper"].map(len).astype(np.int64)
        out["raw_entity_types"] = out["entity_type"]
        out["raw_frequency"] = out["entity_type"].map(len).astype(np.int64)
        out["entity_type"] = out["entity_type"].map(
            lambda x: ", ".join(sorted(set(x))))
        return out

    return occurrence.map_batches(enrich, batch_format="pandas",
                                  batch_size=None), counts


def link_ontology(linking: "ray.data.Dataset", type_mapping: dict,
                  curated_table: "ray.data.Dataset", *,
                  num_buckets: int = 64) -> "ray.data.Dataset":
    """Linking merge + taxonomy-driven type resolution (utils.py:822-881):
    group synonym entities under their linked concept, recompute
    paper_frequency, then assign one entity_type per concept via the
    include/exclude rule cascade with the raw-type majority fallback.
    ``linking`` columns: mention, concept, and optionally uid / definition /
    taxonomy."""
    link_cols = set(linking.schema().names)
    first_cols = [c for c in ("uid", "definition", "taxonomy")
                  if c in link_cols]

    def as_entity(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"mention": "entity"})

    linking_norm = linking.map_batches(as_entity, batch_format="pandas",
                                       batch_size=None)
    linked = merge_with_ontology_linking(
        curated_table, linking_norm,
        factor_columns=["paper", "section", "paragraph"],
        first_columns=first_cols,
        concat_columns=["raw_entity_types"],
        num_buckets=num_buckets,
    ).materialize()

    def add_freq(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["paper_frequency"] = out["paper"].map(len).astype(np.int64)
        if "taxonomy" not in out.columns:
            out["taxonomy"] = None
        return out

    linked = linked.map_batches(add_freq, batch_format="pandas",
                                batch_size=None)
    types = resolve_taxonomy_to_types(linked, type_mapping)
    from bluegraph_ray.util import hash_join

    out = hash_join(linked, types, on="entity", how="left",
                    num_buckets=num_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.rename(columns={"type": "entity_type"})
        out["entity_type_label"] = out["entity_type"]
        return out

    return out.map_batches(finish, batch_format="pandas", batch_size=None)


def generate_paper_lookup(pgframe) -> dict:
    """{node: paper list} from the PGFrame's ``paper`` node property
    (utils.py:884-887)."""
    pdf = pgframe._nodes.to_pandas()
    from bluegraph_ray.pgframe import ID

    return dict(zip(pdf[ID], pdf["paper"]))


def build_cytoscape_data(pgframe, positions: dict | None = None) -> list:
    """Cytoscape element list (utils.py:890-957): one node element per node
    (paper set folded into paper_frequency), one edge element per edge.
    A UI-payload point query — materializes, like the Gephi exporter."""
    from bluegraph_ray.pgframe import DST, ID, SRC

    elements = []
    nodes = pgframe._nodes.to_pandas()
    for _, row in nodes.iterrows():
        props = {k: v for k, v in row.items() if k != ID}
        data = {"id": row[ID], "value": row[ID], "name": row[ID],
                "type": "node"}
        if "paper" in props:
            data["paper_frequency"] = len(props.pop("paper"))
        data.update(props)
        el = {"data": data}
        if positions is not None and row[ID] in positions:
            el["position"] = positions[row[ID]]
        elements.append(el)
    edges = pgframe._edges.to_pandas()
    for _, row in edges.iterrows():
        s, t = row[SRC], row[DST]
        data = {"id": f"{str(s).replace(' ', '_')}_{str(t).replace(' ', '_')}",
                "source": s, "target": t, "type": "edge"}
        data.update({k: v for k, v in row.items() if k not in (SRC, DST)})
        elements.append({"data": data})
    return elements
