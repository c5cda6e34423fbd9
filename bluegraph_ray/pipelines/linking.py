"""Ontology linking operators (cord19 prepare path, SURVEY.md §2.3).

Reference semantics:

- ``resolve_taxonomy_to_types`` — /root/reference/cord19kg/utils.py:748-819:
  per-entity rule cascade over the taxonomy class list (first mapping target
  whose ``include`` classes intersect the taxonomy and whose ``exclude``
  classes don't wins), falling back to a majority vote over the raw NER
  types (``assign_raw_type``, utils.py:737-745) when no taxonomy is attached
  or no rule matches. One deliberate divergence, documented here: the
  reference breaks vote ties by dict insertion order (the first raw type to
  reach the max count), which is nondeterministic under distribution; this
  engine breaks ties by the smallest type value, so results are stable
  across block layouts and cluster sizes.

- ``merge_with_ontology_linking`` — /root/reference/cord19kg/utils.py:415-490:
  lower-case the linking table, LEFT-join mentions/occurrences on entity,
  fill unlinked rows' concept with the entity itself, then group by concept
  with per-column resolvers (entities -> list, factor columns -> set union,
  id-like columns -> one representative, numeric columns -> sum). List
  outputs are emitted SORTED (the reference keeps pandas group order, which
  is nondeterministic under distribution); the representative for
  ``first_columns`` is the value carried by the group's smallest entity.

Both are hash-bucketed shuffles over Datasets: the rule cascade is a pure
``map_batches`` kernel (vectorized explode + per-target membership masks, no
per-row Python), the linking merge is one ``hash_join`` plus one bucketed
group combine — the same two-shuffle shape as the co-occurrence builder.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.util import hash_join


def _majority_vote(types_col: pd.Series) -> pd.Series:
    """Per-row mode of a list column; ties -> smallest value. Vectorized:
    explode -> (row, type) counts -> sort (count desc, type asc) -> first."""
    n = len(types_col)
    ex = types_col.reset_index(drop=True).explode()
    ex = ex[ex.notna()]
    if not len(ex):
        return pd.Series([None] * n)
    df = pd.DataFrame({"i": ex.index.to_numpy(), "t": ex.to_numpy()})
    c = df.groupby(["i", "t"], sort=False).size().reset_index(name="c")
    c = c.sort_values(["i", "c", "t"], ascending=[True, False, True],
                      kind="mergesort").drop_duplicates("i")
    return pd.Series(c["t"].to_numpy(), index=c["i"].to_numpy()).reindex(range(n))


def _taxonomy_classes(cell) -> list:
    """Accept both class-name lists and the reference's (uid, class) pairs."""
    if cell is None or (isinstance(cell, float) and np.isnan(cell)):
        return []
    out = []
    for el in cell:
        if isinstance(el, (tuple, list)) and len(el) == 2:
            out.append(el[1])
        else:
            out.append(el)
    return out


def resolve_taxonomy_to_types(
    ds: "ray.data.Dataset",
    mapping: dict,
    *,
    entity_col: str = "entity",
    taxonomy_col: str = "taxonomy",
    raw_types_col: str = "raw_entity_types",
) -> "ray.data.Dataset":
    """-> Dataset(entity, type). ``mapping``: {type: {"include": [...],
    "exclude": [...]}} evaluated in dict order; see module docstring."""
    targets = [
        (t, frozenset(spec.get("include", ())), frozenset(spec.get("exclude", ())))
        for t, spec in mapping.items()
    ]

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        fallback = _majority_vote(batch[raw_types_col])
        classes = batch[taxonomy_col].map(_taxonomy_classes)
        has_tax = classes.map(len).to_numpy() > 0
        ex = classes.reset_index(drop=True).explode()
        ex = ex[ex.notna()]
        rows = ex.index.to_numpy()
        vals = ex.to_numpy()
        assigned = np.full(n, None, dtype=object)
        open_rows = has_tax.copy()
        for t, include, exclude in targets:
            inc = np.zeros(n, dtype=bool)
            if len(rows):
                hit = pd.Series(vals).isin(include).to_numpy()
                inc[np.unique(rows[hit])] = True
            exc = np.zeros(n, dtype=bool)
            if len(rows) and exclude:
                hit = pd.Series(vals).isin(exclude).to_numpy()
                exc[np.unique(rows[hit])] = True
            sel = open_rows & inc & ~exc
            assigned[sel] = t
            open_rows &= ~sel
        out_type = np.where(assigned == None, fallback.to_numpy(), assigned)  # noqa: E711
        return pd.DataFrame({entity_col: batch[entity_col].to_numpy(),
                             "type": out_type})

    return ds.map_batches(kernel, batch_format="pandas", batch_size=None)


def merge_with_ontology_linking(
    occurrences: "ray.data.Dataset",
    linking: "ray.data.Dataset",
    *,
    entity_col: str = "entity",
    concept_col: str = "concept",
    factor_columns: Sequence[str] = ("paper",),
    first_columns: Sequence[str] = (),
    sum_columns: Sequence[str] = (),
    concat_columns: Sequence[str] = (),
    lowercase: bool = True,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Left-join per-entity occurrence rows with (entity -> concept) linking,
    then aggregate per concept. Output columns: ``entity`` (the concept),
    ``aggregated_entities`` (sorted list), each factor column as a sorted
    union list, ``first_columns`` from the smallest entity, ``sum_columns``
    summed, ``concat_columns`` as sorted multiplicity-preserving list
    concatenation (the reference's ``sum(x, [])`` fallback for untyped list
    columns, utils.py:463). See module docstring for the reference mapping."""
    factor_columns = list(factor_columns)
    first_columns = list(first_columns)
    sum_columns = list(sum_columns)
    concat_columns = list(concat_columns)

    def norm_linking(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        if lowercase:
            if batch[concept_col].dtype == object:
                batch[concept_col] = batch[concept_col].str.lower()
            if batch[entity_col].dtype == object:
                batch[entity_col] = batch[entity_col].str.lower()
        return batch

    link = linking.map_batches(norm_linking, batch_format="pandas",
                               batch_size=None)
    merged = hash_join(occurrences, link, on=entity_col, how="left",
                       num_buckets=num_buckets)

    def fill_and_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        miss = batch[concept_col].isna()
        if miss.any():
            fill = batch.loc[miss, entity_col]
            if batch[concept_col].dtype == object and fill.dtype != object:
                fill = fill.astype(str)
                if lowercase:
                    fill = fill.str.lower()
            batch.loc[miss, concept_col] = fill
        h = pd.util.hash_pandas_object(batch[concept_col], index=False).to_numpy()
        batch["_bucket"] = (h % num_buckets).astype(np.int64)
        return batch

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(entity_col, kind="mergesort")
        g = group.groupby(concept_col, sort=False)
        out = pd.DataFrame({"entity": list(g.groups)})
        out["aggregated_entities"] = g[entity_col].agg(
            lambda s: sorted(s)).to_numpy()
        for f in factor_columns:
            out[f] = g[f].agg(
                lambda s: sorted(set().union(*s)) if len(s) else []).to_numpy()
        for f in first_columns:
            out[f] = g[f].agg("first").to_numpy()  # smallest entity's value
        for f in sum_columns:
            out[f] = g[f].agg("sum").to_numpy()
        for f in concat_columns:
            out[f] = g[f].agg(
                lambda s: sorted(x for cell in s for x in cell)).to_numpy()
        return out

    return (
        merged.map_batches(fill_and_bucket, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(lambda g: combine(g.drop(columns=["_bucket"])),
                    batch_format="pandas")
    )
