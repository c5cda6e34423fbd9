"""Co-occurrence edge-table builder — the flagship transform.

Re-derives the semantics of the reference's ``CooccurrenceGenerator``
(/root/reference/bluegraph/preprocess/generators.py:155-431) as a streaming
Ray Data pipeline instead of an O(n^2) all-pairs scan:

reference semantics (generators.py:197-244): nodes s, t co-occur when their
factor sets intersect; ``frequency`` = |common factors|; PPMI / NPMI per
``mutual_information`` (generators.py:27-73) with positive clamp.

Ray-Data-first derivation (identical results because frequency counts DISTINCT
shared factors):

1. dedup ``(entity, factor)`` to distinct pairs       — groupby shuffle #1
2. per-entity factor counts + global distinct-factor
   count (the PMI denominator, ``total_factor_instances``
   = generators.py:362-376)                            — small aggregates
3. bucket by hash(factor); per-bucket vectorized
   upper-triangle pair emission with map-side combine  — shuffle #2 (by bucket)
4. ``groupby(src, dst).sum(partial)`` -> frequency     — shuffle #3
5. stateless ``map_batches`` computing PPMI/NPMI with
   the per-entity counts broadcast via ``ray.put``     — no shuffle

Skew: a hub factor shared by f entities inherently implies f(f-1)/2 edges —
no partitioning trick changes the output size. The scalable mitigations (all
mirroring the reference pipeline's own knobs) are ``max_factor_entities``
(drop oversized factor groups — the analog of the reference's
``n_most_frequent`` top-k pre-filter, /root/reference/cord19kg/utils.py:648-651)
and pre-filtering entities by frequency. Pair emission itself is vectorized
numpy per factor-run, so a hub factor is bounded by memory, not Python speed.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
# Ray native aggregates only for low-cardinality groupbys (see util.hash_aggregate)

from bluegraph_ray.functions.pmi import mutual_information

DEFAULT_STATS = ("frequency", "ppmi", "npmi")


# ---------------------------------------------------------------------------
# Occurrence extraction from the source-code table
# ---------------------------------------------------------------------------

def occurrences_from_source(
    ds: "ray.data.Dataset",
    *,
    entity: str = "stem",
    factor: str = "repo",
) -> "ray.data.Dataset":
    """Source-code table -> (entity, factor) occurrence rows.

    ``entity``: "stem" (path basename without extension — shared across repos),
    "path", or any existing column. ``factor``: "repo", "lang", "dir"
    (repo-qualified directory — the paper/section/paragraph analog of
    /root/reference/cord19kg/utils.py:323-330), or any existing column.

    Only the needed columns are touched; ``content`` never enters this path.
    """

    def extract(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if entity == "stem":
            # basename without extension
            base = pc.replace_substring_regex(batch["path"], r"^.*/", "")
            ent = pc.replace_substring_regex(base, r"\.[^.]*$", "")
        elif entity == "path":
            ent = batch["path"]
        else:
            ent = batch[entity]
        if factor == "dir":
            dirn = pc.replace_substring_regex(batch["path"], r"/[^/]*$", "")
            fac = pc.binary_join_element_wise(batch["repo"], dirn, "::")
        else:
            fac = batch[factor]
        return pa.table({"entity": ent, "factor": fac})

    cols = {"path", "repo"}
    if entity not in ("stem", "path"):
        cols.add(entity)
    if factor != "dir":
        cols.add(factor)
    return ds.select_columns(sorted(cols)).map_batches(extract, batch_format="pyarrow")


def occurrences_from_imports(ds: "ray.data.Dataset", *, factor: str = "repo") -> "ray.data.Dataset":
    """Entities = identifiers imported in ``content`` (``import X`` lines).

    The regex is compiled once per actor (callable class), not per batch.
    """

    class ImportExtractor:
        def __init__(self):
            import re

            self.pat = re.compile(r"^import\s+(\w+)", re.M)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ents = batch["content"].map(self.pat.findall)
            n = ents.map(len)
            return pd.DataFrame(
                {
                    "entity": np.concatenate(ents.to_numpy()) if len(batch) else [],
                    "factor": np.repeat(batch[factor].to_numpy(), n.to_numpy()),
                }
            )

    return ds.select_columns(["content", factor]).map_batches(
        ImportExtractor, batch_format="pandas", concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# Edge-table builder
# ---------------------------------------------------------------------------

def _pairs_in_bucket(max_factor_entities):
    """Vectorized multi-factor pair emission over one hash bucket of factors.

    Input: pandas group with columns (entity, factor) — all distinct rows of
    all factors in the bucket. Output: (src, dst, partial) with src < dst and
    map-side combined counts (a pair sharing k same-bucket factors emits one
    row with partial=k).
    """

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["factor", "entity"], kind="mergesort")
        ents = group["entity"].to_numpy()
        codes = pd.factorize(group["factor"].to_numpy(), use_na_sentinel=False)[0]
        # run boundaries per factor
        boundaries = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [len(codes)]))
        src_parts, dst_parts = [], []
        for s, e in zip(starts, ends):
            f = e - s
            if f < 2:
                continue
            if max_factor_entities is not None and f > max_factor_entities:
                continue  # hub-factor cap (documented approximation)
            iu, ju = np.triu_indices(f, k=1)
            src_parts.append(ents[s + iu])
            dst_parts.append(ents[s + ju])
        if not src_parts:
            return pd.DataFrame({"src": ents[:0], "dst": ents[:0], "partial": np.array([], dtype=np.int64)})
        src = np.concatenate(src_parts)
        dst = np.concatenate(dst_parts)
        # map-side combine: collapse duplicate pairs within the bucket
        pairs = pd.DataFrame({"src": src, "dst": dst})
        out = pairs.groupby(["src", "dst"], sort=False).size().reset_index(name="partial")
        return out

    return emit


def cooccurrence_edges(
    occurrences: "ray.data.Dataset",
    *,
    entity_col: str = "entity",
    factor_col: str = "factor",
    statistics: Sequence[str] = DEFAULT_STATS,
    total_factor_instances: int | None = None,
    max_factor_entities: int | None = None,
    min_frequency: int = 1,
    num_buckets: int = 64,
    round_to: int | None = None,
) -> "ray.data.Dataset":
    """(entity, factor) occurrence rows -> weighted co-occurrence edge table.

    Output columns: ``src, dst, frequency[, ppmi][, npmi]`` with ``src < dst``
    (string/numeric order — matches the reference's upper-triangle emission,
    generators.py:204). Exact w.r.t. the reference for any input when
    ``max_factor_entities`` is None.
    """
    statistics = list(statistics)
    occ = occurrences
    if entity_col != "entity" or factor_col != "factor":
        from bluegraph_ray.util import rename_columns as _rn

        occ = _rn(
            occ.select_columns([entity_col, factor_col]),
            {entity_col: "entity", factor_col: "factor"},
        )

    from bluegraph_ray.util import hash_aggregate, hash_distinct

    # 1. distinct (entity, factor) — map-side drop_duplicates + bucketed combine
    # (Ray's native groupby.aggregate is per-group Python; see util.py).
    distinct = hash_distinct(occ, ["entity", "factor"], num_buckets=num_buckets)
    distinct = distinct.materialize()

    need_stats = any(s in ("ppmi", "npmi", "expected", "pmi2", "pmi3") for s in statistics)
    ent_freq_ref = None
    if need_stats:
        # 2. per-entity distinct-factor counts — small result, broadcast once.
        # At 10^12-file scale this becomes a hash join on src/dst instead of a
        # broadcast; the broadcast is correct while |entities| * 16B fits a node.
        ef = hash_aggregate(
            distinct, "entity", {"s_freq": (None, "count")}, num_buckets=num_buckets
        ).to_pandas()
        ent_freq_ref = ray.put(ef.set_index("entity")["s_freq"])
        if total_factor_instances is None:
            from bluegraph_ray.util import distinct_values

            total_factor_instances = len(distinct_values(distinct, "factor"))

    # 3. bucket by hash(factor) and emit pairs per bucket, vectorized.
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch["factor"].to_numpy())
        batch["_bucket"] = (h % num_buckets).astype(np.int64)
        return batch

    bucketed = distinct.map_batches(add_bucket, batch_format="pandas")
    pairs = bucketed.groupby("_bucket").map_groups(
        lambda g: _pairs_in_bucket(max_factor_entities)(g.drop(columns=["_bucket"])),
        batch_format="pandas",
    )

    # 4. global combine -> frequency = |distinct common factors|.
    edges = hash_aggregate(
        pairs, ["src", "dst"], {"frequency": ("partial", "sum")}, num_buckets=num_buckets
    )

    if min_frequency > 1:
        edges = edges.filter(expr=f"frequency >= {min_frequency}")

    # 5. stateless PMI stage with broadcast per-entity counts. A plain task
    # function, not an actor pool: ray.get of the broadcast ref inside the
    # task is zero-copy plasma and needs no per-actor warm-up.
    if need_stats:
        total = float(total_factor_instances)
        stats = [s for s in statistics if s != "frequency"]
        rnd = round_to

        def pmi_stage(batch: pd.DataFrame) -> pd.DataFrame:
            ent_freq = ray.get(ent_freq_ref)
            co = batch["frequency"].to_numpy(dtype=np.float64)
            s = ent_freq.reindex(batch["src"]).to_numpy(dtype=np.float64)
            t = ent_freq.reindex(batch["dst"]).to_numpy(dtype=np.float64)
            for stat in stats:
                mitype = {"ppmi": None, "npmi": "normalized"}.get(stat, stat)
                vals = mutual_information(co, s, t, total, mitype=mitype)
                if rnd is not None:
                    vals = np.round(vals, rnd)
                batch[stat] = vals
            return batch

        edges = edges.map_batches(pmi_stage, batch_format="pandas")

    keep = ["src", "dst"] + [s for s in DEFAULT_STATS if s in statistics] + [
        s for s in statistics if s not in DEFAULT_STATS
    ]
    return edges.select_columns(keep)
