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


def _ranges_concat(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenated [s, e) aranges — vectorized (no per-range allocation)."""
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    seg = np.cumsum(lens) - lens
    out[0] = starts[0]
    out[seg[1:]] = starts[1:] - (ends[:-1] - 1)
    return np.cumsum(out)


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
    return ds.select_columns(sorted(cols)).map_batches(extract, batch_format="pyarrow", batch_size=None)


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
        ImportExtractor, batch_format="pandas", concurrency=(1, 4), batch_size=None)


def mentions_to_occurrence(
    ds: "ray.data.Dataset",
    *,
    term_column: str = "entity",
    factor_columns: Sequence[str] = ("factor",),
    term_cleanup=None,
    term_filter=None,
    mention_filter=None,
    aggregation: str = "set",
    num_buckets: int = 64,
):
    """Raw mentions -> per-term aggregated occurrence table + factor counts.

    The reference's UDF-hook surface (cord19kg/utils.py:163-248): per-term
    ``term_cleanup`` (value -> value), vectorized ``term_filter`` (Series ->
    bool mask) and ``mention_filter`` (DataFrame -> bool mask), then a
    per-term aggregation of each factor column. All three hooks run inside
    one stateless ``map_batches`` stage; the aggregation is a hash-bucket
    shuffle (high-cardinality-safe, like ``util.hash_distinct``).

    ``aggregation``: "set" -> canonical sorted-unique list per term (the
    reference's ``set`` default, canonicalized so output is deterministic
    under distribution); "list" -> sorted list keeping multiplicity (the
    reference's ``entity_type`` convention, order canonicalized). A dict
    {column: mode} sets the mode per factor column (the
    ``aggregate_cord_entities`` shape, utils.py:252-267: factors as sets,
    entity_type as a list); unlisted columns default to "set".

    Returns ``(occurrences, factor_counts)``: a Dataset with one row per
    distinct term (columns: term + one list column per factor) and a dict
    of exact distinct-instance counts per factor column (the PMI
    denominators, reference utils.py:230-232).
    """
    if isinstance(aggregation, dict):
        modes = {f: aggregation.get(f, "set") for f in factor_columns}
    else:
        modes = {f: aggregation for f in factor_columns}
    for f, m in modes.items():
        if m not in ("set", "list"):
            raise ValueError(f"aggregation must be 'set' or 'list', got {m!r} for {f!r}")
    factor_columns = list(factor_columns)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[term_column, *factor_columns]]
        if term_cleanup is not None:
            batch = batch.copy()
            batch[term_column] = batch[term_column].map(term_cleanup)
        if term_filter is not None:
            batch = batch[np.asarray(term_filter(batch[term_column]), dtype=bool)]
        if mention_filter is not None:
            batch = batch[np.asarray(mention_filter(batch), dtype=bool)]
        return batch

    cleaned = ds.map_batches(prep, batch_format="pandas", batch_size=None)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = pd.util.hash_pandas_object(batch[term_column], index=False).to_numpy()
        batch["_bucket"] = (h % num_buckets).astype(np.int64)
        return batch

    def agg_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(term_column, sort=False)
        out = pd.DataFrame({term_column: list(g.groups)})
        for f in factor_columns:
            uniq = modes[f] == "set"
            col = g[f].agg(
                (lambda s: sorted(set(s))) if uniq else (lambda s: sorted(s)))
            out[f] = col.to_numpy()
        return out

    occurrences = (
        cleaned.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )
    from bluegraph_ray.util import hash_distinct

    factor_counts = {
        f: hash_distinct(cleaned.select_columns([f]), f,
                         num_buckets=num_buckets).count()
        for f in factor_columns
    }
    return occurrences, factor_counts


# ---------------------------------------------------------------------------
# Edge-table builder
# ---------------------------------------------------------------------------

def _emit_pair_codes(max_factor_entities, names_ref, num_buckets,
                     dense_max_entities: int = 4096, subs_ref=None):
    """Vectorized multi-factor pair emission over one hash bucket of factors.

    Entities are encoded as dense int ids (rank in the sorted global name
    array) BEFORE emission, so a pair is a single int64 code
    ``src_id * n + dst_id`` with ``src_id < dst_id`` — int sorting/uniquing is
    5-10x faster than string pairs at 10^8-pair scale. Map-side combine =
    ``np.unique(codes, return_counts)`` within the bucket.
    Output: (code:int64, partial:int64, _b2:int64) — _b2 is the bucket key of
    the SECOND shuffle (global pair combine).

    Two kernels, chosen per bucket:

    - **dense (Gram) path** — when the bucket's local entity set is small
      (≤ ``dense_max_entities``): the partial frequency matrix is the Gram
      product ``AᵀA`` of the factor×entity 0/1 incidence matrix, one BLAS
      matmul instead of materializing Σ_f f(f-1)/2 raw pair codes. A hub
      bucket (few factors × thousands of shared entities) collapses from
      O(Σ f²) memory traffic to O(F·nb) build + O(nb²) extract; distinct
      output pairs are identical by construction (C[i,j] = |{factors
      containing both}|).
    - **sparse path** — otherwise: O(total_pairs) upper-triangle emission via
      repeat/arange (no f×f masks), in-place sort, run-length count.

    Hub-bucket skew splitting: when the group carries ``_sub`` (and
    ``subs_ref`` maps bucket -> sub count S), this task emits ONLY the pairs
    whose src entity id ≡ _sub (mod S) — the caller replicated the bucket's
    rows S ways, so the union over sub-tasks is exactly the unsplit output
    and each pair (with all its factor contributions) appears in exactly one
    sub-task. This bounds the largest emit task: a hub factor's O(cap²)
    output no longer serializes on one worker (the north rule's "skew
    splitting for high-degree hubs", applied to factor hubs).
    """

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        from bluegraph_ray.util import broadcast_get, cached_name_index

        S, t = 1, 0
        if subs_ref is not None and "_sub" in group.columns and len(group):
            t = int(group["_sub"].iloc[0])
            S = int(broadcast_get(subs_ref)[int(group["_bucket"].iloc[0])])
        idx = cached_name_index(names_ref)
        n = np.int64(len(idx))
        eids = idx.get_indexer(group["entity"].to_numpy()).astype(np.int64)
        fcodes = pd.factorize(group["factor"].to_numpy(), use_na_sentinel=False)[0]
        order = np.lexsort((eids, fcodes))
        eids = eids[order]
        fcodes = fcodes[order]
        N = len(eids)
        run_bounds = np.flatnonzero(np.diff(fcodes)) + 1
        starts = np.concatenate(([0], run_bounds)).astype(np.int64)
        ends = np.concatenate((run_bounds, [N])).astype(np.int64)
        # hub-factor cap: deterministic truncation of each factor run to its
        # first max_factor_entities entities (sorted id order) — the
        # per-factor analog of the reference's top-k pre-filter
        # (/root/reference/cord19kg/utils.py:648-651); bounds a hub factor at
        # O(cap^2) pairs.
        eff_end = ends if max_factor_entities is None else np.minimum(
            ends, starts + max_factor_entities)

        # ---- dense (Gram) path -------------------------------------------
        # local entity compression: the bucket usually touches a subset of
        # the global vocabulary; the Gram matrix is nb², not n².
        locals_, inv = np.unique(eids, return_inverse=True)
        nb = len(locals_)
        nontrivial = np.flatnonzero(eff_end - starts >= 2)  # runs emitting pairs
        F = len(nontrivial)
        # dense only when the raw pair mass is at least ~half the full
        # triangle (hub buckets): then AᵀA replaces O(Σf²) pair traffic with
        # O(nb²) output-sized traffic. For many-small-factor buckets
        # (mass << nb²) the sparse path touches far less memory AND skips
        # the O(F·nb²) matmul flops; the flop guard caps BLAS time either way.
        fl = (eff_end[nontrivial] - starts[nontrivial]).astype(np.float64)
        pair_mass = float((fl * (fl - 1.0)).sum()) / 2.0
        if (nb <= dense_max_entities and F and F * nb <= (1 << 26)
                and pair_mass * 2.0 >= float(nb) * nb
                and float(F) * nb * nb <= 4e9):
            A = np.zeros((F, nb), dtype=np.float32)
            row_of = np.repeat(np.arange(F), ends[nontrivial] - starts[nontrivial])
            pos = _ranges_concat(starts[nontrivial], ends[nontrivial])
            keep = pos < eff_end[nontrivial][row_of]  # hub cap: first cap of each run
            A[row_of[keep], inv[pos[keep]]] = 1.0
            if S > 1:
                # this sub-task owns src rows with id ≡ t (mod S): Gram over
                # the column slice — 1/S of the compute AND of the output
                row_ids = np.flatnonzero(locals_ % S == t)
                C = A[:, row_ids].T @ A           # (nb/S, nb) slice of AᵀA
            else:
                row_ids = None
                C = A.T @ A                       # C[i,j] = shared-factor count
            # Upper-triangle extraction, CHUNKED by row block: this sandbox
            # (and any memory-ballooned VM) services first-touch page faults
            # at single-digit MB/s, so whole-matrix temporaries (np.triu
            # copy, 2-D nonzero, full-length divmod) dominate wall time.
            # Row-chunked flatnonzero keeps peak fresh memory at
            # O(chunk·nb + output); the allocator (mallopt'd, see
            # bluegraph_ray.__init__) then recycles warm chunk buffers.
            chunk = max(1, (1 << 21) // max(nb, 1))
            code_parts, cnt_parts = [], []
            gl = locals_ * n                       # precomputed row offsets
            nrows = C.shape[0]
            for r0 in range(0, nrows, chunk):
                r1 = min(nrows, r0 + chunk)
                block = C[r0:r1].ravel()
                flat = np.flatnonzero(block)
                if not len(flat):
                    continue
                iu, ju = np.divmod(flat, nb)
                iu += r0
                if row_ids is not None:
                    iu = row_ids[iu]              # back to bucket-local index
                keep2 = iu < ju
                if not keep2.any():
                    continue
                cnt_parts.append(block[flat[keep2]].astype(np.int64))
                code_parts.append(gl[iu[keep2]] + locals_[ju[keep2]])
            if not code_parts:
                e64 = np.empty(0, dtype=np.int64)
                return pa.table({"code": e64, "partial": e64, "_b2": e64})
            codes = np.concatenate(code_parts)
            counts = np.concatenate(cnt_parts)
            return pa.table(
                {
                    "code": codes,
                    "partial": counts,
                    "_b2": codes % np.int64(num_buckets),
                }
            )

        # ---- sparse path -------------------------------------------------
        # Vectorized upper-triangle emission across ALL factor runs at once:
        # position p (src) pairs with positions p+1 .. eff_end(run)-1 of its
        # run. O(total_pairs) work/memory, no f×f mask materialization
        # (np.triu_indices builds one, 32 MB per 2000-entity hub) and no
        # Python loop over factors.
        run_of = np.repeat(np.arange(len(starts)), ends - starts)
        pos = np.arange(N, dtype=np.int64)
        rem = np.maximum(eff_end[run_of] - pos - 1, 0)
        if S > 1:
            # skew sub-split: only src positions with id ≡ t (mod S) emit
            rem = np.where(eids % S == t, rem, 0)
        total = int(rem.sum())
        if total == 0:
            e64 = np.empty(0, dtype=np.int64)
            return pa.table({"code": e64, "partial": e64, "_b2": e64})
        src_pos = np.repeat(pos, rem)
        seg_starts = np.cumsum(rem) - rem
        local = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, rem)
        dst_pos = src_pos + 1 + local
        codes = eids[src_pos] * n + eids[dst_pos]
        # map-side combine: in-place sort + run-length count (≡ np.unique with
        # return_counts, minus the extra argsort/copies)
        codes.sort()
        bnd = np.flatnonzero(np.diff(codes)) + 1
        st = np.concatenate(([0], bnd))
        counts = np.diff(np.concatenate((st, [total])))
        codes = codes[st]
        return pa.table(
            {
                "code": codes,
                "partial": counts.astype(np.int64),
                "_b2": codes % np.int64(num_buckets),
            }
        )

    return emit


def _combine_pair_codes(group: pd.DataFrame):
    """Final pair combine: segment-sum partial counts per code (all rows for a
    code meet in one _b2 bucket). Zero-copy Arrow output."""
    codes = group["code"].to_numpy()
    partial = group["partial"].to_numpy()
    order = np.argsort(codes, kind="stable")
    c = codes[order]
    pvals = partial[order]
    b = np.flatnonzero(np.diff(c)) + 1
    starts = np.concatenate(([0], b))
    return pa.table({"code": c[starts],
                     "frequency": np.add.reduceat(pvals, starts).astype(np.int64)})


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
    exact_combine: bool = True,
    decode_names: bool = True,
    skew_split_target: int | None = 1_000_000,
    info_out: dict | None = None,
) -> "ray.data.Dataset":
    """(entity, factor) occurrence rows -> weighted co-occurrence edge table.

    Output columns: ``src, dst, frequency[, ppmi][, npmi]`` with ``src < dst``
    (string/numeric order — matches the reference's upper-triangle emission,
    generators.py:204; dense ids are ranks in the sorted entity array so id
    order == value order). Exact w.r.t. the reference for any input when
    ``max_factor_entities`` is None.

    ``exact_combine=False`` skips the global pair-combine shuffle and emits a
    MULTIGRAPH edge table (duplicate (src,dst) rows whose ``frequency``
    partial counts sum to the true frequency). For weighted-graph consumers
    that sum parallel edges (the CSR superstep kernels do, by construction of
    ``np.add.reduceat``) the result is numerically identical while saving the
    biggest shuffle — the scaling bench uses this. PMI statistics require the
    exact combine. ``decode_names=False`` keeps dense int ids as src/dst
    (avoids materializing 10^8 strings; ids are ranks in the sorted entity
    array).
    """
    statistics = list(statistics)
    occ = occurrences
    if entity_col != "entity" or factor_col != "factor":
        from bluegraph_ray.util import rename_columns as _rn

        occ = _rn(
            occ.select_columns([entity_col, factor_col]),
            {entity_col: "entity", factor_col: "factor"},
        )

    from bluegraph_ray.util import distinct_values, hash_distinct

    # 1. distinct (entity, factor) — map-side drop_duplicates + bucketed combine
    # (Ray's native groupby.aggregate is per-group Python; see util.py).
    distinct = hash_distinct(occ, ["entity", "factor"], num_buckets=num_buckets)
    distinct = distinct.materialize()

    # entity universe -> dense ids (rank in sorted names). The name set IS the
    # vertex-id map downstream, so it must fit the driver by design.
    names = distinct_values(distinct, "entity")
    if names.dtype == object:
        names = names.astype(str)
    n_ent = len(names)
    names_ref = ray.put(names)
    if info_out is not None:
        # callers running ``decode_names=False`` need the id -> name map
        # (dense ids are ranks in this sorted array)
        info_out["names"] = names
        info_out["n"] = n_ent

    # 3a. hub-bucket skew plan: per-bucket pair-mass estimate Σ min(f,cap)²/2
    # from a per-factor size aggregate (scalable: only num_buckets rows reach
    # the driver). Buckets whose mass exceeds ``skew_split_target`` get S>1
    # sub-tasks (split by src-id residue inside the emit kernel). The same
    # pass also yields the global distinct-factor count (the PMI denominator)
    # for free.
    from bluegraph_ray.util import hash_aggregate

    subs = np.ones(num_buckets, dtype=np.int64)
    if skew_split_target:
        fsz = hash_aggregate(distinct.select_columns(["factor"]), "factor",
                             {"sz": (None, "count")}, num_buckets=num_buckets)

        def mass_partial(batch: pd.DataFrame) -> pd.DataFrame:
            szv = batch["sz"].to_numpy(np.float64)
            if max_factor_entities is not None:
                szv = np.minimum(szv, float(max_factor_entities))
            hb = (pd.util.hash_array(batch["factor"].to_numpy())
                  % num_buckets).astype(np.int64)
            m = np.zeros(num_buckets)
            np.add.at(m, hb, szv * (szv - 1.0) / 2.0)
            cnt = np.bincount(hb, minlength=num_buckets)
            nz = np.flatnonzero(cnt)
            return pd.DataFrame({"b": nz, "mass": m[nz], "nfac": cnt[nz]})

        mp = fsz.map_batches(mass_partial, batch_format="pandas",
                             batch_size=262_144).to_pandas()
        mass = np.zeros(num_buckets)
        np.add.at(mass, mp["b"].to_numpy(), mp["mass"].to_numpy())
        subs = np.clip(np.ceil(mass / float(skew_split_target)), 1, 64).astype(np.int64)
        if total_factor_instances is None:
            total_factor_instances = int(mp["nfac"].sum())
    subs_ref = ray.put(subs)

    need_stats = any(s in ("ppmi", "npmi", "expected", "pmi2", "pmi3") for s in statistics)
    s_freq_ref = None
    if need_stats:
        # 2. per-entity distinct-factor counts as one bincount vector
        # (map-side partial bincounts, driver sum). At 10^12-file scale this
        # becomes a hash join on src/dst ids instead of a broadcast vector.
        def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
            # sparse (entity, count) partials — see stages/build.degree_partial
            from bluegraph_ray.util import cached_name_index

            idx = cached_name_index(names_ref)
            eids = idx.get_indexer(batch["entity"].to_numpy())
            u, c = np.unique(eids, return_counts=True)
            return pd.DataFrame({"v": u, "c": c})

        parts = distinct.select_columns(["entity"]).map_batches(
            partial_counts, batch_format="pandas", batch_size=262_144).to_pandas()
        s_freq = np.zeros(n_ent, dtype=np.float64)
        np.add.at(s_freq, parts["v"].to_numpy(), parts["c"].to_numpy().astype(np.float64))
        s_freq_ref = ray.put(s_freq)
        if total_factor_instances is None:
            total_factor_instances = len(distinct_values(distinct, "factor"))

    # 3b. bucket by hash(factor) (replicating hub-bucket rows per sub-task);
    # per-(bucket, sub) vectorized pair-code emission with map-side combine
    # — shuffle #2.
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = (pd.util.hash_array(batch["factor"].to_numpy())
             % num_buckets).astype(np.int64)
        s = subs[h]
        if (s > 1).any():
            idx = np.repeat(np.arange(len(batch)), s)
            seg = np.cumsum(s) - s
            batch = batch.iloc[idx].reset_index(drop=True)
            batch["_bucket"] = h[idx]
            batch["_sub"] = np.arange(len(idx), dtype=np.int64) - np.repeat(seg, s)
        else:
            batch = batch.copy()
            batch["_bucket"] = h
            batch["_sub"] = np.int64(0)
        return batch

    bucketed = distinct.map_batches(add_bucket, batch_format="pandas", batch_size=None)
    emit = _emit_pair_codes(max_factor_entities, names_ref, num_buckets,
                            subs_ref=subs_ref)
    pairs = bucketed.groupby(["_bucket", "_sub"]).map_groups(
        emit, batch_format="pandas"
    )

    # 4. global combine by pair code -> frequency = |distinct common factors|
    # — shuffle #3 (int64 keys only; nothing wide moves).
    if exact_combine:
        edges = pairs.groupby("_b2").map_groups(
            lambda g: _combine_pair_codes(g.drop(columns=["_b2"])), batch_format="pandas"
        )
    else:
        if need_stats:
            raise ValueError("PMI statistics require exact_combine=True")
        from bluegraph_ray.util import rename_columns as _rn2

        edges = _rn2(pairs.select_columns(["code", "partial"]),
                     {"partial": "frequency"})

    # 5. decode ids -> names + stateless PMI with broadcast per-entity counts.
    total = float(total_factor_instances) if total_factor_instances else 0.0
    stats = [s for s in statistics if s != "frequency"]
    rnd = round_to
    minf = min_frequency

    decode = decode_names

    def decode_and_score(batch: pd.DataFrame) -> pd.DataFrame:
        from bluegraph_ray.util import broadcast_get

        nm = broadcast_get(names_ref)
        code = batch["code"].to_numpy()
        freq = batch["frequency"].to_numpy()
        if minf > 1:
            keep = freq >= minf
            code, freq = code[keep], freq[keep]
        src_id = code // n_ent
        dst_id = code % n_ent
        out = pd.DataFrame(
            {"src": nm[src_id] if decode else src_id,
             "dst": nm[dst_id] if decode else dst_id,
             "frequency": freq}
        )
        if need_stats:
            sf = ray.get(s_freq_ref)
            co = freq.astype(np.float64)
            s = sf[src_id]
            tt = sf[dst_id]
            for stat in stats:
                mitype = {"ppmi": None, "npmi": "normalized"}.get(stat, stat)
                vals = mutual_information(co, s, tt, total, mitype=mitype)
                if rnd is not None:
                    vals = np.round(vals, rnd)
                out[stat] = vals
        return out

    edges = edges.map_batches(decode_and_score, batch_format="pandas", batch_size=None)
    keep = ["src", "dst"] + [s for s in DEFAULT_STATS if s in statistics] + [
        s for s in statistics if s not in DEFAULT_STATS
    ]
    return edges.select_columns(keep)
