"""Shared Dataset primitives: column rename, high-cardinality hash aggregation.

Why these exist: in Ray 2.49 ``Dataset.rename_columns`` breaks on
pandas-backed blocks, and ``groupby(keys).aggregate(...)`` — under both the
sort- and hash-shuffle strategies — iterates groups in Python, which is
unusable at high key cardinality (measured: 1M rows / 600k groups took >500 s;
the bucketed pattern below takes ~13 s on the same input). Every wide
aggregation in this engine therefore goes through :func:`hash_aggregate` /
:func:`hash_distinct`:

    map_batches(pandas groupby partial)        # map-side combine, vectorized
      -> add bucket = hash(keys) % B           # the ONE partitioning key
      -> groupby(bucket).map_groups(vectorized pandas combine)

Only B groups cross the shuffle boundary as groups; all per-key work is
vectorized C inside pandas. ``num_buckets`` is the reduce parallelism — size
it to the cluster (more buckets = smaller reduce partitions; hub keys are
still single rows after the map-side combine, so skew in the *key histogram*
is already flattened before the shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def tune_context(num_cpus: int | None = None) -> None:
    """Right-size Ray Data's default parallelism to the session.

    The library never calls ray.init, but shuffle/read fan-out defaults
    (min_parallelism=200) drown small-to-medium inputs in task overhead;
    callers with a known CPU budget (bench.py, entry(), query callables)
    invoke this once per session. Idempotent.
    """
    import ray
    from ray.data import DataContext

    if num_cpus is None:
        try:
            num_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            num_cpus = 8
    ctx = DataContext.get_current()
    ctx.min_parallelism = max(8, num_cpus)
    ctx.read_op_min_num_blocks = max(8, num_cpus)
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def rename_columns(ds: "ray.data.Dataset", mapping: dict) -> "ray.data.Dataset":
    """Rename columns via an Arrow map_batches (safe for pandas blocks)."""

    def rn(t):
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(rn, batch_format="pyarrow", batch_size=None)


_COMBINE_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def hash_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    aggs: dict[str, tuple[str | None, str]],
    *,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed groupby-aggregate for high-cardinality keys.

    ``aggs``: {out_col: (in_col, op)} with op in {"sum", "count", "min",
    "max"}; for "count", in_col is ignored. Exact for these ops (partial +
    combine are both vectorized pandas groupbys).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for out, (col, op) in aggs.items():
        if op not in _COMBINE_OP and op != "count":
            raise ValueError(
                f"unsupported aggregate op {op!r} for {out!r}; "
                f"supported: {sorted(_COMBINE_OP) + ['count']} "
                "(ops must decompose into partial+combine)"
            )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        spec = {}
        for out, (col, op) in aggs.items():
            if op == "count":
                anycol = keys[0]
                spec[out] = (anycol, "size")
            else:
                spec[out] = (col, op)
        out = g.agg(**spec).reset_index()
        h = pd.util.hash_pandas_object(out[keys], index=False).to_numpy()
        out["_bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns=["_bucket"]).groupby(keys, sort=False, dropna=False)
        spec = {out: (out, _COMBINE_OP[op] if op != "count" else "sum")
                for out, (col, op) in aggs.items()}
        return g.agg(**spec).reset_index()

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


def hash_distinct(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    *,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed DISTINCT over ``keys`` (keeps first occurrence's other
    columns; deterministic only in the key columns)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.drop_duplicates(keys)
        h = pd.util.hash_pandas_object(out[keys], index=False).to_numpy()
        out = out.copy()
        out["_bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop(columns=["_bucket"]).drop_duplicates(keys)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


def hash_argmin(
    ds: "ray.data.Dataset",
    keys: list[str] | str,
    order_col: str,
    *,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Keep, per distinct ``keys``, the full row with the smallest
    ``order_col`` (ties broken by first occurrence — deterministic when
    ``order_col`` is unique per key group).

    One shuffle, partitioned by key hash; the map side pre-reduces each
    batch to one row per key so only candidate winners move. Unlike
    ``hash_aggregate(min)`` this carries every payload column of the
    winning row, which saves the follow-up semi-join when downstream
    stages need more than the key (e.g. dedup survivors that keep their
    text column)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def _pick(batch: pd.DataFrame) -> pd.DataFrame:
        idx = batch.groupby(keys, sort=False, dropna=False)[order_col].idxmin()
        return batch.loc[idx.to_numpy()]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = _pick(batch).copy()
        h = pd.util.hash_pandas_object(out[keys], index=False).to_numpy()
        out["_bucket"] = (h % num_buckets).astype(np.int64)
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return _pick(group.drop(columns=["_bucket"]))

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


def schema_dict(ds: "ray.data.Dataset") -> dict:
    """{column: numpy dtype | None} for EVERY column of a Dataset schema —
    the full-schema companion to ``_schema_np_dtypes`` (which keeps only
    int/bool), for feeding ``hash_join``'s left_schema/right_schema. None
    marks columns with no numpy dtype (strings/objects): their NAME is
    still part of the schema, they just skip dtype restoration."""
    import pyarrow as pa

    out: dict = {}
    sch = ds.schema()
    for name, t in zip(sch.names, sch.types):
        try:
            dt = (np.dtype(t.to_pandas_dtype())
                  if isinstance(t, pa.DataType) else np.dtype(t))
            if dt == np.dtype(object):
                dt = None
        except (TypeError, NotImplementedError):
            dt = None
        out[name] = dt
    return out


def _schema_np_dtypes(ds: "ray.data.Dataset") -> dict:
    """{column: numpy dtype} for the int/bool columns of a Dataset schema
    (Arrow or pandas block format) — the dtypes NaN-union drift destroys.
    The int/bool filter over :func:`schema_dict`."""
    try:
        return {c: dt for c, dt in schema_dict(ds).items()
                if dt is not None
                and (np.issubdtype(dt, np.integer) or dt == np.bool_)}
    except Exception:
        return {}


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str] | str,
    *,
    how: str = "inner",
    num_buckets: int = 64,
    suffix: str = "_r",
    left_schema: dict | None = None,
    right_schema: dict | None = None,
) -> "ray.data.Dataset":
    """Partitioned hash join: tag side -> bucket by hash(key) -> per-bucket
    pandas merge. Both sides stream; only one bucket pair is in memory per
    task. (Ray 2.49 ships Dataset.join behind the hash-shuffle strategy, which
    shares the per-group-Python aggregate machinery this module exists to
    avoid.) Salting hot keys = raising num_buckets; a key's rows always meet
    in exactly one bucket.

    ``left_schema`` / ``right_schema``: optional {col: np.dtype} overrides.
    Without them the join calls ``Dataset.schema()`` on each input — and
    when an input is itself the output of an all-to-all (a prior hash_join
    / groupby), Ray resolves that schema by EXECUTING the upstream shuffle,
    so a chained join silently runs its first stage twice (measured ~2x on
    the TPC-H-shaped suite). Callers that know their intermediate schema
    (they just constructed it) should pass it and keep the whole chain a
    single streamed execution."""
    on = [on] if isinstance(on, str) else list(on)

    def tag(side: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            h = pd.util.hash_pandas_object(batch[on], index=False).to_numpy()
            batch["_bucket"] = (h % num_buckets).astype(np.int64)
            batch["_side"] = side
            return batch

        return f

    if left_schema is not None:
        left_cols = list(left_schema)
        left_dtypes = {c: np.dtype(t) for c, t in left_schema.items()
                       if t is not None}
    else:
        left_cols = list(left.schema().names)
        left_dtypes = _schema_np_dtypes(left)
    if right_schema is not None:
        right_cols = list(right_schema)
        right_dtypes = {c: np.dtype(t) for c, t in right_schema.items()
                        if t is not None}
    else:
        right_cols = list(right.schema().names)
        right_dtypes = _schema_np_dtypes(right)

    both = left.map_batches(tag("l"), batch_format="pandas", batch_size=None).union(
        right.map_batches(tag("r"), batch_format="pandas", batch_size=None)
    )

    def _restore(side: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
        # the tagged union concatenates both sides into one frame, NaN-filling
        # each side's missing columns — which silently upcasts int/bool
        # columns to float for the OTHER side's genuine rows too. After the
        # side split the NaNs are gone, so cast back (keys especially:
        # a float64-drifted key never hash-matches its int64 counterpart in
        # a later join).
        for c, dt in dtypes.items():
            if c in side.columns and side[c].dtype != dt:
                try:
                    side[c] = side[c].astype(dt)
                except (ValueError, TypeError):
                    pass  # genuine NaNs or incompatible values: leave as-is
        return side

    declared = set(left_cols) | set(right_cols)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # guard the caller-declared schemas (left_schema/right_schema are
        # hand-written at chained call sites): a real column missing from
        # the declaration would silently vanish in the reindex, a declared
        # column the side doesn't produce would fabricate all-NaN — both
        # are desync bugs, fail loudly instead
        actual = set(group.columns) - {"_bucket", "_side"}
        extra = actual - declared
        if extra:
            raise ValueError(
                f"hash_join: input columns {sorted(extra)} are not in the "
                "declared left_schema/right_schema — update the call site")
        lmask = group["_side"] == "l"
        rmask = ~lmask
        if lmask.any():
            miss = set(left_cols) - actual
            if miss:
                raise ValueError(
                    f"hash_join: declared left columns {sorted(miss)} never "
                    "produced by the left input — stale left_schema")
        if rmask.any():
            miss = set(right_cols) - actual
            if miss:
                raise ValueError(
                    f"hash_join: declared right columns {sorted(miss)} "
                    "never produced by the right input — stale right_schema")
        # a bucket may hold rows from only one side -> the concatenated group
        # lacks the other side's columns; reindex restores them as NaN
        l = _restore(group[lmask].reindex(columns=left_cols), left_dtypes)
        r = _restore(group[rmask].reindex(columns=right_cols), right_dtypes)
        return l.merge(r, on=on, how=how, suffixes=("", suffix))

    return both.groupby("_bucket").map_groups(merge, batch_format="pandas")


_BCAST_CACHE: dict = {}


def broadcast_get(ref):
    """Worker-cached ``ray.get`` for broadcast objects.

    Object-dtype numpy arrays (vertex-name arrays) deserialize NON-zero-copy
    from plasma — a per-batch ``ray.get`` re-materializes millions of Python
    strings every call. Caching the deserialized object per worker process
    makes the cost once-per-worker instead of once-per-batch. Bounded cache:
    broadcast objects of a finished stage are dropped once 8 newer ones arrive.
    """
    if isinstance(ref, (np.ndarray, pd.Index)):
        return ref
    import ray

    key = ref.hex()
    if key not in _BCAST_CACHE:
        if len(_BCAST_CACHE) > 8:
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def cached_name_index(ref) -> pd.Index:
    """Per-worker cached ``pd.Index`` over a broadcast name array.

    ``Index.get_indexer`` is a C hash-table probe — far faster than
    ``np.searchsorted`` over unicode arrays (which burns seconds per million
    rows on string comparisons) — but building the hash table is itself O(n),
    so it must happen once per worker, not once per batch.
    """
    key = ("idx", ref.hex() if hasattr(ref, "hex") else id(ref))
    if key not in _BCAST_CACHE:
        if len(_BCAST_CACHE) > 8:
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = pd.Index(broadcast_get(ref))
    return _BCAST_CACHE[key]


def distinct_values(ds: "ray.data.Dataset", column: str) -> np.ndarray:
    """Global distinct values of one column, collected to the driver sorted.

    Per-batch np.unique (map-side), then one driver-side unique of the
    concatenated partials — for columns whose distinct set fits the driver
    (vertex names, factor ids). No shuffle at all.
    """

    def uniq(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({column: pd.unique(batch[column])})

    parts = ds.map_batches(uniq, batch_format="pandas", batch_size=None).to_pandas()
    return np.sort(pd.unique(parts[column].to_numpy()))


def round_ratio_even(
    num: np.ndarray, den: np.ndarray, decimals: int = 6
) -> np.ndarray:
    """Exact half-even rounding of the rational ``num/den`` to ``decimals``
    places, entirely in int64 — returns float64 ``q / 10**decimals``.

    ``np.round(num/den, 6)`` computes ``x * 1e6`` in floating point, which
    perturbs exact half-boundaries (e.g. 1615/3200 = 0.5046875 → numpy sees
    504687.49999999994 and rounds DOWN; DuckDB's ``round_even`` sees the
    exact tie and rounds half-even UP). Any aggregate of exact decimals
    divided by a count can land on such a tie, so oracle-facing means must
    round through this helper. The single final float division (exact int →
    correctly-rounded double) is bit-identical to the SQL replay
    ``CAST(q AS DOUBLE) / 10^d``. Caller guarantees ``num * 10**decimals``
    fits int64 (reduce num/den by gcd(10**decimals, scale) first).
    """
    num = np.asarray(num, dtype=np.int64)
    den = np.asarray(den, dtype=np.int64)
    p = np.int64(10 ** decimals)
    scaled = num * p
    q0 = scaled // den
    r2 = (scaled - q0 * den) * 2
    up = (r2 > den) | ((r2 == den) & (q0 % 2 != 0))
    return (q0 + up).astype(np.float64) / float(p)


def duckdb_round_even(x: np.ndarray, decimals: int = 6) -> np.ndarray:
    """Bit-exact replay of DuckDB's ``round_even(x, n)`` MACRO (the oracle
    side of every value-hash comparison):

        CASE WHEN (abs(x) * 10^(n+1)) % 10 = 5
             THEN round(x/2, n) * 2 ELSE round(x, n) END

    where ``round`` is C++ ``std::round`` (half away from zero) applied to
    ``x * 10^n``. np.round (half-even on the float product) disagrees with
    this on exact and near-tie values — e.g. a groupwise-argmin unit price
    of cents/(100*q) landing on ...5e-7 flipped min_unit_price_supplier in
    the round-5 drive — so oracle-facing emits round through this instead.
    Fuzz-verified identical on 450k mixed-sign exact-decimal/random values
    (round-5 session). Exact for |x * 10^(n+1)| < 2^52."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** decimals
    tie = np.fmod(np.abs(x) * (10.0 ** (decimals + 1)), 10.0) == 5.0
    return np.where(tie, round_half_away((x / 2) * p) / p * 2,
                    round_half_away(x * p) / p)


def round_half_away(y: np.ndarray) -> np.ndarray:
    """C++ ``std::round`` / DuckDB ``round(x, 0)``: round half AWAY from
    zero, computed exactly for |y| < 2^52 (trunc + exact-fraction compare —
    the naive ``floor(y + 0.5)`` misrounds when the float add crosses a
    representability boundary). The single shared site for the oracle's
    integer-quantization rule (used by duckdb_round_even and both
    single-step trainer quantizers)."""
    y = np.asarray(y, dtype=np.float64)
    t = np.trunc(y)
    return t + np.copysign((np.abs(y - t) >= 0.5).astype(np.float64), y)
