"""Distributed cardinality sketches (HyperLogLog).

A 100 TB pipeline constantly needs "how many distinct X" without paying the
exact-distinct shuffle (util.distinct_values streams per-batch uniques to
the driver — exact, but O(distinct) driver memory). HyperLogLog gives the
estimate in 2^p bytes with a combine that is a plain elementwise max, so it
drops straight into the engine's partial+combine aggregate shape: each batch
emits its non-zero (register, rho) pairs SPARSELY, one bucketed max-combine
merges them, the estimator runs on the final 2^p-vector.

Hashing follows the repo's oracle convention (dedup.MinHasher): h = first 8
bytes of sha256(str(value)), big-endian — so a DuckDB oracle replays the
whole sketch bit for bit ('0x' || substr(sha256(v),1,16))::UBIGINT, register
= h >> (64-p), rho = number of leading zeros of the remaining (64-p)-bit
word + 1 (via exact integer bit-length, no float log anywhere). Estimator is
the standard HLL with the small-range linear-counting correction; 64-bit
hashes need no large-range correction.

Accuracy: σ ≈ 1.04/√(2^p) relative error (p=12 -> ~1.6%);
tests/test_analysis.py asserts <5% on known-cardinality fixtures.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.util import hash_aggregate


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (0 for 0) — vectorized shifts,
    no float log."""
    w = w.astype(np.uint64, copy=True)
    out = np.zeros(len(w), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        w[big] >>= np.uint64(shift)
    out[w > 0] += 1
    return out


def _sha_u64(values) -> np.ndarray:
    """First 8 bytes of sha256(str(value)), big-endian (oracle convention)."""
    return np.fromiter(
        (int.from_bytes(hashlib.sha256(str(v).encode()).digest()[:8], "big")
         for v in values),
        dtype=np.uint64, count=len(values))


def hll_registers(ds: "ray.data.Dataset", column: str, *, p: int = 12,
                  num_buckets: int = 16) -> np.ndarray:
    """-> dense 2^p register vector (max rho per register) for ``column``."""
    m = 1 << p
    low_bits = np.uint64(64 - p)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _sha_u64(batch[column].to_numpy())
        reg = (h >> low_bits).astype(np.int64)
        w = h & ((np.uint64(1) << low_bits) - np.uint64(1))
        rho = (64 - p) - _bit_length_u64(w) + 1
        out = pd.DataFrame({"reg": reg, "rho": rho})
        return out.groupby("reg", sort=False).max().reset_index()

    sparse = hash_aggregate(
        ds.select_columns([column]).map_batches(
            partial, batch_format="pandas", batch_size=None),
        "reg", {"rho": ("rho", "max")}, num_buckets=num_buckets,
    ).to_pandas()
    regs = np.zeros(m, dtype=np.int64)
    regs[sparse["reg"].to_numpy()] = sparse["rho"].to_numpy()
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting branch."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)


def hll_distinct(ds: "ray.data.Dataset", column: str, *, p: int = 12,
                 num_buckets: int = 16) -> float:
    """Approximate COUNT(DISTINCT column) — one streaming pass, one sparse
    max-combine shuffle, 2^p driver bytes."""
    return hll_estimate(hll_registers(ds, column, p=p,
                                      num_buckets=num_buckets))


def hll_group_distinct(ds: "ray.data.Dataset", column: str, key: str, *,
                       p: int = 12, num_buckets: int = 16) -> pd.DataFrame:
    """Per-key approximate COUNT(DISTINCT column): the GROUPED-sketch shape.

    Sparse (key, reg, rho) partials with max-combine — the shuffle moves at
    most groups x 2^p rows regardless of input size, and the driver holds
    O(groups x 2^p) to run the estimator. The contract is low key
    cardinality x huge value cardinality (per-language distinct documents,
    per-tenant distinct users); high-cardinality keys should flip to exact
    hash_distinct instead. Same register/rho/estimator math as
    hll_registers, so the oracle replay extends with one GROUP BY key."""
    m = 1 << p
    low_bits = np.uint64(64 - p)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _sha_u64(batch[column].to_numpy())
        reg = (h >> low_bits).astype(np.int64)
        w = h & ((np.uint64(1) << low_bits) - np.uint64(1))
        rho = (64 - p) - _bit_length_u64(w) + 1
        out = pd.DataFrame({"k": batch[key].to_numpy(), "reg": reg,
                            "rho": rho})
        return out.groupby(["k", "reg"], sort=False).max().reset_index()

    sparse = hash_aggregate(
        ds.select_columns([key, column]).map_batches(
            partial, batch_format="pandas", batch_size=None),
        ["k", "reg"], {"rho": ("rho", "max")}, num_buckets=num_buckets,
    ).to_pandas()
    rows = []
    for k, grp in sparse.groupby("k", sort=True):
        regs = np.zeros(m, dtype=np.int64)
        regs[grp["reg"].to_numpy()] = grp["rho"].to_numpy()
        rows.append((k, round(hll_estimate(regs), 6)))
    return pd.DataFrame(rows, columns=[key, "hll_estimate"])


# ---------------------------------------------------------------------------
# Count-Min sketch: approximate frequencies in depth × width counters.
# Combine = elementwise SUM (partials add exactly), so it rides the same
# sparse-partial + hash-combine shape as the HLL registers. Row hashes
# derive from the one sha256-prefix value hash via a per-row splitmix-style
# mix: col_j = (((h xor (j+1)·C2) · C4) mod 2^64) >> (64 − log2 width).
# (A plain odd-multiplier family h·(2j+1) keeps the TOP bits correlated
# across rows — two values colliding in row 0 mostly collide everywhere,
# measured 12x worse overestimates; the multiply-after-xor mix breaks the
# correlation.) Every counter is exactly replayable by a DuckDB oracle
# (the same split-multiply HUGEINT arithmetic as the walk hash), so the
# estimate is verified by exact arithmetic, not approximate comparison.
# ---------------------------------------------------------------------------


_CMS_C2 = np.uint64(0xBF58476D1CE4E5B9)
_CMS_C4 = np.uint64(0xD6E8FEB86659FD93)


def _cms_row_hash(h: np.ndarray, j: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (h ^ (np.uint64(j + 1) * _CMS_C2)) * _CMS_C4


def cms_tables(ds: "ray.data.Dataset", column: str, *, depth: int = 4,
               width_log2: int = 12,
               num_buckets: int = 16) -> np.ndarray:
    """-> dense (depth, 2^width_log2) int64 counter matrix for ``column``."""
    width = 1 << width_log2
    shift = np.uint64(64 - width_log2)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _sha_u64(batch[column].to_numpy())
        rows, cols, cnts = [], [], []
        for j in range(depth):
            cj = (_cms_row_hash(h, j) >> shift).astype(np.int64)
            u, c = np.unique(cj, return_counts=True)
            rows.append(np.full(len(u), j, dtype=np.int64))
            cols.append(u)
            cnts.append(c.astype(np.int64))
        return pd.DataFrame({"row": np.concatenate(rows),
                             "col": np.concatenate(cols),
                             "cnt": np.concatenate(cnts)})

    sparse = hash_aggregate(
        ds.select_columns([column]).map_batches(
            partial, batch_format="pandas", batch_size=None),
        ["row", "col"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    tab = np.zeros((depth, width), dtype=np.int64)
    tab[sparse["row"].to_numpy(), sparse["col"].to_numpy()] = (
        sparse["cnt"].to_numpy())
    return tab


def cms_query(tab: np.ndarray, values, *, width_log2: int = 12) -> np.ndarray:
    """Point-estimate frequencies for ``values`` against a cms_tables
    matrix: min over rows of the row's counter (the classic overestimate
    bound: f <= f̂ <= f + εN w.h.p.)."""
    depth = tab.shape[0]
    shift = np.uint64(64 - width_log2)
    h = _sha_u64(list(values))
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        cj = (_cms_row_hash(h, j) >> shift).astype(np.int64)
        est = np.minimum(est, tab[j, cj])
    return est
