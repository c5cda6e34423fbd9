"""Co-occurrence edge builder vs the reference micro-fixtures (FIXTURES.md F2)
and a brute-force oracle re-implementing the reference's all-pairs scan
(/root/reference/bluegraph/preprocess/generators.py:197-244)."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pandas as pd
import pytest

import ray.data

from bluegraph_ray.functions.pmi import mutual_information, npmi, ppmi
from bluegraph_ray.pipelines.cooccurrence import cooccurrence_edges


def ref_mi(co, s, t, n, mitype=None):
    """Scalar transcription of the reference formula (generators.py:27-73)."""
    if co > 0:
        if mitype == "normalized":
            alpha = -math.log2(co / n)
            mi = (math.log2((n * co) / (s * t)) / alpha) if alpha != 0 else 0
        elif mitype == "expected":
            mi = math.log2((n * co) / (s * t)) * (co / n)
        elif mitype == "pmi2":
            mi = math.log2(co**2 / (s * t))
        elif mitype == "pmi3":
            mi = math.log2(co**3 / (s * t * n))
        else:
            mi = math.log2((n * co) / (s * t))
    else:
        mi = 0
    return mi if mi > 0 else 0


def brute_force_edges(factor_sets: dict, total=None, stats=("frequency", "ppmi", "npmi")):
    if total is None:
        total = len(set().union(*factor_sets.values()))
    rows = []
    for s, t in combinations(sorted(factor_sets), 2):
        common = factor_sets[s] & factor_sets[t]
        if not common:
            continue
        row = {"src": s, "dst": t}
        if "frequency" in stats:
            row["frequency"] = len(common)
        if "ppmi" in stats:
            row["ppmi"] = ref_mi(len(common), len(factor_sets[s]), len(factor_sets[t]), total)
        if "npmi" in stats:
            row["npmi"] = ref_mi(
                len(common), len(factor_sets[s]), len(factor_sets[t]), total, "normalized"
            )
        rows.append(row)
    return pd.DataFrame(rows).sort_values(["src", "dst"]).reset_index(drop=True)


def occurrence_ds(factor_sets: dict) -> "ray.data.Dataset":
    rows = [
        {"entity": e, "factor": f} for e, fs in factor_sets.items() for f in fs
    ]
    return ray.data.from_items(rows)


def run_pipeline(factor_sets, **kw):
    ds = cooccurrence_edges(occurrence_ds(factor_sets), **kw)
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    return df


def test_mutual_information_matches_reference_scalar():
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = rng.integers(2, 1000)
        s = rng.integers(1, n)
        t = rng.integers(1, n)
        co = rng.integers(0, min(s, t) + 1)
        for mitype in (None, "normalized", "expected", "pmi2", "pmi3"):
            got = mutual_information(
                np.array([co]), np.array([s]), np.array([t]), n, mitype
            )[0]
            want = ref_mi(co, s, t, n, mitype)
            assert got == pytest.approx(want, abs=1e-12), (co, s, t, n, mitype)


def test_f2_node_property_fixture():
    """Reference test_generation_from_nodes
    (/root/reference/tests/preprocess/test_co_occurrence_generators.py:7-30)."""
    factor_sets = {
        "a": {1, 2, 3, 4},
        "b": {1, 2, 3, 5},
        "c": {3, 4, 5, 6},
    }
    df = run_pipeline(factor_sets, total_factor_instances=6, statistics=["frequency", "npmi"])
    assert len(df) == 3
    freq = {(r.src, r.dst): r.frequency for r in df.itertuples()}
    assert freq == {("a", "b"): 3, ("b", "c"): 2, ("a", "c"): 2}
    want = brute_force_edges(factor_sets, total=6, stats=("frequency", "npmi"))
    np.testing.assert_allclose(df["npmi"].to_numpy(), want["npmi"].to_numpy(), rtol=1e-12)


def test_f2_edge_fixture():
    """Reference test_generation_from_edges (bipartite OccursIn,
    test_co_occurrence_generators.py:33-76): factor sets are the edge targets."""
    factor_sets = {"a": {"P1", "P2", "P3"}, "b": {"P2", "P3"}, "c": {"P1", "P3"}}
    df = run_pipeline(factor_sets, statistics=["frequency", "npmi"])
    freq = {(r.src, r.dst): r.frequency for r in df.itertuples()}
    assert freq == {("a", "b"): 2, ("b", "c"): 1, ("a", "c"): 2}


def test_random_against_brute_force():
    rng = np.random.default_rng(42)
    entities = [f"e{i}" for i in range(40)]
    factors = [f"f{i}" for i in range(25)]
    factor_sets = {
        e: {str(f) for f in rng.choice(factors, size=rng.integers(1, 10), replace=False)}
        for e in entities
    }
    df = run_pipeline(factor_sets)
    want = brute_force_edges(factor_sets)
    assert len(df) == len(want)
    pd.testing.assert_frame_equal(
        df[["src", "dst"]], want[["src", "dst"]], check_dtype=False
    )
    np.testing.assert_array_equal(df["frequency"].to_numpy(), want["frequency"].to_numpy())
    np.testing.assert_allclose(df["ppmi"].to_numpy(), want["ppmi"].to_numpy(), rtol=1e-12)
    np.testing.assert_allclose(df["npmi"].to_numpy(), want["npmi"].to_numpy(), rtol=1e-12)


def test_min_frequency_and_hub_cap():
    factor_sets = {"a": {1, 2, 3}, "b": {1, 2}, "c": {3}, "d": {3}}
    df = run_pipeline(factor_sets, statistics=["frequency"], min_frequency=2)
    assert {(r.src, r.dst) for r in df.itertuples()} == {("a", "b")}
    # cap: factor 3 is shared by a,c,d (size 3) — truncating at 2 keeps only
    # the first 2 sorted entities {a,c}, so (a,c) survives but (a,d)/(c,d) drop
    df2 = run_pipeline(factor_sets, statistics=["frequency"], max_factor_entities=2)
    assert {(r.src, r.dst) for r in df2.itertuples()} == {("a", "b"), ("a", "c")}


def test_dense_gram_path_equals_sparse_path():
    """The AᵀA dense kernel and the repeat/arange sparse kernel must emit
    identical (code, partial) rows, with and without the hub cap."""
    import ray

    from bluegraph_ray.pipelines.cooccurrence import _emit_pair_codes

    rng = np.random.default_rng(3)
    names = np.array([f"e{i:04d}" for i in range(300)])
    rows = []
    for f in range(15):
        k = int(rng.integers(1, 200))
        for e in rng.choice(300, k, replace=False):
            rows.append((names[e], f"f{f}"))
    df = pd.DataFrame(rows, columns=["entity", "factor"]).drop_duplicates()
    names_ref = ray.put(np.sort(np.unique(df["entity"].to_numpy().astype(str))))
    for cap in (None, 50):
        dense = _emit_pair_codes(cap, names_ref, 16, dense_max_entities=4096)(df).to_pandas()
        sparse = _emit_pair_codes(cap, names_ref, 16, dense_max_entities=0)(df).to_pandas()
        d = dense.sort_values("code").reset_index(drop=True)
        s = sparse.sort_values("code").reset_index(drop=True)
        assert d.equals(s)
        assert len(d) > 0


def test_skew_split_equals_unsplit():
    """Hub-bucket sub-splitting must not change the edge table at all."""
    import ray

    from bluegraph_ray.pipelines.cooccurrence import cooccurrence_edges

    rng = np.random.default_rng(5)
    rows = []
    for f in range(12):
        k = int(rng.integers(2, 150))
        for e in rng.choice(400, k, replace=False):
            rows.append((f"e{e:04d}", f"f{f}"))
    ds = ray.data.from_pandas(pd.DataFrame(rows, columns=["entity", "factor"]))
    kw = dict(statistics=("frequency", "ppmi", "npmi"), num_buckets=8)
    a = cooccurrence_edges(ds, skew_split_target=None, **kw).to_pandas()
    b = cooccurrence_edges(ds, skew_split_target=500, **kw).to_pandas()
    a = a.sort_values(["src", "dst"], ignore_index=True)
    b = b.sort_values(["src", "dst"], ignore_index=True)
    assert a.equals(b)
