"""Property-based tests (hypothesis) for the pure kernels."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bluegraph_ray.functions.pmi import mutual_information, npmi, ppmi
from bluegraph_ray.functions.setops import (
    aggregate_values,
    normalize_to_set,
    safe_intersection,
    str_to_set,
)


@given(
    st.integers(min_value=2, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=200, deadline=None)
def test_pmi_invariants(n, s, t):
    s = min(s, n)
    t = min(t, n)
    co = min(s, t)
    p = ppmi(np.array([co]), np.array([s]), np.array([t]), n)[0]
    q = npmi(np.array([co]), np.array([s]), np.array([t]), n)[0]
    assert p >= 0.0 and q >= 0.0
    assert q <= 1.0 + 1e-12  # npmi clamped to [0, 1]
    # zero co-occurrence is always 0
    assert ppmi(np.array([0]), np.array([s]), np.array([t]), n)[0] == 0.0
    # pmi2 <= pmi (co <= n)
    m2 = mutual_information(np.array([co]), np.array([s]), np.array([t]), n, "pmi2")[0]
    assert m2 <= p + 1e-9


@given(st.lists(st.one_of(st.integers(-5, 5), st.text(max_size=3)), max_size=12))
@settings(max_examples=150, deadline=None)
def test_aggregate_values_shapes(values):
    out = aggregate_values(values)
    distinct = {v for v in values if not (isinstance(v, float) and math.isnan(v))}
    if len(distinct) == 0:
        assert isinstance(out, float) and math.isnan(out)
    elif len(distinct) == 1:
        assert out == next(iter(distinct))
    else:
        assert out == distinct


@given(st.lists(st.integers(0, 8)), st.lists(st.integers(0, 8)))
@settings(max_examples=150, deadline=None)
def test_safe_intersection_multiset(a, b):
    out = safe_intersection(a, b)  # lists -> multiset semantics
    assert isinstance(out, list)
    from collections import Counter

    ca, cb, co = Counter(a), Counter(b), Counter(out)
    for k, v in co.items():
        assert v == min(ca[k], cb[k])
    for k in set(ca) & set(cb):
        assert co[k] == min(ca[k], cb[k])


@given(st.sets(st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_str_to_set_roundtrip(s):
    assert str_to_set(repr(s)) == s


@given(st.one_of(st.none(), st.integers(), st.text(max_size=4),
                 st.lists(st.integers(), max_size=5)))
@settings(max_examples=100, deadline=None)
def test_normalize_to_set_total(value):
    out = normalize_to_set(value)
    assert isinstance(out, set)
    if value is None:
        assert out == set()
    elif isinstance(value, list):
        assert out == set(value)
    else:
        assert out == {value}


@given(
    st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_gather_chunk_plan_invariants(run_lengths, chunk_arcs):
    """Chunk bounds tile the run index space exactly; no chunk is empty; no
    chunk exceeds chunk_arcs except when a single run is longer."""
    from bluegraph_ray.stages.build import _gather_chunks

    runs = np.asarray(run_lengths)
    starts = np.concatenate(([0], np.cumsum(runs)[:-1]))
    total = int(runs.sum())
    cb = _gather_chunks(starts, total, chunk_arcs=chunk_arcs)
    assert cb[0] == 0 and cb[-1] == len(starts)
    assert (np.diff(cb) > 0).all()
    ends = np.append(starts[cb[1:-1]], total)
    begins = starts[cb[:-1]]
    sizes = ends - begins
    assert (sizes > 0).all()
    assert int(sizes.sum()) == total
    # a chunk may overshoot the target only by the straddling run's length
    for a, b, sz in zip(cb[:-1], cb[1:], sizes):
        assert sz <= chunk_arcs + runs[a:b].max() - 1


@given(st.integers(min_value=2, max_value=40), st.integers(min_value=1, max_value=8))
@settings(max_examples=50, deadline=None)
def test_kmeans_centroid_invariants(n_points, n_segments):
    from bluegraph_ray.pipelines.similarity import kmeans_centroids

    rng = np.random.default_rng(n_points * 131 + n_segments)
    x = rng.standard_normal((n_points, 6))
    c = kmeans_centroids(x, n_segments, seed=17)
    assert c.shape == (min(n_segments, n_points), 6)
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0)
    c2 = kmeans_centroids(x, n_segments, seed=17)
    assert (c == c2).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
    max_size=12))
def test_fast_token_stream_matches_split_semantics(texts):
    """The vectorized tokenizer must agree with str.split(' ') on token
    COUNTS for arbitrary unicode (empty tokens included), and equal tokens
    must hash equally across positions and docs."""
    from bluegraph_ray.pipelines.dedup import _fast_token_stream

    th, tb = _fast_token_stream(texts)
    assert len(tb) == len(texts) + 1
    all_toks: list = []
    for d, t in enumerate(texts):
        toks = t.split(" ")
        assert tb[d + 1] - tb[d] == len(toks)
        all_toks.extend(toks)
    assert len(th) == len(all_toks)
    # content-determined: same token -> same hash, everywhere
    by_tok: dict = {}
    for tok, h in zip(all_toks, th):
        assert by_tok.setdefault(tok, h) == h, tok


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(
    alphabet=st.sampled_from("ab c"), max_size=30), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=4))
def test_fast_shingle_hashes_match_token_shingles(texts, k):
    """Shingle hashing must mirror _token_shingles structure: per-doc
    shingle counts agree, equal shingle strings hash equally across docs,
    distinct shingles (almost surely) differ."""
    from bluegraph_ray.pipelines.dedup import (_fast_shingle_hashes,
                                               _token_shingles)

    sh, sb = _fast_shingle_hashes(texts, k)
    by_shingle: dict = {}
    for d, t in enumerate(texts):
        ref = _token_shingles(t, k)
        assert sb[d + 1] - sb[d] == len(ref)
        for s, h in zip(ref, sh[sb[d]:sb[d + 1]]):
            assert by_shingle.setdefault(s, h) == h, s


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=200),
       st.lists(st.integers(min_value=1, max_value=30), min_size=1,
                max_size=12),
       st.integers(min_value=4, max_value=64))
def test_segment_affine_min_matches_naive(hashes, seg_sizes, chunk):
    """Cache-blocked segmented minima == the naive per-segment min for any
    segment layout and chunk size (incl. chunks smaller than a segment)."""
    from bluegraph_ray.pipelines.dedup import MinHasher, _segment_affine_min

    h = np.asarray(hashes, dtype=np.uint64)
    sizes = np.asarray(seg_sizes)
    sizes = sizes[np.cumsum(sizes) <= len(h)]
    if len(sizes) == 0:
        sizes = np.array([len(h)])
    bounds = np.concatenate(([0], np.cumsum(sizes)))
    h = h[: bounds[-1]]
    mh = MinHasher(num_perm=8)
    got = _segment_affine_min(mh.a[:8], mh.b[:8], h, bounds, chunk=chunk)
    with np.errstate(over="ignore"):
        for d in range(len(bounds) - 1):
            seg = h[bounds[d]:bounds[d + 1]]
            want = (mh.a[:8, None] * seg[None, :] + mh.b[:8, None]).min(axis=1)
            assert (got[d] == want).all()


@given(
    p=st.integers(min_value=0, max_value=10_000_000),
    q=st.integers(min_value=1, max_value=100_000),
    neg=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_round_ratio_even_matches_exact_rational(p, q, neg):
    """round_ratio_even(p, q, 6) must equal the mathematically exact
    half-even rounding of the rational p/q (Fraction arithmetic), including
    true ties and negatives — this is the engine-side contract that float
    np.round cannot honor."""
    from fractions import Fraction

    from bluegraph_ray.util import round_ratio_even

    if neg:
        p = -p
    got = round_ratio_even(np.array([p]), np.array([q]))[0]
    scaled = Fraction(p, q) * 10**6
    fl = scaled.numerator // scaled.denominator
    rem2 = 2 * (scaled - fl)
    if rem2 > 1 or (rem2 == 1 and fl % 2 != 0):
        fl += 1
    assert got == fl / 1e6


@given(
    x=st.one_of(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        # exact-decimal rationals — the tie-rich family
        st.tuples(st.integers(0, 10_000_000), st.integers(1, 1000)).map(
            lambda t: t[0] / (100.0 * t[1])),
    ),
)
@settings(max_examples=300, deadline=None)
def test_duckdb_round_even_matches_live_duckdb(x):
    """util.duckdb_round_even is a bit-exact replica of DuckDB's
    round_even macro — pinned against the live engine, not a fixture."""
    import duckdb

    from bluegraph_ray.util import duckdb_round_even

    want = duckdb.sql(
        "SELECT round_even(?::DOUBLE, 6)", params=[float(x)]).fetchone()[0]
    got = duckdb_round_even(np.array([x]))[0]
    assert got == want, (x, got, want)


@given(y=st.floats(min_value=-1e12, max_value=1e12,
                   allow_nan=False, allow_infinity=False))
@settings(max_examples=300, deadline=None)
def test_round_half_away_matches_duckdb_round0(y):
    import duckdb

    from bluegraph_ray.util import round_half_away

    want = duckdb.sql("SELECT round(?::DOUBLE, 0)",
                      params=[float(y)]).fetchone()[0]
    got = round_half_away(np.array([y]))[0]
    assert got == want, (y, got, want)
