"""Graph stages vs NetworkX oracles (the reference's backend,
/root/reference/bluegraph/backends/networkx/analyse/metrics.py).

- PageRank: per-vertex allclose 1e-6 (weighted + unweighted, karate + seeded
  random graphs, with dangling/disconnected structure)
- degree: exact (nx raw degree semantics)
- connected components: exact agreement
- LPA: full-partition + internal-connectivity sanity (the reference's own
  tests assert only partition shape, tests/analyse/test_communities.py:108-114)
- triangles: exact per-vertex counts vs nx.triangles
- checkpoint/resume: resumed run bitwise-equals fresh run
"""

from __future__ import annotations

import numpy as np
import networkx as nx
import pandas as pd
import pytest

import ray
import ray.data

from bluegraph_ray.stages.build import build_graph, make_partition_actors
from bluegraph_ray.stages.components import connected_components
from bluegraph_ray.stages.degree import degree_centrality
from bluegraph_ray.stages.lpa import label_propagation_communities
from bluegraph_ray.stages.pagerank import pagerank
from bluegraph_ray.stages.triangles import triangle_counts

# networkx 3.6's nx.pagerank requires scipy (absent here); the pure-python
# implementation has identical semantics and serves as the oracle.
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

def nx_pagerank(g, **kw):
    return _pagerank_python(g, **kw)


def karate_edges() -> pd.DataFrame:
    g = nx.karate_club_graph()
    return pd.DataFrame([(f"n{u}", f"n{v}") for u, v in g.edges()], columns=["src", "dst"])


def random_graph(seed=5, n=60, p=0.08, weighted=True):
    """Seeded random_pgframe analog (/root/reference/tests/conftest.py:44-88)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                w = float(np.clip(rng.normal(0.5, 0.5), 0.05, 1.0))
                rows.append((f"v{i:03d}", f"v{j:03d}", w))
    return pd.DataFrame(rows, columns=["src", "dst", "mi"])


def to_nx(df, weight=None):
    g = nx.Graph()
    for r in df.itertuples():
        g.add_edge(r.src, r.dst, **({weight: getattr(r, weight)} if weight else {}))
    return g


@pytest.fixture(scope="module")
def karate_handle(tmp_path_factory):
    df = karate_edges()
    return df, build_graph(
        ray.data.from_pandas(df), directed=False, n_partitions=4,
        path=str(tmp_path_factory.mktemp("karate")),
    )


def test_pagerank_karate_unweighted(karate_handle):
    df, handle = karate_handle
    res = pagerank(handle)
    assert res.converged
    want = nx_pagerank(to_nx(df), alpha=0.85, tol=1e-6)
    got = res.as_dict(handle)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_pagerank_weighted_random_graph(tmp_path):
    df = random_graph(seed=11)
    handle = build_graph(
        ray.data.from_pandas(df), weight="mi", directed=False,
        n_partitions=5, path=str(tmp_path / "g"),
    )
    res = pagerank(handle)
    want = nx_pagerank(to_nx(df, weight="mi"), alpha=0.85, tol=1e-6, weight="mi")
    got = res.as_dict(handle)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_personalized_pagerank_matches_nx(karate_handle, tmp_path):
    df, handle = karate_handle
    names = list(handle.names)
    seeds = [names.index("n0"), names.index("n33")]
    res = pagerank(handle, personalization=seeds)
    assert res.converged
    want = nx_pagerank(
        to_nx(df), alpha=0.85, tol=1e-6,
        personalization={"n0": 0.5, "n33": 0.5})
    got = res.as_dict(handle)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)

    # directed with dangling sinks: dangling mass must follow the teleport
    rows = [("a0", "a1"), ("a1", "a2"), ("a2", "a0"), ("a1", "sink")]
    ddf = pd.DataFrame(rows, columns=["src", "dst"])
    dh = build_graph(ray.data.from_pandas(ddf), directed=True,
                     n_partitions=2, path=str(tmp_path / "pprd"))
    dseeds = [list(dh.names).index("a0")]
    dres = pagerank(dh, personalization=dseeds)
    dwant = nx_pagerank(
        nx.from_pandas_edgelist(ddf, "src", "dst", create_using=nx.DiGraph),
        personalization={"a0": 1.0})
    dgot = dres.as_dict(dh)
    for k in dwant:
        assert dgot[k] == pytest.approx(dwant[k], abs=1e-6)

    # dense float vector spec == equivalent seed list
    p = np.zeros(handle.n)
    p[seeds[0]] = 2.0
    p[seeds[1]] = 2.0
    res2 = pagerank(handle, personalization=p)
    assert np.allclose(res.values, res2.values, atol=0)


def test_pagerank_directed_with_dangling(tmp_path):
    rng = np.random.default_rng(3)
    rows = [(f"a{i}", f"a{rng.integers(0, 40)}") for i in range(40)]
    rows += [("a0", "sink1"), ("a5", "sink2")]  # dangling sinks
    df = pd.DataFrame(rows, columns=["src", "dst"]).drop_duplicates()
    df = df[df.src != df.dst]
    handle = build_graph(
        ray.data.from_pandas(df), directed=True, n_partitions=3, path=str(tmp_path / "d"),
    )
    res = pagerank(handle)
    want = nx_pagerank(nx.from_pandas_edgelist(df, "src", "dst", create_using=nx.DiGraph))
    got = res.as_dict(handle)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_degree_matches_nx(karate_handle):
    df, _ = karate_handle
    out = degree_centrality(ray.data.from_pandas(df)).to_pandas()
    want = dict(to_nx(df).degree())
    got = dict(zip(out["node"], out["degree"]))
    assert got == want

    wdf = random_graph(seed=9)
    out = degree_centrality(ray.data.from_pandas(wdf), weight="mi").to_pandas()
    want = dict(to_nx(wdf, weight="mi").degree(weight="mi"))
    got = dict(zip(out["node"], out["degree"]))
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_connected_components_exact(tmp_path):
    # several components incl. singletons-with-selfloop-free isolated pairs
    rng = np.random.default_rng(8)
    rows = []
    for c in range(5):
        nodes = [f"c{c}_{i}" for i in range(rng.integers(2, 12))]
        for i in range(len(nodes) - 1):
            rows.append((nodes[i], nodes[i + 1]))
        for _ in range(3):
            i, j = rng.integers(0, len(nodes), 2)
            if i != j:
                rows.append((nodes[i], nodes[j]))
    df = pd.DataFrame(rows, columns=["src", "dst"]).drop_duplicates()
    handle = build_graph(
        ray.data.from_pandas(df), directed=False, n_partitions=4, path=str(tmp_path / "cc"),
    )
    res = connected_components(handle)
    assert res.converged
    labels = {name: lab for name, lab in zip(handle.names, res.values)}
    nx_comps = list(nx.connected_components(to_nx(df)))
    # exact agreement: same partition of vertices
    ours: dict = {}
    for name, lab in labels.items():
        ours.setdefault(lab, set()).add(name)
    assert sorted(map(sorted, ours.values())) == sorted(map(sorted, nx_comps))


def test_lpa_full_partition_karate(karate_handle):
    df, handle = karate_handle
    res = label_propagation_communities(handle)
    labels = res.values
    assert len(labels) == handle.n  # full partition: every vertex labelled
    # each community induces a connected subgraph
    g = to_nx(df)
    for lab in np.unique(labels):
        members = [str(handle.names[i]) for i in np.flatnonzero(labels == lab)]
        assert nx.is_connected(g.subgraph(members))


def test_triangles_exact(karate_handle):
    df, _ = karate_handle
    out = triangle_counts(ray.data.from_pandas(df)).to_pandas()
    want = nx.triangles(to_nx(df))
    got = dict(zip(out["node"], out["triangles"]))
    for k, v in want.items():
        assert got.get(k, 0) == v

    rdf = random_graph(seed=21, n=80, p=0.1)
    out = triangle_counts(ray.data.from_pandas(rdf)).to_pandas()
    want = nx.triangles(to_nx(rdf))
    got = dict(zip(out["node"], out["triangles"]))
    for k, v in want.items():
        assert got.get(k, 0) == v


def test_contract_graph_and_ego_network(karate_handle):
    from bluegraph_ray.stages.contract import contract_graph, ego_network

    df, handle = karate_handle
    g = to_nx(df)
    # contract by a simple 2-block partition
    labels = {n: ("blk0" if int(n[1:]) < 17 else "blk1") for n in g.nodes}
    out = contract_graph(ray.data.from_pandas(df), labels).to_pandas()
    got = {(r.cu, r.cv): (r.weight, r.n_edges) for r in out.itertuples()}
    want: dict = {}
    for u, v in g.edges:
        key = tuple(sorted((labels[u], labels[v])))
        w, n = want.get(key, (0.0, 0))
        want[key] = (w + 1.0, n + 1)
    assert got == want

    # ego networks match nx.ego_graph at radii 1 and 2
    names = list(handle.names)
    for radius in (1, 2):
        eg = ego_network(handle, ray.data.from_pandas(df),
                         names.index("n5"), radius=radius).to_pandas()
        want_g = nx.ego_graph(g, "n5", radius=radius)
        got_edges = {frozenset((r.src, r.dst)) for r in eg.itertuples()}
        want_edges = {frozenset(e) for e in want_g.edges}
        assert got_edges == want_edges


def test_contract_graph_partial_labels(karate_handle):
    from bluegraph_ray.stages.contract import contract_graph

    df, _ = karate_handle
    g = to_nx(df)
    labels = {n: ("blk0" if int(n[1:]) < 17 else "blk1") for n in g.nodes}
    partial = dict(list(labels.items())[:-3])  # drop 3 vertices

    with pytest.raises(Exception) as ei:  # surfaces via ray's UserCodeError
        contract_graph(ray.data.from_pandas(df), partial).to_pandas()
    assert "missing from labels" in str(ei.value)

    # drop_unlabeled keeps exactly the fully-labeled edges
    out = contract_graph(ray.data.from_pandas(df), partial,
                         drop_unlabeled=True).to_pandas()
    want: dict = {}
    for u, v in g.edges:
        if u in partial and v in partial:
            key = tuple(sorted((partial[u], partial[v])))
            w, n = want.get(key, (0.0, 0))
            want[key] = (w + 1.0, n + 1)
    got = {(r.cu, r.cv): (r.weight, r.n_edges) for r in out.itertuples()}
    assert got == want


def test_teleport_vector_validation():
    from bluegraph_ray.stages.pagerank import _teleport_vector

    n = 10
    # integer arrays are ALWAYS seed lists, even length-n ones
    p = _teleport_vector(n, np.arange(n))
    assert np.allclose(p, 1.0 / n)
    # explicit dict forms
    assert np.allclose(_teleport_vector(n, {"seeds": [3]})[3], 1.0)
    w = np.zeros(n); w[2] = 4.0
    assert np.allclose(_teleport_vector(n, {"weights": w})[2], 1.0)
    # float seed-id list (not length n) must raise, not be read as weights
    with pytest.raises(ValueError, match="ambiguous"):
        _teleport_vector(n, np.array([1.0, 2.0, 3.0]))
    # out-of-range seed ids must raise, not scatter into garbage
    with pytest.raises(ValueError, match="out of range"):
        _teleport_vector(n, [n + 5])
    with pytest.raises(ValueError, match="out of range"):
        _teleport_vector(n, {"seeds": [-1]})
    # wrong-shaped explicit weights must raise
    with pytest.raises(ValueError, match="shape"):
        _teleport_vector(n, {"weights": np.ones(n - 1)})


def test_maximal_matching(karate_handle):
    from bluegraph_ray.stages.matching import maximal_matching

    df, _ = karate_handle
    g = to_nx(df)
    out = maximal_matching(ray.data.from_pandas(df))
    pairs = [(r.u, r.v) for r in out.itertuples()]
    used: set = set()
    for u, v in pairs:
        assert g.has_edge(u, v)
        assert u not in used and v not in used  # a valid matching
        used.update((u, v))
    # maximality: every edge touches a matched vertex
    for u, v in g.edges:
        assert u in used or v in used

    # deterministic across block layouts
    out2 = maximal_matching(ray.data.from_pandas(df).repartition(7))
    assert sorted(pairs) == sorted((r.u, r.v) for r in out2.itertuples())

    # integer-named graph (the oracle's hash domain)
    idf = pd.DataFrame([(i, (i * 3 + 1) % 40) for i in range(40)],
                       columns=["src", "dst"])
    idf = idf[idf.src != idf.dst]
    g2 = nx.from_pandas_edgelist(idf, "src", "dst")
    m2 = maximal_matching(ray.data.from_pandas(idf))
    used2: set = set()
    for r in m2.itertuples():
        assert g2.has_edge(r.u, r.v) and r.u not in used2 and r.v not in used2
        used2.update((r.u, r.v))
    for u, v in g2.edges:
        assert u in used2 or v in used2


def test_maximal_independent_set(karate_handle, tmp_path):
    from bluegraph_ray.stages.mis import maximal_independent_set

    df, handle = karate_handle
    g = to_nx(df)
    res = maximal_independent_set(handle)
    assert res.converged
    mis = {n for n, m in zip(handle.names, res.values) if m > 0}
    # independence: no two members adjacent
    for u in mis:
        assert not any(v in mis for v in g.neighbors(u))
    # maximality: every outsider has a member neighbour
    for u in set(g.nodes) - mis:
        assert any(v in mis for v in g.neighbors(u))

    # bitwise identical across partition layouts
    h2 = build_graph(ray.data.from_pandas(df), directed=False,
                     n_partitions=2, path=str(tmp_path / "mis2"))
    res2 = maximal_independent_set(h2)
    assert np.array_equal(res.values, res2.values)

    # integer-named graph (the oracle's hash domain)
    idf = pd.DataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(50)], columns=["src", "dst"])
    idf = idf[idf.src != idf.dst]
    h3 = build_graph(ray.data.from_pandas(idf), directed=False,
                     n_partitions=3, path=str(tmp_path / "mis3"))
    r3 = maximal_independent_set(h3)
    g3 = nx.from_pandas_edgelist(idf, "src", "dst")
    mis3 = {n for n, m in zip(h3.names, r3.values) if m > 0}
    for u in mis3:
        assert not any(v in mis3 for v in g3.neighbors(u))
    for u in set(g3.nodes) - mis3:
        assert any(v in mis3 for v in g3.neighbors(u))


def test_random_walks_valid_and_layout_invariant(karate_handle, tmp_path):
    from bluegraph_ray.stages.walks import random_walks

    df, handle = karate_handle
    g = to_nx(df)
    out = random_walks(handle, length=6, seed=3)
    assert len(out) == handle.n * 7
    # every consecutive hop is a real edge
    piv = out.pivot(index="walk_id", columns="step", values="node")
    for _, row in piv.iterrows():
        for t in range(6):
            assert g.has_edge(row[t], row[t + 1])
    # walks start where they claim to
    assert (piv[0] == piv.index).all()

    # bitwise identical across a different partition layout
    h2 = build_graph(ray.data.from_pandas(df), directed=False,
                     n_partitions=2, path=str(tmp_path / "w2"))
    out2 = random_walks(h2, length=6, seed=3)
    pd.testing.assert_frame_equal(
        out.sort_values(["walk_id", "step"]).reset_index(drop=True),
        out2.sort_values(["walk_id", "step"]).reset_index(drop=True))

    # different seeds give different corpora; transitions are spread out
    out3 = random_walks(handle, length=6, seed=4)
    assert not out.equals(out3)
    all_steps = out[out["step"] > 0]
    assert all_steps["node"].nunique() > handle.n // 3

    ddf = pd.DataFrame([("a", "b")], columns=["src", "dst"])
    dh = build_graph(ray.data.from_pandas(ddf), directed=True,
                     n_partitions=1, path=str(tmp_path / "wd"))
    with pytest.raises(ValueError):
        random_walks(dh)


def test_weighted_random_walks(karate_handle, tmp_path):
    from bluegraph_ray.stages.build import (_WALK_C1, _WALK_C2, _WALK_C3,
                                            _WALK_C4, build_graph)
    from bluegraph_ray.stages.walks import random_walks

    df, plain_handle = karate_handle
    # unit weights: the multiset path (rep=0 only) must be bitwise the
    # uniform hash-argmin path
    h1 = build_graph(ray.data.from_pandas(df.assign(w=1)), weight="w",
                     directed=False, n_partitions=3,
                     path=str(tmp_path / "wu"))
    uw = random_walks(h1, length=5, seed=3, weighted=True)
    plain = random_walks(plain_handle, length=5, seed=3)
    pd.testing.assert_frame_equal(
        uw.sort_values(["walk_id", "step"]).reset_index(drop=True),
        plain.sort_values(["walk_id", "step"]).reset_index(drop=True))

    # integer-weighted graph: exact local replay of the multiset rule
    wdf = df.copy()
    wdf["w"] = np.arange(len(wdf)) % 5 + 1
    wh = build_graph(ray.data.from_pandas(wdf), weight="w", directed=False,
                     n_partitions=3, path=str(tmp_path / "ww"))
    out = random_walks(wh, length=6, seed=5, weighted=True)

    names = np.asarray(wh.names)
    did = {v: i for i, v in enumerate(names)}
    adj: dict = {i: [] for i in range(wh.n)}
    for r in wdf.itertuples():
        adj[did[r.src]].append((did[r.dst], int(r.w)))
        adj[did[r.dst]].append((did[r.src], int(r.w)))

    def step_choice(wid, t, cur):
        best = None
        for u, w in adj[cur]:
            for rep in range(w):
                code = np.uint64(u) + (np.uint64(rep) << np.uint64(32))
                with np.errstate(over="ignore"):
                    h = ((np.uint64(wid) * _WALK_C1)
                         ^ (np.uint64(t + 5) * _WALK_C2)
                         ^ (code * _WALK_C3)) * _WALK_C4
                key = (int(h), u)
                if best is None or key < best:
                    best = key
        return best[1]

    piv = out.pivot(index="walk_id", columns="step", values="node")
    for name, row in piv.iterrows():
        cur = did[name]
        assert row[0] == name
        for t in range(1, 7):
            cur = step_choice(did[name], t, cur)
            assert row[t] == names[cur]

    # bitwise identical across a different partition layout
    wh2 = build_graph(ray.data.from_pandas(wdf), weight="w", directed=False,
                      n_partitions=2, path=str(tmp_path / "ww2"))
    out2 = random_walks(wh2, length=6, seed=5, weighted=True)
    pd.testing.assert_frame_equal(
        out.sort_values(["walk_id", "step"]).reset_index(drop=True),
        out2.sort_values(["walk_id", "step"]).reset_index(drop=True))


def test_node2vec_biased_walks(karate_handle, tmp_path):
    """p/q-biased second-order walks: p=q=1 must equal the weighted walk
    bitwise; (p=0.5, q=2) must match an independent per-step replay of the
    multiset rule with prev-aware multipliers; output must be invariant to
    the partition layout (the two-phase exchange is layout-free)."""
    from bluegraph_ray.stages.build import (_WALK_C1, _WALK_C2, _WALK_C3,
                                            _WALK_C4, build_graph)
    from bluegraph_ray.stages.walks import (_pq_multipliers, random_walks,
                                            random_walks_biased)

    assert _pq_multipliers(0.5, 2.0) == (4, 2, 1)
    assert _pq_multipliers(1.0, 1.0) == (1, 1, 1)
    assert _pq_multipliers(2.0, 0.25) == (1, 2, 8)

    df, _ = karate_handle
    wdf = df.copy()
    wdf["w"] = np.arange(len(wdf)) % 3 + 1
    wh = build_graph(ray.data.from_pandas(wdf), weight="w", directed=False,
                     n_partitions=3, path=str(tmp_path / "n2v"))

    # degenerate bias == plain weighted walk, bitwise
    neutral = random_walks_biased(wh, length=5, seed=5, p=1.0, q=1.0)
    weighted = random_walks(wh, length=5, seed=5, weighted=True)
    pd.testing.assert_frame_equal(
        neutral.sort_values(["walk_id", "step"]).reset_index(drop=True),
        weighted.sort_values(["walk_id", "step"]).reset_index(drop=True))

    # real bias vs brute-force second-order replay
    seed, length = 5, 6
    out = random_walks_biased(wh, length=length, seed=seed, p=0.5, q=2.0)
    m_ret, m_base, m_far = _pq_multipliers(0.5, 2.0)
    names = np.asarray(wh.names)
    did = {v: i for i, v in enumerate(names)}
    adj: dict = {i: [] for i in range(wh.n)}
    for r in wdf.itertuples():
        adj[did[r.src]].append((did[r.dst], int(r.w)))
        adj[did[r.dst]].append((did[r.src], int(r.w)))
    nbrs = {u: {v for v, _ in lst} for u, lst in adj.items()}

    def step_choice(wid, t, prev, cur):
        best = None
        for u, w in adj[cur]:
            if prev is None:
                m = 1
            elif u == prev:
                m = m_ret
            elif u in nbrs[prev]:
                m = m_base
            else:
                m = m_far
            for rep in range(w * m):
                code = np.uint64(u) + (np.uint64(rep) << np.uint64(32))
                with np.errstate(over="ignore"):
                    h = ((np.uint64(wid) * _WALK_C1)
                         ^ (np.uint64(t + seed) * _WALK_C2)
                         ^ (code * _WALK_C3)) * _WALK_C4
                key = (int(h), u)
                if best is None or key < best:
                    best = key
        return best[1]

    piv = out.pivot(index="walk_id", columns="step", values="node")
    for name, row in piv.iterrows():
        prev, cur = None, did[name]
        assert row[0] == name
        for t in range(1, length + 1):
            prev, cur = cur, step_choice(did[name], t, prev, cur)
            assert row[t] == names[cur], (name, t)

    # layout invariance (single partition exercises the non-fan-out branch)
    for npart, tag in ((1, "n2v1"), (2, "n2v2")):
        wh2 = build_graph(ray.data.from_pandas(wdf), weight="w",
                          directed=False, n_partitions=npart,
                          path=str(tmp_path / tag))
        out2 = random_walks_biased(wh2, length=length, seed=seed,
                                   p=0.5, q=2.0)
        pd.testing.assert_frame_equal(
            out.sort_values(["walk_id", "step"]).reset_index(drop=True),
            out2.sort_values(["walk_id", "step"]).reset_index(drop=True))


def test_skipgram_pairs_match_bruteforce(karate_handle):
    from collections import Counter

    from bluegraph_ray.stages.walks import random_walks, skipgram_pairs

    _, handle = karate_handle
    walks = random_walks(handle, length=5, seed=11)
    out = skipgram_pairs(walks, window=2)
    got = {(r.center, r.context): r.n for r in out.itertuples()}

    want: Counter = Counter()
    for _, w in walks.pivot(index="walk_id", columns="step",
                            values="node").iterrows():
        seq = list(w)
        for i, c in enumerate(seq):
            for j in range(max(0, i - 2), min(len(seq), i + 3)):
                if j != i:
                    want[(c, seq[j])] += 1
    assert got == dict(want)
    # symmetric by construction
    for (c, x), v in got.items():
        assert got[(x, c)] == v


def test_walks_streaming_and_distributed_skipgrams(karate_handle, tmp_path):
    from bluegraph_ray.stages.walks import (random_walks, skipgram_pairs,
                                            skipgram_pairs_ds)

    _, handle = karate_handle
    mem = random_walks(handle, length=5, seed=11)
    # streamed-to-parquet variant returns the identical table
    ds = random_walks(handle, length=5, seed=11,
                      output_path=str(tmp_path / "wout"))
    streamed = ds.to_pandas()
    key = ["walk_id", "step"]
    pd.testing.assert_frame_equal(
        mem.sort_values(key).reset_index(drop=True),
        streamed.sort_values(key).reset_index(drop=True))

    # distributed skip-grams == in-memory skip-grams
    a = skipgram_pairs(mem, window=2)
    b = skipgram_pairs_ds(ds, window=2, num_buckets=4).to_pandas()
    ka = {(r.center, r.context): r.n for r in a.itertuples()}
    kb = {(r.center, r.context): r.n for r in b.itertuples()}
    assert ka == kb


def test_eigenvector_and_katz_match_nx(karate_handle, tmp_path):
    from bluegraph_ray.stages.spectral import (eigenvector_centrality,
                                               katz_centrality)

    df, handle = karate_handle
    g = to_nx(df)
    res = eigenvector_centrality(handle, tol=1e-10)
    assert res.converged
    want = nx.eigenvector_centrality(g, max_iter=5000, tol=1e-12)
    got = dict(zip(handle.names, res.values))
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-7)

    kres = katz_centrality(handle, alpha=0.05, tol=1e-12)
    assert kres.converged
    kwant = nx.katz_centrality(g, alpha=0.05, max_iter=5000, tol=1e-14)
    kgot = dict(zip(handle.names, kres.values))
    for k in kwant:
        assert kgot[k] == pytest.approx(kwant[k], abs=1e-8)

    # weighted eigenvector (nx reads the literal 'weight' attr when asked)
    rdf = random_graph(seed=47, n=40, p=0.15).rename(columns={"mi": "weight"})
    h2 = build_graph(ray.data.from_pandas(rdf), weight="weight",
                     directed=False, n_partitions=3,
                     path=str(tmp_path / "ev"))
    res2 = eigenvector_centrality(h2, tol=1e-10)
    want2 = nx.eigenvector_centrality(to_nx(rdf, weight="weight"),
                                      max_iter=5000, tol=1e-12,
                                      weight="weight")
    got2 = dict(zip(h2.names, res2.values))
    for k in want2:
        assert got2[k] == pytest.approx(want2[k], abs=1e-7)


def test_hits_matches_nx(karate_handle, tmp_path):
    # scipy is absent; nx's pure-python HITS has identical semantics
    from networkx.algorithms.link_analysis.hits_alg import _hits_python

    from bluegraph_ray.stages.hits import hits

    df, handle = karate_handle
    hub, auth = hits(handle, tol=1e-12)
    assert hub.converged
    wh, wa = _hits_python(to_nx(df), max_iter=1000, tol=1e-14)
    got_h = dict(zip(handle.names, hub.values))
    got_a = dict(zip(handle.names, auth.values))
    for k in wh:
        assert got_h[k] == pytest.approx(wh[k], abs=1e-8)
        assert got_a[k] == pytest.approx(wa[k], abs=1e-8)

    # weighted: nx reads the literal 'weight' attribute
    rdf = random_graph(seed=41, n=40, p=0.12).rename(columns={"mi": "weight"})
    h2 = build_graph(ray.data.from_pandas(rdf), weight="weight",
                     directed=False, n_partitions=3,
                     path=str(tmp_path / "hw"))
    hub2, auth2 = hits(h2, tol=1e-12)
    wh2, _ = _hits_python(to_nx(rdf, weight="weight"), max_iter=2000,
                          tol=1e-14)
    got2 = dict(zip(h2.names, hub2.values))
    for k in wh2:
        assert got2[k] == pytest.approx(wh2[k], abs=1e-8)

    # fixed-iteration replay runs exactly that many half-step pairs
    hub3, _ = hits(handle, iters=3)
    assert len(hub3.superstep_seconds) == 3

    # directed handles demand the transpose CSR
    ddf = pd.DataFrame([("a", "b"), ("b", "c")], columns=["src", "dst"])
    dh = build_graph(ray.data.from_pandas(ddf), directed=True,
                     n_partitions=2, path=str(tmp_path / "hd"))
    with pytest.raises(ValueError):
        hits(dh)


def test_link_prediction_scores_match_nx(karate_handle):
    from bluegraph_ray.stages.linkpred import link_prediction_scores

    df, _ = karate_handle
    g = to_nx(df)
    out = link_prediction_scores(ray.data.from_pandas(df)).to_pandas()
    # candidate space: non-adjacent pairs with >= 1 common neighbour
    cand = [(u, v) for u, v in nx.non_edges(g)
            if len(list(nx.common_neighbors(g, u, v)))]
    cand = {(min(u, v), max(u, v)) for u, v in cand}
    got = {(r.u, r.v): r for r in out.itertuples()}
    assert set(got) == cand
    jac = {(min(u, v), max(u, v)): s
           for u, v, s in nx.jaccard_coefficient(g, list(cand))}
    aa = {(min(u, v), max(u, v)): s
          for u, v, s in nx.adamic_adar_index(g, list(cand))}
    pa = {(min(u, v), max(u, v)): s
          for u, v, s in nx.preferential_attachment(g, list(cand))}
    for p in cand:
        assert got[p].cn == len(list(nx.common_neighbors(g, *p)))
        assert got[p].jaccard == pytest.approx(jac[p], abs=1e-12)
        assert got[p].adamic_adar == pytest.approx(aa[p], abs=1e-12)
        assert got[p].pref_attach == pa[p]
        du, dv = g.degree(p[0]), g.degree(p[1])
        assert got[p].salton == pytest.approx(
            got[p].cn / np.sqrt(du * dv), abs=1e-12)
        assert got[p].sorensen == pytest.approx(
            2 * got[p].cn / (du + dv), abs=1e-12)

    # include_edges=True also scores adjacent pairs
    out2 = link_prediction_scores(
        ray.data.from_pandas(df), include_edges=True).to_pandas()
    assert len(out2) > len(out)

    # join regime (degree table too big to broadcast): same exact result
    out3 = link_prediction_scores(
        ray.data.from_pandas(df), deg_broadcast_rows=0).to_pandas()
    got3 = {(r.u, r.v): r for r in out3.itertuples()}
    assert set(got3) == cand
    for p in cand:
        assert got3[p].jaccard == pytest.approx(jac[p], abs=1e-12)
        assert got3[p].adamic_adar == pytest.approx(aa[p], abs=1e-12)
        assert got3[p].pref_attach == pa[p]
    with pytest.raises(ValueError):
        link_prediction_scores(ray.data.from_pandas(df),
                               include_edges=True, deg_broadcast_rows=0)


def test_kcore_and_core_number_match_nx(karate_handle, tmp_path):
    from bluegraph_ray.stages.kcore import core_number, k_core

    df, handle = karate_handle
    g = to_nx(df)
    for k in (2, 3, 4):
        res = k_core(handle, k)
        assert res.converged
        got = {n for n, a in zip(handle.names, res.values) if a > 0}
        assert got == set(nx.k_core(g, k).nodes)

    cn = core_number(handle)
    want = nx.core_number(g)
    got = dict(zip(handle.names, cn.values))
    assert got == want

    rdf = random_graph(seed=33, n=70, p=0.09)
    h2 = build_graph(ray.data.from_pandas(rdf), directed=False,
                     n_partitions=4, path=str(tmp_path / "kc"))
    cn2 = core_number(h2)
    assert dict(zip(h2.names, cn2.values)) == nx.core_number(to_nx(rdf))

    # weighted handles peel identically: the alive-degree gather is
    # unit-weight regardless of the graph's weight column
    h3 = build_graph(ray.data.from_pandas(rdf), weight="mi", directed=False,
                     n_partitions=2, path=str(tmp_path / "kcw"))
    cn3 = core_number(h3)
    assert dict(zip(h3.names, cn3.values)) == nx.core_number(to_nx(rdf))


def test_edge_support_and_k_truss_match_nx(karate_handle):
    from bluegraph_ray.stages.triangles import k_truss

    df, _ = karate_handle
    g = to_nx(df)
    # per-edge triangle support == common-neighbour counts
    sup = triangle_counts(ray.data.from_pandas(df), per_edge=True).to_pandas()
    got = {(r.u, r.v): r.support for r in sup.itertuples()}
    for (u, v), s in got.items():
        assert s == len(list(nx.common_neighbors(g, u, v)))
    # every triangle-participating edge appears
    want_edges = {tuple(sorted(e)) for e in g.edges
                  if len(list(nx.common_neighbors(g, *e)))}
    assert set(got) == want_edges

    for k in (3, 4, 5):
        out = k_truss(ray.data.from_pandas(df), k).to_pandas()
        got_e = {tuple(sorted((r.u, r.v))) for r in out.itertuples()}
        want_e = {tuple(sorted(e)) for e in nx.k_truss(g, k).edges}
        assert got_e == want_e, k

    rdf = random_graph(seed=51, n=60, p=0.15)
    out = k_truss(ray.data.from_pandas(rdf), 4).to_pandas()
    got_e = {tuple(sorted((r.u, r.v))) for r in out.itertuples()}
    want_e = {tuple(sorted(e)) for e in nx.k_truss(to_nx(rdf), 4).edges}
    assert got_e == want_e


def test_clustering_coefficient_exact(karate_handle):
    from bluegraph_ray.stages.triangles import clustering_coefficient

    df, _ = karate_handle
    out = clustering_coefficient(ray.data.from_pandas(df)).to_pandas()
    want = nx.clustering(to_nx(df))
    got = dict(zip(out["node"], out["clustering"]))
    assert set(got) == set(want)  # zero-triangle vertices included
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)

    rdf = random_graph(seed=29, n=70, p=0.08)
    out = clustering_coefficient(ray.data.from_pandas(rdf)).to_pandas()
    want = nx.clustering(to_nx(rdf))
    got = dict(zip(out["node"], out["clustering"]))
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_pagerank_checkpoint_resume_bitwise(tmp_path):
    df = random_graph(seed=17)
    handle = build_graph(
        ray.data.from_pandas(df), weight="mi", directed=False,
        n_partitions=4, path=str(tmp_path / "g"),
    )
    fresh = pagerank(handle, checkpoint_dir=str(tmp_path / "ck_a"), checkpoint_every=5)
    # simulate a crash at iteration 5: resume from the other checkpoint dir
    partial = pagerank(handle, max_iter=5, checkpoint_dir=str(tmp_path / "ck_b"),
                       checkpoint_every=5)
    assert not partial.converged
    resumed = pagerank(handle, checkpoint_dir=str(tmp_path / "ck_b"),
                       checkpoint_every=5, resume=True)
    assert resumed.converged and fresh.converged
    np.testing.assert_array_equal(fresh.values, resumed.values)  # bitwise
    assert resumed.iterations == fresh.iterations


def test_shm_exchange_bitwise_equals_plasma(karate_handle):
    """The node-local shared-segment superstep exchange must produce bitwise
    identical PageRank to the plasma broadcast path (same kernels, same
    order — stages/pagerank._ShmExchange)."""
    _, handle = karate_handle
    a = pagerank(handle, exchange="plasma")
    b = pagerank(handle, exchange="shm")
    np.testing.assert_array_equal(a.values, b.values)
    assert a.iterations == b.iterations


def test_mode_label_gather_chunked_equals_whole():
    """Dst-run-aligned chunking of the LPA mode-label kernel is exact."""
    from bluegraph_ray.stages.build import CsrPartition

    cls = CsrPartition.__ray_metadata__.modified_class

    class Fake:
        pass

    rng = np.random.default_rng(0)
    n, m = 300, 20000
    f = Fake()
    f.dst = np.sort(rng.integers(0, n, m))
    f.src = rng.integers(0, n, m)
    f.w = rng.integers(1, 5, m).astype(np.float64)
    change = np.flatnonzero(np.diff(f.dst)) + 1
    f.starts = np.concatenate(([0], change))
    f.uniq_dst = f.dst[f.starts]
    f._mode_label_chunk = cls._mode_label_chunk.__get__(f)
    labels = rng.integers(0, n, n).astype(np.int64)

    f._mode_chunk_arcs = 10 ** 9
    ids1, new1 = cls.mode_label_gather(f, labels)
    f._mode_chunk_arcs = 1000
    ids2, new2 = cls.mode_label_gather(f, labels)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_array_equal(new1, new2)


def test_gather_chunked_bitwise_equals_oneshot():
    """The cache-blocked PageRank gather (int32 src, f32-when-exact weights,
    run-aligned chunks) must reproduce the naive one-shot kernel bit for bit."""
    from bluegraph_ray.stages.build import _gather_chunks, gather_chunked

    rng = np.random.default_rng(11)
    n, arcs = 500, 40_000
    dst = np.sort(rng.integers(0, n, arcs))
    src = rng.integers(0, n, arcs)
    w = rng.integers(1, 90, arcs).astype(np.float64)  # integer frequencies
    xw = rng.random(n)
    change = np.flatnonzero(np.diff(dst)) + 1
    starts = np.concatenate(([0], change))
    uniq = dst[starts]

    want = np.zeros(n)
    vals = xw[src] * w
    want[uniq] = np.add.reduceat(vals, starts)

    for chunk_arcs in (7, 100, 4096, 10**9):
        chunks = _gather_chunks(starts, arcs, chunk_arcs=chunk_arcs)
        got = np.zeros(n)
        gather_chunked(xw, src.astype(np.int32), w.astype(np.float32),
                       starts, chunks, uniq, got, np.empty(arcs))
        assert (got == want).all(), f"chunk_arcs={chunk_arcs}"
        # chunk bounds must tile the run index space exactly
        assert chunks[0] == 0 and chunks[-1] == len(starts)
        assert (np.diff(chunks) > 0).all()


def test_bfs_hops_matches_nx(karate_handle, tmp_path):
    from bluegraph_ray.stages.sssp import bfs_hops

    df, handle = karate_handle
    names = list(handle.names)
    source = names.index("n0")
    res = bfs_hops(handle, source)
    assert res.converged
    want = nx.single_source_shortest_path_length(to_nx(df), "n0")
    got = {n: d for n, d in zip(handle.names, res.values) if np.isfinite(d)}
    assert got == {k: float(v) for k, v in want.items()}

    # disconnected graph: the other component stays at inf
    df2 = pd.DataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], columns=["src", "dst"])
    h2 = build_graph(ray.data.from_pandas(df2), directed=False,
                     n_partitions=2, path=str(tmp_path / "bfs2"))
    r2 = bfs_hops(h2, list(h2.names).index("a"))
    d2 = dict(zip(h2.names, r2.values))
    assert d2["c"] == 2.0 and np.isinf(d2["x"]) and np.isinf(d2["y"])


def test_pseudo_diameter(karate_handle, tmp_path):
    from bluegraph_ray.stages.sssp import pseudo_diameter

    df, handle = karate_handle
    g = to_nx(df)
    res = pseudo_diameter(handle)
    # lower bound on the true diameter, equal to the second sweep's ecc
    far_name = handle.names[res["far_node"]]
    assert res["pseudo_diameter"] == nx.eccentricity(g, far_name)
    assert res["pseudo_diameter"] <= nx.diameter(g)

    # exact on a path graph
    pdf = pd.DataFrame([(f"p{i:02d}", f"p{i+1:02d}") for i in range(9)],
                       columns=["src", "dst"])
    h2 = build_graph(ray.data.from_pandas(pdf), directed=False,
                     n_partitions=2, path=str(tmp_path / "diam"))
    assert pseudo_diameter(h2)["pseudo_diameter"] == 9


def test_sssp_weighted_matches_nx_dijkstra(tmp_path):
    from bluegraph_ray.stages.sssp import sssp

    df = random_graph(seed=17, n=50, p=0.1)
    handle = build_graph(ray.data.from_pandas(df), weight="mi",
                         directed=False, n_partitions=4,
                         path=str(tmp_path / "sssp"))
    names = list(handle.names)
    src = names[0]
    res = sssp(handle, 0, weighted=True)
    assert res.converged
    want = nx.single_source_dijkstra_path_length(
        to_nx(df, weight="mi"), src, weight="mi")
    got = {n: d for n, d in zip(handle.names, res.values) if np.isfinite(d)}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)

    # fixed-depth replay: iters=2 equals the first two relaxation rounds
    r2 = sssp(handle, 0, weighted=True, iters=2)
    assert len(r2.superstep_seconds) == 2
    full = sssp(handle, 0, weighted=True)
    assert np.all(r2.values >= full.values - 1e-15)


def test_deepwalk_embeddings_structure(karate_handle):
    from bluegraph_ray.pipelines.graphembed import deepwalk_embeddings

    df, handle = karate_handle
    g = to_nx(df)
    out = deepwalk_embeddings(handle, dimension=16, length=6, window=2)
    assert len(out) == handle.n
    mat = np.stack(out["embedding"].to_numpy())
    assert mat.shape == (handle.n, 16)
    # deterministic
    out2 = deepwalk_embeddings(handle, dimension=16, length=6, window=2)
    assert np.allclose(mat, np.stack(out2["embedding"].to_numpy()), atol=0)

    # structure: mean cosine similarity of adjacent pairs beats random pairs
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    pos = dict(zip(out["node"], range(len(out))))
    adj = [float(norm[pos[u]] @ norm[pos[v]]) for u, v in g.edges]
    rng = np.random.default_rng(0)
    nodes = list(g.nodes)
    rand = []
    for _ in range(300):
        u, v = rng.choice(nodes, 2, replace=False)
        if not g.has_edge(u, v):
            rand.append(float(norm[pos[u]] @ norm[pos[v]]))
    assert np.mean(adj) > np.mean(rand) + 0.1


def test_mat_gather_chunked_bitwise_equals_oneshot(tmp_path):
    """The cache-blocked matrix gather must reproduce the naive one-shot
    (arcs, d) kernel bit for bit, across d values that change the chunk
    budget."""
    df = random_graph(seed=23)
    handle = build_graph(ray.data.from_pandas(df), weight="mi",
                         directed=False, n_partitions=3,
                         path=str(tmp_path / "g"))
    actors = make_partition_actors(handle)
    try:
        rng = np.random.default_rng(4)
        for d in (1, 3, 32, 200):
            X = rng.random((handle.n, d))
            ref = ray.put(X)
            got = np.concatenate(
                ray.get([a.mat_gather.remote(ref) for a in actors]), axis=0)
            # naive replicate over the full arc table
            src, dst, w = handle_arcs(handle)
            want = np.zeros((handle.n, d))
            order = np.argsort(dst, kind="stable")
            s, t, ww = src[order], dst[order], w[order]
            ch = np.flatnonzero(np.diff(t)) + 1
            starts = np.concatenate(([0], ch))
            vals = X[s] * ww[:, None]
            want[t[starts]] = np.add.reduceat(vals, starts, axis=0)
            assert (got == want).all(), f"d={d}"
    finally:
        for a in actors:
            ray.kill(a)


def handle_arcs(handle):
    """All (src, dst, w) arcs of a built graph, read back from the buckets."""
    import os

    import pyarrow.parquet as pq

    srcs, dsts, ws = [], [], []
    for b in range(handle.n_partitions):
        pdir = f"{handle.path}/bucket={b}"
        if os.path.isdir(pdir):
            t = pq.read_table(pdir, columns=["src_id", "dst_id", "w"])
            srcs.append(t.column("src_id").to_numpy())
            dsts.append(t.column("dst_id").to_numpy())
            ws.append(t.column("w").to_numpy())
    return (np.concatenate(srcs), np.concatenate(dsts), np.concatenate(ws))


def test_seeded_label_spread_matches_bruteforce():
    from bluegraph_ray.stages.seeded import seeded_label_spread

    df = random_graph(seed=17, n=50, p=0.07)
    handle = build_graph(ray.data.from_pandas(df), weight="mi",
                         directed=False, n_partitions=4)
    names = list(handle.names)
    seed_ids = np.asarray([i for i, nm in enumerate(names)
                           if int(nm[1:]) % 10 == 0], dtype=np.int64)
    got = seeded_label_spread(handle, seed_ids, seed_ids, iterations=6)

    # brute-force synchronous non-sticky spec over the nx graph
    g = to_nx(df, weight="mi")
    lab = {nm: (i if i in set(seed_ids.tolist()) else -1)
           for i, nm in enumerate(names)}
    pin = {names[i]: i for i in seed_ids}
    for _ in range(6):
        new = {}
        for v in names:
            if v in pin:
                new[v] = pin[v]
                continue
            votes: dict = {}
            if v in g:
                for u in g.neighbors(v):
                    lu = lab[u]
                    if lu >= 0:
                        votes[lu] = votes.get(lu, 0.0) + g[v][u]["mi"]
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            else:
                new[v] = -1
        lab = new
    want = np.asarray([lab[nm] for nm in names], dtype=np.int64)
    assert (got == want).all()
    # seeds pinned, labeledness monotone vs a shorter run
    assert (got[seed_ids] == seed_ids).all()
    got4 = seeded_label_spread(handle, seed_ids, seed_ids, iterations=4)
    assert ((got4 < 0) | (got >= 0)).all()  # labeled at 4 -> labeled at 6
    with pytest.raises(ValueError):
        seeded_label_spread(handle, seed_ids, seed_ids + handle.n)


def test_jp_coloring_proper_and_deterministic():
    from bluegraph_ray.stages.coloring import jp_coloring

    df = random_graph(seed=23, n=60, p=0.1)
    handle = build_graph(ray.data.from_pandas(df), directed=False,
                         n_partitions=4)
    color = jp_coloring(handle, rounds=32)
    names = list(handle.names)
    idx = {nm: i for i, nm in enumerate(names)}
    # fully colored at this size, and PROPER: no edge joins equal colors
    assert (color > 0).all()
    for r in df.itertuples():
        assert color[idx[r.src]] != color[idx[r.dst]], (r.src, r.dst)
    # deterministic across partition layouts
    h2 = build_graph(ray.data.from_pandas(df), directed=False,
                     n_partitions=7)
    c2 = jp_coloring(h2, rounds=32)
    m = {nm: c for nm, c in zip(h2.names, c2)}
    assert all(m[nm] == color[i] for i, nm in enumerate(names))
    # fixed low round count leaves -1 leftovers, never improper colors
    c3 = jp_coloring(handle, rounds=2)
    assert (c3 >= -1).all() and (c3 <= 2).all()
    colored = c3 > 0
    for r in df.itertuples():
        i, j = idx[r.src], idx[r.dst]
        if colored[i] and colored[j]:
            assert c3[i] != c3[j]


def test_build_graph_distributed_ids_matches_driver_path(tmp_path):
    """The distributed-id build (no O(V) driver state) must produce the
    same GRAPH: per-name pagerank equal to the broadcast-names build, and
    decode via hash join instead of a driver vector."""
    import numpy as np
    import pandas as pd
    import ray

    from bluegraph_ray.stages.build import (build_graph,
                                            build_graph_distributed_ids,
                                            decode_ids, load_graph)
    from bluegraph_ray.stages.pagerank import pagerank

    rng = np.random.default_rng(11)
    n_names = 120
    names = np.array([f"v{i:04d}" for i in range(n_names)])
    e = pd.DataFrame({
        "src": names[rng.integers(0, n_names, 700)],
        "dst": names[rng.integers(0, n_names, 700)],
    })
    e = e[e.src != e.dst].drop_duplicates(["src", "dst"]).reset_index(drop=True)
    eds = ray.data.from_pandas(e)

    h_drv = build_graph(eds, directed=False, n_partitions=3,
                        path=str(tmp_path / "drv"))
    h_dst = build_graph_distributed_ids(
        eds, directed=False, n_partitions=3, path=str(tmp_path / "dist"),
        num_name_bins=8, num_buckets=8)

    assert h_dst.names is None          # the whole point: no driver vector
    assert h_dst.n == h_drv.n and h_dst.m == h_drv.m

    r_drv = pagerank(h_drv, tol=1e-10)
    r_dst = pagerank(h_dst, tol=1e-10)

    drv = pd.DataFrame({"name": h_drv.names, "pr": r_drv.values})
    ids = ray.data.from_pandas(pd.DataFrame({
        "id": np.arange(h_dst.n, dtype=np.int64), "pr_d": r_dst.values}))
    dec = decode_ids(h_dst, ids, "id", num_buckets=4).to_pandas() \
        .rename(columns={"id": "name"})
    both = drv.merge(dec, on="name")
    assert len(both) == h_drv.n
    assert np.allclose(both["pr"], both["pr_d"], atol=1e-9)

    # resume path: manifest round-trips the distributed layout
    h2 = load_graph(str(tmp_path / "dist"))
    assert h2.names is None and h2.names_path == h_dst.names_path
    assert h2.boundaries == h_dst.boundaries

    # driver-held API is refused loudly, not silently wrong
    import pytest
    with pytest.raises(ValueError, match="distributed ids"):
        h_dst.id_of("v0000")
    with pytest.raises(ValueError, match="distributed ids"):
        h_dst.names_of(np.array([0]))


def test_build_graph_driver_budget_routes_to_distributed_path(tmp_path):
    """The VERDICT-r4 acceptance verbatim: a graph whose name vector would
    exceed a configured driver budget refuses the driver-held build and
    passes with the distributed path."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from bluegraph_ray.stages.build import (build_graph,
                                            build_graph_distributed_ids)

    rng = np.random.default_rng(21)
    names = np.array([f"n{i:05d}" for i in range(300)])
    e = pd.DataFrame({"src": names[rng.integers(0, 300, 900)],
                      "dst": names[rng.integers(0, 300, 900)]})
    e = e[e.src != e.dst].drop_duplicates().reset_index(drop=True)
    eds = ray.data.from_pandas(e)

    with pytest.raises(ValueError, match="build_graph_distributed_ids"):
        build_graph(eds, n_partitions=2, path=str(tmp_path / "a"),
                    max_driver_names=100)

    h = build_graph_distributed_ids(eds, n_partitions=2,
                                    path=str(tmp_path / "b"),
                                    num_name_bins=8, num_buckets=8)
    assert h.names is None and h.n == len(
        np.unique(np.concatenate([e.src.to_numpy(), e.dst.to_numpy()])))
