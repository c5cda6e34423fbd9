"""Path search + graph metrics vs the reference's exact fixtures.

F3 weighted path graph (/root/reference/tests/conftest.py:106-121) with the
expected paths/MST from /root/reference/tests/analyse/test_paths.py:36-232;
modularity/coverage/performance vs NetworkX implementations on karate.
"""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import ray.data

from bluegraph_ray.stages import metrics, paths


@pytest.fixture(scope="module")
def f3_edges() -> pd.DataFrame:
    rows = [
        ("B", "A", 2.0), ("A", "C", 4.0), ("A", "D", 8.0), ("A", "E", 2.0),
        ("B", "D", 2.0), ("C", "B", 3.0), ("C", "E", 4.0), ("E", "D", 3.0),
    ]
    return pd.DataFrame(rows, columns=["src", "dst", "distance"])


def test_shortest_path_undirected(f3_edges):
    # undirected: A-B(2)-D(2)=4 beats A-E(2)-D(3)=5; directed: B->A blocks A->B
    assert paths.shortest_path(f3_edges, "A", "D") in {("A", "D"),}
    assert paths.shortest_path(f3_edges, "A", "D", distance="distance") == ("A", "B", "D")
    assert paths.shortest_path(f3_edges, "A", "D", distance="distance",
                               directed=True) == ("A", "E", "D")
    assert paths.shortest_path(f3_edges, "A", "D", distance="distance",
                               exclude_edge=True) == ("A", "B", "D")
    with pytest.raises(ValueError):
        paths.shortest_path(pd.DataFrame({"src": ["X"], "dst": ["Y"]}), "X", "Z")


def test_all_and_n_shortest(f3_edges):
    allp = paths.all_shortest_paths(f3_edges, "A", "B")
    assert set(allp) == {("A", "B")} or ("A", "B") in allp
    top2 = paths.n_shortest_paths(f3_edges, "A", "D", 2, distance="distance",
                                  strategy="yen")
    assert top2[0] == ("A", "B", "D")
    # reference oracle (/root/reference/tests/analyse/test_paths.py:85-103):
    # naive = all direct-edge-excluded unweighted shortest paths ranked by
    # distance, plus the direct path added back when exclude_edge=False
    naive = paths.n_shortest_paths(f3_edges, "A", "D", 3, distance="distance",
                                   strategy="naive")
    assert set(naive) == {("A", "B", "D"), ("A", "E", "D"), ("A", "D")}
    assert naive[0] == ("A", "B", "D")
    naive4 = paths.n_shortest_paths(f3_edges, "A", "D", 4, distance="distance",
                                    strategy="naive")
    assert set(naive4) == {("A", "B", "D"), ("A", "E", "D"), ("A", "D")}
    ex = paths.n_shortest_paths(f3_edges, "A", "D", 3, distance="distance",
                                exclude_edge=True)
    assert set(ex) == {("A", "B", "D"), ("A", "E", "D")}
    yen4 = paths.n_shortest_paths(f3_edges, "A", "D", 4, distance="distance",
                                  strategy="yen", exclude_edge=True)
    assert set(yen4) == {("A", "C", "B", "D"), ("A", "B", "D"),
                         ("A", "E", "D"), ("A", "E", "C", "B", "D")}


def test_n_nested_and_n_tripaths_reference_oracle(f3_edges):
    """Exact counts/sets from /root/reference/tests/analyse/test_paths.py:120-190."""
    r = paths.n_nested_shortest_paths(f3_edges, "A", "B", top_level_n=5,
                                      nested_n=3, depth=2,
                                      distance="distance", exclude_edge=True)
    assert len(r) == 8
    r = paths.n_nested_shortest_paths(f3_edges, "A", "B", top_level_n=3,
                                      nested_n=2, depth=2, strategy="yen",
                                      distance="distance", exclude_edge=True)
    assert len(r) == 15

    a_b, b_d = paths.n_shortest_tripaths(f3_edges, "A", "B", "D", 3,
                                         distance="distance")
    assert set(a_b) == {("A", "B"), ("A", "C", "B"), ("A", "D", "B")}
    assert set(b_d) == {("B", "D"), ("B", "A", "D")}
    a_b, b_d = paths.n_shortest_tripaths(f3_edges, "A", "B", "D", 3,
                                         distance="distance",
                                         exclude_edge=True)
    assert set(a_b) == {("A", "C", "B"), ("A", "D", "B")}
    assert set(b_d) == {("B", "A", "D")}
    a_b, b_d = paths.n_shortest_tripaths(f3_edges, "A", "B", "D", 3,
                                         distance="distance",
                                         exclude_edge=True, overlap=False)
    assert set(a_b) == {("A", "C", "B"), ("A", "D", "B")}
    assert set(b_d) == {("B", "A", "D")}
    a_b, b_d = paths.n_shortest_tripaths(f3_edges, "A", "B", "D", 3,
                                         strategy="yen", distance="distance")
    assert set(a_b) == {("A", "B"), ("A", "C", "B"), ("A", "E", "D", "B")}
    assert set(b_d) == {("B", "D"), ("B", "A", "E", "D"), ("B", "C", "E", "D")}
    a_b, b_d = paths.n_shortest_tripaths(f3_edges, "A", "B", "D", 3,
                                         strategy="yen", distance="distance",
                                         overlap=False)
    assert set(a_b) == {("A", "B"), ("A", "C", "B"), ("A", "E", "D", "B")}
    assert set(b_d) == {("B", "D"), ("B", "A", "D")}


def test_nested_and_disjoint_tripath(f3_edges):
    nested = paths.nested_shortest_path(f3_edges, "A", "D", depth=2,
                                        distance="distance")
    assert nested[0] == "A" and nested[-1] == "D"
    assert len(nested) > 3  # consecutive pairs expanded into sub-paths
    p1, p2 = paths.shortest_tripath(f3_edges, "C", "B", "D", distance="distance",
                                    overlap=False)
    assert p1 == ("C", "B") and p2 == ("B", "D")


def test_tripath_disjoint(f3_edges):
    p1, p2 = paths.shortest_tripath(f3_edges, "C", "B", "D", distance="distance",
                                    overlap=True)
    assert p1 == ("C", "B") and p2[0] == "B" and p2[-1] == "D"


def test_mst_matches_reference_fixture(f3_edges):
    ds = ray.data.from_pandas(f3_edges)
    tree = paths.minimum_spanning_tree(ds, distance="distance")
    got = {frozenset((r.src, r.dst)) for r in tree.itertuples()}
    want = {frozenset(p) for p in [("A", "E"), ("A", "B"), ("B", "C"), ("B", "D")]}
    assert got == want


def test_top_neighbors(f3_edges):
    out = paths.top_neighbors(f3_edges, "A", 2, weight="distance")
    assert list(out) == ["D", "C"]  # heaviest incident first


def karate_df():
    g = nx.karate_club_graph()
    return (
        pd.DataFrame([(f"n{u}", f"n{v}") for u, v in g.edges()], columns=["src", "dst"]),
        g,
    )


def test_density():
    df, g = karate_df()
    assert metrics.density(ray.data.from_pandas(df)) == pytest.approx(nx.density(g))


def test_degree_assortativity_matches_nx():
    df, g = karate_df()
    got = metrics.degree_assortativity(ray.data.from_pandas(df))
    want = nx.degree_assortativity_coefficient(g)
    assert got == pytest.approx(want, abs=1e-9)

    rng = np.random.default_rng(9)
    rows = [(f"v{i}", f"v{int(j)}") for i in range(50)
            for j in rng.choice(50, 3, replace=False) if int(j) != i]
    df2 = pd.DataFrame(rows, columns=["src", "dst"]).drop_duplicates()
    # canonicalize to a simple undirected edge set
    df2 = pd.DataFrame({
        "src": np.minimum(df2["src"], df2["dst"]),
        "dst": np.maximum(df2["src"], df2["dst"]),
    }).drop_duplicates()
    g2 = nx.from_pandas_edgelist(df2, "src", "dst")
    got2 = metrics.degree_assortativity(ray.data.from_pandas(df2))
    assert got2 == pytest.approx(nx.degree_assortativity_coefficient(g2), abs=1e-9)


def test_rich_club_matches_nx():
    df, g = karate_df()
    out = metrics.rich_club_coefficient(ray.data.from_pandas(df),
                                        ks=[1, 2, 3, 5, 8])
    want = nx.rich_club_coefficient(g, normalized=False)
    got = dict(zip(out["k"], out["rich_club"]))
    for k in (1, 2, 3, 5, 8):
        if k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_modularity_coverage_performance_vs_nx():
    df, g = karate_df()
    # ground-truth 2-way split by club attribute
    part = {f"n{v}": g.nodes[v]["club"] for v in g.nodes}
    comms = [
        {v for v in g.nodes if g.nodes[v]["club"] == c}
        for c in ("Mr. Hi", "Officer")
    ]
    ds = ray.data.from_pandas(df)
    got_q = metrics.modularity(df, part)
    want_q = nx.community.modularity(g, comms, weight=None)  # our df is unweighted
    assert got_q == pytest.approx(want_q, abs=1e-9)

    got_cov = metrics.coverage(ds, part)
    got_perf = metrics.performance(ds, part)
    want_cov, want_perf = nx.community.partition_quality(g, comms)
    assert got_cov == pytest.approx(want_cov, abs=1e-9)
    assert got_perf == pytest.approx(want_perf, abs=1e-9)


def test_path_set_utilities(f3_edges):
    """graph_elements_from_paths / subgraph_from_paths semi-join /
    pretty-print renderings (reference core/analyse/paths.py:24-93)."""
    ps = [("A", "B", "D"), ("A", "E", "D")]
    nodes, edges = paths.graph_elements_from_paths(ps)
    assert nodes == {"A", "B", "D", "E"}
    assert edges == {("A", "B"), ("B", "D"), ("A", "E"), ("E", "D")}

    sub = paths.subgraph_from_paths(f3_edges, ps)
    got = {frozenset((r.src, r.dst)) for r in sub.itertuples()}
    assert got == {frozenset(e) for e in edges}
    # Dataset path agrees
    sub_ds = paths.subgraph_from_paths(ray.data.from_pandas(f3_edges), ps).to_pandas()
    assert {frozenset((r.src, r.dst)) for r in sub_ds.itertuples()} == got

    txt = paths.pretty_print_paths(ps, as_repr=True)
    head = txt.splitlines()[0]
    assert head.startswith("A <-> ") and head.endswith("<-> D")
    assert "B" in txt and "E" in txt

    tri = paths.pretty_print_tripaths(
        "A", "B", "D", 2, [("A", "C", "B")], [("B", "E", "D")], as_repr=True)
    assert tri.splitlines()[0].startswith("A ->")
    assert "C" in tri and "E" in tri
