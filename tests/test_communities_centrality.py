"""Community dispatch, closeness/betweenness, link-prediction utilities vs
NetworkX oracles."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import ray.data

from bluegraph_ray.pipelines import downstream
from bluegraph_ray.stages import centrality, communities


def karate():
    g = nx.karate_club_graph()
    df = pd.DataFrame([(f"n{u}", f"n{v}") for u, v in g.edges()], columns=["src", "dst"])
    gg = nx.Graph()
    gg.add_edges_from((f"n{u}", f"n{v}") for u, v in g.edges())
    return df, gg


def test_lpa_strategy_full_partition_and_positive_modularity():
    df, g = karate()
    ds = ray.data.from_pandas(df)
    part = communities.detect_communities(ds, strategy="lpa", n_partitions=4)
    assert set(part) == set(g.nodes)
    q = communities.evaluate_partition(ds, part, metric="modularity")
    # LPA on karate should find real structure (reference tests assert only a
    # full partition; we additionally require non-negative modularity)
    assert q >= 0.0
    cov = communities.evaluate_partition(ds, part, metric="coverage")
    perf = communities.evaluate_partition(ds, part, metric="performance")
    assert 0 <= cov <= 1 and 0 <= perf <= 1


def test_louvain_karate_exactly_four_communities():
    """The reference's louvain oracle: exactly 4 communities covering all 34
    karate nodes (/root/reference/tests/analyse/test_communities.py:31-36)."""
    df, g = karate()
    ds = ray.data.from_pandas(df)
    part = communities.detect_communities(ds, strategy="louvain", n_partitions=4)
    assert set(part) == set(g.nodes)  # full coverage
    assert len(set(part.values())) == 4
    q = communities.evaluate_partition(ds, part, metric="modularity")
    assert q > 0.4


def test_girvan_newman_two_communities():
    # two triangles joined by one bridge — GN must cut the bridge
    rows = [("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    ds = ray.data.from_pandas(pd.DataFrame(rows, columns=["src", "dst"]))
    part = communities.detect_communities(ds, strategy="girvan-newman",
                                          n_communities=2, n_partitions=2)
    sets = communities.partition_to_sets(part)
    assert sorted(map(sorted, sets)) == [["a", "b", "c"], ["x", "y", "z"]]


def test_unknown_strategies_raise():
    df, _ = karate()
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError):
        communities.detect_communities(ds, strategy="sbm")
    with pytest.raises(ValueError):
        communities.detect_communities(ds, strategy="nope")


def test_closeness_matches_nx():
    df, g = karate()
    out = centrality.closeness_centrality(ray.data.from_pandas(df)).to_pandas()
    want = nx.closeness_centrality(g)
    got = dict(zip(out["node"], out["closeness"]))
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_betweenness_matches_nx():
    df, g = karate()
    out = centrality.betweenness_centrality(ray.data.from_pandas(df)).to_pandas()
    want = nx.betweenness_centrality(g, normalized=True)
    got = dict(zip(out["node"], out["betweenness"]))
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_negative_sampling_and_edge_predictor():
    df, g = karate()
    ds = ray.data.from_pandas(df)
    neg = downstream.generate_negative_edges(ds, n_samples=78, seed=3)
    assert len(neg) == 78
    eset = {frozenset(e) for e in g.edges}
    for r in neg.itertuples():
        assert frozenset((r.src, r.dst)) not in eset
        assert r.src != r.dst

    # embeddings: one-hot-ish adjacency rows — enough signal to separate
    nodes = sorted(g.nodes)
    A = nx.to_numpy_array(g, nodelist=nodes)
    emb = {n: A[i] for i, n in enumerate(nodes)}
    pred = downstream.EdgePredictor(operator="average", seed=1)
    pred.fit(emb, df, neg)
    acc_pos = pred.predict(emb, df).mean()
    acc_neg = 1 - pred.predict(emb, neg).mean()
    assert (acc_pos + acc_neg) / 2 > 0.7  # clearly better than chance

    with pytest.raises(ValueError):
        downstream.edge_features(emb, df, operator="bogus")
