"""From-scratch model-zoo embedders (the reference's gensim/stellargraph
slot): Poincaré hierarchy embeddings, and the KGE / feature-encoder family
added alongside them. Reference surfaces:
``backends/gensim/embed/embedders.py:30-93`` (poincare),
``backends/stellargraph/embed/embedders.py:49-57`` (node2vec, attri2vec,
graphsage, DGI, complex/distmult).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bluegraph_ray.pipelines.hyperbolic import (poincare_distance,
                                                poincare_embeddings)


def _tree_edges(branching=3, depth=3):
    """Balanced tree as (child -> parent) directed edges, string ids."""
    edges = []
    frontier = ["root"]
    for level in range(depth):
        nxt = []
        for parent in frontier:
            for i in range(branching):
                child = f"{parent}/{i}"
                edges.append((child, parent))
                nxt.append(child)
        frontier = nxt
    return pd.DataFrame(edges, columns=["src", "dst"])


def test_poincare_distance_formula():
    z = np.zeros(4)
    assert poincare_distance(z, z) == pytest.approx(0.0)
    u = np.array([0.3, 0.0, 0.0, 0.0])
    v = np.array([-0.4, 0.1, 0.0, 0.0])
    # hand formula
    num = 2 * np.sum((u - v) ** 2)
    den = (1 - u @ u) * (1 - v @ v)
    want = float(np.arccosh(1 + num / den))
    assert poincare_distance(u, v) == pytest.approx(want, rel=1e-12)
    assert poincare_distance(v, u) == pytest.approx(want, rel=1e-12)
    # broadcasting over a candidate axis
    x = np.stack([u, v, z])
    d = poincare_distance(u[None, :], x)
    assert d.shape == (3,)
    assert d[0] == pytest.approx(0.0)


def test_poincare_rejects_undirected():
    with pytest.raises(ValueError, match="directed"):
        poincare_embeddings(_tree_edges(), directed=False)


def test_poincare_max_nodes_guard():
    with pytest.raises(ValueError, match="max_nodes"):
        poincare_embeddings(_tree_edges(), max_nodes=3)


def test_poincare_deterministic_in_ball_and_reconstructs_tree():
    edges = _tree_edges(branching=3, depth=3)
    out = poincare_embeddings(edges, dimension=8, epochs=60, negative=8,
                              seed=3, batch_size=64)
    names = out["@id"].to_numpy()
    mat = np.stack(out["embedding"].to_numpy())
    n = len(names)
    assert n == 1 + 3 + 9 + 27
    assert sorted(names) == list(names)  # sorted, stable output order
    # open unit ball
    assert np.all(np.linalg.norm(mat, axis=1) < 1.0)
    # deterministic under the same seed, different under another
    out2 = poincare_embeddings(edges, dimension=8, epochs=60, negative=8,
                               seed=3, batch_size=64)
    assert np.array_equal(mat, np.stack(out2["embedding"].to_numpy()))
    out3 = poincare_embeddings(edges, dimension=8, epochs=60, negative=8,
                               seed=4, batch_size=64)
    assert not np.array_equal(mat, np.stack(out3["embedding"].to_numpy()))

    # reconstruction: for each edge (child, parent), rank of the true parent
    # under Poincaré distance among all other nodes (Nickel & Kiela's mean
    # rank metric) should beat the random baseline (~n/2) by a wide margin.
    pos = {name: i for i, name in enumerate(names)}
    ranks = []
    for child, parent in _tree_edges(3, 3).itertuples(index=False):
        u = mat[pos[child]]
        d = poincare_distance(u[None, :], mat)
        d[pos[child]] = np.inf
        ranks.append(int(np.sum(d < d[pos[parent]])) + 1)
    assert np.mean(ranks) < n / 4

    # hierarchy norm property: the root sits nearer the origin than leaves
    root_norm = np.linalg.norm(mat[pos["root"]])
    leaf_norms = [np.linalg.norm(mat[pos[nm]]) for nm in names
                  if nm.count("/") == 3]
    assert root_norm < np.mean(leaf_norms)


def test_poincare_dataset_input_path():
    import ray

    edges = _tree_edges(branching=2, depth=2)
    # duplicate rows on purpose: the Dataset path must dedupe distributed
    ds = ray.data.from_pandas(pd.concat([edges, edges], ignore_index=True))
    out = poincare_embeddings(ds, dimension=4, epochs=5, num_buckets=4)
    assert len(out) == 1 + 2 + 4
    out_pd = poincare_embeddings(edges, dimension=4, epochs=5)
    assert np.array_equal(np.stack(out["embedding"].to_numpy()),
                          np.stack(out_pd["embedding"].to_numpy()))


def test_poincare_empty_edges():
    out = poincare_embeddings(pd.DataFrame({"src": [], "dst": []}),
                              dimension=4)
    assert len(out) == 0
