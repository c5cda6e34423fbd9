"""Encoder fit/transform vs hand-computed oracles (reference semantics:
/root/reference/bluegraph/preprocess/encoders.py:412-572)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from bluegraph_ray.pipelines.encoders import (
    MultiLabelBinarizerEncoder,
    PCAReducer,
    StandardScalerEncoder,
    TfIdfEncoder,
    concat_features,
)


def test_multilabel_binarizer():
    df = pd.DataFrame({"id": [1, 2, 3],
                       "tags": [["a", "b"], ["b"], ["c", "a"]]})
    ds = ray.data.from_pandas(df)
    enc = MultiLabelBinarizerEncoder("tags").fit(ds)
    assert enc.classes_ == ["a", "b", "c"]
    out = enc.transform(ds).to_pandas().set_index("id")
    np.testing.assert_array_equal(out.loc[1, "tags_enc"], [1, 1, 0])
    np.testing.assert_array_equal(out.loc[2, "tags_enc"], [0, 1, 0])
    np.testing.assert_array_equal(out.loc[3, "tags_enc"], [1, 0, 1])


def test_tfidf_matches_formula():
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["cat dog", "cat cat fish", "dog dog dog bird"]})
    ds = ray.data.from_pandas(docs)
    enc = TfIdfEncoder("text", max_features=10).fit(ds)
    assert set(enc.vocab_) == {"cat", "dog", "fish", "bird"}
    out = enc.transform(ds).to_pandas()
    v = np.stack(out.sort_values("doc_id")["text_tfidf"].to_numpy())
    # doc 1: cat tf=2 -> 1+ln2; fish tf=1; idf = ln(4/(1+df))+1
    n = 3
    idf = {t: math.log((1 + n) / (1 + d)) + 1 for t, d in
           {"cat": 2, "dog": 2, "fish": 1, "bird": 1}.items()}
    raw = np.zeros(len(enc.vocab_))
    raw[enc.vocab_["cat"]] = (1 + math.log(2)) * idf["cat"]
    raw[enc.vocab_["fish"]] = 1.0 * idf["fish"]
    raw /= np.linalg.norm(raw)
    np.testing.assert_allclose(v[1], raw, rtol=1e-12)
    # rows are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-9)


def test_tfidf_fit_bounded_collect():
    # corpus with FAR more distinct tokens than max_features: the driver
    # must merge block-level top-k partials, never the full df table
    rng = np.random.default_rng(11)
    common = [f"kw{i}" for i in range(8)]
    docs = []
    for d in range(60):
        uniq = [f"u{d}_{j}" for j in range(40)]  # 2400 near-unique tokens
        picks = [common[i] for i in rng.integers(0, 8, size=d % 8 + 1)]
        docs.append(" ".join(picks + uniq))
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    ds = ray.data.from_pandas(df).repartition(8)
    k = 16
    enc = TfIdfEncoder("text", max_features=k).fit(ds)
    # driver-side merge is bounded by blocks x k, far below the vocabulary
    n_distinct = len({t for d in docs for t in d.split()})
    assert n_distinct > 2000
    assert enc.fit_rows_collected_ <= 64 * k  # num_buckets x max_features
    assert enc.fit_rows_collected_ < n_distinct / 2
    # exact same vocab as the brute-force (df desc, token asc) top-k
    from collections import Counter
    dfc = Counter(t for d in docs for t in set(d.split()))
    want = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert set(enc.vocab_) == {t for t, _ in want}


def test_standard_scaler_with_imputation():
    df = pd.DataFrame({"a": [1.0, 2.0, 3.0, np.nan], "b": [10.0, 10.0, 10.0, 10.0]})
    ds = ray.data.from_pandas(df)
    enc = StandardScalerEncoder(["a", "b"]).fit(ds)
    np.testing.assert_allclose(enc.mean_, [2.0, 10.0])
    out = enc.transform(ds).to_pandas()
    scaled = np.stack(out["scaled"].to_numpy())
    np.testing.assert_allclose(scaled[:, 0].mean(), 0.0, atol=1e-9)  # imputed -> mean -> 0
    np.testing.assert_allclose(scaled[3, 0], 0.0, atol=1e-12)


def test_pca_recovers_principal_direction():
    rng = np.random.default_rng(5)
    base = rng.standard_normal(200)
    x = np.stack([base * 3, base * 3 + rng.standard_normal(200) * 0.01,
                  rng.standard_normal(200) * 0.1], axis=1)
    df = pd.DataFrame({"v": list(x)})
    ds = ray.data.from_pandas(df)
    red = PCAReducer("v", 1).fit(ds)
    out = red.transform(ds).to_pandas()
    proj = np.stack(out["v_pca"].to_numpy())[:, 0]
    # first component captures the shared direction
    corr = np.corrcoef(proj, base)[0, 1]
    assert abs(corr) > 0.999


def test_concat_features():
    df = pd.DataFrame({"id": [1, 2], "x": [1.0, 2.0], "v": [[3.0, 4.0], [5.0, 6.0]]})
    out = concat_features(ray.data.from_pandas(df), ["x", "v"]).to_pandas()
    np.testing.assert_array_equal(out["features"].iloc[0], [1.0, 3.0, 4.0])
    np.testing.assert_array_equal(out["features"].iloc[1], [2.0, 5.0, 6.0])


def test_pgframe_encoder_homogeneous_and_heterogeneous():
    """ScikitLearnPGEncoder surface (reference preprocess/encoders.py:96-358,
    tests/preprocess/test_semantic_pg_encoder.py): homogeneous mode encodes
    every node with one shared encoder map; heterogeneous mode fits a
    per-type encoder map over each typed subset (per-type dimensionality);
    a non-dict property spec under heterogeneous raises."""
    import pytest

    from bluegraph_ray.pgframe import RayPGFrame
    from bluegraph_ray.pipelines.encoders import PGFrameEncoder

    nodes = pd.DataFrame({
        "@id": [f"n{i}" for i in range(8)],
        "@type": ["Apple"] * 4 + ["Orange"] * 4,
        "weight": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0],
        "color": ["red", "green", "red", "blue", "red", "red", "green", "blue"],
        "desc": [f"some words here number {i} fruit text" for i in range(8)],
    })
    edges = pd.DataFrame({"@source_id": ["n0", "n4"],
                          "@target_id": ["n1", "n5"],
                          "mi": [0.5, 0.7]})
    pg = RayPGFrame(nodes=nodes, edges=edges)
    pg.node_prop_as_numeric("weight")
    pg.node_prop_as_category("color")
    pg.node_prop_as_text("desc")
    pg.edge_prop_as_numeric("mi")

    hom = PGFrameEncoder(node_properties=["weight", "color"],
                         edge_properties=["mi"], edge_features=True)
    out = hom.fit_transform(pg)
    feats = out.nodes_df().set_index("@id")["features"]
    assert len(feats) == 8
    dims = {len(v) for v in feats}
    assert dims == {1 + 3}  # scaled weight + 3 colors, same for every node
    # standardization is global: mean of the scaled weights ~ 0
    w = np.stack(feats.to_numpy())[:, 0]
    assert abs(w.mean()) < 1e-9
    efeats = out.edges_df()["features"]
    assert len(efeats) == 2 and all(len(v) == 1 for v in efeats)

    het = PGFrameEncoder(
        node_properties={"Apple": ["weight", "color"], "Orange": ["color"]},
        heterogeneous=True)
    out = het.fit_transform(pg)
    feats = out.nodes_df().set_index("@id")["features"]
    assert len(feats) == 8
    # Apple: scaled weight + its own color vocab (red/green/blue = 3) -> 4
    # Orange: its own color vocab (red/green/blue = 3) -> 3
    assert {len(feats[f"n{i}"]) for i in range(4)} == {4}
    assert {len(feats[f"n{i}"]) for i in range(4, 8)} == {3}
    # per-type standardization: Apple weights scaled by the APPLE mean (2.5)
    apple_w = np.stack([feats[f"n{i}"] for i in range(4)])[:, 0]
    assert abs(apple_w.mean()) < 1e-9

    with pytest.raises(ValueError):
        PGFrameEncoder(node_properties=["weight"], heterogeneous=True)
