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
