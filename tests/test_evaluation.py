"""Evaluation utils: classification scores vs hand-computed values,
confusion matrix, exact t-SNE invariants, k-means clustering.

Mirrors the surface of /root/reference/bluegraph/downstream/utils.py:28-66
(get_confusion_matrix / get_classification_scores / transform_to_2d /
cluster_nodes); sklearn is absent here so oracles are hand-computed.
"""

import numpy as np
import pytest

from bluegraph_ray.pipelines.evaluation import (
    cluster_nodes,
    get_classification_scores,
    get_confusion_matrix,
    transform_to_2d,
)


def test_confusion_matrix_row_normalized():
    t = np.array(["a", "a", "a", "b", "b", "c"])
    p = np.array(["a", "b", "a", "b", "b", "a"])
    m = get_confusion_matrix(t, p)
    # classes sorted: a, b, c
    np.testing.assert_allclose(m[0], [2 / 3, 1 / 3, 0])
    np.testing.assert_allclose(m[1], [0, 1, 0])
    np.testing.assert_allclose(m[2], [1, 0, 0])
    np.testing.assert_allclose(m.sum(axis=1), [1, 1, 1])


def test_binary_scores_hand_computed():
    # tp=2 fp=1 fn=1 tn=2  -> prec 2/3, rec 2/3, f1 2/3, acc 4/6
    t = np.array([1, 1, 1, 0, 0, 0])
    p = np.array([1, 1, 0, 1, 0, 0])
    s = get_classification_scores(t, p, average="binary")
    assert s["accuracy"] == pytest.approx(4 / 6)
    assert s["precision"] == pytest.approx(2 / 3)
    assert s["recall"] == pytest.approx(2 / 3)
    assert s["f1_score"] == pytest.approx(2 / 3)
    # AUC of hard labels: (tpr+tnr)/2 = (2/3 + 2/3)/2
    assert s["roc_auc_score"] == pytest.approx((2 / 3 + 2 / 3) / 2)


def test_micro_equals_accuracy_multiclass():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 200)
    p = np.where(rng.random(200) < 0.7, t, rng.integers(0, 4, 200))
    s = get_classification_scores(t, p, average="micro", multiclass=True)
    # single-label multiclass: micro precision == recall == f1 == accuracy
    assert s["precision"] == pytest.approx(s["accuracy"])
    assert s["recall"] == pytest.approx(s["accuracy"])
    assert s["f1_score"] == pytest.approx(s["accuracy"])
    assert 0.5 < s["roc_auc_score"] <= 1.0
    # macro variant runs and is bounded
    sm = get_classification_scores(t, p, average="macro", multiclass=True)
    assert 0 <= sm["precision"] <= 1 and 0 <= sm["f1_score"] <= 1


def test_perfect_prediction_scores_one():
    t = np.array(["x", "y", "x", "z"])
    s = get_classification_scores(t, t.copy(), average="macro",
                                  multiclass=True)
    for k in ("accuracy", "precision", "recall", "f1_score", "roc_auc_score"):
        assert s[k] == pytest.approx(1.0), k


def _blobs(seed=0, n_per=30, d=16, spread=8.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=spread, size=(3, d))
    X = np.concatenate([c + rng.normal(size=(n_per, d)) for c in centers])
    y = np.repeat(np.arange(3), n_per)
    return X, y


def test_tsne_shape_determinism_and_cluster_preservation():
    X, y = _blobs()
    Y1 = transform_to_2d(X, n_iter=300, seed=0)
    assert Y1.shape == (len(X), 2)
    assert np.isfinite(Y1).all()
    # deterministic (PCA init, no RNG in the descent)
    Y2 = transform_to_2d(X, n_iter=300, seed=0)
    np.testing.assert_allclose(Y1, Y2)
    # well-separated high-D blobs stay separated in 2-D:
    # mean within-cluster distance << mean between-cluster distance
    d = np.linalg.norm(Y1[:, None] - Y1[None, :], axis=-1)
    same = y[:, None] == y[None, :]
    off = ~np.eye(len(X), dtype=bool)
    within = d[same & off].mean()
    between = d[~same].mean()
    assert between > 2.0 * within


def test_tsne_tiny_inputs():
    assert transform_to_2d(np.zeros((0, 5))).shape == (0, 2)
    assert transform_to_2d(np.ones((1, 5))).shape == (1, 2)
    assert transform_to_2d(np.ones((2, 5))).shape == (2, 2)
    assert transform_to_2d(np.random.default_rng(0).normal(size=(5, 3)),
                           n_iter=50).shape == (5, 2)


def test_cluster_nodes_recovers_blobs():
    X, y = _blobs(seed=1, n_per=40, spread=12.0)
    labels = cluster_nodes(X, k=3, seed=0)
    assert labels.shape == (len(X),)
    # each true blob maps to one dominant predicted label, all distinct
    dominant = [np.bincount(labels[y == c], minlength=3).argmax()
                for c in range(3)]
    assert len(set(dominant)) == 3
    purity = np.mean([
        np.bincount(labels[y == c], minlength=3).max() / (y == c).sum()
        for c in range(3)])
    assert purity > 0.95
    # determinism
    np.testing.assert_array_equal(labels, cluster_nodes(X, k=3, seed=0))
