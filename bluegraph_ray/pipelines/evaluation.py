"""Embedding-evaluation utils: classification scores, confusion matrix,
2-D t-SNE projection, k-means node clustering.

Re-expresses the reference's ``bluegraph/downstream/utils.py:28-66``
(sklearn ``confusion_matrix`` / ``precision_score`` / ``TSNE`` / ``KMeans``)
from scratch on numpy — sklearn is not in this container, and these are
driver-side utilities over SMALL inputs (an evaluation sample, never the
corpus): t-SNE is O(n^2) by nature, so at 100 TB scale the contract is
"sample k rows with ``Dataset.limit`` / ``random_sample`` first, then
project" — the distributed k-means that scales is
``similarity.kmeans_centroids``; ``cluster_nodes`` here mirrors the
reference's in-memory convenience wrapper.

``plot_2d`` (matplotlib) is out of scope — no plotting backend in the
container; the projection itself (the computable part) is what this module
provides.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "get_confusion_matrix",
    "get_classification_scores",
    "transform_to_2d",
    "cluster_nodes",
]


def _as_codes(true_labels, predicted_labels):
    """Map two label arrays onto shared integer codes [0, k)."""
    t = np.asarray(true_labels)
    p = np.asarray(predicted_labels)
    classes = np.unique(np.concatenate([t, p]))
    lut = {c: i for i, c in enumerate(classes.tolist())}
    tc = np.fromiter((lut[x] for x in t.tolist()), dtype=np.int64, count=len(t))
    pc = np.fromiter((lut[x] for x in p.tolist()), dtype=np.int64, count=len(p))
    return tc, pc, classes


def get_confusion_matrix(true_labels, predicted_labels) -> np.ndarray:
    """Row-normalized confusion matrix (reference: ``normalize='true'``,
    downstream/utils.py:28-30). Rows = true classes, cols = predicted."""
    tc, pc, classes = _as_codes(true_labels, predicted_labels)
    k = len(classes)
    m = np.zeros((k, k), dtype=np.float64)
    np.add.at(m, (tc, pc), 1.0)
    row = m.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore"):
        m = np.where(row > 0, m / row, 0.0)
    return m


def _prf(tc: np.ndarray, pc: np.ndarray, k: int, average: str):
    """Precision/recall/F1 with sklearn's micro/macro/binary semantics
    (0/0 counts as 0, like sklearn's zero_division=0 default warning path)."""
    tp = np.zeros(k)
    fp = np.zeros(k)
    fn = np.zeros(k)
    for c in range(k):
        tp[c] = np.sum((pc == c) & (tc == c))
        fp[c] = np.sum((pc == c) & (tc != c))
        fn[c] = np.sum((pc != c) & (tc == c))
    if average == "micro":
        TP, FP, FN = tp.sum(), fp.sum(), fn.sum()
        prec = TP / (TP + FP) if TP + FP else 0.0
        rec = TP / (TP + FN) if TP + FN else 0.0
    elif average == "macro":
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
            rc = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        prec, rec = float(pr.mean()), float(rc.mean())
    elif average == "binary":
        # positive class = code 1 (two-class inputs)
        c = 1 if k > 1 else 0
        prec = tp[c] / (tp[c] + fp[c]) if tp[c] + fp[c] else 0.0
        rec = tp[c] / (tp[c] + fn[c]) if tp[c] + fn[c] else 0.0
    else:
        raise ValueError(f"unknown average: {average!r}")
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return float(prec), float(rec), float(f1)


def _roc_auc_binary(y: np.ndarray, score: np.ndarray) -> float:
    """AUC by the rank statistic (ties get midranks) — exact for hard labels
    too, matching sklearn on the same inputs."""
    pos = score[y == 1]
    neg = score[y == 0]
    if not len(pos) or not len(neg):
        return float("nan")
    order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
    ranks = np.empty(len(order), dtype=np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    s = np.sort(np.concatenate([neg, pos]))
    # midranks for ties
    uniq, inv, cnt = np.unique(
        np.concatenate([neg, pos]), return_inverse=True, return_counts=True)
    start = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    mid = start + (cnt + 1) / 2.0
    ranks = mid[inv]
    r_pos = ranks[len(neg):].sum()
    n1, n0 = len(pos), len(neg)
    return float((r_pos - n1 * (n1 + 1) / 2.0) / (n1 * n0))


def get_classification_scores(true_labels, predicted_labels,
                              average: str = "micro",
                              multiclass: bool = False) -> dict:
    """Accuracy / precision / recall / F1 / ROC-AUC, the reference's
    benchmark dict (downstream/utils.py:33-54). ``multiclass=True``
    one-hot-binarizes labels before AUC (ovr), like the reference's
    MultiLabelBinarizer path."""
    tc, pc, classes = _as_codes(true_labels, predicted_labels)
    k = len(classes)
    acc = float(np.mean(tc == pc))
    prec, rec, f1 = _prf(tc, pc, k, average)
    if multiclass or k > 2:
        # one-vs-rest on one-hot labels
        aucs, weights = [], []
        for c in range(k):
            y = (tc == c).astype(np.int64)
            s = (pc == c).astype(np.float64)
            if y.min() == y.max():
                continue
            aucs.append(_roc_auc_binary(y, s))
            weights.append(1.0 if average == "macro" else float(y.sum()))
        if average == "micro":
            # micro ovr = AUC over the flattened one-hot matrices
            y = np.concatenate([(tc == c).astype(np.int64) for c in range(k)])
            s = np.concatenate([(pc == c).astype(np.float64) for c in range(k)])
            auc = _roc_auc_binary(y, s)
        else:
            auc = float(np.average(aucs)) if aucs else float("nan")
    else:
        auc = _roc_auc_binary(tc, pc.astype(np.float64))
    return {"accuracy": acc, "precision": prec, "recall": rec,
            "f1_score": f1, "roc_auc_score": auc}


def transform_to_2d(node_embeddings, *, perplexity: float = 30.0,
                    n_iter: int = 500, learning_rate: float | None = None,
                    seed: int = 0) -> np.ndarray:
    """Project embeddings to 2-D with exact t-SNE (reference
    ``transform_to_2d``, downstream/utils.py:56-60).

    From-scratch implementation of van der Maaten & Hinton (JMLR 2008):
    per-point Gaussian bandwidth calibrated to ``perplexity`` by vectorized
    binary search, symmetrized affinities, Student-t low-dim kernel, gradient
    descent with momentum (0.5 -> 0.8 at iter 250) and early exaggeration
    (x12 for the first 250 iters), PCA init for determinism. O(n^2) memory
    and compute — sample the Dataset before calling (see module docstring).
    """
    X = np.asarray(node_embeddings, dtype=np.float64)
    n = len(X)
    if n == 0:
        return np.zeros((0, 2))
    if n <= 2:
        rng = np.random.default_rng(seed)
        return rng.normal(scale=1e-4, size=(n, 2))
    perplexity = min(perplexity, (n - 1) / 3.0)

    # pairwise squared distances
    sq = np.sum(X * X, axis=1)
    D = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0)
    np.fill_diagonal(D, np.inf)

    # binary-search beta_i so that H(P_i) = log(perplexity), all rows at once
    target = np.log(perplexity)
    beta = np.ones(n)
    lo = np.full(n, -np.inf)
    hi = np.full(n, np.inf)
    P = np.zeros_like(D)
    for _ in range(60):
        W = np.exp(-D * beta[:, None])  # diagonal: exp(-inf) = 0
        sumW = np.maximum(W.sum(axis=1), 1e-300)
        Dfin = np.where(np.isfinite(D), D, 0.0)
        H = np.log(sumW) + beta * (Dfin * W).sum(axis=1) / sumW
        diff = H - target
        done = np.abs(diff) < 1e-7
        if done.all():
            break
        too_high = diff > 0  # entropy too high -> increase beta
        lo = np.where(too_high & ~done, beta, lo)
        hi = np.where(~too_high & ~done, beta, hi)
        beta = np.where(
            too_high & ~done,
            np.where(np.isfinite(hi), (beta + hi) / 2.0, beta * 2.0),
            np.where(~too_high & ~done,
                     np.where(np.isfinite(lo), (beta + lo) / 2.0, beta / 2.0),
                     beta))
    W = np.exp(-np.where(np.isfinite(D), D, np.inf) * beta[:, None])
    np.fill_diagonal(W, 0.0)
    P = W / np.maximum(W.sum(axis=1, keepdims=True), 1e-300)
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    # PCA init (deterministic, sign-fixed)
    Xc = X - X.mean(axis=0)
    _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
    V2 = Vt[:2].T
    # fix the sign ambiguity: largest-magnitude loading per component positive
    signs = np.sign(V2[np.abs(V2).argmax(axis=0), np.arange(V2.shape[1])])
    signs[signs == 0] = 1.0
    Y = (Xc @ (V2 * signs))
    Y = Y / max(Y.std(), 1e-12) * 1e-4

    if learning_rate is None:
        learning_rate = max(n / 12.0, 50.0)
    momentum = 0.5
    update = np.zeros_like(Y)
    exaggeration = 12.0
    for it in range(n_iter):
        if it == 250:
            exaggeration = 1.0
            momentum = 0.8
        sqY = np.sum(Y * Y, axis=1)
        num = 1.0 / (1.0 + np.maximum(
            sqY[:, None] + sqY[None, :] - 2.0 * (Y @ Y.T), 0.0))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (exaggeration * P - Q) * num
        grad = 4.0 * ((np.diag(PQ.sum(axis=1)) - PQ) @ Y)
        update = momentum * update - learning_rate * grad
        Y = Y + update
        Y = Y - Y.mean(axis=0)
    return Y


def cluster_nodes(node_embeddings, k: int = 4, *, seed: int = 0,
                  n_iter: int = 100) -> np.ndarray:
    """K-means labels over an in-memory embedding matrix (reference
    ``cluster_nodes``, downstream/utils.py:63-66). Deterministic seeded
    k-means++ init + Lloyd iterations. For corpus-scale clustering use
    ``similarity.kmeans_centroids`` (Dataset-native) instead."""
    X = np.asarray(node_embeddings, dtype=np.float64)
    n = len(X)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    # k-means++ seeding
    centers = [X[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((X - c) ** 2, axis=1) for c in centers], axis=0)
        tot = d2.sum()
        if tot <= 0:
            centers.append(X[rng.integers(n)])
            continue
        centers.append(X[rng.choice(n, p=d2 / tot)])
    C = np.stack(centers)
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(n_iter):
        d = np.sum(X * X, axis=1)[:, None] + np.sum(C * C, axis=1)[None, :] \
            - 2.0 * (X @ C.T)
        new = d.argmin(axis=1)
        if (new == labels).all() and _ > 0:
            break
        labels = new
        for c in range(k):
            m = labels == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return labels
