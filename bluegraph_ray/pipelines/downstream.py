"""Downstream ML surfaces: negative edge sampling, edge-feature operators,
simple node classification — the reference's downstream package re-expressed
(/root/reference/bluegraph/downstream/link_prediction.py:26-158,
downstream/data_structures.py:21-83).

sklearn/tensorflow are unavailable; the classifier here is a from-scratch
logistic regression (numpy batch gradient descent) exposing the same
fit/predict surface so pipelines are swappable; heavy models plug in as
actor-pool scorers (see pipelines/multimodal.py for the pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def generate_negative_edges(
    edges: "ray.data.Dataset",
    *,
    nodes: list | np.ndarray | None = None,
    n_samples: int | None = None,
    seed: int = 0,
    src: str = "src",
    dst: str = "dst",
) -> pd.DataFrame:
    """Sample node pairs that are NOT edges — reference link_prediction.py:26-80.

    Counter-based deterministic sampling: candidate i draws endpoints
    ``a_i = sha256_64("{seed}:{2i}") mod n`` and ``b_i = sha256_64("{seed}:{2i+1}")
    mod n`` (sha256_64 = first 8 bytes big-endian); keep pairs with a != b whose
    (a,b)/(b,a) is not an edge; emit the first ``n_samples`` in counter order.
    Unlike a stateful RNG stream this is embarrassingly parallel (any counter
    range is an independent ``map_batches`` task) and exactly replicable by the
    DuckDB oracle. The edge set is broadcast as a sorted code array
    (hash-partitioned semi-join at larger scale, same key)."""
    import hashlib

    pdf = edges.select_columns([src, dst]).to_pandas()
    if nodes is None:
        nodes = np.sort(pd.unique(pd.concat([pdf[src], pdf[dst]]).to_numpy()))
    nodes = np.asarray(nodes)
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    s = pdf[src].map(idx).to_numpy()
    d = pdf[dst].map(idx).to_numpy()
    codes = np.unique(np.concatenate([s * n + d, d * n + s]))
    if n_samples is None:
        n_samples = len(pdf)

    def h64_mod(js: np.ndarray) -> np.ndarray:
        return np.array(
            [int.from_bytes(hashlib.sha256(f"{seed}:{j}".encode()).digest()[:8],
                            "big") % n for j in js],
            dtype=np.int64,
        )

    out_s: list = []
    out_d: list = []
    got, start = 0, 0
    while got < n_samples:
        count = max(2 * (n_samples - got), 64)
        i = np.arange(start, start + count, dtype=np.int64)
        a, b = h64_mod(2 * i), h64_mod(2 * i + 1)
        keep = (a != b) & ~np.isin(a * n + b, codes)
        a, b = a[keep][: n_samples - got], b[keep][: n_samples - got]
        out_s.append(a)
        out_d.append(b)
        got += len(a)
        start += count
    s_idx = np.concatenate(out_s)
    d_idx = np.concatenate(out_d)
    return pd.DataFrame({src: nodes[s_idx], dst: nodes[d_idx]})


EDGE_OPERATORS = ("hadamard", "l1", "l2", "average")


def edge_features(
    emb: dict | pd.DataFrame,
    pairs: pd.DataFrame,
    *,
    operator: str = "hadamard",
    src: str = "src",
    dst: str = "dst",
) -> np.ndarray:
    """Combine endpoint embeddings into an edge feature
    (reference link_prediction.py:83-158: hadamard/l1/l2/avg)."""
    if isinstance(emb, pd.DataFrame):
        emb = {r[0]: np.asarray(r[1]) for r in emb.itertuples(index=False)}
    a = np.stack([np.asarray(emb[v]) for v in pairs[src]])
    b = np.stack([np.asarray(emb[v]) for v in pairs[dst]])
    if operator == "hadamard":
        return a * b
    if operator == "l1":
        return np.abs(a - b)
    if operator == "l2":
        return (a - b) ** 2
    if operator == "average":
        return (a + b) / 2.0
    raise ValueError(f"unknown edge operator {operator!r}; options: {EDGE_OPERATORS}")


class LogisticClassifier:
    """Minimal logistic regression (fit on driver; predict is a stateless
    broadcast map_batches when given a Dataset)."""

    def __init__(self, lr: float = 0.1, epochs: int = 300, seed: int = 0):
        self.lr, self.epochs, self.seed = lr, epochs, seed
        self.w_: np.ndarray | None = None
        self.b_: float = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticClassifier":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        rng = np.random.default_rng(self.seed)
        w = rng.standard_normal(X.shape[1]) * 0.01
        b = 0.0
        for _ in range(self.epochs):
            z = X @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y
            w -= self.lr * (X.T @ g) / len(y)
            b -= self.lr * float(g.mean())
        self.w_, self.b_ = w, b
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-(np.asarray(X) @ self.w_ + self.b_)))

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X) >= 0.5).astype(np.int64)


class EdgePredictor:
    """Link prediction: embeddings + positive edges -> edge classifier
    (reference downstream/link_prediction.py surface)."""

    def __init__(self, operator: str = "hadamard", seed: int = 0):
        self.operator = operator
        self.seed = seed
        self.model = LogisticClassifier(seed=seed)

    def fit(self, emb, pos_edges: pd.DataFrame, neg_edges: pd.DataFrame,
            *, src="src", dst="dst") -> "EdgePredictor":
        Xp = edge_features(emb, pos_edges, operator=self.operator, src=src, dst=dst)
        Xn = edge_features(emb, neg_edges, operator=self.operator, src=src, dst=dst)
        X = np.vstack([Xp, Xn])
        y = np.concatenate([np.ones(len(Xp)), np.zeros(len(Xn))])
        self.model.fit(X, y)
        return self

    def predict(self, emb, pairs: pd.DataFrame, *, src="src", dst="dst") -> np.ndarray:
        X = edge_features(emb, pairs, operator=self.operator, src=src, dst=dst)
        return self.model.predict(X)
