"""Poincaré hierarchy embeddings, from scratch.

Fills the reference's gensim Poincaré slot
(``backends/gensim/embed/embedders.py:30-93`` — ``GensimNodeEmbedder
("poincare")`` wrapping ``gensim.models.poincare.PoincareModel``; gensim is
absent in this container) with a direct numpy implementation of Nickel &
Kiela, "Poincaré Embeddings for Learning Hierarchical Representations"
(NeurIPS 2017): Riemannian SGD on the open unit ball, softmax loss over
negative samples, burn-in phase, deterministic under a seed.

Scale posture: a hierarchy/taxonomy is SMALL-SIDE data by construction (the
ontology of a 100 TB corpus is thousands of types, not billions of rows) —
the reference itself trains single-machine. The engine therefore keeps the
EDGE EXTRACTION distributed (any Dataset in, deduped + collected once) and
runs the vectorized trainer driver-side, guarded by ``max_nodes`` exactly
like louvain's giant-component guard. Downstream consumption (scoring every
corpus row against the trained ball) stays distributed via broadcast —
``ray.put`` the table, look up inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["poincare_embeddings", "poincare_distance"]

_EPS = 1e-9
_BOUNDARY = 1.0 - 1e-5


def poincare_distance(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """d(u, v) = arcosh(1 + 2|u-v|^2 / ((1-|u|^2)(1-|v|^2))) — broadcasts
    over leading axes; the last axis is the embedding dimension."""
    uu = np.sum(u * u, axis=-1)
    vv = np.sum(v * v, axis=-1)
    dd = np.sum((u - v) ** 2, axis=-1)
    gamma = 1.0 + 2.0 * dd / np.maximum((1.0 - uu) * (1.0 - vv), _EPS)
    return np.arccosh(np.maximum(gamma, 1.0))


def _project(theta: np.ndarray) -> np.ndarray:
    """Clip back into the open ball (Nickel & Kiela eq. 3.1 proj)."""
    norms = np.linalg.norm(theta, axis=-1, keepdims=True)
    scale = np.where(norms >= _BOUNDARY, _BOUNDARY / np.maximum(norms, _EPS),
                     1.0)
    return theta * scale


def _dist_grads(u: np.ndarray, x: np.ndarray):
    """Euclidean gradients of d(u, x) wrt u and x (Nickel & Kiela eq. 4).

    u: (B, 1, d) broadcast against candidates x: (B, K, d).
    Returns (d, du, dx) with d: (B, K), du/dx: (B, K, d)."""
    alpha = np.maximum(1.0 - np.sum(u * u, axis=-1, keepdims=True), _EPS)
    beta = np.maximum(1.0 - np.sum(x * x, axis=-1, keepdims=True), _EPS)
    diff2 = np.sum((u - x) ** 2, axis=-1, keepdims=True)
    gamma = 1.0 + 2.0 * diff2 / (alpha * beta)
    denom = np.maximum(np.sqrt(gamma * gamma - 1.0), _EPS)
    uu = np.sum(u * u, axis=-1, keepdims=True)
    xx = np.sum(x * x, axis=-1, keepdims=True)
    ux = np.sum(u * x, axis=-1, keepdims=True)
    du = (4.0 / (beta * denom)) * (
        ((xx - 2.0 * ux + 1.0) / alpha ** 2) * u - x / alpha)
    dx = (4.0 / (alpha * denom)) * (
        ((uu - 2.0 * ux + 1.0) / beta ** 2) * x - u / beta)
    d = np.arccosh(np.maximum(gamma[..., 0], 1.0))
    return d, du, dx


def poincare_embeddings(
    edges,
    *,
    src: str = "src",
    dst: str = "dst",
    dimension: int = 64,
    epochs: int = 50,
    negative: int = 10,
    learning_rate: float = 0.1,
    burn_in: int = 10,
    burn_in_alpha: float = 0.01,
    batch_size: int = 1024,
    seed: int = 0,
    directed: bool = True,
    max_nodes: int = 2_000_000,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Train Poincaré-ball embeddings on a DIRECTED hierarchy edge list
    (child -> parent, the reference/gensim convention) and return
    ``DataFrame(@id, embedding)`` — the reference's transductive-fit output
    shape (``backends/gensim/embed/embedders.py:86-92``). Defaults mirror
    the reference's DEFAULT_GENSIM_PARAMS (size=64, epochs=50).

    Deterministic in (edges, seed): init, edge shuffles and negative draws
    all come from one seeded generator. ``directed=False`` raises, matching
    the reference's FittingException (embedders.py:41-44).
    """
    if not directed:
        raise ValueError(
            "Poincare embedding can be performed only on directed graphs: "
            "undirected graph was provided")
    if hasattr(edges, "to_pandas") and not isinstance(edges, pd.DataFrame):
        # Dataset path: dedupe distributed, collect only the edge list
        from bluegraph_ray.util import hash_distinct
        pdf = hash_distinct(edges.select_columns([src, dst]),
                            [src, dst], num_buckets=num_buckets).to_pandas()
    else:
        pdf = pd.DataFrame(edges)[[src, dst]].drop_duplicates()
    pdf = pdf.sort_values([src, dst], kind="stable").reset_index(drop=True)

    names = np.sort(pd.unique(pd.concat([pdf[src], pdf[dst]]).to_numpy()))
    if len(names) > max_nodes:
        raise ValueError(
            f"poincare_embeddings: {len(names)} nodes > max_nodes="
            f"{max_nodes}. Hierarchies are small-side by design; for "
            "corpus-scale node embeddings use the distributed walk family "
            "(pipelines/graphembed.deepwalk_embeddings / "
            "node2vec_embeddings) or raise max_nodes explicitly.")
    pos = pd.Index(names)
    eu = pos.get_indexer(pdf[src]).astype(np.int64)
    ev = pos.get_indexer(pdf[dst]).astype(np.int64)
    n, m = len(names), len(eu)
    if m == 0:
        return pd.DataFrame({"@id": names,
                             "embedding": [np.zeros(dimension)] * n})

    rng = np.random.default_rng(seed)
    theta = rng.uniform(-1e-3, 1e-3, size=(n, dimension))

    # adjacency membership for negative-sample masking (positives among the
    # uniform draws contribute no gradient), as sorted (u << 32 | x) codes
    arc_codes = np.sort((eu.astype(np.uint64) << np.uint64(32))
                        | ev.astype(np.uint64))

    for epoch in range(epochs):
        lr = learning_rate * (burn_in_alpha / learning_rate
                              if epoch < burn_in else 1.0)
        order = rng.permutation(m)
        for lo in range(0, m, batch_size):
            take = order[lo:lo + batch_size]
            bu, bv = eu[take], ev[take]
            b = len(bu)
            negs = rng.integers(0, n, size=(b, negative), dtype=np.int64)
            cand = np.concatenate([bv[:, None], negs], axis=1)  # (B, K+1)
            # mask accidental positives / self among the negatives
            codes = ((np.repeat(bu, negative).astype(np.uint64)
                      << np.uint64(32))
                     | negs.ravel().astype(np.uint64))
            at = np.searchsorted(arc_codes, codes)
            hit = (at < len(arc_codes)) & (
                arc_codes[np.minimum(at, len(arc_codes) - 1)] == codes)
            bad = (hit | (negs.ravel() == np.repeat(bu, negative))).reshape(
                b, negative)

            U = theta[bu][:, None, :]            # (B, 1, d)
            X = theta[cand]                      # (B, K+1, d)
            d, du, dx = _dist_grads(U, X)
            # softmax over -d with masked negatives excluded
            logits = -d
            logits[:, 1:][bad] = -np.inf
            logits -= logits.max(axis=1, keepdims=True)
            e = np.exp(logits)
            p = e / np.maximum(e.sum(axis=1, keepdims=True), _EPS)
            # dL/dd for L = -log p_target: target gets (1 - p), negatives -p
            coef = -p
            coef[:, 0] += 1.0
            coef[:, 1:][bad] = 0.0
            # Riemannian scaling ((1-|θ|²)²/4), then gradient DESCENT
            gu = np.sum(coef[..., None] * du, axis=1)           # (B, d)
            su = (1.0 - np.sum(theta[bu] ** 2, axis=-1,
                               keepdims=True)) ** 2 / 4.0
            gx = coef[..., None] * dx                           # (B, K+1, d)
            sx = (1.0 - np.sum(X ** 2, axis=-1, keepdims=True)) ** 2 / 4.0
            upd = np.zeros_like(theta)
            np.add.at(upd, bu, lr * su * gu)
            np.add.at(upd, cand.ravel(),
                      (lr * sx * gx).reshape(-1, dimension))
            theta = _project(theta - upd)
    return pd.DataFrame({"@id": names, "embedding": list(theta)})
