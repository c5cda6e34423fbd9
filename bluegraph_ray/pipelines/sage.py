"""Inductive feature-based node embedders (attri2vec / GraphSAGE-mean /
DGI), from scratch.

Fills the reference's remaining stellargraph model names
(``backends/stellargraph/embed/embedders.py:49-57`` — ``attri2vec`` and
``graphsage`` trained unsupervised on walk pairs through a
``link_classification`` inner-product sigmoid head, and the ``*_dgi``
variants trained with Deep Graph Infomax corruption; TF/stellargraph are
absent in this container) with numpy implementations:

* attri2vec (Zhang et al., "Attributed Network Embedding via Subspace
  Discovery", 2019): target encoder h_v = sigmoid(x_v W), free context
  table, BCE over inner products with uniform negatives.
* GraphSAGE-mean (Hamilton et al., NeurIPS 2017): one mean-aggregator
  layer h_v = relu([x_v ; mean_{u in N(v)} x_u] W), both pair endpoints
  through the encoder, same unsupervised loss.
* DGI (Velickovic et al., ICLR 2019): the same SAGE encoder, bilinear
  discriminator D(h, s) = sigmoid(h^T M s) against a readout summary
  s = sigmoid(mean h); corruption shuffles feature rows while KEEPING the
  adjacency (the paper's C(X, A) = (X_perm, A)).

Scale posture (same contract as ``pipelines/hyperbolic`` / ``kge``): the
wide, corpus-shaped stages are distributed —

* ``mean_neighbor_features``: the neighborhood aggregation as a
  hash-join + hash-aggregate over the edge table (SQL-verifiable);
* ``embed_batches``: INFERENCE of a trained encoder over any Dataset of
  feature rows, weights broadcast once via ``ray.put`` (this is the whole
  point of an inductive model — new nodes never touch the trainer);

while the SGD fit itself is vectorized-single-machine over the collected
(features, pairs) tables, guarded by ``max_nodes`` / ``max_pairs``,
matching the reference's own in-memory TF training.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["mean_neighbor_features", "attri2vec_fit", "graphsage_fit",
           "dgi_fit", "embed_batches"]


# ---------------------------------------------------------------------------
# distributed neighborhood aggregation
# ---------------------------------------------------------------------------

def mean_neighbor_features(
    edges,
    features,
    *,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    feature_cols: list[str] | None = None,
    undirected: bool = True,
    num_buckets: int = 64,
    exact_decimal_scales: dict[str, int] | None = None,
    round_to: int | None = None,
):
    """Per-node MEAN of neighbor feature vectors — the GraphSAGE mean
    aggregator as a relational plan: (optionally symmetrized) edge table
    hash-joined to the feature table on the neighbor endpoint, then a
    hash-aggregated sum/count per node. Nodes with no neighbors are absent
    from the output (callers backfill zeros, matching SAGE's empty-sample
    convention). Returns the same container kind it was given.

    ``exact_decimal_scales``: {col: scale} for feature columns whose values
    are exact decimals (``value * scale`` is an exact integer — e.g. prices
    in cents with scale=100, or already-rescaled ``cents/100000`` with
    scale=100000). Those columns are summed as **int64 micro-units** and
    divided once at the end (``int_sum / (scale * n)``), which is bit-exact
    under ANY block/summation order — float partial sums differ in the last
    ulp between summation trees, and a downstream ``round(·, 6)`` flips on
    boundary values (the round-4 ``sage_agg_parts`` driver mismatch). The
    SQL replay is ``SUM(CAST(x*scale AS BIGINT))::DOUBLE / (scale*n)``.

    ``round_to``: with ``exact_decimal_scales``, round the scaled columns
    half-even to this many places via exact int64 ratio rounding
    (``util.round_ratio_even``) — means of exact decimals land on true
    half-boundaries (1615/3200 = .5046875) where ``np.round``'s float
    ``*1e6`` tie-breaks the wrong way vs DuckDB's ``round_even``. Requires
    ``|int_sum| * 10**round_to`` to fit int64."""
    scales = exact_decimal_scales or {}
    if isinstance(edges, pd.DataFrame):
        feats = pd.DataFrame(features)
        cols = feature_cols or [c for c in feats.columns if c != node]
        e = edges[[src, dst]]
        if undirected:
            e = pd.concat([e, e.rename(columns={src: dst, dst: src})],
                          ignore_index=True)
        j = e.merge(feats[[node] + cols], left_on=dst, right_on=node)
        if not scales:
            g = j.groupby(src, sort=False)[cols].mean().reset_index()
            return g.rename(columns={src: node})
        for c, s in scales.items():
            j[c] = np.round(j[c].to_numpy() * s).astype(np.int64)
        g = j.groupby(src, sort=False).agg(
            **{c: (c, "sum") for c in cols}, _n=(dst, "size")).reset_index()
        n = g["_n"].to_numpy()
        for c in cols:
            g[c] = _finish_col(g[c].to_numpy(), scales.get(c), n, round_to)
        return g.drop(columns=["_n"]).rename(columns={src: node})

    import ray.data  # noqa: F401  (Dataset path)
    from bluegraph_ray.util import hash_aggregate, hash_join, rename_columns

    cols = feature_cols or [c for c in features.schema().names if c != node]
    e = edges.select_columns([src, dst])
    if undirected:
        e = e.union(rename_columns(e, {src: dst, dst: src}))
    feats = features.select_columns([node] + cols)
    if scales:
        def to_micro(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            for c, s in scales.items():
                b[c] = np.round(b[c].to_numpy() * s).astype(np.int64)
            return b
        feats = feats.map_batches(to_micro, batch_format="pandas")
    feats = rename_columns(feats, {node: dst})
    j = hash_join(e, feats, on=dst, num_buckets=num_buckets)
    aggs = {f"_s_{c}": (c, "sum") for c in cols}
    aggs["_n"] = (None, "count")
    summed = hash_aggregate(j, src, aggs, num_buckets=num_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({node: batch[src]})
        n = batch["_n"].to_numpy()
        for c in cols:
            out[c] = _finish_col(
                batch[f"_s_{c}"].to_numpy(), scales.get(c), n, round_to)
        return out

    return summed.map_batches(finish, batch_format="pandas")


def _finish_col(s: np.ndarray, scale: int | None, n: np.ndarray,
                round_to: int | None) -> np.ndarray:
    """sum → mean with the exact-decimal contract of
    ``mean_neighbor_features``: int64 ratio-rounding for scaled columns."""
    from bluegraph_ray.util import round_ratio_even

    if scale is None:
        out = s / n
        return np.round(out, round_to) if round_to is not None else out
    if round_to is None:
        return s / (scale * n)
    return round_ratio_even(s, np.int64(scale) * n, round_to)


# ---------------------------------------------------------------------------
# trainers (vectorized, deterministic, small-side guarded)
# ---------------------------------------------------------------------------

def _stable_sigmoid(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, 1.0 / (1.0 + np.exp(-np.maximum(x, 0))),
                    np.exp(np.minimum(x, 0))
                    / (1.0 + np.exp(np.minimum(x, 0))))


def _collect_features(features, node, feature_cols, max_nodes, what):
    pdf = features.to_pandas() if hasattr(features, "to_pandas") and \
        not isinstance(features, pd.DataFrame) else pd.DataFrame(features)
    pdf = pdf.sort_values(node, kind="stable").reset_index(drop=True)
    if pdf[node].duplicated().any():
        raise ValueError(f"{what}: duplicate node ids in the feature table")
    if len(pdf) > max_nodes:
        raise ValueError(
            f"{what}: {len(pdf)} nodes > max_nodes={max_nodes}. The trainer "
            "is single-machine over the node table (matching the "
            "reference's TF fit); train on a sampled subgraph or raise "
            "max_nodes explicitly. Inference (embed_batches) is "
            "distributed and unbounded.")
    cols = feature_cols or [c for c in pdf.columns if c != node]
    X = pdf[cols].to_numpy(dtype=np.float64)
    return pdf[node].to_numpy(), cols, X


def _expand_pairs(pairs, names, center, context, weight, max_pairs, what):
    pdf = pairs.to_pandas() if hasattr(pairs, "to_pandas") and \
        not isinstance(pairs, pd.DataFrame) else pd.DataFrame(pairs)
    pos = pd.Index(names)
    ci = pos.get_indexer(pdf[center]).astype(np.int64)
    xi = pos.get_indexer(pdf[context]).astype(np.int64)
    ok = (ci >= 0) & (xi >= 0)
    ci, xi = ci[ok], xi[ok]
    if weight and weight in pdf.columns:
        w = pdf.loc[ok, weight].to_numpy(dtype=np.int64)
        total = int(w.sum())
        if total > max_pairs:
            raise ValueError(f"{what}: {total} expanded pairs > max_pairs="
                             f"{max_pairs}; sample the pair table or raise "
                             "max_pairs explicitly.")
        ci, xi = np.repeat(ci, w), np.repeat(xi, w)
    elif len(ci) > max_pairs:
        raise ValueError(f"{what}: {len(ci)} pairs > max_pairs={max_pairs}")
    order = np.lexsort((xi, ci))  # canonical order: determinism under any
    return ci[order], xi[order]   # incoming row order


def attri2vec_fit(
    features,
    pairs,
    *,
    node: str = "node",
    center: str = "center",
    context: str = "context",
    weight: str = "n",
    feature_cols: list[str] | None = None,
    dimension: int = 32,
    epochs: int = 20,
    negative: int = 5,
    learning_rate: float = 0.05,
    batch_size: int = 4096,
    seed: int = 0,
    max_nodes: int = 10_000_000,
    max_pairs: int = 100_000_000,
) -> dict:
    """Train attri2vec: h_v = sigmoid(x_v W) against a free context table,
    BCE over inner products on walk/edge pairs with uniform negatives.
    Returns {"model", "W", "feature_cols", "nodes": DataFrame(node,
    embedding)}; feed the fit to ``embed_batches`` for distributed
    inference on unseen feature rows."""
    names, cols, X = _collect_features(features, node, feature_cols,
                                       max_nodes, "attri2vec_fit")
    ci, xi = _expand_pairs(pairs, names, center, context, weight, max_pairs,
                           "attri2vec_fit")
    n, d_in = X.shape
    rng = np.random.default_rng(seed)
    W = rng.normal(0.0, 1.0 / np.sqrt(max(d_in, 1)), size=(d_in, dimension))
    C = rng.normal(0.0, 1.0 / np.sqrt(dimension), size=(n, dimension))
    m = len(ci)
    for _ in range(epochs):
        order = rng.permutation(m)
        for lo in range(0, m, batch_size):
            take = order[lo:lo + batch_size]
            bu, bv = ci[take], xi[take]
            b = len(bu)
            negs = rng.integers(0, n, size=(b, negative), dtype=np.int64)
            cand = np.concatenate([bv[:, None], negs], axis=1)
            y = np.zeros((b, negative + 1))
            y[:, 0] = 1.0
            Xb = X[bu]
            z = Xb @ W
            h = _stable_sigmoid(z)                       # (b, dim)
            cv = C[cand]                                 # (b, K, dim)
            score = np.einsum("bd,bkd->bk", h, cv)
            g = _stable_sigmoid(score) - y               # (b, K)
            dh = np.einsum("bk,bkd->bd", g, cv)
            dz = dh * h * (1.0 - h)
            dC = g[..., None] * h[:, None, :]
            W -= learning_rate * (Xb.T @ dz) / b
            updC = np.zeros_like(C)
            np.add.at(updC, cand.ravel(),
                      dC.reshape(-1, dimension) / b)
            C -= learning_rate * updC
    emb = _stable_sigmoid(X @ W)
    return {"model": "attri2vec", "W": W, "feature_cols": cols,
            "nodes": pd.DataFrame({node: names, "embedding": list(emb)})}


_LEAKY = 0.01  # leaky-ReLU slope: a strict ReLU dies under the
# inner-product BCE loss (negatives push activations to exactly 0, where
# the gradient vanishes); stellargraph avoids this with Adam+bias, we with
# the leak. Output is l2-normalized like stellargraph's normalize="l2".


def _sage_forward(Z, W):
    """(pre-activation, activation, l2-normalized output)."""
    z = Z @ W
    h = np.where(z > 0, z, _LEAKY * z)
    nrm = np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    return z, h, h / nrm


def _sage_inputs(X, names, edges, src, dst, undirected):
    """Local mean aggregation (trainer side): Z = [X ; A_mean X]."""
    pos = pd.Index(names)
    e = edges.to_pandas() if hasattr(edges, "to_pandas") and \
        not isinstance(edges, pd.DataFrame) else pd.DataFrame(edges)
    si = pos.get_indexer(e[src]).astype(np.int64)
    di = pos.get_indexer(e[dst]).astype(np.int64)
    ok = (si >= 0) & (di >= 0)
    si, di = si[ok], di[ok]
    if undirected:
        si, di = np.concatenate([si, di]), np.concatenate([di, si])
    return si, di


def _mean_agg(X, si, di, n):
    M = np.zeros((n, X.shape[1]))
    np.add.at(M, si, X[di])
    deg = np.zeros(n)
    np.add.at(deg, si, 1.0)
    return M / np.maximum(deg, 1.0)[:, None]


def _gcn_agg(X, si, di, n):
    """Kipf-Welling propagation with self-loops: (D^-1/2 (A+I) D^-1/2) X."""
    deg = np.ones(n)  # the self-loop
    np.add.at(deg, si, 1.0)
    inv = 1.0 / np.sqrt(deg)
    out = X * (inv * inv)[:, None]
    np.add.at(out, si, X[di] * (inv[si] * inv[di])[:, None])
    return out


def graphsage_fit(
    features,
    edges,
    pairs,
    *,
    node: str = "node",
    src: str = "src",
    dst: str = "dst",
    center: str = "center",
    context: str = "context",
    weight: str = "n",
    feature_cols: list[str] | None = None,
    dimension: int = 32,
    epochs: int = 20,
    negative: int = 5,
    learning_rate: float = 0.05,
    batch_size: int = 4096,
    seed: int = 0,
    undirected: bool = True,
    max_nodes: int = 10_000_000,
    max_pairs: int = 100_000_000,
) -> dict:
    """Train a one-layer mean-aggregator GraphSAGE encoder
    h_v = relu([x_v ; mean_N(v) x] W) unsupervised on walk/edge pairs (both
    endpoints through the encoder, inner-product BCE, uniform negatives).
    Inference on unseen nodes needs (x_v, mean-neighbor x_v) — produce the
    latter at scale with ``mean_neighbor_features`` and apply the fit with
    ``embed_batches``."""
    names, cols, X = _collect_features(features, node, feature_cols,
                                       max_nodes, "graphsage_fit")
    ci, xi = _expand_pairs(pairs, names, center, context, weight, max_pairs,
                           "graphsage_fit")
    n, d_in = X.shape
    si, di = _sage_inputs(X, names, edges, src, dst, undirected)
    Z = np.concatenate([X, _mean_agg(X, si, di, n)], axis=1)
    rng = np.random.default_rng(seed)
    W = rng.normal(0.0, 1.0 / np.sqrt(max(2 * d_in, 1)),
                   size=(2 * d_in, dimension))
    m = len(ci)
    for _ in range(epochs):
        order = rng.permutation(m)
        for lo in range(0, m, batch_size):
            take = order[lo:lo + batch_size]
            bu, bv = ci[take], xi[take]
            b = len(bu)
            negs = rng.integers(0, n, size=(b, negative), dtype=np.int64)
            cand = np.concatenate([bv[:, None], negs], axis=1)
            y = np.zeros((b, negative + 1))
            y[:, 0] = 1.0
            zu, hu, yu = _sage_forward(Z[bu], W)
            zc, hc, yc_flat = _sage_forward(Z[cand.ravel()], W)
            yc = yc_flat.reshape(b, negative + 1, dimension)
            score = np.einsum("bd,bkd->bk", yu, yc)
            g = _stable_sigmoid(score) - y
            # back through l2 normalization: dh = (dy - (dy.y) y) / |h|
            dyu = np.einsum("bk,bkd->bd", g, yc)
            dyc = (g[..., None] * yu[:, None, :]).reshape(-1, dimension)
            nu = np.maximum(np.linalg.norm(hu, axis=-1, keepdims=True),
                            1e-12)
            nc = np.maximum(np.linalg.norm(hc, axis=-1, keepdims=True),
                            1e-12)
            dhu = (dyu - np.sum(dyu * yu, axis=-1, keepdims=True) * yu) / nu
            dhc = (dyc - np.sum(dyc * yc_flat, axis=-1, keepdims=True)
                   * yc_flat) / nc
            dzu = dhu * np.where(zu > 0, 1.0, _LEAKY)
            dzc = dhc * np.where(zc > 0, 1.0, _LEAKY)
            grad = (Z[bu].T @ dzu + Z[cand.ravel()].T @ dzc) / b
            W -= learning_rate * grad
    emb = _sage_forward(Z, W)[2]
    return {"model": "graphsage", "W": W, "feature_cols": cols,
            "nodes": pd.DataFrame({node: names, "embedding": list(emb)})}


def dgi_fit(
    features,
    edges,
    *,
    node: str = "node",
    src: str = "src",
    dst: str = "dst",
    feature_cols: list[str] | None = None,
    dimension: int = 32,
    epochs: int = 100,
    learning_rate: float = 0.05,
    seed: int = 0,
    undirected: bool = True,
    encoder: str = "sage",
    max_nodes: int = 10_000_000,
) -> dict:
    """Deep Graph Infomax: maximize D(h_v, s) for real patches vs corrupted
    ones, where s = sigmoid(mean_v h_v), D(h, s) = sigmoid(h^T M s), and
    the corruption shuffles FEATURE ROWS while keeping the adjacency (so
    corrupted patches aggregate wrong neighbor features — the paper's
    C(X, A)). ``encoder="sage"`` uses the one-layer mean-aggregator
    h = relu([x ; mean_N x] W) (the reference's "graphsage_dgi");
    ``encoder="gcn"`` uses Kipf-Welling propagation
    h = relu((D^-1/2 (A+I) D^-1/2 X) W) (the "gcn_dgi" /
    "cluster_gcn_dgi" slots). Full-batch gradient steps; deterministic in
    (inputs, seed)."""
    if encoder not in ("sage", "gcn"):
        raise ValueError(f"unknown DGI encoder {encoder!r}; "
                         "choose 'sage' or 'gcn'")
    names, cols, X = _collect_features(features, node, feature_cols,
                                       max_nodes, "dgi_fit")
    n, d_in = X.shape
    si, di = _sage_inputs(X, names, edges, src, dst, undirected)
    rng = np.random.default_rng(seed)
    w_in = d_in if encoder == "gcn" else 2 * d_in
    W = rng.normal(0.0, 1.0 / np.sqrt(max(w_in, 1)),
                   size=(w_in, dimension))
    M = rng.normal(0.0, 1.0 / np.sqrt(dimension),
                   size=(dimension, dimension))

    def _enc_input(F):
        if encoder == "gcn":
            return _gcn_agg(F, si, di, n)
        return np.concatenate([F, _mean_agg(F, si, di, n)], axis=1)

    Z = _enc_input(X)
    for _ in range(epochs):
        perm = rng.permutation(n)
        Xc = X[perm]
        Zc = _enc_input(Xc)
        zr, zc = Z @ W, Zc @ W
        H, Hc = np.maximum(zr, 0.0), np.maximum(zc, 0.0)
        s = _stable_sigmoid(H.mean(axis=0))               # readout (dim,)
        Ms = M @ s
        pr, pc = _stable_sigmoid(H @ Ms), _stable_sigmoid(Hc @ Ms)
        gr, gc = (pr - 1.0) / n, pc / n                   # dL/dlogit per row
        # discriminator grads
        dM = (np.outer(gr @ H, s) + np.outer(gc @ Hc, s))
        dMs = M.T @ (gr @ H + gc @ Hc)                    # via s (dim,)
        ds = dMs * s * (1.0 - s)
        dH = np.outer(gr, Ms) + ds[None, :] / n           # real patches
        dHc = np.outer(gc, Ms)                            # corrupted
        dW = Z.T @ (dH * (zr > 0)) + Zc.T @ (dHc * (zc > 0))
        W -= learning_rate * dW
        M -= learning_rate * dM
    emb = np.maximum(Z @ W, 0.0)
    return {"model": "dgi", "encoder": encoder, "W": W, "M": M,
            "feature_cols": cols,
            "nodes": pd.DataFrame({node: names, "embedding": list(emb)})}


# ---------------------------------------------------------------------------
# distributed inference
# ---------------------------------------------------------------------------

def embed_batches(
    features,
    fit: dict,
    *,
    node: str = "node",
    agg_prefix: str = "agg_",
    out_col: str = "embedding",
    batch_size: int = 65536,
):
    """Apply a trained inductive encoder to ANY feature table — the
    distributed consumption path. ``fit["W"]`` is broadcast once via
    ``ray.put``; each batch is one matmul. attri2vec rows need the raw
    feature columns; graphsage/dgi rows additionally need the
    mean-neighbor columns named ``agg_<col>`` (produce them at scale with
    ``mean_neighbor_features``; missing agg columns default to zero, the
    SAGE empty-neighborhood convention)."""
    model, cols = fit["model"], fit["feature_cols"]

    def _embed(batch: pd.DataFrame, W) -> pd.DataFrame:
        X = batch[cols].to_numpy(dtype=np.float64)
        if model == "attri2vec":
            emb = _stable_sigmoid(X @ W)
        else:
            A = np.zeros_like(X)
            for i, c in enumerate(cols):
                if agg_prefix + c in batch.columns:
                    A[:, i] = batch[agg_prefix + c].to_numpy(
                        dtype=np.float64)
            if fit.get("encoder") == "gcn":
                # gcn rows carry the propagated features in the agg
                # columns (produce with _gcn_agg / a normalized
                # mean_neighbor_features variant)
                emb = np.maximum(A @ W, 0.0)
            else:
                Z = np.concatenate([X, A], axis=1)
                emb = (_sage_forward(Z, W)[2] if model == "graphsage"
                       else np.maximum(Z @ W, 0.0))
        return pd.DataFrame({node: batch[node], out_col: list(emb)})

    if isinstance(features, pd.DataFrame):
        return _embed(features, fit["W"])
    import ray

    ref = ray.put(fit["W"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return _embed(batch, ray.get(ref))

    return features.map_batches(fn, batch_format="pandas",
                                batch_size=batch_size)


def attri2vec_step(
    features,
    pairs,
    *,
    W0: np.ndarray,
    node: str = "node",
    center: str = "center",
    context: str = "context",
    feature_cols: list[str] | None = None,
    negative: int = 4,
    lr_div: int = 20,
    num_buckets: int = 16,
) -> "object":
    """ONE deterministic full-batch attri2vec SGD step on the context table,
    stated so every intermediate is SQL-replayable — the proof of concept
    that even the model-zoo training loop is oracle-checkable (round-4
    VERDICT item 5; the full ``attri2vec_fit`` stays a seeded multi-epoch
    numpy loop with permutation/negative RNG that SQL cannot replay).

    Spec (engine and DuckDB oracle compute these IDENTICAL doubles):

    - encoder: h_v = sigmoid(Σ_f x_vf · W0[f, j]), products/sums written in
      feature order on both sides (IEEE ops are deterministic given order);
      h is then quantized to int64 micro-units ``h_int = round_half_away(
      h * 1e6)`` so every aggregation below is EXACT integer math, immune
      to summation order (the repo's micro-unit technique).
    - context table starts at C0 = 0, so each candidate's score is 0,
      sigmoid(0) = 1/2, and the BCE gradient is g = -1/2 for the positive
      context and +1/2 for each negative — absorbed as an integer sign.
    - negatives: slot i of pair (u, v) draws the node of rank
      ``sha256(u|v|i) first-8-bytes % n`` in node order — the repo's
      standard oracle-replayable hash (dedup.py:715 pattern).
    - update: C1[k, j] = -lr · mean over pair rows of g·h_u[j]
      = -S[k, j] / (2 · lr_div · 1e6 · m) with S an exact int64 sum and
      m = COUNT(pairs); emitted as sign(-S) · round_ratio_even(|S|, den, 6)
      — replayed in SQL with truncating // and %% on nonnegative ints.

    ``W0`` entries must be exact short decimals (caller rounds its seeded
    init) so the oracle can inline them as literals. Returns a Dataset
    (node, c_0 … c_{dim-1}) over candidates that received any gradient."""
    import hashlib

    import ray.data
    from bluegraph_ray.util import (broadcast_get, hash_aggregate,
                                    round_ratio_even)

    # --- small-side node table: ranks + quantized encoder outputs ---------
    pdf = features.to_pandas() if hasattr(features, "to_pandas") and \
        not isinstance(features, pd.DataFrame) else pd.DataFrame(features)
    cols = feature_cols or [c for c in pdf.columns if c != node]
    pdf = pdf.sort_values(node, kind="stable").reset_index(drop=True)
    n = len(pdf)
    dim = W0.shape[1]
    X = pdf[cols].to_numpy(np.float64)
    # z in feature order: ((x0*w0) + x1*w1) + ... — same association as the
    # SQL expression text
    z = np.zeros((n, dim))
    for f in range(len(cols)):
        z = z + X[:, f:f + 1] * W0[f]
    h = 1.0 / (1.0 + np.exp(-z))
    from bluegraph_ray.util import round_half_away
    # DuckDB round(x, 0) rule; exact-.5 ties are measure-zero for sigmoids
    h_int = round_half_away(h * 1e6).astype(np.int64)
    names_arr = pdf[node].to_numpy()
    hint_ref = ray.put(h_int)
    names_ref = ray.put(names_arr)

    # --- m = full-batch size (driver-side count of the pair table) --------
    if isinstance(pairs, pd.DataFrame):
        pairs = ray.data.from_pandas(pairs)
    m = pairs.count()

    # --- pair scan: emit integer gradient partials ------------------------
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        nm = broadcast_get(names_ref)
        hi = broadcast_get(hint_ref)
        pos = pd.Index(nm)
        u = pos.get_indexer(batch[center].to_numpy())
        v = pos.get_indexer(batch[context].to_numpy())
        keep = (u >= 0) & (v >= 0)
        u, v = u[keep], v[keep]
        us = batch[center].to_numpy()[keep]
        vs = batch[context].to_numpy()[keep]
        cand = [v]
        sign = [np.full(len(u), -1, dtype=np.int64)]
        bases = [hashlib.sha256(f"{a}|{b}|".encode())
                 for a, b in zip(us, vs)]
        for i in range(1, negative + 1):
            sfx = str(i).encode()

            def draw(base):
                h = base.copy()
                h.update(sfx)
                return int.from_bytes(h.digest()[:8], "big") % n

            negs = np.fromiter((draw(b) for b in bases),
                               count=len(us), dtype=np.int64)
            cand.append(negs)
            sign.append(np.ones(len(u), dtype=np.int64))
        cand = np.concatenate(cand)
        sign = np.concatenate(sign)
        uu = np.concatenate([u] * (negative + 1))
        contrib = sign[:, None] * hi[uu]                  # (rows, dim) int64
        out = pd.DataFrame({"_cand": cand})
        for j in range(dim):
            out[f"_s{j}"] = contrib[:, j]
        return out.groupby("_cand", sort=False, as_index=False).sum()

    parts = pairs.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    summed = hash_aggregate(
        parts, "_cand", {f"_s{j}": (f"_s{j}", "sum") for j in range(dim)},
        num_buckets=num_buckets)

    den = np.int64(2) * lr_div * 1_000_000 * m

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        nm = broadcast_get(names_ref)
        out = pd.DataFrame({node: nm[batch["_cand"].to_numpy(np.int64)]})
        for j in range(dim):
            S = batch[f"_s{j}"].to_numpy(np.int64)
            r = round_ratio_even(np.abs(S), np.full(len(S), den), 6)
            out[f"c_{j}"] = -np.sign(S) * r
        return out

    return summed.map_batches(finish, batch_format="pandas",
                              batch_size=None)
