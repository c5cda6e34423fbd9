"""Knowledge-graph embeddings (DistMult / ComplEx), from scratch.

Fills the reference's stellargraph KGE slot
(``backends/stellargraph/embed/embedders.py:49-57`` — the ``"complex"`` and
``"distmult"`` model names, trained there through TensorFlow; TF is absent in
this container) with direct numpy implementations:

* DistMult (Yang et al., ICLR 2015): score(s, r, o) = <e_s, w_r, e_o>.
* ComplEx (Trouillon et al., ICML 2016): complex-valued embeddings,
  score(s, r, o) = Re(<e_s, w_r, conj(e_o)>) — captures antisymmetric
  relations DistMult cannot.

Both train with the standard logistic loss over uniformly corrupted
negatives (LCWA), mini-batch SGD with L2 regularization, deterministic
under a seed.

Scale posture mirrors ``pipelines/hyperbolic.py``: the TRIPLE EXTRACTION is
distributed (any Dataset in, deduped + collected once, guarded by
``max_triples``) because an entity/relation vocabulary is small-side next to
a 100 TB corpus, and the reference itself trains single-machine; DOWNSTREAM
SCORING of arbitrarily many candidate triples stays fully distributed —
``score_triples`` broadcasts the trained tables once via ``ray.put`` and
evaluates inside ``map_batches`` (vectorized gather + einsum per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["kge_embeddings", "kge_score", "score_triples"]

_MODELS = ("distmult", "complex")


def _collect_triples(triples, src, rel, dst, num_buckets):
    if hasattr(triples, "to_pandas") and not isinstance(triples,
                                                        pd.DataFrame):
        from bluegraph_ray.util import hash_distinct
        pdf = hash_distinct(triples.select_columns([src, rel, dst]),
                            [src, rel, dst],
                            num_buckets=num_buckets).to_pandas()
    else:
        pdf = pd.DataFrame(triples)[[src, rel, dst]].drop_duplicates()
    return pdf.sort_values([src, rel, dst],
                           kind="stable").reset_index(drop=True)


def kge_score(model: str, es: np.ndarray, wr: np.ndarray,
              eo: np.ndarray) -> np.ndarray:
    """Triple score with broadcasting over leading axes; the last axis is
    the embedding dimension (ComplEx: first half real, second half imag)."""
    if model == "distmult":
        return np.sum(es * wr * eo, axis=-1)
    if model == "complex":
        d = es.shape[-1] // 2
        sr, si = es[..., :d], es[..., d:]
        rr, ri = wr[..., :d], wr[..., d:]
        orr, oi = eo[..., :d], eo[..., d:]
        return np.sum(sr * rr * orr + sr * ri * oi
                      + si * rr * oi - si * ri * orr, axis=-1)
    raise ValueError(f"unknown KGE model {model!r}; choose from {_MODELS}")


def _score_grads(model, es, wr, eo):
    """(score, d/des, d/dwr, d/deo) — all shaped like the inputs."""
    if model == "distmult":
        return (np.sum(es * wr * eo, axis=-1),
                wr * eo, es * eo, es * wr)
    d = es.shape[-1] // 2
    sr, si = es[..., :d], es[..., d:]
    rr, ri = wr[..., :d], wr[..., d:]
    orr, oi = eo[..., :d], eo[..., d:]
    score = np.sum(sr * rr * orr + sr * ri * oi
                   + si * rr * oi - si * ri * orr, axis=-1)
    des = np.concatenate([rr * orr + ri * oi, rr * oi - ri * orr], axis=-1)
    dwr = np.concatenate([sr * orr + si * oi, sr * oi - si * orr], axis=-1)
    deo = np.concatenate([sr * rr - si * ri, sr * ri + si * rr], axis=-1)
    return score, des, dwr, deo


def kge_embeddings(
    triples,
    *,
    model: str = "distmult",
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    dimension: int = 64,
    epochs: int = 30,
    negative: int = 10,
    learning_rate: float = 0.05,
    l2: float = 1e-6,
    batch_size: int = 2048,
    seed: int = 0,
    entity_max_norm: float = 1.0,
    max_triples: int = 50_000_000,
    num_buckets: int = 16,
) -> dict:
    """Train a KGE model on (src, rel, dst) triples and return
    ``{"nodes": DataFrame(@id, embedding), "relations": DataFrame(@id,
    embedding), "model": name}`` — the node frame is the reference's
    transductive-fit shape, the relation frame is what ``score_triples``
    needs. Deterministic in (triples, seed); negatives corrupt head or tail
    uniformly (Bordes et al. LCWA protocol).

    ComplEx uses ``dimension`` total floats per entity (``dimension // 2``
    complex components), so fits are size-comparable across models.
    """
    if model not in _MODELS:
        raise ValueError(f"unknown KGE model {model!r}; choose from "
                         f"{_MODELS}")
    if model == "complex" and dimension % 2:
        raise ValueError("complex model needs an even dimension "
                         "(real+imag halves)")
    pdf = _collect_triples(triples, src, rel, dst, num_buckets)
    if len(pdf) > max_triples:
        raise ValueError(
            f"kge_embeddings: {len(pdf)} distinct triples > max_triples="
            f"{max_triples}. The trainer is vectorized but single-machine "
            "(matching the reference's TF fit); sample the triple table or "
            "raise max_triples explicitly.")

    ents = np.sort(pd.unique(pd.concat([pdf[src], pdf[dst]]).to_numpy()))
    rels = np.sort(pd.unique(pdf[rel].to_numpy()))
    epos, rpos = pd.Index(ents), pd.Index(rels)
    ts = epos.get_indexer(pdf[src]).astype(np.int64)
    tr = rpos.get_indexer(pdf[rel]).astype(np.int64)
    to = epos.get_indexer(pdf[dst]).astype(np.int64)
    n, k, m = len(ents), len(rels), len(ts)
    rng = np.random.default_rng(seed)
    scale = 1.0 / np.sqrt(max(dimension, 1))
    E = rng.normal(0.0, scale, size=(n, dimension))
    R = rng.normal(0.0, scale, size=(max(k, 1), dimension))
    if m == 0:
        return {"nodes": pd.DataFrame({"@id": ents,
                                       "embedding": list(E[:0])}),
                "relations": pd.DataFrame({"@id": rels,
                                           "embedding": list(R[:0])}),
                "model": model}

    for _ in range(epochs):
        order = rng.permutation(m)
        for lo in range(0, m, batch_size):
            take = order[lo:lo + batch_size]
            b = len(take)
            # positives once + `negative` corruptions each (head/tail coin)
            bs = np.repeat(ts[take], negative + 1).reshape(b, negative + 1)
            br = np.repeat(tr[take], negative + 1).reshape(b, negative + 1)
            bo = np.repeat(to[take], negative + 1).reshape(b, negative + 1)
            corrupt = rng.integers(0, n, size=(b, negative), dtype=np.int64)
            heads = rng.random((b, negative)) < 0.5
            bs[:, 1:] = np.where(heads, corrupt, bs[:, 1:])
            bo[:, 1:] = np.where(heads, bo[:, 1:], corrupt)
            y = np.zeros((b, negative + 1))
            y[:, 0] = 1.0
            es, wr, eo = E[bs], R[br], E[bo]
            score, des, dwr, deo = _score_grads(model, es, wr, eo)
            # logistic loss: dL/dscore = sigmoid(score) - y (stable form)
            sig = np.where(score >= 0,
                           1.0 / (1.0 + np.exp(-np.maximum(score, 0))),
                           np.exp(np.minimum(score, 0))
                           / (1.0 + np.exp(np.minimum(score, 0))))
            g = (sig - y)[..., None]
            step = learning_rate
            upd_e = np.zeros_like(E)
            np.add.at(upd_e, bs.ravel(),
                      (g * des + l2 * es).reshape(-1, dimension))
            np.add.at(upd_e, bo.ravel(),
                      (g * deo + l2 * eo).reshape(-1, dimension))
            upd_r = np.zeros_like(R)
            np.add.at(upd_r, br.ravel(),
                      (g * dwr + l2 * wr).reshape(-1, dimension))
            E -= step * upd_e
            R -= step * upd_r
            # standard KGE constraint: project touched entity rows back to
            # ||e|| <= entity_max_norm (keeps the trilinear score bounded;
            # without it high-lr fits diverge)
            touched = np.unique(np.concatenate([bs.ravel(), bo.ravel()]))
            norms = np.linalg.norm(E[touched], axis=1, keepdims=True)
            over = norms[:, 0] > entity_max_norm
            if over.any():
                rows = touched[over]
                E[rows] *= entity_max_norm / norms[over]
    return {"nodes": pd.DataFrame({"@id": ents, "embedding": list(E)}),
            "relations": pd.DataFrame({"@id": rels,
                                       "embedding": list(R)}),
            "model": model}


def score_triples(
    triples,
    fit: dict,
    *,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    score_col: str = "score",
    batch_size: int = 65536,
):
    """Score a Dataset (or DataFrame) of candidate triples against a
    trained ``kge_embeddings`` fit — the distributed consumption path.
    The embedding tables are broadcast ONCE via ``ray.put`` and gathered
    inside ``map_batches``; unknown entities/relations score NaN."""
    model = fit["model"]
    ents = fit["nodes"]["@id"].to_numpy()
    E = (np.stack(fit["nodes"]["embedding"].to_numpy())
         if len(fit["nodes"]) else np.zeros((0, 1)))
    rels = fit["relations"]["@id"].to_numpy()
    R = (np.stack(fit["relations"]["embedding"].to_numpy())
         if len(fit["relations"]) else np.zeros((0, 1)))

    def _score_batch(batch: pd.DataFrame, tables) -> pd.DataFrame:
        ents, E, rels, R = tables
        epos, rpos = pd.Index(ents), pd.Index(rels)
        si = epos.get_indexer(batch[src])
        ri = rpos.get_indexer(batch[rel])
        oi = epos.get_indexer(batch[dst])
        ok = (si >= 0) & (ri >= 0) & (oi >= 0)
        out = np.full(len(batch), np.nan)
        if ok.any():
            out[ok] = kge_score(model, E[si[ok]], R[ri[ok]], E[oi[ok]])
        batch = batch.copy()
        batch[score_col] = out
        return batch

    if isinstance(triples, pd.DataFrame):
        return _score_batch(triples, (ents, E, rels, R))
    import ray

    ref = ray.put((ents, E, rels, R))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return _score_batch(batch, ray.get(ref))

    return triples.map_batches(fn, batch_format="pandas",
                               batch_size=batch_size)
