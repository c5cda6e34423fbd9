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


def _hash_embed(keys, prefix: str, dim: int) -> np.ndarray:
    """Deterministic SQL-replayable init: entry (k, j) =
    ((sha256(f"{prefix}|{k}|{j}") first-8-bytes % 2001) - 1000) / 10000.0 —
    exact 4-decimal values in [-0.1, 0.1] that DuckDB regenerates with the
    same sha256-prefix expression (the repo's standard oracle hash)."""
    import hashlib

    out = np.empty((len(keys), dim), dtype=np.float64)
    sfx = [str(j).encode() for j in range(dim)]
    for i, k in enumerate(keys):
        base = hashlib.sha256(f"{prefix}|{k}|".encode())
        for j in range(dim):
            h = base.copy()
            h.update(sfx[j])
            out[i, j] = (int.from_bytes(h.digest()[:8], "big")
                         % 2001 - 1000) / 10000.0
    return out


def distmult_step(
    triples,
    *,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    dim: int = 4,
    negative: int = 4,
    lr_div: int = 20,
    num_buckets: int = 16,
):
    """ONE deterministic full-batch DistMult SGD step on the entity table,
    every intermediate SQL-replayable — the KGE companion to
    ``pipelines/sage.attri2vec_step`` (round-4 VERDICT item 5; the
    multi-epoch ``kge_embeddings`` fit stays rows-only).

    Spec shared with the DuckDB oracle (identical doubles by construction):

    - init: E0 / R0 from :func:`_hash_embed` (sha256-lattice exact
      decimals; no RNG state, no literals to inline beyond the formula);
    - score(s, r, cand) = (((p0·o0 + p1·o1) + p2·o2) + p3·o3) with
      p_j = E0[s,j]·R0[r,j] — parenthesization fixed to match the SQL
      expression text, so the doubles are bit-identical;
    - negatives: slot i corrupts the object to the entity of rank
      sha256(s|r|o|i) % n_ent in sorted-entity order;
    - gradient of the sigmoid-BCE wrt E[cand, j] is g·p_j with
      g = sigmoid(score) − y; each row's contribution is quantized to
      int64 nano-units ``round_half_away((g·p_j)·1e9)`` so the global fold
      is EXACT integer math under any block order;
    - update: −lr · mean over positive triples m, emitted as
      sign · round_ratio_even(|S|, lr_div·1e9·m, 6).

    The entity vocabulary is collected driver-side (it IS the id map —
    same small-side contract as the trainers); the triple scan itself is
    distributed. Returns Dataset (node, c_0 … c_{dim-1})."""
    import hashlib

    import ray.data
    from bluegraph_ray.util import (broadcast_get, hash_aggregate,
                                    hash_distinct, rename_columns,
                                    round_ratio_even)

    if isinstance(triples, pd.DataFrame):
        triples = ray.data.from_pandas(triples)
    trip = triples.select_columns([src, rel, dst]).materialize()
    m = trip.count()

    ents = np.sort(hash_distinct(
        rename_columns(trip.select_columns([src]), {src: "e"}).union(
            rename_columns(trip.select_columns([dst]), {dst: "e"})),
        "e", num_buckets=num_buckets).to_pandas()["e"].to_numpy())
    from bluegraph_ray.util import distinct_values
    rels = distinct_values(trip.select_columns([rel]), rel)
    n_ent = len(ents)
    E0 = _hash_embed(ents, "E", dim)
    R0 = _hash_embed(rels, "R", dim)
    e_ref, E_ref = ray.put(ents), ray.put(E0)
    r_ref, R_ref = ray.put(rels), ray.put(R0)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ent_idx = pd.Index(broadcast_get(e_ref))
        rel_idx = pd.Index(broadcast_get(r_ref))
        E = broadcast_get(E_ref)
        R = broadcast_get(R_ref)
        s = ent_idx.get_indexer(batch[src].to_numpy())
        r = rel_idx.get_indexer(batch[rel].to_numpy())
        o = ent_idx.get_indexer(batch[dst].to_numpy())
        P = E[s] * R[r]                                   # (rows, dim)
        cands, ys = [o], [np.ones(len(s))]
        ss, rr, oo = (batch[src].to_numpy(), batch[rel].to_numpy(),
                      batch[dst].to_numpy())
        # one sha of the (s|r|o|) prefix per row, slot digests via copied
        # state — identical bytes to sha256(f"{a}|{b}|{c}|{i}")
        bases = [hashlib.sha256(f"{a}|{b}|{c}|".encode())
                 for a, b, c in zip(ss, rr, oo)]
        for i in range(1, negative + 1):
            sfx = str(i).encode()

            def draw(base):
                h = base.copy()
                h.update(sfx)
                return int.from_bytes(h.digest()[:8], "big") % n_ent

            negs = np.fromiter((draw(b) for b in bases),
                               count=len(s), dtype=np.int64)
            cands.append(negs)
            ys.append(np.zeros(len(s)))
        out_rows = []
        for cand, y in zip(cands, ys):
            Ec = E[cand]
            # left-fold sum, matching the SQL text ((t0+t1)+t2)+...
            score = P[:, 0] * Ec[:, 0]
            for j in range(1, dim):
                score = score + P[:, j] * Ec[:, j]
            g = 1.0 / (1.0 + np.exp(-score)) - y
            from bluegraph_ray.util import round_half_away
            part = pd.DataFrame({"_cand": cand})
            for j in range(dim):
                part[f"_s{j}"] = round_half_away(
                    (g * P[:, j]) * 1e9).astype(np.int64)
            out_rows.append(part)
        out = pd.concat(out_rows, ignore_index=True)
        return out.groupby("_cand", sort=False, as_index=False).sum()

    parts = trip.map_batches(partial, batch_format="pandas",
                             batch_size=None)
    summed = hash_aggregate(
        parts, "_cand", {f"_s{j}": (f"_s{j}", "sum") for j in range(dim)},
        num_buckets=num_buckets)
    den = np.int64(lr_div) * 1_000_000_000 * m

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        names = broadcast_get(e_ref)
        out = pd.DataFrame({"node": names[batch["_cand"].to_numpy(np.int64)]})
        for j in range(dim):
            S = batch[f"_s{j}"].to_numpy(np.int64)
            rr_ = round_ratio_even(np.abs(S), np.full(len(S), den), 6)
            out[f"c_{j}"] = -np.sign(S) * rr_
        return out

    return summed.map_batches(finish, batch_format="pandas",
                              batch_size=None)
