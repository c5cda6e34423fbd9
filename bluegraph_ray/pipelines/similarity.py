"""Similarity search over an embedding column (``list<float>``).

The reference wraps Faiss flat / IVF indexes and sklearn trees
(/root/reference/bluegraph/downstream/similarity.py:140-282). Faiss isn't in
this container; the Ray-native re-expression is:

- ``knn_topk``: brute-force cosine top-k — the query matrix is broadcast ONCE
  via ``ray.put``; every batch computes one matmul block of the similarity
  matrix and pre-reduces to its local top-k (map-side combine), then a single
  small ``groupby(query).map_groups`` finishes the global top-k. Streams the
  corpus; never materializes it.
- ``lsh_topk``: the scale path — random-hyperplane LSH (IVF-like bucketing):
  corpus and queries are bucketed by sign-pattern; only matching buckets are
  scanned (with multi-probe by flipping low-margin bits). Approximate;
  recall/probe tradeoff documented in the test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_topk(
    corpus: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Exact cosine top-k: -> (query_id, neighbor_id, cosine).

    One ordering everywhere: raw (unrounded) cosine descending, tie-break
    neighbor_id ascending — in BOTH the map-side block top-k and the final
    reduce, matching the DuckDB oracle's ORDER BY similarity DESC, vec_id.
    The cosine column is rounded only when emitted from the final reduce.
    """
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids), q))

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        m = _norm_rows(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = qm @ m.T  # (nq, batch)
        rows = []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            # primary: raw cosine desc; tie-break: neighbor_id asc
            take = idx[np.lexsort((ids[idx], -s[idx]))[: k]]
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": ids[take],
                        "cosine": s[take],
                    }
                )
            )
        if not rows:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        return pd.concat(rows, ignore_index=True)

    partial = corpus.select_columns([id_col, vec_col]).map_batches(
        block_topk, batch_format="pandas", batch_size=None)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "neighbor_id"], ascending=[False, True],
                              kind="mergesort").head(k)
        g["cosine"] = np.round(g["cosine"].to_numpy(), 6)
        return g

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def lsh_topk(
    corpus: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
    n_probes: int = 8,
    dim: int | None = None,
    seed: int = 13,
) -> "ray.data.Dataset":
    """Approximate top-k via random-hyperplane buckets + multi-probe.

    Corpus rows are assigned ONE bucket (sign pattern of ``n_planes``
    projections); each query probes its own bucket plus the ``n_probes-1``
    next buckets by flipping the lowest-|margin| bits. Only matching buckets
    are scanned — at scale this is the IVF layout: bucket = partition key.
    """
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    if dim is None:
        dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes.T) > 0) @ (1 << np.arange(n_planes))

    # query probe sets
    proj = q @ planes.T
    base = (proj > 0) @ (1 << np.arange(n_planes))
    probe_sets = []
    for i in range(len(q)):
        order = np.argsort(np.abs(proj[i]))  # lowest margin first
        probes = {int(base[i])}
        for r in range(1, n_probes):
            flip = int(base[i]) ^ int(1 << order[(r - 1) % n_planes])
            probes.add(flip)
        probe_sets.append(probes)
    wanted: dict[int, list[int]] = {}
    for qi, probes in enumerate(probe_sets):
        for b in probes:
            wanted.setdefault(b, []).append(qi)
    q_ref = ray.put((np.asarray(query_ids), q, wanted))

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qm, want = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        m = _norm_rows(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        bks = bucket_of(m)
        rows = []
        for b in np.unique(bks):
            if int(b) not in want:
                continue
            sel = bks == b
            sub_ids, sub_m = ids[sel], m[sel]
            for qi in want[int(b)]:
                s = sub_m @ qm[qi]
                mask = sub_ids != qids[qi]
                idx = np.flatnonzero(mask)
                if not len(idx):
                    continue
                take = idx[np.lexsort((sub_ids[idx], -s[idx]))[: k]]
                rows.append(pd.DataFrame({
                    "query_id": qids[qi],
                    "neighbor_id": sub_ids[take],
                    "cosine": s[take],
                }))
        if not rows:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        return pd.concat(rows, ignore_index=True)

    partial = corpus.select_columns([id_col, vec_col]).map_batches(scan, batch_format="pandas", batch_size=None)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("neighbor_id").sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g["cosine"] = np.round(g["cosine"].to_numpy(), 6)
        return g

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")
