"""Deterministic random-walk corpus generation (DeepWalk/node2vec input).

The reference trains node embeddings through StellarGraph's walk-based
models (``backends/stellargraph/embed/embedders.py:49-57`` — node2vec /
attri2vec walk corpora feeding Word2Vec); this stage is the scale path for
the corpus itself. One walk per start vertex, advanced in BSP supersteps on
the shared CsrPartition actors: superstep t moves every walk one hop, with
the next vertex chosen as the in-neighbour u minimizing
``h(seed, walk_id, t, u)`` (ties -> min u), a splitmix64-style uint64 mix
(stages/build.walk_step).

Why hash-argmin instead of a PRNG: the choice is a pure function of
(seed, walk id, step, candidate), so the corpus is bitwise identical across
arc storage order, partition layout and cluster size — the same property
that makes PageRank resumable — and each vertex's transition is still an
(approximately) uniform draw over its neighbours, fresh per step and per
walk. It is also exactly replayable by a recursive-CTE SQL oracle
(HUGEINT-mod-2^64 arithmetic), which turns "random" walks into a
hash-verifiable query (__ray_entry__.oracle_sql()["walk_corpus_parts"]).

Driver state is the O(#walks) position vector (the rank-vector contract);
at corpus scale, emit each superstep's (walk, step, node) batch straight to
partitioned Parquet instead of accumulating.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors


def random_walks(
    handle: GraphHandle,
    *,
    length: int = 8,
    seed: int = 7,
    starts: np.ndarray | None = None,
    actors=None,
) -> pd.DataFrame:
    """-> DataFrame(walk_id, step, node) with step 0..length; walk_id and
    node are vertex NAMES, one walk per start (default: every vertex).
    Deterministic in (graph, seed, length) only."""
    if handle.directed:
        raise ValueError("random walks need undirected handles (a directed "
                         "sink would strand the walk); build with "
                         "directed=False or walk the bidirected expansion")
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        pos = (np.arange(handle.n, dtype=np.int64) if starts is None
               else np.asarray(starts, dtype=np.int64))
        n_walks = len(pos)
        trace = np.empty((length + 1, n_walks), dtype=np.int64)
        trace[0] = pos
        for t in range(1, length + 1):
            ref = ray.put(pos)
            parts = ray.get(
                [a.walk_step.remote(ref, t, seed) for a in actors])
            nxt = np.empty(n_walks, dtype=np.int64)
            for idx, vals in parts:
                nxt[idx] = vals
            pos = nxt
            trace[t] = pos
        wid = np.tile(np.arange(n_walks, dtype=np.int64), length + 1)
        steps = np.repeat(np.arange(length + 1, dtype=np.int64), n_walks)
        start_ids = (np.arange(handle.n, dtype=np.int64) if starts is None
                     else np.asarray(starts, dtype=np.int64))
        return pd.DataFrame({
            "walk_id": np.asarray(handle.names)[start_ids[wid]],
            "step": steps,
            "node": np.asarray(handle.names)[trace.ravel()],
        })
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)


def skipgram_pairs(
    walks: pd.DataFrame,
    *,
    window: int = 2,
) -> pd.DataFrame:
    """(walk_id, step, node) walk table -> (center, context, n) skip-gram
    pair counts with 1 <= |Δstep| <= ``window`` within each walk — the
    DeepWalk/node2vec training-pair reshape. Feeding these counts to the
    PPMI-SVD embedder (pipelines/textembed.py) completes a from-scratch
    walk-based node-embedding pipeline.

    Vectorized: the walk table pivots to an (L+1, n_walks) int matrix; each
    offset d contributes two aligned slices (both directions); counts come
    from one np.unique over packed (center, context) codes. O(walks·L·w)
    work, no Python loop over rows. At corpus scale the same logic runs
    inside map_batches over walk-id-partitioned blocks (a walk's rows stay
    in one block by construction — walk_id is the partition key)."""
    piv = walks.pivot(index="step", columns="walk_id", values="node")
    piv = piv.sort_index()
    names, inv = np.unique(piv.to_numpy().ravel(), return_inverse=True)
    mat = inv.reshape(piv.shape)
    n = len(names)
    codes = []
    steps = mat.shape[0]
    for d in range(1, window + 1):
        if d >= steps:
            break
        a = mat[:-d].ravel()
        b = mat[d:].ravel()
        codes.append(a.astype(np.int64) * n + b)  # center earlier
        codes.append(b.astype(np.int64) * n + a)  # center later
    if not codes:
        return pd.DataFrame({"center": [], "context": [], "n": []})
    uniq, cnt = np.unique(np.concatenate(codes), return_counts=True)
    return pd.DataFrame({
        "center": names[uniq // n],
        "context": names[uniq % n],
        "n": cnt.astype(np.int64),
    })
