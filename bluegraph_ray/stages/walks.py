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
import ray.data

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors


def random_walks(
    handle: GraphHandle,
    *,
    length: int = 8,
    seed: int = 7,
    starts: np.ndarray | None = None,
    actors=None,
    output_path: str | None = None,
    weighted: bool = False,
):
    """-> DataFrame(walk_id, step, node) with step 0..length; walk_id and
    node are vertex NAMES, one walk per start (default: every vertex).
    Deterministic in (graph, seed, length) only.

    ``output_path``: the 100 TB path — each superstep's (walk_id, step,
    node) slab is written to partitioned Parquet as it is produced (one
    file per step, walk_id-sorted) and a lazy ``ray.data.Dataset`` over the
    directory is returned instead of a DataFrame; the driver then only ever
    holds the O(#walks) position vector (the rank-vector contract), never
    the full (length+1)×walks trace."""
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
        start_ids = pos.copy()
        n_walks = len(pos)
        names = np.asarray(handle.names)

        sink = None
        trace = None
        if output_path is not None:
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(output_path, exist_ok=True)

            def sink(step: int, nodes: np.ndarray) -> None:
                pq.write_table(
                    pa.table({"walk_id": names[start_ids],
                              "step": np.full(n_walks, step, dtype=np.int64),
                              "node": names[nodes]}),
                    os.path.join(output_path, f"step={step:05d}.parquet"))
        else:
            trace = np.empty((length + 1, n_walks), dtype=np.int64)

        if sink is not None:
            sink(0, pos)
        else:
            trace[0] = pos
        for t in range(1, length + 1):
            ref = ray.put(pos)
            step_fn = ("walk_step_weighted" if weighted else "walk_step")
            parts = ray.get(
                [getattr(a, step_fn).remote(ref, t, seed) for a in actors])
            nxt = np.empty(n_walks, dtype=np.int64)
            for idx, vals in parts:
                nxt[idx] = vals
            pos = nxt
            if sink is not None:
                sink(t, pos)
            else:
                trace[t] = pos
        if output_path is not None:
            return ray.data.read_parquet(output_path)
        wid = np.tile(np.arange(n_walks, dtype=np.int64), length + 1)
        steps = np.repeat(np.arange(length + 1, dtype=np.int64), n_walks)
        return pd.DataFrame({
            "walk_id": names[start_ids[wid]],
            "step": steps,
            "node": names[trace.ravel()],
        })
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)


def _pq_multipliers(p: float, q: float) -> tuple[int, int, int]:
    """node2vec bias factors (1/p, 1, 1/q) scaled to the smallest integer
    triple (m_ret, m_base, m_far). Exact for rational p, q (floats are
    snapped via limit_denominator) — the integer multipliers are what make
    the multiset draw exact and SQL-replayable."""
    from fractions import Fraction
    from math import gcd, lcm

    a_ret = 1 / Fraction(p).limit_denominator(10**6)
    a_base = Fraction(1)
    a_far = 1 / Fraction(q).limit_denominator(10**6)
    scale = lcm(a_ret.denominator, a_base.denominator, a_far.denominator)
    m = [int(a * scale) for a in (a_ret, a_base, a_far)]
    g = gcd(*m)
    return m[0] // g, m[1] // g, m[2] // g


def random_walks_biased(
    handle: GraphHandle,
    *,
    length: int = 8,
    seed: int = 7,
    p: float = 1.0,
    q: float = 1.0,
    starts: np.ndarray | None = None,
    actors=None,
    output_path: str | None = None,
):
    """node2vec-style second-order biased walks (reference surface:
    ``backends/stellargraph/embed/embedders.py:49`` node2vec; semantics from
    Grover & Leskovec 2016). -> DataFrame(walk_id, step, node), names.

    Transition from (prev, cur): each neighbour x of cur weighs
    w(cur,x) x alpha, alpha = 1/p if x == prev, 1 if x is a neighbour of
    prev, 1/q otherwise. The alphas become exact integer multipliers
    (:func:`_pq_multipliers`) on the arc-weight multiset, so the draw stays
    an exact categorical sample, deterministic in (graph, seed), and
    SQL-replayable (oracle_sql()["walk_biased_parts"]). Step 1 has no prev
    and is the plain weighted first-order draw (walk_step_weighted).

    Partitioning: a two-phase in-object-store exchange per superstep — see
    CsrPartition.n2v_candidates/n2v_draw. Driver state stays O(#walks)
    (two position vectors + refs); candidate blocks never leave plasma.
    """
    if handle.directed:
        raise ValueError("random walks need undirected handles (a directed "
                         "sink would strand the walk); build with "
                         "directed=False or walk the bidirected expansion")
    m_ret, m_base, m_far = _pq_multipliers(p, q)
    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        pos = (np.arange(handle.n, dtype=np.int64) if starts is None
               else np.asarray(starts, dtype=np.int64))
        start_ids = pos.copy()
        prev = np.full(len(pos), -1, dtype=np.int64)
        n_walks = len(pos)
        names = np.asarray(handle.names)
        boundaries = np.asarray(
            handle.boundaries
            or [(j * handle.n) // handle.n_partitions
                for j in range(handle.n_partitions + 1)], dtype=np.int64)
        n_parts = len(actors)

        sink = None
        trace = None
        if output_path is not None:
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(output_path, exist_ok=True)

            def sink(step: int, nodes: np.ndarray) -> None:
                pq.write_table(
                    pa.table({"walk_id": names[start_ids],
                              "step": np.full(n_walks, step, dtype=np.int64),
                              "node": names[nodes]}),
                    os.path.join(output_path, f"step={step:05d}.parquet"))
        else:
            trace = np.empty((length + 1, n_walks), dtype=np.int64)

        def emit(step, nodes):
            if sink is not None:
                sink(step, nodes)
            else:
                trace[step] = nodes

        emit(0, pos)
        for t in range(1, length + 1):
            pos_ref = ray.put(pos)
            if t == 1:
                parts = ray.get([a.walk_step_weighted.remote(pos_ref, t, seed)
                                 for a in actors])
            else:
                prev_ref = ray.put(prev)
                # phase A: candidate blocks, pre-split by owner-of-prev;
                # refs only — the data moves worker-to-worker in plasma
                if n_parts > 1:
                    blocks = [a.n2v_candidates.options(num_returns=n_parts)
                              .remote(pos_ref, prev_ref, boundaries)
                              for a in actors]
                    draws = [actors[j].n2v_draw.remote(
                                 prev_ref, t, seed, m_ret, m_base, m_far,
                                 *[blocks[i][j] for i in range(n_parts)])
                             for j in range(n_parts)]
                else:
                    blocks = [a.n2v_candidates.remote(pos_ref, prev_ref,
                                                      boundaries)
                              for a in actors]
                    draws = [actors[0].n2v_draw.remote(
                                 prev_ref, t, seed, m_ret, m_base, m_far,
                                 blocks[0])]
                parts = ray.get(draws)
            nxt = np.empty(n_walks, dtype=np.int64)
            for idx, vals in parts:
                nxt[idx] = vals
            prev = pos
            pos = nxt
            emit(t, pos)
        if output_path is not None:
            return ray.data.read_parquet(output_path)
        wid = np.tile(np.arange(n_walks, dtype=np.int64), length + 1)
        steps = np.repeat(np.arange(length + 1, dtype=np.int64), n_walks)
        return pd.DataFrame({
            "walk_id": names[start_ids[wid]],
            "step": steps,
            "node": names[trace.ravel()],
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
    work, no Python loop over rows. For walk tables too big to hold
    driver-side use :func:`skipgram_pairs_ds` — the same kernel inside
    walk-id-bucketed map_groups tasks."""
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


def skipgram_pairs_ds(
    walks: "ray.data.Dataset",
    *,
    window: int = 2,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed :func:`skipgram_pairs`: the walk Dataset is bucketed by
    hash(walk_id) — every walk's rows meet in exactly one bucket, each
    bucket runs the same pivot-and-slice kernel, and one hash aggregate
    sums the per-bucket pair counts. Nothing walk-shaped ever sits on the
    driver; identical counts to the in-memory form
    (tests/test_graph_stages.py)."""
    from bluegraph_ray.util import hash_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = (
            pd.util.hash_pandas_object(batch["walk_id"], index=False)
            .to_numpy() % num_buckets
        ).astype(np.int64)
        return batch

    per_bucket = (
        walks.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(
            lambda g: skipgram_pairs(g.drop(columns=["_bucket"]),
                                     window=window),
            batch_format="pandas")
    )
    return hash_aggregate(per_bucket, ["center", "context"],
                          {"n": ("n", "sum")}, num_buckets=num_buckets)
