"""DeepWalk-style node embeddings, fully from scratch.

The reference trains node2vec through StellarGraph + gensim Word2Vec
(``backends/stellargraph/embed/embedders.py:49-57``); neither is in this
container, and the classic result (Levy & Goldberg 2014) is that skip-gram
with negative sampling implicitly factorizes the shifted-PPMI matrix of the
training pairs — so the same embedding arises from the engine's existing
pieces, with every stage before the SVD hash-verified by a DuckDB oracle:

1. deterministic walk corpus (stages/walks.random_walks — hash-argmin
   supersteps, oracle ``walk_corpus_parts``);
2. skip-gram pair counts within a window (stages/walks.skipgram_pairs,
   oracle ``walk_skipgrams``);
3. shifted-PPMI + randomized SVD over the pair counts
   (pipelines/textembed.ppmi_svd_factorize — the same core the text
   embedder uses; seeded, deterministic).

The result is a drop-in for the embedder lifecycle: (node, embedding)
rows, usable by EmbeddingPipeline / SimilarityProcessor / the downstream
classifiers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bluegraph_ray.stages.build import GraphHandle


def deepwalk_embeddings(
    handle: GraphHandle,
    *,
    dimension: int = 32,
    length: int = 8,
    window: int = 2,
    seed: int = 7,
    shift: float = 1.0,
    svd_seed: int = 0,
    power_iters: int = 2,
    actors=None,
) -> pd.DataFrame:
    """-> DataFrame(node, embedding): one walk per vertex, skip-gram
    counts, shifted-PPMI SVD. Deterministic in (graph, seeds)."""
    from bluegraph_ray.pipelines.textembed import ppmi_svd_factorize
    from bluegraph_ray.stages.walks import random_walks, skipgram_pairs

    walks = random_walks(handle, length=length, seed=seed, actors=actors)
    return _pairs_to_embeddings(handle, walks, window, dimension, shift,
                                svd_seed, power_iters)


def node2vec_embeddings(
    handle: GraphHandle,
    *,
    dimension: int = 32,
    length: int = 8,
    window: int = 2,
    p: float = 0.5,
    q: float = 2.0,
    seed: int = 7,
    shift: float = 1.0,
    svd_seed: int = 0,
    power_iters: int = 2,
    actors=None,
) -> pd.DataFrame:
    """node2vec: the same shifted-PPMI SVD factorization fed by p/q-BIASED
    second-order walks (stages/walks.random_walks_biased — the reference's
    node2vec surface, ``backends/stellargraph/embed/embedders.py:49``,
    rebuilt without gensim). Walk + skip-gram stages are hash-verified
    (oracles ``walk_biased_parts`` / ``walk_biased_skipgrams``); the SVD is
    seeded and deterministic."""
    from bluegraph_ray.stages.walks import random_walks_biased

    walks = random_walks_biased(handle, length=length, seed=seed, p=p, q=q,
                                actors=actors)
    return _pairs_to_embeddings(handle, walks, window, dimension, shift,
                                svd_seed, power_iters)


def fastrp_embeddings(
    handle: GraphHandle,
    *,
    dimension: int = 8,
    iteration_weights: tuple = (1.0, 1.0, 0.8),
    seed: int = 7,
    actors=None,
) -> pd.DataFrame:
    """FastRP (Chen et al. 2019, "Fast and Accurate Network Embeddings via
    Very Sparse Random Projection") — the classic sketch-propagation node
    embedder, fully distributed and, unlike the walk family, completely
    deterministic end to end (no PRNG: the very-sparse projection is drawn
    from the engine's splitmix64-style hash of (node id, dim), so the whole
    pipeline is SQL-replayable — oracle ``fastrp_embed``).

    init   R[v,k] = +sqrt(3) if h(v,k) % 6 == 0, -sqrt(3) if == 1, else 0
           (Achlioptas / very-sparse JL with s = 3)
    step i X <- D^-1 A X   (mean over weighted in-neighbours; one
           ``mat_gather`` superstep on the shared CsrPartition actors),
           then per-node L2 normalization (zero rows stay zero)
    out    sum_i iteration_weights[i] * X_i

    One (n, d) dense vector lives on the driver per superstep — the same
    memory contract as PageRank/eigenvector; everything edge-shaped stays
    in the actors. Returns DataFrame(node, embedding)."""
    import ray

    from bluegraph_ray.stages.build import (_WALK_C1, _WALK_C2, _WALK_C3,
                                            _WALK_C4, make_partition_actors,
                                            out_weights)

    own = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        n = handle.n
        did = np.arange(n, dtype=np.uint64)
        X = np.zeros((n, dimension), dtype=np.float64)
        root3 = np.sqrt(3.0)
        with np.errstate(over="ignore"):
            for k in range(dimension):
                h = ((did * _WALK_C1)
                     ^ (np.uint64(k + seed) * _WALK_C2)
                     ^ (did * _WALK_C3)) * _WALK_C4
                r = h % np.uint64(6)
                X[:, k] = np.where(r == 0, root3,
                                   np.where(r == 1, -root3, 0.0))
        inw = out_weights(handle, actors)  # undirected: in-weight == out
        inv = np.divide(1.0, inw, out=np.zeros_like(inw), where=inw > 0)
        emb = np.zeros_like(X)
        for wt in iteration_weights:
            ref = ray.put(X)
            X = np.concatenate(
                ray.get([a.mat_gather.remote(ref) for a in actors]), axis=0)
            X *= inv[:, None]
            nrm = np.sqrt((X * X).sum(axis=1))
            X /= np.where(nrm > 0.0, nrm, 1.0)[:, None]
            emb += wt * X
        return pd.DataFrame({"node": list(np.asarray(handle.names)),
                             "embedding": list(emb)})
    finally:
        if own:
            for a in actors:
                ray.kill(a)


def watchyourstep_embeddings(
    edges,
    *,
    src: str = "src",
    dst: str = "dst",
    dimension: int = 32,
    window: int = 5,
    num_walks: int = 80,
    neg_coef: float = 5.0,
    epochs: int = 200,
    learning_rate: float = 0.05,
    seed: int = 0,
    undirected: bool = True,
    max_nodes: int = 4000,
    num_buckets: int = 16,
) -> dict:
    """Watch Your Step (Abu-El-Haija et al., NeurIPS 2018) from scratch —
    the reference's stellargraph ``"watchyourstep"`` name
    (``backends/stellargraph/embed/embedders.py:52``, trained there through
    TF's AdjacencyPowerGenerator + graph_log_likelihood; both absent here).

    Learns attention q = softmax(theta) over transition-matrix powers
    T^1..T^window plus split embeddings L, R by gradient descent on the
    graph log-likelihood
    ``-sum_ij [ num_walks*E_ij*logsig(L R^T) + neg_coef*[A=0]*log(1-sig) ]``
    with E = sum_k q_k T^k. Like the reference's generator, the trainer
    materializes DENSE n x n walk matrices, so it is hard-guarded by
    ``max_nodes`` — this is a transductive small-graph model by
    construction; corpus-scale embeddings belong to the walk family
    (deepwalk/node2vec above). Returns {"nodes": DataFrame(node,
    embedding) with embedding = [L ; R], "attention": q}."""
    if hasattr(edges, "to_pandas") and not isinstance(edges, pd.DataFrame):
        from bluegraph_ray.util import hash_distinct
        pdf = hash_distinct(edges.select_columns([src, dst]), [src, dst],
                            num_buckets=num_buckets).to_pandas()
    else:
        pdf = pd.DataFrame(edges)[[src, dst]].drop_duplicates()
    pdf = pdf.sort_values([src, dst], kind="stable").reset_index(drop=True)
    names = np.sort(pd.unique(pd.concat([pdf[src], pdf[dst]]).to_numpy()))
    n = len(names)
    if n > max_nodes:
        raise ValueError(
            f"watchyourstep_embeddings: {n} nodes > max_nodes={max_nodes}. "
            "WYS materializes dense n^2 transition powers (as the "
            "reference's TF generator does); use the distributed walk "
            "family (deepwalk/node2vec) at corpus scale or raise "
            "max_nodes explicitly.")
    half = dimension // 2
    if n == 0:
        return {"nodes": pd.DataFrame({"node": names, "embedding": []}),
                "attention": np.array([])}
    pos = pd.Index(names)
    si = pos.get_indexer(pdf[src]).astype(np.int64)
    di = pos.get_indexer(pdf[dst]).astype(np.int64)
    A = np.zeros((n, n))
    A[si, di] = 1.0
    if undirected:
        A[di, si] = 1.0
    T = A / np.maximum(A.sum(axis=1, keepdims=True), 1.0)
    powers = [T]
    for _ in range(window - 1):
        powers.append(powers[-1] @ T)
    powers = np.stack(powers)                     # (window, n, n)
    zmask = (A == 0).astype(float)
    np.fill_diagonal(zmask, 0.0)

    rng = np.random.default_rng(seed)
    L = rng.normal(0.0, 1.0 / np.sqrt(max(half, 1)), size=(n, half))
    R = rng.normal(0.0, 1.0 / np.sqrt(max(half, 1)), size=(n, half))
    theta = np.zeros(window)
    for _ in range(epochs):
        q = np.exp(theta - theta.max())
        q /= q.sum()
        E = num_walks * np.einsum("k,kij->ij", q, powers)
        S = L @ R.T
        P = 1.0 / (1.0 + np.exp(-np.clip(S, -30, 30)))
        dS = -(E * (1.0 - P)) + neg_coef * zmask * P
        logsig = np.minimum(S, 0.0) - np.log1p(np.exp(-np.abs(S)))
        dq = -num_walks * np.einsum("kij,ij->k", powers, logsig)
        dtheta = q * (dq - float(q @ dq))
        L -= learning_rate * (dS @ R) / n
        R -= learning_rate * (dS.T @ L) / n
        theta -= learning_rate * dtheta / (n * n)
    q = np.exp(theta - theta.max())
    q /= q.sum()
    emb = np.concatenate([L, R], axis=1)
    return {"nodes": pd.DataFrame({"node": list(names),
                                   "embedding": list(emb)}),
            "attention": q}


def _pairs_to_embeddings(handle, walks, window, dimension, shift, svd_seed,
                         power_iters) -> pd.DataFrame:
    from bluegraph_ray.pipelines.textembed import ppmi_svd_factorize
    from bluegraph_ray.stages.walks import skipgram_pairs

    pairs = skipgram_pairs(walks, window=window)
    names = np.asarray(handle.names)
    idx = pd.Index(names)
    wi = idx.get_indexer(pairs["center"].to_numpy())
    ci = idx.get_indexer(pairs["context"].to_numpy())
    mat = ppmi_svd_factorize(
        wi, ci, pairs["n"].to_numpy(), handle.n, dimension,
        shift=shift, seed=svd_seed, power_iters=power_iters)
    return pd.DataFrame({"node": list(names), "embedding": list(mat)})
