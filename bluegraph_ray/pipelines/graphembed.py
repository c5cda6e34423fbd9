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
