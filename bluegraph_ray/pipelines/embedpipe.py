"""Embedding pipeline — the reference's ``EmbeddingPipeline`` lifecycle
(preprocessor -> embedder -> similarity index, fit/predict + persistence;
/root/reference/bluegraph/downstream/pipelines.py:27-240 and the
``GraphElementEmbedder`` contract /root/reference/bluegraph/core/embed/
embedders.py:159-246) re-expressed without TF/gensim/StellarGraph (absent in
this environment).

The embedder here is a from-scratch **propagation embedder** (APPNP-style
personalized propagation, public knowledge): seeded random features X0, then
``X <- (1-a)·X0 + a·D^-1 A X`` supersteps over the SAME CSR partition actors
the PageRank/CC/LPA stages use (one ``mat_gather`` per superstep — a (n,d)
matrix instead of a rank vector; identical partitioning, broadcast, and skew
behavior). It is transductive (like node2vec/Poincare in the reference's
model lists, backends/stellargraph/embed/embedders.py:49-57) and fully
deterministic given (n, dimension, seed, n_partitions).

Persistence is a directory of artifacts (embedding parquet + params JSON)
instead of the reference's zip — the scale-friendly layout.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray

from bluegraph_ray.pipelines.simindex import SimilarityProcessor
from bluegraph_ray.stages.build import (
    build_graph,
    make_partition_actors,
    out_weights,
)


class PropagationEmbedder:
    """Transductive node embedder: ``fit_model(edges) -> DataFrame`` with one
    embedding row per node (the reference contract: embedding table indexed by
    node id, core/embed/embedders.py:193-217)."""

    def __init__(self, dimension: int = 32, iters: int = 3, alpha: float = 0.85,
                 seed: int = 0, weight: str | None = None):
        self.dimension = dimension
        self.iters = iters
        self.alpha = alpha
        self.seed = seed
        self.weight = weight

    def params(self) -> dict:
        return {"dimension": self.dimension, "iters": self.iters,
                "alpha": self.alpha, "seed": self.seed, "weight": self.weight}

    def fit_model(self, edges: "ray.data.Dataset", *, n_partitions: int = 4,
                  src: str = "src", dst: str = "dst") -> pd.DataFrame:
        handle = build_graph(edges, src=src, dst=dst, weight=self.weight,
                             directed=False, n_partitions=n_partitions)
        actors = make_partition_actors(handle)
        try:
            n = handle.n
            outw = out_weights(handle, actors)
            inv = np.where(outw > 0, 1.0 / np.where(outw > 0, outw, 1.0), 0.0)
            x0 = np.random.default_rng(self.seed).standard_normal(
                (n, self.dimension))
            x0 /= np.maximum(np.linalg.norm(x0, axis=1, keepdims=True), 1e-12)
            x = x0
            for _ in range(self.iters):
                xw_ref = ray.put(x * inv[:, None])
                parts = ray.get([a.mat_gather.remote(xw_ref) for a in actors])
                agg = np.concatenate(parts, axis=0)
                x = (1.0 - self.alpha) * x0 + self.alpha * agg
                x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        finally:
            for a in actors:
                ray.kill(a)
        return pd.DataFrame({"node": handle.names, "embedding": list(x)})


class EmbeddingPipeline:
    """preprocessor (optional, fit/transform over a Dataset) -> embedder ->
    similarity index; ``run_fitting`` then point queries — the reference's
    pipeline surface (downstream/pipelines.py:87-147, 190-240)."""

    def __init__(self, *, preprocessor=None, embedder: PropagationEmbedder | None = None,
                 similarity: str = "cosine"):
        self.preprocessor = preprocessor
        self.embedder = embedder or PropagationEmbedder()
        self.similarity = similarity
        self.embeddings: pd.DataFrame | None = None
        self._index: SimilarityProcessor | None = None

    def is_transductive(self) -> bool:
        return True

    def is_inductive(self) -> bool:
        return False

    def run_fitting(self, edges: "ray.data.Dataset", *, n_partitions: int = 4) -> "EmbeddingPipeline":
        ds = edges
        if self.preprocessor is not None:
            ds = self.preprocessor.fit(ds).transform(ds)
        self.embeddings = self.embedder.fit_model(ds, n_partitions=n_partitions)
        mat = np.stack(self.embeddings["embedding"].to_numpy())
        self._index = SimilarityProcessor(mat.shape[1], similarity=self.similarity)
        self._index.add(mat, list(self.embeddings["node"]))
        return self

    def retrieve_embeddings(self, node_ids: list) -> list:
        """Embedding vectors for the ids (None for unknown ids — the
        reference returns NaN rows, embedders.py:219-227)."""
        assert self.embeddings is not None, "run_fitting first"
        lookup = {n: e for n, e in zip(self.embeddings["node"],
                                       self.embeddings["embedding"])}
        return [lookup.get(i) for i in node_ids]

    def get_similar_points(self, node_ids: list, k: int = 10) -> dict:
        assert self._index is not None, "run_fitting first"
        vecs = np.stack([v for v in self.retrieve_embeddings(node_ids)])
        ids, _scores = self._index.query(vecs, k=k)
        return {q: list(ids[i]) for i, q in enumerate(node_ids)}

    # -- persistence: directory of artifacts ------------------------------
    def save(self, path: str) -> None:
        assert self.embeddings is not None, "run_fitting first"
        os.makedirs(path, exist_ok=True)
        emb = self.embeddings.copy()
        emb["embedding"] = [np.asarray(e, dtype=np.float64) for e in emb["embedding"]]
        emb.to_parquet(os.path.join(path, "embeddings.parquet"))
        with open(os.path.join(path, "params.json"), "w") as f:
            json.dump({"embedder": self.embedder.params(),
                       "embedder_cls": type(self.embedder).__name__,
                       "similarity": self.similarity}, f)

    @classmethod
    def load(cls, path: str) -> "EmbeddingPipeline":
        with open(os.path.join(path, "params.json")) as f:
            params = json.load(f)
        from bluegraph_ray.pipelines.textembed import PPMISVDEmbedder
        registry = {"PropagationEmbedder": PropagationEmbedder,
                    "PPMISVDEmbedder": PPMISVDEmbedder}
        emb_cls = registry[params.get("embedder_cls", "PropagationEmbedder")]
        pipe = cls(embedder=emb_cls(**params["embedder"]),
                   similarity=params["similarity"])
        emb = pd.read_parquet(os.path.join(path, "embeddings.parquet"))
        emb["embedding"] = [np.asarray(e) for e in emb["embedding"]]
        pipe.embeddings = emb
        mat = np.stack(emb["embedding"].to_numpy())
        pipe._index = SimilarityProcessor(mat.shape[1], similarity=params["similarity"])
        pipe._index.add(mat, list(emb["node"]))
        return pipe
