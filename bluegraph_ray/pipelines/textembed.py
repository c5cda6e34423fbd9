"""Trainable text embedder: distributed window co-occurrence -> PPMI ->
truncated SVD (Levy & Goldberg 2014, "Neural Word Embedding as Implicit
Matrix Factorization" — public knowledge).

Fills the reference's trainable-text-model slot (Doc2Vec training in
/root/reference/bluegraph/preprocess/utils.py:102-158 and the gensim
Word2Vec encoder surface) without gensim/TF: the corpus-scale work — token
counting and word-window co-occurrence counting — runs as vectorized
``map_batches`` + one ``hash_aggregate`` shuffle each; only the vocab-capped
sparse PPMI matrix (corpus-size-INDEPENDENT: at most ``max_vocab`` rows,
realistically ~1e5 x a few hundred nnz/row) materializes on the driver,
where a randomized truncated SVD (Halko et al. 2011) factorizes it with
seeded determinism. Word vectors are ``U_k * sqrt(S_k)``; document vectors
are the mean of their known word vectors (the doc2vec-analog inference
path), computed distributively with the word matrix broadcast once via
``ray.put``.

No scipy in this container — the CSR matvec is a numpy ``add.reduceat``
over row segments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.util import hash_aggregate


def word_counts(ds: "ray.data.Dataset", *, text_col: str = "text",
                num_buckets: int = 32) -> "ray.data.Dataset":
    """Distributed token counts over ``split(" ")`` tokens -> (w, cnt)."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list = []
        for t in batch[text_col]:
            toks.extend(t.split(" "))
        s = pd.Series(toks, dtype=object).value_counts()
        return pd.DataFrame({"w": s.index, "partial": s.to_numpy()})

    part = ds.map_batches(explode, batch_format="pandas", batch_size=None)
    return hash_aggregate(part, "w", {"cnt": ("partial", "sum")},
                          num_buckets=num_buckets)


def window_cooccurrence(ds: "ray.data.Dataset", *, text_col: str = "text",
                        window: int = 2, num_buckets: int = 64,
                        vocab=None) -> "ray.data.Dataset":
    """Symmetric word-window co-occurrence counts -> (w, c, cnt).

    A pair is counted once per position pair (i, j) with 0 < |i-j| <=
    window, in BOTH orders — exactly DuckDB's positional self-join replay
    (see ``oracle_sql()["word_window_cooc"]``). One pair-count shuffle;
    per-batch emission is offset-sliced numpy, combined with a local groupby
    so the shuffled payload is pre-aggregated. ``vocab`` (an optional
    ``ray.put`` handle of a word set / Index) filters pairs map-side before
    the shuffle."""

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        keep = None if vocab is None else ray.get(vocab)
        ws, cs = [], []
        for t in batch[text_col]:
            arr = np.asarray(t.split(" "), dtype=object)
            for off in range(1, window + 1):
                if len(arr) > off:
                    ws.append(arr[:-off])
                    cs.append(arr[off:])
        if not ws:
            return pd.DataFrame({"w": [], "c": [], "partial": []})
        a = np.concatenate(ws)
        b = np.concatenate(cs)
        df = pd.DataFrame({"w": np.concatenate([a, b]),
                           "c": np.concatenate([b, a])})
        if keep is not None:
            df = df[df["w"].isin(keep) & df["c"].isin(keep)]
        out = df.groupby(["w", "c"], sort=False).size().reset_index(name="partial")
        return out

    part = ds.map_batches(pairs, batch_format="pandas", batch_size=None)
    return hash_aggregate(part, ["w", "c"], {"cnt": ("partial", "sum")},
                          num_buckets=num_buckets)


def _csr_matmat(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                x: np.ndarray) -> np.ndarray:
    """Sparse (CSR) @ dense — numpy-only (no scipy in this container):
    per-nnz contributions reduced at row boundaries."""
    contrib = data[:, None] * x[indices]
    n = len(indptr) - 1
    out = np.zeros((n, x.shape[1]), dtype=np.float64)
    nonempty = np.flatnonzero(np.diff(indptr) > 0)
    if len(nonempty):
        out[nonempty] = np.add.reduceat(contrib, indptr[nonempty], axis=0)
    return out


def _randomized_svd(matvec, n: int, k: int, *, oversample: int = 8,
                    power_iters: int = 2, seed: int = 0):
    """Seeded randomized truncated SVD of a SYMMETRIC matrix given only its
    matvec (Halko/Martinsson/Tropp 2011). Returns (U (n,k), S (k,))."""
    rng = np.random.default_rng(seed)
    l = min(n, k + oversample)
    y = matvec(rng.standard_normal((n, l)))
    for _ in range(power_iters):
        q, _ = np.linalg.qr(y)
        y = matvec(q)
    q, _ = np.linalg.qr(y)
    b = matvec(q).T @ q        # symmetric: B = Q^T M Q  (l x l)
    w, v = np.linalg.eigh(b)
    order = np.argsort(-np.abs(w))[:k]
    u = q @ v[:, order]
    s = np.abs(w[order])
    # sign convention for determinism: largest-|component| positive
    flip = np.sign(u[np.argmax(np.abs(u), axis=0), np.arange(u.shape[1])])
    return u * np.where(flip == 0, 1.0, flip), s


def ppmi_svd_factorize(wi: np.ndarray, ci: np.ndarray, cnt: np.ndarray,
                       n: int, dimension: int, *, shift: float = 1.0,
                       seed: int = 0, power_iters: int = 2) -> np.ndarray:
    """Shared PPMI + randomized-SVD core: sparse (row, col, count) pair
    counts -> an (n, dimension) embedding matrix U·√Σ. Used by the text
    embedder below and the walk-based DeepWalk embedder
    (pipelines/graphembed.py)."""
    cnt = cnt.astype(np.float64)
    row_tot = np.bincount(wi, weights=cnt, minlength=n)
    total = cnt.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(cnt * total / (row_tot[wi] * row_tot[ci]))
    val = np.maximum(pmi - np.log(shift), 0.0)
    keep = val > 0
    wi, ci, val = wi[keep], ci[keep], val[keep]
    order = np.lexsort((ci, wi))
    wi, ci, val = wi[order], ci[order], val[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(wi, minlength=n), out=indptr[1:])
    u, s = _randomized_svd(
        lambda x: _csr_matmat(indptr, ci, val, x), n, dimension,
        power_iters=power_iters, seed=seed)
    mat = u * np.sqrt(s)[None, :]
    if mat.shape[1] < dimension:  # vocab smaller than dimension
        mat = np.pad(mat, ((0, 0), (0, dimension - mat.shape[1])))
    return mat


class PPMISVDEmbedder:
    """Trainable text embedder: ``fit_model(documents) -> DataFrame`` with
    one row per vocab word (node=word, embedding) — the same contract as
    ``PropagationEmbedder`` so it drops into ``EmbeddingPipeline``."""

    def __init__(self, dimension: int = 32, window: int = 2,
                 max_vocab: int = 50000, min_count: int = 1,
                 shift: float = 1.0, seed: int = 0, power_iters: int = 2,
                 text_col: str = "text"):
        self.dimension = dimension
        self.window = window
        self.max_vocab = max_vocab
        self.min_count = min_count
        self.shift = shift  # PPMI = max(0, PMI - log(shift))
        self.seed = seed
        self.power_iters = power_iters
        self.text_col = text_col
        self.embeddings: pd.DataFrame | None = None
        self._index: pd.Index | None = None
        self._mat: np.ndarray | None = None

    def params(self) -> dict:
        return {"dimension": self.dimension, "window": self.window,
                "max_vocab": self.max_vocab, "min_count": self.min_count,
                "shift": self.shift, "seed": self.seed,
                "power_iters": self.power_iters, "text_col": self.text_col}

    def fit_model(self, ds: "ray.data.Dataset", *, n_partitions: int = 4,
                  **_ignored) -> pd.DataFrame:
        wc = word_counts(ds, text_col=self.text_col).to_pandas()
        wc = wc[wc["cnt"] >= self.min_count]
        wc = wc.sort_values(["cnt", "w"], ascending=[False, True],
                            kind="mergesort").head(self.max_vocab)
        vocab = pd.Index(sorted(wc["w"]))
        vref = ray.put(set(vocab))
        cooc = window_cooccurrence(
            ds, text_col=self.text_col, window=self.window,
            vocab=vref).to_pandas()
        n = len(vocab)
        wi = vocab.get_indexer(cooc["w"].to_numpy())
        ci = vocab.get_indexer(cooc["c"].to_numpy())
        cnt = cooc["cnt"].to_numpy(dtype=np.float64)
        mat = ppmi_svd_factorize(wi, ci, cnt, n, self.dimension,
                                 shift=self.shift, seed=self.seed,
                                 power_iters=self.power_iters)
        self._index = vocab
        self._mat = mat
        self.embeddings = pd.DataFrame(
            {"node": list(vocab), "embedding": list(mat)})
        return self.embeddings

    # -- doc2vec-analog inference -----------------------------------------
    def doc_embeddings(self, ds: "ray.data.Dataset", *, id_col: str = "doc_id",
                       ) -> "ray.data.Dataset":
        """Mean of known word vectors per document (zero vector when no
        token is in-vocab) — distributed, word matrix broadcast once."""
        assert self._mat is not None, "fit_model first"
        mat_ref = ray.put(self._mat)
        idx_ref = ray.put(self._index)
        text_col = self.text_col
        dim = self._mat.shape[1]

        def embed(batch: pd.DataFrame) -> pd.DataFrame:
            mat = ray.get(mat_ref)
            idx = ray.get(idx_ref)
            toks: list = []
            bounds = [0]
            for t in batch[text_col]:
                toks.extend(t.split(" "))
                bounds.append(len(toks))
            pos = idx.get_indexer(np.asarray(toks, dtype=object))
            known = pos >= 0
            vecs = np.where(known[:, None], mat[np.maximum(pos, 0)], 0.0)
            b = np.asarray(bounds)
            sums = np.zeros((len(batch), dim))
            nonempty = np.flatnonzero(np.diff(b) > 0)
            counts = np.zeros(len(batch))
            if len(nonempty):
                starts = b[nonempty]
                sums[nonempty] = np.add.reduceat(vecs, starts, axis=0)
                counts[nonempty] = np.add.reduceat(
                    known.astype(np.float64), starts, axis=0)
            out = sums / np.maximum(counts, 1.0)[:, None]
            return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                                 "embedding": list(out)})

        return ds.map_batches(embed, batch_format="pandas", batch_size=None)


def textrank_terms(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    window: int = 2,
    iters: int = 12,
    alpha: float = 0.85,
    topk: int = 20,
    num_buckets: int = 16,
    n_partitions: int = 8,
) -> pd.DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): -> DataFrame
    (term, score) — the ``topk`` corpus keywords by weighted PageRank over
    the word co-occurrence graph, ordered (score DESC, term ASC), score
    rounded to 9 decimals at emit.

    Pure composition of two already-distributed stages: the window-w
    co-occurrence counting shuffle (``window_cooccurrence`` — the same
    counting pass the PPMI-SVD embedder uses) feeding the CSR-partitioned
    superstep PageRank kernel (``stages/pagerank.power_iterations``, exact
    fixed-depth semantics so the DuckDB recursion replays it). The word
    graph is vocabulary-sized, not corpus-sized: the corpus leaves only
    pre-aggregated (w, c, cnt) partials."""
    from bluegraph_ray.stages.build import build_graph, make_partition_actors
    from bluegraph_ray.stages.pagerank import power_iterations

    edges = window_cooccurrence(docs, text_col=text_col, window=window,
                                num_buckets=num_buckets)
    und = edges.map_batches(lambda b: b[b["w"] < b["c"]],
                            batch_format="pandas", batch_size=None)
    handle = build_graph(und, src="w", dst="c", weight="cnt",
                         directed=False, n_partitions=n_partitions)
    actors = make_partition_actors(handle)
    try:
        res = power_iterations(handle, actors, iters=iters, alpha=alpha)
    finally:
        for a in actors:
            ray.kill(a)
    out = pd.DataFrame({"term": handle.names, "_raw": res["values"]})
    out = out.sort_values(["_raw", "term"], ascending=[False, True],
                          kind="mergesort").head(topk)
    out["score"] = np.round(out["_raw"].to_numpy(), 9)
    return out.drop(columns=["_raw"]).reset_index(drop=True)
