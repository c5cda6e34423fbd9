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
- ``ivf_topk``: trained Voronoi segmentation — the reference's
  ``FaissSimilarityIndex(n_segments>1)`` (similarity.py:150-226) re-expressed:
  deterministic spherical k-means centroids fit once on a driver-side sample
  and broadcast; each corpus batch assigns rows to their nearest centroid and
  scans a query only against rows in that query's ``nprobe`` closest cells.
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


def kmeans_centroids(
    sample: np.ndarray, n_segments: int, *, iters: int = 10, seed: int = 17
) -> np.ndarray:
    """Deterministic spherical Lloyd: cosine assignment on normalized rows,
    centroid = renormalized mean. Faiss trains its IVF quantizer the same way
    (reference similarity.py:213-218 ``index.train``); seeded init + fixed
    iteration count keep the segmentation reproducible run to run. Empty
    cells keep their previous centroid."""
    x = _norm_rows(np.asarray(sample, dtype=np.float64))
    n_segments = min(n_segments, len(x))
    rng = np.random.default_rng(seed)
    cent = x[np.sort(rng.choice(len(x), size=n_segments, replace=False))].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(n_segments):
            sel = assign == j
            if sel.any():
                cent[j] = x[sel].mean(axis=0)
        cent = _norm_rows(cent)
    return cent


def ivf_topk(
    corpus: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_segments: int = 16,
    nprobe: int = 4,
    train_size: int = 4096,
    seed: int = 17,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """IVF cosine top-k: -> (query_id, neighbor_id, cosine).

    Train once on the driver (the ``train_size`` corpus rows with the
    SMALLEST ids — selected by per-block partial top + driver merge, so the
    sample is deterministic regardless of streaming-executor block order —
    a few thousand rows on the driver no matter the corpus size), then
    broadcast (centroids, queries, probe lists) via one ``ray.put``. Each
    corpus batch computes segment ids with a single (batch × n_segments)
    matmul and scans each query only against rows whose segment is in the
    query's probe list, pre-reducing to a local top-k; a small
    ``groupby(query)`` reduce finishes.

    ``nprobe >= n_segments`` probes every cell and is EXACT (same result and
    the same ordering contract as ``knn_topk``: raw cosine desc, neighbor_id
    asc, rounded only at emit). ``nprobe < n_segments`` is the approximate
    scale path. At 100 TB the segment id doubles as the Parquet partition
    key so only probed partitions are read at all.
    """
    q = _norm_rows(np.asarray(queries, dtype=np.float64))

    def train_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).head(int(train_size))

    train = (
        corpus.select_columns([id_col, vec_col])
        .map_batches(train_partial, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values(id_col)
        .head(int(train_size))
    )
    cent = kmeans_centroids(
        np.stack(train[vec_col].to_numpy()), n_segments, seed=seed)
    n_segments = len(cent)
    nprobe = min(nprobe, n_segments)
    # per-query probe mask over segments: nprobe closest centroids
    qc = q @ cent.T  # (nq, n_segments)
    probe_ok = np.zeros((len(q), n_segments), dtype=bool)
    for i in range(len(q)):
        probe_ok[i, np.argsort(-qc[i], kind="stable")[:nprobe]] = True
    bc_ref = ray.put((np.asarray(query_ids), q, cent, probe_ok))

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qm, c, pok = ray.get(bc_ref)
        ids = batch[id_col].to_numpy()
        m = _norm_rows(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        seg = np.argmax(m @ c.T, axis=1)
        sims = qm @ m.T
        rows = []
        for qi in range(len(qids)):
            mask = pok[qi][seg]
            if exclude_self:
                mask &= ids != qids[qi]
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            s = sims[qi]
            take = idx[np.lexsort((ids[idx], -s[idx]))[: k]]
            rows.append(pd.DataFrame({
                "query_id": qids[qi],
                "neighbor_id": ids[take],
                "cosine": s[take],
            }))
        if not rows:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        return pd.concat(rows, ignore_index=True)

    partial = corpus.select_columns([id_col, vec_col]).map_batches(
        scan, batch_format="pandas", batch_size=None)

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


def _pq_assign(X: np.ndarray, cent: np.ndarray) -> tuple:
    """Per-subspace squared-L2 assignment. X (n, m, d_sub), cent
    (m, n_codes, d_sub) -> (codes (n, m) int64, dists (n, m, n_codes))."""
    # explicit difference form (not the |x|^2 - 2xc expansion) so the
    # float64 rounding matches the oracle's SUM((x - c)^2) term by term
    d = ((X[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=-1)
    return d.argmin(axis=2).astype(np.int64), d


def pq_train(
    corpus: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    num_buckets: int = 8,
) -> np.ndarray:
    """Train a product-quantization codebook (Jégou et al. 2011) -> cent
    (m, n_codes, d_sub) float64.

    Deterministic and fully distributed: init = the ``n_codes`` corpus
    vectors with the SMALLEST ids (per-block partial head + driver merge,
    like ivf_topk's train sample); each Lloyd iteration is ONE streaming
    pass emitting per-batch (sub, code, dim) sum/count partials — the
    shuffle is bounded by m × n_codes × d_sub scalars per batch, never
    vectors — followed by a driver mean over that codebook-sized table.
    Empty cells keep their previous centroid. Assignment ties take the
    lowest code (np.argmin), mirrored by the oracle's ORDER BY dist, code.
    """
    from bluegraph_ray.util import hash_aggregate

    cols = corpus.select_columns([id_col, vec_col])

    def init_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).head(int(n_codes))

    seed_rows = (cols.map_batches(init_partial, batch_format="pandas",
                                  batch_size=None)
                 .to_pandas().sort_values(id_col).head(int(n_codes)))
    seed_m = np.stack(seed_rows[vec_col].to_numpy()).astype(np.float64)
    d = seed_m.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m
    if len(seed_m) < n_codes:
        raise ValueError(f"corpus has fewer than n_codes={n_codes} rows")
    cent = np.ascontiguousarray(
        seed_m.reshape(n_codes, m, d_sub).transpose(1, 0, 2))

    subs = np.repeat(np.arange(m, dtype=np.int64), n_codes * d_sub)
    codes_col = np.tile(np.repeat(np.arange(n_codes, dtype=np.int64), d_sub), m)
    dims = np.tile(np.arange(d_sub, dtype=np.int64), m * n_codes)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            X = (np.stack(batch[vec_col].to_numpy()).astype(np.float64)
                 .reshape(len(batch), m, d_sub))
            assign, _ = _pq_assign(X, c)
            s = np.zeros((m, n_codes, d_sub), dtype=np.float64)
            n = np.zeros((m, n_codes), dtype=np.float64)
            for sub in range(m):
                n[sub] = np.bincount(assign[:, sub], minlength=n_codes)
                for j in range(d_sub):
                    s[sub, :, j] = np.bincount(
                        assign[:, sub], weights=X[:, sub, j],
                        minlength=n_codes)
            return pd.DataFrame({
                "sub": subs, "code": codes_col, "dim": dims,
                "s": s.ravel(),
                "n": np.repeat(n.ravel(), d_sub),
            })

        agg = hash_aggregate(
            cols.map_batches(partial, batch_format="pandas",
                             batch_size=None),
            ["sub", "code", "dim"],
            {"s": ("s", "sum"), "n": ("n", "sum")},
            num_buckets=num_buckets,
        ).to_pandas()
        new = cent.copy()
        nz = agg[agg["n"] > 0]
        new[nz["sub"].to_numpy(), nz["code"].to_numpy(),
            nz["dim"].to_numpy()] = (nz["s"] / nz["n"]).to_numpy()
        cent = new
    return cent


def pq_topk(
    corpus: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    k: int = 5,
    exclude_self: bool = True,
    num_buckets: int = 8,
) -> "ray.data.Dataset":
    """PQ asymmetric-distance top-k: -> (query_id, neighbor_id, adc).

    The 100 TB ANN path beside flat/IVF/LSH: after ``pq_train``, every
    corpus vector compresses to m uint8 codes and the query-time scan
    touches only the (nq, m, n_codes) distance table plus a table lookup
    per vector — no full-precision corpus reads at all. Here the encode +
    ADC scan run in one streaming pass with map-side per-query top-k
    (smallest ADC distance, tie neighbor_id asc — the L2 mirror of
    knn_topk's ordering contract), finished by a small groupby(query)
    reduce; the codebook and query distance tables broadcast via one
    ``ray.put``.
    """
    cent = pq_train(corpus, vec_col=vec_col, id_col=id_col, m=m,
                    n_codes=n_codes, iters=iters, num_buckets=num_buckets)
    d_sub = cent.shape[2]
    q = (np.asarray(queries, dtype=np.float64)
         .reshape(len(queries), m, d_sub))
    # (nq, m, n_codes) query-to-centroid distance tables
    qtab = ((q[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(axis=-1)
    ref = ray.put((np.asarray(query_ids), qtab, cent))

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qt, c = ray.get(ref)
        ids = batch[id_col].to_numpy()
        X = (np.stack(batch[vec_col].to_numpy()).astype(np.float64)
             .reshape(len(batch), m, c.shape[2]))
        codes, _ = _pq_assign(X, c)
        # adc[qi, v] = sum over subspaces of the table entry at v's code
        adc = qt[:, np.arange(m)[None, :], codes].sum(axis=2)  # (nq, n)
        rows = []
        for qi in range(len(qids)):
            s = adc[qi]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            take = idx[np.lexsort((ids[idx], s[idx]))[: k]]
            rows.append(pd.DataFrame({
                "query_id": qids[qi],
                "neighbor_id": ids[take],
                "adc": s[take],
            }))
        if not rows:
            return pd.DataFrame({
                "query_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "adc": np.array([], dtype=np.float64),
            })
        return pd.concat(rows, ignore_index=True)

    partial = corpus.select_columns([id_col, vec_col]).map_batches(
        scan, batch_format="pandas", batch_size=None)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["adc", "neighbor_id"],
                              ascending=[True, True],
                              kind="mergesort").head(k)
        g["adc"] = np.round(g["adc"].to_numpy(), 6)
        return g

    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pandas")


def knn_classify(
    corpus: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
) -> "ray.data.Dataset":
    """k-nearest-neighbor classification: -> (query_id, pred, votes).

    The downstream-eval sibling of ``knn_topk`` (reference
    ``downstream/similarity.py`` + sklearn KNeighborsClassifier usage in the
    embedding notebooks): each query's label is the MAJORITY label among its
    top-k cosine neighbors in the labeled corpus, ties broken toward the
    smaller label. Same distribution shape as ``knn_topk`` — the query
    matrix is broadcast once via ``ray.put``, every corpus batch pre-reduces
    to its local top-k (carrying the label column), and one small
    ``groupby(query).map_groups`` finishes the global top-k + vote. The
    corpus streams; only ``batches x k`` candidate rows shuffle.

    Ordering contract (matches the DuckDB oracle): raw unrounded cosine
    DESC, neighbor id ASC for the top-k; (votes DESC, label ASC) for the
    winner.
    """
    q = _norm_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids), q))

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if len(batch):
            qids, qm = ray.get(q_ref)
            ids = batch[id_col].to_numpy()
            labs = batch[label_col].to_numpy()
            m = _norm_rows(
                np.stack(batch[vec_col].to_numpy()).astype(np.float64))
            sims = qm @ m.T
            for qi in range(len(qids)):
                s = sims[qi]
                take = np.lexsort((ids, -s))[:k]
                rows.append(pd.DataFrame({
                    "query_id": qids[qi],
                    "neighbor_id": ids[take],
                    "label": labs[take],
                    "cosine": s[take],
                }))
        if not rows:
            return pd.DataFrame({
                "query_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "label": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            })
        return pd.concat(rows, ignore_index=True)

    partial = corpus.select_columns([id_col, vec_col, label_col]).map_batches(
        block_topk, batch_format="pandas", batch_size=None)

    def vote(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "neighbor_id"],
                              ascending=[False, True], kind="mergesort").head(k)
        vc = (g.groupby("label").size().reset_index(name="votes")
              .sort_values(["votes", "label"], ascending=[False, True]))
        return pd.DataFrame({
            "query_id": group["query_id"].iloc[:1].to_numpy(),
            "pred": np.asarray([vc["label"].iloc[0]], dtype=np.int64),
            "votes": np.asarray([vc["votes"].iloc[0]], dtype=np.int64),
        })

    return partial.groupby("query_id").map_groups(vote, batch_format="pandas")


def label_centroids(
    embeddings: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Per-class embedding moments in long form: -> DataFrame(label, dim,
    n, centroid, variance) with centroid = E[x] and variance = E[x^2] -
    E[x]^2 per (label, dim) — the class-separation diagnostic (and k-NN /
    nearest-centroid classifier fit) over an embedding table.

    Scale shape: each batch folds to (labels x dims) partial
    (n, sum, sumsq) rows via one reduceat pass — the driver combine is
    bounded by classes x dims x blocks, never rows. Label cardinality must
    be small (classes, not entities); the per-entity analog is
    ``functions/sketches`` territory. Moments use exactly the
    E[x^2] - E[x]^2 form so a SQL AVG-based replay matches to rounding."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({
                "label": pd.Series([], dtype=np.int64),
                "dim": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.float64),
                "ss": pd.Series([], dtype=np.float64)})
        lab = batch[label_col].to_numpy(np.int64)
        V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        Vs = V[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(lab_s)) + 1))
        labs = lab_s[starts]
        cnts = np.diff(np.concatenate((starts, [len(lab_s)])))
        S = np.add.reduceat(Vs, starts, axis=0)
        SS = np.add.reduceat(Vs * Vs, starts, axis=0)
        d = V.shape[1]
        return pd.DataFrame({
            "label": np.repeat(labs, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(labs)),
            "n": np.repeat(cnts.astype(np.int64), d),
            "s": S.ravel(),
            "ss": SS.ravel()})

    parts = embeddings.select_columns([label_col, vec_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    g = parts.groupby(["label", "dim"], sort=True).agg(
        n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum")).reset_index()
    mean = g["s"].to_numpy() / g["n"].to_numpy()
    var = g["ss"].to_numpy() / g["n"].to_numpy() - mean * mean
    out = pd.DataFrame({
        "label": g["label"].astype(np.int64),
        "dim": g["dim"].astype(np.int64),
        "n": g["n"].astype(np.int64),
        "centroid": np.round(mean, 6),
        "variance": np.round(var, 6)})
    return out.reset_index(drop=True)
