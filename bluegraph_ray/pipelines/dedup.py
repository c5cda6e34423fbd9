"""Deduplication suite: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All variants follow the scale shape: per-batch vectorized sketching ->
``groupby`` on the blocking key -> candidate pairs -> verification. Nothing
materializes the corpus on the driver; candidate sets are the only small
intermediates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray
import ray.data
from bluegraph_ray.util import hash_aggregate, hash_distinct


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Keep the smallest ``id_col`` per distinct ``text_col``.

    Hash-partition on a content digest, per-group min — one shuffle, and the
    shuffled payload is (digest, id), never the content itself.
    Output: (doc_id, content_sha256).
    """

    def digest(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "content_sha256": [
                    hashlib.sha256(t.encode()).hexdigest() for t in batch[text_col]
                ],
            }
        )

    hashed = ds.map_batches(digest, batch_format="pandas", batch_size=None)
    return hash_aggregate(hashed, "content_sha256", {id_col: (id_col, "min")})


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def _hash64(arr_of_bytes: list) -> np.ndarray:
    """First 8 bytes (big-endian) of sha256 — chosen over blake2b so the
    DuckDB oracle can replicate it exactly:
    ``('0x' || substr(sha256(s), 1, 16))::UBIGINT``."""
    return np.array(
        [int.from_bytes(hashlib.sha256(b).digest()[:8], "big") for b in arr_of_bytes],
        dtype=np.uint64,
    )


def _token_shingles(text: str, k: int) -> list:
    toks = text.split(" ")
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


class MinHasher:
    """Per-batch MinHash signatures: k-token shingles -> 64-bit hashes ->
    ``num_perm`` universal-hash minima. Deterministic (fixed seed)."""

    def __init__(self, text_col="text", id_col="doc_id", k=3, num_perm=64, seed=7):
        self.text_col, self.id_col, self.k, self.num_perm = text_col, id_col, k, num_perm
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, np.iinfo(np.int64).max, num_perm, dtype=np.int64).astype(np.uint64) | np.uint64(1)
        self.b = rng.integers(0, np.iinfo(np.int64).max, num_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _token_shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = _hash64([s.encode() for s in sh])
        # universal hashing: (a*h + b) with wraparound; min per permutation
        vals = (np.outer(self.a, h) + self.b[:, None]).astype(np.uint64)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col]])
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy()})
        out["sig"] = list(sigs.astype(np.int64))
        return out


def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 7,
) -> "ray.data.Dataset":
    """MinHash+LSH candidate pairs: shingle -> minhash -> band -> bucket groupby.

    Emits (src, dst, est_jaccard) for every pair sharing >=1 LSH band bucket,
    with the MinHash-estimated Jaccard (fraction of equal signature lanes).
    """
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher(text_col, id_col, k, num_perm, seed), batch_format="pandas", batch_size=None)

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        # band bucket key = the band's minhash values joined as a string —
        # pure value equality (no second hash), so the oracle can mirror it
        ids, band_ids, band_hash, sig_list = [], [], [], []
        for i, sig in zip(batch[id_col], batch["sig"]):
            sig = np.asarray(sig, dtype=np.int64)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                ids.append(i)
                band_ids.append(b)
                band_hash.append("-".join(map(str, chunk)))
                sig_list.append(sig)
        return pd.DataFrame(
            {id_col: ids, "band": band_ids, "bhash": band_hash, "sig": sig_list}
        )

    banded = sigs.map_batches(to_bands, batch_format="pandas", batch_size=None)

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"src": [], "dst": [], "est_jaccard": []})
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sigs_arr = np.stack(g["sig"].to_numpy())
        iu, ju = np.triu_indices(len(ids), k=1)
        est = (sigs_arr[iu] == sigs_arr[ju]).mean(axis=1)
        return pd.DataFrame({"src": ids[iu], "dst": ids[ju], "est_jaccard": np.round(est, 6)})

    cand = banded.groupby(["band", "bhash"]).map_groups(pairs_in_bucket, batch_format="pandas")
    # a pair can match in several bands — distinct (est_jaccard identical per pair)
    return hash_distinct(cand, ["src", "dst"])


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (the verification oracle for MinHash)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.0,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Exact token-k-gram Jaccard for every pair sharing >=1 shingle.

    shingle explode -> groupby(shingle-hash bucket is NOT enough; pairs must be
    global) — here: explode distinct (doc, shingle) -> self-join via
    groupby(shingle) pair emission -> groupby(pair).count = |intersection| ->
    join broadcast shingle-set sizes -> jaccard. SQL-expressible; the DuckDB
    oracle mirrors it 1:1.
    """
    def shingles(batch: pd.DataFrame) -> pd.DataFrame:
        ids, sh = [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            ss = set(_token_shingles(t, k))
            ids.extend([i] * len(ss))
            sh.extend(ss)
        return pd.DataFrame({"doc": ids, "shingle": sh})

    exploded = ds.map_batches(shingles, batch_format="pandas", batch_size=None).materialize()
    sizes = hash_aggregate(exploded, "doc", {"sz": (None, "count")}).to_pandas()
    sizes_ref = ray.put(sizes.set_index("doc")["sz"])

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_b"] = (
            pd.util.hash_array(batch["shingle"].to_numpy()) % num_buckets
        ).astype(np.int64)
        return batch

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["shingle", "doc"], kind="mergesort")
        docs = group["doc"].to_numpy()
        codes = pd.factorize(group["shingle"].to_numpy(), use_na_sentinel=False)[0]
        b = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], b))
        ends = np.concatenate((b, [len(codes)]))
        srcs, dsts = [], []
        for s, e in zip(starts, ends):
            f = e - s
            if f < 2:
                continue
            iu, ju = np.triu_indices(f, k=1)
            srcs.append(docs[s + iu])
            dsts.append(docs[s + ju])
        if not srcs:
            return pd.DataFrame({"src": docs[:0], "dst": docs[:0], "partial": np.array([], dtype=np.int64)})
        df = pd.DataFrame({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})
        return df.groupby(["src", "dst"], sort=False).size().reset_index(name="partial")

    inter = (
        exploded.map_batches(bucket, batch_format="pandas", batch_size=None)
        .groupby("_b")
        .map_groups(lambda g: emit_pairs(g.drop(columns=["_b"])), batch_format="pandas")
    )
    inter = hash_aggregate(inter, ["src", "dst"], {"inter": ("partial", "sum")})

    def jaccard(batch: pd.DataFrame) -> pd.DataFrame:
        sz = ray.get(sizes_ref)
        i = batch["inter"].to_numpy(dtype=np.float64)
        sa = sz.reindex(batch["src"]).to_numpy(dtype=np.float64)
        sb = sz.reindex(batch["dst"]).to_numpy(dtype=np.float64)
        batch["jaccard"] = np.round(i / (sa + sb - i), 6)
        return batch[batch["jaccard"] >= threshold].drop(columns=["inter"])

    return inter.map_batches(jaccard, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes (weighted bit-vote)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def simhash(text: str) -> np.int64:
        toks = text.split(" ")
        if not toks:
            return np.int64(0)
        h = _hash64([t.encode() for t in toks])
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            out |= np.uint64(1) << np.uint64(b)
        return np.int64(out >> np.uint64(1))  # keep in int64 range

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                "simhash": [self.simhash(t) for t in batch[self.text_col]],
            }
        )


def simhash_signatures(ds: "ray.data.Dataset", *, text_col="text", id_col="doc_id") -> "ray.data.Dataset":
    return ds.map_batches(SimHasher(text_col, id_col), batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _norm_stack(col) -> np.ndarray:
    m = np.stack(col.to_numpy()).astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_chunks: int = 8,
    method: str = "exact",
    n_planes: int = 8,
    seed: int = 13,
) -> "ray.data.Dataset":
    """Pairs with cosine similarity >= threshold -> (src, dst, cosine).

    ``method="exact"`` (default): bucketed block self-join. Each row is
    hashed to one of ``n_chunks`` chunks and replicated to its ``n_chunks``
    unordered chunk-pair tasks (shuffle volume = n_chunks × N rows — the
    unavoidable cost of an exact all-pairs scan, spread over B(B+1)/2
    independent tasks); every task holds two chunks, does ONE matmul, and
    emits only pairs over threshold, upper triangle by id. Nothing is
    materialized on the driver and nothing is broadcast; peak task memory is
    2 chunks of vectors, so size ``n_chunks`` to ~(corpus bytes / worker
    heap). O(N²) similarity compute is inherent to exactness.

    ``method="lsh"``: the approximate scale path — rows are bucketed by their
    random-hyperplane sign pattern (same family as similarity.lsh_topk) and
    only WITHIN-bucket pairs are scanned; misses cross-bucket near-dups with
    probability growing in ``n_planes`` (recall/cost dial).
    """
    cols = ds.select_columns([id_col, vec_col])

    if method == "lsh":
        planes: np.ndarray | None = None

        def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
            nonlocal planes
            m = _norm_stack(batch[vec_col])
            if planes is None:
                planes = np.random.default_rng(seed).standard_normal(
                    (n_planes, m.shape[1]))
            batch = batch.copy()
            batch["_b"] = (((m @ planes.T) > 0)
                           @ (1 << np.arange(n_planes))).astype(np.int64)
            return batch

        def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
            ids = group[id_col].to_numpy()
            m = _norm_stack(group[vec_col])
            sims = m @ m.T
            rows, cs = np.nonzero(sims >= threshold)
            keep = ids[rows] < ids[cs]
            return pd.DataFrame({
                "src": ids[rows][keep],
                "dst": ids[cs][keep],
                "cosine": np.round(sims[rows, cs][keep], 6),
            })

        return (cols.map_batches(bucketize, batch_format="pandas", batch_size=None)
                .groupby("_b").map_groups(bucket_pairs, batch_format="pandas"))

    if method != "exact":
        raise ValueError(f"unknown method {method!r}; use 'exact' or 'lsh'")

    def replicate(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        vecs = batch[vec_col].to_numpy()
        c = (pd.util.hash_array(ids) % n_chunks).astype(np.int64)
        frames = []
        for p in range(n_chunks):
            lo = np.minimum(c, p)
            hi = np.maximum(c, p)
            frames.append(pd.DataFrame({
                id_col: ids, vec_col: vecs, "_c": c,
                "_pk": lo * n_chunks + hi,
            }))
        return pd.concat(frames, ignore_index=True)

    def close_pair(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": np.array([], dtype=np.int64),
                              "dst": np.array([], dtype=np.int64),
                              "cosine": np.array([], dtype=np.float64)})
        if not len(group):
            return empty
        pk = int(group["_pk"].iloc[0])
        lo, hi = pk // n_chunks, pk % n_chunks
        ids = group[id_col].to_numpy()
        m = _norm_stack(group[vec_col])
        c = group["_c"].to_numpy()
        if lo == hi:
            sims = m @ m.T
            rows, cs = np.nonzero(sims >= threshold)
            keep = ids[rows] < ids[cs]
            s, d, v = ids[rows][keep], ids[cs][keep], sims[rows, cs][keep]
        else:
            a = c == lo
            b = c == hi
            if not a.any() or not b.any():
                return empty
            sims = m[a] @ m[b].T
            rows, cs = np.nonzero(sims >= threshold)
            ia, ib = ids[a][rows], ids[b][cs]
            s, d = np.minimum(ia, ib), np.maximum(ia, ib)
            v = sims[rows, cs]
        return pd.DataFrame({"src": s, "dst": d, "cosine": np.round(v, 6)})

    return (cols.map_batches(replicate, batch_format="pandas", batch_size=None)
            .groupby("_pk").map_groups(close_pair, batch_format="pandas"))


def hash_split(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    train_pct: int = 80,
    salt: str = "split",
) -> "ray.data.Dataset":
    """Deterministic train/test assignment: split = sha256(salt || id) % 100
    < train_pct. Embarrassingly parallel (no shuffle, no state), stable
    across runs/cluster sizes, and replayable in SQL via the repo's
    sha256-prefix convention — the standard way to split a 100 TB corpus
    without materializing an assignment table."""

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{salt}:{v}".encode() for v in batch[id_col]]
        h = np.array(
            [int.from_bytes(hashlib.sha256(k).digest()[:8], "big") for k in keys],
            dtype=np.uint64,
        )
        return pd.DataFrame({
            id_col: batch[id_col],
            "split": np.where(h % np.uint64(100) < train_pct, "train", "test"),
        })

    return ds.map_batches(assign, batch_format="pandas", batch_size=None)
