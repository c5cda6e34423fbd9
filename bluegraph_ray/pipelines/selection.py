"""Training-data selection: DSIR importance resampling + mixture sampling.

Two published data-selection methods a 100 TB curation pipeline needs and the
reference (a graph/NLP analytics toolkit, BlueBrain/BlueGraph) has no
equivalent for — added per the engine's LLM-data charter:

- **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): score every raw document by the log importance
  ratio of a hashed-n-gram bag-of-words model fit on a small target corpus
  vs one fit on the raw corpus, then keep the top-weighted docs.
- **Mixture sampling** (the Pile / DoReMi-style domain weighting): keep each
  document with a per-source probability, decided by a deterministic hash of
  (doc_id, seed) so the sample is reproducible and needs no RNG state, no
  assignment table, and no coordination — the same contract as
  ``dedup.hash_split``.

Scale shape: DSIR's model-fit pass shuffles only (bucket, count) partials —
bounded by ``num_features``, never by corpus size — and the scoring pass is a
single streaming map with the (num_features,) log-ratio table broadcast once
via ``ray.put``. Mixture sampling is a stateless per-batch filter. Nothing
materializes the corpus.

Hashing follows the dedup convention: ``hash_mode="fast"`` (default) uses the
vectorized splitmix64 token stream from ``pipelines.dedup``; ``"sha256"``
uses the first 8 big-endian bytes of sha256 over the gram string so DuckDB
replays it as ``('0x' || substr(sha256(g), 1, 16))::UBIGINT``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from bluegraph_ray.pipelines.dedup import (_SHINGLE_C, _fast_token_stream,
                                           _hash64)
from bluegraph_ray.util import hash_aggregate

_PPM = 1_000_000  # mixture rates are exact parts-per-million integers


def _sha_buckets(strs, num_features: int) -> np.ndarray:
    """sha256-prefix bucket per string, hashing each DISTINCT string once
    (identifier-heavy corpora repeat grams)."""
    codes, uniq = pd.factorize(np.asarray(strs, dtype=object))
    hu = _hash64([g.encode() for g in uniq]) % np.uint64(num_features)
    return hu[codes]


def _gram_buckets_sha(texts, num_features: int, which: str = "both") -> tuple:
    """(bucket uint64 (G,), doc_idx int64 (G,)) for the chosen gram kind
    (``both`` = unigrams + bigrams, ``uni``, ``bi``), hashed with the
    sha256-prefix convention. Gram strings: the token itself /
    ``w1 + " " + w2``."""
    toks = [t.split(" ") for t in texts]
    lens = np.fromiter(map(len, toks), count=len(toks), dtype=np.int64)
    grams: list = []
    for tt in toks:
        if which != "bi":
            grams.extend(tt)
        if which != "uni":
            grams.extend(f"{a} {b}" for a, b in zip(tt, tt[1:]))
    per_doc = {"both": lens + np.maximum(lens - 1, 0), "uni": lens,
               "bi": np.maximum(lens - 1, 0)}[which]
    doc_idx = np.repeat(np.arange(len(toks), dtype=np.int64), per_doc)
    return _sha_buckets(grams, num_features), doc_idx


def _gram_buckets_fast(texts, num_features: int, which: str = "both") -> tuple:
    """Fast-path gram buckets: splitmix64 token hashes; bigram = Horner
    combine of two adjacent token hashes (same constant as the dedup
    shingles). Not SQL-replayable."""
    th, tb = _fast_token_stream(texts)
    n = len(texts)
    counts = np.diff(tb)
    doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), counts)
    with np.errstate(over="ignore"):
        bi = th[:-1] * _SHINGLE_C + th[1:]
    same = doc_of_tok[:-1] == doc_of_tok[1:] if len(th) > 1 else np.zeros(
        0, dtype=bool)
    parts_b, parts_d = [], []
    if which != "bi":
        parts_b.append(th)
        parts_d.append(doc_of_tok)
    if which != "uni":
        parts_b.append(bi[same])
        parts_d.append(doc_of_tok[:-1][same])
    buckets = np.concatenate(parts_b) % np.uint64(num_features)
    doc_idx = np.concatenate(parts_d)
    return buckets, doc_idx


def _lm_pairs(texts, num_features: int, hash_mode: str) -> tuple:
    """Aligned (cond_bucket, bigram_bucket, doc_idx) arrays for every
    adjacent token pair: cond = bucket of w1, bigram = bucket of (w1, w2).
    The conditioning/bigram hashing matches ``_gram_buckets_*`` exactly."""
    if hash_mode == "sha256":
        toks = [t.split(" ") for t in texts]
        lens = np.fromiter(map(len, toks), count=len(toks), dtype=np.int64)
        w1: list = []
        bg: list = []
        for tt in toks:
            w1.extend(tt[:-1])
            bg.extend(f"{a} {b}" for a, b in zip(tt, tt[1:]))
        doc_idx = np.repeat(np.arange(len(toks), dtype=np.int64),
                            np.maximum(lens - 1, 0))
        return (_sha_buckets(w1, num_features),
                _sha_buckets(bg, num_features), doc_idx)
    th, tb = _fast_token_stream(texts)
    counts = np.diff(tb)
    doc_of_tok = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    with np.errstate(over="ignore"):
        bi = th[:-1] * _SHINGLE_C + th[1:]
    same = doc_of_tok[:-1] == doc_of_tok[1:] if len(th) > 1 else np.zeros(
        0, dtype=bool)
    B = np.uint64(num_features)
    return (th[:-1][same] % B, bi[same] % B, doc_of_tok[:-1][same])


def _bucket_counts(
    docs: "ray.data.Dataset",
    *,
    text_col: str,
    num_features: int,
    hash_mode: str,
    num_buckets: int,
    which: str = "both",
) -> np.ndarray:
    """(num_features,) int64 hashed-gram counts over the whole dataset.
    Shuffle volume: one sparse (bucket, cnt) partial per batch, bounded by
    ``num_features`` — the corpus itself never moves."""
    gb = _gram_buckets_sha if hash_mode == "sha256" else _gram_buckets_fast

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b, _ = gb(batch[text_col].tolist(), num_features, which)
        cnt = np.bincount(b.astype(np.int64), minlength=num_features)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bucket": nz.astype(np.int64), "cnt": cnt[nz]})

    agg = hash_aggregate(
        docs.select_columns([text_col]).map_batches(
            partial, batch_format="pandas", batch_size=None),
        "bucket", {"cnt": ("cnt", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    out = np.zeros(num_features, dtype=np.int64)
    out[agg["bucket"].to_numpy()] = agg["cnt"].to_numpy()
    return out


def dsir_logratios(
    raw: "ray.data.Dataset",
    target: "ray.data.Dataset",
    *,
    text_col: str = "text",
    num_features: int = 1024,
    smoothing: float = 0.5,
    hash_mode: str = "fast",
    num_buckets: int = 16,
) -> np.ndarray:
    """(num_features,) float64 table of log p_target(b) - log p_raw(b) with
    add-``smoothing`` estimates: log((c + s) / (tot + s*B)) on each side."""
    if hash_mode not in ("fast", "sha256"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    cr = _bucket_counts(raw, text_col=text_col, num_features=num_features,
                        hash_mode=hash_mode, num_buckets=num_buckets)
    ct = _bucket_counts(target, text_col=text_col, num_features=num_features,
                        hash_mode=hash_mode, num_buckets=num_buckets)
    s = float(smoothing)
    lp = np.log((ct + s) / (ct.sum() + s * num_features))
    lq = np.log((cr + s) / (cr.sum() + s * num_features))
    return lp - lq


def dsir_weights(
    raw: "ray.data.Dataset",
    target: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1024,
    smoothing: float = 0.5,
    hash_mode: str = "fast",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """-> Dataset(doc_id, logw): per-document DSIR log importance weight
    (sum over the doc's hashed unigram+bigram features of the broadcast
    log-ratio table; higher = more target-like). One streaming scoring
    pass; ``logw`` rounded to 6 decimals at emit."""
    llr = dsir_logratios(raw, target, text_col=text_col,
                         num_features=num_features, smoothing=smoothing,
                         hash_mode=hash_mode, num_buckets=num_buckets)
    ref = ray.put(llr)
    gb = _gram_buckets_sha if hash_mode == "sha256" else _gram_buckets_fast

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(ref)
        b, doc_idx = gb(batch[text_col].tolist(), num_features)
        logw = np.bincount(doc_idx, weights=table[b.astype(np.int64)],
                           minlength=len(batch))
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "logw": np.round(logw, 6),
        })

    return raw.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=None)


def dsir_select(
    raw: "ray.data.Dataset",
    target: "ray.data.Dataset",
    *,
    top_n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1024,
    smoothing: float = 0.5,
    hash_mode: str = "fast",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """The ``top_n`` most target-like documents: (doc_id, logw) ordered by
    (logw desc, doc_id asc) — the deterministic-selection variant of DSIR's
    Gumbel resampling. Map-side per-batch top-n bounds the sort input to
    ``batches × top_n`` rows."""
    w = dsir_weights(raw, target, text_col=text_col, id_col=id_col,
                     num_features=num_features, smoothing=smoothing,
                     hash_mode=hash_mode, num_buckets=num_buckets)

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["logw", id_col],
                                 ascending=[False, True]).head(top_n)

    pruned = w.map_batches(pre, batch_format="pandas", batch_size=None)
    return (pruned.sort(["logw", id_col], descending=[True, False])
            .limit(top_n))


def mixture_sample(
    docs: "ray.data.Dataset",
    rates_ppm: dict[str, int],
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_ppm: int = 0,
    hash_mode: str = "sha256",
) -> "ray.data.Dataset":
    """Deterministic per-source downsampling: keep a row iff
    ``hash(doc_id:seed) % 1_000_000 < rates_ppm[source]``.

    Rates are exact integer parts-per-million (no float thresholds — the
    DuckDB replay and the engine compare the same integers). Unknown sources
    fall back to ``default_ppm``. The decision is a pure function of
    (doc_id, seed), so re-runs, retries and resumed jobs keep identical
    rows — no sampling state anywhere.
    """
    if not all(0 <= r <= _PPM for r in rates_ppm.values()):
        raise ValueError("rates_ppm values must be within [0, 1_000_000]")
    items = sorted(rates_ppm.items())
    ref = ray.put(items)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        rates = dict(ray.get(ref))
        ids = batch[id_col].to_numpy()
        if hash_mode == "sha256":
            h = _hash64([f"{i}:{seed}".encode() for i in ids])
        else:
            from bluegraph_ray.pipelines.dedup import _mix64
            with np.errstate(over="ignore"):
                h = _mix64(ids.astype(np.uint64)
                           + np.uint64(seed) * _SHINGLE_C)
        u = (h % np.uint64(_PPM)).astype(np.int64)
        thr = (batch[source_col].map(rates).fillna(default_ppm)
               .to_numpy().astype(np.int64))
        return batch[u < thr]

    return docs.map_batches(keep, batch_format="pandas", batch_size=None)


def _gumbel_u(ids: np.ndarray, seed: int, hash_mode: str) -> np.ndarray:
    """Deterministic uniform in (0, 1) per id: ((hash(id:seed) % 1e6) + 0.5)
    / 1e6 — the same integer lattice as ``mixture_sample``, so the DuckDB
    replay reproduces every draw exactly."""
    if hash_mode == "sha256":
        h = _hash64([f"{i}:{seed}".encode() for i in ids])
    else:
        from bluegraph_ray.pipelines.dedup import _mix64
        with np.errstate(over="ignore"):
            h = _mix64(ids.astype(np.uint64) + np.uint64(seed) * _SHINGLE_C)
    return ((h % np.uint64(_PPM)).astype(np.float64) + 0.5) / _PPM


def dsir_sample(
    raw: "ray.data.Dataset",
    target: "ray.data.Dataset",
    *,
    top_n: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1024,
    smoothing: float = 0.5,
    hash_mode: str = "fast",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """DSIR's actual resampling step (Gumbel-top-k): key = logw + Gumbel
    noise, keep the ``top_n`` largest keys -> (doc_id, key). Equivalent to
    sampling ``top_n`` docs without replacement with probability
    proportional to the importance weight e^logw.

    The Gumbel draw is ``-ln(-ln(u))`` with ``u`` a pure hash of
    (doc_id, seed) — reproducible across runs/retries and replayable in
    SQL, unlike an RNG stream whose values depend on row order."""
    w = dsir_weights(raw, target, text_col=text_col, id_col=id_col,
                     num_features=num_features, smoothing=smoothing,
                     hash_mode=hash_mode, num_buckets=num_buckets)

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        u = _gumbel_u(batch[id_col].to_numpy(), seed, hash_mode)
        out = pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "key": batch["logw"].to_numpy() - np.log(-np.log(u)),
        })
        return out.sort_values(["key", id_col],
                               ascending=[False, True]).head(top_n)

    pruned = w.map_batches(add_key, batch_format="pandas", batch_size=None)
    top = (pruned.sort(["key", id_col], descending=[True, False])
           .limit(top_n))

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        batch["key"] = np.round(batch["key"].to_numpy(), 6)
        return batch

    return top.map_batches(emit, batch_format="pandas", batch_size=None)


def lm_logppl(
    docs: "ray.data.Dataset",
    ref: "ray.data.Dataset | None" = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1024,
    smoothing: float = 0.5,
    hash_mode: str = "fast",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """CCNet-style perplexity filtering signal (Wenzek et al. 2020):
    -> Dataset(doc_id, logppl), the per-token negative mean log-probability
    of each document under an add-``smoothing`` hashed BIGRAM language
    model fit on ``ref`` (default: the corpus itself). Lower = more fluent
    under the reference corpus; filter or bucket by it as CCNet does with
    its KenLM scores.

    Model: p(w2 | w1) = (c_bi[b(w1 w2)] + s) / (c_uni[b(w1)] + s*B) over
    the hashed bucket space — both count tables are (num_features,) arrays
    fit with the same bounded (bucket, count) partial shuffle as DSIR and
    broadcast once; scoring is one streaming pass. Documents with fewer
    than 2 tokens emit logppl = 0.0."""
    if ref is None:
        ref = docs
    cu = _bucket_counts(ref, text_col=text_col, num_features=num_features,
                        hash_mode=hash_mode, num_buckets=num_buckets,
                        which="uni")
    cb = _bucket_counts(ref, text_col=text_col, num_features=num_features,
                        hash_mode=hash_mode, num_buckets=num_buckets,
                        which="bi")
    s = float(smoothing)
    tables = ray.put((cu.astype(np.float64), cb.astype(np.float64)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cu_t, cb_t = ray.get(tables)
        ub, bb, doc_idx = _lm_pairs(batch[text_col].tolist(), num_features,
                                    hash_mode)
        lp = np.log((cb_t[bb.astype(np.int64)] + s)
                    / (cu_t[ub.astype(np.int64)] + s * num_features))
        n = np.bincount(doc_idx, minlength=len(batch))
        tot = np.bincount(doc_idx, weights=lp, minlength=len(batch))
        logppl = np.where(n > 0, -tot / np.maximum(n, 1), 0.0)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "logppl": np.round(logppl, 6),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=None)
