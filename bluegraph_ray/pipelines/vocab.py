"""Corpus vocabulary and n-gram statistics — tokenizer-training staples.

The reference's co-occurrence generator consumes pre-extracted entity
mentions; a from-raw-text pipeline needs the corpus-level token tables that
precede any tokenizer or LM: term frequencies, document frequencies, and
adjacent-bigram counts. Tokens are the repo's split(' ') convention
(pipelines/text.doc_stats), so the DuckDB oracles replay everything with
STRING_SPLIT / list_zip.

Shape: per-batch vectorized explode + value_counts (one partial row per
distinct term per batch), then one bucketed hash aggregate — the shuffle
moves distinct-term partials, never tokens. Top-k leaves through a
distributed sort + limit. At 100 TB the same two stages stand; only
num_buckets grows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.util import hash_aggregate


def term_stats(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """-> Dataset(term, tf, df): corpus-wide term frequency and document
    frequency over space-separated tokens."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        flat = toks.explode()
        tf = flat.value_counts()
        df = flat.groupby(level=0).unique().explode().value_counts()
        out = pd.DataFrame({"term": tf.index, "tf": tf.to_numpy()})
        out["df"] = df.reindex(out["term"]).to_numpy()
        return out

    partials = docs.select_columns([text_col]).map_batches(
        partial, batch_format="pandas", batch_size=None)
    return hash_aggregate(
        partials, "term", {"tf": ("tf", "sum"), "df": ("df", "sum")},
        num_buckets=num_buckets)


def bigram_counts(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """-> Dataset(w1, w2, n): adjacent-token bigram counts (no bigrams
    across document boundaries)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        lens = toks.map(len).to_numpy()
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc = np.repeat(np.arange(len(batch)), lens)
        w1 = flat[:-1]
        w2 = flat[1:]
        same_doc = doc[:-1] == doc[1:]
        pairs = pd.DataFrame({"w1": w1[same_doc], "w2": w2[same_doc]})
        out = pairs.groupby(["w1", "w2"], sort=False).size().reset_index(name="n")
        return out

    partials = docs.select_columns([text_col]).map_batches(
        partial, batch_format="pandas", batch_size=None)
    return hash_aggregate(
        partials, ["w1", "w2"], {"n": ("n", "sum")}, num_buckets=num_buckets)


def source_kl(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    source_col: str = "source",
    num_features: int = 256,
    smoothing: float = 0.5,
    hash_mode: str = "fast",
    num_buckets: int = 8,
) -> pd.DataFrame:
    """Per-source KL divergence of the hashed-unigram token distribution
    against the whole-corpus distribution: -> DataFrame(source, n_tokens,
    kl), sorted by source. The domain-shift diagnostic a mixture-weighting
    pass (DoReMi / Pile-style) reads before assigning per-source rates.

    KL(p_source || p_corpus) with add-``smoothing`` estimates over
    ``num_features`` hash buckets on BOTH sides, so every bucket (seen or
    not) contributes and the divergence is finite. Distribution shape: one
    sparse (source, bucket, cnt) partial per batch (bounded by
    sources_in_batch x num_features, never tokens), one bucketed combine,
    and a driver-side (sources x num_features) table — model-sized, not
    corpus-sized."""
    if hash_mode not in ("fast", "sha256"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    from bluegraph_ray.pipelines.selection import (_gram_buckets_fast,
                                                   _gram_buckets_sha)
    gb = _gram_buckets_sha if hash_mode == "sha256" else _gram_buckets_fast
    F = int(num_features)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b, doc_idx = gb(batch[text_col].tolist(), F, "uni")
        codes, uniq = pd.factorize(batch[source_col].to_numpy())
        key = codes[doc_idx].astype(np.int64) * F + b.astype(np.int64)
        cnt = np.bincount(key, minlength=len(uniq) * F)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "source": np.asarray(uniq, dtype=object)[nz // F],
            "bucket": (nz % F).astype(np.int64),
            "cnt": cnt[nz],
        })

    agg = hash_aggregate(
        docs.select_columns([text_col, source_col]).map_batches(
            partial, batch_format="pandas", batch_size=None),
        ["source", "bucket"], {"cnt": ("cnt", "sum")},
        num_buckets=num_buckets).to_pandas()

    sources = np.sort(agg["source"].unique())
    six = {s: i for i, s in enumerate(sources)}
    M = np.zeros((len(sources), F), dtype=np.int64)
    M[agg["source"].map(six).to_numpy(), agg["bucket"].to_numpy()] = (
        agg["cnt"].to_numpy())
    s = float(smoothing)
    ts = M.sum(axis=1, keepdims=True)
    cb = M.sum(axis=0, keepdims=True)
    p = (M + s) / (ts + s * F)
    q = (cb + s) / (cb.sum() + s * F)
    kl = (p * np.log(p / q)).sum(axis=1)
    return pd.DataFrame({
        "source": sources,
        "n_tokens": ts[:, 0],
        "kl": np.round(kl, 6),
    })


def top_terms_per_group(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 5,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """-> Dataset(group, term, cnt, rank): the ``k`` most frequent tokens
    per group, ties toward the lexicographically smaller term — grouped
    heavy hitters (per-domain vocabulary drift at a glance).

    Scale shape: exact (group, term) counts through ``hash_aggregate``
    (distinct-term partials per batch, never tokens), then a map-side
    per-batch top-k per group BEFORE the group shuffle — the final
    ``groupby(group)`` sees at most batches x groups x k rows, not the
    vocabulary."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"group": np.array([], dtype=object),
                                 "term": np.array([], dtype=object),
                                 "cnt": np.array([], dtype=np.int64)})
        toks = batch[text_col].str.split(" ")
        lens = toks.map(len).to_numpy(dtype=np.int64)
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        grp = np.repeat(batch[group_col].to_numpy(), lens)
        out = (pd.DataFrame({"group": grp, "term": flat})
               .groupby(["group", "term"], sort=False).size()
               .reset_index(name="cnt"))
        return out

    counts = hash_aggregate(
        docs.select_columns([text_col, group_col]).map_batches(
            partial, batch_format="pandas", batch_size=None),
        ["group", "term"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)

    def pre_topk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_neg"] = -batch["cnt"]
        return (batch.sort_values(["_neg", "term"])
                .groupby("group", sort=False).head(k).drop(columns=["_neg"]))

    pruned = counts.map_batches(pre_topk, batch_format="pandas",
                                batch_size=None)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.assign(_neg=-group["cnt"])
             .sort_values(["_neg", "term"], kind="mergesort").head(k)
             .drop(columns=["_neg"]).reset_index(drop=True))
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return pruned.groupby("group").map_groups(final_topk,
                                              batch_format="pandas")


def zipf_slope(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 64,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-group Zipf fit: OLS slope of ln(count) on ln(rank) over the top
    ``k`` tokens (ties toward the smaller term) — the corpus-health
    diagnostic (natural text sits near -1; templated/synthetic domains
    flatten). -> Dataset(group, n_terms, slope).

    Rides :func:`top_terms_per_group` (exact counts, map-side per-group
    top-k before the bounded group shuffle); the regression folds inside
    the same per-group task from the k ranked rows, closed form
    (Sxy - SxSy/n) / (Sxx - Sx^2/n). Groups need >= 2 ranked terms (always
    true for real text at k >= 2; guarded with a 0.0 fallback)."""
    ranked = top_terms_per_group(docs, text_col=text_col,
                                 group_col=group_col, k=k,
                                 num_buckets=num_buckets)

    def slope(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n < 2:
            s = 0.0
        else:
            x = np.log(group["rank"].to_numpy(np.float64))
            y = np.log(group["cnt"].to_numpy(np.float64))
            sx, sy = x.sum(), y.sum()
            s = (float((x * y).sum()) - sx * sy / n) / \
                (float((x * x).sum()) - sx * sx / n)
        return pd.DataFrame({"group": group["group"].iloc[:1],
                             "n_terms": np.asarray([n], dtype=np.int64),
                             "slope": np.asarray([np.round(s, 6)])})

    return ranked.groupby("group").map_groups(slope, batch_format="pandas")
