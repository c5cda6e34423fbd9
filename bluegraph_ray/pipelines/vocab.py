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
