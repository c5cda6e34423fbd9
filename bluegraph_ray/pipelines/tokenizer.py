"""From-scratch BPE tokenizer training over a Ray Dataset corpus.

The LLM-data counterpart of the reference's text-preprocessing encoders
(reference bluegraph preprocess/encoders.py trains TfIdf/word2vec surfaces;
a training-data engine also needs the subword vocabulary itself). Classic
byte-pair encoding (Sennrich et al. 2016) in the shape every production
trainer uses:

- the CORPUS-scale work — the word-frequency table — is distributed
  (``vocab.term_stats``: per-batch explode + value_counts partials, one
  bucketed hash aggregate; the shuffle moves distinct-word partials, never
  tokens);
- the merge loop runs on the DRIVER over that table, bounded by
  ``max_words`` distinct words (top-N by frequency through a distributed
  sort + limit), NOT by corpus size — at 100 TB the driver never sees more
  than max_words rows;
- encoding (merge application) is a broadcast ``map_batches`` stage with a
  per-actor word -> segmentation memo, so each distinct word is segmented
  once per actor, not once per occurrence.

Determinism contract (mirrored by the unrolled DuckDB oracles in
__ray_entry__): symbols start as single characters; the best pair maximizes
(count, then lexicographically smallest (left, right)); application is
greedy left-to-right non-overlapping within each word.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd

import ray.data

from bluegraph_ray.pipelines.vocab import term_stats


def _apply_merge(sym: tuple, l: str, r: str) -> tuple:
    """Greedy left-to-right non-overlapping replacement of (l, r) -> l+r."""
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == l and sym[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pairs(sym: tuple) -> list:
    return list(zip(sym, sym[1:]))


def bpe_train(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    num_merges: int = 64,
    min_freq: int = 1,
    max_words: int = 100_000,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges -> DataFrame(rank, lhs, rhs, merged,
    freq) where freq is the pair's corpus count at selection time.

    Stops early (fewer rows) if the word table runs out of adjacent pairs.
    The driver holds only the top-``max_words`` word-frequency rows and the
    pair-count index — both vocabulary-bounded.
    """
    wf = term_stats(docs, text_col=text_col, num_buckets=num_buckets)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["tf"] >= min_freq][["term", "tf"]]

    wf = wf.map_batches(keep, batch_format="pandas", batch_size=None)
    # deterministic truncation: frequency desc, then term asc
    top = (wf.sort(["tf", "term"], descending=[True, False])
           .limit(max_words).to_pandas())

    words = [tuple(w) for w in top["term"]]
    freqs = top["tf"].to_numpy()

    counts: Counter = Counter()
    index: defaultdict = defaultdict(set)  # pair -> word ids containing it
    for wi, (sym, f) in enumerate(zip(words, freqs)):
        for p in _pairs(sym):
            counts[p] += int(f)
            index[p].add(wi)

    merges = []
    for rank in range(num_merges):
        if not counts:
            break
        # max count, ties broken by the lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((rank, l, r, l + r, int(c)))
        for wi in list(index[(l, r)]):
            old = words[wi]
            new = _apply_merge(old, l, r)
            f = int(freqs[wi])
            for p in _pairs(old):
                counts[p] -= f
                if counts[p] <= 0:
                    del counts[p]
                index[p].discard(wi)
            for p in _pairs(new):
                counts[p] += f
                index[p].add(wi)
            words[wi] = new

    return pd.DataFrame(merges,
                        columns=["rank", "lhs", "rhs", "merged", "freq"]) \
        .astype({"rank": np.int64, "freq": np.int64})


class BpeEncoder:
    """Actor-pool merge application: the (small) merge table ships once per
    actor; each distinct word is segmented once and memoized."""

    def __init__(self, merges: pd.DataFrame, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.merges = list(zip(merges["lhs"], merges["rhs"]))
        self.text_col = text_col
        self.id_col = id_col
        self.memo: dict = {}

    def _n_subtokens(self, word: str) -> int:
        n = self.memo.get(word)
        if n is None:
            sym = tuple(word)
            for l, r in self.merges:
                if len(sym) < 2:
                    break
                sym = _apply_merge(sym, l, r)
            n = len(sym)
            self.memo[word] = n
        return n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_n = np.empty(len(batch), dtype=np.int64)
        for i, t in enumerate(batch[self.text_col].to_numpy()):
            out_n[i] = sum(self._n_subtokens(w) for w in t.split(" "))
        return pd.DataFrame({
            self.id_col: batch[self.id_col].astype(np.int64).to_numpy(),
            "n_bpe_tokens": out_n,
        })


def bpe_token_counts(
    docs: "ray.data.Dataset",
    merges: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple | None = None,
) -> "ray.data.Dataset":
    """Apply learned merges -> Dataset(doc_id, n_bpe_tokens): the per-doc
    subword token count (the number every packing / cost model needs)."""
    return docs.select_columns([id_col, text_col]).map_batches(
        BpeEncoder(merges, text_col, id_col),
        batch_format="pandas", batch_size=1024, concurrency=concurrency or 2)
