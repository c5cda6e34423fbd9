"""Text analysis stages over a document table — language ID, quality scoring,
token counting, fingerprinting.

These are the "mentions preprocessing" analogs of the reference
(``clean_up_entity`` / ``has_min_length`` / term filters,
/root/reference/cord19kg/utils.py:106-160) generalized to the operations a
large-scale training-data pipeline needs. All stages are vectorized
``map_batches`` transforms; the stateful ones (compiled regexes, language
profiles) are actor-pool callable classes.

Definitions are deliberately simple and SQL-expressible where possible so the
DuckDB oracle can verify them bit-for-bit (see __ray_entry__.oracle_sql):
- ``n_chars``  = length(text)
- ``n_tokens`` = number of single-space-separated tokens
- ``n_types``  = distinct tokens
- ``stop_ratio`` = stopword tokens / tokens (fixed stopword list)
- ``fingerprint_sha256`` = sha256 hex of the raw text
- ``fingerprint_roll`` = 64-bit polynomial rolling hash over tokens
  (not SQL-expressible; rows-only check)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

STOPWORDS = ("a", "the", "and", "of", "to")

# simple stopword profiles per language for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "a", "to", "value", "table"},
    "fr": {"le", "la", "et", "de", "les"},
    "de": {"der", "die", "und", "das", "ist"},
    "es": {"el", "la", "y", "de", "los"},
    "zh": set(),  # CJK detection is by codepoint range below
}


class TextStats:
    """Per-document counting stage (stateless math, compiled once per actor)."""

    def __init__(self, text_col: str = "text", stopwords: tuple = STOPWORDS):
        self.text_col = text_col
        self.stop = set(stopwords)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].str.split(" ")
        n_tokens = toks.map(len).astype(np.int64)
        n_types = toks.map(lambda t: len(set(t))).astype(np.int64)
        stop = self.stop
        n_stop = toks.map(lambda t: sum(1 for w in t if w in stop)).astype(np.int64)
        out = batch.copy()
        out["n_chars"] = batch[self.text_col].str.len().astype(np.int64)
        out["n_tokens"] = n_tokens
        out["n_types"] = n_types
        out["stop_ratio"] = np.round(n_stop / np.maximum(n_tokens, 1), 6)
        return out


def doc_stats(ds: "ray.data.Dataset", *, text_col: str = "text",
              engine: str = "arrow") -> "ray.data.Dataset":
    """engine="arrow" (default, measured 1.7x on the sf0.1 corpus) runs the
    zero-copy pyarrow kernel; "pandas" keeps the original stage. Outputs
    are bit-identical (test_arrow_text_kernels_match_pandas)."""
    if engine == "arrow":
        return ds.map_batches(TextStatsArrow(text_col),
                              batch_format="pyarrow", batch_size=None)
    return ds.map_batches(TextStats(text_col), batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Arrow-native text kernels (round-5 experiment, VERDICT r4 item 6)
#
# The pandas paths above call Python-level str methods / per-row closures;
# these variants keep the batch as a zero-copy pa.Table and push the work
# into pyarrow.compute (RE2 regex, C++ split) plus flat-token numpy folds
# (dictionary-encode once per batch, per-doc segment math via bincount /
# np.unique — no Python loop over rows or tokens). Output is EXACTLY the
# pandas stages' (same rounding, same tie rules) — asserted by
# tests/test_pipelines.py::test_arrow_text_kernels_match_pandas — so the
# DuckDB oracles are unaffected by which path a pipeline picks.
# ---------------------------------------------------------------------------

def _set_columns(tbl, cols: dict):
    """append-or-replace columns on a pa.Table — the pandas stages OVERWRITE
    existing stat columns (``out["n_chars"] = ...``); append_column alone
    would duplicate the field when a stage is re-applied."""
    for name, arr in cols.items():
        if name in tbl.column_names:
            tbl = tbl.set_column(tbl.column_names.index(name), name, arr)
        else:
            tbl = tbl.append_column(name, arr)
    return tbl


def _flat_token_index(tok_list):
    """ListArray of tokens -> (flat StringArray, doc_idx int64, n_docs)."""
    import pyarrow as pa

    if isinstance(tok_list, pa.ChunkedArray):
        tok_list = tok_list.combine_chunks()
    counts = np.asarray(tok_list.value_lengths(), dtype=np.int64)
    doc = np.repeat(np.arange(len(tok_list), dtype=np.int64), counts)
    return tok_list.flatten(), doc, len(tok_list)


def _distinct_token_fold(flat, doc, n_docs):
    """Per-doc DISTINCT tokens without Python sets: dictionary-encode the
    flat token stream (one hash pass in C++), then np.unique over the
    packed (doc, code) key. Returns (doc_u, code_u, dictionary,
    n_types_per_doc)."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(flat)
    if hasattr(enc, "combine_chunks"):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    dictionary = enc.dictionary
    k = max(len(dictionary), 1)
    key = doc * k + codes
    uniq = np.unique(key)
    doc_u = uniq // k
    code_u = uniq % k
    n_types = np.bincount(doc_u, minlength=n_docs).astype(np.int64)
    return doc_u, code_u, dictionary, n_types


class TextStatsArrow:
    """Arrow-native :class:`TextStats`: same columns, bit-identical values."""

    def __init__(self, text_col: str = "text", stopwords: tuple = STOPWORDS):
        self.text_col = text_col
        self.stop = list(stopwords)

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        text = batch[self.text_col]
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(text, " ")
        flat, doc, n_docs = _flat_token_index(toks)
        n_tokens = np.bincount(doc, minlength=n_docs).astype(np.int64)
        _, _, _, n_types = _distinct_token_fold(flat, doc, n_docs)
        is_stop = pc.is_in(flat, value_set=pa.array(self.stop)) \
            .to_numpy(zero_copy_only=False)
        n_stop = np.bincount(doc[is_stop], minlength=n_docs).astype(np.int64)
        return _set_columns(batch, {
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "stop_ratio": pa.array(
                np.round(n_stop / np.maximum(n_tokens, 1), 6)),
        })


class QualityScoreArrow:
    """Arrow-native :class:`QualityScore` (same formula and rounding)."""

    def __init__(self, text_col: str = "text"):
        self.stats = TextStatsArrow(text_col)

    def __call__(self, batch):
        import pyarrow as pa

        out = self.stats(batch)
        n_tokens = out.column("n_tokens").to_numpy()
        n_types = out.column("n_types").to_numpy()
        stop_ratio = out.column("stop_ratio").to_numpy()
        lennorm = np.clip(n_tokens / 100.0, 0, 1)
        ttr = n_types / np.maximum(n_tokens, 1)
        stop_ok = 1.0 - np.abs(stop_ratio - 0.08)
        score = np.round(0.4 * lennorm + 0.3 * ttr
                         + 0.3 * np.clip(stop_ok, 0, 1), 6)
        return _set_columns(out, {"quality": pa.array(score)})


class LangIdArrow:
    """Arrow-native :class:`LangId`: identical decisions (CJK-ratio gate on
    the first 400 codepoints, distinct-marker votes over the first 200
    tokens, first-lang-in-dict-order wins strictly-greater ties, 'en'
    fallback, 'unknown' for empty)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = [(lang, list(marks)) for lang, marks
                      in _LANG_MARKERS.items() if marks]

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        text = batch[self.text_col]
        head = pc.utf8_slice_codeunits(text, 0, 400)
        head_len = pc.utf8_length(head).to_numpy(zero_copy_only=False)
        cjk = pc.count_substring_regex(head, "[一-鿿]") \
            .to_numpy(zero_copy_only=False)
        is_zh = cjk / np.maximum(head_len, 1) > 0.1

        toks = pc.list_slice(
            pc.split_pattern(pc.utf8_lower(text), " "), 0, 200)
        flat, doc, n_docs = _flat_token_index(toks)
        doc_u, code_u, dictionary, _ = _distinct_token_fold(flat, doc, n_docs)
        dvals = dictionary.to_pandas().to_numpy()
        hits = np.zeros((len(self.langs), n_docs), dtype=np.int64)
        for i, (_, marks) in enumerate(self.langs):
            mask = np.isin(dvals, marks)[code_u]
            hits[i] = np.bincount(doc_u[mask], minlength=n_docs)
        # replicate the scalar loop's tie rule: best starts at ('en', 0
        # hits); a lang wins only with STRICTLY more hits than every
        # earlier lang -> first argmax, masked by max > 0
        best_i = np.argmax(hits, axis=0)
        best_hits = hits[best_i, np.arange(n_docs)]
        names = np.asarray([lang for lang, _ in self.langs])
        pred = np.where(best_hits > 0, names[best_i], "en")
        pred = np.where(is_zh, "zh", pred)
        pred = np.where(head_len == 0, "unknown", pred)
        return _set_columns(
            batch, {"pred_lang": pa.array(pred.astype(object), pa.string())})


class QualityScore:
    """Heuristic quality score in [0,1]: length band + type/token ratio +
    stopword band — the shape of production quality filters (each term is a
    cheap vectorized signal)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        stats = TextStats(self.text_col)(batch)
        lennorm = np.clip(stats["n_tokens"].to_numpy() / 100.0, 0, 1)
        ttr = stats["n_types"].to_numpy() / np.maximum(stats["n_tokens"].to_numpy(), 1)
        stop_ok = 1.0 - np.abs(stats["stop_ratio"].to_numpy() - 0.08)
        score = np.round(0.4 * lennorm + 0.3 * ttr + 0.3 * np.clip(stop_ok, 0, 1), 6)
        stats["quality"] = score
        return stats


def quality_scores(ds: "ray.data.Dataset", *, text_col: str = "text",
                   engine: str = "arrow") -> "ray.data.Dataset":
    """Same contract as :func:`doc_stats` — arrow default, 2.4x measured."""
    if engine == "arrow":
        return ds.map_batches(QualityScoreArrow(text_col),
                              batch_format="pyarrow", batch_size=None)
    return ds.map_batches(QualityScore(text_col), batch_format="pandas", batch_size=None)


class RepetitionStats:
    """Gopher-style per-document repetition signals over whitespace tokens
    (the repetition family of production quality filters — top-token
    fraction, top-adjacent-bigram fraction, duplicated-bigram fraction).
    Pure per-row math, no shuffle; SQL-replayable
    (__ray_entry__.oracle_sql()["doc_repetition"])."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        top_tok, top_bg, dup_bg = [], [], []
        for text in batch[self.text_col]:
            toks = str(text).split(" ")
            tc = Counter(toks)
            top_tok.append(max(tc.values()) / max(len(toks), 1))
            if len(toks) > 1:
                bc = Counter(zip(toks, toks[1:]))
                nb = len(toks) - 1
                top_bg.append(max(bc.values()) / nb)
                dup_bg.append(sum(c for c in bc.values() if c > 1) / nb)
            else:
                top_bg.append(0.0)
                dup_bg.append(0.0)
        out = batch[[c for c in batch.columns if c != self.text_col]].copy()
        out["top_token_frac"] = np.round(top_tok, 9)
        out["top_bigram_frac"] = np.round(top_bg, 9)
        out["dup_bigram_frac"] = np.round(dup_bg, 9)
        return out


def repetition_stats(ds: "ray.data.Dataset", *,
                     text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(RepetitionStats(text_col), batch_format="pandas",
                          batch_size=None)


class LangId:
    """Language-ID heuristic: CJK codepoint ratio, then stopword-marker votes,
    falling back to 'en'. Deterministic; an actor-pool stage (profiles built
    once per actor)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def _predict(self, text: str) -> str:
        if not text:
            return "unknown"
        cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
        if cjk / max(len(text[:400]), 1) > 0.1:
            return "zh"
        toks = set(text.lower().split(" ")[:200])
        best, best_hits = "en", 0
        for lang, marks in self.markers.items():
            hits = len(toks & marks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["pred_lang"] = batch[self.text_col].map(self._predict)
        return out


def lang_id(ds: "ray.data.Dataset", *, text_col: str = "text", concurrency=None,
            engine: str = "arrow") -> "ray.data.Dataset":
    """``concurrency=N`` turns this into an actor pool (worth it only when the
    profile table is heavy); default is stateless tasks with the pickled
    instance — cheap profiles make pool warm-up the dominant cost."""
    if concurrency:
        return ds.map_batches(
            LangId, fn_constructor_kwargs={"text_col": text_col},
            batch_format="pandas", concurrency=concurrency, batch_size=None)
    if engine == "arrow":
        return ds.map_batches(LangIdArrow(text_col),
                              batch_format="pyarrow", batch_size=None)
    return ds.map_batches(LangId(text_col), batch_format="pandas", batch_size=None)


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _roll_hash_tokens(tokens: list) -> np.int64:
    """Reference scalar form (kept for the property test): FNV-1a over each
    token's bytes followed by a 0x20 separator."""
    h = int(_FNV_OFFSET)
    for t in tokens:
        for b in t.encode():
            h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
        h = ((h ^ 32) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return np.int64(h >> 1)


def _roll_hash_batch(texts) -> np.ndarray:
    """Vectorized :func:`_roll_hash_tokens` for a whole batch.

    Hashing token bytes + 0x20 per token over ``text.split(" ")`` is
    byte-identical to FNV-1a over ``text + " "`` (single-space split/join
    round-trips, empties included). The byte recurrence is sequential WITHIN
    a doc, so we advance all docs one byte POSITION per step (uint64 vector
    xor-mul across the batch, longest-first so the live prefix shrinks)
    instead of one byte per Python op."""
    n = len(texts)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    bufs = [np.frombuffer((t + " ").encode(), dtype=np.uint8) for t in texts]
    lens = np.fromiter((len(b) for b in bufs), count=n, dtype=np.int64)
    order = np.argsort(-lens, kind="stable")
    slens = lens[order]
    maxlen = int(slens[0])
    padded = np.zeros((n, maxlen), dtype=np.uint8)
    for row, j in enumerate(order):
        padded[row, : lens[j]] = bufs[j]
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            k = int(np.searchsorted(-slens, -(i + 1), side="right"))
            hk = h[:k]
            np.multiply(np.bitwise_xor(hk, padded[:k, i].astype(np.uint64)),
                        _FNV_PRIME, out=hk)
    out[order] = (h >> np.uint64(1)).astype(np.int64)
    return out


class Fingerprint:
    """Document fingerprints: sha256 of raw text + FNV-style rolling hash of
    the token stream."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["fingerprint_sha256"] = [
            hashlib.sha256(t.encode()).hexdigest() for t in batch[self.text_col]
        ]
        out["fingerprint_roll"] = _roll_hash_batch(list(batch[self.text_col]))
        return out


def fingerprints(ds: "ray.data.Dataset", *, text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(Fingerprint(text_col), batch_format="pandas", batch_size=None)


class SubwordStats:
    """BPE-style pre-tokenizer counts (the GPT-2 pretokenizer shape, without
    lookahead so DuckDB's RE2 replays it exactly): runs of letters, runs of
    digits, runs of other non-space, each with an optional leading space,
    plus whitespace runs. Regex compiled ONCE per actor; counting is one
    findall per row (no token materialization kept)."""

    PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.rx = re.compile(self.PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[self.text_col].map(lambda t: len(self.rx.findall(t)))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_subwords": n.astype(np.int64),
        })


def subword_counts(ds: "ray.data.Dataset", *, text_col: str = "text",
                   concurrency: int = 4) -> "ray.data.Dataset":
    """-> (doc_id, n_subwords): BPE-ish token counts via an actor pool."""
    return ds.map_batches(SubwordStats, fn_constructor_kwargs={"text_col": text_col},
                          concurrency=concurrency, batch_format="pandas",
                          batch_size=4096)


class _TermFreq:
    """Per-document term frequencies for a SMALL broadcast query-term list
    (the BM25 scoring pass). Terms are space-separated tokens — the same
    split(' ') convention doc_stats uses, so the DuckDB oracle replays it
    with LIST_FILTER over STRING_SPLIT."""

    def __init__(self, terms: tuple, text_col: str = "text"):
        self.terms = list(terms)
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].str.split(" ")
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["dl"] = toks.map(len).astype(np.int64)
        for i, t in enumerate(self.terms):
            out[f"tf{i}"] = toks.map(
                lambda ws, t=t: sum(1 for w in ws if w == t)).astype(np.int64)
        return out


def bm25_topk(
    docs: "ray.data.Dataset",
    query_terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Okapi BM25 retrieval: top-k documents for a bag of query terms.

    Two streaming passes, no shuffle until the final top-k sort:
    1. per-doc (dl, tf per term) rows + map-side scalar partials for the
       corpus stats (N, Σdl as exact ints; df per term);
    2. score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
       the Lucene/Robertson idf ln(1 + (N−df+0.5)/(df+0.5)), corpus stats
       broadcast as plain floats.
    The query-term list is the broadcast small side (production: dozens of
    terms); a full inverted-index build would replace the per-term columns
    with (doc, term, tf) rows and a term-bucketed shuffle at identical
    semantics. Scores round to 9 before the (score DESC, doc_id) ordering so
    the SQL replay ranks identically."""
    tf = docs.select_columns(["doc_id", text_col]).map_batches(
        _TermFreq(tuple(query_terms), text_col),
        batch_format="pandas", batch_size=None).materialize()

    T = len(query_terms)

    def stat_partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n": [len(batch)], "sum_dl": [int(batch["dl"].sum())]}
        for i in range(T):
            row[f"df{i}"] = [int((batch[f"tf{i}"] > 0).sum())]
        return pd.DataFrame(row)

    stats = tf.map_batches(stat_partial, batch_format="pandas",
                           batch_size=None).to_pandas().sum()
    n_docs = float(stats["n"])
    avgdl = float(stats["sum_dl"]) / n_docs
    idf = np.array([
        np.log(1.0 + (n_docs - float(stats[f"df{i}"]) + 0.5)
               / (float(stats[f"df{i}"]) + 0.5))
        for i in range(T)
    ])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        dl = batch["dl"].to_numpy(dtype=np.float64)
        s = np.zeros(len(batch))
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        for i in range(T):
            tfv = batch[f"tf{i}"].to_numpy(dtype=np.float64)
            s += idf[i] * (tfv * (k1 + 1.0)) / (tfv + denom_dl)
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "bm25": np.round(s, 9)})

    scored = tf.map_batches(score, batch_format="pandas", batch_size=None)
    return scored.sort(["bm25", "doc_id"], descending=[True, False]).limit(k)


def chunk_documents(
    docs: "ray.data.Dataset",
    *,
    size: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Context-window chunking: split each document into token windows of
    ``size`` tokens advancing by ``stride`` (overlap = size − stride) —
    the standard LLM pretraining/retrieval reshaping step.

    -> (doc_id, chunk_id, n_chunk_tokens, chunk). Chunk i covers tokens
    [i·stride, i·stride+size); a chunk exists whenever i·stride < n_tokens,
    so every token lands in ≥1 chunk and a short document yields exactly one.
    Tokens are the split(' ') convention; DuckDB replays the whole reshape
    with list slicing (1-based inclusive: toks[i·stride+1 : i·stride+size]).
    Pure per-row map — embarrassingly parallel, output rows ≈ n/stride per
    doc, no shuffle anywhere."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        ids, cids, lens, chunks = [], [], [], []
        for did, txt in zip(batch[id_col], batch[text_col]):
            toks = txt.split(" ")
            n = len(toks)
            i = 0
            while i * stride < n:
                piece = toks[i * stride: i * stride + size]
                ids.append(did)
                cids.append(i)
                lens.append(len(piece))
                chunks.append(" ".join(piece))
                i += 1
        return pd.DataFrame({id_col: ids, "chunk_id": np.array(cids, dtype=np.int64),
                             "n_chunk_tokens": np.array(lens, dtype=np.int64),
                             "chunk": chunks})

    return docs.select_columns([id_col, text_col]).map_batches(
        per_batch, batch_format="pandas", batch_size=None)


# PII patterns kept to the regex subset Python ``re`` and DuckDB's RE2
# interpret identically (character classes, bounded repeats, \b, \d) so the
# oracle can replay redaction with regexp_replace(..., 'g') verbatim.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


class PiiRedactor:
    """Actor-pool PII scrub: count + replace emails / phone numbers / IPv4
    addresses / SSN-shaped ids with typed placeholder tokens. Regexes are
    compiled once per actor in ``__init__``; per batch everything runs
    through pandas' vectorized ``str.count`` / ``str.replace`` (C loops, no
    Python-per-row). Patterns apply in declaration order — counts are taken
    on the progressively redacted text, exactly like the SQL replay chains
    regexp_replace, so overlapping matches resolve identically."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 patterns: tuple = PII_PATTERNS):
        import re

        self.text_col, self.id_col = text_col, id_col
        self.compiled = [(name, re.compile(pat), repl)
                         for name, pat, repl in patterns]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].astype("string")
        out = {self.id_col: batch[self.id_col]}
        for name, rx, repl in self.compiled:
            out[f"n_{name}"] = s.str.count(rx).astype(np.int64)
            s = s.str.replace(rx, repl, regex=True)
        out["clean_text"] = s.astype(object)
        return pd.DataFrame(out)


def redact_pii(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple = PII_PATTERNS,
    concurrency=None,
) -> "ray.data.Dataset":
    """-> (id_col, n_email, n_phone, n_ip, n_ssn, clean_text): per-doc PII
    category counts and the redacted text. Stateless streaming map — no
    shuffle, safe at any corpus size; placeholder tokens keep the byte
    layout stable for downstream token accounting. ``concurrency=N`` turns
    the stage into an actor pool (regexes compile once per actor); default
    is stateless tasks with the pickled instance — these four patterns are
    cheap enough that pool warm-up would dominate."""
    cols = docs.select_columns([id_col, text_col])
    if concurrency:
        return cols.map_batches(
            PiiRedactor, fn_constructor_kwargs={
                "text_col": text_col, "id_col": id_col, "patterns": patterns},
            batch_format="pandas", batch_size=4096, concurrency=concurrency)
    return cols.map_batches(PiiRedactor(text_col, id_col, patterns),
                            batch_format="pandas", batch_size=4096)


def pack_sequences(
    docs: "ray.data.Dataset",
    *,
    window: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Sequence packing: lay every document's tokens end to end in doc-id
    order and cut the global stream into fixed ``window``-token training
    contexts — the standard LLM pretraining packing step. Emits the
    assignment table (window_id, doc_id, tok_start, n_window_tokens): doc
    slice [tok_start, tok_start + n_window_tokens) fills its part of
    window_id; a doc spanning a boundary emits one row per window it
    touches.

    The global prefix sum is two-level, never driver-bound: per-doc token
    counts stream through a map; bucket = doc_id // width partials reduce
    to ``num_buckets`` totals; ONLY those (num_buckets ints) reach the
    driver for the exclusive cumsum, are broadcast back via ``ray.put``,
    and each bucket finishes its own within-bucket prefix sum + slice
    emission in one ``map_groups`` — driver state O(num_buckets), shuffle
    bounded by the (id, n) count table, text never moves. Replayable in SQL
    with one SUM() OVER (ORDER BY doc_id) (oracle ``packed_windows``)."""
    if window <= 0:
        raise ValueError("window must be positive")
    from bluegraph_ray.util import hash_aggregate

    def count_toks(batch: pd.DataFrame) -> pd.DataFrame:
        n = (batch[text_col].str.count(" ") + 1).astype(np.int64)
        return pd.DataFrame({id_col: batch[id_col], "n": n})

    # materialized: the (id, n) table is ~16 B/doc and is consumed three
    # times (max id, bucket totals, slice emission) — caching it means the
    # text column is scanned exactly once; spill handles any overflow.
    counts = docs.select_columns([id_col, text_col]).map_batches(
        count_toks, batch_format="pandas", batch_size=None).materialize()
    max_id = int(counts.max(id_col))
    width = max(1, (max_id + num_buckets) // num_buckets)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_pack_bucket"] = (batch[id_col] // width).astype(np.int64)
        return out

    tagged = counts.map_batches(tag, batch_format="pandas", batch_size=None)
    totals = hash_aggregate(
        tagged, "_pack_bucket", {"_tot": ("n", "sum")},
        num_buckets=min(num_buckets, 16)).to_pandas()
    totals = totals.sort_values("_pack_bucket").reset_index(drop=True)
    tot = totals["_tot"].to_numpy(dtype=np.int64)
    base = np.zeros(len(totals), dtype=np.int64)
    np.cumsum(tot[:-1], out=base[1:])
    base_ref = ray.put(dict(zip(totals["_pack_bucket"].astype(int), base.tolist())))

    W = int(window)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        g = group.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = g["n"].to_numpy(dtype=np.int64)
        off = np.zeros(len(g), dtype=np.int64)
        np.cumsum(n[:-1], out=off[1:])
        off += bases[int(g["_pack_bucket"].iat[0])]
        first_w = off // W
        last_w = (off + n - 1) // W
        m = last_w - first_w + 1
        total = int(m.sum())
        rep = np.repeat(np.arange(len(g)), m)
        starts = np.zeros(len(g), dtype=np.int64)
        np.cumsum(m[:-1], out=starts[1:])
        wid = first_w[rep] + (np.arange(total) - starts[rep])
        o, nn = off[rep], n[rep]
        lo = np.maximum(wid * W, o)
        hi = np.minimum((wid + 1) * W, o + nn)
        return pd.DataFrame({
            "window_id": wid,
            id_col: g[id_col].to_numpy()[rep],
            "tok_start": lo - o,
            "n_window_tokens": hi - lo,
        })

    return tagged.groupby("_pack_bucket").map_groups(
        per_bucket, batch_format="pandas")


class GopherRules:
    """Gopher quality-filter rule set (Rae et al. 2021, Table A1) as one
    vectorized per-document flags table — the reference pipelines' manual
    curation has no equivalent; production corpora gate on exactly these
    signals before any model sees a token.

    Emits the raw signal columns plus per-rule booleans and the composed
    ``keep``:

    - ``n_tokens`` within [min_tokens, max_tokens]
    - mean token length within [min_mean_len, max_mean_len]
    - fraction of tokens containing an alphabetic char >= min_alpha_ratio
    - stopword count >= min_stopwords (Gopher's "contains 2 of a small
      stop list" rule; list = the repo-wide STOPWORDS)
    - most-common-bigram mass <= max_top_bigram_frac
    - duplicated-bigram mass <= max_dup_bigram_frac (standing in for the
      duplicate n-gram family; both masses over adjacent token bigrams)

    All ratios are exact integer divisions (sum-of-ints / count), so the
    rule booleans replay bit-exactly in SQL. Pure per-batch math: flat
    token explode + two grouped reductions, no shuffle, no Python loop
    over rows.
    """

    def __init__(self, text_col: str = "text", *, min_tokens: int = 50,
                 max_tokens: int = 100_000, min_mean_len: float = 3.0,
                 max_mean_len: float = 10.0, min_alpha_ratio: float = 0.8,
                 min_stopwords: int = 2, max_top_bigram_frac: float = 0.18,
                 max_dup_bigram_frac: float = 0.30,
                 stopwords: tuple = STOPWORDS):
        self.text_col = text_col
        self.p = (min_tokens, max_tokens, min_mean_len, max_mean_len,
                  min_alpha_ratio, min_stopwords, max_top_bigram_frac,
                  max_dup_bigram_frac)
        self.stop = frozenset(stopwords)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        (min_t, max_t, min_ml, max_ml, min_ar, min_sw, max_tb,
         max_db) = self.p
        toks = batch[self.text_col].str.split(" ")
        lens = toks.map(len).to_numpy(dtype=np.int64)
        n = len(batch)
        flat = pd.Series(np.concatenate(
            [np.asarray(t, dtype=object) for t in toks]))
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)

        tok_len = flat.str.len().to_numpy(dtype=np.int64)
        mean_len = (np.bincount(doc, weights=tok_len, minlength=n)
                    / np.maximum(lens, 1))
        is_alpha = flat.str.contains("[A-Za-z]", regex=True).to_numpy()
        alpha_ratio = (np.bincount(doc, weights=is_alpha, minlength=n)
                       / np.maximum(lens, 1))
        is_stop = flat.isin(self.stop).to_numpy()
        n_stop = np.bincount(doc, weights=is_stop,
                             minlength=n).astype(np.int64)

        w1, w2 = flat.to_numpy()[:-1], flat.to_numpy()[1:]
        same = doc[:-1] == doc[1:] if len(flat) > 1 else np.zeros(0, bool)
        bg = pd.DataFrame({"d": doc[:-1][same], "w1": w1[same],
                           "w2": w2[same]})
        top_bg = np.zeros(n)
        dup_bg = np.zeros(n)
        if len(bg):
            bc = (bg.groupby(["d", "w1", "w2"], sort=False).size()
                  .reset_index(name="c"))
            g = bc.groupby("d", sort=False)["c"]
            tot = g.sum()
            d_idx = tot.index.to_numpy()
            top_bg[d_idx] = g.max().to_numpy() / tot.to_numpy()
            dup = bc[bc["c"] > 1].groupby("d", sort=False)["c"].sum()
            dup_bg[d_idx] = (dup.reindex(tot.index).fillna(0).to_numpy()
                             / tot.to_numpy())

        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_tokens": lens,
            "mean_tok_len": np.round(mean_len, 6),
            "alpha_ratio": np.round(alpha_ratio, 6),
            "n_stop": n_stop,
            "top_bigram_frac": np.round(top_bg, 6),
            "dup_bigram_frac": np.round(dup_bg, 6),
        })
        out["keep"] = ((lens >= min_t) & (lens <= max_t)
                       & (mean_len >= min_ml) & (mean_len <= max_ml)
                       & (alpha_ratio >= min_ar) & (n_stop >= min_sw)
                       & (top_bg <= max_tb) & (dup_bg <= max_db))
        return out


def gopher_rules(ds: "ray.data.Dataset", *, text_col: str = "text",
                 **thresholds) -> "ray.data.Dataset":
    """-> Dataset(doc_id, signals..., keep): the Gopher rule table (see
    :class:`GopherRules`). Filter with ``.map_batches(lambda b:
    b[b["keep"]])`` or join back on doc_id."""
    return ds.map_batches(GopherRules(text_col, **thresholds),
                          batch_format="pandas", batch_size=None)


def doc_entropy(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """-> Dataset(id, n_tokens, entropy): per-document unigram Shannon
    entropy in nats, H = ln(n) - (1/n) * sum_t c_t ln c_t — a standard
    lexical-diversity / degenerate-text quality signal (low entropy =
    repetitive boilerplate). Pure per-batch vectorized math (one flat
    factorize over the batch token stream), no shuffle; rounded to 6
    decimals at emit."""

    def ent(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({id_col: np.array([], dtype=np.int64),
                                 "n_tokens": np.array([], dtype=np.int64),
                                 "entropy": np.array([], dtype=np.float64)})
        toks = batch[text_col].str.split(" ")
        lens = toks.map(len).to_numpy(dtype=np.int64)
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        codes, _ = pd.factorize(flat)
        # count per (doc, token-type), then sum c*ln(c) back per doc
        pair = doc * (codes.max() + 1) + codes
        _, inv, cnt = np.unique(pair, return_inverse=True, return_counts=True)
        clnc = cnt.astype(np.float64) * np.log(cnt.astype(np.float64))
        per_doc = np.zeros(len(batch))
        # each unique (doc, type) contributes once; map uniques back to docs
        uniq_doc = np.zeros(len(cnt), dtype=np.int64)
        uniq_doc[inv] = doc  # every position of a unique writes its doc
        np.add.at(per_doc, uniq_doc, clnc)
        n = np.maximum(lens, 1).astype(np.float64)
        h = np.log(n) - per_doc / n
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_tokens": lens,
            "entropy": np.round(h, 6),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        ent, batch_format="pandas", batch_size=None)


class SentenceStats:
    """Per-document sentence segmentation stats (regex compiled once per
    actor). Sentences = the non-empty pieces of splitting on ``[.!?]+``,
    each trimmed of the four ASCII whitespace chars — a definition chosen
    to replay exactly in SQL (regexp_split_to_array + trim), not a
    linguistic segmenter."""

    _STRIP = " \t\n\r"

    def __init__(self, text_col: str = "text"):
        import re
        self.text_col = text_col
        self.splitter = re.compile(r"[.!?]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_sent = np.empty(len(batch), dtype=np.int64)
        mean_c = np.empty(len(batch), dtype=np.float64)
        max_c = np.empty(len(batch), dtype=np.int64)
        split = self.splitter.split
        strip = self._STRIP
        for i, t in enumerate(batch[self.text_col].to_numpy()):
            lens = [len(p) for p in
                    (q.strip(strip) for q in split(t)) if p]
            n = len(lens)
            n_sent[i] = n
            mean_c[i] = 0.0 if n == 0 else float(sum(lens)) / n
            max_c[i] = max(lens) if n else 0
        out = batch[[c for c in batch.columns if c != self.text_col]].copy()
        out["n_sentences"] = n_sent
        out["mean_sentence_chars"] = np.round(mean_c, 6)
        out["max_sentence_chars"] = max_c
        return out


def sentence_stats(ds: "ray.data.Dataset", *,
                   text_col: str = "text") -> "ray.data.Dataset":
    """-> per-doc (n_sentences, mean_sentence_chars, max_sentence_chars);
    integer char sums divided once at emit, so the mean replays IEEE-exact."""
    return ds.map_batches(SentenceStats(text_col), batch_format="pandas",
                          batch_size=None)
