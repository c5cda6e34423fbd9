"""Deterministic synthetic source-code table — the engine's primary input shape.

Schema (per BASELINE.json input_hint): ``repo:string, path:string, commit:string,
lang:string, content:string`` — one row per source file. This generator is fully
deterministic given (n_files, seed, pool sizes): every cell is derived from the
row index via a splitmix64 counter-based hash, so the table is identical no
matter how Ray partitions the generation, and any scale can be regenerated
exactly.

Distribution design (FIXTURES.md F1/F7):
- repo sizes are zipf-ish (inverse-CDF over 1/r^1.1 weights) -> a few giant hub
  repos exercise skew handling;
- ``lang`` is drawn from 10 languages with zipf weights (one dominant hub factor);
- ``path`` basenames come from a shared pool (entities that recur across repos —
  this is what makes the co-occurrence graph non-trivial);
- ``content`` is deterministic pseudo-code that embeds importable identifiers;
- pool sizes (repos/basenames/dirs) scale with ``n_files`` by default so the
  derived co-occurrence graph grows with the table instead of saturating.

``sha256(content)`` is the per-row invariant carried through every stage
(added by :func:`with_sha256`).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

_LANGS = [
    "python", "javascript", "java", "cpp", "go",
    "rust", "ruby", "typescript", "c", "scala",
]
_EXT = {
    "python": "py", "javascript": "js", "java": "java", "cpp": "cc", "go": "go",
    "rust": "rs", "ruby": "rb", "typescript": "ts", "c": "c", "scala": "scala",
}

_WORDS = [
    "alpha", "beta", "gamma", "delta", "core", "util", "main", "engine", "graph",
    "node", "edge", "parser", "lexer", "token", "stream", "batch", "index",
    "store", "cache", "proto", "model", "train", "eval", "metric", "config",
    "server", "client", "worker", "sched", "queue", "pool", "shard", "merge",
    "split", "hash", "sort", "scan", "filter", "reduce", "mapper",
]


@dataclass(frozen=True)
class SourceTableSpec:
    """Deterministic generation parameters. Defaults scale pools with n_files."""

    n_files: int
    seed: int = 42
    n_repos: int = 0       # 0 -> max(120, n_files // 200)
    n_basenames: int = 0   # 0 -> max(400, n_files // 8)
    n_dirs: int = 0        # 0 -> max(40, n_files // 500)
    n_tokens: int = 0      # 0 -> max(800, n_files // 8)
    repo_zipf: float = 1.1
    lang_zipf: float = 1.3

    def resolved(self) -> "SourceTableSpec":
        import dataclasses

        return dataclasses.replace(
            self,
            n_repos=self.n_repos or max(120, self.n_files // 200),
            n_basenames=self.n_basenames or max(400, self.n_files // 8),
            n_dirs=self.n_dirs or max(40, self.n_files // 500),
            n_tokens=self.n_tokens or max(800, self.n_files // 8),
        )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mix; deterministic, vectorized."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_stream(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    base = np.uint64(seed) * np.uint64(0x100000001B3) + np.uint64(stream)
    return _splitmix64(idx.astype(np.uint64) ^ _splitmix64(np.full_like(idx, base, dtype=np.uint64)))


def _uniform(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return (_hash_stream(idx, stream, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def _make_batch(idx: np.ndarray, spec: SourceTableSpec) -> pa.Table:
    seed = spec.seed
    repo_cdf = _zipf_cdf(spec.n_repos, spec.repo_zipf)
    lang_cdf = _zipf_cdf(len(_LANGS), spec.lang_zipf)
    repo_id = np.searchsorted(repo_cdf, _uniform(idx, 1, seed), side="right")
    lang_id = np.searchsorted(lang_cdf, _uniform(idx, 2, seed), side="right")
    base_id = (_hash_stream(idx, 3, seed) % np.uint64(spec.n_basenames)).astype(np.int64)
    dir_id = (_hash_stream(idx, 4, seed) % np.uint64(spec.n_dirs)).astype(np.int64)
    depth = (_hash_stream(idx, 5, seed) % np.uint64(3)).astype(np.int64)  # 0..2 extra dirs
    tok_a = (_hash_stream(idx, 6, seed) % np.uint64(spec.n_tokens)).astype(np.int64)
    tok_b = (_hash_stream(idx, 7, seed) % np.uint64(spec.n_tokens)).astype(np.int64)
    tok_c = (_hash_stream(idx, 8, seed) % np.uint64(spec.n_tokens)).astype(np.int64)
    nw = len(_WORDS)

    repos, paths, commits, langs, contents = [], [], [], [], []
    for k in range(len(idx)):
        r = int(repo_id[k])
        lang = _LANGS[int(lang_id[k])]
        org = _WORDS[r % nw]
        repo = f"{org}{r % 7}/{_WORDS[(r * 13 + 5) % nw]}-{r}"
        b = int(base_id[k])
        basename = f"{_WORDS[b % nw]}_{_WORDS[(b // nw) % nw]}{b}"
        parts = [f"{_WORDS[(int(dir_id[k]) + d * 7) % nw]}{int(dir_id[k]) // nw}" for d in range(int(depth[k]) + 1)]
        path = "/".join(parts) + f"/{basename}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{seed}:{repo}".encode()).hexdigest()[:12]
        ta, tb, tc = int(tok_a[k]), int(tok_b[k]), int(tok_c[k])
        t1 = f"{_WORDS[ta % nw]}_{ta}"
        t2 = f"{_WORDS[tb % nw]}_{tb}"
        t3 = f"{_WORDS[tc % nw]}_{tc}"
        content = (
            f"// file {path} in {repo}\n"
            f"import {t1}\nimport {t2}\nimport {t3}\n"
            f"def {basename}_main(x):\n"
            f"    y = {t1}.apply(x) + {t2}.scan({ta % 31})\n"
            f"    return {t3}.reduce(y, seed={int(idx[k]) % 1000})\n"
        )
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def source_code_table(
    n_files: int,
    seed: int = 42,
    *,
    parallelism: int = -1,
    spec: SourceTableSpec | None = None,
) -> "ray.data.Dataset":
    """Distributed deterministic generation: ``range(n) -> map_batches(gen)``.

    Partition-independent: each row is derived solely from its index, so the
    same spec yields the same table at any parallelism.
    """
    spec = (spec or SourceTableSpec(n_files=n_files, seed=seed)).resolved()
    ds = ray.data.range(n_files, override_num_blocks=parallelism if parallelism > 0 else None)

    def gen(batch: pa.Table) -> pa.Table:
        return _make_batch(batch.column("id").to_numpy(), spec)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


def source_code_table_arrow(n_files: int, seed: int = 42, spec: SourceTableSpec | None = None) -> pa.Table:
    """Driver-side generation of a small table (tests / oracles)."""
    spec = (spec or SourceTableSpec(n_files=n_files, seed=seed)).resolved()
    return _make_batch(np.arange(n_files, dtype=np.uint64), spec)


def sha256_column(batch: pa.Table, column: str = "content", out: str = "content_sha256") -> pa.Table:
    """Append sha256 hex of ``column`` — the per-row invariant stage."""
    vals = [
        hashlib.sha256(v.encode() if v is not None else b"").hexdigest()
        for v in batch.column(column).to_pylist()
    ]
    return batch.append_column(out, pa.array(vals, pa.string()))


def with_sha256(ds: "ray.data.Dataset", column: str = "content") -> "ray.data.Dataset":
    return ds.map_batches(lambda t: sha256_column(t, column), batch_format="pyarrow", batch_size=None)
