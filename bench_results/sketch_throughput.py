"""Sketch-hash throughput: sha256 oracle mode vs vectorized fast mode.

Measures MinHasher / SimHasher __call__ end-to-end on a synthetic batch
(500 docs x 400 tokens) plus the hashing step in isolation. The universal-
hash affine minima / bit-vote reduction is a SHARED floor paid by both
modes, so end-to-end speedup is smaller than the hashing-step speedup.

Run: python bench_results/sketch_throughput.py
"""
import json
import time

import numpy as np
import pandas as pd

from bluegraph_ray.pipelines.dedup import (
    MinHasher, SimHasher, _fast_shingle_hashes, _hash64, _token_shingles)


def best_of(fn, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    vocab = [f"word{i}" for i in range(30000)]
    docs = [" ".join(rng.choice(vocab, 400)) for _ in range(500)]
    batch = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    n_shingles = sum(max(1, len(d.split(" ")) - 2) for d in docs)

    res = {"docs": len(docs), "shingles": n_shingles}
    for cls in (MinHasher, SimHasher):
        t = {m: best_of(lambda m=m: cls(hash_mode=m)(batch))
             for m in ("sha256", "fast")}
        res[cls.__name__] = {
            "sha256_s": round(t["sha256"], 4), "fast_s": round(t["fast"], 4),
            "speedup": round(t["sha256"] / t["fast"], 2),
            "fast_docs_per_s": round(len(docs) / t["fast"])}

    # hashing step alone (what the fast path actually replaces)
    all_sh = [s for d in docs for s in _token_shingles(d, 3)]
    t_sha = best_of(lambda: _hash64([s.encode() for s in all_sh]), 3)
    t_fast = best_of(lambda: _fast_shingle_hashes(docs, 3), 3)
    res["hashing_step"] = {
        "sha256_s": round(t_sha, 4), "fast_s": round(t_fast, 4),
        "speedup": round(t_sha / t_fast, 2)}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
