"""Superstep checkpoint/resume with per-partition lineage + convergence metrics.

The reference has no checkpointing at all (its longest job reruns from scratch —
SURVEY.md §4). Here every iterative algorithm (PageRank / CC / LPA) can write,
every K supersteps, an atomic checkpoint:

    {dir}/{algo}/iter={k}/state.parquet    — the dense vertex-state vector(s)
    {dir}/{algo}/iter={k}/manifest.json    — iteration, convergence metrics
                                             (err history, seconds/superstep),
                                             graph lineage (path, n, m,
                                             partition sizes)

Writes go to a temp dir then ``os.rename`` (atomic on one filesystem), so a
killed run never leaves a half-written checkpoint. ``latest()`` returns the
newest complete iteration; resume = load state and continue the loop —
bitwise-identical to an uninterrupted run because supersteps are deterministic.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class SuperstepCheckpoint:
    def __init__(self, root: str, algorithm: str):
        self.dir = os.path.join(root, algorithm)
        os.makedirs(self.dir, exist_ok=True)

    def save(self, iteration: int, state: dict[str, np.ndarray], manifest: dict) -> str:
        final = os.path.join(self.dir, f"iter={iteration}")
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(pa.table({k: pa.array(v) for k, v in state.items()}),
                       os.path.join(tmp, "state.parquet"))
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump({"iteration": iteration, **manifest}, f)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return final

    def iterations(self) -> list[int]:
        out = []
        for d in os.listdir(self.dir):
            if d.startswith("iter=") and not d.endswith(".tmp"):
                if os.path.exists(os.path.join(self.dir, d, "manifest.json")):
                    out.append(int(d.split("=", 1)[1]))
        return sorted(out)

    def latest(self):
        """-> (iteration, state_dict, manifest) | None"""
        its = self.iterations()
        if not its:
            return None
        k = its[-1]
        d = os.path.join(self.dir, f"iter={k}")
        tbl = pq.read_table(os.path.join(d, "state.parquet"))
        state = {c: tbl.column(c).to_numpy() for c in tbl.column_names}
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        return k, state, manifest
