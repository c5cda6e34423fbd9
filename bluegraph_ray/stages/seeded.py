"""Semi-supervised SEEDED label spreading over the CSR partition actors.

The transductive classification primitive (Zhu & Ghahramani 2002, "Learning
from Labeled and Unlabeled Data with Label Propagation"): a small labeled
seed set is pinned, every other vertex synchronously takes the
argmax-total-weight label among its LABELED neighbours each superstep
(ties -> smallest label), recomputed fresh per round (non-sticky). The
unlabeled sentinel is -1. Complements ``stages/lpa.py`` (unseeded community
LPA with damping) and the reference's downstream node classifiers
(``bluegraph/downstream/node_classification.py`` — model-based): this is the
model-free graph-native variant a 100 TB pipeline can run as pure supersteps.

Semantics chosen for exact replayability:

* synchronous, fixed iteration count (the ``power-K`` query convention) —
  no convergence-order nondeterminism;
* labeledness is MONOTONE: a labeled vertex always re-wins some label
  (its labeled neighbour of the previous round stays labeled by induction
  from the pinned seeds), so no vote from a vertex's own previous label is
  needed;
* label VALUES may keep flipping on tie-ish structures — fixed K makes
  that deterministic rather than oscillation-prone.

Distribution: identical shape to LPA — the O(n) label vector is
``ray.put`` ONCE per superstep and every CSR partition actor gathers its
dst range; the exchange per superstep is one broadcast + per-partition
(dst, winner) pairs, never edges.
"""

from __future__ import annotations

import numpy as np

import ray

from bluegraph_ray.stages.build import GraphHandle, make_partition_actors


def seeded_label_spread(
    handle: GraphHandle,
    seed_ids: np.ndarray,
    seed_labels: np.ndarray,
    actors=None,
    *,
    iterations: int = 8,
) -> np.ndarray:
    """-> dense int64 label vector (length handle.n; -1 = never reached).

    ``seed_ids`` are dense vertex ids; ``seed_labels`` arbitrary int64 class
    ids (commonly the seed's own id). Exactly ``iterations`` synchronous
    supersteps — pair with a fixed-K SQL replay for value verification."""
    seed_ids = np.asarray(seed_ids, dtype=np.int64)
    seed_labels = np.asarray(seed_labels, dtype=np.int64)
    if len(seed_ids) != len(seed_labels):
        raise ValueError("seed_ids and seed_labels must align")
    if len(seed_ids) and (seed_ids.min() < 0 or seed_ids.max() >= handle.n):
        raise ValueError("seed id out of range")
    if len(seed_labels) and seed_labels.min() < 0:
        raise ValueError("seed labels must be >= 0 (-1 is the unlabeled "
                         "sentinel)")
    if len(seed_labels) and seed_labels.max() >= handle.n:
        # the gather kernel packs (dst, label) into one int64 code as
        # dst * n + label — labels must live in dense-id space; map
        # arbitrary class ids through a dense codebook first
        raise ValueError("seed labels must be < handle.n (dense space)")

    own_actors = actors is None
    if actors is None:
        actors = make_partition_actors(handle)
    try:
        labels = np.full(handle.n, -1, dtype=np.int64)
        labels[seed_ids] = seed_labels
        for _ in range(iterations):
            ref = ray.put(labels)
            parts = ray.get(
                [a.seeded_mode_gather.remote(ref) for a in actors])
            new = np.full(handle.n, -1, dtype=np.int64)
            for ids, winners in parts:
                if len(ids):
                    new[ids] = winners
            new[seed_ids] = seed_labels
            labels = new
        return labels
    finally:
        if own_actors:
            for a in actors:
                ray.kill(a)
