"""Vectorized mutual-information family for co-occurrence statistics.

Semantics match the reference scalar implementation
(/root/reference/bluegraph/preprocess/generators.py:27-73, ``mutual_information``):

- ``pmi``      : log2(N * co / (s * t))
- ``expected`` : pmi * (co / N)
- ``normalized`` (NPMI): pmi / (-log2(co / N)); 0 when the normalizer is 0
- ``pmi2``     : log2(co^2 / (s * t))
- ``pmi3``     : log2(co^3 / (s * t * N))

All variants return 0 when co == 0 and are clamped to ``max(mi, 0)`` — the
reference applies the positive clamp to EVERY variant (generators.py:73).

These are numpy array kernels intended to run inside ``map_batches`` — never
per-row Python.
"""

from __future__ import annotations

import numpy as np

_VARIANTS = ("pmi", "expected", "normalized", "pmi2", "pmi3")


def mutual_information(
    co_freq: np.ndarray,
    s_freq: np.ndarray,
    t_freq: np.ndarray,
    total_instances: float,
    mitype: str | None = None,
) -> np.ndarray:
    """Vectorized PMI family; inputs broadcast like numpy arrays.

    ``mitype=None`` computes plain PMI (clamped => PPMI); ``"normalized"`` is
    NPMI. Zero co-occurrence rows yield 0. Output dtype float64.
    """
    if mitype is not None and mitype not in _VARIANTS[1:]:
        raise ValueError(
            "Provided Mutual information score type (mitype) is not supported. "
            "Provide one value from the following list "
            "['expected', 'normalized', 'pmi2', 'pmi3']"
        )
    co = np.asarray(co_freq, dtype=np.float64)
    s = np.asarray(s_freq, dtype=np.float64)
    t = np.asarray(t_freq, dtype=np.float64)
    n = float(total_instances)

    pos = co > 0
    # Avoid log of zero by substituting 1 where co == 0; those lanes are zeroed.
    co_safe = np.where(pos, co, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        if mitype is None:
            mi = np.log2(n * co_safe / (s * t))
        elif mitype == "expected":
            mi = np.log2(n * co_safe / (s * t)) * (co_safe / n)
        elif mitype == "normalized":
            alpha = -np.log2(co_safe / n)
            pmi = np.log2(n * co_safe / (s * t))
            mi = np.where(alpha != 0, pmi / np.where(alpha != 0, alpha, 1.0), 0.0)
        elif mitype == "pmi2":
            mi = np.log2(co_safe**2 / (s * t))
        else:  # pmi3
            mi = np.log2(co_safe**3 / (s * t * n))
    mi = np.where(pos, mi, 0.0)
    return np.maximum(mi, 0.0)


def ppmi(co_freq, s_freq, t_freq, total_instances) -> np.ndarray:
    """Positive PMI (the reference's default statistic)."""
    return mutual_information(co_freq, s_freq, t_freq, total_instances)


def npmi(co_freq, s_freq, t_freq, total_instances) -> np.ndarray:
    """Normalized PMI in [0, 1] after the positive clamp."""
    return mutual_information(
        co_freq, s_freq, t_freq, total_instances, mitype="normalized"
    )
