"""Set-valued cell semantics.

The reference stores "category" property cells as Python sets / lists / scalars
(/root/reference/bluegraph/core/utils.py:24-105). In the Ray engine, set-valued
columns are Arrow ``list<T>`` columns with a *canonical encoding*: sorted unique
elements. These helpers implement the same merge/intersect semantics for use
inside ``map_batches`` / ``map_groups`` kernels and at the (small) driver edges
of pipelines.
"""

from __future__ import annotations

import math
from collections import Counter


def normalize_to_set(value) -> set:
    """Scalar / list / set / None / NaN -> set.

    Mirrors /root/reference/bluegraph/core/utils.py:24-40.
    """
    if isinstance(value, set):
        return value
    if value is None:
        return set()
    try:
        if math.isnan(value):
            return set()
        return {value}
    except TypeError:
        if isinstance(value, (list, tuple, frozenset)):
            return set(value)
        return {value}


def aggregate_values(values):
    """Union a sequence of scalar-or-set values, skipping NaN.

    Singleton -> scalar, empty -> NaN — mirrors ``_aggregate_values``
    (/root/reference/bluegraph/core/utils.py:43-56).
    """
    out: set = set()
    for el in values:
        if isinstance(el, (set, frozenset, list, tuple)):
            out.update(el)
        elif isinstance(el, str):
            out.add(el)
        elif el is None:
            continue
        else:
            try:
                if not math.isnan(el):
                    out.add(el)
            except TypeError:
                out.add(el)
    if len(out) == 1:
        return next(iter(out))
    if not out:
        return math.nan
    return out


def safe_intersection(a, b):
    """Multiset-aware intersection.

    If either side is a list, both are treated as multisets and the result is a
    list with per-element min counts; otherwise plain set intersection.
    Mirrors /root/reference/bluegraph/core/utils.py:59-79.
    """
    if isinstance(a, list) or isinstance(b, list):
        c1, c2 = Counter(a), Counter(b)
        common = set(c1) & set(c2)
        out: list = []
        for k in common:
            out.extend([k] * min(c1[k], c2[k]))
        return out
    return normalize_to_set(a) & normalize_to_set(b)


def element_has_type(element_type, query_type) -> bool:
    """Subset membership test for @type cells
    (/root/reference/bluegraph/core/utils.py:82-87)."""
    if not isinstance(element_type, set):
        element_type = normalize_to_set(element_type)
    if not isinstance(query_type, set):
        query_type = normalize_to_set(query_type)
    return query_type.issubset(element_type)


def str_to_set(s: str):
    """Parse ``"{'a', 'b'}"`` CSV round-trip cells
    (/root/reference/bluegraph/core/utils.py:90-95)."""
    if s and s[0] == "{":
        inner = s[1:-1]
        return {t.strip()[1:-1] for t in inner.split(",")}
    return s


def canonical_list(value) -> list:
    """Canonical Arrow encoding of a set-valued cell: sorted unique list."""
    return sorted(normalize_to_set(value))
