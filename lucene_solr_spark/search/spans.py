"""Span-near kernels (the spans family MVP over the positions plumbing).

Reference semantics source: lucene/core/src/java/org/apache/lucene/search/
spans/NearSpansOrdered.java and NearSpansUnordered.java, specialized to
unit-length (single-term) sub-spans. Two documented simplifications:

- ordered: a match is anchored at each occurrence of the LAST clause; the
  chain greedily takes the closest preceding occurrence of each earlier
  clause (strictly decreasing positions), and matches when the total gap
  (last - first) - (k - 1) <= slop. This reproduces NearSpansOrdered's
  shrinkToAfterShortestMatch width for every anchor; Lucene's enumeration
  order differs but the per-doc match count agrees for unit sub-spans.
- unordered: minimal windows over DISTINCT occurrences (repeat handling as
  in sloppy.py) with width (max - min) - (k - 1) <= slop
  (NearSpansUnordered.java: end - start - totalLength <= slop with
  totalLength = k for unit spans).

Both run per candidate doc AFTER posting-list intersection, so the Python
loop is bounded by matching docs — the same cost profile as the sloppy
phrase scorer.
"""

from __future__ import annotations

import numpy as np

from .sloppy import _resolve_repeats


def span_near_ordered_count(pos_lists: list[np.ndarray], slop: int) -> int:
    """Ordered span-near match count for one doc (unit sub-spans)."""
    k = len(pos_lists)
    if any(len(p) == 0 for p in pos_lists):
        return 0
    if k == 1:
        return len(pos_lists[0])
    count = 0
    for pk in np.asarray(pos_lists[-1], dtype=np.int64):
        p = int(pk)
        ok = True
        for j in range(k - 2, -1, -1):
            arr = pos_lists[j]
            i = int(np.searchsorted(arr, p)) - 1  # closest strictly before p
            if i < 0:
                ok = False
                break
            p = int(arr[i])
        if ok and (int(pk) - p) - (k - 1) <= slop:
            count += 1
    return count


def span_near_unordered_count(
    pos_lists: list[np.ndarray],
    slop: int,
    terms: list[str] | None = None,
) -> int:
    """Unordered span-near match count: minimal windows over distinct
    occurrences, width (max - min) - (k - 1) <= slop."""
    adjusted = [np.asarray(p, dtype=np.int64) for p in pos_lists]
    if any(len(a) == 0 for a in adjusted):
        return 0
    k = len(adjusted)
    if k == 1:
        return len(adjusted[0])
    groups: list[list[int]] = []
    if terms is not None:
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(i)
        groups = [g for g in by_term.values() if len(g) > 1]
    zero_offsets = [0] * k
    idx = [0] * k
    if groups and not _resolve_repeats(adjusted, zero_offsets, idx, groups):
        return 0
    count = 0
    while True:
        cur = [int(adjusted[i][idx[i]]) for i in range(k)]
        if (max(cur) - min(cur)) - (k - 1) <= slop:
            count += 1
        i = cur.index(min(cur))
        idx[i] += 1
        if idx[i] >= len(adjusted[i]):
            return count
        if groups and not _resolve_repeats(adjusted, zero_offsets, idx, groups):
            return count


def span_near_count(
    pos_lists: list[np.ndarray],
    slop: int,
    ordered: bool,
    terms: list[str] | None = None,
) -> int:
    if ordered:
        return span_near_ordered_count(pos_lists, slop)
    return span_near_unordered_count(pos_lists, slop, terms)
