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


# ---------------------------------------------------------------------------
# batched (cross-doc vectorized) kernels
#
# Global coordinates: gpos = docid * SHIFT + pos with SHIFT > any position,
# so one sorted int64 array holds every candidate doc's positions and the
# per-doc kernels below become whole-array numpy ops — no per-doc Python
# loop (the same rewrite exact-phrase got in round 2).
# ---------------------------------------------------------------------------

SHIFT = np.int64(1) << 21  # > max field length (SmallFloat table caps at 2M)

# Largest token position the index accepts, mirroring Lucene's
# IndexWriter.MAX_POSITION guard (IndexWriter.java: MAX_POSITION =
# Integer.MAX_VALUE - 128). The 256-slot headroom below SHIFT absorbs the
# sloppy-phrase offset bias (positions shifted up by max(offsets) in
# _phrase_freqs) so a biased position can never bleed into the next doc's
# coordinate block (ADVICE r3).
MAX_POSITION = int(SHIFT) - 256


class PositionOverflow(ValueError):
    """A position (+ query-side bias) would cross its doc's 2^21 global-
    coordinate block. Callers with a sequential per-doc kernel catch this
    and fall back; only a truly illegal index (position > MAX_POSITION,
    which the build guard rejects) surfaces it to the user."""


def check_positions(flat: np.ndarray, bias: int = 0) -> None:
    """Guard a flat position array before it enters global (docid*SHIFT+pos)
    coordinates: every position + bias must stay inside one doc block.
    Raises PositionOverflow instead of silently corrupting the batched
    span/phrase kernels; a legal index can still trip this when a very
    long sloppy phrase's offset bias pushes past the block edge, so the
    sloppy path treats it as 'use the sequential kernel', not an error."""
    if len(flat) and int(flat.max()) + bias >= int(SHIFT):
        raise PositionOverflow(
            f"position {int(flat.max())} + bias {bias} exceeds the "
            f"2^21-token field limit (MAX_POSITION={MAX_POSITION})"
        )


def near_ordered_spans_batch(
    arrs: list[np.ndarray], slop: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ordered span-near over unit sub-spans, all docs at once.

    arrs[j]: sorted global positions of clause j. A match anchors at each
    occurrence of the LAST clause and greedily chains the closest strictly
    preceding occurrence of each earlier clause (NearSpansOrdered's
    shrinkToAfterShortestMatch width — spans.py header). A chain that
    crosses a doc boundary lands in an earlier doc block and is dropped by
    the same-doc check. Returns (gstart, gend, width) sorted by gend."""
    k = len(arrs)
    if any(len(a) == 0 for a in arrs):
        z = np.zeros(0, np.int64)
        return z, z, z
    anchors = arrs[-1]
    if k == 1:
        return anchors, anchors + 1, np.zeros(len(anchors), np.int64)
    p = anchors
    valid = np.ones(len(p), dtype=bool)
    for j in range(k - 2, -1, -1):
        idx = np.searchsorted(arrs[j], p) - 1  # closest strictly before
        valid &= idx >= 0
        p = arrs[j][np.maximum(idx, 0)]
    width = (anchors - p) - (k - 1)
    valid &= (p // SHIFT) == (anchors // SHIFT)
    valid &= width <= slop
    return p[valid], anchors[valid] + 1, width[valid]


def sweep_windows_batch(
    arrs: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized minimal-window sweep (PhrasePositions queue analog),
    all docs at once — the batch form of the advance-the-minimum loop in
    sloppy_phrase_freq / span_near_unordered_count (no repeat groups).

    The sequential sweep retires elements in global sorted order (ties by
    list index) and evaluates one window per retired element x from list i:
    [x, max_j head_j] where head_j is list j's first unretired element.
    head_j = first element >= x for j > i (its equal element, if any, is
    not yet retired) and first element > x for j < i. An element whose
    window lacks a same-doc head in some list was never evaluated by the
    sequential sweep (that list exhausted first) and is marked invalid.

    Returns (starts, maxheads, valid) aligned to elements in retire order
    (sorted by (value, list index)) — callers derive dist/width and filter.
    """
    k = len(arrs)
    vals = np.concatenate(arrs)
    lidx = np.concatenate(
        [np.full(len(a), j, dtype=np.int64) for j, a in enumerate(arrs)]
    )
    order = np.lexsort((lidx, vals))  # retire order
    xv, xi = vals[order], lidx[order]
    maxhead = xv.copy()
    valid = np.ones(len(xv), dtype=bool)
    xdoc = xv // SHIFT
    for j in range(k):
        a = arrs[j]
        hl = np.searchsorted(a, xv, side="left")
        hr = np.searchsorted(a, xv, side="right")
        idx = np.where(j > xi, hl, hr)
        take = xi != j
        ok = take & (idx < len(a))
        head = a[np.minimum(idx, len(a) - 1)]
        ok &= (head // SHIFT) == xdoc
        valid &= ~take | ok
        np.maximum(maxhead, np.where(ok, head, -1), out=maxhead)
    return xv, maxhead, valid


def near_unordered_spans_batch(
    arrs: list[np.ndarray], slop: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unordered span-near over unit sub-spans, all docs at once: minimal
    windows with width (max - min) - (k - 1) <= slop. Requires DISTINCT
    clause terms (repeat groups take the sequential kernel)."""
    k = len(arrs)
    if any(len(a) == 0 for a in arrs):
        z = np.zeros(0, np.int64)
        return z, z, z
    if k == 1:
        a = arrs[0]
        return a, a + 1, np.zeros(len(a), np.int64)
    starts, maxheads, valid = sweep_windows_batch(arrs)
    width = (maxheads - starts) - (k - 1)
    valid = valid & (width <= slop)
    return starts[valid], maxheads[valid] + 1, width[valid]


def near_unordered_intervals_matches(
    span_lists: list[list[tuple[int, int]]],
    slop: int,
    keys: list | None = None,
) -> list[tuple[int, int, int]]:
    """Sequential kernel: unordered span-near over GENERAL (interval)
    sub-spans for ONE doc (spans/NearSpansUnordered.java: cells ordered by
    start, match when maxEnd - minStart - totalSpanLength <= slop, then
    the min-start cell advances; start ties advance the lowest clause
    index — documented tiebreak, the batch kernel mirrors it). Returns
    the qualifying windows as (minStart, maxEnd, width).

    ``keys`` enables repeat reconciliation for REPEATED IDENTICAL
    sub-clauses (equal keys form a repeat group): before each window the
    group's assigned spans must be pairwise distinct — colliding members
    advance (the SloppyPhraseScorer.advanceRpts analog over spans)."""
    if any(len(s) == 0 for s in span_lists):
        return []
    k = len(span_lists)
    groups: list[list[int]] = []
    if keys is not None:
        by_key: dict = {}
        for i, kk in enumerate(keys):
            by_key.setdefault(kk, []).append(i)
        groups = [g for g in by_key.values() if len(g) > 1]
    idx = [0] * k

    def resolve() -> bool:
        changed = True
        while changed:
            changed = False
            for grp in groups:
                seen: dict = {}
                for m in grp:
                    h = span_lists[m][idx[m]]
                    if h in seen:
                        other = seen[h]
                        adv = m if h <= span_lists[other][idx[other]] else other
                        idx[adv] += 1
                        if idx[adv] >= len(span_lists[adv]):
                            return False
                        changed = True
                        break
                    seen[h] = m
                if changed:
                    break
        return True

    if groups and not resolve():
        return []
    out: list[tuple[int, int, int]] = []
    while True:
        heads = [sl[i] for sl, i in zip(span_lists, idx)]
        minstart = min(h[0] for h in heads)
        maxend = max(h[1] for h in heads)
        total = sum(h[1] - h[0] for h in heads)
        width = (maxend - minstart) - total
        if width <= slop:
            out.append((minstart, maxend, width))
        i = next(j for j, h in enumerate(heads) if h[0] == minstart)
        idx[i] += 1
        if idx[i] >= len(span_lists[i]):
            return out
        if groups and not resolve():
            return out


def near_unordered_intervals_count(
    span_lists: list[list[tuple[int, int]]], slop: int
) -> int:
    """Match count form of near_unordered_intervals_matches (no repeats)."""
    return len(near_unordered_intervals_matches(span_lists, slop))


def near_unordered_general_batch(
    subs: list[tuple[np.ndarray, np.ndarray]], slop: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unordered span-near over GENERAL (possibly non-unit) sub-spans,
    all docs at once — enables near(near(a,b), c, ordered=False) etc.
    Batch form of near_unordered_intervals_count: element x of clause i
    retires in (start, clause-index, end) order; its window pairs it with
    each clause's first unretired span (start >= x.start for j > i,
    start > x.start for j < i — within a clause, (start, end) order) and
    matches when (maxEnd - x.start) - sum(head lengths) <= slop. A head
    landing outside x's doc block means that clause exhausted first and
    x's window was never evaluated (invalid), exactly like
    sweep_windows_batch. Returns (gstart, gend, width)."""
    k = len(subs)
    z = np.zeros(0, np.int64)
    if any(len(gs) == 0 for gs, _ge in subs):
        return z, z, z
    if k == 1:
        gs, ge = subs[0]
        return gs, ge, np.zeros(len(gs), np.int64)
    starts = np.concatenate([gs for gs, _ge in subs])
    ends = np.concatenate([ge for _gs, ge in subs])
    lidx = np.concatenate(
        [np.full(len(gs), j, np.int64) for j, (gs, _ge) in enumerate(subs)]
    )
    order = np.lexsort((ends, lidx, starts))  # retire order
    xs, xe, xi = starts[order], ends[order], lidx[order]
    xdoc = xs // SHIFT
    maxend = xe.copy()
    sumlen = xe - xs
    valid = np.ones(len(xs), dtype=bool)
    for j, (gs, ge) in enumerate(subs):
        hl = np.searchsorted(gs, xs, side="left")
        hr = np.searchsorted(gs, xs, side="right")
        idx = np.where(j > xi, hl, hr)
        take = xi != j
        ok = take & (idx < len(gs))
        ii = np.minimum(idx, len(gs) - 1)
        hs, he = gs[ii], ge[ii]
        ok &= (hs // SHIFT) == xdoc
        valid &= ~take | ok
        np.maximum(maxend, np.where(ok, he, -1), out=maxend)
        sumlen = sumlen + np.where(ok, he - hs, 0)
    width = (maxend - xs) - sumlen
    m = valid & (width <= slop)
    return xs[m], maxend[m], width[m]


def sloppy_phrase_freqs_batch(
    arrs: list[np.ndarray], slop: int, max_doc_ord: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batch sloppy-phrase frequency: arrs[j] = OFFSET-ADJUSTED global
    positions of phrase slot j (gpos = docid * SHIFT + (pos - offset_j)),
    distinct terms only. Returns (doc_ids, freqs float64) for docs with
    freq > 0, summing sloppyFreq(dist) = 1/(dist+1) per qualifying window
    in retire order — the same float64 accumulation order as the
    sequential sweep, so results are bit-identical."""
    k = len(arrs)
    if any(len(a) == 0 for a in arrs):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    if k == 1:
        d, c = np.unique(arrs[0] // SHIFT, return_counts=True)
        return d, c.astype(np.float64)
    starts, maxheads, valid = sweep_windows_batch(arrs)
    dist = maxheads - starts
    m = valid & (dist <= slop)
    if not m.any():
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    contrib = 1.0 / (dist[m] + 1.0)
    docs = starts[m] // SHIFT
    freqs = np.zeros(max_doc_ord, dtype=np.float64)
    # np.add.at accumulates sequentially in the given order; `m` preserves
    # retire order, so per-doc sums match the sequential kernel bit-for-bit
    np.add.at(freqs, docs, contrib)
    d = np.flatnonzero(freqs > 0)
    return d, freqs[d]


# ---------------------------------------------------------------------------
# span-query algebra (SpanTermQuery / SpanNearQuery / SpanOrQuery /
# SpanNotQuery / SpanFirstQuery — lucene/core/src/java/org/apache/lucene/
# search/spans/*.java), evaluated batch-wise over global coordinates
# ---------------------------------------------------------------------------

from dataclasses import dataclass


@dataclass(frozen=True)
class SpanTerm:
    term: str


@dataclass(frozen=True)
class SpanOr:
    subs: tuple


@dataclass(frozen=True)
class SpanNear:
    subs: tuple
    slop: int = 0
    ordered: bool = True


@dataclass(frozen=True)
class SpanNot:
    """Include spans that do NOT overlap any exclude span, with the
    reference's pre/post slack (SpanNotQuery.java:40-62: exclusion window
    [start - pre, end + post))."""
    include: object
    exclude: object
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanFirst:
    """Spans of ``match`` ending at position <= ``end``
    (SpanFirstQuery.java:40-62: spanPositionCheck end() <= end)."""
    match: object
    end: int


def span_terms(node) -> set:
    if isinstance(node, SpanTerm):
        return {node.term}
    if isinstance(node, SpanOr):
        return set().union(*(span_terms(s) for s in node.subs))
    if isinstance(node, SpanNear):
        return set().union(*(span_terms(s) for s in node.subs))
    if isinstance(node, SpanNot):
        return span_terms(node.include) | span_terms(node.exclude)
    if isinstance(node, SpanFirst):
        return span_terms(node.match)
    raise TypeError(f"not a span query: {node!r}")


def positive_terms(node) -> set:
    """Terms whose presence can produce a match (exclude sides excluded) —
    the candidate-generation term set."""
    if isinstance(node, SpanNot):
        return positive_terms(node.include)
    if isinstance(node, SpanTerm):
        return {node.term}
    if isinstance(node, SpanOr):
        return set().union(*(positive_terms(s) for s in node.subs))
    if isinstance(node, SpanNear):
        return set().union(*(positive_terms(s) for s in node.subs))
    if isinstance(node, SpanFirst):
        return positive_terms(node.match)
    raise TypeError(f"not a span query: {node!r}")


def _sort_spans(gs, ge, w):
    order = np.lexsort((ge, gs))
    return gs[order], ge[order], w[order]


def eval_spans(node, posmap: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Evaluate a span query against per-term global position arrays
    (gpos = docid * SHIFT + pos). Returns (gstart, gend, width) sorted by
    (gstart, gend); width feeds SpanScorer's sloppyFreq."""
    z = np.zeros(0, np.int64)
    if isinstance(node, SpanTerm):
        g = posmap.get(node.term)
        if g is None or len(g) == 0:
            return z, z, z
        return g, g + 1, np.zeros(len(g), np.int64)
    if isinstance(node, SpanOr):
        parts = [eval_spans(s, posmap) for s in node.subs]
        gs = np.concatenate([p[0] for p in parts])
        ge = np.concatenate([p[1] for p in parts])
        w = np.concatenate([p[2] for p in parts])
        return _sort_spans(gs, ge, w)
    if isinstance(node, SpanNear):
        sub_spans = [eval_spans(s, posmap) for s in node.subs]
        if any(len(gs) == 0 for gs, _ge, _w in sub_spans):
            return z, z, z  # a near needs every clause; also keeps empty
            # lists out of the repeated-identical-sub-span check below
        all_unit = all(
            len(gs) == 0 or (np.all(ge - gs == 1) and np.all(w == 0))
            for gs, ge, w in sub_spans
        )
        if node.ordered and not all_unit:
            # general (composite) sub-spans: nested near(near(a,b), c)
            gs, ge, w = near_ordered_general_batch(
                [(gs, ge) for gs, ge, _w in sub_spans], node.slop
            )
            return _sort_spans(gs, ge, w)
        if not all_unit:
            ivs = [(gs, ge) for gs, ge, _w in sub_spans]
            ks = [np.stack([gs, ge]).tobytes() for gs, ge in ivs]
            if len(set(ks)) != len(ks):
                # repeated identical sub-spans: per-doc sequential kernel
                # with repeat reconciliation (advanceRpts analog over
                # spans) — bounded by docs containing every clause
                gs, ge, w = _unordered_repeats_per_doc(ivs, ks, node.slop)
            else:
                gs, ge, w = near_unordered_general_batch(ivs, node.slop)
            return _sort_spans(gs, ge, w)
        arrs = [gs for gs, _ge, _w in sub_spans]
        if node.ordered:
            gs, ge, w = near_ordered_spans_batch(arrs, node.slop)
        else:
            ks = [a.tobytes() for a in arrs]
            if len(set(ks)) != len(ks):
                raise NotImplementedError(
                    "repeated identical sub-spans in unordered span-near "
                    "need the sequential repeat-reconciliation kernel "
                    "(SparkSearcher.span_near handles the flat case)"
                )
            gs, ge, w = near_unordered_spans_batch(arrs, node.slop)
        return _sort_spans(gs, ge, w)
    if isinstance(node, SpanNot):
        gs, ge, w = eval_spans(node.include, posmap)
        if len(gs) == 0:
            return z, z, z
        xs, xe, _xw = eval_spans(node.exclude, posmap)
        if len(xs) == 0:
            return gs, ge, w
        # pre/post widen the include span's exclusion window, clamped to
        # its doc block so the slack never reaches a neighboring doc
        doc0 = (gs // SHIFT) * SHIFT
        lo = np.maximum(gs - node.pre, doc0)
        hi = np.minimum(ge + node.post, doc0 + SHIFT)
        # overlap iff any exclude span has xs < hi and xe > lo: excludes
        # sorted by xs; prefix-max of xe gives the largest end among
        # excludes starting before hi (doc blocks are disjoint in global
        # coords, so cross-doc spans can never falsely overlap)
        pmax = np.maximum.accumulate(xe)
        idx = np.searchsorted(xs, hi, side="left")
        overlap = (idx > 0) & (pmax[np.maximum(idx - 1, 0)] > lo)
        keep = ~overlap
        return gs[keep], ge[keep], w[keep]
    if isinstance(node, SpanFirst):
        gs, ge, w = eval_spans(node.match, posmap)
        keep = (ge % SHIFT) <= node.end
        return gs[keep], ge[keep], w[keep]
    raise TypeError(f"not a span query: {node!r}")


def _unordered_repeats_per_doc(
    ivs: list[tuple[np.ndarray, np.ndarray]], keys: list, slop: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unordered span-near with REPEATED IDENTICAL sub-clauses: run the
    sequential reconciliation kernel per candidate doc (docs containing
    every clause). The repeats case cannot batch (window validity depends
    on the mutable per-group assignment), so this is the bounded
    sequential fallback, like engine.span_near for flat repeats."""
    docsets = [np.unique(gs // SHIFT) for gs, _ge in ivs]
    cand = docsets[0]
    for d in docsets[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    out_s: list[int] = []
    out_e: list[int] = []
    out_w: list[int] = []
    for doc in cand:
        lo, hi = doc * SHIFT, (doc + 1) * SHIFT
        per_doc = []
        for gs, ge in ivs:
            a, b = np.searchsorted(gs, lo), np.searchsorted(gs, hi)
            per_doc.append(list(zip(gs[a:b].tolist(), ge[a:b].tolist())))
        for s, e, w in near_unordered_intervals_matches(per_doc, slop, keys):
            out_s.append(s)
            out_e.append(e)
            out_w.append(w)
    return (np.array(out_s, np.int64), np.array(out_e, np.int64),
            np.array(out_w, np.int64))


def span_doc_counts(gs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(docids, integer span counts) from global span starts."""
    if len(gs) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    d, c = np.unique(gs // SHIFT, return_counts=True)
    return d, c.astype(np.int64)


def span_doc_sloppy_freqs(
    gs: np.ndarray, w: np.ndarray, max_doc: int
) -> tuple[np.ndarray, np.ndarray]:
    """SpanScorer frequency (SpanScorer.java:48-60): per doc,
    freq += sloppyFreq(width) = 1/(1+width) accumulated in span order as
    FLOAT32 — Java's float freq accumulator — so scores reproduce the
    reference bit-for-bit."""
    if len(gs) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    docs = gs // SHIFT
    contrib = (np.float32(1.0) / (np.int64(1) + w).astype(np.float32)).astype(np.float32)
    freqs = np.zeros(max_doc, dtype=np.float32)
    np.add.at(freqs, docs, contrib)  # sequential adds in span order
    d = np.flatnonzero(freqs > 0)
    return d, freqs[d]


def near_ordered_general_batch(
    subs: list[tuple[np.ndarray, np.ndarray]], slop: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ordered span-near over GENERAL (possibly non-unit) sub-spans, all
    docs at once — enables nested composition near(near(a,b), c),
    near(not(...), t), etc. (spans/NearSpansOrdered.java for composite
    sub-spans).

    subs[j] = (gstart, gend) arrays of sub-clause j's spans. A match
    anchors at each span of the LAST sub-clause; the chain backwards is
    EXACT minimal total width, not greedy: for each anchor start x the
    best chain over clauses j..0 is

        g_j(x) = min over spans (s, e) of clause j with e <= x of
                 (x - e) + g_{j-1}(s),   g_{-1}(s) = 0

    which is linear in x, so g_j(x) = x + prefixmin_{e <= x}(g_{j-1}(s)
    - e) — one lexsort + running min per clause, no per-doc loop. The
    round-3 greedy (max-start per distinct end) under-counted when a
    clause held same-end spans with different starts (e.g. C1=(0,1),
    C2={(1,5),(3,5)}, C3=(5,6) has a width-0 chain via (1,5) that
    max-start pruning dropped — ADVICE r3); the prefix-min form evaluates
    every feasible candidate per link. Ties on total width keep the
    largest end, then largest start (shrinkToAfterShortestMatch
    narrowing). Match width counts THIS level's inter-span gaps:
    (last.end - first.start) - sum of chosen sub-span extents. Each
    link's candidate lookup is bounded to the seeker's own doc block: a
    per-block offset on the prefix-min keys makes same-block candidates
    always win the min, and a lower-bound searchsorted at the block base
    marks seekers with no same-block candidate infeasible — so a
    cross-doc chain can never shadow (and then lose to the same-doc
    guard) a valid wider same-doc chain, at ANY slop. (A cross-doc link
    can cost as little as ~MAX_POSITION-headroom below SHIFT, so the old
    "width <= slop rejects cross-doc" claim only held for small slops —
    ADVICE r4.)
    """
    k = len(subs)
    z = np.zeros(0, np.int64)
    if any(len(gs) == 0 for gs, _ge in subs):
        return z, z, z
    a_gs, a_ge = subs[-1]
    if k == 1:
        return a_gs, a_ge, np.zeros(len(a_gs), np.int64)
    # No slop ceiling needed (Lucene allows slop up to MAX_VALUE): the
    # block-bounded lookup below never links across doc blocks.
    BIG = np.int64(1) << 60  # infeasible sentinel (no chain below)
    slop = min(int(slop), int(BIG) - 1)  # keep the int64 compare exact
    # per-block key offset: true widths are < k*SHIFT << OFFSET, while
    # block ids stay < 2^34, so blk*OFFSET < 2^62 fits int64 with room
    OFFSET = np.int64(1) << 28

    def _prefix_min_eval(ss, es, val, chain):
        """Build g_j from clause-j candidates: returns (es_sorted,
        key_sorted, chain_at) where g_j(x) = x + key_sorted[best(x)]
        + x_blk*OFFSET. Keys carry -blk*OFFSET so the running min always
        prefers candidates from the seeker's own (= latest feasible) doc
        block; the caller's lower-bound check guarantees one exists."""
        order = np.lexsort((ss, es))
        es_s = es[order]
        key = (val - es)[order] - (es_s // SHIFT) * OFFSET
        runmin = np.minimum.accumulate(key)
        # last index attaining the running min -> on width ties prefer
        # larger e, then larger s (later in the (e, s) sort)
        attain = np.where(key <= runmin, np.arange(len(key)), -1)
        best_at = np.maximum.accumulate(attain)
        return es_s, runmin, chain[order][best_at]

    # clause 0: no chain below; its own start is the chain start
    s0, e0 = subs[0]
    es_s, keymin, chain_at = _prefix_min_eval(
        s0, e0, np.zeros(len(s0), np.int64), s0
    )
    for j in range(1, k):
        x = subs[j][0] if j < k - 1 else a_gs
        x_blk = x // SHIFT
        pos = np.searchsorted(es_s, x, side="right") - 1
        # candidate must sit in the seeker's doc block: lower-bound the
        # prefix at the block base (ADVICE r4 — cross-doc links are
        # structurally excluded, not slop-rejected)
        lb = np.searchsorted(es_s, x_blk * SHIFT, side="left")
        feas = pos >= lb
        pos = np.maximum(pos, 0)
        g = np.where(feas, x + keymin[pos] + x_blk * OFFSET, BIG)
        g = np.minimum(g, BIG)  # clamp accumulated-infeasible sums
        chain = np.where(feas, chain_at[pos], np.int64(-1))
        if j == k - 1:
            width, cur_start = g, chain
            break
        es_s, keymin, chain_at = _prefix_min_eval(
            subs[j][0], subs[j][1], g, chain
        )
    valid = (width <= slop) & (cur_start >= 0)
    valid &= (cur_start // SHIFT) == (a_gs // SHIFT)  # redundant guard
    return cur_start[valid], a_ge[valid], width[valid]
