"""Sloppy (proximity) phrase matching kernel, shared verbatim by the Spark
engine and the pandas oracle (parity by construction).

Semantics (search/SloppyPhraseScorer.java:32-55): a candidate match assigns
one occurrence to each phrase term; with adjusted positions
a_i = pos_i - offset_i, the match distance is max(a) - min(a) and a match
requires distance <= slop. Matches are enumerated with the minimal-window
sweep (advance the smallest adjusted position each step — the
PhrasePositions queue analog) and each qualifying window contributes
sloppyFreq(distance) = 1/(distance + 1) to the phrase frequency
(BM25Similarity.sloppyFreq, BM25Similarity.java:70-72). slop=0 reduces to
the exact-phrase count with sloppyFreq 1 per alignment.

Repeat-term reconciliation (SloppyPhraseScorer.java:48,238-252 — "with
repeats: not so simple"): occurrences of the SAME term must be assigned to
DISTINCT document positions. Before each window is evaluated, colliding
members of a repeat group (same raw position) are resolved by advancing
the member with the smaller adjusted position past the collision — the
advanceRpts analog. Without this, the phrase "b b" would falsely match a
document containing a single "b".
"""

from __future__ import annotations

import numpy as np


def _resolve_repeats(
    adjusted: list[np.ndarray],
    offsets: list[int],
    idx: list[int],
    groups: list[list[int]],
) -> bool:
    """Advance colliding same-term members to distinct raw positions.
    Returns False if a list is exhausted (no further matches possible)."""
    changed = True
    while changed:
        changed = False
        for grp in groups:
            seen: dict[int, int] = {}
            for m in grp:
                raw = int(adjusted[m][idx[m]]) + offsets[m]
                if raw in seen:
                    other = seen[raw]
                    # advance the member with the smaller adjusted position
                    adv = (
                        m
                        if adjusted[m][idx[m]] <= adjusted[other][idx[other]]
                        else other
                    )
                    idx[adv] += 1
                    if idx[adv] >= len(adjusted[adv]):
                        return False
                    changed = True
                    break
                seen[raw] = m
            if changed:
                break
    return True


def sloppy_phrase_freq(
    pos_lists: list[np.ndarray],
    offsets: list[int],
    slop: int,
    terms: list[str] | None = None,
) -> float:
    """Summed sloppyFreq over minimal windows; 0.0 if no match.

    ``terms`` enables repeat reconciliation: members with equal terms form
    a repeat group whose assigned raw positions must stay distinct."""
    adjusted = []
    for p, off in zip(pos_lists, offsets):
        a = np.asarray(p, dtype=np.int64) - off
        if len(a) == 0:
            return 0.0
        adjusted.append(a)
    k = len(adjusted)
    if k == 1:
        return float(len(adjusted[0]))

    groups: list[list[int]] = []
    if terms is not None:
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(i)
        groups = [g for g in by_term.values() if len(g) > 1]

    idx = [0] * k
    if groups and not _resolve_repeats(adjusted, offsets, idx, groups):
        return 0.0
    freq = 0.0
    while True:
        cur = [int(adjusted[i][idx[i]]) for i in range(k)]
        cur_min = min(cur)
        cur_max = max(cur)
        dist = cur_max - cur_min
        if dist <= slop:
            freq += 1.0 / (dist + 1)
        i = cur.index(cur_min)
        idx[i] += 1
        if idx[i] >= len(adjusted[i]):
            return freq
        if groups and not _resolve_repeats(adjusted, offsets, idx, groups):
            return freq
