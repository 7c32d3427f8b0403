"""Sloppy (proximity) phrase matching kernel, shared verbatim by the Spark
engine and the pandas oracle (parity by construction).

Semantics (documented simplification of search/SloppyPhraseScorer.java:32-55):
a candidate match assigns one occurrence to each phrase term; with adjusted
positions a_i = pos_i - offset_i, the match distance is max(a) - min(a) and
a match requires distance <= slop. Matches are enumerated with the
minimal-window sweep (advance the smallest adjusted position each step —
the PhrasePositions queue analog) and each qualifying window contributes
sloppyFreq(distance) = 1/(distance + 1) to the phrase frequency
(BM25Similarity.sloppyFreq, BM25Similarity.java:70-72). slop=0 reduces to
the exact-phrase count with sloppyFreq 1 per alignment.

The reference's repeat-term reconciliation (SloppyPhraseScorer's repeats
handling) is not reproduced; phrases with duplicate terms use independent
occurrence lists. This is a deliberate, documented divergence.
"""

from __future__ import annotations

import heapq

import numpy as np


def sloppy_phrase_freq(pos_lists: list[np.ndarray], offsets: list[int], slop: int) -> float:
    """Summed sloppyFreq over minimal windows; 0.0 if no match."""
    adjusted = []
    for p, off in zip(pos_lists, offsets):
        a = np.asarray(p, dtype=np.int64) - off
        if len(a) == 0:
            return 0.0
        adjusted.append(a)
    k = len(adjusted)
    if k == 1:
        return float(len(adjusted[0]))
    idx = [0] * k
    heap = [(int(adjusted[i][0]), i) for i in range(k)]
    heapq.heapify(heap)
    cur_max = max(int(a[0]) for a in adjusted)
    freq = 0.0
    while True:
        cur_min, i = heap[0]
        dist = cur_max - cur_min
        if dist <= slop:
            freq += 1.0 / (dist + 1)
        idx[i] += 1
        if idx[i] >= len(adjusted[i]):
            break
        nxt = int(adjusted[i][idx[i]])
        heapq.heapreplace(heap, (nxt, i))
        if nxt > cur_max:
            cur_max = nxt
    return freq
