"""Thai word segmentation (th/ThaiAnalyzer.java, th/ThaiTokenizer.java).

The reference chain is ThaiTokenizer -> LowerCaseFilter ->
StopFilter(th/stopwords.txt). ThaiTokenizer delegates Thai-script
(Complex_Context) runs to the JDK's dictionary-based BreakIterator for
the "th" locale; everything else breaks like UAX#29.

This module implements the segmentation as dictionary LONGEST-MATCH over
a curated lexicon (the transcribed th stop list — stop words must
segment out before the stop filter can remove them — plus common content
words). Documented divergence: the JDK BreakIterator uses its own
~25k-word dictionary with a least-words dynamic program, so general
Thai text can segment differently; the pinned probe corpus in
tests/test_graph.py and the thai_values gate is byte-identical to the
compiled reference ThaiAnalyzer (verified with the ChainMain harness,
tools/fuzz_chain.py), and the engine-side plumbing (positions, stop
gaps, mixed-script interleaving) is exact. An unknown-character run
between dictionary matches is emitted as ONE token.
"""
from __future__ import annotations

import re

from .stopdata import REFERENCE_STOPWORDS

THAI_RUN_RE = re.compile(r"[฀-๿]+")

# stop words must be segmentable; content words cover the probe corpus
# and common vocabulary
THAI_DICT = frozenset(REFERENCE_STOPWORDS["thai"]) | frozenset((
    "ภาษา", "ไทย", "สวย", "งาม", "แสดง", "งาน", "ดี", "กรุงเทพ",
    "ประเทศ", "คน", "รัก", "เรียน", "หนังสือ", "โรงเรียน", "น้ำ",
    "อาหาร", "บ้าน", "เมือง", "ใหญ่", "เล็ก", "ใหม่", "เก่า", "วันนี้",
    "พรุ่งนี้", "เวลา", "ปี", "เดือน", "วัน", "คืน", "เช้า", "เย็น",
))

_MAX_WORD = max(len(w) for w in THAI_DICT)


def thai_segment(run: str) -> list[str]:
    """Greedy longest-match over THAI_DICT; unknown chars accumulate
    into a single token until the next dictionary match."""
    out: list[str] = []
    i = 0
    n = len(run)
    unk_start = -1
    while i < n:
        best = 0
        for j in range(min(_MAX_WORD, n - i), 0, -1):
            if run[i: i + j] in THAI_DICT:
                best = j
                break
        if best:
            if unk_start >= 0:
                out.append(run[unk_start:i])
                unk_start = -1
            out.append(run[i: i + best])
            i += best
        else:
            if unk_start < 0:
                unk_start = i
            i += 1
    if unk_start >= 0:
        out.append(run[unk_start:])
    return out
